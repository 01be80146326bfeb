"""Adversarial gradient-safety grid for the BSDF stack.

The 10-bounce bench configs failed with non-finite MATERIAL gradients
while every value-level test passed: `refraction_pdf`'s Beckmann
exponent division had a transpose computing u/v² with v = alpha²·m_z²
as small as 1e-20 (v² overflows f32 to inf), and a zero cotangent
turned it into NaN that poisoned the whole material-gradient
accumulation — the classic masked-lane 0·inf trap, but in an edge the
value tests can never see (the lanes are where-masked, so only AD
notices). Depth dependence was incidental: the singular NEE eval
configurations (glancing half-vectors, m_z² ≈ 1e-12) just become more
likely with more bounces.

This test closes the class, not just the instance: every microfacet
helper and every lobe's sample/eval is swept over an adversarial grid
(zeros, ±1e-7 grazing values, exact ±1, degenerate wo = -wi) and the
gradient w.r.t. every differentiable input must be finite under BOTH a
zero cotangent (the masked-lane trap) and a unit cotangent.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.bsdf import dispatch, lobes, microfacet
from nexus_tpu.scene.materials import (CONDUCTOR, DIELECTRIC, DIFFUSE,
                                       MaterialBuilder, PLASTIC)

_VALS = [0.0, 1e-7, 1e-3, 0.5, 1.0, -1e-7, -0.5, -1.0]
_ALPHAS = [1e-4, 1e-3, 1e-2, 0.3, 1.0]
_ETAS = [0.69, 1.0, 1.45]


def _assert_finite_grads(f, args, wrt):
    """Gradients of sum(0*f) (zero cotangent) and sum(f) must be finite
    w.r.t. args[i] for i in wrt."""
    for scale in (0.0, 1.0):
        g = jax.grad(
            lambda *a: jnp.sum(scale * f(*a)), argnums=wrt)(*args)
        for i, gi in zip(wrt, g):
            assert bool(jnp.all(jnp.isfinite(gi))), \
                f"non-finite grad wrt arg {i} at cotangent scale {scale}"


def _grid(*columns):
    rows = list(itertools.product(*columns))
    return [jnp.asarray([r[k] for r in rows], jnp.float32)
            for k in range(len(columns))]


def test_refraction_pdf_grads_finite():
    a, m, wi, wo, e = _grid(_ALPHAS, _VALS, _VALS, _VALS, _ETAS)
    _assert_finite_grads(microfacet.refraction_pdf,
                         (a, m, wi, wo, e), (0, 1, 2, 3, 4))


def test_beckmann_reflection_walter_grads_finite():
    a, m = _grid(_ALPHAS, _VALS)
    _assert_finite_grads(microfacet.beckmann_d, (a, m), (0, 1))
    a, m, wi = _grid(_ALPHAS, _VALS, _VALS)
    _assert_finite_grads(microfacet.reflection_pdf, (a, m, wi), (0, 1, 2))
    a, wim, won, win, mn = _grid(_ALPHAS, _VALS, _VALS, _VALS, _VALS)
    _assert_finite_grads(microfacet.walter_weight,
                         (a, wim, won, win, mn), (0, 1, 2, 3, 4))


def test_alpha_and_smith_grads_finite():
    r, z = _grid([0.0, 1e-4, 0.1, 1.0], _VALS)
    _assert_finite_grads(microfacet.alpha_from_roughness, (r, z), (0, 1))
    a, wo, wi = _grid(_ALPHAS, _VALS, _VALS)
    _assert_finite_grads(microfacet.smith_g2, (a, wo, wi), (0, 1, 2))


def _adversarial_dirs():
    """(N, 3) unit-ish directions incl. axis-aligned and grazing."""
    base = [
        (0.0, 0.0, 1.0), (0.0, 0.0, -1.0),
        (1.0, 0.0, 0.0), (0.0, 1.0, 0.0),            # wi_z exactly 0
        (1e-7, 0.0, 1.0), (0.7, 0.7, 1e-7),           # grazing
        (0.5, 0.5, 0.70710678), (-0.5, 0.5, -0.70710678),
    ]
    d = np.asarray(base, np.float32)
    return d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-20)


@pytest.mark.parametrize("mtype", [DIFFUSE, DIELECTRIC, PLASTIC, CONDUCTOR])
def test_lobe_eval_grads_finite(mtype):
    dirs = _adversarial_dirs()
    n = len(dirs)
    pairs = [(i, j) for i in range(n) for j in range(n)]
    wi = jnp.asarray(dirs[[p[0] for p in pairs]])
    wo = jnp.asarray(dirs[[p[1] for p in pairs]])
    # wo = -wi degenerates the half-vector (h = 0): include explicitly.
    wi = jnp.concatenate([wi, jnp.asarray(dirs)])
    wo = jnp.concatenate([wo, jnp.asarray(-dirs)])

    b = MaterialBuilder()
    for rough in (0.0, 1e-3, 0.5):
        b.add(mtype=mtype, roughness=rough, ior=1.45)
    mats = b.build()

    def run(roughness, ior, take_id):
        m = mats.replace(roughness=roughness, ior=ior).take(take_id)
        thr, pdf, _ok = dispatch.eval_bsdf(m, wi, wo)
        return jnp.sum(thr) + jnp.sum(pdf)

    for mat_id in range(3):
        take = jnp.full((wi.shape[0],), mat_id, jnp.int32)
        for scale in (0.0, 1.0):
            g_r, g_i = jax.grad(
                lambda r, i: scale * run(r, i, take),
                argnums=(0, 1))(mats.roughness, mats.ior)
            assert bool(jnp.all(jnp.isfinite(g_r))), \
                f"roughness grad, mat {mat_id}, scale {scale}"
            assert bool(jnp.all(jnp.isfinite(g_i))), \
                f"ior grad, mat {mat_id}, scale {scale}"


@pytest.mark.parametrize("mtype", [DIFFUSE, DIELECTRIC, PLASTIC, CONDUCTOR])
def test_lobe_sample_grads_finite(mtype):
    dirs = _adversarial_dirs()
    wi = jnp.asarray(np.tile(dirs, (4, 1)))
    n = wi.shape[0]
    # Adversarial uniforms incl. exact 0/1 (sqrt/log endpoints).
    rng = np.random.default_rng(3)
    u = rng.uniform(0, 1, (n, 5)).astype(np.float32)
    u[:8] = 0.0
    u[8:16] = 1.0
    u = jnp.asarray(u)

    b = MaterialBuilder()
    for rough in (0.0, 1e-3, 0.5):
        b.add(mtype=mtype, roughness=rough, ior=1.45)
    mats = b.build()

    def run(roughness, ior, take_id):
        m = mats.replace(roughness=roughness, ior=ior).take(take_id)
        wo, thr, pdf, _ok = dispatch.sample_bsdf(m, wi, u)
        return jnp.sum(wo) + jnp.sum(thr) + jnp.sum(pdf)

    for mat_id in range(3):
        take = jnp.full((n,), mat_id, jnp.int32)
        for scale in (0.0, 1.0):
            g_r, g_i = jax.grad(
                lambda r, i: scale * run(r, i, take),
                argnums=(0, 1))(mats.roughness, mats.ior)
            assert bool(jnp.all(jnp.isfinite(g_r)))
            assert bool(jnp.all(jnp.isfinite(g_i)))
