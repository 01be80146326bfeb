"""BSDF tests: sample/eval pdf consistency, energy sanity, reciprocity-ish.

These implement the test strategy SURVEY.md §4 prescribes (the reference
ships no tests): pdf consistency between Sample and Eval at the sampled
direction, furnace-style energy checks, and hemisphere validity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.bsdf import eval_bsdf, lobes, sample_bsdf
from nexus_tpu.core import rng
from nexus_tpu.scene.materials import (CONDUCTOR, DIELECTRIC, DIFFUSE,
                                       PLASTIC, MaterialBuilder)

N = 4096


def _mat(**kw):
    b = MaterialBuilder()
    b.add(**kw)
    m = b.build()
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[0], (N,) + x.shape[1:]), m)


def _wi(seed=0, z_positive=True):
    v = jax.random.normal(jax.random.PRNGKey(seed), (N, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    if z_positive:
        v = v.at[:, 2].set(jnp.abs(v[:, 2]) + 0.05)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v


def _uniforms(seed=0):
    state = rng.init_state(jnp.arange(N), seed)
    us = []
    for _ in range(5):
        state, u = rng.rand(state)
        us.append(u)
    return jnp.stack(us, axis=-1)


class TestLambertian:
    def test_sample_distribution(self):
        mat = _mat(mtype=DIFFUSE, albedo=(0.7, 0.5, 0.3))
        wo, thr, pdf, valid = sample_bsdf(mat, _wi(), _uniforms())
        assert np.asarray(valid).mean() > 0.99
        v = np.asarray(valid)
        expected = np.broadcast_to(np.array([0.7, 0.5, 0.3], np.float32),
                                   np.asarray(thr)[v].shape)
        np.testing.assert_allclose(np.asarray(thr)[v], expected, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pdf)[v],
                                   np.asarray(wo[:, 2] / jnp.pi)[v], atol=1e-5)

    def test_eval_matches_sample(self):
        mat = _mat(mtype=DIFFUSE, albedo=(0.8, 0.8, 0.8))
        wi = _wi()
        wo, thr_s, pdf_s, valid = sample_bsdf(mat, wi, _uniforms())
        thr_e, pdf_e, valid_e = eval_bsdf(mat, wi, wo)
        v = np.asarray(valid & valid_e)
        np.testing.assert_allclose(np.asarray(pdf_e)[v], np.asarray(pdf_s)[v],
                                   rtol=1e-4)
        # eval thr == sample weight * pdf  (f*cos = weight * pdf)
        np.testing.assert_allclose(np.asarray(thr_e)[v],
                                   np.asarray(thr_s * pdf_s[:, None])[v],
                                   rtol=1e-3, atol=1e-6)

    def test_white_furnace(self):
        """albedo=1 cosine sampling: every sample weight is exactly 1."""
        mat = _mat(mtype=DIFFUSE, albedo=(1.0, 1.0, 1.0))
        _, thr, _, valid = sample_bsdf(mat, _wi(), _uniforms())
        v = np.asarray(valid)
        np.testing.assert_allclose(np.asarray(thr)[v], 1.0, atol=1e-6)


class TestConductor:
    def test_sample_reflects_upward(self):
        mat = _mat(mtype=CONDUCTOR, roughness=0.3)
        wi = _wi()
        wo, thr, pdf, valid = sample_bsdf(mat, wi, _uniforms(1))
        v = np.asarray(valid)
        assert v.mean() > 0.7
        assert np.all(np.asarray(wo[:, 2])[v] > 0.0)
        assert np.all(np.asarray(pdf)[v] > 0.0)

    def test_eval_matches_sample(self):
        mat = _mat(mtype=CONDUCTOR, roughness=0.5)
        wi = _wi()
        wo, thr_s, pdf_s, valid = sample_bsdf(mat, wi, _uniforms(2))
        thr_e, pdf_e, valid_e = eval_bsdf(mat, wi, wo)
        v = np.asarray(valid & valid_e)
        assert v.mean() > 0.5
        np.testing.assert_allclose(np.asarray(pdf_e)[v], np.asarray(pdf_s)[v],
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(thr_e)[v],
                                   np.asarray(thr_s * pdf_s[:, None])[v],
                                   rtol=1e-2, atol=1e-5)

    def test_energy_below_one(self):
        """MC estimate of directional albedo must be <= 1 (passivity)."""
        mat = _mat(mtype=CONDUCTOR, roughness=0.4)
        _, thr, _, valid = sample_bsdf(mat, _wi(), _uniforms(3))
        w = np.asarray(jnp.where(valid[:, None], thr, 0.0))
        assert w.mean(0).max() <= 1.05


class TestDielectric:
    def test_sample_both_sides(self):
        mat = _mat(mtype=DIELECTRIC, roughness=0.2, ior=1.5,
                   albedo=(1.0, 1.0, 1.0))
        wi = _wi()
        wo, thr, pdf, valid = sample_bsdf(mat, wi, _uniforms(4))
        v = np.asarray(valid)
        assert v.mean() > 0.6
        woz = np.asarray(wo[:, 2])[v]
        # Some rays reflect (wo.z > 0), some refract (wo.z < 0).
        assert (woz > 0).any() and (woz < 0).any()

    def test_eval_matches_sample_reflection(self):
        mat = _mat(mtype=DIELECTRIC, roughness=0.3, ior=1.5,
                   albedo=(1.0, 1.0, 1.0))
        wi = _wi()
        wo, thr_s, pdf_s, valid = sample_bsdf(mat, wi, _uniforms(5))
        thr_e, pdf_e, valid_e = eval_bsdf(mat, wi, wo)
        v = np.asarray(valid & valid_e)
        assert v.mean() > 0.5
        np.testing.assert_allclose(np.asarray(pdf_e)[v], np.asarray(pdf_s)[v],
                                   rtol=5e-3)
        np.testing.assert_allclose(np.asarray(thr_e)[v],
                                   np.asarray(thr_s * pdf_s[:, None])[v],
                                   rtol=1e-2, atol=1e-5)

    def test_smooth_glass_splits_by_fresnel(self):
        mat = _mat(mtype=DIELECTRIC, roughness=0.0, ior=1.5,
                   albedo=(1.0, 1.0, 1.0))
        wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (N, 3))
        wo, thr, pdf, valid = sample_bsdf(mat, wi, _uniforms(6))
        v = np.asarray(valid)
        frac_reflect = (np.asarray(wo[:, 2])[v] > 0).mean()
        # Normal-incidence Fresnel for ior 1.5 is 0.04.
        assert abs(frac_reflect - 0.04) < 0.02


class TestPlastic:
    def test_sample_upward_only(self):
        mat = _mat(mtype=PLASTIC, roughness=0.3, ior=1.45,
                   albedo=(0.5, 0.2, 0.1))
        wo, thr, pdf, valid = sample_bsdf(mat, _wi(), _uniforms(7))
        v = np.asarray(valid)
        assert v.mean() > 0.9
        assert np.all(np.asarray(wo[:, 2])[v] > 0.0)

    def test_eval_positive_on_sampled(self):
        mat = _mat(mtype=PLASTIC, roughness=0.4, ior=1.45,
                   albedo=(0.6, 0.6, 0.6))
        wi = _wi()
        wo, _, _, valid = sample_bsdf(mat, wi, _uniforms(8))
        thr_e, pdf_e, valid_e = eval_bsdf(mat, wi, wo)
        v = np.asarray(valid & valid_e)
        assert v.mean() > 0.9
        assert np.all(np.asarray(pdf_e)[v] > 0.0)
        assert np.all(np.asarray(thr_e)[v] >= 0.0)


class TestFresnel:
    def test_dielectric_normal_incidence(self):
        from nexus_tpu.bsdf.fresnel import dielectric_reflectance
        f, cos_t = dielectric_reflectance(jnp.asarray(1.0 / 1.5),
                                          jnp.asarray(1.0))
        assert abs(float(f) - 0.04) < 1e-3
        assert abs(float(cos_t) - 1.0) < 1e-6

    def test_tir(self):
        from nexus_tpu.bsdf.fresnel import dielectric_reflectance
        # Exiting glass at a grazing angle: total internal reflection.
        f, cos_t = dielectric_reflectance(jnp.asarray(1.0 / 1.5),
                                          jnp.asarray(-0.2))
        assert float(f) == 1.0

    def test_conductor_high_reflectance(self):
        from nexus_tpu.bsdf.fresnel import complex_reflectance
        # Gold-ish at normal incidence is > 0.9 in the red channel.
        f = complex_reflectance(jnp.asarray(1.0), jnp.asarray(0.14),
                                jnp.asarray(3.9))
        assert float(f) > 0.9


class TestDifferentiability:
    def test_grad_through_eval(self):
        wi = jnp.asarray([0.3, 0.1, 0.9])
        wi = wi / jnp.linalg.norm(wi)
        wo = jnp.asarray([-0.2, 0.4, 0.8])
        wo = wo / jnp.linalg.norm(wo)

        def loss(albedo):
            b = MaterialBuilder()
            b.add(mtype=DIFFUSE)
            m = b.build()
            m = m.replace(albedo=albedo[None])
            thr, pdf, valid = eval_bsdf(
                jax.tree_util.tree_map(lambda x: x[0], m), wi, wo)
            return jnp.sum(thr)

        g = jax.grad(loss)(jnp.asarray([0.5, 0.5, 0.5]))
        expected = float(wo[2] / jnp.pi)
        np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5)

    def test_grad_through_rough_sample_no_nan(self):
        def loss(rough):
            b = MaterialBuilder()
            b.add(mtype=CONDUCTOR)
            m = b.build()
            m = m.replace(roughness=jnp.asarray([rough]))
            mat = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[0], (64,) + x.shape[1:]), m)
            wi = _wi(9)[:64]
            u = _uniforms(10)[:64]
            wo, thr, pdf, valid = sample_bsdf(mat, wi, u)
            return jnp.sum(jnp.where(valid[:, None], thr, 0.0))

        g = jax.grad(loss)(0.4)
        assert np.isfinite(float(g))
