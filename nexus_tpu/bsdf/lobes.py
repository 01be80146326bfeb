"""The four BSDF lobes: Lambertian, rough dielectric, rough plastic, rough conductor.

Masked, branch-free re-expressions of Nexus/src/Cuda/BSDF/{LambertianBSDF,
DielectricBSDF, PlasticBSDF, ConductorBSDF}.cuh. Conventions:

- Directions live in the local shading frame (+Z = shading normal);
  `wi` points AWAY from the surface toward the viewer/previous vertex,
  `wo` is the sampled/evaluated outgoing direction.
- `sample(mat, wi, u) -> (wo, throughput, pdf, valid)` where u is a
  (..., 5) array of uniforms: u[0:2] half-vector / cosine lobe,
  u[2] lobe selection, u[3:5] plastic diffuse direction. Every lobe
  consumes the same 5 slots so the RNG stream never depends on the
  material type (keeps renders shard/compaction invariant).
- `eval(mat, wi, wo) -> (throughput, pdf, valid)` returns BSDF * |wo.z|
  (the reference's "BSDF times woDotN" convention) and the pdf the
  sampler would have produced — used by NEE/MIS.
- Unlike the reference, the conductor has a full Eval (the reference's
  conductor cannot do NEE and its shade kernel is disabled,
  PathTracer.cu:475-478 — SURVEY.md §8.1); ours is first-class.

Invalid lanes return pdf = 0 and zero throughput; all divisions are
eps-guarded so gradients never see NaN through jnp.where.
"""

from __future__ import annotations

import jax.numpy as jnp

from nexus_tpu.bsdf import fresnel, microfacet
from nexus_tpu.core.math import sgne
from nexus_tpu.core.sampling import cosine_hemisphere, is_pdf_valid

INV_PI = 1.0 / jnp.pi
_TINY = 1.0e-12


def _safe_div(a, b):
    """a / b with the denominator nudged away from 0 (NaN-free grads)."""
    b_safe = jnp.where(jnp.abs(b) < _TINY, jnp.where(b < 0, -_TINY, _TINY), b)
    return a / b_safe


def _finish(wo, throughput, pdf, valid):
    valid = valid & is_pdf_valid(pdf)
    pdf = jnp.where(valid, pdf, 0.0)
    throughput = jnp.where(valid[..., None], throughput, 0.0)
    return wo, throughput, pdf, valid


def _finish_eval(throughput, pdf, valid):
    valid = valid & is_pdf_valid(pdf)
    pdf = jnp.where(valid, pdf, 0.0)
    throughput = jnp.where(valid[..., None], throughput, 0.0)
    return throughput, pdf, valid


# ---------------------------------------------------------------------------
# Lambertian (LambertianBSDF.cuh:16-38)
# ---------------------------------------------------------------------------

def lambertian_sample(mat, wi, u):
    wo = cosine_hemisphere(u[..., 0], u[..., 1])
    pdf = INV_PI * wo[..., 2]
    return _finish(wo, mat.albedo, pdf, jnp.full(pdf.shape, True))


def lambertian_eval(mat, wi, wo):
    reflected = wi[..., 2] * wo[..., 2] > 0.0
    throughput = mat.albedo * (INV_PI * wo[..., 2])[..., None]
    pdf = INV_PI * wo[..., 2]
    return _finish_eval(throughput, pdf, reflected)


# ---------------------------------------------------------------------------
# Rough dielectric (Walter et al. 2007; DielectricBSDF.cuh:22-118)
# ---------------------------------------------------------------------------

def _dielectric_eta(mat, wi):
    """eta = relative IOR along wi: inside→ior, outside→1/ior (DielectricBSDF.cuh:26)."""
    return jnp.where(wi[..., 2] < 0.0, mat.ior, 1.0 / mat.ior)


def dielectric_sample(mat, wi, u, strict_fresnel: bool = False):
    alpha = microfacet.alpha_from_roughness(mat.roughness, wi[..., 2])
    eta = _dielectric_eta(mat, wi)
    m = microfacet.sample_half_vector(alpha, u[..., 0], u[..., 1])
    wi_dot_m = jnp.sum(wi * m, axis=-1)

    fr, cos_t = fresnel.dielectric_reflectance(1.0 / mat.ior, wi_dot_m,
                                               strict_parity=strict_fresnel)
    pick_reflect = u[..., 2] < fr

    # Reflection: wo = reflect(-wi, m) = 2*(wi·m)*m - wi
    wo_r = 2.0 * wi_dot_m[..., None] * m - wi
    # Refraction (DielectricBSDF.cuh:104): wo = (eta*wiDotM - sgn(wiDotM)*cosT)*m - eta*wi
    wo_t = (eta * wi_dot_m - sgne(wi_dot_m) * cos_t)[..., None] * m \
        - eta[..., None] * wi
    wo = jnp.where(pick_reflect[..., None], wo_r, wo_t)

    weight = microfacet.walter_weight(
        alpha, jnp.abs(wi_dot_m), jnp.abs(wo[..., 2]),
        jnp.abs(wi[..., 2]), m[..., 2])

    wo_dot_m = jnp.sum(wo * m, axis=-1)
    pdf_r = fr * microfacet.reflection_pdf(alpha, m[..., 2], jnp.abs(wi_dot_m))
    # Signed dots: refraction_pdf is the signed Walter eq.17 density (see
    # microfacet.refraction_pdf docstring on the reference's inconsistency).
    pdf_t = (1.0 - fr) * microfacet.refraction_pdf(
        alpha, m[..., 2], wi_dot_m, wo_dot_m, eta)
    pdf = jnp.where(pick_reflect, pdf_r, pdf_t)

    same_side = wo[..., 2] * wi[..., 2] > 0.0
    valid = jnp.where(pick_reflect, same_side, ~same_side)
    valid &= weight < 1.0e10  # division-by-zero guard (DielectricBSDF.cuh:110)

    ones = jnp.ones_like(mat.albedo)
    throughput = jnp.where(pick_reflect[..., None],
                           ones * weight[..., None],
                           mat.albedo * weight[..., None])
    return _finish(wo, throughput, pdf, valid)


def dielectric_eval(mat, wi, wo, strict_fresnel: bool = False):
    alpha = microfacet.alpha_from_roughness(mat.roughness, wi[..., 2])
    eta = _dielectric_eta(mat, wi)
    wi_n = wi[..., 2]
    wo_n = wo[..., 2]
    reflected = wi_n * wo_n > 0.0

    def _norm(v):
        n2 = jnp.sum(v * v, axis=-1, keepdims=True)
        return v / jnp.sqrt(jnp.maximum(n2, _TINY))

    m_r = sgne(wi_n)[..., None] * _norm(wo + wi)
    m_t = -_norm(wi * eta[..., None] + wo)
    m = jnp.where(reflected[..., None], m_r, m_t)

    wi_dot_m = jnp.sum(wi * m, axis=-1)
    wo_dot_m = jnp.sum(wo * m, axis=-1)
    f, _ = fresnel.dielectric_reflectance(1.0 / mat.ior, wi_dot_m,
                                          strict_parity=strict_fresnel)
    g = microfacet.smith_g2(alpha, jnp.abs(wo_n), jnp.abs(wi_n))
    d = microfacet.beckmann_d(alpha, m[..., 2])

    brdf = _safe_div(f * g * d, 4.0 * jnp.abs(wi_n))
    pdf_r = _safe_div(f * d * m[..., 2], 4.0 * jnp.abs(wi_dot_m))

    denom = eta * wi_dot_m + wo_dot_m
    btdf_scale = _safe_div(jnp.abs(wi_dot_m * wo_dot_m) * (1.0 - f) * g * d,
                           jnp.abs(wi_n) * denom * denom)
    pdf_t = (1.0 - f) * microfacet.refraction_pdf(
        alpha, m[..., 2], wi_dot_m, wo_dot_m, eta)

    ones = jnp.ones_like(mat.albedo)
    throughput = jnp.where(reflected[..., None],
                           ones * brdf[..., None],
                           mat.albedo * btdf_scale[..., None])
    pdf = jnp.where(reflected, pdf_r, pdf_t)
    return _finish_eval(throughput, pdf, jnp.full(pdf.shape, True))


# ---------------------------------------------------------------------------
# Rough plastic: specular + diffuse Fresnel mix (PlasticBSDF.cuh:23-105)
# ---------------------------------------------------------------------------

def plastic_sample(mat, wi, u, strict_fresnel: bool = False):
    alpha = microfacet.alpha_from_roughness(mat.roughness, wi[..., 2])
    m = microfacet.sample_half_vector(alpha, u[..., 0], u[..., 1])
    wi_dot_m = jnp.sum(wi * m, axis=-1)
    fr, _ = fresnel.dielectric_reflectance(1.0 / mat.ior, wi_dot_m,
                                           strict_parity=strict_fresnel)
    pick_spec = u[..., 2] < fr

    wo_s = 2.0 * wi_dot_m[..., None] * m - wi
    wo_d = cosine_hemisphere(u[..., 3], u[..., 4])
    wo = jnp.where(pick_spec[..., None], wo_s, wo_d)

    weight = microfacet.walter_weight(
        alpha, jnp.abs(wi_dot_m), jnp.abs(wo_s[..., 2]),
        jnp.abs(wi[..., 2]), m[..., 2])

    # MIS pdf: the true marginal density of this sampler is the Fresnel
    # mixture F*p_spec + (1-F)*p_cos evaluated at wo (both lobes cover the
    # reflection hemisphere). The reference reports only the picked lobe's
    # pdf here (PlasticBSDF.cuh:92,103) while its Eval reports the mixture
    # (PlasticBSDF.cuh:57-62) — a pick-dependent MIS weight is biased, so
    # we compute the same mixture as eval, from the half-vector
    # reconstructed at wo (identical to the sampled m on specular picks).
    h = wo + wi
    m_e = h / jnp.sqrt(jnp.maximum(
        jnp.sum(h * h, axis=-1, keepdims=True), _TINY))
    wi_dot_me = jnp.sum(wi * m_e, axis=-1)
    f_e, _ = fresnel.dielectric_reflectance(1.0 / mat.ior, wi_dot_me,
                                            strict_parity=strict_fresnel)
    pdf_spec = microfacet.reflection_pdf(alpha, m_e[..., 2], wi_dot_me)
    pdf = f_e * pdf_spec + (1.0 - f_e) * INV_PI * wo[..., 2]

    valid = jnp.where(pick_spec, wo_s[..., 2] * wi[..., 2] > 0.0, True)

    ones = jnp.ones_like(mat.albedo)
    throughput = jnp.where(pick_spec[..., None],
                           ones * weight[..., None], mat.albedo)
    return _finish(wo, throughput, pdf, valid)


def plastic_eval(mat, wi, wo, strict_fresnel: bool = False):
    alpha = microfacet.alpha_from_roughness(mat.roughness, wi[..., 2])
    wi_n = wi[..., 2]
    wo_n = wo[..., 2]
    reflected = wi_n * wo_n > 0.0

    h = wo + wi
    n2 = jnp.sum(h * h, axis=-1, keepdims=True)
    m = h / jnp.sqrt(jnp.maximum(n2, _TINY))

    wi_dot_m = jnp.sum(wi * m, axis=-1)
    f, _ = fresnel.dielectric_reflectance(1.0 / mat.ior, wi_dot_m,
                                          strict_parity=strict_fresnel)
    g = microfacet.smith_g2(alpha, jnp.abs(wo_n), jnp.abs(wi_n))
    d = microfacet.beckmann_d(alpha, m[..., 2])

    brdf = _safe_div(f * g * d, 4.0 * jnp.abs(wi_n))            # specular
    btdf = (1.0 - f)[..., None] * mat.albedo * (INV_PI * wo_n)[..., None]
    throughput = jnp.ones_like(mat.albedo) * brdf[..., None] + btdf

    pdf_spec = _safe_div(d * m[..., 2], 4.0 * wi_dot_m)
    pdf_diff = wo_n * INV_PI
    pdf = f * pdf_spec + (1.0 - f) * pdf_diff
    return _finish_eval(throughput, pdf, reflected)


# ---------------------------------------------------------------------------
# Rough conductor (ConductorBSDF.cuh:23-48 + our Eval addition)
# ---------------------------------------------------------------------------

def conductor_sample(mat, wi, u):
    alpha = microfacet.alpha_from_roughness(mat.roughness, wi[..., 2])
    m = microfacet.sample_half_vector(alpha, u[..., 0], u[..., 1])
    wi_dot_m = jnp.sum(wi * m, axis=-1)
    f = fresnel.complex_reflectance(wi_dot_m[..., None], mat.eta, mat.k)

    wo = 2.0 * wi_dot_m[..., None] * m - wi
    weight = microfacet.walter_weight(
        alpha, jnp.abs(wi_dot_m), jnp.abs(wo[..., 2]),
        jnp.abs(wi[..., 2]), m[..., 2])
    valid = (weight < 1.0e10) & (wo[..., 2] * wi[..., 2] > 0.0)

    throughput = weight[..., None] * f
    pdf = microfacet.reflection_pdf(alpha, m[..., 2], jnp.abs(wi_dot_m))
    return _finish(wo, throughput, pdf, valid)


def conductor_eval(mat, wi, wo):
    """Microfacet conductor BRDF eval — absent in the reference (its
    conductor cannot participate in NEE, ConductorBSDF.cuh); implemented
    here so conductors are first-class MIS citizens."""
    alpha = microfacet.alpha_from_roughness(mat.roughness, wi[..., 2])
    wi_n = wi[..., 2]
    wo_n = wo[..., 2]
    reflected = wi_n * wo_n > 0.0

    h = wo + wi
    n2 = jnp.sum(h * h, axis=-1, keepdims=True)
    m = sgne(wi_n)[..., None] * h / jnp.sqrt(jnp.maximum(n2, _TINY))

    wi_dot_m = jnp.sum(wi * m, axis=-1)
    f = fresnel.complex_reflectance(jnp.abs(wi_dot_m)[..., None], mat.eta, mat.k)
    g = microfacet.smith_g2(alpha, jnp.abs(wo_n), jnp.abs(wi_n))
    d = microfacet.beckmann_d(alpha, m[..., 2])

    throughput = f * _safe_div(g * d, 4.0 * jnp.abs(wi_n))[..., None]
    pdf = _safe_div(d * m[..., 2], 4.0 * jnp.abs(wi_dot_m))
    return _finish_eval(throughput, pdf, reflected)
