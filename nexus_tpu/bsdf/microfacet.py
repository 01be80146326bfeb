"""Beckmann microfacet distribution (Walter et al. 2007 sampling).

Re-expression of Nexus/src/Cuda/BSDF/Microfacet.cuh in masked jnp form.
All functions broadcast over batch axes; angles are cosines in the local
+Z shading frame.
"""

from __future__ import annotations

import jax.numpy as jnp


def alpha_from_roughness(roughness: jnp.ndarray, wi_z: jnp.ndarray) -> jnp.ndarray:
    """View-dependent alpha clamp used by all rough BSDFs.

    alpha = clamp((1.2 - 0.2*sqrt(|wi.z|)) * roughness^2, 1e-4, 1)
    (e.g. DielectricBSDF.cuh:24).
    """
    # sqrt floored away from 0: d sqrt(|z|)/dz at z = 0 is NaN (0/0),
    # and grazing lanes with wi_z exactly 0 exist whenever geometry is
    # axis-aligned; the 1e-12 floor changes alpha by <= 2e-7 * r².
    a = (1.2 - 0.2 * jnp.sqrt(jnp.maximum(jnp.abs(wi_z), 1.0e-12))) \
        * roughness * roughness
    return jnp.clip(a, 1.0e-4, 1.0)


def beckmann_d(alpha: jnp.ndarray, m_dot_n: jnp.ndarray) -> jnp.ndarray:
    """Beckmann NDF (Microfacet.cuh:13-20). Zero below the horizon."""
    alpha_sq = alpha * alpha
    cos_sq = m_dot_n * m_dot_n
    cos_sq_safe = jnp.maximum(cos_sq, 1.0e-12)
    # Exponent in the algebraically equal form (1 - 1/c) / a² — NOT
    # (c-1)/(a²c): that quotient's transpose computes u/v² with
    # v = a²c as small as 1e-20, and v² = 1e-40 overflows f32 to inf;
    # 0·inf = NaN then poisons reverse-mode roughness/ior gradients on
    # lanes every caller masks out (found as the non-finite-gradient
    # failure of the 10-bounce bench configs — the NEE eval of glancing
    # half-vectors hits m_z² ≈ 1e-12 routinely). The factored form's
    # transposes are bounded (1/c ≤ 1e12, 1/a⁴ ≤ 1e16 separately), and
    # the -87 floor (exp(-87) ≈ 1.6e-38 ≈ 0 in f32) zeroes the clamp
    # branch's gradient exactly where the true derivative underflows.
    x = (1.0 - 1.0 / cos_sq_safe) / alpha_sq
    num = jnp.exp(jnp.maximum(x, -87.0))
    den = jnp.pi * alpha_sq * cos_sq_safe * cos_sq_safe
    # _guarded_div, not /: den can reach ~1e-24 at grazing m; the division
    # transpose computes den**-2 which overflows to inf in f32, and
    # 0*inf = NaN poisons reverse-mode gradients of broadcast parameters
    # (roughness) even on lanes the jnp.where masks out. num underflows to
    # 0 long before den gets that small, so flooring den is value-exact.
    return jnp.where(m_dot_n > 0.0, _guarded_div(num, den), 0.0)


def _smith_a(alpha: jnp.ndarray, s_dot_n: jnp.ndarray) -> jnp.ndarray:
    """Smith 'a' parameter (Microfacet.cuh:22-24)."""
    s_sq = jnp.minimum(0.99999, s_dot_n * s_dot_n)
    return s_dot_n / (alpha * jnp.sqrt(1.0 - s_sq))


def smith_g1(a: jnp.ndarray) -> jnp.ndarray:
    """Walter's rational fit of Beckmann Smith G1 (Microfacet.cuh:26-33)."""
    g = ((3.535 + 2.181 * a) * a) / (1.0 + (2.276 + 2.577 * a) * a)
    return jnp.where(a < 1.6, g, 1.0)


def smith_g2(alpha: jnp.ndarray, wo_dot_n: jnp.ndarray,
             wi_dot_n: jnp.ndarray) -> jnp.ndarray:
    """Separable Smith G2 = G1(wo) * G1(wi) (Microfacet.cuh:40-45)."""
    return smith_g1(_smith_a(alpha, wo_dot_n)) * smith_g1(_smith_a(alpha, wi_dot_n))


def _guarded_div(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    """num/den with |den| floored away from 0.

    A plain division NaN-poisons reverse-mode AD even on lanes the caller
    later masks out (the VJP divides the cotangent by `den`, and 0/0 = NaN
    propagates through jnp.where). Flooring the denominator keeps every
    lane's gradient finite; masked lanes' values are discarded anyway.
    """
    tiny = 1.0e-12
    den = jnp.where(jnp.abs(den) < tiny, jnp.where(den < 0, -tiny, tiny), den)
    return num / den


def walter_weight(alpha: jnp.ndarray, wi_dot_m: jnp.ndarray,
                  wo_dot_n: jnp.ndarray, wi_dot_n: jnp.ndarray,
                  m_dot_n: jnp.ndarray) -> jnp.ndarray:
    """Walter sample weight = wiDotM * G2 / (wiDotN * mDotN) (Microfacet.cuh:49-54)."""
    return _guarded_div(wi_dot_m * smith_g2(alpha, wo_dot_n, wi_dot_n),
                        wi_dot_n * m_dot_n)


def reflection_pdf(alpha: jnp.ndarray, m_dot_n: jnp.ndarray,
                   wi_dot_m: jnp.ndarray) -> jnp.ndarray:
    """D(m) * mDotN / (4 * wiDotM) (Microfacet.cuh:56-59)."""
    return _guarded_div(beckmann_d(alpha, m_dot_n) * m_dot_n, 4.0 * wi_dot_m)


def refraction_pdf(alpha: jnp.ndarray, m_dot_n: jnp.ndarray,
                   wi_dot_m: jnp.ndarray, wo_dot_m: jnp.ndarray,
                   eta: jnp.ndarray) -> jnp.ndarray:
    """Walter refraction Jacobian pdf: D * mDotN * |woDotM| / (eta*wiDotM + woDotM)^2.

    wi_dot_m / wo_dot_m must be SIGNED (wo is on the far side of m, so
    wo_dot_m < 0 when wi_dot_m > 0). The reference is internally
    inconsistent here: its Sample passes |dots| (Microfacet.cuh:62-65 via
    DielectricBSDF.cuh:115) while its Eval uses the signed combination
    (DielectricBSDF.cuh:64) — the signed form is Walter et al. 2007
    eq. 17's actual density, so we use it on both paths (sample pdf ==
    eval pdf == true density, required for consistent MIS).
    """
    denom = eta * wi_dot_m + wo_dot_m
    denom_sq = jnp.maximum(denom * denom, 1.0e-12)
    return beckmann_d(alpha, m_dot_n) * m_dot_n * jnp.abs(wo_dot_m) / denom_sq


def sample_half_vector(alpha: jnp.ndarray, u1: jnp.ndarray,
                       u2: jnp.ndarray) -> jnp.ndarray:
    """Sample a Beckmann half-vector m in the local frame (Microfacet.cuh:66-80).

    tan^2(theta) = -alpha^2 * ln(1 - u1); phi = 2*pi*u2.
    """
    tan_sq = -(alpha * alpha) * jnp.log(jnp.maximum(1.0 - u1, 1.0e-20))
    phi = 2.0 * jnp.pi * u2
    cos_t = 1.0 / jnp.sqrt(1.0 + tan_sq)
    # Positive floor: sqrt(0) at u1=0 (tan_sq=0) has an infinite VJP that
    # NaN-poisons reverse mode even on masked lanes; sin ~ 1e-6 error.
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1.0e-12))
    m = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    n2 = jnp.sum(m * m, axis=-1, keepdims=True)
    return m / jnp.sqrt(jnp.maximum(n2, 1.0e-24))
