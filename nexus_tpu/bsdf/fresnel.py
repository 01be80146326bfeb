"""Fresnel reflectance (dielectric + complex-IOR conductor).

Branch-free re-expression of Nexus/src/Cuda/BSDF/Fresnel.cuh. The
reference's dielectric R_perp has an apparent typo (`eta*cosT + cosT`
instead of `eta*cosT + cosI` in the denominator, Fresnel.cuh:28); we
default to the correct PBRT formula and keep the quirk behind
``strict_parity`` for comparisons against reference renders.
"""

from __future__ import annotations

import jax.numpy as jnp


def dielectric_reflectance(eta: jnp.ndarray, cos_i: jnp.ndarray,
                           strict_parity: bool = False):
    """Unpolarized Fresnel reflectance for a dielectric interface.

    eta = ior_transmitted-side convention of Fresnel.cuh:9-31: callers pass
    1/ior and the function flips when cos_i < 0 (ray exiting the medium).
    Returns (F, cos_theta_t) with F = 1 (TIR) when sin^2(theta_t) > 1.
    """
    flip = cos_i < 0.0
    eta = jnp.where(flip, 1.0 / eta, eta)
    cos_i = jnp.abs(cos_i)

    sin_t_sq = eta * eta * (1.0 - cos_i * cos_i)
    tir = sin_t_sq > 1.0
    # Positive floor (not 0): sqrt'(0) = inf would NaN-poison reverse-mode
    # AD at the TIR boundary; TIR lanes are overwritten with 0 below anyway.
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t_sq, 1.0e-12))

    r_parl = (eta * cos_i - cos_t) / (eta * cos_i + cos_t)
    if strict_parity:
        # Reference quirk (Fresnel.cuh:28): denominator eta*cosT + cosT.
        r_perp = (eta * cos_t - cos_i) / (eta * cos_t + cos_t)
    else:
        r_perp = (eta * cos_t - cos_i) / (eta * cos_t + cos_i)

    f = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    f = jnp.where(tir, 1.0, f)
    cos_t = jnp.where(tir, 0.0, cos_t)
    return f, cos_t


def schlick(f0: jnp.ndarray, f90: jnp.ndarray, cos_i: jnp.ndarray) -> jnp.ndarray:
    """Schlick approximation (Fresnel.cuh:34-37)."""
    return f0 + (f90 - f0) * jnp.power(1.0 - cos_i, 5.0)


def complex_reflectance(cos_i: jnp.ndarray, eta: jnp.ndarray,
                        k: jnp.ndarray) -> jnp.ndarray:
    """Exact conductor Fresnel with complex IOR eta - i*k (Fresnel.cuh:45-63).

    Broadcasts over channels: pass eta/k of shape (..., 3) with cos_i (...,)
    or (..., 1) for RGB reflectance.
    """
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    cos_sq = cos_i * cos_i
    sin_sq = jnp.maximum(1.0 - cos_sq, 0.0)
    sin_qu = sin_sq * sin_sq

    inner = eta * eta - k * k - sin_sq
    a2b2 = jnp.sqrt(jnp.maximum(inner * inner + 4.0 * eta * eta * k * k, 0.0))
    a = jnp.sqrt(jnp.maximum((a2b2 + inner) * 0.5, 0.0))

    rs = ((a2b2 + cos_sq) - 2.0 * a * cos_i) / ((a2b2 + cos_sq) + 2.0 * a * cos_i)
    rp = ((cos_sq * a2b2 + sin_qu) - 2.0 * a * cos_i * sin_sq) / \
         ((cos_sq * a2b2 + sin_qu) + 2.0 * a * cos_i * sin_sq)

    # Matches the reference exactly: 0.5 * (Rs + Rs*Rp) (Fresnel.cuh:62).
    return 0.5 * (rs + rs * rp)
