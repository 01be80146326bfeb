"""Tonemapping / color pipeline.

Matches the reference display path (Nexus/src/Cuda/PathTracer/PathTracer.cu:48-62
+ Utils/Utils.h:51-54): exposure 0.6 → Narkowicz ACES fit → gamma 1/2.2 →
8-bit pack. Differentiable (useful for loss functions in inverse rendering).
"""

from __future__ import annotations

import jax.numpy as jnp

ACES_EXPOSURE = 0.6


def aces_tonemap(color: jnp.ndarray, exposure: float = ACES_EXPOSURE) -> jnp.ndarray:
    """Krzysztof Narkowicz's approximated ACES fit (PathTracer.cu:50-62)."""
    x = color * exposure
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def linear_to_gamma(color: jnp.ndarray, gamma: float = 2.2) -> jnp.ndarray:
    """pow(x, 1/gamma) (Utils/Utils.h:51-54)."""
    return jnp.power(jnp.maximum(color, 0.0), 1.0 / gamma)


def gamma_to_linear(color: jnp.ndarray, gamma: float = 2.2) -> jnp.ndarray:
    return jnp.power(jnp.maximum(color, 0.0), gamma)


def to_display(radiance: jnp.ndarray, exposure: float = ACES_EXPOSURE) -> jnp.ndarray:
    """HDR radiance → display-referred [0,1] RGB (tonemap + gamma)."""
    return linear_to_gamma(aces_tonemap(radiance, exposure))


def to_uint8(display_rgb: jnp.ndarray) -> jnp.ndarray:
    return (jnp.clip(display_rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)
