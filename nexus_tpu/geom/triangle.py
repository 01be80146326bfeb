"""Triangle intersection and geometry.

Möller–Trumbore in branch-free masked form — the TPU re-expression of
D_Triangle::Trace / ShadowTrace (Nexus/src/Cuda/Geometry/Triangle.cuh:53-117).
The reference early-outs with scalar branches; we compute everything and
fold the accept conditions into one boolean — this is exactly what the VPU
wants and what the Pallas trace kernel inlines.

Triangles are SoA arrays: v0/v1/v2 of shape (N, 3) (+ optional normals/uvs).
All functions broadcast over leading batch axes of the ray.
"""

from __future__ import annotations

import jax.numpy as jnp

from nexus_tpu.geom.types import MISS_DISTANCE


def intersect(ray_o: jnp.ndarray, ray_d: jnp.ndarray,
              v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray,
              t_max: jnp.ndarray | float = MISS_DISTANCE):
    """Möller–Trumbore, no backface culling (matches Triangle.cuh:53-87).

    Shapes: ray_o/ray_d (..., 3); v0/v1/v2 broadcastable to (..., 3).
    Returns (valid, t, u, v) with t = +MISS where invalid.
    """
    e0 = v1 - v0
    e1 = v2 - v0
    pvec = jnp.cross(ray_d, e1)
    det = jnp.sum(e0 * pvec, axis=-1)
    # Parallel rays produce det≈0 → inf/NaN u,v,t → comparisons reject them.
    inv_det = 1.0 / det
    s = ray_o - v0
    u = inv_det * jnp.sum(s * pvec, axis=-1)
    qvec = jnp.cross(s, e0)
    v = inv_det * jnp.sum(ray_d * qvec, axis=-1)
    t = inv_det * jnp.sum(e1 * qvec, axis=-1)
    valid = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) \
        & (t > 0.0) & (t < t_max)
    t = jnp.where(valid, t, MISS_DISTANCE)
    return valid, t, u, v


def refine(ray_o: jnp.ndarray, ray_d: jnp.ndarray,
           v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray):
    """Unmasked Möller–Trumbore (t, u, v) for a KNOWN-hit triangle.

    Used by the differentiable traversal refinement (accel/traverse2):
    the traversal already established the hit, so no accept tests — just
    the closed-form solve, which is what gradients flow through.
    """
    e0 = v1 - v0
    e1 = v2 - v0
    pvec = jnp.cross(ray_d, e1)
    det = jnp.sum(e0 * pvec, axis=-1)
    tiny = 1.0e-12
    det = jnp.where(jnp.abs(det) < tiny,
                    jnp.where(det < 0, -tiny, tiny), det)
    inv_det = 1.0 / det
    s = ray_o - v0
    u = inv_det * jnp.sum(s * pvec, axis=-1)
    qvec = jnp.cross(s, e0)
    v = inv_det * jnp.sum(ray_d * qvec, axis=-1)
    t = inv_det * jnp.sum(e1 * qvec, axis=-1)
    return t, u, v


def geometric_normal(v0, v1, v2) -> jnp.ndarray:
    """Unnormalized geometric normal cross(e0, e1) (Triangle.cuh:120-126)."""
    return jnp.cross(v1 - v0, v2 - v0)


def area(v0, v1, v2) -> jnp.ndarray:
    """0.5 * |cross(e0, e1)| (Triangle.cuh:129-137)."""
    n = geometric_normal(v0, v1, v2)
    return 0.5 * jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1), 0.0))


def centroid(v0, v1, v2) -> jnp.ndarray:
    return (v0 + v1 + v2) / 3.0
