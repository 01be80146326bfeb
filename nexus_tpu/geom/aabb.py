"""AABB slab test and host-side AABB helpers.

Slab test matches D_AABB::IntersectionAABB (Nexus/src/Cuda/Geometry/AABB.cuh:11-21)
in masked branch-free form; `area` is the SAH half-surface-area convention
of the host AABB (Nexus/src/Geometry/AABB.h:25-31).
"""

from __future__ import annotations

import jax.numpy as jnp

from nexus_tpu.geom.types import MISS_DISTANCE


def intersect(ray_o: jnp.ndarray, inv_d: jnp.ndarray,
              bmin: jnp.ndarray, bmax: jnp.ndarray,
              t_best: jnp.ndarray | float = MISS_DISTANCE) -> jnp.ndarray:
    """Slab test. Returns entry distance tmin, or MISS if no hit.

    Shapes: ray_o/inv_d (..., 3); bmin/bmax broadcastable to (..., 3).
    Accept iff tmax >= tmin and tmin < t_best and tmax > 0 (AABB.cuh:19-20).
    """
    t1 = (bmin - ray_o) * inv_d
    t2 = (bmax - ray_o) * inv_d
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= tmin) & (tmin < t_best) & (tmax > 0.0)
    return jnp.where(hit, tmin, MISS_DISTANCE)


def half_area(bmin: jnp.ndarray, bmax: jnp.ndarray) -> jnp.ndarray:
    """SAH half surface area: e.x*e.y + e.y*e.z + e.z*e.x (AABB.h:25-31)."""
    e = jnp.maximum(bmax - bmin, 0.0)
    return e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] + e[..., 2] * e[..., 0]
