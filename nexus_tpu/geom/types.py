"""Ray / Intersection pytrees.

TPU-native replacement for D_Ray / D_Intersection and their SoA mirrors
(Nexus/src/Cuda/Geometry/Ray.cuh:5-83). A batched ``Ray`` of N rays IS the
SoA layout — fields are (N, 3) / (N,) jnp arrays; no Get/Set plumbing.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

MISS_DISTANCE = 1.0e30  # sentinel hit distance (Ray.cuh:8)


@flax.struct.dataclass
class Ray:
    origin: jnp.ndarray     # (..., 3)
    direction: jnp.ndarray  # (..., 3), unit length

    def at(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.origin + self.direction * t[..., None]


@flax.struct.dataclass
class Intersection:
    """Closest-hit record. t == MISS_DISTANCE means no hit."""
    t: jnp.ndarray         # (...,) hit distance
    u: jnp.ndarray         # (...,) barycentric u
    v: jnp.ndarray         # (...,) barycentric v
    tri_idx: jnp.ndarray   # (...,) int32 triangle index (within the hit BLAS)
    inst_idx: jnp.ndarray  # (...,) int32 instance index

    @property
    def hit(self) -> jnp.ndarray:
        return self.t < MISS_DISTANCE

    @classmethod
    def none(cls, shape=(), dtype=jnp.float32) -> "Intersection":
        return cls(
            t=jnp.full(shape, MISS_DISTANCE, dtype),
            u=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            tri_idx=jnp.zeros(shape, jnp.int32),
            inst_idx=jnp.zeros(shape, jnp.int32),
        )
