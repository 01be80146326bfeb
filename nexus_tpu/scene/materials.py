"""Material SoA.

TPU-native replacement for the host/device tagged-union Material
(Nexus/src/Assets/Material.h:6-73, Nexus/src/Cuda/Scene/Material.cuh:5-51).
Instead of a C union we keep one dense SoA with every field present —
gather a per-ray record with `Materials.take(ids)` and let the BSDF
dispatch select by `mtype`. This wastes a few floats per material but is
branch-free, vectorizes on the VPU, and is differentiable in every field.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

# Material type tags — values match the reference enum order
# (Material.cuh D_Type: DIFFUSE, DIELECTRIC, PLASTIC, CONDUCTOR).
DIFFUSE = 0
DIELECTRIC = 1
PLASTIC = 2
CONDUCTOR = 3

NO_TEXTURE = -1


@flax.struct.dataclass
class Materials:
    """SoA of M materials. Every array's leading axis is the material axis.

    After `take(ids)` the same structure holds per-ray records.
    """
    mtype: jnp.ndarray      # (M,) int32 — DIFFUSE/DIELECTRIC/PLASTIC/CONDUCTOR
    albedo: jnp.ndarray     # (M, 3) — diffuse/dielectric/plastic albedo
    roughness: jnp.ndarray  # (M,)
    ior: jnp.ndarray        # (M,) dielectric/plastic index of refraction
    eta: jnp.ndarray        # (M, 3) conductor complex IOR (real part)
    k: jnp.ndarray          # (M, 3) conductor complex IOR (imaginary part)
    emission: jnp.ndarray   # (M, 3) emissive color
    intensity: jnp.ndarray  # (M,) emissive intensity multiplier
    opacity: jnp.ndarray    # (M,)
    diffuse_map: jnp.ndarray   # (M,) int32, NO_TEXTURE if absent
    emissive_map: jnp.ndarray  # (M,) int32, NO_TEXTURE if absent

    @property
    def count(self) -> int:
        return self.mtype.shape[0]

    def take(self, ids: jnp.ndarray) -> "Materials":
        """Gather per-ray material records by material id.

        Uses the one-hot contraction for small material sets (the
        common case) — XLA's serial gather costs ~2.6 ms per 65k
        indices regardless of table size, and its scatter-add VJP
        dominates backward; the one-hot path is a matmul both ways
        (core/gather.py)."""
        from nexus_tpu.core.gather import take_small

        return Materials(*(take_small(f, ids) for f in (
            self.mtype, self.albedo, self.roughness, self.ior, self.eta,
            self.k, self.emission, self.intensity, self.opacity,
            self.diffuse_map, self.emissive_map)))

    @property
    def is_emissive(self) -> jnp.ndarray:
        """Per-material emitter flag (Scene.cpp:142-176 auto-light semantics)."""
        return jnp.max(self.emission, axis=-1) * self.intensity > 0.0


class MaterialBuilder:
    """Host-side accumulator; `build()` freezes into a Materials SoA."""

    def __init__(self):
        self._rows = []

    def add(self, mtype=DIFFUSE, albedo=(0.8, 0.8, 0.8), roughness=0.0,
            ior=1.45, eta=(0.2, 0.92, 1.1), k=(3.9, 2.45, 2.14),
            emission=(0.0, 0.0, 0.0), intensity=1.0, opacity=1.0,
            diffuse_map=NO_TEXTURE, emissive_map=NO_TEXTURE) -> int:
        self._rows.append(dict(mtype=mtype, albedo=albedo, roughness=roughness,
                               ior=ior, eta=eta, k=k, emission=emission,
                               intensity=intensity, opacity=opacity,
                               diffuse_map=diffuse_map, emissive_map=emissive_map))
        return len(self._rows) - 1

    def build(self) -> Materials:
        if not self._rows:
            # Always keep >= 1 material so gathers are well-formed.
            self.add()
        r = self._rows
        f32 = np.float32
        return Materials(
            mtype=jnp.asarray([m["mtype"] for m in r], jnp.int32),
            albedo=jnp.asarray([m["albedo"] for m in r], f32),
            roughness=jnp.asarray([m["roughness"] for m in r], f32),
            ior=jnp.asarray([m["ior"] for m in r], f32),
            eta=jnp.asarray([m["eta"] for m in r], f32),
            k=jnp.asarray([m["k"] for m in r], f32),
            emission=jnp.asarray([m["emission"] for m in r], f32),
            intensity=jnp.asarray([m["intensity"] for m in r], f32),
            opacity=jnp.asarray([m["opacity"] for m in r], f32),
            diffuse_map=jnp.asarray([m["diffuse_map"] for m in r], jnp.int32),
            emissive_map=jnp.asarray([m["emissive_map"] for m in r], jnp.int32),
        )
