"""nexus_tpu — a TPU-native differentiable wavefront path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Patoche692/Nexus CUDA wavefront path tracer (reference mounted at
/root/reference): wavefront path tracing with BVH2/CWBVH acceleration,
TLAS/BLAS instancing, 4 microfacet BSDFs with NEE + power-heuristic MIS,
textures and environment maps — differentiable end-to-end and sharded
across TPU meshes.

Layer map (mirrors SURVEY.md §7):
  core/    math, RNG, sampling, tonemapping, config
  geom/    rays, triangles, AABBs
  accel/   BVH2 + CWBVH builders, TLAS/BLAS instancing, traversal
  bsdf/    lambertian / dielectric / plastic / conductor + microfacet math
  scene/   SoA scene pytree, camera, lights, materials, textures
  io/      GLB/glTF + OBJ loaders, image IO
  render/  megakernel + wavefront integrators
  kernels/ Pallas TPU kernels for the hot paths
  dist/    mesh sharding, multi-chip rendering
  diff/    gradient helpers (custom VJPs, FD checking)
  apps/    CLI renderer
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    # Persistent caching was enabled via env vars, bypassing
    # core.cache.enable_compile_cache — harden it here so EVERY entry
    # point (editor, pytest, ad-hoc scripts) gets the same protection:
    # XLA:CPU's embedded AOT kernel caches are ISA-specific and
    # segfault when deserialized on a different host generation (this
    # environment schedules sessions across heterogeneous hosts), so
    # they must be disabled and the cache dir partitioned by CPU
    # fingerprint (core/cache.py).
    from nexus_tpu.core.cache import enable_compile_cache as _ecc

    _ecc()
