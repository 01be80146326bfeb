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

# Importing the package has no side effects (no jax import, no global
# config writes): persistent-cache hardening (core/cache.py — XLA:CPU
# AOT entries are ISA-specific and segfault across host generations)
# is applied by every shipped entry point calling
# enable_compile_cache() explicitly (apps/render.py, apps/editor.py,
# bench.py, tests/conftest.py, tools/, benchmarks/). Ad-hoc scripts
# that enable caching via JAX env vars should do the same.
