"""Test configuration: force an 8-virtual-device CPU platform.

The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel);
tests must run on a local CPU backend with 8 virtual devices so sharding
logic is exercised without hardware. Set NEXUS_TEST_TPU=1 to run the
suite on the real chip instead.

This must execute before jax initializes its backend — pytest imports
conftest first, so assigning env vars here is sufficient.
"""

import os

if not os.environ.get("NEXUS_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # The session env pins JAX_PLATFORMS=axon and a sitecustomize module
    # registers the axon PJRT plugin in every interpreter; overriding the
    # env var alone is ignored (and hangs backend init). The config-level
    # override below is honored and selects the virtual-CPU backend.
    import jax

    jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent compile cache: the suite is compile-bound (multi-device
# grad tests alone cost ~1 min of XLA time). Budget note (round 5):
# 194 default tests run in ~8:30 warm — the original 5-minute budget
# predates the optimizer, remat, compaction, grad-safety, and importer
# suites (+60 tests). The six >20 s tests (inverse-rendering recovery
# and equivalence, remat-grad bit-match, analytic radiance) each carry
# a load-bearing numeric contract; trimming steps weakens them below
# their measured assertion margins, so the depth-heavy variants sit
# behind `-m slow` and the defaults stay. Safe on every backend.
from nexus_tpu.core.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
