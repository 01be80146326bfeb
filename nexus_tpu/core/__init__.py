from nexus_tpu.core import math, rng, sampling, tonemap
from nexus_tpu.core.config import RenderSettings

__all__ = ["math", "rng", "sampling", "tonemap", "RenderSettings"]
