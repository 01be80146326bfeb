from nexus_tpu.geom import aabb, triangle
from nexus_tpu.geom.types import MISS_DISTANCE, Intersection, Ray

__all__ = ["aabb", "triangle", "Ray", "Intersection", "MISS_DISTANCE"]
