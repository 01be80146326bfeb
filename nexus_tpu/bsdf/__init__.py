from nexus_tpu.bsdf import fresnel, lobes, microfacet
from nexus_tpu.bsdf.dispatch import eval_bsdf, sample_bsdf

__all__ = ["fresnel", "microfacet", "lobes", "sample_bsdf", "eval_bsdf"]
