"""Material-type BSDF dispatch.

The reference routes rays into four per-material CUDA kernels through
atomic queues (PathTracer.cu:177-209). On TPU we do the opposite for the
megakernel path: evaluate every lobe on the VPU and select lane-wise by
material tag — zero divergence, no queues. The wavefront path (which sorts
rays by material) instead shades each segment with a single lobe.
"""

from __future__ import annotations

import jax.numpy as jnp

from nexus_tpu.bsdf import lobes
from nexus_tpu.scene.materials import CONDUCTOR, DIELECTRIC, DIFFUSE, PLASTIC


def sample_bsdf(mat, wi, u, strict_fresnel: bool = False):
    """Sample all lobes and select by mat.mtype.

    Args:
      mat: per-ray Materials record (leading batch axes).
      wi: (..., 3) local-frame incident direction (toward viewer).
      u: (..., 5) uniforms.
    Returns (wo, throughput, pdf, valid), each batched.
    """
    results = (
        lobes.lambertian_sample(mat, wi, u),
        lobes.dielectric_sample(mat, wi, u, strict_fresnel),
        lobes.plastic_sample(mat, wi, u, strict_fresnel),
        lobes.conductor_sample(mat, wi, u),
    )
    return _select_by_type(mat.mtype, results, n_out=4)


def eval_bsdf(mat, wi, wo, strict_fresnel: bool = False):
    """Evaluate all lobes and select by mat.mtype.

    Returns (throughput, pdf, valid): BSDF*|wo.z| and the sampling pdf.
    """
    results = (
        lobes.lambertian_eval(mat, wi, wo),
        lobes.dielectric_eval(mat, wi, wo, strict_fresnel),
        lobes.plastic_eval(mat, wi, wo, strict_fresnel),
        lobes.conductor_eval(mat, wi, wo),
    )
    return _select_by_type(mat.mtype, results, n_out=3)


_TYPE_ORDER = (DIFFUSE, DIELECTRIC, PLASTIC, CONDUCTOR)


def _select_by_type(mtype, results, n_out):
    out = list(results[0])
    for tag, res in zip(_TYPE_ORDER[1:], results[1:]):
        pick = mtype == tag
        for i in range(n_out):
            cond = pick[..., None] if res[i].ndim == pick.ndim + 1 else pick
            out[i] = jnp.where(cond, res[i], out[i])
    return tuple(out)
