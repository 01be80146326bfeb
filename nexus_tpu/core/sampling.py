"""Monte Carlo sampling primitives and MIS heuristics.

Replaces Nexus/src/Cuda/Sampler.cuh and the sampling routines in
Nexus/src/Cuda/Random.cuh. Rejection loops in the reference
(RandomInUnitDisk, Random.cuh:128-134) are replaced by closed-form
polar/concentric transforms — identical distributions, no data-dependent
loops (XLA-friendly, constant work per sample).

Every function takes explicit uniform samples (u1, u2, ...) so the caller
controls the RNG stream; all are batched over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

PDF_EPS = 1.0e-4  # Sampler::IsPdfValid threshold (Sampler.cuh:58-61)


def is_pdf_valid(pdf: jnp.ndarray) -> jnp.ndarray:
    """isfinite(pdf) && pdf > 1e-4 (Sampler.cuh:58-61)."""
    return jnp.isfinite(pdf) & (pdf > PDF_EPS)


_PDF_CLAMP = 1.0e18  # past this w is 0 or 1 to f32 precision anyway


def _sanitize_pdf(pdf: jnp.ndarray) -> jnp.ndarray:
    """Finite, clamped pdf for MIS-weight arithmetic.

    Two hazards this removes (both reverse-mode only — callers already
    mask invalid lanes' VALUES with is_pdf_valid):
    * inf pdfs from garbage (masked) lanes: the ratio division's
      transpose computes -ct * ans / y; ans = inf with ct = 0 gives
      0*inf = NaN, which poisons broadcast parameter gradients even
      though the lane itself is where-masked out.
    * NaN pdfs: propagate through every primal-using VJP regardless of
      cotangent.
    The replacement value (and the clamp) only changes masked lanes or
    weights already saturated at 0/1 in f32.
    """
    pdf = jnp.where(jnp.isnan(pdf), 1.0, pdf)
    return jnp.clip(pdf, 1.0 / _PDF_CLAMP, _PDF_CLAMP)


def balance_heuristic(pdf1: jnp.ndarray, pdf2: jnp.ndarray) -> jnp.ndarray:
    """pdf1 / (pdf1 + pdf2) in overflow-safe ratio form."""
    r = _sanitize_pdf(pdf2) / _sanitize_pdf(pdf1)
    return 1.0 / (1.0 + r)


def power_heuristic(pdf1: jnp.ndarray, pdf2: jnp.ndarray) -> jnp.ndarray:
    """Veach power heuristic, beta=2 (Sampler.cuh:22-25).

    Computed as 1/(1 + (pdf2/pdf1)²) on sanitized pdfs: the naive
    p1²/(p1²+p2²) overflows f32 for large pdfs (e.g. the near-delta
    lastPdf init of 1e10, or garbage-lane solid-angle pdfs) and its VJP
    then produces inf/inf = NaN even under a zero cotangent. The ratio
    of clamped pdfs can still overflow when squared, so the square is
    taken on the clamped ratio.
    """
    r = jnp.clip(_sanitize_pdf(pdf2) / _sanitize_pdf(pdf1), 0.0, _PDF_CLAMP)
    return 1.0 / (1.0 + jnp.minimum(r * r, 3.0e37))


def cosine_hemisphere(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere direction in the local +Z frame.

    Matches Random::RandomCosineHemisphere (Random.cuh:113-125):
    phi = 2*pi*u1, r = sqrt(u2), z = sqrt(1-u2). pdf = z / pi.
    """
    r = jnp.sqrt(u2)
    phi = 2.0 * jnp.pi * u1
    x = jnp.cos(phi) * r
    y = jnp.sin(phi) * r
    z = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
    return jnp.stack([x, y, z], axis=-1)


def unit_disk(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Uniform point on the unit disk via polar map (no rejection loop)."""
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def uniform_triangle(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Uniform barycentric (u, v) on a triangle (Sampler.cuh:42-49)."""
    su0 = jnp.sqrt(u1)
    return jnp.stack([1.0 - su0, u2 * su0], axis=-1)


def uniform_index(u: jnp.ndarray, count) -> jnp.ndarray:
    """Uniform integer in [0, count) from a uniform float (Sampler.cuh:29-31)."""
    idx = jnp.floor(u * count).astype(jnp.int32)
    return jnp.clip(idx, 0, jnp.asarray(count, jnp.int32) - 1)
