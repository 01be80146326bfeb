"""Z-order (Morton) pixel enumeration for ray-tile coherence.

The Pallas trace kernel consumes rays in TILE_R-lane tiles and culls
triangle blocks per tile (kernels/trace_hbm.py): its work per tile is
the UNION of the tile's rays' alive-entry sets. Row-major enumeration
makes a 256-lane tile one full scanline — a frustum slice spanning the
whole image width whose union defeats culling. Z-order enumeration
makes the same tile a compact ~16x16 pixel block (measured: 2.4x
faster closest-hit on the 1M-tri interior scene, 1.3x on Cornell;
docs/perf.md).

This is the TPU analog of the reference's ray-coherence machinery: the
CUDA wavefront gets coherence from warp-local rays of adjacent pixels
(Nexus/src/Cuda/PathTracer/PathTracer.cu:85-134 pixel->thread mapping);
on TPU the tile IS the warp, so coherence is created in the pixel
enumeration itself. Pure permutation of lane order — every pixel's path
and RNG stream (keyed by pixel id) are unchanged, so renders are
bit-identical to row-major after un-permutation.
"""

from __future__ import annotations

import functools

import numpy as np


def _spread16(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 16 bits (uint32 in, uint32 out)."""
    v = (v | (v << 8)) & np.uint32(0x00FF00FF)
    v = (v | (v << 4)) & np.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & np.uint32(0x33333333)
    v = (v | (v << 1)) & np.uint32(0x55555555)
    return v


@functools.lru_cache(maxsize=16)
def zorder_pixels(width: int, height: int) -> np.ndarray:
    """Pixel ids (row-major convention) in Z-order: lane i traces pixel
    ``perm[i]``, and consecutive lanes form compact square blocks.
    Works for any (non-power-of-two) size via stable argsort of the
    interleaved codes; dims up to 65536 (16 bits/axis)."""
    assert width <= 65536 and height <= 65536
    x = np.arange(width, dtype=np.uint32)
    y = np.arange(height, dtype=np.uint32)
    code = (_spread16(x)[None, :].astype(np.uint64)
            | (_spread16(y)[:, None].astype(np.uint64) << np.uint64(1)))
    return np.argsort(code.ravel(), kind="stable").astype(np.int32)


@functools.lru_cache(maxsize=16)
def zorder_pixels_jnp(width: int, height: int):
    """Device-resident copy of zorder_pixels, cached so repeated renders
    reuse one H2D transfer."""
    import jax.numpy as jnp

    return jnp.asarray(zorder_pixels(width, height))


@functools.lru_cache(maxsize=16)
def zorder_inverse_jnp(width: int, height: int):
    """inv with inv[perm[i]] = i: gathering a z-ordered lane array by
    ``inv`` restores row-major pixel order."""
    import jax.numpy as jnp

    perm = zorder_pixels(width, height)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=np.int32)
    return jnp.asarray(inv)
