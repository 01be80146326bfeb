"""Texture atlas + differentiable bilinear sampling.

TPU-native replacement for the reference's cudaTextureObject path
(Nexus/src/Assets/Texture.cpp:10-39: RGBA8, sRGB decode, wrap addressing,
bilinear filter, normalized float reads). Hardware texture units don't
exist on TPU; instead all textures live in ONE padded (T, H, W, 4)
float32 array ("atlas") and sampling is an explicit gather+lerp — fully
differentiable, so texture texels are first-class gradient targets
(inverse texture recovery).

sRGB→linear happens at load time (io/loader), not at sample time: texels
are stored linear, matching what the GPU's sRGB read returns.

Addressing matches cudaAddressModeWrap (repeat) + linear filter with
texel centers at half-integer coordinates (CUDA's convention).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from nexus_tpu.core.gather import take_small


@flax.struct.dataclass
class TextureAtlas:
    """All textures shelf-packed into ONE (H, W, 4) sheet.

    A (T, H_max, W_max, 4) layout would cost max-dims × count — one 2K
    texture forces every 256px texture to 2K (16x waste on mixed sets).
    The single sheet costs ~sum of areas; wrap addressing stays exact
    because coordinates are wrapped in the texture's own rect before the
    sheet offset is applied.
    """
    data: jnp.ndarray   # (H, W, 4) float32 sheet
    rect: jnp.ndarray   # (T, 4) int32 — (y0, x0, h, w) per texture
    nx1: jnp.ndarray    # (H, W) int32 — x-index of the RIGHT neighbor,
    #                     wrapped inside the owning texture's rect
    ny1: jnp.ndarray    # (H, W) int32 — wrapped DOWN neighbor's y-index.
    #                     Together they let sampling build a (H, W, 16)
    #                     2x2-neighborhood sheet in-program, making a
    #                     bilinear tap ONE N-index gather instead of
    #                     four (the per-index gather cost dominates
    #                     textured shading; the neighborhood build is
    #                     atlas-sized, CSE'd across taps, and keeps
    #                     texture-texel gradients flowing into `data`)
    # Static: no real textures exist (the sheet is the 1x1 white
    # fallback). Sampling then short-circuits to white WITHOUT emitting
    # gathers — on TPU each bilinear tap is a serial 65k-index gather
    # costing ~0.5-2 ms, and a bounce issues 12 of them even for
    # untextured scenes otherwise (measured via profile: textures.py
    # taps dominated the cornell shade time).
    empty: bool = flax.struct.field(pytree_node=False, default=False)
    # Precomputed (H, W, 16) 2x2-neighborhood sheet (`with_quad`).
    # When present, `sample` skips the in-program build entirely. The
    # build is loop-INVARIANT but sits inside the lax.scan over bounces
    # (and samples) when done at the tap site, and XLA does not hoist
    # the materialized sheet out of the loop: the round-5 instanced
    # backward profile showed the rebuilt sheet's async slices as the
    # single largest bwd sink (56.7 ms/call vs 26 ms of trace kernels).
    # Renderers call `with_quad` ONCE per program before the scan, so
    # the sheet is built once and its transpose (the texel-gradient
    # scatter) runs once per sample instead of once per bounce.
    quad: jnp.ndarray | None = None

    @property
    def count(self) -> int:
        return self.rect.shape[0]


def build_atlas(images: list) -> TextureAtlas:
    """Shelf-pack (H_i, W_i, 4) float32 arrays into one sheet.

    Textures are sorted by height (descending) and placed left-to-right
    in rows ("shelves") of a sheet whose width is the widest texture
    rounded up to a multiple of 128 (TPU lane alignment). Waste is the
    per-shelf height slack — bounded and small for size-class-sorted
    inputs, vs max×count for the padded layout. Always returns a
    non-empty atlas (a 1×1 white texel when no textures exist) so
    sampling needs no empty-case branches.
    """
    empty = not images
    if not images:
        images = [np.ones((1, 1, 4), np.float32)]
    order = sorted(range(len(images)), key=lambda i: -images[i].shape[0])
    sheet_w = max(128, -(-max(im.shape[1] for im in images) // 128) * 128)

    rect = np.zeros((len(images), 4), np.int32)
    shelf_y = 0          # top of current shelf
    shelf_h = 0          # height of current shelf
    cur_x = 0
    for i in order:
        h, w = images[i].shape[0], images[i].shape[1]
        if cur_x + w > sheet_w:                 # new shelf
            shelf_y += shelf_h
            shelf_h, cur_x = 0, 0
        rect[i] = (shelf_y, cur_x, h, w)
        cur_x += w
        shelf_h = max(shelf_h, h)
    sheet_h = shelf_y + shelf_h

    data = np.zeros((sheet_h, sheet_w, 4), np.float32)
    # Neighbor index maps: identity outside any rect; wrapped within.
    nx1 = np.tile(np.arange(sheet_w, dtype=np.int32), (sheet_h, 1))
    ny1 = np.tile(np.arange(sheet_h, dtype=np.int32)[:, None],
                  (1, sheet_w))
    for i, im in enumerate(images):
        y0, x0, h, w = rect[i]
        data[y0:y0 + h, x0:x0 + w] = im
        xs = x0 + (np.arange(w, dtype=np.int32) + 1) % w
        ys = y0 + (np.arange(h, dtype=np.int32) + 1) % h
        nx1[y0:y0 + h, x0:x0 + w] = xs[None, :]
        ny1[y0:y0 + h, x0:x0 + w] = ys[:, None]
    return TextureAtlas(data=jnp.asarray(data), rect=jnp.asarray(rect),
                        nx1=jnp.asarray(nx1), ny1=jnp.asarray(ny1),
                        empty=empty)


def build_quad(atlas: TextureAtlas) -> jnp.ndarray:
    """(H, W, 16) 2x2-neighborhood sheet from the atlas data + wrapped
    neighbor maps — differentiable w.r.t. `data` (a gather; its
    transpose scatters tap cotangents back onto the texels)."""
    d = atlas.data
    rows = jnp.broadcast_to(jnp.arange(d.shape[0])[:, None],
                            atlas.nx1.shape)
    cols = jnp.broadcast_to(jnp.arange(d.shape[1])[None, :],
                            atlas.ny1.shape)
    c10s = d[rows, atlas.nx1]
    c01s = d[atlas.ny1, cols]
    c11s = d[atlas.ny1, atlas.nx1]
    return jnp.concatenate([d, c10s, c01s, c11s], axis=-1)


def with_quad(atlas: TextureAtlas) -> TextureAtlas:
    """Attach the precomputed neighborhood sheet (no-op for the empty
    atlas and when already attached). Renderers call this ONCE per
    program before the bounce scan — see the `quad` field doc."""
    if atlas.empty or atlas.quad is not None:
        return atlas
    return atlas.replace(quad=build_quad(atlas))


def sample(atlas: TextureAtlas, tex_id: jnp.ndarray,
           uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear wrap-mode sample. tex_id (...,) int32, uv (..., 2).

    tex_id < 0 returns opaque white (the no-texture identity — callers
    multiply or select). Returns (..., 4) RGBA.
    """
    if atlas.empty:
        # Static fast path: no gathers for untextured scenes.
        return jnp.ones(tex_id.shape + (4,), jnp.float32)
    tid = jnp.maximum(tex_id, 0)
    # take_small: a native table[ids] gather costs ~2.6 ms per 65k
    # indices on TPU regardless of table size (core/gather.py); the
    # rect table is texture-count-sized, so the one-hot contraction
    # is the right lowering for this per-lane lookup.
    r = take_small(atlas.rect, tid)                # (..., 4)
    y0r = r[..., 0]
    x0r = r[..., 1]
    h = r[..., 2].astype(jnp.float32)
    w = r[..., 3].astype(jnp.float32)

    # CUDA linear filtering: sample point at uv*size - 0.5, texel centers
    # on integers after the shift.
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def wrap(i, n):
        return jnp.mod(i.astype(jnp.int32), jnp.maximum(n.astype(jnp.int32), 1))

    # Wrap INSIDE the texture's rect, then offset into the sheet.
    x0i = x0r + wrap(x0, w)
    y0i = y0r + wrap(y0, h)

    # 2x2-neighborhood sheet: prebuilt once per program when the
    # renderer called `with_quad` (the hoisted path — see the field
    # doc), else built in-program from `data` here (texel gradients
    # reach the trainable atlas either way; the in-place build is
    # CSE'd across a program's tap sites but NOT across scan
    # iterations). The tap itself is then a SINGLE N-index gather of
    # 16 floats instead of four 4-float gathers — the per-index cost
    # is what dominates (docs/perf.md).
    quad = atlas.quad if atlas.quad is not None else build_quad(atlas)

    q = quad[y0i, x0i]                                      # (..., 16)
    c00, c10, c01, c11 = (q[..., 0:4], q[..., 4:8],
                          q[..., 8:12], q[..., 12:16])
    col = (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
           + c01 * (1 - fx) * fy + c11 * fx * fy)

    white = jnp.ones_like(col)
    return jnp.where((tex_id < 0)[..., None], white, col)


def build_env_quad(env: jnp.ndarray) -> jnp.ndarray:
    """Pack the (H, W, 3) equirect map into its (H, W, 12) 2x2-
    neighborhood sheet (x+1 wraps, y+1 clamps — the same one-gather
    bilinear trick as `build_quad`). Renderers call this ONCE per
    program before the bounce scan and pass the packed sheet as `env`:
    built at the tap site the sheet is loop-invariant but sits INSIDE
    the lax.scan over bounces, and XLA does not hoist the materialized
    concat out of the loop (the quad-field finding, lines 54-66 —
    the env map never got that fix). The build is differentiable
    (roll/concat), so trainable env texels keep their gradients."""
    c10s = jnp.roll(env, -1, axis=1)                     # x+1 wraps
    c01s = jnp.concatenate([env[1:], env[-1:]], axis=0)  # y+1 clamps
    c11s = jnp.roll(c01s, -1, axis=1)
    return jnp.concatenate([env, c10s, c01s, c11s], axis=-1)


def sample_equirect(env: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """Equirectangular environment lookup (SampleBackground,
    Nexus/src/Cuda/PathTracer/PathTracer.cu:64-83):
    u = (atan2(z, x) + π) / 2π,  v = 1 − (asin(y) + π/2) / π.
    env: (H, W, 3) float32 radiance, or the (H, W, 12) pre-packed
    sheet from `build_env_quad`; direction unit (..., 3).
    """
    h, w = env.shape[0], env.shape[1]
    theta = jnp.arctan2(direction[..., 2], direction[..., 0])
    phi = jnp.arcsin(jnp.clip(direction[..., 1], -1.0, 1.0))
    u = (theta + jnp.pi) / (2.0 * jnp.pi)
    v = 1.0 - (phi + jnp.pi * 0.5) / jnp.pi

    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    # Clamp v (poles shouldn't wrap to the opposite pole). The packed
    # neighborhood handles the BOTTOM edge (row h-1's down-neighbor is
    # itself); the top edge (y0 = -1 clamped to 0) must put all weight
    # on the clamped row, so fy is zeroed there.
    fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)

    # One-gather 2x2-neighborhood tap. Prefer the pre-packed sheet
    # (hoisted out of the bounce scan by the renderer); fall back to
    # an inline build for direct callers outside a scan.
    quad = env if env.shape[-1] == 12 else build_env_quad(env)

    q = quad[y0i, x0i]
    c00, c10, c01, c11 = (q[..., 0:3], q[..., 3:6],
                          q[..., 6:9], q[..., 9:12])
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)
