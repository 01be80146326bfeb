"""Radiance RGBE (.hdr) reader — true float HDR.

The reference loads ".hdr" files through stb's 8-bit LDR path into sRGB
RGBA8 (Nexus/src/Scene/Scene.cpp:95 → Assets/IMGLoader.cpp:17), clamping
all highlights (SURVEY.md §8.3). This loader decodes real RGBE radiance;
the LDR-parity behavior lives in io/loader.load_env_map(parity_ldr=True).

Format: "#?RADIANCE"/"#?RGBE" header, -Y H +X W resolution line, then
per-scanline either flat RGBE quads or adaptive RLE (two-byte 0x0202
marker). Components: rgb = mantissa/256 * 2^(e-128).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def read_hdr(path: str | Path) -> np.ndarray:
    """Decode a Radiance .hdr file to (H, W, 3) float32."""
    with open(path, "rb") as f:
        data = f.read()

    # Header ends at the first blank line; resolution line follows.
    pos = data.find(b"\n\n")
    if pos < 0:
        raise ValueError("malformed HDR header")
    header = data[:pos].decode("latin-1")
    if not header.startswith(("#?RADIANCE", "#?RGBE")):
        raise ValueError("not a Radiance HDR file")
    end = data.find(b"\n", pos + 2)
    res = data[pos + 2:end].decode("latin-1").split()
    if len(res) != 4 or res[0] != "-Y" or res[2] != "+X":
        raise ValueError(f"unsupported HDR orientation {res}")
    height, width = int(res[1]), int(res[3])

    raw = data[end + 1:]
    img = np.zeros((height, width, 4), np.uint8)
    offset = 0
    for y in range(height):
        if offset + 4 > len(raw):
            raise ValueError("truncated HDR data")
        if raw[offset] == 2 and raw[offset + 1] == 2 and \
                (raw[offset + 2] << 8 | raw[offset + 3]) == width:
            # Adaptive RLE: 4 component planes per scanline.
            offset += 4
            for c in range(4):
                x = 0
                while x < width:
                    count = raw[offset]
                    offset += 1
                    if count > 128:     # run
                        img[y, x:x + count - 128, c] = raw[offset]
                        offset += 1
                        x += count - 128
                    else:               # literal
                        img[y, x:x + count, c] = np.frombuffer(
                            raw, np.uint8, count, offset)
                        offset += count
                        x += count
        else:
            # Flat scanline of RGBE quads.
            row = np.frombuffer(raw, np.uint8, width * 4, offset)
            img[y] = row.reshape(width, 4)
            offset += width * 4

    mantissa = img[..., :3].astype(np.float32)
    exponent = img[..., 3].astype(np.int32) - 136   # 128 + 8 (mantissa/256)
    scale = np.ldexp(np.float32(1.0), exponent).astype(np.float32)
    rgb = mantissa * scale[..., None]
    rgb[img[..., 3] == 0] = 0.0
    return rgb


def write_hdr_rgbe(path: str | Path, rgb: np.ndarray):
    """Write (H, W, 3) float32 as a flat (non-RLE) Radiance .hdr."""
    rgb = np.asarray(rgb, np.float32)
    h, w, _ = rgb.shape
    maxc = rgb.max(axis=-1)
    exp = np.zeros((h, w), np.int32)
    nz = maxc > 1e-32
    exp[nz] = np.floor(np.log2(maxc[nz])).astype(np.int32) + 1
    scale = np.ldexp(np.float32(1.0), -exp + 8)
    quads = np.zeros((h, w, 4), np.uint8)
    quads[..., :3] = np.clip(rgb * scale[..., None] + 0.5, 0,
                             255).astype(np.uint8)
    quads[..., 3] = np.where(nz, exp + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(quads.tobytes())
