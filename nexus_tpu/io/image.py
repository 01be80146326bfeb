"""Image IO: PNG write (display-referred) and HDR .npy/.exr-style output.

Replaces the reference's stb-based screenshot path
(Nexus/src/Renderer/Renderer.cpp:183-215, 8-bit PNG of the displayed
texture) and adds HDR output for loss computation / resumable renders.
PNG via PIL (available in the environment); HDR stored as .npy (portable,
lossless float32 — EXR libs aren't available here).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from nexus_tpu.core.tonemap import to_display


def write_png(path: str | Path, hdr_rgb, exposure: float = 0.6):
    """Tonemap (ACES + gamma, PathTracer.cu:48-62) and write an 8-bit PNG."""
    from PIL import Image

    rgb = np.asarray(to_display(np.asarray(hdr_rgb, np.float32), exposure))
    img = (np.clip(rgb, 0.0, 1.0) * 255.0).astype(np.uint8)
    Image.fromarray(img).save(str(path))


def write_hdr(path: str | Path, hdr_rgb):
    """HDR radiance output. `.hdr` -> Radiance RGBE (io/hdr.py writer,
    readable by every HDR tool); anything else -> lossless float32
    .npy."""
    path = str(path)
    if path.endswith(".hdr"):
        from nexus_tpu.io.hdr import write_hdr_rgbe

        write_hdr_rgbe(path, np.asarray(hdr_rgb, np.float32)[..., :3])
    else:
        np.save(path, np.asarray(hdr_rgb, np.float32))


def read_image(path: str | Path) -> np.ndarray:
    """Read an LDR image file to float32 RGB(A) in [0, 1]."""
    from PIL import Image

    img = np.asarray(Image.open(str(path)).convert("RGBA"), np.float32)
    return img / 255.0
