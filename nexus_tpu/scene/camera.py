"""Thin-lens camera.

TPU-native replacement for Nexus/src/Scene/Camera.{h,cpp} +
the primary-ray setup of GenerateKernel
(Nexus/src/Cuda/PathTracer/PathTracer.cu:85-122). The host fly-camera
controller is dropped (no interactive shell); what remains is the pure
function from (pixel, jitter, lens sample) → ray, precomputed exactly like
Camera::ToDevice (Camera.cpp:142-168): viewport basis spans the focus
plane, lens radius from the defocus angle.

Everything is a differentiable pytree: position / direction / fov /
focus / defocus are all gradient targets for camera optimization.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from nexus_tpu.core.math import cross, normalize
from nexus_tpu.core.sampling import unit_disk
from nexus_tpu.geom.types import Ray


@flax.struct.dataclass
class Camera:
    """Differentiable camera pytree (precomputed basis, D_Camera analog).

    Fields mirror D_Camera (Nexus/src/Cuda/Scene/Camera.cuh:5-15);
    `width`/`height` are static python ints (jit-static shape info).
    """
    position: jnp.ndarray           # (3,)
    right: jnp.ndarray              # (3,)
    up: jnp.ndarray                 # (3,)
    lower_left: jnp.ndarray         # (3,)
    viewport_x: jnp.ndarray         # (3,)
    viewport_y: jnp.ndarray         # (3,)
    lens_radius: jnp.ndarray        # ()
    width: int = flax.struct.field(pytree_node=False, default=256)
    height: int = flax.struct.field(pytree_node=False, default=256)

    @property
    def resolution(self):
        return (self.width, self.height)


def make_camera(position, look_at=None, forward=None, up=(0.0, 1.0, 0.0),
                vfov_deg: float | None = None, hfov_deg: float | None = 60.0,
                width: int = 256, height: int = 256,
                focus_dist: float | None = None,
                defocus_angle_deg: float = 0.0) -> Camera:
    """Build a Camera from look-at parameters.

    Matches Camera::ToDevice (Camera.cpp:142-168): `hfov_deg` is the
    HORIZONTAL field of view (the reference's m_HorizontalFOV); pass
    `vfov_deg` instead to specify vertical. The focus plane sits at
    `focus_dist` (default: |look_at - position| or 1).
    """
    position = jnp.asarray(position, jnp.float32)
    if forward is None:
        assert look_at is not None, "need look_at or forward"
        look_at = jnp.asarray(look_at, jnp.float32)
        offset = look_at - position
        if focus_dist is None:
            focus_dist = float(np.linalg.norm(np.asarray(offset)))
        fwd = normalize(offset)
    else:
        fwd = normalize(jnp.asarray(forward, jnp.float32))
        if focus_dist is None:
            focus_dist = 1.0
    up_hint = jnp.asarray(up, jnp.float32)
    right = normalize(cross(fwd, up_hint))
    up_vec = cross(right, fwd)  # Camera.cpp:145 (right × forward)

    aspect = width / float(height)
    if hfov_deg is None and vfov_deg is None:
        raise ValueError(
            "make_camera needs hfov_deg or vfov_deg (got None for both)")
    if hfov_deg is not None and vfov_deg is None:
        half_w = focus_dist * jnp.tan(jnp.deg2rad(hfov_deg) / 2.0)
        half_h = half_w / aspect
    else:
        half_h = focus_dist * jnp.tan(jnp.deg2rad(vfov_deg) / 2.0)
        half_w = half_h * aspect

    viewport_x = 2.0 * half_w * right
    viewport_y = 2.0 * half_h * up_vec
    lower_left = position - viewport_x / 2.0 - viewport_y / 2.0 \
        + fwd * focus_dist
    lens_radius = focus_dist * jnp.tan(jnp.deg2rad(defocus_angle_deg) / 2.0)

    return Camera(position=position, right=right, up=up_vec,
                  lower_left=lower_left, viewport_x=viewport_x,
                  viewport_y=viewport_y,
                  lens_radius=jnp.asarray(lens_radius, jnp.float32),
                  width=width, height=height)


def generate_rays(camera: Camera, pixel_idx: jnp.ndarray,
                  u: jnp.ndarray) -> Ray:
    """Primary rays for flat pixel indices with sub-pixel + lens jitter.

    Matches GenerateKernel (PathTracer.cu:96-113): pixel (i, j) with
    i = index % width, j = index / width; normalized jittered (x, y);
    thin-lens offset on the right/up basis. u is (..., 4):
    u[0:2] pixel jitter, u[2:4] lens disk sample.
    """
    w = camera.width
    j = (pixel_idx // w).astype(jnp.float32)
    i = (pixel_idx % w).astype(jnp.float32)
    x = (i + u[..., 0]) / w
    y = (j + u[..., 1]) / camera.height

    rd = camera.lens_radius * unit_disk(u[..., 2], u[..., 3])
    offset = rd[..., 0:1] * camera.right + rd[..., 1:2] * camera.up
    origin = camera.position + offset
    target = camera.lower_left + x[..., None] * camera.viewport_x \
        + y[..., None] * camera.viewport_y
    direction = normalize(target - origin)
    return Ray(origin=origin, direction=direction)
