"""Vector / frame math for the path tracer.

TPU-native replacement for the reference's vendored ``cuda_math.h`` vector
library and ``Cuda/Utils.cuh`` helpers. Everything here operates on
``jnp`` arrays whose last axis is the vector axis (3 for points/dirs,
4 for quaternions), so every function broadcasts over arbitrary leading
batch axes and is differentiable.

Reference semantics matched (file:line cites into /root/reference):
  - quaternion rotation-to-Z-axis frames: Nexus/src/Utils/cuda_math.h:1514-1535
  - OffsetRay integer-ulp self-intersection offset: Nexus/src/Cuda/Utils.cuh:59-74
  - barycentric lerp: Nexus/src/Cuda/Utils.cuh:46-51
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the last axis, keeps no dims."""
    return jnp.sum(a * b, axis=-1)


def dot_keep(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1, keepdims=True)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Safe normalize: returns v/|v|, guarding |v|≈0 against NaN grads."""
    n2 = jnp.maximum(dot_keep(v, v), EPS * EPS)
    return v * jax.lax.rsqrt(n2)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect incident direction v about normal n (v pointing toward surface)."""
    return v - 2.0 * dot_keep(v, n) * n


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    return dot(rgb, jnp.asarray([0.2126, 0.7152, 0.0722], rgb.dtype))


def sgne(x: jnp.ndarray) -> jnp.ndarray:
    """Sign with sgne(0) = +1 (the reference's Utils::SgnE semantics)."""
    return jnp.where(x < 0.0, -1.0, 1.0)


def square(x: jnp.ndarray) -> jnp.ndarray:
    return x * x


def barycentric(t0: jnp.ndarray, t1: jnp.ndarray, t2: jnp.ndarray,
                uv: jnp.ndarray) -> jnp.ndarray:
    """Barycentric lerp with uv = (u, v) weights for t1, t2.

    Matches ``Barycentric`` in Nexus/src/Cuda/Utils.cuh:46-51:
    result = u*t1 + v*t2 + (1-u-v)*t0.
    """
    u = uv[..., 0:1]
    v = uv[..., 1:2]
    return u * t1 + v * t2 + (1.0 - u - v) * t0


# ---------------------------------------------------------------------------
# Quaternion local shading frames (cuda_math.h:1514-1535 semantics)
# ---------------------------------------------------------------------------

def rotation_to_z(direction: jnp.ndarray) -> jnp.ndarray:
    """Quaternion q s.t. rotate(q, direction) = +Z. direction must be unit.

    Matches getRotationToZAxis (Nexus/src/Utils/cuda_math.h:1514-1518)
    including the antipodal guard for direction ≈ -Z.
    """
    dx, dy, dz = direction[..., 0], direction[..., 1], direction[..., 2]
    q = jnp.stack([dy, -dx, jnp.zeros_like(dx), 1.0 + dz], axis=-1)
    q = normalize(q)
    flip = (dz < -0.99999)[..., None]
    q_flip = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0, 0.0], direction.dtype), q.shape)
    return jnp.where(flip, q_flip, q)


def invert_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a unit quaternion (cuda_math.h:1527-1530)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by unit quaternion q = (x, y, z, w).

    Matches rotatePoint (cuda_math.h:1532-1535).
    """
    axis = q[..., :3]
    w = q[..., 3:4]
    return (2.0 * dot_keep(axis, v) * axis
            + (w * w - dot_keep(axis, axis)) * v
            + 2.0 * w * jnp.cross(axis, v))


def to_local_frame(normal: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Express world vector v in the local frame whose +Z is `normal`."""
    return rotate(rotation_to_z(normal), v)


def to_world_frame(normal: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Express local-frame vector v (Z-up around `normal`) in world space."""
    return rotate(invert_rotation(rotation_to_z(normal)), v)


# ---------------------------------------------------------------------------
# Self-intersection avoidance (Ray Tracing Gems ch.6; Cuda/Utils.cuh:52-74)
# ---------------------------------------------------------------------------

_ORIGIN = 1.0 / 32.0
_FLOAT_SCALE = 1.0 / 65536.0
_INT_SCALE = 256.0


def offset_ray(p: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Offset point p along normal n by an integer-ulp step.

    TPU re-expression of the reference's bit-trick (Cuda/Utils.cuh:59-74):
    the int arithmetic runs on int32 bitcasts via lax.bitcast_convert_type.
    Gradients flow through an identity straight-through: the offset is a
    discrete nudge, so we treat it as stop_gradient(p_off - p) + p.
    """
    of_i = (_INT_SCALE * n).astype(jnp.int32)
    p_i = jax.lax.bitcast_convert_type(p, jnp.int32)
    p_i = p_i + jnp.where(p < 0.0, -of_i, of_i)
    p_int = jax.lax.bitcast_convert_type(p_i, jnp.float32)
    p_float = p + _FLOAT_SCALE * n
    p_off = jnp.where(jnp.abs(p) < _ORIGIN, p_float, p_int)
    return p + jax.lax.stop_gradient(p_off - p)
