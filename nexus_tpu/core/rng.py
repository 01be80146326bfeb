"""Stateless counter-based RNG for Monte Carlo rendering.

The reference uses a mutable xorshift32 state seeded by a Jenkins hash of
(pixel, frame) (Nexus/src/Cuda/Random.cuh:24-87). We keep the same cheap
generator family but make it *functional*: state in, (state, sample) out,
so it threads through ``lax.scan`` and is identical regardless of how rays
are sharded across chips — renders are bit-reproducible on 1 or N devices
(fixing the reference's queue-order-dependent seeding, Random.cuh:79-82).

All ops are uint32 vector math: ideal for the TPU VPU, no key-splitting
tree like jax.random (too expensive per bounce per ray).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def jenkins_hash(x: jnp.ndarray) -> jnp.ndarray:
    """Jenkins one-at-a-time finalizer (Random.cuh:24-32 semantics)."""
    x = x.astype(_U32)
    x = x + (x << 10)
    x = x ^ (x >> 6)
    x = x + (x << 3)
    x = x ^ (x >> 11)
    x = x + (x << 15)
    return x


def init_state(pixel_idx: jnp.ndarray, sample_idx, extra=0) -> jnp.ndarray:
    """Per-pixel, per-sample seed: hash(pixel ^ hash(sample ^ hash(extra))).

    Unlike the reference's InitRNG (Random.cuh:71-82) this never depends on
    queue order, so compaction/sharding cannot change the sample sequence.
    """
    seed = jenkins_hash(jnp.asarray(extra, _U32))
    seed = jenkins_hash(jnp.asarray(sample_idx, _U32) ^ seed)
    state = jnp.asarray(pixel_idx, _U32) ^ seed
    state = jnp.where(state == 0, _U32(1), state)
    return jenkins_hash(state)


def _xorshift(state: jnp.ndarray) -> jnp.ndarray:
    state = state ^ (state << 13)
    state = state ^ (state >> 17)
    state = state ^ (state << 5)
    return state


def _uint_to_float(x: jnp.ndarray) -> jnp.ndarray:
    """Map uint32 → float32 in [0, 1) via mantissa bit-stuffing.

    Same construction as Random.cuh:66-69: 0x3f800000 | (x >> 9) is a
    float in [1, 2); subtract 1.
    """
    bits = _U32(0x3F800000) | (x >> 9)
    return jax.lax.bitcast_convert_type(bits, jnp.float32) - 1.0


def rand(state: jnp.ndarray):
    """Draw one uniform float in [0,1) per lane. Returns (new_state, u)."""
    state = _xorshift(state)
    return state, _uint_to_float(state)


def rand2(state: jnp.ndarray):
    """Draw two uniforms; returns (state, u1, u2)."""
    state, u1 = rand(state)
    state, u2 = rand(state)
    return state, u1, u2
