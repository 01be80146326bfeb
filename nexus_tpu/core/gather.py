"""Gather strategies tuned for TPU.

XLA lowers `table[ids]` on TPU to a sequential per-index loop: ~2.6 ms
per 65k indices REGARDLESS of table size (measured on v5e — the cost is
per index, extra columns and extra same-index gathers are nearly free).
For small tables that is absurd: a one-hot contraction
(`(ids == arange(M)) @ table`) is a dense VPU/MXU op costing O(N*M)
vectorized flops — microseconds for M <= 64 — and its VJP is a matmul
too (the gather VJP is a serial scatter-add, which was a large part of
the slow backward pass).

`take_small` auto-switches on the STATIC table height.
"""

from __future__ import annotations

import jax.numpy as jnp

ONEHOT_MAX_ROWS = 64


def take_small(table: jnp.ndarray, ids: jnp.ndarray,
               cap: int = ONEHOT_MAX_ROWS) -> jnp.ndarray:
    """table[ids] via one-hot contraction when table height <= cap.

    table: (M, ...) array; ids: integer array of any shape.
    Returns table[ids] with shape ids.shape + table.shape[1:].
    Integer/bool tables go through an exact integer one-hot sum; float
    tables through a (differentiable) matmul.
    """
    m = table.shape[0]
    if m > cap:
        return jnp.take(table, ids, axis=0)
    # Clamp so both paths share jnp.take's out-of-range semantics (the
    # one-hot would otherwise map bad ids to zeros — a silent semantic
    # flip when a table crosses the cap).
    ids = jnp.clip(ids, 0, m - 1)
    iota = jnp.arange(m, dtype=jnp.int32)
    eq = ids[..., None].astype(jnp.int32) == iota        # ids.shape + (M,)
    if jnp.issubdtype(table.dtype, jnp.floating):
        oh = eq.astype(table.dtype)
        flat = table.reshape(m, -1)
        # precision='highest': on TPU the MXU would otherwise run this
        # contraction in bf16, silently quantizing the gathered table
        # values (instance transforms, material parameters) on the TPU
        # backend only — measured as a ~6% systematic energy shift on
        # the instanced scene vs the f32 CPU render. With 0/1 one-hot
        # weights and highest precision the selection is exact.
        out = jnp.einsum("...m,mc->...c", oh, flat, precision="highest")
        return out.reshape(ids.shape + table.shape[1:])
    # Exact path for int/bool payloads (no float roundtrip).
    flat = table.reshape(m, -1)
    out = jnp.sum(eq[..., None].astype(flat.dtype) * flat, axis=-2)
    return out.reshape(ids.shape + table.shape[1:])
