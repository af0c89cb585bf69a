"""Small-table per-lane gathers tuned for TPU.

MEASURED (Cornell bench, 1M lanes, axon TPU runtime):
- per-COLUMN gathers `table[idx, c]` are catastrophic: XLA lowers each to a
  scalar-core gather staged through SMEM (~13 ms per gather of 1M lanes) —
  the full render pass dropped 35 -> 4.9 Mrays/s when every vec3 table read
  was expressed that way.
- per-ROW gathers `table[idx]` lower to a vectorized VMEM loop and are fine
  even though the (N, W) result is lane-padded.
- for SMALL tables an unrolled select-chain (compare against each row id,
  elementwise select) fuses into the consumer and avoids the gather + the
  padded intermediate entirely.

`rows()` picks the strategy by table height.
"""
from __future__ import annotations

import jax.numpy as jnp

SELECT_MAX = 48  # unroll select-chains up to this many table rows


def rows(table, idx, cols):
    """Gather `cols` (tuple of column ids) of `table` rows at per-lane
    `idx`. Returns a tuple of (N,) arrays, one per requested column."""
    M = table.shape[0]
    if M <= SELECT_MAX:
        outs = []
        for c in cols:
            col = table[:, c] if table.ndim == 2 else table
            out = jnp.broadcast_to(col[0], jnp.shape(idx)).astype(col.dtype)
            for k in range(1, M):
                out = jnp.where(idx == k, col[k], out)
            outs.append(out)
        return tuple(outs)
    r = table[idx]  # vectorized row gather (lane-padded but fast)
    return tuple(r[..., c] for c in cols)


def rows3(table, idx):
    """(M, 3) table -> three (N,) components."""
    return rows(table, idx, (0, 1, 2))


def rows2(table, idx):
    return rows(table, idx, (0, 1))


def scalar(table, idx):
    """(M,) table -> (N,) values."""
    M = table.shape[0]
    if M <= SELECT_MAX:
        out = jnp.broadcast_to(table[0], jnp.shape(idx)).astype(table.dtype)
        for k in range(1, M):
            out = jnp.where(idx == k, table[k], out)
        return out
    return table[idx]
