"""Per-lane table gathers tuned for TPU.

MEASURED (Cornell bench, 1M lanes, axon TPU runtime):
- 2-D per-column gathers `table[idx, c]` and multi-dim-index gathers
  (`t[a, b, c]`) lower to a scalar-core path costing ~13 ms per op — the
  full render pass dropped 35 -> 4.9 Mrays/s when every vec3 table read
  was expressed that way.
- 1-D gathers `col[idx]` (gather from a rank-1 operand) use the fast
  vectorized path: extracting the column statically first and gathering
  the rank-1 array measured FASTER than both row gathers and unrolled
  select-chains (65.7 vs 61.3 vs 38.4 Mrays/s), at O(1) HLO nodes.
- row gathers `table[idx]` are also vectorized; preferred for LARGE tables
  where per-column extraction would copy the whole table per call.

Microbenchmarks of isolated gathers do NOT reproduce the 2-D pathology —
only full-pass traces show it (benchmarks/profile_trace.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

COLUMN_MAX = 4096  # up to this many rows, extract columns + 1-D gather
ONEHOT_VJP_MAX = 256  # custom one-hot-matmul adjoint up to this many rows


@jax.custom_vjp
def _gather_1d(col, idx):
    """col[idx] with an MXU-friendly adjoint.

    XLA's native VJP of a gather is a scatter-add; a 1M-lane scatter into a
    tiny table serializes on TPU (~100 ms per site — it made the adjoint
    pass 50x slower than forward). The custom backward computes the same
    segment sum as a one-hot matmul: ct (N,) x onehot(idx) (N, M) -> (M,)
    runs on the MXU in one pass."""
    return col[idx]


def _gather_1d_fwd(col, idx):
    return col[idx], (idx, col.shape[0])


def _gather_1d_bwd(res, ct):
    idx, M = res
    oh = jax.nn.one_hot(idx, M, dtype=ct.dtype)
    # contract over ALL index dims (matmul for the hot (N,) case; a plain
    # scale for 0-d cotangents — scalar-index gathers like the constant
    # env emitter's spectrum slot reach here under the adjoint)
    ax = tuple(range(ct.ndim))
    d_col = jnp.tensordot(ct, oh, axes=(ax, ax))
    # np.shape: idx may be a plain python int (static scalar index)
    return d_col, np.zeros(np.shape(idx), jax.dtypes.float0)


_gather_1d.defvjp(_gather_1d_fwd, _gather_1d_bwd)


def _g1(col, idx):
    if col.shape[0] <= ONEHOT_VJP_MAX and jnp.issubdtype(col.dtype,
                                                         jnp.floating):
        return _gather_1d(col, idx)
    return col[idx]


def onehot_rows(table, idx):
    """(M, K) table + (N,) int idx -> (N, K) rows via a one-hot matmul.

    Gather-free forward for SMALL tables on TPU: a one-hot (N, M) against
    the table runs on the MXU in one pass, vs ~7 ns/element for a real
    gather (the measured 0.1 G elem/s scalar-core wall). Use for hot-path
    lookups into tables of <= ~128 rows (e.g. the CIE 5 nm tables)."""
    oh = jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype)
    return oh @ jnp.asarray(table)


def rows(table, idx, cols):
    """Gather `cols` (tuple of column ids) of `table` rows at per-lane
    `idx`. Returns a tuple of (N,) arrays, one per requested column."""
    if table.ndim == 1:
        return tuple(_g1(table, idx) for _ in cols)
    if table.shape[0] <= COLUMN_MAX:
        return tuple(_g1(table[:, c], idx) for c in cols)
    r = table[idx]  # row gather: avoids copying a huge table per column
    return tuple(r[..., c] for c in cols)


def rows3(table, idx):
    """(M, 3) table -> three (N,) components."""
    return rows(table, idx, (0, 1, 2))


def rows2(table, idx):
    return rows(table, idx, (0, 1))


def scalar(table, idx):
    """(M,) table -> (N,) values (1-D fast path, MXU adjoint when small)."""
    return _g1(table, idx)
