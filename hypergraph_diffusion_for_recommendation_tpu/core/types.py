"""Device-resident sparse formats (pytrees).

The reference juggles five graph representations (scipy CSR, dense
`todense()` tensors, torch sparse COO, edge_index LongTensors, V/E index
lists — survey section 7.1). Here there is ONE canonical device format:
row-sorted padded COO (`SparseCOO`). Padding keeps shapes static under
`jit`: pad entries carry `row = nrows` (dropped by out-of-bound scatter
semantics) and `val = 0` so every kernel is correct without masking.

All row/col indices are int32 (TPU-native), values float32 by default.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@struct.dataclass
class SparseCOO:
    """Row-sorted padded COO sparse matrix.

    rows/cols/vals have identical padded length. Pad entries: row == nrows
    (out of range -> dropped by segment ops), col == 0, val == 0.
    """

    rows: jnp.ndarray  # [nnz_pad] int32, non-decreasing
    cols: jnp.ndarray  # [nnz_pad] int32
    vals: jnp.ndarray  # [nnz_pad] float
    nrows: int = struct.field(pytree_node=False)
    ncols: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)  # true (unpadded) count
    # optional pallas fast-path layout (ops/pallas/segment_spmm.py).
    # INVARIANT: blocked.vals must mirror `vals` (packed via blocked.src).
    # Replace values ONLY through `with_new_vals` (or AdjPair.dropped),
    # never `replace(vals=...)` directly — spmm reads the packed copy
    # (a per-call packed re-gather of runtime vals measured ~4 ms at
    # 240k nnz on TPU; syncing once per mutation amortises it away).
    blocked: object = None

    @property
    def shape(self) -> tuple[int, int]:
        return (self.nrows, self.ncols)

    @property
    def nnz_pad(self) -> int:
        return int(self.rows.shape[0])


def with_new_vals(sp: SparseCOO, vals: jnp.ndarray) -> SparseCOO:
    """Replace edge values, keeping the packed pallas layout in sync.

    One gather per MUTATION (vs. one per spmm call); the packed copy is
    what the kernel consumes. Always use this instead of
    `sp.replace(vals=...)`."""
    if sp.blocked is None:
        return sp.replace(vals=vals)
    b = sp.blocked
    live = b.local_rows.reshape(-1) < b.rb
    packed = jnp.where(live, vals[b.src.reshape(-1)], 0.0).reshape(b.vals.shape)
    return sp.replace(vals=vals, blocked=b.replace(vals=packed))


def from_scipy(mat, pad_multiple: int = 8, dtype=np.float32) -> SparseCOO:
    """Convert a scipy sparse matrix to row-sorted padded SparseCOO."""
    from .. import native

    coo = mat.tocoo()
    order = native.sort_pairs(coo.row, coo.col)
    rows = coo.row[order].astype(np.int32)
    cols = coo.col[order].astype(np.int32)
    vals = coo.data[order].astype(dtype)
    nnz = rows.shape[0]
    nnz_pad = max(pad_to_multiple(nnz, pad_multiple), pad_multiple)
    pad = nnz_pad - nnz
    if pad:
        rows = np.concatenate([rows, np.full(pad, mat.shape[0], np.int32)])
        cols = np.concatenate([cols, np.zeros(pad, np.int32)])
        vals = np.concatenate([vals, np.zeros(pad, dtype)])
    return SparseCOO(
        rows=jnp.asarray(rows),
        cols=jnp.asarray(cols),
        vals=jnp.asarray(vals),
        nrows=int(mat.shape[0]),
        ncols=int(mat.shape[1]),
        nnz=int(nnz),
    )


def from_edges(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray | None,
    shape: tuple[int, int],
    pad_multiple: int = 8,
    dtype=np.float32,
) -> SparseCOO:
    """Build padded SparseCOO straight from (row, col[, val]) edge arrays."""
    rows = np.asarray(rows, np.int32)
    cols = np.asarray(cols, np.int32)
    if vals is None:
        vals = np.ones(rows.shape[0], dtype)
    vals = np.asarray(vals, dtype)
    from .. import native

    order = native.sort_pairs(rows, cols)
    rows, cols, vals = rows[order], cols[order], vals[order]
    nnz = rows.shape[0]
    nnz_pad = max(pad_to_multiple(nnz, pad_multiple), pad_multiple)
    pad = nnz_pad - nnz
    if pad:
        rows = np.concatenate([rows, np.full(pad, shape[0], np.int32)])
        cols = np.concatenate([cols, np.zeros(pad, np.int32)])
        vals = np.concatenate([vals, np.zeros(pad, dtype)])
    return SparseCOO(
        rows=jnp.asarray(rows),
        cols=jnp.asarray(cols),
        vals=jnp.asarray(vals),
        nrows=int(shape[0]),
        ncols=int(shape[1]),
        nnz=int(nnz),
    )


def to_scipy(sp: SparseCOO):
    """Densify back to scipy COO (tests / host-side precompute)."""
    import scipy.sparse as sps

    rows = np.asarray(sp.rows)[: sp.nnz]
    cols = np.asarray(sp.cols)[: sp.nnz]
    vals = np.asarray(sp.vals)[: sp.nnz]
    return sps.coo_matrix((vals, (rows, cols)), shape=sp.shape)


def transpose_coo(sp: SparseCOO, pad_multiple: int = 8) -> SparseCOO:
    """Host-side transpose (re-sorts by new row). Init-time only."""
    rows = np.asarray(sp.rows)[: sp.nnz]
    cols = np.asarray(sp.cols)[: sp.nnz]
    vals = np.asarray(sp.vals)[: sp.nnz]
    return from_edges(cols, rows, vals, (sp.ncols, sp.nrows), pad_multiple)


def padded_rows_from_lists(
    lists: list[np.ndarray] | list[list[int]],
    fill: int,
    width: int | None = None,
    pad_multiple: int = 8,
    max_width: int | None = None,
) -> np.ndarray:
    """Pack ragged per-row index lists into a dense [n, width] int32 array.

    Used for per-user rated-item masks and test-set membership (replaces
    the reference's host-side dict loops, base/main_recommender.py:86-88).
    """
    n = len(lists)
    if width is None:
        width = max((len(l) for l in lists), default=1)
        width = max(pad_to_multiple(max(width, 1), pad_multiple), pad_multiple)
        if max_width is not None:
            width = min(width, max_width)
    out = np.full((n, width), fill, np.int32)
    for i, l in enumerate(lists):
        l = np.asarray(l, np.int32)[:width]
        out[i, : len(l)] = l
    return out
