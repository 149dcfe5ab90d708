"""Sparse matrix products on padded COO — the framework's hot kernels.

TPU-native replacements for the reference's native-extension calls
(survey section 2.9): `torch.sparse.mm` (cuSPARSE SpMM, used by
`HGCNConv` everywhere, e.g. reference model/graph/KHGRec.py:455-464) and
`torch_scatter.scatter` (the ED-HNN diffusion scatter,
model/layers/layers2/EquivSetConv2.py:85-100).

Formulation: with row-sorted COO (rows, cols, vals),
    (A @ X)[r] = segment_sum(vals * X[cols], rows)
which XLA lowers to a gather + sorted segment reduction — dense,
static-shape, MXU/VPU friendly. Pad entries have val == 0 and
row == nrows (dropped by scatter OOB semantics), so no masking is needed.

A Pallas double-buffered implementation for large graphs lives in
ops/pallas/spmm.py; `spmm` dispatches on backend + problem size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import SparseCOO


def spmm(a: SparseCOO, x: jnp.ndarray) -> jnp.ndarray:
    """A @ X for padded row-sorted COO A: [n, m] x [m, d] -> [n, d].

    Dispatches to the pallas row-window segment-matmul kernel when a
    blocked layout is attached (TPU; ~1.3-1.4x over the XLA
    scatter-add lowering at LastFM scale) and falls back to
    gather + sorted segment_sum otherwise. Row-window-sharded layouts
    (parallel/sharded_adj.py) run as an explicit shard_map collective —
    all_gather the operand, reduce the local edge window.
    """
    from ..parallel.sharded_adj import ShardedCOO, sharded_spmm

    if isinstance(a, ShardedCOO):
        return sharded_spmm(a, x)
    if a.blocked is not None:
        from .pallas.segment_spmm import blocked_spmm

        # blocked.vals are kept in sync with a.vals by with_new_vals /
        # AdjPair.dropped — consuming them directly avoids a per-call
        # packed re-gather (~4 ms at 240k nnz for runtime values)
        return blocked_spmm(a.blocked, x, None)
    gathered = x[a.cols] * a.vals[:, None].astype(x.dtype)
    return jax.ops.segment_sum(
        gathered,
        a.rows,
        num_segments=a.nrows,
        indices_are_sorted=True,
    )


@jax.custom_vjp
def spmm_pair(a: SparseCOO, a_t: SparseCOO, x: jnp.ndarray) -> jnp.ndarray:
    """A @ X where the caller also supplies A^T (same values, transposed
    structure — an AdjPair's two directions).

    The VJP computes dx = A^T @ g with the TRANSPOSED structure's own
    fast path, so both directions ride the pallas MXU kernel instead of
    falling back to an XLA scatter in the backward pass. Adjacency
    values are treated as non-differentiable (they are data or dropout
    masks everywhere in this framework — attention-valued products use
    the segment primitives directly).
    """
    return spmm(a, x)


def _spmm_pair_fwd(a, a_t, x):
    return spmm(a, x), (a, a_t)


def _spmm_pair_bwd(res, g):
    a, a_t = res
    return None, None, spmm(a_t, g)


spmm_pair.defvjp(_spmm_pair_fwd, _spmm_pair_bwd)


def spmm_t(a: SparseCOO, x: jnp.ndarray) -> jnp.ndarray:
    """A.T @ X without materialising the transpose: [m, d] from [n, d].

    Transposed COO is sorted by col, so the segment ids (a.cols) are NOT
    sorted; segment_sum handles that (slower path, still one scatter-add).
    Models that apply A.T repeatedly should carry a pre-transposed
    SparseCOO instead (see GraphBundle.norm_adj_t).
    """
    gathered = x[jnp.clip(a.rows, 0, a.nrows - 1)] * a.vals[:, None].astype(x.dtype)
    return jax.ops.segment_sum(gathered, a.cols, num_segments=a.ncols)


def two_hop(a: SparseCOO, a_t: SparseCOO, x: jnp.ndarray) -> jnp.ndarray:
    """A @ (A.T @ X) — the `HGCNConv` hypergraph convolution primitive.

    Mirrors reference HGCNConv.forward (model/graph/KHGRec.py:455-464):
    two chained SpMMs with the pre-transposed adjacency; both hops (and
    their VJPs) take the blocked fast path when attached.
    """
    return spmm_pair(a, a_t, spmm_pair(a_t, a, x))


def renormalize_sym(a: SparseCOO) -> SparseCOO:
    """Recompute D^-1/2 A D^-1/2 on device from current (possibly
    edge-dropped) values — SGL re-normalises AFTER augmentation
    (SGL.py:145-147 -> ui_graph.py:86-93). Square matrices only."""
    from ..core.types import with_new_vals

    deg = jax.ops.segment_sum(a.vals, a.rows, num_segments=a.nrows, indices_are_sorted=True)
    d_inv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    vals = a.vals * d_inv[jnp.clip(a.rows, 0, a.nrows - 1)] * d_inv[jnp.clip(a.cols, 0, a.ncols - 1)]
    return with_new_vals(a, vals)


def sp_dense_left(x: jnp.ndarray, a: SparseCOO) -> jnp.ndarray:
    """X @ A for dense X: [d, n] x [n, m] -> [d, m] via (A.T @ X.T).T."""
    return spmm_t(a, x.T).T


def scatter_mean(
    values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int, sorted_ids: bool = True
) -> jnp.ndarray:
    """Segment mean — the `torch_scatter.scatter(reduce='mean')` equivalent
    used by the canonical ED-HNN operator (layers2/EquivSetConv2.py:89-93)."""
    sums = jax.ops.segment_sum(
        values, segment_ids, num_segments=num_segments, indices_are_sorted=sorted_ids
    )
    ones = jnp.ones((values.shape[0], 1), values.dtype)
    counts = jax.ops.segment_sum(
        ones, segment_ids, num_segments=num_segments, indices_are_sorted=sorted_ids
    )
    return sums / jnp.maximum(counts, 1.0)


def scatter_sum(
    values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int, sorted_ids: bool = True
) -> jnp.ndarray:
    return jax.ops.segment_sum(
        values, segment_ids, num_segments=num_segments, indices_are_sorted=sorted_ids
    )


def segment_softmax(
    scores: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Numerically-stable softmax over segments (rows of a sparse matrix).

    On-device replacement for the reference's CPU round-trip
    `torch.sparse.softmax(A_in.cpu(), dim=1)` (KGAT.py:388, KHGRec.py:330).
    `valid` masks padded entries out of both max and sum.
    """
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    seg_max = jax.ops.segment_max(scores, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = scores - seg_max[jnp.clip(segment_ids, 0, num_segments - 1)]
    expd = jnp.exp(shifted)
    if valid is not None:
        expd = jnp.where(valid, expd, 0.0)
    seg_sum = jax.ops.segment_sum(expd, segment_ids, num_segments=num_segments)
    denom = seg_sum[jnp.clip(segment_ids, 0, num_segments - 1)]
    return expd / jnp.maximum(denom, 1e-12)
