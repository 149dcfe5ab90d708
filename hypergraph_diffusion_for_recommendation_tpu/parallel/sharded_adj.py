"""Row-window-sharded adjacency: sharded graph diffusion for the
production trainer.

The GSPMD trainer shards embedding TABLES (model axis) and the BATCH
(data axis) but replicates every adjacency on every device, so the
maximum graph is bounded by one chip's HBM (survey 2.8: the north star
asks for "sharding the nnz dimension of incidence for diffusion"). This
module removes that bound: the row space of a sparse matrix is split
into S contiguous windows over the mesh's `model` axis, each device
holds ONLY its window's edges (nnz/S per device), and

    (A @ X)[window s] = segment-reduce over the LOCAL edges of an
                        all-gathered operand

runs as a `shard_map` region nested inside the trainer's jit — the
collective schedule is explicit (one tiled all_gather of X per hop over
ICI; its transpose is a reduce-scatter), nothing is delegated to the
partitioner. The per-window reduction itself is the SAME pallas
row-window segment-matmul kernel the single-chip path uses
(ops/pallas/segment_spmm.py), packed per shard at build time.

Numerics match the single-device path: edges keep their global
(row, col)-sorted order inside each window, and edge dropout draws from
the same counter-hash on GLOBAL canonical edge ids (`canon`), so a
sharded and an unsharded run of the same model see identical dropout
masks (tests/test_sharded_diffusion.py asserts trained-parameter
equality).

Replaces the reference's nothing — the reference is single-GPU and its
largest graphs are materialised DENSE (HGNN_HD3.py:386-387).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import pad_to_multiple
from .mesh import MODEL_AXIS


@struct.dataclass
class ShardedCOO:
    """Row-window sharded, row-sorted, padded COO.

    All array fields carry a leading shard axis of size S = mesh model
    size and are device_put with `P(MODEL_AXIS, ...)` so each device
    holds 1/S of the edges. `lrows` are window-LOCAL destination rows
    (pad = rps, dropped by the out-of-range segment write); `cols` stay
    GLOBAL (they index the all-gathered operand).
    """

    lrows: jnp.ndarray  # [S, e_pad] int32 in [0, rps]; pad = rps
    cols: jnp.ndarray  # [S, e_pad] int32 global column ids
    vals: jnp.ndarray  # [S, e_pad] f32 (pad 0)
    canon: jnp.ndarray  # [S, e_pad] int32 GLOBAL canonical edge id
    # optional per-shard pallas layout: BlockedCOO whose array fields
    # carry the same leading S axis; static fields describe ONE shard
    blocked: object = None
    nrows: int = struct.field(pytree_node=False, default=0)
    ncols: int = struct.field(pytree_node=False, default=0)
    nnz: int = struct.field(pytree_node=False, default=0)
    rps: int = struct.field(pytree_node=False, default=0)  # rows per shard
    mesh: Mesh = struct.field(pytree_node=False, default=None)
    axis: str = struct.field(pytree_node=False, default=MODEL_AXIS)
    # balanced (edge-partition) mode: each shard holds exactly ~nnz/S
    # CONSECUTIVE sorted edges regardless of row skew; `lrows` are then
    # GLOBAL rows (pad = S*rps), each device reduces its edges into a
    # full [S*rps, d] partial and a psum_scatter re-shards the output.
    # Window mode (default) needs no output collective but pads every
    # shard to the heaviest row window's nnz.
    balanced: bool = struct.field(pytree_node=False, default=False)

    @property
    def shape(self) -> tuple[int, int]:
        return (self.nrows, self.ncols)

    @property
    def n_shards(self) -> int:
        return int(self.lrows.shape[0])


def _shard_windows(rows, cols, vals, canon, n_shards: int, rps: int):
    """Split globally row-sorted live edges into per-shard padded arrays."""
    starts = np.searchsorted(rows, np.arange(n_shards) * rps, side="left")
    ends = np.append(starts[1:], rows.shape[0])
    n_per = ends - starts
    e_pad = max(pad_to_multiple(max(int(n_per.max()) if len(n_per) else 1, 1), 8), 8)
    lr = np.full((n_shards, e_pad), rps, np.int32)
    cc = np.zeros((n_shards, e_pad), np.int32)
    vv = np.zeros((n_shards, e_pad), np.float32)
    cn = np.zeros((n_shards, e_pad), np.int32)
    for s in range(n_shards):
        lo, hi = int(starts[s]), int(ends[s])
        n = hi - lo
        lr[s, :n] = rows[lo:hi] - s * rps
        cc[s, :n] = cols[lo:hi]
        vv[s, :n] = vals[lo:hi]
        cn[s, :n] = canon[lo:hi]
    return lr, cc, vv, cn


def _shard_edges_balanced(rows, cols, vals, canon, n_shards: int, n_pad: int):
    """Split globally row-sorted live edges into S equal consecutive
    chunks (perfect nnz balance; rows stay GLOBAL, pad row = n_pad)."""
    nnz = rows.shape[0]
    e_pad = max(pad_to_multiple(-(-nnz // n_shards), 8), 8)
    lr = np.full((n_shards, e_pad), n_pad, np.int32)
    cc = np.zeros((n_shards, e_pad), np.int32)
    vv = np.zeros((n_shards, e_pad), np.float32)
    cn = np.zeros((n_shards, e_pad), np.int32)
    chunk = -(-nnz // n_shards)
    for s in range(n_shards):
        lo, hi = s * chunk, min((s + 1) * chunk, nnz)
        n = max(hi - lo, 0)
        lr[s, :n] = rows[lo:hi]
        cc[s, :n] = cols[lo:hi]
        vv[s, :n] = vals[lo:hi]
        cn[s, :n] = canon[lo:hi]
    return lr, cc, vv, cn


def _pack_shard_blocked(lr, cc, vv, cn, n_shards, out_rows, ncols, bf16,
                        balanced=False):
    """Per-shard pallas layouts stacked on a leading shard axis.

    Each shard's edges are packed independently (`pack_blocked` on the
    (out_rows, ncols)-shaped local matrix — out_rows = rps in window
    mode, S*rps in balanced mode); block counts are padded to the max
    across shards with inert all-pad blocks (local_rows = rb match no
    row; wmap repeats the last window so the kernel re-accumulates
    zeros into an already-written tile).
    """
    from ..ops.pallas.segment_spmm import ROW_BLOCK, pack_blocked, pack_blocked_dedup
    from ..data.device import dedup_auto

    # one layout decision for ALL shards (uniform stacked structure),
    # taken on the pooled edges — same selector as the single-chip path
    # (1.89x at ML-1M density, BENCH_NOTES round 3)
    from ..data import device as _devmod

    env = _devmod.PALLAS_DEDUP
    if env in ("0", "1"):
        use_dedup = env == "1"
    else:
        if balanced:
            # balanced mode: lrows are already GLOBAL (pad = out_rows)
            g_rows, g_nrows = lr.reshape(-1), out_rows
        else:
            # window mode: offset each shard's local rows so windows
            # don't collide across shards in the multiplicity count
            offs = (np.arange(n_shards, dtype=np.int64) * out_rows)[:, None]
            g_rows = np.where(lr < out_rows, lr + offs, n_shards * out_rows)
            g_rows, g_nrows = g_rows.reshape(-1), n_shards * out_rows
        use_dedup = dedup_auto(g_rows, cc.reshape(-1), (g_nrows, ncols), ROW_BLOCK)
    pack = pack_blocked_dedup if use_dedup else pack_blocked

    per = []
    for s in range(n_shards):
        b = pack(lr[s], cc[s], vv[s], (out_rows, ncols), bf16=bf16,
                 canon_map=cn[s])
        if _devmod.PALLAS_INT8:
            b = b.replace(int8=True)
        per.append(b)
    nb_max = max(b.n_blocks for b in per)  # already a multiple of 8

    def pad_stack(get, pad_value, pad_mode="constant"):
        outs = []
        for b in per:
            a = np.asarray(get(b))
            pad = nb_max - a.shape[0]
            if pad:
                if pad_mode == "edge":
                    a = np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1), mode="edge")
                else:
                    a = np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                               constant_values=pad_value)
            outs.append(a)
        return jnp.asarray(np.stack(outs))

    b0 = per[0]
    out = b0.replace(
        cols=pad_stack(lambda b: b.cols, 0),
        vals=pad_stack(lambda b: b.vals, 0.0),
        local_rows=pad_stack(lambda b: b.local_rows, b0.rb),
        wmap=pad_stack(lambda b: b.wmap, 0, pad_mode="edge"),
        src=pad_stack(lambda b: b.src, 0),
        canon=pad_stack(lambda b: b.canon, 0),
        n_blocks=int(nb_max),
    )
    if b0.ucols is not None:
        # dedup layout: stack the distinct-col gather arrays too; inert
        # pad blocks gather row 0 (ucols 0) and match no edge (lcols=ub)
        out = out.replace(
            ucols=pad_stack(lambda b: b.ucols, 0),
            local_cols=pad_stack(lambda b: b.local_cols, b0.ub),
        )
    return out


def shard_sparse(
    rows,
    cols,
    vals,
    shape,
    mesh: Mesh,
    canon=None,
    axis: str = MODEL_AXIS,
    attach_blocked: bool | None = None,
    mode: str = "auto",
) -> ShardedCOO:
    """Host-side build of a ShardedCOO from live (row,col,val) edges.

    Edges need not be pre-sorted; they are (row, col)-sorted here.
    `canon` gives each INPUT edge its global canonical id (defaults to
    the position in the sorted order — the same ids the unsharded
    padded-COO layout uses, so dropout masks agree across layouts).

    `mode`: "window" pins each shard to a contiguous row window (no
    output collective, but every shard pads to the heaviest window's
    nnz); "balanced" gives each shard exactly ~nnz/S edges (skew-proof
    memory and compute, one psum_scatter per hop); "auto" picks
    balanced when the heaviest window holds > 1.5x the mean.
    """
    from .. import native
    from ..data import device as _dev

    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.float32)
    order = native.sort_pairs(rows, cols)
    rows, cols, vals = rows[order], cols[order], vals[order]
    canon = np.arange(rows.shape[0]) if canon is None else np.asarray(canon)[order]

    n_shards = int(mesh.shape[axis])
    rps = pad_to_multiple(-(-int(shape[0]) // n_shards), 8)
    if mode == "auto":
        starts = np.searchsorted(rows, np.arange(n_shards) * rps, side="left")
        n_per = np.append(starts[1:], rows.shape[0]) - starts
        mean = max(rows.shape[0] / n_shards, 1.0)
        mode = "balanced" if int(n_per.max()) > 1.5 * mean else "window"
    balanced = mode == "balanced"
    if balanced:
        lr, cc, vv, cn = _shard_edges_balanced(
            rows, cols, vals, canon, n_shards, n_shards * rps)
    else:
        lr, cc, vv, cn = _shard_windows(rows, cols, vals, canon, n_shards, rps)

    blocked = None
    if attach_blocked is None:
        attach_blocked = (
            not _dev.PALLAS_DISABLE
            and jax.default_backend() == "tpu"
            and _dev.PALLAS_MIN_NNZ <= rows.shape[0] <= _dev.PALLAS_MAX_NNZ
        )
    if attach_blocked:
        out_rows = n_shards * rps if balanced else rps
        blocked = _pack_shard_blocked(lr, cc, vv, cn, n_shards, out_rows,
                                      int(shape[1]), _dev.PALLAS_BF16,
                                      balanced=balanced)

    shard_rows = NamedSharding(mesh, P(axis))
    put = lambda a: jax.device_put(jnp.asarray(a), shard_rows)
    if blocked is not None:
        blocked = blocked.replace(
            cols=put(blocked.cols), vals=put(blocked.vals),
            local_rows=put(blocked.local_rows), wmap=put(blocked.wmap),
            src=put(blocked.src), canon=put(blocked.canon),
        )
        if blocked.ucols is not None:
            blocked = blocked.replace(
                ucols=put(blocked.ucols), local_cols=put(blocked.local_cols)
            )
    return ShardedCOO(
        lrows=put(lr), cols=put(cc), vals=put(vv), canon=put(cn),
        blocked=blocked,
        nrows=int(shape[0]), ncols=int(shape[1]), nnz=int(rows.shape[0]),
        rps=rps, mesh=mesh, axis=axis, balanced=balanced,
    )


def _local_blocked(b, leaf_index):
    """The per-device BlockedCOO view (leading shard axis stripped)."""
    out = b.replace(
        cols=b.cols[leaf_index], vals=b.vals[leaf_index],
        local_rows=b.local_rows[leaf_index], wmap=b.wmap[leaf_index],
        src=b.src[leaf_index], canon=b.canon[leaf_index],
    )
    if b.ucols is not None:
        out = out.replace(
            ucols=b.ucols[leaf_index], local_cols=b.local_cols[leaf_index]
        )
    return out


def sharded_spmm(a: ShardedCOO, x: jnp.ndarray) -> jnp.ndarray:
    """A @ X with A row-window sharded over the mesh's model axis.

    Collective schedule (explicit, per call): the operand arrives
    row-sharded (GSPMD reshards if needed), each device all-gathers it
    (tiled, ICI bandwidth O(m*d)), reduces its OWN edge window with the
    pallas segment-matmul (or the XLA segment-sum fallback), and emits
    its rows — output sharded P(model, None). The all_gather transposes
    to a reduce-scatter in the backward pass, so gradients stay sharded
    too. Differentiable in x (adjacency values are data, not params).
    """
    mesh, axis = a.mesh, a.axis
    S = a.n_shards
    d = x.shape[1]
    m_pad = pad_to_multiple(x.shape[0], S)
    if m_pad != x.shape[0]:
        x = jnp.pad(x, ((0, m_pad - x.shape[0]), (0, 0)))

    has_blocked = a.blocked is not None
    n_out = S * a.rps if a.balanced else a.rps

    def body(lrows, cols, vals, blk, x_sh):
        x_full = jax.lax.all_gather(x_sh, axis, axis=0, tiled=True)
        if has_blocked:
            from ..ops.pallas.segment_spmm import blocked_spmm

            partial = blocked_spmm(_local_blocked(blk, 0), x_full, None)
        else:
            g = x_full[cols[0]] * vals[0][:, None].astype(x_full.dtype)
            partial = jax.ops.segment_sum(
                g, lrows[0], num_segments=n_out, indices_are_sorted=True
            ).astype(x.dtype)
        if a.balanced:
            # full-row partials -> row-sharded sum (transposes to an
            # all_gather of the cotangent in the backward pass)
            return jax.lax.psum_scatter(
                partial, axis, scatter_dimension=0, tiled=True)
        return partial

    blk_arg = a.blocked
    blk_spec = None
    if has_blocked:
        blk_spec = jax.tree.map(lambda _: P(axis), blk_arg)

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), blk_spec, P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(a.lrows, a.cols, a.vals, blk_arg, x)
    return out[: a.nrows]


def sharded_dropped(sp: ShardedCOO, rng: jax.Array, keep_rate: float) -> ShardedCOO:
    """Edge dropout on a sharded layout: the counter-hash keep-mask is
    evaluated elementwise on the GLOBAL canonical edge ids, so every
    layout of the same edge (this shard table, its transpose, the packed
    pallas blocks, and any unsharded copy) draws the same mask."""
    from ..ops.dropout import hash_keep_mask

    def masked(vals, ids):
        keep = hash_keep_mask(rng, ids, keep_rate)
        return jnp.where(keep, vals / keep_rate, 0.0)

    new = sp.replace(vals=masked(sp.vals, sp.canon))
    if sp.blocked is not None:
        b = sp.blocked
        new = new.replace(blocked=b.replace(vals=masked(b.vals, b.canon)))
    return new


def sharded_with_new_vals(sp: ShardedCOO, vals: jnp.ndarray) -> ShardedCOO:
    """Replace edge values ([S, e_pad], per-shard order), syncing the
    packed pallas mirror through each shard's local `src` map."""
    new = sp.replace(vals=vals)
    if sp.blocked is not None:
        b = sp.blocked
        live = b.local_rows < b.rb
        packed = jnp.where(
            live, jnp.take_along_axis(vals, b.src.reshape(sp.n_shards, -1), axis=1
                                      ).reshape(b.vals.shape), 0.0
        )
        new = new.replace(blocked=b.replace(vals=packed))
    return new


def shard_adj_pair(rows, cols, vals, shape, mesh: Mesh, axis: str = MODEL_AXIS,
                   mode: str = "auto"):
    """Build an AdjPair whose both directions are row-window sharded.

    Canonical edge ids are positions in the (row, col)-sorted FWD order
    — identical to the ids the unsharded `make_adj_pair` layouts hash —
    so `AdjPair.dropped` produces the same masks in every configuration.
    """
    from ..data.device import AdjPair, HostEdges

    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.float32)
    from .. import native

    order = native.sort_pairs(rows, cols)
    rows, cols, vals = rows[order], cols[order], vals[order]
    canon = np.arange(rows.shape[0])

    fwd = shard_sparse(rows, cols, vals, shape, mesh, canon=canon, axis=axis,
                       mode=mode)
    bwd = shard_sparse(cols, rows, vals, (shape[1], shape[0]), mesh,
                       canon=canon, axis=axis, mode=mode)
    return AdjPair(
        fwd=fwd, bwd=bwd, t_perm=jnp.zeros((1,), jnp.int32),
        host=HostEdges(rows, cols, vals, (int(shape[0]), int(shape[1]))),
    )


def shard_adj_pair_from_scipy(mat, mesh: Mesh, axis: str = MODEL_AXIS,
                              mode: str = "auto"):
    coo = mat.tocoo()
    return shard_adj_pair(coo.row, coo.col, coo.data, mat.shape, mesh, axis,
                          mode=mode)
