"""Pallas TPU kernel: segment-sum SpMM over padded sorted COO.

The diffusion hot op (survey 2.9): out = A @ X with A in row-sorted
COO. XLA lowers `segment_sum` to a scatter-add, which serialises on
TPU. This kernel removes the scatter entirely:

  * the row space is tiled into fixed windows of ROW_BLOCK rows;
  * each window's edges are chunked into blocks of EDGE_BLOCK (padded;
    empty windows get one all-pad block so every output tile is
    written);
  * per grid step, the kernel computes
        partial = onehot(local_rows)^T @ G
    as an [EDGE_BLOCK, ROW_BLOCK] x [EDGE_BLOCK, d] MXU contraction,
    where G = vals * X[cols] is gathered by XLA OUTSIDE the kernel
    (TPU gathers are fast; scatters are not) and the one-hot comes
    from an in-register iota compare;
  * consecutive blocks of the same window hit the same output tile —
    Pallas keeps it resident in VMEM and the kernel accumulates, so
    the result lands directly in [n_windows * ROW_BLOCK, d] with no
    combine pass.

Interpret mode runs the identical kernel on CPU for unit tests.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from flax import struct

import os

# default tile sizes; override per-layout via pack_blocked(edge_block=,
# row_block=) or globally via env (tuning harness: scripts/bisect_pallas.py).
# eb=512/rb=256 won the clean tile sweep (floor-corrected harness) and a
# 4-run bench A/B (~+5% e2e over eb=1024) — see BENCH_NOTES.md
EDGE_BLOCK = int(os.environ.get("HGDR_EDGE_BLOCK", 512))
ROW_BLOCK = int(os.environ.get("HGDR_ROW_BLOCK", 256))
UNIQUE_BLOCK = int(os.environ.get("HGDR_UNIQUE_BLOCK", 256))


@struct.dataclass
class BlockedCOO:
    """Row-window aligned edge-block layout."""

    cols: jnp.ndarray  # [n_blocks, eb] int32 (pad 0 with val 0)
    vals: jnp.ndarray  # [n_blocks, eb] f32
    local_rows: jnp.ndarray  # [n_blocks, eb] int32 in [0, rb); pad = rb
    wmap: jnp.ndarray  # [n_blocks] int32 window id of each block (non-decreasing)
    src: jnp.ndarray  # [n_blocks, eb] int32 index into the source
    # padded-COO value array (pads point anywhere: local_row==rb
    # already excludes them) — lets callers re-gather CURRENT values so
    # edge dropout / on-device renormalisation compose with the kernel
    canon: jnp.ndarray  # [n_blocks, eb] int32 CANONICAL edge id per slot
    # (fwd-padded-COO index; transpose layouts compose t_perm with src).
    # Counter-hash edge dropout evaluates its keep-mask on these ids
    # ELEMENTWISE, so the same edge gets the same draw in every layout
    # with zero runtime gathers (AdjPair.dropped)
    nrows: int = struct.field(pytree_node=False)
    ncols: int = struct.field(pytree_node=False)
    n_blocks: int = struct.field(pytree_node=False)
    n_windows: int = struct.field(pytree_node=False)
    # bf16 gathered operand: halves the dominant HBM traffic for ~0.2%
    # relative error (single-pass MXU, f32 accumulation). Production
    # training mode; f32 default keeps eval/parity paths exact.
    bf16: bool = struct.field(pytree_node=False, default=False)
    # int8 gathered operand (HGDR_INT8=1): quantises X with per-COLUMN
    # scales before the gather and folds the dequant into the output
    # tile, halving the kernel's dominant DMA stream again vs bf16.
    # The row-rate-bound gather itself is d-width-insensitive, so this
    # targets only the kernel half of the spmm. ~1% relative error;
    # strictly opt-in.
    int8: bool = struct.field(pytree_node=False, default=False)
    eb: int = struct.field(pytree_node=False, default=1024)  # edge block
    rb: int = struct.field(pytree_node=False, default=256)  # row window
    # --- deduplicated-gather layout (optional) ---------------------------
    # TPU gathers are ROW-RATE bound, so gathering each distinct column
    # once per block (instead of once per edge) cuts the dominant spmm
    # cost by the within-window column multiplicity (~1.8x on the bench
    # graphs). Edge order inside a row window is free (the kernel
    # accumulates into the window tile), so the packer col-sorts each
    # window and closes a block at `eb` edges OR `ub` distinct columns.
    # The kernel then expands X[ucols] -> per-edge rows with a second
    # one-hot MXU contraction — no HBM round-trip for the duplication.
    ucols: jnp.ndarray | None = None  # [n_blocks, ub] int32 distinct cols (pad 0)
    local_cols: jnp.ndarray | None = None  # [n_blocks, eb] int32 in [0, ub); pad = ub
    ub: int = struct.field(pytree_node=False, default=0)  # unique-col budget


def _pad_blocks8(cols, vals, lrows, src, wmap, rb, lcols=None, ucols=None, ub=0):
    """Pad the block axis to a multiple of 8 with inert all-pad blocks
    (lrows = rb matches no row; wmap repeats the last window so the
    kernel accumulates zeros into an already-written tile). Keeps the
    [n_blocks, eb] operands' HBM layout sublane-aligned so the kernel
    can fetch them in 8-row blocks (see _pick_row)."""
    nb = cols.shape[0]
    pad = (-nb) % 8
    if pad == 0:
        out = (cols, vals, lrows, src, wmap)
        return out if lcols is None else out + (lcols, ucols)
    bp = ((0, pad), (0, 0))
    cols = np.pad(cols, bp)
    vals = np.pad(vals, bp)
    lrows = np.pad(lrows, bp, constant_values=rb)
    src = np.pad(src, bp)
    wmap = np.pad(wmap, (0, pad), mode="edge")
    out = (cols, vals, lrows, src, wmap)
    if lcols is None:
        return out
    return out + (np.pad(lcols, bp, constant_values=ub), np.pad(ucols, bp))


def pack_blocked(
    rows, cols, vals, shape, bf16: bool = False,
    edge_block: int | None = None, row_block: int | None = None,
    canon_map=None,
) -> BlockedCOO:
    """Host-side packing of sorted COO into row-window edge blocks.

    `rows` may include pad entries (row == shape[0]); live edges must be
    sorted by row. `src` records each packed slot's index in the INPUT
    arrays so current (possibly masked) values can be re-gathered.
    `canon_map` (host int array over input positions) maps each slot to
    its canonical edge id (defaults to identity, i.e. canon == src).
    """
    eb = EDGE_BLOCK if edge_block is None else edge_block
    rb = ROW_BLOCK if row_block is None else row_block
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    live_idx = np.nonzero(rows < shape[0])[0]
    rows_l, cols_l, vals_l = rows[live_idx], cols[live_idx], vals[live_idx]

    # native single-pass packer (fastload.cpp:hd_pack_blocked) for large
    # graphs when the live edges are a prefix of the input (the padded
    # formats always put pads last), so native src == plain positions
    if rows_l.shape[0] >= (1 << 17) and (
        live_idx.size == 0 or live_idx[-1] == live_idx.size - 1
    ):
        from ... import native

        packed = native.pack_blocked_arrays(rows_l, cols_l, vals_l, shape[0], eb, rb)
        if packed is not None:
            cols_n, vals_n, lrows_n, src_n, wmap_n = packed
            cols_n, vals_n, lrows_n, src_n, wmap_n = _pad_blocks8(
                cols_n, vals_n, lrows_n, src_n, wmap_n, rb
            )
            canon_n = src_n if canon_map is None else np.asarray(canon_map)[src_n].astype(np.int32)
            return BlockedCOO(
                cols=jnp.asarray(cols_n),
                vals=jnp.asarray(vals_n),
                local_rows=jnp.asarray(lrows_n),
                wmap=jnp.asarray(wmap_n),
                src=jnp.asarray(src_n),
                canon=jnp.asarray(canon_n),
                nrows=int(shape[0]),
                ncols=int(shape[1]),
                n_blocks=int(cols_n.shape[0]),
                n_windows=max(-(-shape[0] // rb), 1),
                bf16=bf16,
                eb=eb,
                rb=rb,
            )

    n_windows = max(-(-shape[0] // rb), 1)
    starts = np.searchsorted(rows_l, np.arange(n_windows) * rb, side="left")
    ends = np.append(starts[1:], rows_l.shape[0])

    # fully-vectorised slot mapping (the per-window Python loop cost ~4 s
    # at ML-1M scale): each live edge i in window w lands in
    #   block  = block_offset[w] + (i - starts[w]) // eb
    #   slot   = (i - starts[w]) % eb
    # empty windows still get one all-pad block so every out tile is written
    n_w = ends - starts
    blocks_per_w = np.maximum(-(-n_w // eb), 1)
    block_offset = np.concatenate([[0], np.cumsum(blocks_per_w)[:-1]])
    n_blocks = int(blocks_per_w.sum())

    wmap_np = np.repeat(np.arange(n_windows, dtype=np.int64), blocks_per_w)

    n_live = rows_l.shape[0]
    edge_w = np.repeat(np.arange(n_windows, dtype=np.int64), n_w)
    pos_in_w = np.arange(n_live, dtype=np.int64) - np.repeat(starts, n_w)
    flat = (block_offset[edge_w] + pos_in_w // eb) * eb + pos_in_w % eb

    cols_b = np.zeros(n_blocks * eb, np.int64)
    vals_b = np.zeros(n_blocks * eb, np.float32)
    lrows_b = np.full(n_blocks * eb, rb, np.int64)
    src_b = np.zeros(n_blocks * eb, np.int64)
    cols_b[flat] = cols_l
    vals_b[flat] = vals_l
    lrows_b[flat] = rows_l - edge_w * rb
    src_b[flat] = live_idx

    cols_p, vals_p, lrows_p, src_p, wmap_p = _pad_blocks8(
        cols_b.reshape(n_blocks, eb), vals_b.reshape(n_blocks, eb),
        lrows_b.reshape(n_blocks, eb), src_b.reshape(n_blocks, eb),
        wmap_np, rb,
    )
    canon_np = src_p if canon_map is None else np.asarray(canon_map)[src_p]
    return BlockedCOO(
        cols=jnp.asarray(cols_p.astype(np.int32)),
        vals=jnp.asarray(vals_p),
        local_rows=jnp.asarray(lrows_p.astype(np.int32)),
        wmap=jnp.asarray(wmap_p.astype(np.int32)),
        src=jnp.asarray(src_p.astype(np.int32)),
        canon=jnp.asarray(canon_np.astype(np.int32)),
        nrows=int(shape[0]),
        ncols=int(shape[1]),
        n_blocks=int(cols_p.shape[0]),
        n_windows=n_windows,
        bf16=bf16,
        eb=eb,
        rb=rb,
    )


def pack_blocked_dedup(
    rows, cols, vals, shape, bf16: bool = False,
    edge_block: int | None = None, row_block: int | None = None,
    unique_block: int | None = None, canon_map=None,
) -> BlockedCOO:
    """Dedup-gather packing: col-sort edges inside each row window and
    close a block at `eb` edges or `ub` distinct columns, so the XLA-side
    gather fetches [n_blocks, ub, d] distinct rows instead of
    [n_blocks, eb, d] per-edge rows (~1.8x fewer gathered rows on the
    bench graphs; TPU gathers are row-rate bound).

    Same contract as `pack_blocked` (`src`/`canon` in the INPUT array's
    index space, live edges sorted by row); the within-window edge
    permutation is invisible to callers because the kernel accumulates
    into the window's output tile.
    """
    eb = EDGE_BLOCK if edge_block is None else edge_block
    rb = ROW_BLOCK if row_block is None else row_block
    ub = UNIQUE_BLOCK if unique_block is None else unique_block
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    live_idx = np.nonzero(rows < shape[0])[0]
    rows_l, cols_l, vals_l = rows[live_idx], cols[live_idx], vals[live_idx]
    w_l = rows_l // rb

    # col-sort within each window (global lexsort by (window, col, row))
    order = np.lexsort((rows_l, cols_l, w_l))
    rows_s, cols_s, vals_s, src_s, w_s = (
        rows_l[order], cols_l[order], vals_l[order], live_idx[order], w_l[order]
    )
    n_live = rows_s.shape[0]
    n_windows = max(-(-shape[0] // rb), 1)

    # distinct-col rank within each window: 0-based index of each edge's
    # col among the window's sorted distinct cols
    if n_live:
        new_run = np.empty(n_live, bool)
        new_run[0] = True
        new_run[1:] = (w_s[1:] != w_s[:-1]) | (cols_s[1:] != cols_s[:-1])
        run_id = np.cumsum(new_run) - 1  # global distinct-run id
        w_start = np.searchsorted(w_s, np.arange(n_windows), side="left")
        w_end = np.searchsorted(w_s, np.arange(n_windows), side="right")
        first_run = np.zeros(n_windows, np.int64)
        nonempty = w_start < w_end
        first_run[nonempty] = run_id[w_start[nonempty]]
        uid = run_id - first_run[w_s]  # distinct rank within window
    else:
        run_id = uid = np.zeros(0, np.int64)
        w_start = w_end = np.zeros(n_windows, np.int64)

    # greedy segmentation per window: close at eb edges or ub uniques.
    # A cut can split a run of equal cols; the straddling col is simply
    # gathered again by the next block.
    block_bounds = []  # (window, start, end) over the sorted arrays
    for wi in range(n_windows):
        s, e = int(w_start[wi]), int(w_end[wi])
        if s == e:
            block_bounds.append((wi, s, s))  # all-pad block
            continue
        i = s
        while i < e:
            j_cap = min(i + eb, e)
            # last j with uid[j-1] - uid[i] + 1 <= ub
            j_u = i + np.searchsorted(uid[i:e], uid[i] + ub, side="left")
            j = min(j_cap, j_u)
            block_bounds.append((wi, i, int(j)))
            i = int(j)

    n_blocks = len(block_bounds)
    cols_b = np.zeros((n_blocks, eb), np.int64)
    vals_b = np.zeros((n_blocks, eb), np.float32)
    lrows_b = np.full((n_blocks, eb), rb, np.int64)
    lcols_b = np.full((n_blocks, eb), ub, np.int64)
    src_b = np.zeros((n_blocks, eb), np.int64)
    ucols_b = np.zeros((n_blocks, ub), np.int64)
    wmap_np = np.zeros(n_blocks, np.int64)
    for b, (wi, i, j) in enumerate(block_bounds):
        wmap_np[b] = wi
        n = j - i
        if n == 0:
            continue
        cols_b[b, :n] = cols_s[i:j]
        vals_b[b, :n] = vals_s[i:j]
        lrows_b[b, :n] = rows_s[i:j] - wi * rb
        src_b[b, :n] = src_s[i:j]
        lc = uid[i:j] - uid[i]
        lcols_b[b, :n] = lc
        ucols_b[b, lc] = cols_s[i:j]

    cols_b, vals_b, lrows_b, src_b, wmap_np, lcols_b, ucols_b = _pad_blocks8(
        cols_b, vals_b, lrows_b, src_b, wmap_np, rb,
        lcols=lcols_b, ucols=ucols_b, ub=ub,
    )
    canon_np = src_b if canon_map is None else np.asarray(canon_map)[src_b]
    return BlockedCOO(
        cols=jnp.asarray(cols_b.astype(np.int32)),
        vals=jnp.asarray(vals_b),
        local_rows=jnp.asarray(lrows_b.astype(np.int32)),
        wmap=jnp.asarray(wmap_np.astype(np.int32)),
        src=jnp.asarray(src_b.astype(np.int32)),
        canon=jnp.asarray(canon_np.astype(np.int32)),
        nrows=int(shape[0]),
        ncols=int(shape[1]),
        n_blocks=int(cols_b.shape[0]),
        n_windows=n_windows,
        bf16=bf16,
        eb=eb,
        rb=rb,
        ucols=jnp.asarray(ucols_b.astype(np.int32)),
        local_cols=jnp.asarray(lcols_b.astype(np.int32)),
        ub=ub,
    )


def _pick_row(ref, b):
    """Select grid step b's [1, eb] lane vector out of its 8-row block.

    lrows/vals/lcols are [nb, eb] in HBM (padding-free T(8,128) layout;
    a trailing-singleton [nb, eb, 1] form would pad the minor dim
    1 -> 128 — a 128x relayout blowup that OOMs at 10M+ nnz and
    dominated the kernel DMA at bench scale). Mosaic only allows
    sublane-divisible blocks, so the BlockSpec fetches 8 rows at
    (b // 8, 0) — consecutive grid steps revisit the same block, so
    Pallas skips the re-fetch and the amortised DMA is exactly the
    useful bytes — and the kernel reduces out its own row (one VPU
    compare+select+sum; non-selected rows contribute 0)."""
    data = ref[...]  # [8, eb]
    sub = jax.lax.broadcasted_iota(jnp.int32, data.shape, 0)
    picked = jnp.where(sub == (b % 8), data, jnp.zeros_like(data))
    return jnp.sum(picked, axis=0, keepdims=True)  # [1, eb]


def _segment_matmul_kernel(wmap_ref, lrows_ref, vals_ref, g_ref, out_ref, *, eb, rb):
    b = pl.program_id(0)
    lrows = _pick_row(lrows_ref, b)  # [1, eb] local row per edge (pad slots = rb)
    vals = _pick_row(vals_ref, b)  # [1, eb] edge values (pad slots carry 0)
    g = g_ref[0]  # [eb, d] RAW gathered rows (values NOT pre-multiplied)
    # the one-hot is built [rb, eb] (row ids on the sublane axis) and
    # contracted over its lane axis, so the index operands stay lane
    # vectors end to end
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rb, eb), 0)
    # scaled one-hot: folding the edge-value multiply into the MXU
    # operand removes the [nnz, d] elementwise pass (and its HBM
    # round-trip) that used to run between the gather and the kernel —
    # measured ~0.5 ms per spmm at bench shapes. Pads match no row AND
    # carry val 0. (mask cast THEN multiply: jnp.where on the i1 mask
    # trips a Mosaic relayout bug as of jax 0.9)
    onehot = (lrows == row_ids).astype(g.dtype) * vals.astype(g.dtype)
    # f32 operands: HIGHEST = exact 3-pass MXU (matches the XLA path and
    # still beats the scatter lowering). bf16 operands: single MXU pass
    # with f32 accumulation.
    precision = (
        jax.lax.Precision.DEFAULT if g.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    )
    partial_out = jax.lax.dot_general(
        onehot, g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    is_first = b == 0
    prev_idx = jnp.maximum(b - 1, 0)
    new_window = jnp.logical_or(is_first, wmap_ref[b] != wmap_ref[prev_idx])

    @pl.when(new_window)
    def _():
        out_ref[0] = partial_out

    @pl.when(jnp.logical_not(new_window))
    def _():
        out_ref[0] = out_ref[0] + partial_out


def _segment_matmul_int8_kernel(
    wmap_ref, lrows_ref, vals_ref, scale_ref, g_ref, out_ref, *, eb, rb
):
    """int8 variant: g holds per-column-quantised rows; the convert to
    bf16 is a VPU pass in VMEM and the dequant scale rides the output
    tile (both off the DMA critical path)."""
    b = pl.program_id(0)
    lrows = _pick_row(lrows_ref, b)  # [1, eb]
    vals = _pick_row(vals_ref, b)  # [1, eb]
    scale = scale_ref[...]  # [1, d] per-column dequant scale
    g = g_ref[0].astype(jnp.bfloat16)  # [eb, d] int8 -> bf16 in VMEM
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rb, eb), 0)
    onehot = (lrows == row_ids).astype(jnp.bfloat16) * vals.astype(jnp.bfloat16)
    partial_out = jax.lax.dot_general(
        onehot, g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale.astype(jnp.float32)

    is_first = b == 0
    prev_idx = jnp.maximum(b - 1, 0)
    new_window = jnp.logical_or(is_first, wmap_ref[b] != wmap_ref[prev_idx])

    @pl.when(new_window)
    def _():
        out_ref[0] = partial_out

    @pl.when(jnp.logical_not(new_window))
    def _():
        out_ref[0] = out_ref[0] + partial_out


def _segment_matmul_dedup_kernel(
    wmap_ref, lrows_ref, vals_ref, lcols_ref, g_ref, out_ref, *, eb, rb, ub
):
    """Dedup variant: g holds the block's DISTINCT column rows [ub, d].
    The two one-hots contract into the block's weight matrix
    W[r, u] = sum_e vals[e]·[row_e == r]·[col_e == u] first ([rb, ub],
    edge axis contracted on the MXU), then W @ g lands the window tile —
    mathematically identical to expand-then-reduce, with both index
    operands as [1, eb] lane vectors (no trailing-singleton tiling
    blowup, see the base kernel)."""
    b = pl.program_id(0)
    lrows = _pick_row(lrows_ref, b)  # [1, eb]
    vals = _pick_row(vals_ref, b)  # [1, eb]
    lcols = _pick_row(lcols_ref, b)  # [1, eb] in [0, ub); pad = ub (matches no col)
    g = g_ref[0]  # [ub, d] distinct gathered rows
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (ub, eb), 0)
    onehot_c = (lcols == col_ids).astype(g.dtype)  # [ub, eb]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rb, eb), 0)
    onehot_r = (lrows == row_ids).astype(g.dtype) * vals.astype(g.dtype)  # [rb, eb]
    precision = (
        jax.lax.Precision.DEFAULT if g.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    )
    w = jax.lax.dot_general(  # contract the edge axis of both one-hots
        onehot_r, onehot_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(g.dtype)  # [rb, ub]; entries are small sums of edge values
    partial_out = jax.lax.dot_general(
        w, g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    is_first = b == 0
    prev_idx = jnp.maximum(b - 1, 0)
    new_window = jnp.logical_or(is_first, wmap_ref[b] != wmap_ref[prev_idx])

    @pl.when(new_window)
    def _():
        out_ref[0] = partial_out

    @pl.when(jnp.logical_not(new_window))
    def _():
        out_ref[0] = out_ref[0] + partial_out


def _segment_matmul_dedup_int8_kernel(
    wmap_ref, lrows_ref, vals_ref, lcols_ref, scale_ref, g_ref, out_ref,
    *, eb, rb, ub
):
    """Combined layout (VERDICT r2 #3): the dedup two-one-hot contraction
    over int8-quantised distinct rows — the gather stream shrinks BOTH by
    deduplication (ub distinct rows instead of eb per block) and by dtype
    (1 byte/element); dequant rides the output tile like the int8 kernel."""
    b = pl.program_id(0)
    lrows = _pick_row(lrows_ref, b)  # [1, eb]
    vals = _pick_row(vals_ref, b)  # [1, eb]
    lcols = _pick_row(lcols_ref, b)  # [1, eb] in [0, ub); pad = ub
    scale = scale_ref[...]  # [1, d]
    g = g_ref[0].astype(jnp.bfloat16)  # [ub, d] int8 -> bf16 in VMEM
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (ub, eb), 0)
    onehot_c = (lcols == col_ids).astype(jnp.bfloat16)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rb, eb), 0)
    onehot_r = (lrows == row_ids).astype(jnp.bfloat16) * vals.astype(jnp.bfloat16)
    w = jax.lax.dot_general(
        onehot_r, onehot_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(jnp.bfloat16)  # [rb, ub]
    partial_out = jax.lax.dot_general(
        w, g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale.astype(jnp.float32)

    is_first = b == 0
    prev_idx = jnp.maximum(b - 1, 0)
    new_window = jnp.logical_or(is_first, wmap_ref[b] != wmap_ref[prev_idx])

    @pl.when(new_window)
    def _():
        out_ref[0] = partial_out

    @pl.when(jnp.logical_not(new_window))
    def _():
        out_ref[0] = out_ref[0] + partial_out


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _packed_vals(blocked: BlockedCOO, vals: jnp.ndarray | None) -> jnp.ndarray:
    if vals is None:
        return blocked.vals.reshape(-1)
    live = blocked.local_rows.reshape(-1) < blocked.rb
    return jnp.where(live, vals[blocked.src.reshape(-1)], 0.0)


def _global_rows(blocked: BlockedCOO) -> jnp.ndarray:
    lr = blocked.local_rows.reshape(-1)
    w = jnp.repeat(blocked.wmap, blocked.eb)
    return jnp.where(lr < blocked.rb, w * blocked.rb + lr, blocked.nrows)


@partial(jax.jit, static_argnames=("interpret",))
def _blocked_spmm_fwd_only(
    blocked: BlockedCOO,
    x: jnp.ndarray,
    vals: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """A @ X via the pallas row-window segment matmul (no autodiff).

    `vals`: current value array of the SOURCE padded COO (e.g. after
    edge dropout); when given it is routed through `src` so the kernel
    sees up-to-date weights. Defaults to the packed snapshot.
    """
    if interpret is None:
        interpret = not _is_tpu()
    nb = blocked.n_blocks
    eb, rb = blocked.eb, blocked.rb
    d = x.shape[1]
    v = _packed_vals(blocked, vals)
    gdtype = jnp.bfloat16 if blocked.bf16 else jnp.float32
    # lrows/vals stay rank-2 [nb, eb] end to end (the packers pad nb to
    # a sublane multiple of 8 with inert all-pad blocks): their
    # T(8,128) HBM layout is then padding-free, where the old
    # trailing-singleton [nb, eb, 1] form padded the minor dim 1 -> 128
    # (a 128x relayout copy that OOMs at 10M+ nnz and dominated the
    # kernel DMA at bench scale). Blocks fetch 8 rows and _pick_row
    # selects the grid step's own (see its docstring). vals stay f32
    # here (bf16 tiles want 16 sublanes); the kernel casts in VMEM.
    vblk = v.reshape(nb, eb).astype(jnp.float32)
    lrows = blocked.local_rows
    idx_pair = lambda b, wmap: (b // 8, 0)

    if blocked.int8 and blocked.ucols is not None:
        # combined dedup + int8 layout: distinct-col gather of quantised rows
        ub = blocked.ub
        s = jnp.max(jnp.abs(x), axis=0) / 127.0
        s = jnp.maximum(s, 1e-12)
        xq = jnp.clip(jnp.round(x / s[None, :]), -127, 127).astype(jnp.int8)
        gathered = xq[blocked.ucols.reshape(-1)].reshape(nb, ub, d)
        scale = s.reshape(1, d).astype(jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((8, eb), idx_pair),
                pl.BlockSpec((8, eb), idx_pair),
                pl.BlockSpec((8, eb), idx_pair),
                pl.BlockSpec((1, d), lambda b, wmap: (0, 0)),
                pl.BlockSpec((1, ub, d), lambda b, wmap: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rb, d), lambda b, wmap: (wmap[b], 0, 0)),
        )
        out = pl.pallas_call(
            partial(_segment_matmul_dedup_int8_kernel, eb=eb, rb=rb, ub=ub),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((blocked.n_windows, rb, d), jnp.float32),
            interpret=interpret,
        )(blocked.wmap, lrows, vblk, blocked.local_cols, scale, gathered)
        return out.reshape(-1, d)[: blocked.nrows].astype(x.dtype)

    if blocked.int8:
        # per-column symmetric quantisation; dequant rides the out tile
        s = jnp.max(jnp.abs(x), axis=0) / 127.0
        s = jnp.maximum(s, 1e-12)
        xq = jnp.clip(jnp.round(x / s[None, :]), -127, 127).astype(jnp.int8)
        gathered = xq[blocked.cols.reshape(-1)].reshape(nb, eb, d)
        scale = s.reshape(1, d).astype(jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((8, eb), idx_pair),
                pl.BlockSpec((8, eb), idx_pair),
                pl.BlockSpec((1, d), lambda b, wmap: (0, 0)),
                pl.BlockSpec((1, eb, d), lambda b, wmap: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rb, d), lambda b, wmap: (wmap[b], 0, 0)),
        )
        out = pl.pallas_call(
            partial(_segment_matmul_int8_kernel, eb=eb, rb=rb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((blocked.n_windows, rb, d), jnp.float32),
            interpret=interpret,
        )(blocked.wmap, lrows, vblk, scale, gathered)
        return out.reshape(-1, d)[: blocked.nrows].astype(x.dtype)

    if blocked.ucols is not None:
        # dedup layout: gather each block's DISTINCT cols only
        ub = blocked.ub
        gathered = x.astype(gdtype)[blocked.ucols.reshape(-1)].reshape(nb, ub, d)
        lcols = blocked.local_cols
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((8, eb), idx_pair),
                pl.BlockSpec((8, eb), idx_pair),
                pl.BlockSpec((8, eb), idx_pair),
                pl.BlockSpec((1, ub, d), lambda b, wmap: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rb, d), lambda b, wmap: (wmap[b], 0, 0)),
        )
        out = pl.pallas_call(
            partial(_segment_matmul_dedup_kernel, eb=eb, rb=rb, ub=ub),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((blocked.n_windows, rb, d), jnp.float32),
            interpret=interpret,
        )(blocked.wmap, lrows, vblk, lcols, gathered)
        return out.reshape(-1, d)[: blocked.nrows].astype(x.dtype)

    # cast the TABLE once (cheap: [n, d]) and gather raw rows; the edge
    # -value multiply rides the kernel's scaled one-hot, so no [nnz, d]
    # elementwise pass runs between the gather and the MXU
    gathered = x.astype(gdtype)[blocked.cols.reshape(-1)].reshape(nb, eb, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, eb), idx_pair),
            pl.BlockSpec((8, eb), idx_pair),
            pl.BlockSpec((1, eb, d), lambda b, wmap: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, d), lambda b, wmap: (wmap[b], 0, 0)),
    )
    out = pl.pallas_call(
        partial(_segment_matmul_kernel, eb=eb, rb=rb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((blocked.n_windows, rb, d), jnp.float32),
        interpret=interpret,
    )(blocked.wmap, lrows, vblk, gathered)
    return out.reshape(-1, d)[: blocked.nrows].astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=())
def blocked_spmm(blocked: BlockedCOO, x: jnp.ndarray, vals: jnp.ndarray | None = None,
                 interpret: bool | None = None) -> jnp.ndarray:
    """Differentiable A @ X on the pallas kernel.

    Forward runs the MXU segment-matmul kernel; the backward pass uses
    XLA segment ops (dx = A^T g via a col-segment reduction, dvals from
    per-edge row/col gathers scattered back through `src`). Integer
    layout arrays get zero cotangents.
    """
    return _blocked_spmm_fwd_only(blocked, x, vals, interpret=interpret)


def _spmm_vjp_fwd(blocked, x, vals, interpret):
    y = _blocked_spmm_fwd_only(blocked, x, vals, interpret=interpret)
    return y, (blocked, x, vals)


def _spmm_vjp_bwd(res, g):
    blocked, x, vals = res
    v = _packed_vals(blocked, vals)
    rows_g = _global_rows(blocked)
    cols = blocked.cols.reshape(-1)
    g_rows = g[jnp.clip(rows_g, 0, blocked.nrows - 1)]
    live = (blocked.local_rows.reshape(-1) < blocked.rb)[:, None].astype(g.dtype)
    g_rows = g_rows * live
    # dx[c] = sum_e vals[e] * g[row_e]
    dx = jax.ops.segment_sum(g_rows * v[:, None].astype(g.dtype), cols,
                             num_segments=x.shape[0])
    dvals = None
    if vals is not None:
        dv_packed = jnp.sum(g_rows * x[cols], axis=-1)
        dvals = jnp.zeros_like(vals).at[blocked.src.reshape(-1)].add(
            dv_packed * live[:, 0], mode="drop"
        )
    zero_blocked = jax.tree.map(lambda a: None, blocked)
    return (None, dx.astype(x.dtype), dvals, None)


blocked_spmm.defvjp(_spmm_vjp_fwd, _spmm_vjp_bwd)
