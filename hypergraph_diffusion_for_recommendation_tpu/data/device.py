"""Device-resident graph bundles (pytrees) consumed by every model.

This is the host→device boundary: one-time conversion at build time,
after which training/eval never touch host data (the reference crosses
this boundary every batch via its Python samplers and per-user
`.cpu().numpy()` eval loop — survey sections 2.4, 3.3).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .. import native
from ..core.types import SparseCOO, from_edges, pad_to_multiple, padded_rows_from_lists
from ..ops.dropout import hash_keep_mask
from ..ops.sampling import CSRMembership, membership_from_lists
from .dataset import InteractionData
from .knowledge import KnowledgeData


class HostEdges:
    """Host-side (row, col, val) snapshot of an AdjPair's live edges.

    Kept OUT of the pytree (identity hash) so composite operators —
    e.g. the block-diagonal fusion of two adjacencies — can be built on
    the host without a device->host round trip over the remote tunnel.
    """

    __slots__ = ("rows", "cols", "vals", "shape")

    def __init__(self, rows, cols, vals, shape):
        self.rows = rows
        self.cols = cols
        self.vals = vals
        self.shape = shape


@struct.dataclass
class AdjPair:
    """A sparse matrix with its transpose structure and the permutation
    linking their value arrays — so a dropout mask applied to `fwd`
    propagates exactly to `bwd` (needed for A @ (A.T @ X) on a dropped A,
    mirroring reference HGCNConv on SpAdjDropEdge output, KHGRec.py:288)."""

    fwd: SparseCOO
    bwd: SparseCOO
    t_perm: jnp.ndarray  # bwd.vals == fwd.vals[t_perm]
    host: HostEdges | None = struct.field(pytree_node=False, default=None)

    def dropped(self, rng: jax.Array, keep_rate: float) -> "AdjPair":
        """Edge dropout applied consistently to every layout of the pair.

        The keep-mask is a counter hash of (rng, canonical edge id), so
        each representation — fwd vals, transposed vals, and both packed
        pallas layouts — evaluates its OWN mask elementwise on a constant
        id array (identity, t_perm, blocked.canon). No runtime gathers:
        the previous formulation (mask fwd vals, gather through t_perm
        and blocked.src) cost ~9 ms/step at bench scale because XLA's
        random scalar re-gathers of runtime values don't vectorise.
        """
        if keep_rate >= 1.0:
            return self

        from ..parallel.sharded_adj import ShardedCOO, sharded_dropped

        if isinstance(self.fwd, ShardedCOO):
            # sharded layouts carry explicit GLOBAL canonical edge ids;
            # both directions hash the same ids so the masks agree (and
            # match an unsharded run bit-for-bit — the canon ids are the
            # same fwd-sorted positions `make_adj_pair` layouts hash)
            return self.replace(
                fwd=sharded_dropped(self.fwd, rng, keep_rate),
                bwd=sharded_dropped(self.bwd, rng, keep_rate),
            )

        def masked(vals, ids):
            keep = hash_keep_mask(rng, ids, keep_rate)
            return jnp.where(keep, vals / keep_rate, 0.0)

        def side(sp: SparseCOO, ids) -> SparseCOO:
            new = sp.replace(vals=masked(sp.vals, ids))
            if sp.blocked is not None:
                b = sp.blocked
                new = new.replace(blocked=b.replace(vals=masked(b.vals, b.canon)))
            return new

        fwd = side(self.fwd, jnp.arange(self.fwd.vals.shape[0], dtype=jnp.uint32))
        bwd = side(self.bwd, self.t_perm)
        return self.replace(fwd=fwd, bwd=bwd)


PALLAS_MIN_NNZ = 32768
# upper guard: round 1's ML-1M-scale worker fault was bisected to a
# per-EXECUTION cumulative pallas-DMA limit of the axon backend
# (~2^40 bytes), not an nnz limit — see BENCH_NOTES.md and the chunked
# execution path in train/trainer.py, which bounds every epoch execution
# under a 2^38-byte budget. With that in place the guard is a loose
# safety valve only (64M nnz ≈ one Chrome-scale graph per matrix),
# overridable via HGDR_PALLAS_MAX_NNZ.
PALLAS_MAX_NNZ = int(os.environ.get("HGDR_PALLAS_MAX_NNZ", 64_000_000))
# module-level compute-mode switches consumed at device-data build time
# (set from Config.compute_dtype / Config.use_pallas by the CLI/bench)
PALLAS_BF16 = False
PALLAS_DISABLE = False
# Gather-layout policy for the blocked packs (see dedup_auto): "auto"
# selects by column multiplicity, "0"/"1" force. int8 quantises the
# gathered operand (~1% fwd error; 1.78x at ML-1M density) — opt-in.
# Env vars seed the defaults; the CLI's --gather_layout overrides.
PALLAS_DEDUP = os.environ.get("HGDR_DEDUP", "auto")
PALLAS_INT8 = os.environ.get("HGDR_INT8") == "1"
# max bytes for a padded membership table before sampling falls back to
# the O(nnz) CSR binary-search form (see build_kg_device_data)
PAD_TABLE_BUDGET = int(os.environ.get("HGDR_PAD_TABLE_BUDGET", 256 * 1024 * 1024))


def dedup_auto(h_rows, h_cols, shape, row_block: int,
               threshold: float = 4.0) -> bool:
    """Pick the dedup-gather layout when the pooled within-window column
    multiplicity (nnz / |distinct (window, col) pairs|) crosses
    `threshold`. Calibration (scripts/probe_layouts.py, real chip):
    multiplicity ~2.5 (LastFM-bench) is break-even; ~17 (ML-1M density)
    is a 1.89x epoch speedup; the crossover sits between, 4 is the
    conservative pick."""
    h_rows_np = np.asarray(h_rows)
    h_cols_np = np.asarray(h_cols)
    live = h_rows_np < shape[0]
    if not live.any():
        return False
    key = (h_rows_np[live] // row_block).astype(np.int64) * shape[1] + h_cols_np[live]
    n_unique = np.unique(key).shape[0]
    return bool(live.sum() >= threshold * max(n_unique, 1))


def _maybe_attach_blocked(sp: SparseCOO, h_rows, h_cols, h_vals, canon_map=None) -> SparseCOO:
    """Attach the pallas row-window layout on TPU for large matrices.

    Packs from the HOST-side arrays: a device->host round trip over the
    remote-TPU tunnel is orders of magnitude slower than H2D.
    """
    if (
        PALLAS_DISABLE
        or jax.default_backend() != "tpu"
        or not (PALLAS_MIN_NNZ <= sp.nnz <= PALLAS_MAX_NNZ)
    ):
        return sp
    from ..ops.pallas.segment_spmm import ROW_BLOCK, pack_blocked, pack_blocked_dedup

    # Deduplicated-gather layout selection. TPU gathers are row-RATE
    # bound, so gathering each DISTINCT column once per block wins by the
    # within-window column multiplicity — measured 1.89x faster epochs at
    # ML-1M density (multiplicity ~17) and break-even at the LastFM
    # bench graph's ~2.5 (scripts/probe_layouts.py, BENCH_NOTES round 3).
    # AUTO (default): pick dedup when the pooled within-window
    # multiplicity nnz / |distinct (window, col) pairs| exceeds 4.
    # HGDR_DEDUP=1 forces on, =0 forces off.
    if PALLAS_DEDUP in ("0", "1"):
        use_dedup = PALLAS_DEDUP == "1"
    else:
        use_dedup = dedup_auto(h_rows, h_cols, sp.shape, ROW_BLOCK)
    pack = pack_blocked_dedup if use_dedup else pack_blocked
    blocked = pack(
        h_rows, h_cols, h_vals, sp.shape, bf16=PALLAS_BF16, canon_map=canon_map
    )
    # PALLAS_INT8: quantised gathered operand (see BlockedCOO.int8);
    # composes with the dedup layout (combined dedup+int8 kernel)
    if PALLAS_INT8:
        blocked = blocked.replace(int8=True)
    return sp.replace(blocked=blocked)


def make_adj_pair(rows, cols, vals, shape, pad_multiple: int = 8) -> AdjPair:
    """Build fwd + transpose structure + linking permutation (host-side)."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.float32)
    nnz = rows.shape[0]
    order = native.sort_pairs(rows, cols)
    rows, cols, vals = rows[order], cols[order], vals[order]

    nnz_pad = max(pad_to_multiple(max(nnz, 1), pad_multiple), pad_multiple)
    pad = nnz_pad - nnz

    f_rows = np.concatenate([rows, np.full(pad, shape[0], np.int64)]).astype(np.int32)
    f_cols = np.concatenate([cols, np.zeros(pad, np.int64)]).astype(np.int32)
    f_vals = np.concatenate([vals, np.zeros(pad, np.float32)])

    t_order = native.sort_pairs(cols, rows)  # transpose: sort by (col, row)
    b_rows = np.concatenate([cols[t_order], np.full(pad, shape[1], np.int64)]).astype(np.int32)
    b_cols = np.concatenate([rows[t_order], np.zeros(pad, np.int64)]).astype(np.int32)
    t_perm = np.concatenate([t_order, np.arange(nnz, nnz_pad)]).astype(np.int32)
    b_vals = f_vals[t_perm]

    fwd = SparseCOO(
        rows=jnp.asarray(f_rows), cols=jnp.asarray(f_cols), vals=jnp.asarray(f_vals),
        nrows=int(shape[0]), ncols=int(shape[1]), nnz=int(nnz),
    )
    bwd = SparseCOO(
        rows=jnp.asarray(b_rows), cols=jnp.asarray(b_cols), vals=jnp.asarray(b_vals),
        nrows=int(shape[1]), ncols=int(shape[0]), nnz=int(nnz),
    )
    return AdjPair(
        fwd=_maybe_attach_blocked(fwd, f_rows, f_cols, f_vals),
        # bwd slots take fwd edge t_perm[src]: canon ids stay in the
        # SHARED fwd edge-id space so dropout masks agree across layouts
        bwd=_maybe_attach_blocked(bwd, b_rows, b_cols, b_vals, canon_map=t_perm),
        t_perm=jnp.asarray(t_perm),
        host=HostEdges(rows, cols, vals, (int(shape[0]), int(shape[1]))),
    )


def blockdiag_pair(a: AdjPair, b: AdjPair, pad_multiple: int = 8) -> AdjPair:
    """blockdiag(A, B) as one AdjPair — the joint-encoder fast path.

    Two independent spmm chains (e.g. KHGRec's CF and KG encoders,
    reference KHGRec.py:374-453) can run as ONE spmm over the stacked
    node space. On v5e this measured slightly SLOWER than separate
    chains (gathers are row-rate bound, so merging does not amortise);
    kept as an opt-in for topologies that pack better. Requires host
    edge snapshots (built by make_adj_pair).
    """
    ah, bh = a.host, b.host
    assert ah is not None and bh is not None, "blockdiag_pair needs host edges"
    rows = np.concatenate([ah.rows, bh.rows + ah.shape[0]])
    cols = np.concatenate([ah.cols, bh.cols + ah.shape[1]])
    vals = np.concatenate([ah.vals, bh.vals])
    shape = (ah.shape[0] + bh.shape[0], ah.shape[1] + bh.shape[1])
    return make_adj_pair(rows, cols, vals, shape, pad_multiple)


def adj_pair_from_scipy(mat, pad_multiple: int = 8) -> AdjPair:
    coo = mat.tocoo()
    return make_adj_pair(coo.row, coo.col, coo.data, mat.shape, pad_multiple)


@struct.dataclass
class EvalData:
    """Padded test-set arrays for fully on-device evaluation."""

    test_users: jnp.ndarray  # [n_pad] dense user ids (pad 0)
    user_valid: jnp.ndarray  # [n_pad] bool
    test_pos_pad: jnp.ndarray  # [n_pad, Tmax] dense item ids; -1 pad, -2 unseen-in-train
    test_counts: jnp.ndarray  # [n_pad] int32, includes unseen items
    n_test_users: int = struct.field(pytree_node=False)
    total_test_interactions: int = struct.field(pytree_node=False)


@struct.dataclass
class CFDeviceData:
    """Everything a CF model needs on device.

    The adjacency representations are built per-model-need
    (`build_cf_device_data(needs=models.model_data_needs(name))`) —
    unneeded ones are None, which at production scale is the difference
    between fitting in HBM and OOM (each AdjPair carries fwd+bwd padded
    COO plus two packed pallas layouts)."""

    adj: AdjPair | None  # normalised (U+I)^2 bipartite
    int_norm: AdjPair | None  # row-normalised U x I
    inv_int_norm: AdjPair | None  # row-normalised I x U
    b_hyper: AdjPair | None  # D_v^-1/2 H D_e^-1/2 (U x I): Theta_uu = B B^T, Theta_ii = B^T B
    raw_int: AdjPair | None  # unnormalised U x I incidence H
    raw_adj: AdjPair | None  # unnormalised (U+I)^2 bipartite adjacency
    # bip_src[k] = index into raw_int.fwd values of the interaction edge
    # behind raw_adj.fwd entry k — dropping a (u,i) pair zeroes BOTH
    # bipartite directions, matching SGL's augment-then-symmetrise flow
    # (SGL.py:143-147 drops on interaction_mat, then convert_to_laplacian)
    bip_src: jnp.ndarray
    edge_u: jnp.ndarray  # [n_train] int32
    edge_i: jnp.ndarray
    rated_pad: jnp.ndarray  # [U, max_deg] dense item ids, pad -1 (eval masking)
    rated_csr: CSRMembership  # O(nnz) membership (production fallback)
    eval_data: EvalData
    n_users: int = struct.field(pytree_node=False)
    n_items: int = struct.field(pytree_node=False)
    n_train: int = struct.field(pytree_node=False)

    @property
    def n_nodes(self) -> int:
        return self.n_users + self.n_items

    @property
    def sample_membership(self):
        """Membership table for negative sampling: the padded table when
        it fits the budget (ONE row gather per test — TPU gathers are
        row-rate-bound), else the O(nnz) CSR binary search."""
        from .device import PAD_TABLE_BUDGET

        if self.rated_pad.size * 4 <= PAD_TABLE_BUDGET:
            return self.rated_pad
        return self.rated_csr


@struct.dataclass
class KGDeviceData:
    """Knowledge-graph arrays on device (KGAT / KHGRec family)."""

    kg_adj: AdjPair  # normalised E x E kg adjacency
    # attention edge list (the kg_train triples), sorted by head
    att_h: jnp.ndarray  # [n_kg_pad] int32, pad = n_entities
    att_r: jnp.ndarray  # [n_kg_pad]
    att_t: jnp.ndarray  # [n_kg_pad], pad = 0
    att_valid: jnp.ndarray  # [n_kg_pad] bool
    att_t_perm: jnp.ndarray  # transpose permutation over the SAME edge list
    att_h_t: jnp.ndarray  # transpose structure: rows (=tails) sorted, pad = n_entities
    att_t_t: jnp.ndarray  # transpose structure cols (=heads)
    head_tails: object  # per-head true-tail membership: padded array or CSRMembership
    user_idx: jnp.ndarray  # [n_users] entity ids of CF users (dense order)
    item_idx: jnp.ndarray  # [n_items] entity ids of CF items
    n_entities: int = struct.field(pytree_node=False)
    n_relations: int = struct.field(pytree_node=False)
    n_kg_train: int = struct.field(pytree_node=False)


def build_cf_device_data(
    inter: InteractionData,
    pad_multiple: int = 8,
    eval_user_multiple: int = 256,
    needs: frozenset | set | None = None,
    mesh=None,
    shard_needs: frozenset | set | None = None,
) -> CFDeviceData:
    """`needs` (from `models.model_data_needs(name)`) selects which
    adjacency representations to build; None builds all of them. Edge
    arrays, rated-item masks and eval data are always built.

    With `mesh` + `shard_needs` (from `models.model_shard_needs(name)`),
    the named representations are built ROW-WINDOW SHARDED over the
    mesh's model axis (parallel/sharded_adj.py): per-device adjacency
    memory drops to ~nnz/S and their spmms run as explicit shard_map
    collectives. Only representations every consumer touches through
    spmm/two_hop/dropped are eligible (scatter-form models read raw COO
    fields and keep the replicated layout).
    """
    import scipy.sparse as sp

    def want(field: str) -> bool:
        return needs is None or field in needs

    from ..parallel.mesh import MODEL_AXIS

    do_shard = (
        mesh is not None
        and shard_needs
        and mesh.shape.get(MODEL_AXIS, 1) > 1
    )

    def make_pair(field: str, mat):
        if do_shard and field in shard_needs:
            from ..parallel.sharded_adj import shard_adj_pair_from_scipy

            return shard_adj_pair_from_scipy(mat, mesh)
        return adj_pair_from_scipy(mat, pad_multiple)

    adj = make_pair("adj", inter.norm_adj) if want("adj") else None
    int_norm = (
        make_pair("int_norm", inter.norm_interaction_mat)
        if want("int_norm") else None
    )
    inv_int_norm = (
        make_pair("inv_int_norm", inter.norm_inv_interaction_mat)
        if want("inv_int_norm") else None
    )
    raw_int = (
        adj_pair_from_scipy(inter.interaction_mat, pad_multiple)
        if want("raw_int") or want("raw_adj") else None
    )

    b_hyper = None
    if want("b_hyper"):
        # B = D_v^-1/2 H D_e^-1/2 so that Theta_uu = B B^T is the hypergraph
        # normalisation D_v^-1/2 H D_e^-1 H^T D_v^-1/2 (data/graph.py:27-42)
        # applied without ever materialising the V x V product.
        h_mat = inter.interaction_mat
        dv = np.asarray(h_mat.sum(1)).flatten()
        de = np.asarray(h_mat.sum(0)).flatten()
        with np.errstate(divide="ignore"):
            dv_is = np.power(dv, -0.5)
            de_is = np.power(de, -0.5)
        dv_is[np.isinf(dv_is)] = 0.0
        de_is[np.isinf(de_is)] = 0.0
        b = (sp.diags(dv_is) @ h_mat @ sp.diags(de_is)).tocsr()
        b_hyper = make_pair("b_hyper", b)

    # raw bipartite adjacency with per-entry provenance to interaction edges
    n_users, n_items = inter.n_users, inter.n_items
    raw_adj = None
    bip_src_full = np.zeros(0, np.int32)
    if want("raw_adj"):
        icoo = inter.interaction_mat.tocoo()
        iorder = native.sort_pairs(icoo.row, icoo.col)  # raw_int.fwd order
        iu, ii = icoo.row[iorder], icoo.col[iorder]
        n_int = iu.shape[0]
        src = np.arange(n_int)
        bip_rows = np.concatenate([iu, ii + n_users])
        bip_cols = np.concatenate([ii + n_users, iu])
        bip_src0 = np.concatenate([src, src])
        border = native.sort_pairs(bip_rows, bip_cols)
        raw_adj = make_adj_pair(
            bip_rows[border], bip_cols[border], np.ones(2 * n_int, np.float32),
            (n_users + n_items, n_users + n_items), pad_multiple,
        )
        bip_src_sorted = bip_src0[border]
        pad_n = raw_adj.fwd.nnz_pad - 2 * n_int
        # pad entries are inert (their bipartite rows are out of range and
        # dropped by every segment op), so any in-range source index is fine
        bip_src_full = np.concatenate(
            [bip_src_sorted, np.zeros(pad_n, np.int64)]
        ).astype(np.int32)

    rated_lists = inter.rated_lists()
    rated = padded_rows_from_lists(rated_lists, fill=-1, pad_multiple=pad_multiple)
    rated_csr = membership_from_lists(rated_lists)

    test_users, test_groups, test_counts = inter.test_lists()
    n_tu = len(test_users)
    n_pad = max(pad_to_multiple(max(n_tu, 1), eval_user_multiple), eval_user_multiple)
    tu = np.zeros(n_pad, np.int32)
    tu[:n_tu] = test_users
    valid = np.zeros(n_pad, bool)
    valid[:n_tu] = True
    tmax = max((len(g) for g in test_groups), default=1)
    tmax = max(pad_to_multiple(tmax, pad_multiple), pad_multiple)
    pos = np.full((n_pad, tmax), -1, np.int32)
    for k, g in enumerate(test_groups):
        pos[k, : len(g)] = g[:tmax]
    counts = np.zeros(n_pad, np.int32)
    counts[:n_tu] = test_counts

    eval_data = EvalData(
        test_users=jnp.asarray(tu),
        user_valid=jnp.asarray(valid),
        test_pos_pad=jnp.asarray(pos),
        test_counts=jnp.asarray(counts),
        n_test_users=int(n_tu),
        total_test_interactions=int(test_counts.sum()),
    )

    return CFDeviceData(
        adj=adj,
        int_norm=int_norm,
        inv_int_norm=inv_int_norm,
        b_hyper=b_hyper,
        raw_int=raw_int,
        raw_adj=raw_adj,
        bip_src=jnp.asarray(bip_src_full),
        edge_u=jnp.asarray(inter.train_u),
        edge_i=jnp.asarray(inter.train_i),
        rated_pad=jnp.asarray(rated),
        rated_csr=rated_csr,
        eval_data=eval_data,
        n_users=inter.n_users,
        n_items=inter.n_items,
        n_train=inter.n_cf_train,
    )


def build_kg_device_data(
    kg: KnowledgeData, pad_multiple: int = 8, mesh=None, shard: bool = False
) -> KGDeviceData:
    from ..parallel.mesh import MODEL_AXIS

    if shard and mesh is not None and mesh.shape.get(MODEL_AXIS, 1) > 1:
        from ..parallel.sharded_adj import shard_adj_pair_from_scipy

        kg_adj = shard_adj_pair_from_scipy(kg.norm_kg_adj, mesh)
    else:
        kg_adj = adj_pair_from_scipy(kg.norm_kg_adj, pad_multiple)

    n_kg = kg.h.shape[0]
    order = native.sort_pairs(kg.h, kg.t)
    h_s = kg.h[order]
    r_s = kg.r[order]
    t_s = kg.t[order]
    nnz_pad = max(pad_to_multiple(n_kg, pad_multiple), pad_multiple)
    pad = nnz_pad - n_kg
    h_p = np.concatenate([h_s, np.full(pad, kg.n_entities, np.int32)])
    r_p = np.concatenate([r_s, np.zeros(pad, np.int32)])
    t_p = np.concatenate([t_s, np.zeros(pad, np.int32)])
    valid = np.concatenate([np.ones(n_kg, bool), np.zeros(pad, bool)])

    t_order = native.sort_pairs(t_s, h_s)
    att_h_t = np.concatenate([t_s[t_order], np.full(pad, kg.n_entities, np.int32)])
    att_t_t = np.concatenate([h_s[t_order], np.zeros(pad, np.int32)])
    t_perm = np.concatenate([t_order, np.arange(n_kg, nnz_pad)]).astype(np.int32)

    # exact per-head true-tail membership, representation chosen by
    # memory: a padded [E, max_head_deg] table tests membership in ONE
    # row gather (TPU gathers are row-rate-bound at ~4.4 ns/row, so the
    # CSR binary search's ~12 scalar gathers per test cost ~12x); the
    # sorted-CSR form is O(n_kg) memory for production fan-outs where
    # the padded table would blow past the budget. Both are EXACT (no
    # width cap) — acceptance sets match the reference rejection
    # sampler (util/sampler.py:50-57).
    ht_lists = kg.head_tail_lists()
    max_w = max((len(l) for l in ht_lists), default=1)
    if kg.n_entities * pad_to_multiple(max(max_w, 1), pad_multiple) * 4 <= PAD_TABLE_BUDGET:
        head_tails = jnp.asarray(
            padded_rows_from_lists(ht_lists, fill=-1, pad_multiple=pad_multiple)
        )
    else:
        head_tails = membership_from_lists(ht_lists)

    return KGDeviceData(
        kg_adj=kg_adj,
        att_h=jnp.asarray(h_p.astype(np.int32)),
        att_r=jnp.asarray(r_p.astype(np.int32)),
        att_t=jnp.asarray(t_p.astype(np.int32)),
        att_valid=jnp.asarray(valid),
        att_t_perm=jnp.asarray(t_perm),
        att_h_t=jnp.asarray(att_h_t.astype(np.int32)),
        att_t_t=jnp.asarray(att_t_t.astype(np.int32)),
        head_tails=head_tails,
        user_idx=jnp.asarray(kg.user_entity_ids.astype(np.int32)),
        item_idx=jnp.asarray(kg.item_entity_ids.astype(np.int32)),
        n_entities=kg.n_entities,
        n_relations=kg.n_relations,
        n_kg_train=kg.n_kg_train,
    )
