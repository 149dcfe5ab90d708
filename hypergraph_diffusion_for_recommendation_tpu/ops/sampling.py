"""On-device mini-batch construction and negative sampling.

TPU-native replacement for the reference's host-side Python generators
(`util/sampler.py` — per-element rejection loops feeding host→device
copies every batch, survey section 2.4). Here an entire epoch of batches
is constructed on device: one `jax.random.permutation` over the edge
list, a reshape into [n_batches, B], and rejection-FREE negative
sampling (fixed redraw rounds + membership mask) — all inside jit.

Distribution note (survey 7.3): the reference redraws until the negative
is not in the user's history (`util/sampler.py:252-257`). We redraw a
fixed `rounds` times; the probability a sampled item is still rated
after R rounds is (deg_u/I)^R — for LastFM-scale (mean deg/I ~ 0.3%)
this is < 1e-20 at R=8. Residual collisions keep the last draw.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CSRMembership:
    """Sorted-CSR membership table: per-row sorted id lists stored as one
    concatenated array + indptr, tested by vectorised binary search.

    Production-scale form of the padded [n_rows, max_deg] tables: memory
    is O(nnz) instead of O(n_rows * max_deg) (a single power-user row no
    longer sizes the whole table), and — unlike the capped per-head
    tail table this replaces for KG sampling — it is EXACT: the
    acceptance set matches the reference rejection sampler's
    (util/sampler.py:50-57) with no width cap.
    """

    items: jnp.ndarray  # [nnz] concatenated per-row ascending ids
    indptr: jnp.ndarray  # [n_rows + 1] int32
    steps: int = struct.field(pytree_node=False)  # binary-search iterations


def membership_from_lists(lists) -> CSRMembership:
    """Host-side build from ragged per-row id lists."""
    n = len(lists)
    lens = np.fromiter((len(l) for l in lists), np.int64, count=n)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=indptr[1:])
    if indptr[-1] == 0:
        items = np.zeros(1, np.int32)
    else:
        items = np.concatenate([np.sort(np.asarray(l, np.int32)) for l in lists if len(l)])
    max_len = int(lens.max()) if n else 1
    steps = int(np.ceil(np.log2(max(max_len, 1) + 1))) + 1
    return CSRMembership(
        items=jnp.asarray(items.astype(np.int32)),
        indptr=jnp.asarray(indptr.astype(np.int32)),
        steps=steps,
    )


def _is_member_csr(m: CSRMembership, rows: jnp.ndarray, cands: jnp.ndarray) -> jnp.ndarray:
    """Vectorised lower-bound binary search in each row's sorted segment."""
    lo = m.indptr[rows]
    hi = m.indptr[rows + 1]
    l, h = lo, hi
    size = m.items.shape[0]
    for _ in range(m.steps):
        active = l < h
        mid = (l + h) >> 1
        v = m.items[jnp.clip(mid, 0, size - 1)]
        go = v < cands
        l = jnp.where(active & go, mid + 1, l)
        h = jnp.where(active & jnp.logical_not(go), mid, h)
    return (l < hi) & (m.items[jnp.clip(l, 0, size - 1)] == cands)


def is_rated(table, users: jnp.ndarray, cands: jnp.ndarray) -> jnp.ndarray:
    """Membership test: is cands[b] in row users[b] of the table?

    `table` is either a padded [n_rows, max_deg] id array (pad = -1) or a
    `CSRMembership`; users, cands: [B] int32.
    """
    if isinstance(table, CSRMembership):
        return _is_member_csr(table, users, cands)
    rows = table[users]  # [B, max_deg]
    return jnp.any(rows == cands[:, None], axis=1)


def sample_negatives(
    rng: jax.Array,
    users: jnp.ndarray,
    rated_pad,
    n_items: int,
    rounds: int = 8,
) -> jnp.ndarray:
    """Uniform negatives not in the user's history (rejection-free redraw)."""
    keys = jax.random.split(rng, rounds)
    cands = jax.random.randint(keys[0], users.shape, 0, n_items, jnp.int32)
    for k in keys[1:]:
        bad = is_rated(rated_pad, users, cands)
        redraw = jax.random.randint(k, users.shape, 0, n_items, jnp.int32)
        cands = jnp.where(bad, redraw, cands)
    return cands


def sample_negatives_chunked(
    rng: jax.Array,
    users_2d: jnp.ndarray,
    rated_pad,
    n_items: int,
    rounds: int = 8,
) -> jnp.ndarray:
    """sample_negatives over [n_chunks, B] rows.

    CSR membership tables test via binary search (O(log deg) gathers of
    [N] scalars), so the WHOLE epoch samples in one flat call — the
    chunked lax.map serialised ~n_chunks tiny steps per epoch for no
    benefit. Padded tables keep the per-chunk path: their membership
    test gathers [B, max_deg] per redraw round, and one flat call would
    materialise [n_chunks * B, max_deg] (gigabytes for power-law
    histories at production scale).
    """
    if isinstance(rated_pad, CSRMembership):
        flat = sample_negatives(
            rng, users_2d.reshape(-1), rated_pad, n_items, rounds
        )
        return flat.reshape(users_2d.shape)

    keys = jax.random.split(rng, users_2d.shape[0])

    def one(args):
        k, row = args
        return sample_negatives(k, row, rated_pad, n_items, rounds)

    return jax.lax.map(one, (keys, users_2d))


def epoch_pairwise_batches(
    rng: jax.Array,
    edge_users: jnp.ndarray,
    edge_items: jnp.ndarray,
    rated_pad,
    n_items: int,
    batch_size: int,
    rounds: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One epoch of BPR batches, entirely on device.

    Equivalent of `next_batch_pairwise` (util/sampler.py:237-264): shuffle
    the training edges, walk them in batches, and draw one uniform
    negative per positive. Static shapes: n_batches = ceil(n/B); the tail
    batch is filled by wrapping around the shuffled permutation (instead
    of the reference's short final batch).

    Returns (users, pos, neg), each [n_batches, B] int32.
    """
    n = edge_users.shape[0]
    n_batches = -(-n // batch_size)
    total = n_batches * batch_size
    k_perm, k_neg = jax.random.split(rng)
    perm = jax.random.permutation(k_perm, n)
    idx = jnp.concatenate([perm, perm[: total - n]])
    users = edge_users[idx].reshape(n_batches, batch_size)
    pos = edge_items[idx].reshape(n_batches, batch_size)
    neg = sample_negatives_chunked(k_neg, users, rated_pad, n_items, rounds)
    return users, pos, neg


def epoch_pointwise_batches(
    rng: jax.Array,
    edge_users: jnp.ndarray,
    edge_items: jnp.ndarray,
    rated_pad,
    n_items: int,
    batch_size: int,
    n_negs: int = 4,
    rounds: int = 8,
):
    """Pointwise batches: 1 positive + n_negs random negatives, labels 1/0
    (util/sampler.py:266-290). Returns (users, items, labels):
    users [n_batches, B*(1+n_negs)], items same, labels same (float32)."""
    n = edge_users.shape[0]
    n_batches = -(-n // batch_size)
    total = n_batches * batch_size
    k_perm, k_neg = jax.random.split(rng)
    perm = jax.random.permutation(k_perm, n)
    idx = jnp.concatenate([perm, perm[: total - n]])
    u = edge_users[idx]
    i = edge_items[idx]
    negs = jax.vmap(
        lambda k, uu: sample_negatives(k, jnp.broadcast_to(uu, (n_negs,)), rated_pad, n_items, rounds)
    )(jax.random.split(k_neg, total), u)
    users = jnp.concatenate([u[:, None], jnp.repeat(u[:, None], n_negs, 1)], axis=1)
    items = jnp.concatenate([i[:, None], negs], axis=1)
    labels = jnp.concatenate(
        [jnp.ones((total, 1), jnp.float32), jnp.zeros((total, n_negs), jnp.float32)], axis=1
    )
    bw = batch_size * (1 + n_negs)
    return (
        users.reshape(n_batches, bw),
        items.reshape(n_batches, bw),
        labels.reshape(n_batches, bw),
    )


class HostExactSampler:
    """Host-side EXACT rejection sampler — the reference's semantics
    (`util/sampler.py:252-257`: redraw a uniform item until it is not in
    the user's training history; `:33-88` for KG corrupted tails).

    This is the parity-A/B control for the on-device fixed-round redraw
    (VERDICT r3 #1): identical batch layout (shuffled edges, wrapped
    tail for static shapes) but negatives drawn by a true rejection
    loop on the host. Numpy RNG seeded per epoch from the trainer's
    JAX key, so runs stay reproducible.
    """

    def __init__(self, edge_users, edge_items, n_items: int,
                 kg_heads=None, kg_relations=None, kg_tails=None,
                 n_entities: int = 0):
        self.edge_u = np.asarray(edge_users, np.int64)
        self.edge_i = np.asarray(edge_items, np.int64)
        self.n_items = int(n_items)
        self.hist: dict[int, set] = {}
        for u, i in zip(self.edge_u.tolist(), self.edge_i.tolist()):
            self.hist.setdefault(u, set()).add(i)
        self.kg = None
        if kg_heads is not None:
            h = np.asarray(kg_heads, np.int64)
            t = np.asarray(kg_tails, np.int64)
            tails: dict[int, set] = {}
            for hh, tt in zip(h.tolist(), t.tolist()):
                tails.setdefault(hh, set()).add(tt)
            self.kg = (h, np.asarray(kg_relations, np.int64), t, tails,
                       int(n_entities))

    def _neg(self, rng, user_row, hist, n_domain) -> np.ndarray:
        out = np.empty(user_row.shape[0], np.int32)
        for b, u in enumerate(user_row.tolist()):
            s = hist.get(u, ())
            j = int(rng.integers(0, n_domain))
            while j in s:
                j = int(rng.integers(0, n_domain))
            out[b] = j
        return out

    def pairwise(self, seed: int, batch_size: int):
        """One epoch of BPR batches: (users, pos, neg) [n_batches, B]."""
        rng = np.random.default_rng(seed)
        n = self.edge_u.shape[0]
        n_batches = -(-n // batch_size)
        total = n_batches * batch_size
        perm = rng.permutation(n)
        idx = np.concatenate([perm, perm[: total - n]])
        users = self.edge_u[idx].astype(np.int32)
        pos = self.edge_i[idx].astype(np.int32)
        neg = self._neg(rng, users, self.hist, self.n_items)
        return (
            users.reshape(n_batches, batch_size),
            pos.reshape(n_batches, batch_size),
            neg.reshape(n_batches, batch_size),
        )

    def kg_batches(self, seed: int, n_batches: int, batch_size_kg: int):
        """KG triple batches with exact-rejection corrupted tails."""
        assert self.kg is not None, "sampler built without KG triples"
        h, r, t, tails, n_entities = self.kg
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, h.shape[0], (n_batches, batch_size_kg))
        hh = h[idx].astype(np.int32)
        rr = r[idx].astype(np.int32)
        pt = t[idx].astype(np.int32)
        nt = np.stack([
            self._neg(rng, hh[b], tails, n_entities) for b in range(n_batches)
        ])
        return hh, rr, pt, nt


def epoch_kg_batches(
    rng: jax.Array,
    heads: jnp.ndarray,
    relations: jnp.ndarray,
    tails: jnp.ndarray,
    head_tails,
    n_entities: int,
    n_batches: int,
    batch_size_kg: int,
    rounds: int = 8,
):
    """KG triple batches with corrupted tails, on device.

    Equivalent of the KG half of `next_batch_unified`
    (util/sampler.py:33-88): per batch, a uniform random subsample of
    `batch_size_kg` triples, plus one negative tail per positive drawn
    uniformly from entities and redrawn while it is a true tail of
    (h, *). `head_tails`: per-head true-tail membership table (padded
    array or CSRMembership).

    Returns (h, r, pos_t, neg_t) each [n_batches, B_kg].
    """
    n = heads.shape[0]
    k_idx, k_neg = jax.random.split(rng)
    idx = jax.random.randint(k_idx, (n_batches, batch_size_kg), 0, n, jnp.int32)
    h = heads[idx]
    r = relations[idx]
    pos_t = tails[idx]
    neg_t = sample_negatives_chunked(k_neg, h, head_tails, n_entities, rounds)
    return h, r, pos_t, neg_t
