"""Fully-explicit sharded GRAPH training engine (shard_map LightGCN).

ShardedMF covers the table-only pattern; this module adds the explicit
1D-partitioned graph-propagation pattern the GSPMD trainer otherwise
derives implicitly (survey 2.8 obligations — the collective schedule is
written out, nothing is delegated to the partitioner):

  layout:   node table rows sharded over the `model` axis; the
            normalised adjacency pre-split by row window, each shard
            owning the edges whose DESTINATION rows it owns
  step:     per layer —
              x_full = all_gather(x_shard)          [ICI, O(N*d)]
              y_shard = segment_sum over LOCAL edges (gather from the
              full operand, reduce into owned rows only — no scatter
              crosses shards)
            final embeddings = mean over layer outputs (LightGCN.py:129-140)
  loss:     BPR on the data-sharded batch, read from the replicated
            propagated embeddings
  grads:    jax.grad THROUGH the collectives (all_gather transposes to
            reduce-scatter), psum over the data axis, local SGD update

Equivalence vs the single-device propagation is exact and tested on the
8-virtual-device CPU mesh (tests/test_sharded_gcn.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.losses import bpr_loss
from .mesh import DATA_AXIS, MODEL_AXIS


def shard_rows_coo(rows, cols, vals, n_rows_pad: int, shards: int):
    """Split row-sorted COO into per-shard row windows (host-side).

    Returns (local_rows, cols, vals) each [shards, e_pad]: window-local
    destination rows (pad = rows_per_shard, dropped by the OOB segment
    write), source cols in GLOBAL ids, values (pad 0).
    """
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    live = rows < n_rows_pad
    rows, cols, vals = rows[live], cols[live], vals[live]
    rps = n_rows_pad // shards
    starts = np.searchsorted(rows, np.arange(shards) * rps)
    ends = np.append(starts[1:], rows.shape[0])
    e_pad = max(int((ends - starts).max()), 1)
    lr = np.full((shards, e_pad), rps, np.int32)
    cc = np.zeros((shards, e_pad), np.int32)
    vv = np.zeros((shards, e_pad), np.float32)
    for s in range(shards):
        lo, hi = int(starts[s]), int(ends[s])
        n = hi - lo
        lr[s, :n] = rows[lo:hi] - s * rps
        cc[s, :n] = cols[lo:hi]
        vv[s, :n] = vals[lo:hi]
    return lr, cc, vv


class ShardedLightGCN:
    """LightGCN with explicitly sharded node table + row-split adjacency."""

    def __init__(self, mesh: Mesh, norm_adj, n_users: int, n_items: int, dim: int,
                 n_layers: int = 2, lrate: float = 0.05, seed: int = 0):
        self.mesh = mesh
        self.shards = mesh.shape[MODEL_AXIS]
        self.n_users = n_users
        self.n_items = n_items
        self.n_layers = n_layers
        self.lrate = lrate
        n_nodes = n_users + n_items
        self.n_pad = -(-n_nodes // self.shards) * self.shards
        self.rows_per_shard = self.n_pad // self.shards

        coo = norm_adj.tocoo()
        order = np.lexsort((coo.col, coo.row))
        lr, cc, vv = shard_rows_coo(
            coo.row[order], coo.col[order], coo.data[order], self.n_pad, self.shards
        )
        row_shard = NamedSharding(mesh, P(MODEL_AXIS, None))
        self.adj_lrows = jax.device_put(jnp.asarray(lr), row_shard)
        self.adj_cols = jax.device_put(jnp.asarray(cc), row_shard)
        self.adj_vals = jax.device_put(jnp.asarray(vv), row_shard)

        init = jax.nn.initializers.xavier_uniform()
        self.table = jax.device_put(
            init(jax.random.PRNGKey(seed), (self.n_pad, dim)), row_shard
        )
        self._step = self._build_step()
        self._encode = self._build_encode()

    # ------------------------------------------------------------------
    def _propagate(self, tbl_loc, lrows, cols, vals):
        """Mean of K propagation layers, LOCAL rows only: [N/S, d]."""
        rps = self.rows_per_shard
        acc_loc = tbl_loc
        x_full = jax.lax.all_gather(tbl_loc, MODEL_AXIS, axis=0, tiled=True)
        for _ in range(self.n_layers):
            gathered = x_full[cols[0]] * vals[0][:, None]
            y_loc = jax.ops.segment_sum(gathered, lrows[0], num_segments=rps)
            acc_loc = acc_loc + y_loc
            x_full = jax.lax.all_gather(y_loc, MODEL_AXIS, axis=0, tiled=True)
        return acc_loc / (self.n_layers + 1)

    def _build_step(self):
        lrate = self.lrate
        n_users = self.n_users
        n_data = self.mesh.shape[DATA_AXIS]

        def body(tbl_loc, lrows, cols, vals, users, pos, neg):
            def loss_fn(tbl):
                out_loc = self._propagate(tbl, lrows, cols, vals)
                # replicate the propagated embeddings for batch lookups
                out = jax.lax.all_gather(out_loc, MODEL_AXIS, axis=0, tiled=True)
                ue = out[users]
                pe = out[n_users + pos]
                ne = out[n_users + neg]
                return bpr_loss(ue, pe, ne)

            loss, grad = jax.value_and_grad(loss_fn)(tbl_loc)
            grad = jax.lax.psum(grad, DATA_AXIS) / n_data
            return tbl_loc - lrate * grad, jax.lax.pmean(loss, DATA_AXIS)

        fn = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(
                P(MODEL_AXIS, None),
                P(MODEL_AXIS, None), P(MODEL_AXIS, None), P(MODEL_AXIS, None),
                P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
            ),
            out_specs=(P(MODEL_AXIS, None), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def _build_encode(self):
        def body(tbl_loc, lrows, cols, vals):
            out_loc = self._propagate(tbl_loc, lrows, cols, vals)
            return jax.lax.all_gather(out_loc, MODEL_AXIS, axis=0, tiled=True)

        fn = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(
                P(MODEL_AXIS, None),
                P(MODEL_AXIS, None), P(MODEL_AXIS, None), P(MODEL_AXIS, None),
            ),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(fn)

    # ------------------------------------------------------------------
    def train_step(self, users, pos, neg) -> float:
        self.table, loss = self._step(
            self.table, self.adj_lrows, self.adj_cols, self.adj_vals, users, pos, neg
        )
        return float(loss)

    def embeddings(self) -> tuple[np.ndarray, np.ndarray]:
        out = np.asarray(
            self._encode(self.table, self.adj_lrows, self.adj_cols, self.adj_vals)
        )
        return out[: self.n_users], out[self.n_users : self.n_users + self.n_items]
