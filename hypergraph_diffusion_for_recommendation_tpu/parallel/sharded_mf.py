"""Fully-explicit sharded embedding training engine (shard_map).

GSPMD handles the mesh path in the Trainer; this module is the
EXPLICIT-collectives counterpart for the north-star embedding engine
(survey 2.8 obligations): user/item tables row-sharded over the `model`
axis, batches sharded over the `data` axis, and each training step doing

  lookup:   local-window gather + psum over the model axis
            (parallel/embedding.sharded_lookup — O(B*d) comms)
  grads:    per-shard scatter-add of embedding gradients into the local
            table window (sharded_scatter_add), then psum over the DATA
            axis only (each data replica saw different batch rows)
  update:   plain SGD/Adam on the local windows — no table gather ever

The whole step lives in ONE shard_map, so the collective schedule is
exactly what is written — nothing is delegated to the partitioner. Used
for BPR-MF (the reference's base model); the pattern generalises to any
table-dominated model.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.losses import bpr_loss
from .embedding import sharded_lookup, sharded_scatter_add
from .mesh import DATA_AXIS, MODEL_AXIS


def _pad_rows(n: int, shards: int) -> int:
    return -(-n // shards) * shards


class ShardedMF:
    """BPR-MF with explicitly sharded tables and collectives."""

    def __init__(self, mesh: Mesh, n_users: int, n_items: int, dim: int,
                 lrate: float = 0.05, seed: int = 0):
        self.mesh = mesh
        self.shards = mesh.shape[MODEL_AXIS]
        self.n_users = n_users
        self.n_items = n_items
        self.dim = dim
        self.lrate = lrate
        u_rows = _pad_rows(n_users, self.shards)
        i_rows = _pad_rows(n_items, self.shards)
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        init = jax.nn.initializers.xavier_uniform()
        row_shard = NamedSharding(mesh, P(MODEL_AXIS, None))
        self.user_table = jax.device_put(init(k1, (u_rows, dim)), row_shard)
        self.item_table = jax.device_put(init(k2, (i_rows, dim)), row_shard)
        self._step = self._build_step()

    def _build_step(self):
        lrate = self.lrate
        n_data = self.mesh.shape[DATA_AXIS]

        def step_body(u_tbl, i_tbl, users, pos, neg):
            # users/pos/neg: this data-shard's slice of the batch
            ue = sharded_lookup(u_tbl, users, MODEL_AXIS)
            pe = sharded_lookup(i_tbl, pos, MODEL_AXIS)
            ne = sharded_lookup(i_tbl, neg, MODEL_AXIS)

            def loss_fn(ue, pe, ne):
                return bpr_loss(ue, pe, ne)

            loss, (d_ue, d_pe, d_ne) = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(ue, pe, ne)
            # scatter embedding grads into the LOCAL table windows; each
            # data replica contributes its batch slice -> psum over data
            du = sharded_scatter_add(jnp.zeros_like(u_tbl), users, d_ue, MODEL_AXIS)
            di = sharded_scatter_add(jnp.zeros_like(i_tbl), pos, d_pe, MODEL_AXIS)
            di = sharded_scatter_add(di, neg, d_ne, MODEL_AXIS)
            du = jax.lax.psum(du, DATA_AXIS) / n_data
            di = jax.lax.psum(di, DATA_AXIS) / n_data
            u_tbl = u_tbl - lrate * du
            i_tbl = i_tbl - lrate * di
            return u_tbl, i_tbl, jax.lax.pmean(loss, DATA_AXIS)

        fn = jax.shard_map(
            step_body,
            mesh=self.mesh,
            in_specs=(
                P(MODEL_AXIS, None), P(MODEL_AXIS, None),
                P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
            ),
            out_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS, None), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def train_step(self, users, pos, neg) -> float:
        self.user_table, self.item_table, loss = self._step(
            self.user_table, self.item_table, users, pos, neg
        )
        return float(loss)

    def embeddings(self) -> tuple[np.ndarray, np.ndarray]:
        return (
            np.asarray(self.user_table)[: self.n_users],
            np.asarray(self.item_table)[: self.n_items],
        )
