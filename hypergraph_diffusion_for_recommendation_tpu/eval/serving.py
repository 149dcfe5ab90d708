"""Standalone serving: embedding export + batched top-k retrieval.

The reference has no deployment story — the closest artefact is the
`<Model>-top-N items.txt` dump written during evaluation
(base/graph_recommender.py:94-118), which requires the full dataset and
a trained model in memory. Production retrieval needs neither: scoring
a user is one [d] x [d, I] MXU matvec over frozen tables. This module
splits serving from training:

  * `export_embeddings` persists everything retrieval needs — the
    encoded user/item tables, the raw<->dense id maps, and the per-user
    rated-item mask — as one `.npz` artifact (written by the training
    CLI with `--export_embeddings`, or `Recommender.export_embeddings()`);
  * `Retriever` memory-maps that artifact and answers batched top-k
    queries on device: blocked [B, d] x [d, I] scoring (fp32 MXU, same
    precision as eval), rated-item scatter-mask, `lax.top_k` — the eval
    path's kernels (ops/topk.py) with no model, dataset, or optimiser
    dependencies. With a `(data, model)` mesh it switches to the
    sharded catalog path (parallel/topk.sharded_user_topk: local top-k
    per item shard + all_gather candidate merge), so catalogs larger
    than one chip's HBM serve across chips.

Raw-id translation happens on host by design: id vocabularies are
dataset artifacts, not model state, and the query path's device work
stays static-shape.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.topk import masked_topk, topk_ids


def export_embeddings(
    path: str,
    user_emb,
    item_emb,
    id2user: np.ndarray,
    id2item: np.ndarray,
    rated_pad: np.ndarray | None = None,
    meta: dict | None = None,
) -> str:
    """Write the serving artifact. `rated_pad` is the [n_users, max_deg]
    padded training-history table (pad = -1); None disables rated-item
    exclusion at serving time."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {
        "user_emb": np.asarray(user_emb, np.float32),
        "item_emb": np.asarray(item_emb, np.float32),
        "id2user": np.asarray(id2user, np.int64),
        "id2item": np.asarray(id2item, np.int64),
        "meta": np.frombuffer(
            json.dumps(meta or {}).encode(), dtype=np.uint8
        ),
    }
    if rated_pad is not None:
        arrays["rated_pad"] = np.asarray(rated_pad, np.int32)
    np.savez_compressed(path, **arrays)
    return path


class Retriever:
    """Device-resident top-k retrieval over exported embedding tables.

    >>> r = Retriever.load("results/.../embeddings.npz")
    >>> ids, scores = r.topk([raw_user, ...], k=20)
    """

    def __init__(
        self,
        user_emb: np.ndarray,
        item_emb: np.ndarray,
        id2user: np.ndarray,
        id2item: np.ndarray,
        rated_pad: np.ndarray | None = None,
        meta: dict | None = None,
        mesh=None,
        block: int = 1024,
    ):
        self.meta = meta or {}
        self.block = int(block)
        self.id2user = np.asarray(id2user)
        self.id2item = np.asarray(id2item)
        self.user_index = {int(u): i for i, u in enumerate(self.id2user)}
        self.n_users, self.dim = user_emb.shape
        self.n_items = item_emb.shape[0]
        self.mesh = mesh
        self._sharded = mesh is not None and mesh.shape.get("model", 1) > 1

        if self._sharded:
            from ..parallel.mesh import MODEL_AXIS
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.user_emb = jax.device_put(
                jnp.asarray(user_emb, jnp.float32), NamedSharding(mesh, P())
            )
            self.item_emb = jax.device_put(
                jnp.asarray(item_emb, jnp.float32),
                NamedSharding(mesh, P(MODEL_AXIS, None)),
            )
        else:
            self.user_emb = jnp.asarray(user_emb, jnp.float32)
            self.item_emb = jnp.asarray(item_emb, jnp.float32)
        if rated_pad is None:
            self.rated_pad = None
        else:
            rp = jnp.asarray(rated_pad, jnp.int32)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rp = jax.device_put(rp, NamedSharding(mesh, P()))
            self.rated_pad = rp
        self._topk_fns: dict = {}

    # -- construction ----------------------------------------------------
    @classmethod
    def load(cls, path: str, mesh=None, block: int = 1024) -> "Retriever":
        with np.load(path) as z:
            meta = json.loads(bytes(z["meta"]).decode()) if "meta" in z else {}
            return cls(
                z["user_emb"], z["item_emb"], z["id2user"], z["id2item"],
                z["rated_pad"] if "rated_pad" in z.files else None,
                meta=meta, mesh=mesh, block=block,
            )

    # -- retrieval ---------------------------------------------------------
    def _fn(self, k: int, masked: bool):
        key = (k, masked)
        if key not in self._topk_fns:
            if self._sharded:
                from ..parallel.topk import sharded_user_topk

                mesh = self.mesh

                def fn(u_block, rated_block):
                    return sharded_user_topk(
                        mesh, u_block, self.item_emb, rated_block, k
                    )

                self._topk_fns[key] = fn
            elif masked:
                self._topk_fns[key] = jax.jit(
                    lambda u, rated: masked_topk(
                        jnp.dot(u, self.item_emb.T, precision="highest"), rated, k
                    )
                )
            else:
                self._topk_fns[key] = jax.jit(
                    lambda u, rated: topk_ids(
                        jnp.dot(u, self.item_emb.T, precision="highest"), k
                    )
                )
        return self._topk_fns[key]

    def dense_user_ids(self, raw_user_ids) -> np.ndarray:
        unknown = [u for u in raw_user_ids if int(u) not in self.user_index]
        if unknown:
            raise KeyError(
                f"{len(unknown)} user id(s) not in the export's vocabulary "
                f"(first few: {unknown[:5]})"
            )
        return np.asarray([self.user_index[int(u)] for u in raw_user_ids], np.int32)

    def topk(
        self,
        raw_user_ids,
        k: int = 20,
        exclude_rated: bool = True,
        raw_ids: bool = True,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched retrieval: ([B] raw user ids) -> (ids [B, k], scores
        [B, k]). `raw_ids=False` returns dense item ids instead of raw.
        Queries run in `block`-user device batches (the last block is
        padded, never truncated)."""
        users = self.dense_user_ids(raw_user_ids)
        masked = exclude_rated and self.rated_pad is not None
        fn = self._fn(k, masked)
        n = users.shape[0]
        out_ids = np.empty((n, k), np.int64)
        out_scores = np.empty((n, k), np.float32)
        for s in range(0, n, self.block):
            blk = users[s : s + self.block]
            nb = blk.shape[0]
            if nb < self.block:  # pad to the jitted block shape
                blk = np.concatenate([blk, np.zeros(self.block - nb, np.int32)])
            u = self.user_emb[jnp.asarray(blk)]
            if masked:
                rated = self.rated_pad[jnp.asarray(blk)]
            elif self._sharded:
                # an all-pad table masks nothing in the sharded body
                rated = jnp.full((self.block, 1), -1, jnp.int32)
            else:
                rated = None
            vals, ids = fn(u, rated)
            out_ids[s : s + nb] = np.asarray(ids)[:nb]
            out_scores[s : s + nb] = np.asarray(vals)[:nb]
        if raw_ids:
            out_ids = self.id2item[out_ids]
        return out_ids, out_scores

    def scores(self, raw_user_id) -> np.ndarray:
        """Full-catalog scores for one user (the facade `predict(u)`
        shape, reference KHGRec.py:222-225)."""
        uid = self.dense_user_ids([raw_user_id])[0]
        return np.asarray(
            jnp.dot(self.user_emb[uid], self.item_emb.T, precision="highest")
        )
