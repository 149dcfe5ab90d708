"""Device-mesh construction.

The reference is strictly single-process single-GPU (survey 2.8); the
TPU framework adds the distributed layer as first-class: a 2-D logical
mesh with a `data` axis (batch/data parallelism, gradients psum'd by
XLA) and a `model` axis (row-sharded embedding tables, item-sharded
eval scoring + distributed top-k).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = 0, model: int = 0, devices=None) -> Mesh:
    """Build a (data, model) mesh. With data=model=0, auto-factor the
    available devices into (n // model_guess, model_guess)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data <= 0 and model <= 0:
        # favour the data axis; model axis only when n is even and > 2
        model = 2 if n % 2 == 0 and n > 2 else 1
        data = n // model
    elif data <= 0:
        data = n // model
    elif model <= 0:
        model = n // data
    assert data * model <= n, (data, model, n)
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Rows over the model axis — embedding tables."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Leading axis over the data axis — per-step batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


# parameter names that are embedding tables: rows sharded over MODEL_AXIS
# (the survey 2.8 "row-sharded user/item/entity tables" obligation)
TABLE_PARAM_NAMES = frozenset(
    {
        "user_emb",
        "item_emb",
        "user_entity_emb",
        "entity_user_embed",
    }
)


def param_shardings(params, mesh: Mesh, min_rows: int = 1024):
    """Sharding pytree for a params tree: embedding tables row-sharded
    over the model axis (when divisible and large enough), everything
    else replicated."""
    model_size = mesh.shape[MODEL_AXIS]

    def walk(tree, name=None):
        if isinstance(tree, dict):
            return {k: walk(v, k) for k, v in tree.items()}
        shape = getattr(tree, "shape", ())
        if (
            name in TABLE_PARAM_NAMES
            and len(shape) == 2
            and shape[0] >= min_rows
            and shape[0] % model_size == 0
            and model_size > 1
        ):
            return row_sharded(mesh)
        return replicated(mesh)

    return walk(params)
