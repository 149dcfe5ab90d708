from .embedding import sharded_lookup, sharded_scatter_add
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharded,
    make_mesh,
    param_shardings,
    replicated,
    row_sharded,
)
from .sharded_gcn import ShardedLightGCN, shard_rows_coo
from .sharded_mf import ShardedMF
from .topk import sharded_user_topk

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharded",
    "make_mesh",
    "param_shardings",
    "replicated",
    "row_sharded",
    "sharded_lookup",
    "sharded_scatter_add",
    "sharded_user_topk",
    "ShardedLightGCN",
    "ShardedMF",
    "shard_rows_coo",
]
