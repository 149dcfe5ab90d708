from .embedding import (
    a2a_sharded_lookup,
    sharded_lookup,
    sharded_scatter_add,
    spmd_a2a_lookup,
)
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharded,
    make_mesh,
    param_shardings,
    replicated,
    row_sharded,
)
from .sharded_adj import (
    ShardedCOO,
    shard_adj_pair,
    shard_adj_pair_from_scipy,
    shard_sparse,
    sharded_spmm,
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
    "a2a_sharded_lookup",
    "sharded_lookup",
    "spmd_a2a_lookup",
    "sharded_scatter_add",
    "sharded_user_topk",
    "ShardedCOO",
    "shard_adj_pair",
    "shard_adj_pair_from_scipy",
    "shard_sparse",
    "sharded_spmm",
    "ShardedLightGCN",
    "ShardedMF",
    "shard_rows_coo",
]
