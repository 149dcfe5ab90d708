from . import dropout, losses, sampling, sparse, topk
from .sparse import (
    scatter_mean,
    scatter_sum,
    segment_softmax,
    sp_dense_left,
    spmm,
    spmm_t,
    two_hop,
)

__all__ = [
    "dropout",
    "losses",
    "sampling",
    "sparse",
    "topk",
    "scatter_mean",
    "scatter_sum",
    "segment_softmax",
    "sp_dense_left",
    "spmm",
    "spmm_t",
    "two_hop",
]
