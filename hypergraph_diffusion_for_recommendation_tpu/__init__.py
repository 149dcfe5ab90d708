"""TPU-native hypergraph-diffusion recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
HD_SELFRec reference (SELFRec + hypergraph-diffusion recommenders +
knowledge-graph-augmented training). The compute path is pure JAX
(sparse ops as padded-COO segment kernels, Pallas kernels for the hot
SpMM/two-hop ops on TPU), parallelism is `jax.sharding` over a device
mesh, and the runtime around it (loaders, trainers, eval, logging,
checkpointing) is built TPU-first: static shapes, on-device sampling,
fused full-catalog evaluation.

Layer map (mirrors SURVEY.md section 7.1):
  core/      typed config, sparse pytree formats, mesh & PRNG discipline
  data/      host-side loaders, id maps, graph construction, experiments
  ops/       XLA + Pallas kernels: spmm, two-hop, segment softmax, top-k,
             on-device negative sampling, edge dropout, losses
  models/    the model zoo (MF ... LightGCN ... HCCF ... HD family ... KHGRec)
  parallel/  sharded embedding tables, DP/MP train-step sharding, dist top-k
  train/     jit'd epoch loops, optimizers, plateau scheduling, early stop
  eval/      full-catalog scorer + on-device ranking metrics
  utils/     logging, CSV artifacts, checkpointing, registry
"""

__version__ = "0.1.0"
