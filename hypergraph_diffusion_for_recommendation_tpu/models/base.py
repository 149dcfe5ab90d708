"""Model bundle protocol + registry.

The reference instantiates models by `exec`/`eval` on the model name
(SELFRec.py:37-42 — survey 7.4); here a plain registry maps the name to
a `build(cfg, cf, kg) -> ModelBundle` factory.

A ModelBundle is a set of pure functions over pytrees; the trainer jits
one epoch (sampling + scan of train steps) and the evaluator around
them. `extras` carries per-epoch mutable state that is not optimised by
the CF optimizer (e.g. the KG attention adjacency values of
KGAT/KHGRec).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax

from ..core.config import Config
from ..data.device import CFDeviceData, KGDeviceData

# batch pytree produced by the sampler; models consume what they need
Batch = Any
Params = Any
Extras = Any


@dataclass
class ModelBundle:
    name: str
    cfg: Config
    cf: CFDeviceData
    kg: Optional[KGDeviceData]
    uses_kg: bool
    # rng -> (params, extras)
    init: Callable[[jax.Array], tuple[Params, Extras]]
    # (params, extras, batch, rng) -> (loss, aux_metrics_dict)
    batch_loss: Callable[[Params, Extras, Batch, jax.Array], tuple[jax.Array, dict]]
    # (params, extras) -> (user_emb, item_emb) — deterministic, full graph
    encode_eval: Callable[[Params, Extras], tuple[jax.Array, jax.Array]]
    # optional per-batch extras refresh BEFORE the gradient step
    # (params, extras, batch, rng) -> extras   (KHGRec attention update,
    # KHGRec.py:122)
    update_extras: Optional[Callable] = None
    # optional per-epoch extras refresh (KGAT epoch-level attention,
    # KGAT.py:129-133): (params, extras, rng) -> extras
    epoch_update_extras: Optional[Callable] = None
    # optional per-epoch setup INSIDE the jitted epoch, before the batch
    # scan (SGL draws its two augmented graph views once per epoch,
    # SGL.py:61-62): (params, extras, rng) -> extras
    epoch_setup: Optional[Callable] = None
    # optional global-norm gradient clip (HCCF/SGL use
    # torch.nn.utils.clip_grad_norm_(model.parameters(), 4), HCCF.py:94)
    grad_clip_norm: Optional[float] = None
    # KGAT-style alternating optimisation (KGAT.py:66-125): when True the
    # epoch runs a CF phase (batch_loss, CF optimizer) then a KG phase
    # (kg_batch_loss, KG optimizer); epoch_update_extras then refreshes
    # the attention adjacency from the full triple list (KGAT.py:129-133)
    alternating: bool = False
    # (params, extras, kg_batch, rng) -> (loss, aux) for the KG phase
    kg_batch_loss: Optional[Callable] = None
    # sequential models carry padded sequence arrays and switch the
    # trainer to windowed batches (base/seq_recommender.py lifecycle)
    seq: Any = None
    batch_kind: str = "pairwise"  # 'pairwise' | 'sequence'
    # whether the reference steps ReduceLROnPlateau for this model. Most
    # do (KHGRec.py:41-42,191 etc.); LightGCN/SGL/AutoCF/LRMRec import
    # the scheduler but never instantiate or step it (LightGCN.py:37 —
    # plain Adam, fixed lr), so the trainer must not anneal for them
    # either (parity: annealing changes the converged optimum).
    lr_plateau: bool = True
    # early-stopping patience multiplier. Self-att encoders (HGNN/HD2,
    # HGNN_cp.py:369) plateau early on some seeds before a late recall
    # climb; patience x2 rides out the plateau (root-caused round 3:
    # the 1-in-3-seed 0.212-vs-0.37 outlier was an early-stop artifact —
    # the same seed converges to parity with doubled patience).
    early_stop_patience_scale: int = 1


MODEL_REGISTRY: dict[str, Callable[..., ModelBundle]] = {}


def register_model(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn

    return deco


# mesh visible to builders DURING build_model (explicit-collective
# lookup wiring, survey 2.8): builders capture it in their closures, so
# there is no global routing state after the build returns
_BUILD_MESH = None


def build_mesh():
    """The mesh passed to the in-flight build_model call (or None)."""
    return _BUILD_MESH


# Which CFDeviceData adjacency representations each model module's
# builders consume (grep-audited; tests assert it stays in sync). The
# reference builds every representation for every model
# (data/ui_graph.py:13-41 constructs all five unconditionally); at
# production scale the unused ones are the difference between fitting
# in HBM and OOM (a 10M-edge LightGCN run needs 1 of the 6 pairs).
_MODULE_DATA_NEEDS = {
    "mf": frozenset(),
    "sasrec": frozenset(),
    "kgat": frozenset(),
    "ktup_ripplenet": frozenset(),
    "lightgcn": frozenset({"adj"}),
    "hccf": frozenset({"adj"}),
    "hccf_diffusion": frozenset({"adj"}),
    "hgcn": frozenset({"adj"}),
    "sht": frozenset({"adj"}),
    "ssl_family": frozenset({"adj"}),
    "khgrec": frozenset({"adj"}),
    "dhcf": frozenset({"raw_int"}),
    "dhcf_diffusion": frozenset({"raw_int"}),
    "hd_family": frozenset({"adj", "b_hyper"}),
    "kgin_kgcl": frozenset({"adj", "int_norm"}),
    "autocf": frozenset({"adj", "raw_adj"}),
    "sgl": frozenset({"adj", "raw_adj", "raw_int"}),
    "social_models": frozenset({"adj", "inv_int_norm"}),
}


# Which adjacency representations may be built ROW-WINDOW SHARDED
# (parallel/sharded_adj.py) for each model NAME: only representations
# the model touches exclusively through spmm/spmm_pair/two_hop and
# AdjPair.dropped qualify. Scatter-form models (HD, HGNN_HD2 — they
# read inc.fwd.rows/cols directly) and the augmentation models
# (SGL/AutoCF — with_new_vals/renormalize_sym on raw layouts) keep
# replicated adjacencies. "kg" marks the KG adjacency (KGDeviceData).
_MODEL_SHARD_NEEDS = {
    "MF": frozenset(),
    "LightGCN": frozenset({"adj"}),
    "HCCF": frozenset({"adj"}),
    "HGCN": frozenset({"adj"}),
    "SHT": frozenset({"adj"}),
    "HGNN_HD": frozenset({"adj", "b_hyper"}),
    "HGNN_HD3": frozenset({"adj", "b_hyper"}),
    "HGNN_HD4": frozenset({"adj", "b_hyper"}),
    "LocalEncoder": frozenset({"adj", "b_hyper"}),
    "WaveletHD": frozenset({"adj", "b_hyper"}),
    "WaveletHD2": frozenset({"adj", "b_hyper"}),
    "KHGRec": frozenset({"adj", "kg"}),
}


def model_shard_needs(name: str) -> frozenset:
    """Adjacency representations safe to shard for `name` (possibly
    empty). Unlisted models keep fully replicated adjacencies."""
    return _MODEL_SHARD_NEEDS.get(name, frozenset())


def model_data_needs(name: str):
    """Adjacency representations `name`'s builder consumes, or None
    (= build everything) for unregistered/unknown names."""
    if name not in MODEL_REGISTRY:
        return None
    import inspect

    mod = inspect.getmodule(MODEL_REGISTRY[name]).__name__.rsplit(".", 1)[-1]
    return _MODULE_DATA_NEEDS.get(mod)


def build_model(
    cfg: Config,
    cf: CFDeviceData,
    kg: Optional[KGDeviceData] = None,
    social: Any = None,
    mesh: Any = None,
) -> ModelBundle:
    if cfg.model not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown model {cfg.model!r}. Registered: {sorted(MODEL_REGISTRY)}"
        )
    import inspect

    global _BUILD_MESH
    fn = MODEL_REGISTRY[cfg.model]
    _BUILD_MESH = mesh
    try:
        if "social" in inspect.signature(fn).parameters:
            return fn(cfg, cf, kg, social=social)
        return fn(cfg, cf, kg)
    finally:
        _BUILD_MESH = None
