"""Unified typed configuration.

The reference keeps two inconsistent config systems — `.conf` key=value
files parsed by `util/conf.py:10-35` plus argparse kwargs that silently
override them (`main.py:6-95`, survey section 2.10). Here there is ONE
typed dataclass; per-model defaults live in `MODEL_DEFAULTS` (standing in
for the reference's `conf/*.conf` files) and CLI/keyword overrides are
applied explicitly on top.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass
class Config:
    # --- experiment selection (reference main.py:9-12) ---
    model: str = "MF"
    dataset: str = "synthetic"
    experiment: str = "full"  # full | cold_start | missing | add_noise
    group_id: int = 1  # cold-start user-degree quartile
    missing_pct: int = 0
    noise_pct: int = 0

    # --- data ---
    data_dir: str = "./dataset"
    training_set: str = "train.txt"
    test_set: str = "test.txt"
    knowledge_file: str = ""  # path to KG triples (h \t r \t t)
    use_knowledge: bool = False

    # --- core training hyperparameters (reference main.py:20-95) ---
    seed: int = 60
    lrate: float = 0.001
    lr_decay: float = 0.9  # ReduceLROnPlateau factor
    lr_patience: int = 10  # plateau patience (reference KHGRec.py:42)
    max_epoch: int = 500
    batch_size: int = 2048
    batch_size_kg: int = 8192
    n_layers: int = 2
    embedding_size: int = 32
    input_dim: int = 32
    relation_dim: int = 32
    hyper_dim: int = 32
    hyperedge_num: int = 32
    weight_decay: float = 5e-6
    reg: float = 0.01
    reg_kg: float = 0.01
    p: float = 0.3  # leaky-relu negative slope ("leaky" in conf files)
    drop_rate: float = 0.2
    nheads: int = 4
    temp: float = 10.0
    cl_rate: float = 0.01
    alpha: float = 1.0  # KG loss weight
    mode: str = "full"  # full|woatt|wossl|wohyper|woglobal|local_only|group_only
    aug_type: int = 1
    laplacian_type: str = "random-walk"
    aggregation_type: str = "bi-interaction"  # KGAT: gcn|graphsage|bi-interaction
    conv_dim_list: Sequence[int] = (64, 32, 16)
    mess_dropout: Sequence[float] = (0.1, 0.1, 0.1)
    early_stopping_steps: int = 30
    # trailing moving-average window for the early-stop signal (1 =
    # reference-parity raw series; >1 smooths the patience signal so a
    # single noisy recall spike can't anchor `best` early and stop the
    # run in a bad basin — see scripts/stopping_rule_ab.py for the A/B)
    early_stop_smooth: int = 1
    # patience multiplier override: 0 = the model bundle's default
    # (x2 for self-att encoders and HCCF, whose measured recall troughs
    # outlast patience-15 — models/base.py early_stop_patience_scale);
    # an explicit value pins it, e.g. 1 for reference-protocol parity
    early_stop_patience_scale: int = 0
    evaluate_every: int = 1
    item_ranking: Sequence[int] = (10, 20, 40)  # top-N cutoffs

    # --- TPU-native knobs (new capability vs reference) ---
    mesh_data: int = 1  # data-parallel axis size (0/1 = single device)
    mesh_model: int = 1  # model-parallel axis size (table/item sharding)
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # bfloat16 for large-scale runs
    use_pallas: str = "auto"  # auto | always | never
    # gather layout for the pallas blocked packs: auto picks the
    # dedup-gather layout by column multiplicity (1.89x at ML-1M
    # density, BENCH_NOTES r3); int8 variants quantise the gathered
    # operand (~1% fwd error, exact f32 backward)
    gather_layout: str = "auto"  # auto | base | dedup | int8 | dedup_int8
    # max train steps per device execution (0 = auto). The axon TPU
    # worker faults when ONE execution's cumulative pallas DMA traffic
    # crosses ~2^40 bytes (empirically bisected, scripts/bisect_pallas.py
    # --scan); auto splits the epoch scan into chunked executions that
    # stay under a 2^38-byte budget (HGDR_PALLAS_EXEC_BUDGET).
    scan_chunk_steps: int = 0
    neg_resample_rounds: int = 8  # on-device rejection-free redraw rounds
    # "redraw" = on-device fixed-round redraw (production default);
    # "exact"  = host-side exact rejection loop with the reference's
    # semantics (util/sampler.py:252-257) — the parity-A/B control for
    # the sampling-distribution hypothesis (VERDICT r3 #1)
    sampler: str = "redraw"
    # Cached-propagation training (opt-in TPU-first speed knob the
    # reference cannot offer; VERDICT r4 next #1). K>1: every K-th step
    # runs the true full-graph loss (training every parameter and
    # refreshing cached propagated tables from that same forward); the
    # K-1 steps between train on the cached tables with a
    # straight-through identity path into the embedding table — forward
    # values are exactly the cached propagation, gradients flow through
    # each row's own-embedding (residual/self) component, and the
    # full-graph spmm chains are skipped. Converged-quality A/B:
    # results/prop_cache_ab/ (scripts/prop_cache_ab.py). Supported by
    # the KHGRec family (KHGRec/HGNN/HD2/HGNNAblation + variations) and
    # the HD family (HD/HGNN_HD1-4/WaveletHD/LocalEncoder); other
    # models ignore the knob. 0/1 = off (reference-parity semantics).
    prop_cache_steps: int = 0
    # SHT regularisation semantics: "batch" (product default — batch-row
    # squared L2 + hyperedge-table weight decay, the convention every
    # other model uses) or "full" (the reference's exact full-parameter
    # calcRegLoss, SHT.py:234-239 — norm-collapse seed lottery at the
    # pinned parity config; A/B in results/sht_reg_ab/)
    sht_reg: str = "batch"
    shard_min_rows: int = 1024  # min table rows before row-sharding kicks in
    # row-window-shard the graph adjacencies over the mesh's model axis
    # (parallel/sharded_adj.py; per-device adjacency memory ~nnz/S):
    # auto = shard the representations models.model_shard_needs(model)
    # declares safe whenever mesh_model > 1; on = same but assert the
    # model supports it; off = always replicate
    shard_graph: str = "auto"  # auto | on | off
    eval_user_batch: int = 512  # users scored per eval block
    pad_multiple: int = 8  # pad nnz/rows to multiples of this
    # (a one-epoch-lagged `async_eval` option was removed after
    # measurement: a TPU chip's single compute stream serialises
    # train+eval, 0% hidden on the real chip — scripts/eval_overlap_mesh.py)

    # --- artifacts ---
    output_dir: str = "./results"
    log_dir: str = "./log"
    save_checkpoints: bool = False
    resume: bool = False
    # write <run_dir>/embeddings.npz (best-epoch tables + id maps +
    # rated mask) for standalone retrieval via eval/serving.Retriever
    export_embeddings: bool = False

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    @property
    def top_ns(self) -> list[int]:
        return list(self.item_ranking)

    @property
    def max_n(self) -> int:
        return max(self.item_ranking)


# Per-model defaults, mirroring the reference's conf/<Model>.conf files
# (e.g. conf/KHGRec.conf: batch_size=2048, hyper.size=128, temp=1;
# conf/LightGCN.conf: reg.lambda=0.1). Values the reference overrides via
# its CLI docstring command lines are preferred where they exist (the
# committed result CSVs were produced from those command lines, e.g.
# model/graph/HGNN_HD3.py:26-30).
MODEL_DEFAULTS: dict[str, dict[str, Any]] = {
    "MF": dict(reg=0.1),
    "DirectAU": dict(reg=0.1),
    "LightGCN": dict(n_layers=2, reg=0.1),
    "SGL": dict(n_layers=2, reg=0.1, cl_rate=0.1, drop_rate=0.1, temp=0.2, aug_type=1),
    # HCCF CLI docstring (HCCF.py:18-21): lr 1e-3, drop 0.5, cl 1e-4, temp 0.2
    "HCCF": dict(n_layers=2, reg=0.1, hyper_dim=128, drop_rate=0.5, p=0.1, temp=0.2, cl_rate=1e-4, lrate=0.001),
    "HCCF_diffusion": dict(n_layers=2, reg=0.1, hyper_dim=128, drop_rate=0.5, p=0.1, temp=0.2, cl_rate=1e-4, lrate=0.001),
    "DHCF": dict(n_layers=2, reg=0.01),
    "DHCF_diffusion": dict(n_layers=2, reg=0.01),
    "SHT": dict(n_layers=2, reg=0.01, hyper_dim=128, hyperedge_num=128, cl_rate=0.001, temp=0.2),
    "HGCN": dict(n_layers=2, reg=0.01),
    "KGAT": dict(use_knowledge=True, reg=1e-5, reg_kg=1e-5, lrate=0.0001),
    "KHGRec": dict(use_knowledge=True, hyper_dim=128, batch_size=2048, temp=1.0, cl_rate=0.01, n_layers=2, drop_rate=0.2, p=0.3),
    "HGNN": dict(use_knowledge=True, hyper_dim=128, temp=1.0, cl_rate=0.01),
    "HGNNAblation": dict(use_knowledge=True, hyper_dim=128),
    "HD": dict(hyper_dim=128, lrate=0.01, drop_rate=0.2, p=0.3, reg=0.1),
    "HD2": dict(use_knowledge=True, hyper_dim=128, lrate=0.01),
    "HGNN_HD": dict(hyper_dim=128, lrate=0.01, drop_rate=0.2, p=0.3, reg=0.1),
    "HGNN_HD2": dict(hyper_dim=128, lrate=0.01, drop_rate=0.2, p=0.3, reg=0.1),
    "HGNN_HD3": dict(hyper_dim=128, lrate=0.01, weight_decay=5e-6, drop_rate=0.2, p=0.3, cl_rate=1e-5, temp=0.2, reg=0.1, early_stopping_steps=20, seed=20),
    "HGNN_HD4": dict(hyper_dim=128, lrate=0.01, drop_rate=0.2, p=0.3, cl_rate=1e-5, temp=0.2, reg=0.1),
    "WaveletHD": dict(hyper_dim=128, lrate=0.01, reg=0.1),
    "WaveletHD2": dict(hyper_dim=128, lrate=0.01, reg=0.1),
    "LocalEncoder": dict(hyper_dim=128, lrate=0.01, reg=0.1),
    "AutoCF": dict(n_layers=2, reg=0.01),
    "LRMRec": dict(n_layers=2, reg=0.01),
    "KGIN": dict(use_knowledge=True),
    "KGCL": dict(use_knowledge=True, cl_rate=0.1, temp=0.2),
    "KTUP": dict(use_knowledge=True),
    "HKGRippleNet": dict(use_knowledge=True),
    "SimGCL": dict(cl_rate=0.1, temp=0.2, reg=0.1),
    "XSimGCL": dict(cl_rate=0.1, temp=0.2, reg=0.1),
    "NCL": dict(cl_rate=0.1, temp=0.2, reg=0.1),
    "MixGCF": dict(n_layers=2, reg=0.1),
    "SSL4Rec": dict(cl_rate=0.1, temp=0.2),
    "SEPT": dict(cl_rate=0.1),
    "BUIR": dict(lrate=0.01, reg=0.01),
    "SelfCF": dict(lrate=0.01, reg=0.01, drop_rate=0.2),
    "MHCN": dict(cl_rate=0.1),
}


def make_config(model: str | None = None, **overrides: Any) -> Config:
    """Build a Config: model defaults first, explicit overrides on top."""
    base: dict[str, Any] = {}
    if model is not None:
        base["model"] = model
        base.update(MODEL_DEFAULTS.get(model, {}))
    base.update(overrides)
    valid = {f.name for f in dataclasses.fields(Config)}
    unknown = set(base) - valid
    if unknown:
        raise ValueError(f"Unknown config keys: {sorted(unknown)}")
    return Config(**base)
