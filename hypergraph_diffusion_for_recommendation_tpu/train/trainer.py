"""Generic trainer: one jit'd epoch (on-device sampling + lax.scan over
train steps) + on-device eval + host-side schedule/early-stop logic.

Replaces the reference's per-model copy-pasted `train()` loops
(survey 2.5: every model file re-implements the same epoch loop). The
template-method lifecycle (base/recommender.py:80-114) becomes:
  Trainer.fit() -> per-epoch [train_epoch -> evaluate -> plateau.step ->
  best-model vote -> early_stopping] -> final metrics from best params.

Parity points:
  * best-model vote: at K = max(topN), count metrics that worsened vs
    improved; new best when the majority improved
    (base/main_recommender.py:138-160);
  * early stop on Recall@maxN not improving for `early_stopping_steps`
    epochs (util/evaluation.py:195-202);
  * ReduceLROnPlateau on the epoch mean train loss (KHGRec.py:191).
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..eval.metrics import metrics_to_host, ranking_metrics
from ..models.base import ModelBundle
from ..ops.sampling import epoch_kg_batches, epoch_pairwise_batches
from .optim import PlateauState, make_optimizer, set_lr


# Per-execution pallas DMA budget. Empirical finding (bisected with
# scripts/bisect_pallas.py --scan on the axon remote TPU): a single
# device execution whose pallas kernels move ~2^40 cumulative bytes
# faults the TPU worker, independent of invocation count, grid-step
# count, or wall-clock (a 245 s pure-XLA execution passes). 2^38 keeps
# a 4x margin; epochs whose scan would exceed it run as several chunked
# executions (a few extra dispatches per epoch, ~ms each).
PALLAS_EXEC_BUDGET = int(os.environ.get("HGDR_PALLAS_EXEC_BUDGET", 2**38))
# conservative pallas-kernel calls per train step per blocked layout
# (fwd + custom-VJP bwd; HWNN wavelet chains are the worst case at 16)
_CALLS_PER_STEP_EST = 24

# buffer donation of the threaded train state (params / opt_state /
# extras) at the epoch- and chunk-fn jit sites; HGDR_DONATE=0 disables
_DONATE = os.environ.get("HGDR_DONATE", "1") != "0"
_DONATE2 = (0, 1) if _DONATE else ()
_DONATE3 = (0, 1, 2) if _DONATE else ()


def _device_copy(tree):
    """Fresh device buffers for every leaf (donation-safe snapshot)."""
    return jax.tree.map(jnp.copy, tree)


def _jit_hoisted(fn, donate_args: tuple = ()):
    """jit with closed-over arrays hoisted to runtime arguments.

    Trainer functions close over the bundle's device data (adjacency
    layouts, membership tables — 100s of MB at 10M-edge scale). Plain
    jit embeds closed-over arrays as CONSTANTS in the lowered module,
    which (a) ships them inside every remote-compile request (the axon
    tunnel rejects ~1GB+ bodies with HTTP 413) and (b) lets the
    compiler duplicate them into executable memory. This traces the
    function once, splits out ALL jaxpr consts (jax.closure_convert
    only hoists AD-perturbable ones, which concrete arrays are not),
    and re-binds them as ordinary call-time arguments — device arrays
    pass zero-copy. Conversion happens lazily on the first call (the
    same place jit would trace anyway).

    `donate_args` lists TOP-LEVEL argument positions whose buffers are
    donated to the computation (jit donate_argnums at leaf granularity):
    the train-state trio (params, opt_state, extras) threads in→out with
    identical shapes every epoch/chunk, so XLA aliases the input buffers
    to the outputs instead of double-buffering them — at 1M-node scale
    that is ~1.8 GB of transient (params + Adam m/v) per dispatch.
    Callers must not reuse a donated argument after the call (the
    Trainer snapshots best-model state with an explicit device copy)."""
    state: dict = {}

    def call(*args):
        flat, in_tree = jax.tree.flatten(args)
        if "fn" not in state:
            store: dict = {}

            def flat_fn(*flat_args):
                out = fn(*jax.tree.unflatten(in_tree, flat_args))
                out_flat, out_tree = jax.tree.flatten(out)
                store["out_tree"] = out_tree
                return out_flat

            closed = jax.make_jaxpr(flat_fn)(*flat)
            jaxpr, out_tree = closed.jaxpr, store["out_tree"]
            # device-resident once; numpy consts would re-upload per call
            state["consts"] = [jnp.asarray(c) for c in closed.consts]
            state["in_tree"] = in_tree
            if donate_args:
                # jnp.asarray is a no-op for device arrays: if a bundle
                # ever seeds params/extras with the very array object the
                # loss closes over, donating it would delete the cached
                # const and every later call would hit 'Array has been
                # deleted'. Copy any const aliasing a call argument.
                arg_ids = {id(a) for a in flat}
                state["consts"] = [
                    jnp.copy(c) if id(c) in arg_ids else c
                    for c in state["consts"]
                ]
                state["const_ids"] = {id(c) for c in state["consts"]}
            # top-level donated args -> flat leaf positions
            sizes = [len(jax.tree.leaves(a)) for a in args]
            starts = [0]
            for s in sizes:
                starts.append(starts[-1] + s)
            don = sorted(
                {i for a in donate_args for i in range(starts[a], starts[a + 1])}
            )
            keep = [i for i in range(len(flat)) if i not in set(don)]
            state["don"], state["keep"] = don, keep
            slot = {i: ("d", j) for j, i in enumerate(don)}
            slot.update({i: ("k", j) for j, i in enumerate(keep)})
            order = [slot[i] for i in range(len(flat))]

            def run(consts, don_leaves, keep_leaves):
                picked = [
                    don_leaves[j] if w == "d" else keep_leaves[j] for w, j in order
                ]
                out_flat = jax.core.eval_jaxpr(jaxpr, consts, *picked)
                return jax.tree.unflatten(out_tree, out_flat)

            state["fn"] = jax.jit(run, donate_argnums=(1,) if don else ())
        else:
            assert in_tree == state["in_tree"], (in_tree, state["in_tree"])
        don, keep = state["don"], state["keep"]
        don_leaves = [flat[i] for i in don]
        if don:
            if state.get("const_ids"):
                # Donating a leaf that IS a cached const would delete the
                # const. Copy the leaf instead (loses donation for that
                # one leaf only).
                don_leaves = [
                    jnp.copy(x) if id(x) in state["const_ids"] else x
                    for x in don_leaves
                ]
            # A buffer appearing TWICE among donated leaves (e.g. a model
            # seeding extras with a reference into params) is an XLA
            # double-donation error; copy the repeats.
            seen: set = set()
            for j, x in enumerate(don_leaves):
                if id(x) in seen:
                    don_leaves[j] = jnp.copy(x)
                else:
                    seen.add(id(x))
        return state["fn"](state["consts"], don_leaves, [flat[i] for i in keep])

    return call


_MLIR_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "i64": 8, "ui64": 8, "i32": 4, "ui32": 4,
    "i16": 2, "ui16": 2, "i8": 1, "ui8": 1, "i1": 1,
}


def _lowered_pallas_bytes(lowered_text: str) -> int:
    """Sum operand+result tensor bytes over every pallas custom call in a
    lowered StableHLO module — the EXACT per-execution DMA traffic of the
    pallas kernels in one trace of the function (scan bodies appear once)."""
    import re

    total = 0
    for sig in re.findall(
        r"@tpu_custom_call.*?:\s*\(([^)]*)\)\s*->\s*(.+)", lowered_text
    ):
        for shape, dtype in re.findall(r"tensor<([\dx]*)x?([a-z]+[0-9]*)>", " , ".join(sig)):
            n = 1
            for dim in shape.split("x"):
                if dim:
                    n *= int(dim)
            total += n * _MLIR_DTYPE_BYTES.get(dtype, 4)
    return total


def _pallas_step_bytes(bundle, cfg) -> int:
    """Estimated pallas DMA bytes ONE training step moves, from the
    blocked layouts attached to the bundle's device data. Overestimates
    by design (smaller chunks only cost extra dispatches)."""
    from ..ops.pallas.segment_spmm import BlockedCOO

    blocked = [
        leaf
        for leaf in jax.tree.leaves(
            (bundle.cf, bundle.kg),
            is_leaf=lambda x: isinstance(x, BlockedCOO),
        )
        if isinstance(leaf, BlockedCOO)
    ]
    if not blocked:
        return 0
    d_est = max(cfg.hyper_dim, cfg.embedding_size, cfg.input_dim)
    total = 0
    for b in blocked:
        gsize = 2 if b.bf16 else 4
        per_call = b.n_blocks * (b.eb * (d_est * gsize + 4) + b.rb * d_est * 4)
        total += per_call * _CALLS_PER_STEP_EST
    return total


@dataclass
class EpochRecord:
    epoch: int
    train_time: float
    test_time: float
    losses: dict
    metrics: dict  # {N: {metric: value}}


@dataclass
class FitResult:
    best_epoch: int
    best_metrics: dict
    history: list[EpochRecord] = field(default_factory=list)
    final_metrics: dict | None = None
    examples_per_sec: float = 0.0


class Trainer:
    def __init__(self, bundle: ModelBundle, seed: Optional[int] = None, mesh=None):
        self.bundle = bundle
        self.cfg = bundle.cfg
        cfg = self.cfg
        self.mesh = mesh
        self.opt = make_optimizer(cfg.lrate, cfg.weight_decay)
        self.rng = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        self.rng, init_rng = jax.random.split(self.rng)
        self.params, self.extras = bundle.init(init_rng)
        if mesh is not None:
            # shard embedding tables over the model axis; the optimizer
            # state initialised from sharded params inherits the layout,
            # and jit/GSPMD propagates shardings through the epoch.
            from ..parallel.mesh import param_shardings, replicated

            self.params = jax.device_put(
                self.params, param_shardings(self.params, mesh, cfg.shard_min_rows)
            )
            self.extras = jax.device_put(self.extras, replicated(mesh))
        self.plateau = PlateauState(lr=cfg.lrate, factor=cfg.lr_decay, patience=cfg.lr_patience)
        if bundle.batch_kind == "sequence":
            self.n_batches = -(-bundle.seq.seq.shape[0] // cfg.batch_size)
        else:
            self.n_batches = -(-bundle.cf.n_train // cfg.batch_size)
        exact = cfg.sampler == "exact"
        if exact and bundle.batch_kind == "sequence":
            raise ValueError(
                "--sampler=exact is not supported for sequence models "
                "(their negatives are resampled inside the epoch scan)"
            )
        if bundle.alternating:
            # KGAT: two Adam instances over the same params (KGAT.py:66-67)
            self.kg_opt = make_optimizer(cfg.lrate, cfg.weight_decay)
            self.opt_state = {
                "cf": self.opt.init(self.params),
                "kg": self.kg_opt.init(self.params),
            }
            self.kg_plateau = PlateauState(
                lr=cfg.lrate, factor=cfg.lr_decay, patience=cfg.lr_patience
            )
            self._chunk_steps = self._resolve_chunk_steps_alternating()
            if exact and self._chunk_steps is None:
                self._chunk_steps = (0, 0)  # host batches via the chunked path
            # donate the threaded train state (params / opt_state; extras is
            # REUSED across alternating chunks so it must not be donated
            # there, but the whole-epoch fn threads it)
            if self._chunk_steps:
                self._epoch_fn = None
                self._alt_sample_fn = (
                    self._build_host_alt_sample_fn() if exact
                    else _jit_hoisted(self._build_alt_sample_fn())
                )
                self._cf_chunk_fn = _jit_hoisted(
                    self._build_phase_chunk_fn("cf"), donate_args=_DONATE2
                )
                self._kg_chunk_fn = _jit_hoisted(
                    self._build_phase_chunk_fn("kg"), donate_args=_DONATE2
                )
                self._cf_chunk_fn_full = _jit_hoisted(
                    self._build_phase_chunk_fn("cf", masked=False),
                    donate_args=_DONATE2,
                )
                self._kg_chunk_fn_full = _jit_hoisted(
                    self._build_phase_chunk_fn("kg", masked=False),
                    donate_args=_DONATE2,
                )
            else:
                self._epoch_fn = _jit_hoisted(
                    self._build_alternating_epoch_fn(), donate_args=_DONATE3
                )
        else:
            self.opt_state = self.opt.init(self.params)
            self._chunk_steps = self._resolve_chunk_steps()
            if exact and not self._chunk_steps:
                # whole epoch as ONE full chunk, batches fed from host
                self._chunk_steps = self.n_batches
            if self._chunk_steps:
                self._epoch_fn = None
                self._sample_fn = (
                    self._build_host_sample_fn() if exact
                    else _jit_hoisted(self._build_sample_fn())
                )
                self._chunk_fn = _jit_hoisted(
                    self._build_chunk_fn(), donate_args=_DONATE3
                )
                # unmasked variant for provably-full chunks (lazy: only
                # traced/compiled if a full chunk ever runs)
                self._chunk_fn_full = _jit_hoisted(
                    self._build_chunk_fn(masked=False), donate_args=_DONATE3
                )
                self._setup_fn = (
                    _jit_hoisted(bundle.epoch_setup) if bundle.epoch_setup is not None else None
                )
            else:
                self._epoch_fn = _jit_hoisted(
                    self._build_epoch_fn(), donate_args=_DONATE3
                )
        self._eval_fn = _jit_hoisted(self._build_eval_fn())
        # split encode/score eval with an identity-keyed encode cache
        # (single-device path only; see _eval_dev_metrics)
        self._encode_cache = None
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            self._encode_fn = self._score_fn = None
        else:
            self._encode_fn, self._score_fn = self._build_eval_split_fns()

    def _resolve_chunk_steps(self) -> int:
        """Steps per device execution: 0 = whole epoch in one execution.

        Chunks whenever the estimated cumulative pallas DMA traffic of a
        full-epoch scan would cross PALLAS_EXEC_BUDGET (the ~2^40-byte
        worker-fault threshold, with 4x margin).

        The chunk length is BALANCED across the epoch: a raw budget
        length L would leave a ragged tail chunk that still executes all
        L scan steps with most of them masked out — at ML-1M shape (386
        batches, budget 312) the tail paid 312 steps for 74 real ones,
        1.62x the epoch's necessary compute (round-5 trace finding).
        ceil(n / ceil(n/L)) keeps every chunk under the budget while the
        whole epoch runs ceil(n/L) executions with at most n_chunks-1
        masked steps total."""
        cfg = self.cfg
        if cfg.scan_chunk_steps > 0:
            return cfg.scan_chunk_steps if cfg.scan_chunk_steps < self.n_batches else 0
        # cheap screen first (no lowering when nothing is blocked)
        if _pallas_step_bytes(self.bundle, cfg) == 0:
            return 0
        est = self._measured_step_bytes()
        if est == 0:
            # fallback: the conservative static estimate
            est = _pallas_step_bytes(self.bundle, cfg)
        per_exec = max(int(PALLAS_EXEC_BUDGET // est), 1)
        if per_exec >= self.n_batches:
            return 0
        n_chunks = -(-self.n_batches // per_exec)
        return -(-self.n_batches // n_chunks)

    def _resolve_chunk_steps_alternating(self):
        """Per-phase chunk lengths for the KGAT-style alternating epoch:
        (cf_steps, kg_steps), each 0 = that phase unchunked; returns None
        when neither phase needs chunking."""
        cfg = self.cfg
        n_kg_batches = int(self.bundle.kg.n_kg_train // cfg.batch_size_kg + 1)
        if cfg.scan_chunk_steps > 0:
            cf_l = cfg.scan_chunk_steps if cfg.scan_chunk_steps < self.n_batches else 0
            kg_l = cfg.scan_chunk_steps if cfg.scan_chunk_steps < n_kg_batches else 0
            return (cf_l, kg_l) if (cf_l or kg_l) else None
        if _pallas_step_bytes(self.bundle, cfg) == 0:
            return None

        def phase_len(loss_fn, batch_sds, n_steps):
            est = self._measured_step_bytes(loss_fn, batch_sds)
            if est == 0:
                est = _pallas_step_bytes(self.bundle, cfg)
            per_exec = max(int(PALLAS_EXEC_BUDGET // est), 1)
            if per_exec >= n_steps:
                return 0
            # balanced chunks (see _resolve_chunk_steps): a ragged tail
            # chunk executes its full scan length with masked steps
            n_chunks = -(-n_steps // per_exec)
            return -(-n_steps // n_chunks)

        cf_l = phase_len(self.bundle.batch_loss, self._cf_batch_sds(), self.n_batches)
        kg_l = phase_len(self.bundle.kg_batch_loss, self._kg_batch_sds(), n_kg_batches)
        if cf_l == 0 and kg_l == 0:
            return None
        return (cf_l, kg_l)

    def _cf_batch_sds(self):
        import jax.numpy as _jnp

        cfg = self.cfg
        sds = lambda shape: jax.ShapeDtypeStruct(shape, _jnp.int32)
        if self.bundle.batch_kind == "sequence":
            L = self.bundle.seq.seq.shape[1]
            return (sds((cfg.batch_size, L)),) * 4 + (
                jax.ShapeDtypeStruct((cfg.batch_size,), _jnp.bool_),
            )
        if self.bundle.uses_kg and not self.bundle.alternating:
            return (sds((cfg.batch_size,)),) * 3 + (sds((cfg.batch_size_kg,)),) * 4
        return (sds((cfg.batch_size,)),) * 3

    def _kg_batch_sds(self):
        import jax.numpy as _jnp

        sds = lambda shape: jax.ShapeDtypeStruct(shape, _jnp.int32)
        return (sds((self.cfg.batch_size_kg,)),) * 4

    def _measured_step_bytes(self, loss_fn=None, batch_sds=None) -> int:
        """Lower ONE train step (grad of a batch loss) locally and read the
        exact pallas DMA bytes from its StableHLO — no device compile.

        The loss closes over the bundle's device data (adjacency layouts,
        membership tables — 100s of MB). Lowering that closure directly
        would materialise every closed-over array as an MLIR constant,
        i.e. pull it device→host (minutes over the axon tunnel; observed
        wedging the bench at LastFM scale). So: trace to a jaxpr first
        (abstract — nothing materialises), then lower with the consts
        re-bound as ShapeDtypeStruct ARGUMENTS."""
        loss_fn = self.bundle.batch_loss if loss_fn is None else loss_fn
        b = self._cf_batch_sds() if batch_sds is None else batch_sds

        def g(p, e, batch, k):
            return jax.value_and_grad(loss_fn, has_aux=True)(p, e, batch, k)

        try:
            args = (self.params, self.extras, b, jax.random.PRNGKey(0))
            flat, in_tree = jax.tree.flatten(args)
            closed = jax.make_jaxpr(
                lambda *fa: g(*jax.tree.unflatten(in_tree, fa))
            )(*flat)
            const_sds = [
                jax.ShapeDtypeStruct(jnp.shape(c), jnp.result_type(c))
                for c in closed.consts
            ]
            flat_sds = [
                jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)) for a in flat
            ]
            lowered = jax.jit(
                lambda consts, fa: jax.core.eval_jaxpr(closed.jaxpr, consts, *fa)
            ).lower(const_sds, flat_sds)
            return _lowered_pallas_bytes(lowered.as_text())
        except Exception:
            return 0

    # ------------------------------------------------------------------
    def _dp_constrain(self, batch: tuple):
        """Shard a step's batch arrays over the mesh's data axis.

        GSPMD then splits the batch-dependent work (embedding gathers,
        scores, losses) across devices and inserts the gradient psum.
        The full-graph propagation inside a step is batch-independent
        and stays replicated, so examples/s scales with devices under
        WEAK scaling (global batch_size x n_data) — see
        scripts/scaling_efficiency.py and BENCH_NOTES.md. No-op without
        a mesh or with a size-1 data axis.
        """
        mesh = self.mesh
        from ..parallel.mesh import DATA_AXIS, batch_sharded

        if mesh is None or mesh.shape.get(DATA_AXIS, 1) <= 1:
            return batch
        dp = batch_sharded(mesh)
        return tuple(jax.lax.with_sharding_constraint(b, dp) for b in batch)

    def _build_epoch_fn(self):
        bundle = self.bundle
        cfg = self.cfg
        cf = bundle.cf
        opt = self.opt

        dp_constrain = self._dp_constrain

        def step(carry, xs):
            params, opt_state, extras = carry
            batch, srng = dp_constrain(xs[:-1]), xs[-1]
            k_up, k_loss = jax.random.split(srng)
            if bundle.update_extras is not None:
                extras = bundle.update_extras(params, extras, batch, k_up)
            (loss, aux), grads = jax.value_and_grad(bundle.batch_loss, has_aux=True)(
                params, extras, batch, k_loss
            )
            # a loss may emit refreshed extras for the NEXT step (KHGRec
            # scores next-batch attention from the same kg forward the
            # losses used — exact reference ordering, KHGRec.py:120-126)
            if isinstance(aux, dict) and "_new_extras" in aux:
                extras = aux.pop("_new_extras")
            if bundle.grad_clip_norm is not None:
                gnorm = optax.global_norm(grads)
                scale = jnp.minimum(1.0, bundle.grad_clip_norm / (gnorm + 1e-6))
                grads = jax.tree.map(lambda g: g * scale, grads)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, extras), (loss, aux)

        def scan_steps(params, opt_state, extras, batches, step_rngs):
            (params, opt_state, extras), (losses, auxes) = jax.lax.scan(
                step, (params, opt_state, extras), batches + (step_rngs,)
            )
            mean_aux = jax.tree.map(jnp.mean, auxes)
            return params, opt_state, extras, jnp.mean(losses), mean_aux

        def epoch_fn(params, opt_state, extras, rng):
            k_cf, k_kg, k_steps, k_setup = jax.random.split(rng, 4)
            if bundle.epoch_setup is not None:
                extras = bundle.epoch_setup(params, extras, k_setup)
            if bundle.batch_kind == "sequence":
                batches = _sequence_epoch_batches(
                    k_cf, bundle.seq, cfg.batch_size, cfg.neg_resample_rounds
                )
                step_rngs = jax.random.split(k_steps, batches[0].shape[0])
                return scan_steps(params, opt_state, extras, batches, step_rngs)
            users, pos, neg = epoch_pairwise_batches(
                k_cf, cf.edge_u, cf.edge_i, cf.sample_membership, cf.n_items,
                cfg.batch_size, cfg.neg_resample_rounds,
            )
            n_batches = users.shape[0]
            if bundle.uses_kg:
                kg = bundle.kg
                h, r, pt, nt = epoch_kg_batches(
                    k_kg, kg.att_h[: kg.n_kg_train], kg.att_r[: kg.n_kg_train],
                    kg.att_t[: kg.n_kg_train], kg.head_tails, kg.n_entities,
                    n_batches, cfg.batch_size_kg, cfg.neg_resample_rounds,
                )
                batches = (users, pos, neg, h, r, pt, nt)
            else:
                batches = (users, pos, neg)
            step_rngs = jax.random.split(k_steps, n_batches)
            return scan_steps(params, opt_state, extras, batches, step_rngs)

        return epoch_fn

    def _build_sample_fn(self):
        """Epoch batch construction alone (the sampling half of
        _build_epoch_fn) — used by the chunked-execution path. Splits the
        epoch key exactly like epoch_fn so chunked and single-execution
        training are step-for-step identical."""
        bundle = self.bundle
        cfg = self.cfg
        cf = bundle.cf

        def sample_fn(rng):
            k_cf, k_kg, k_steps, _ = jax.random.split(rng, 4)
            if bundle.batch_kind == "sequence":
                batches = _sequence_epoch_batches(
                    k_cf, bundle.seq, cfg.batch_size, cfg.neg_resample_rounds
                )
            else:
                users, pos, neg = epoch_pairwise_batches(
                    k_cf, cf.edge_u, cf.edge_i, cf.sample_membership, cf.n_items,
                    cfg.batch_size, cfg.neg_resample_rounds,
                )
                if bundle.uses_kg:
                    kg = bundle.kg
                    h, r, pt, nt = epoch_kg_batches(
                        k_kg, kg.att_h[: kg.n_kg_train], kg.att_r[: kg.n_kg_train],
                        kg.att_t[: kg.n_kg_train], kg.head_tails, kg.n_entities,
                        users.shape[0], cfg.batch_size_kg, cfg.neg_resample_rounds,
                    )
                    batches = (users, pos, neg, h, r, pt, nt)
                else:
                    batches = (users, pos, neg)
            step_rngs = jax.random.split(k_steps, batches[0].shape[0])
            return batches, step_rngs

        return sample_fn

    def _build_chunk_fn(self, masked: bool = True):
        """Fixed-length scan over a chunk of train steps — the
        per-execution unit of the chunked path. The masked form takes a
        `valid` vector masking padded tail steps (params/opt/extras keep
        their old values), so a chunked epoch is step-for-step identical
        to the single-execution scan. The unmasked form skips the
        per-step jnp.where over the params/opt/extras trees (~3 extra
        HBM passes over the state per step) and runs every chunk that is
        provably full — only the ragged tail chunk pays the masking."""
        bundle = self.bundle
        opt = self.opt
        dp_constrain = self._dp_constrain

        def step(carry, xs):
            params, opt_state, extras = carry
            if masked:
                batch, srng, valid = dp_constrain(xs[:-2]), xs[-2], xs[-1]
            else:
                batch, srng = dp_constrain(xs[:-1]), xs[-1]
            k_up, k_loss = jax.random.split(srng)
            new_extras = extras
            if bundle.update_extras is not None:
                new_extras = bundle.update_extras(params, extras, batch, k_up)
            (loss, aux), grads = jax.value_and_grad(bundle.batch_loss, has_aux=True)(
                params, new_extras, batch, k_loss
            )
            if isinstance(aux, dict) and "_new_extras" in aux:
                new_extras = aux.pop("_new_extras")
            if bundle.grad_clip_norm is not None:
                gnorm = optax.global_norm(grads)
                scale = jnp.minimum(1.0, bundle.grad_clip_norm / (gnorm + 1e-6))
                grads = jax.tree.map(lambda g: g * scale, grads)
            updates, new_opt = opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)

            if not masked:
                return (new_params, new_opt, new_extras), (loss, aux)

            def sel(new, old):
                return jax.tree.map(lambda a, b: jnp.where(valid, a, b), new, old)

            params = sel(new_params, params)
            opt_state = sel(new_opt, opt_state)
            extras = sel(new_extras, extras)
            vf = valid.astype(jnp.float32)
            aux = {k2: v * vf for k2, v in aux.items()}
            return (params, opt_state, extras), (loss * vf, aux)

        if masked:

            def chunk_fn(params, opt_state, extras, batches, step_rngs, valid):
                (params, opt_state, extras), (losses, auxes) = jax.lax.scan(
                    step, (params, opt_state, extras), batches + (step_rngs, valid)
                )
                return (
                    params, opt_state, extras,
                    jnp.sum(losses), jax.tree.map(jnp.sum, auxes),
                )

        else:

            def chunk_fn(params, opt_state, extras, batches, step_rngs):
                (params, opt_state, extras), (losses, auxes) = jax.lax.scan(
                    step, (params, opt_state, extras), batches + (step_rngs,)
                )
                return (
                    params, opt_state, extras,
                    jnp.sum(losses), jax.tree.map(jnp.sum, auxes),
                )

        return chunk_fn

    def _run_epoch_chunked(self, k: jax.Array) -> tuple[float, dict]:
        if self._setup_fn is not None:
            k_setup = jax.random.split(k, 4)[3]
            self.extras = self._setup_fn(self.params, self.extras, k_setup)
        batches, step_rngs = self._sample_fn(k)
        n = batches[0].shape[0]
        L = self._chunk_steps
        n_chunks = -(-n // L)
        base = jnp.arange(L)
        loss_sum = 0.0
        aux_sum: dict | None = None
        for c in range(n_chunks):
            pos_ids = base + c * L
            idx = pos_ids % n
            cb = tuple(b[idx] for b in batches)
            if (c + 1) * L <= n:  # provably full: no per-step state masking
                self.params, self.opt_state, self.extras, ls, asum = (
                    self._chunk_fn_full(
                        self.params, self.opt_state, self.extras, cb, step_rngs[idx]
                    )
                )
            else:
                valid = pos_ids < n
                self.params, self.opt_state, self.extras, ls, asum = self._chunk_fn(
                    self.params, self.opt_state, self.extras, cb, step_rngs[idx], valid
                )
            ls, asum = jax.device_get((ls, asum))  # one roundtrip per chunk
            loss_sum += float(ls)
            a = {k2: float(v) for k2, v in asum.items()}
            aux_sum = a if aux_sum is None else {k2: aux_sum[k2] + a[k2] for k2 in a}
        loss = loss_sum / n
        aux = {k2: v / n for k2, v in (aux_sum or {}).items()}
        return loss, aux

    def _build_alt_sample_fn(self):
        """Batch construction for the alternating epoch, key-split exactly
        like _build_alternating_epoch_fn so chunked and single-execution
        KGAT training match step-for-step."""
        bundle = self.bundle
        cfg = self.cfg
        cf = bundle.cf
        kg = bundle.kg
        n_kg_batches = int(kg.n_kg_train // cfg.batch_size_kg + 1)

        def sample_fn(rng):
            k_cf, k_kg, k_s1, k_s2 = jax.random.split(rng, 4)
            users, pos, neg = epoch_pairwise_batches(
                k_cf, cf.edge_u, cf.edge_i, cf.sample_membership, cf.n_items,
                cfg.batch_size, cfg.neg_resample_rounds,
            )
            cf_rngs = jax.random.split(k_s1, users.shape[0])
            h, r, pt, nt = epoch_kg_batches(
                k_kg, kg.att_h[: kg.n_kg_train], kg.att_r[: kg.n_kg_train],
                kg.att_t[: kg.n_kg_train], kg.head_tails, kg.n_entities,
                n_kg_batches, cfg.batch_size_kg, cfg.neg_resample_rounds,
            )
            kg_rngs = jax.random.split(k_s2, n_kg_batches)
            return (users, pos, neg), cf_rngs, (h, r, pt, nt), kg_rngs

        return sample_fn

    # -- host-side EXACT rejection sampling (--sampler=exact): the parity
    # A/B control for the on-device redraw (VERDICT r3 #1). Batches are
    # built with numpy on the host (reference util/sampler.py semantics)
    # and fed into the SAME chunked step functions, so the only change
    # vs production is where the negatives come from.
    def _make_exact_sampler(self):
        from ..ops.sampling import HostExactSampler

        bundle = self.bundle
        cf = bundle.cf
        kw = {}
        if bundle.uses_kg or bundle.alternating:
            kg = bundle.kg
            n = kg.n_kg_train
            kw = dict(
                kg_heads=np.asarray(kg.att_h[:n]),
                kg_relations=np.asarray(kg.att_r[:n]),
                kg_tails=np.asarray(kg.att_t[:n]),
                n_entities=kg.n_entities,
            )
        return HostExactSampler(
            np.asarray(cf.edge_u), np.asarray(cf.edge_i), cf.n_items, **kw
        )

    @staticmethod
    def _np_seed(key) -> int:
        # deterministic host seed from the epoch's JAX key
        return int(np.asarray(jax.random.randint(key, (), 0, 2**31 - 1)))

    def _build_host_sample_fn(self):
        bundle, cfg = self.bundle, self.cfg
        sampler = self._make_exact_sampler()

        def sample_fn(rng):
            k_cf, k_kg, k_steps, _ = jax.random.split(rng, 4)
            users, pos, neg = sampler.pairwise(self._np_seed(k_cf), cfg.batch_size)
            batches = tuple(jnp.asarray(x) for x in (users, pos, neg))
            if bundle.uses_kg:
                h, r, pt, nt = sampler.kg_batches(
                    self._np_seed(k_kg), users.shape[0], cfg.batch_size_kg
                )
                batches = batches + tuple(jnp.asarray(x) for x in (h, r, pt, nt))
            step_rngs = jax.random.split(k_steps, users.shape[0])
            return batches, step_rngs

        return sample_fn

    def _build_host_alt_sample_fn(self):
        bundle, cfg = self.bundle, self.cfg
        sampler = self._make_exact_sampler()
        n_kg_batches = int(bundle.kg.n_kg_train // cfg.batch_size_kg + 1)

        def sample_fn(rng):
            k_cf, k_kg, k_s1, k_s2 = jax.random.split(rng, 4)
            users, pos, neg = sampler.pairwise(self._np_seed(k_cf), cfg.batch_size)
            cf_batches = tuple(jnp.asarray(x) for x in (users, pos, neg))
            cf_rngs = jax.random.split(k_s1, users.shape[0])
            h, r, pt, nt = sampler.kg_batches(
                self._np_seed(k_kg), n_kg_batches, cfg.batch_size_kg
            )
            kg_batches = tuple(jnp.asarray(x) for x in (h, r, pt, nt))
            kg_rngs = jax.random.split(k_s2, n_kg_batches)
            return cf_batches, cf_rngs, kg_batches, kg_rngs

        return sample_fn

    def _build_phase_chunk_fn(self, phase: str, masked: bool = True):
        """Fixed-length scan for ONE phase of the alternating epoch
        (cf -> batch_loss + cf Adam; kg -> kg_batch_loss + kg Adam).
        Masked form for the ragged tail chunk; unmasked for full chunks
        (skips the per-step jnp.where over params/opt trees)."""
        bundle = self.bundle
        loss_fn = bundle.batch_loss if phase == "cf" else bundle.kg_batch_loss
        opt = self.opt if phase == "cf" else self.kg_opt
        dp_constrain = self._dp_constrain

        def clip(grads):
            if bundle.grad_clip_norm is None:
                return grads
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, bundle.grad_clip_norm / (gnorm + 1e-6))
            return jax.tree.map(lambda g: g * scale, grads)

        def step(carry, xs):
            params, ostate, extras = carry
            if masked:
                *batch, srng, valid = xs
            else:
                *batch, srng = xs
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, extras, dp_constrain(tuple(batch)), srng
            )
            updates, new_ostate = opt.update(clip(grads), ostate, params)
            new_params = optax.apply_updates(params, updates)
            if not masked:
                return (new_params, new_ostate, extras), loss

            def sel(new, old):
                return jax.tree.map(lambda a, b: jnp.where(valid, a, b), new, old)

            return (
                sel(new_params, params), sel(new_ostate, ostate), extras,
            ), loss * valid.astype(jnp.float32)

        if masked:

            def chunk_fn(params, ostate, extras, batches, step_rngs, valid):
                (params, ostate, _), losses = jax.lax.scan(
                    step, (params, ostate, extras), batches + (step_rngs, valid)
                )
                return params, ostate, jnp.sum(losses)

        else:

            def chunk_fn(params, ostate, extras, batches, step_rngs):
                (params, ostate, _), losses = jax.lax.scan(
                    step, (params, ostate, extras), batches + (step_rngs,)
                )
                return params, ostate, jnp.sum(losses)

        return chunk_fn

    def _run_epoch_alternating_chunked(self, k: jax.Array) -> tuple[float, dict]:
        cf_batches, cf_rngs, kg_batches, kg_rngs = self._alt_sample_fn(k)
        cf_l, kg_l = self._chunk_steps

        def run_phase(chunk_fn, chunk_fn_full, ostate, batches, rngs, L):
            n = batches[0].shape[0]
            L = L or n
            n_chunks = -(-n // L)
            base = jnp.arange(L)
            params = self.params
            total = 0.0
            for c in range(n_chunks):
                pos_ids = base + c * L
                idx = pos_ids % n
                cb = tuple(b[idx] for b in batches)
                if (c + 1) * L <= n:  # provably full chunk
                    params, ostate, ls = chunk_fn_full(
                        params, ostate, self.extras, cb, rngs[idx]
                    )
                else:
                    valid = pos_ids < n
                    params, ostate, ls = chunk_fn(
                        params, ostate, self.extras, cb, rngs[idx], valid
                    )
                total += float(ls)
            self.params = params
            return ostate, total / n

        self.opt_state["cf"], cf_loss = run_phase(
            self._cf_chunk_fn, self._cf_chunk_fn_full,
            self.opt_state["cf"], cf_batches, cf_rngs, cf_l,
        )
        self.opt_state["kg"], kg_loss = run_phase(
            self._kg_chunk_fn, self._kg_chunk_fn_full,
            self.opt_state["kg"], kg_batches, kg_rngs, kg_l,
        )
        return cf_loss + kg_loss, {"cf_loss": cf_loss, "kg_loss": kg_loss}

    def _build_alternating_epoch_fn(self):
        """KGAT flavour: CF scan (CF Adam) then KG scan (KG Adam)."""
        bundle = self.bundle
        cfg = self.cfg
        cf = bundle.cf
        kg = bundle.kg
        cf_opt, kg_opt = self.opt, self.kg_opt
        dp_constrain = self._dp_constrain
        n_kg_batches = int(kg.n_kg_train // cfg.batch_size_kg + 1)

        def clip(grads):
            if bundle.grad_clip_norm is None:
                return grads
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, bundle.grad_clip_norm / (gnorm + 1e-6))
            return jax.tree.map(lambda g: g * scale, grads)

        def epoch_fn(params, opt_state, extras, rng):
            k_cf, k_kg, k_s1, k_s2 = jax.random.split(rng, 4)
            users, pos, neg = epoch_pairwise_batches(
                k_cf, cf.edge_u, cf.edge_i, cf.sample_membership, cf.n_items,
                cfg.batch_size, cfg.neg_resample_rounds,
            )
            cf_rngs = jax.random.split(k_s1, users.shape[0])

            def cf_step(carry, xs):
                params, ostate = carry
                *batch, srng = xs
                (loss, aux), grads = jax.value_and_grad(bundle.batch_loss, has_aux=True)(
                    params, extras, dp_constrain(tuple(batch)), srng
                )
                updates, ostate = cf_opt.update(clip(grads), ostate, params)
                params = optax.apply_updates(params, updates)
                return (params, ostate), loss

            (params, cf_state), cf_losses = jax.lax.scan(
                cf_step, (params, opt_state["cf"]), (users, pos, neg, cf_rngs)
            )

            h, r, pt, nt = epoch_kg_batches(
                k_kg, kg.att_h[: kg.n_kg_train], kg.att_r[: kg.n_kg_train],
                kg.att_t[: kg.n_kg_train], kg.head_tails, kg.n_entities,
                n_kg_batches, cfg.batch_size_kg, cfg.neg_resample_rounds,
            )
            kg_rngs = jax.random.split(k_s2, n_kg_batches)

            def kg_step(carry, xs):
                params, ostate = carry
                *batch, srng = xs
                (loss, aux), grads = jax.value_and_grad(bundle.kg_batch_loss, has_aux=True)(
                    params, extras, dp_constrain(tuple(batch)), srng
                )
                updates, ostate = kg_opt.update(clip(grads), ostate, params)
                params = optax.apply_updates(params, updates)
                return (params, ostate), loss

            (params, kg_state), kg_losses = jax.lax.scan(
                kg_step, (params, opt_state["kg"]), (h, r, pt, nt, kg_rngs)
            )

            cf_loss = jnp.mean(cf_losses)
            kg_loss = jnp.mean(kg_losses)
            aux = {"cf_loss": cf_loss, "kg_loss": kg_loss}
            return params, {"cf": cf_state, "kg": kg_state}, extras, cf_loss + kg_loss, aux

        return epoch_fn

    def _build_eval_fn(self):
        bundle = self.bundle
        cfg = self.cfg
        cf = bundle.cf
        top_ns = tuple(cfg.top_ns)
        mesh = self.mesh

        if mesh is not None and mesh.shape.get("model", 1) > 1:
            # multi-chip path: item table row-sharded, local top-k per
            # shard + all_gather merge, then metrics on the merged ids
            from ..eval.metrics import metrics_from_topk
            from ..parallel.topk import sharded_user_topk

            max_n = max(top_ns)
            block = cfg.eval_user_batch

            def eval_fn(params, extras):
                u_emb, i_emb = bundle.encode_eval(params, extras)
                ed = cf.eval_data
                n_pad = ed.test_users.shape[0]
                ids = []
                for s in range(0, n_pad, block):
                    users = ed.test_users[s : s + block]
                    _, blk = sharded_user_topk(
                        mesh, u_emb[users], i_emb, cf.rated_pad[users], max_n
                    )
                    ids.append(blk)
                return metrics_from_topk(
                    jnp.concatenate(ids), ed, top_ns, block=block
                )

            return eval_fn

        def eval_fn(params, extras):
            u_emb, i_emb = bundle.encode_eval(params, extras)
            return ranking_metrics(
                u_emb, i_emb, cf.rated_pad, cf.eval_data, top_ns, block=cfg.eval_user_batch
            )

        return eval_fn

    def _build_eval_split_fns(self):
        """Encode / score halves of the single-device eval, so repeated
        evals under UNCHANGED (params, extras) skip the full-graph encode
        — at bench scale the encode is ~2/3 of eval device time and
        scales with nnz (VERDICT r4 weak #6). The mesh path keeps the
        fused fn (its encode output is sharded; splitting would
        materialise the gathered tables)."""
        bundle = self.bundle
        cfg = self.cfg
        cf = bundle.cf
        top_ns = tuple(cfg.top_ns)

        def encode_fn(params, extras):
            return bundle.encode_eval(params, extras)

        def score_fn(u_emb, i_emb):
            return ranking_metrics(
                u_emb, i_emb, cf.rated_pad, cf.eval_data, top_ns,
                block=cfg.eval_user_batch,
            )

        return _jit_hoisted(encode_fn), _jit_hoisted(score_fn)

    def _eval_dev_metrics(self):
        """Device metric pytree for the CURRENT (params, extras), reusing
        the cached encode when both are the same objects as last time.

        The cache key holds the actual first leaves of params/extras and
        compares by `is` — identity can't false-positive (we keep the
        leaf alive, so its id can't be recycled), and any epoch/restore/
        assignment produces new leaf objects, so staleness is impossible.
        Disable with HGDR_EVAL_CACHE=0 (the equivalence control)."""
        if (
            self._encode_fn is None
            or os.environ.get("HGDR_EVAL_CACHE", "1") == "0"
        ):
            return self._eval_fn(self.params, self.extras)
        pk = jax.tree.leaves(self.params)[0]
        ek_leaves = jax.tree.leaves(self.extras)
        ek = ek_leaves[0] if ek_leaves else None
        cached = self._encode_cache
        if cached is not None and cached[0] is pk and cached[1] is ek:
            encoded = cached[2]
        else:
            encoded = self._encode_fn(self.params, self.extras)
            self._encode_cache = (pk, ek, encoded)
        return self._score_fn(*encoded)

    # ------------------------------------------------------------------
    def run_epoch(self, epoch: int) -> tuple[float, dict]:
        self.rng, k = jax.random.split(self.rng)
        if self._epoch_fn is None:
            if self.bundle.alternating:
                loss, aux = self._run_epoch_alternating_chunked(k)
            else:
                loss, aux = self._run_epoch_chunked(k)
        else:
            self.params, self.opt_state, self.extras, loss, aux = self._epoch_fn(
                self.params, self.opt_state, self.extras, k
            )
        # attention refresh AFTER the phases (KGAT.py:128-133: epoch 1 runs
        # with the zero-initialised A_in, attention learned afterwards)
        if self.bundle.epoch_update_extras is not None:
            self.rng, ke = jax.random.split(self.rng)
            self.extras = self.bundle.epoch_update_extras(self.params, self.extras, ke)
        # ONE device_get for loss+aux: per-scalar float() fetches are a
        # blocking device->host roundtrip each over the remote tunnel
        # (~25 ms apiece; see metrics_to_host)
        loss, aux = jax.device_get((loss, aux))
        loss = float(loss)
        # NaN guard — the TPU-native stand-in for the reference's
        # per-batch checks (KGAT.py:96-97,115-116) and
        # set_detect_anomaly (HGNN_HD3.py:356): the epoch scan cannot
        # skip a bad batch retroactively, so a non-finite epoch loss
        # fails fast with a pointer at the per-op localiser.
        if not np.isfinite(loss):
            raise FloatingPointError(
                f"non-finite train loss ({loss}) at epoch {epoch + 1} for "
                f"{self.cfg.model}; rerun with --debug_nans (sets "
                "jax_debug_nans) to localise the producing op"
            )
        aux = {k2: float(v) for k2, v in aux.items()}
        aux["train_loss"] = loss
        return loss, aux

    def profile_epoch(self, trace_dir: str, epoch: int = 0) -> tuple[float, dict]:
        """Run one epoch under jax.profiler tracing (the reference's only
        profiling is a commented-out torch.profiler block, survey 5).
        View with tensorboard/xprof on `trace_dir`."""
        with jax.profiler.trace(trace_dir):
            out = self.run_epoch(epoch)
            jax.block_until_ready(jax.tree.leaves(self.params)[0])
        return out

    def evaluate(self) -> dict:
        m = self._eval_dev_metrics()
        return metrics_to_host(m, tuple(self.cfg.top_ns))

    def restore(self, ckpt) -> int:
        """Resume from the latest checkpoint; returns the start epoch."""
        template = {
            "params": self.params,
            "opt_state": self.opt_state,
            "extras": self.extras,
            "rng": self.rng,
        }
        step = ckpt.latest_step()
        if step is None:
            return 0
        state = ckpt.restore(step, template)

        from jax.sharding import NamedSharding

        def replace_like(live, restored):
            # orbax round-trips through host numpy; re-place mesh-sharded
            # leaves with the LIVE state's sharding so row-sharded tables
            # (and the optimizer state initialised from them) come back
            # onto the mesh with their layouts intact. Single-device
            # leaves stay UNCOMMITTED (device_put would pin them to
            # device 0 and conflict with the mesh-committed params in
            # the next jit call).
            def one(t, r):
                s = getattr(t, "sharding", None)
                if isinstance(s, NamedSharding):
                    return jax.device_put(jnp.asarray(r), s)
                return jnp.asarray(r)

            return jax.tree.map(one, live, restored)

        self.params = replace_like(self.params, state["params"])
        self.opt_state = replace_like(self.opt_state, state["opt_state"])
        self.extras = replace_like(self.extras, state["extras"])
        self.rng = jnp.asarray(state["rng"])
        return step + 1

    def fit(
        self,
        max_epoch: Optional[int] = None,
        log_fn=print,
        quiet: bool = False,
        artifacts=None,
        ckpt=None,
        ckpt_every: int = 10,
        start_epoch: int = 0,
    ) -> FitResult:
        cfg = self.cfg
        max_epoch = cfg.max_epoch if max_epoch is None else max_epoch
        max_n = cfg.max_n
        result = FitResult(best_epoch=-1, best_metrics={})
        best_perf: dict | None = None
        best_params = self.params
        best_extras = self.extras
        recall_list: list[float] = []
        loss_list: list[float] = []
        frozen_warned = False
        examples = 0
        train_time_total = 0.0

        last_metrics: dict | None = None

        def finalize(ep, loss, aux, dev_metrics, snap, train_t, eval_t) -> bool:
            """Vote / record / log / early-stop for one trained epoch.
            `dev_metrics` is the (possibly still in-flight) device metric
            pytree or None to reuse the previous epoch's metrics
            (evaluate_every cadence, reference main.py:92-93); `snap` is
            the (params, extras) the eval was computed from."""
            nonlocal best_perf, best_params, best_extras, last_metrics, frozen_warned
            if dev_metrics is not None:
                metrics = metrics_to_host(dev_metrics, tuple(cfg.top_ns))
                last_metrics = metrics
            else:
                metrics = last_metrics
            perf = metrics[max_n]
            # best-model vote (base/main_recommender.py:138-160)
            if best_perf is None:
                best_perf, result.best_epoch = dict(perf), ep + 1
                best_params, best_extras = snap
            else:
                count = sum(1 if best_perf[k] > perf[k] else -1 for k in best_perf)
                if count < 0:
                    best_perf, result.best_epoch = dict(perf), ep + 1
                    best_params, best_extras = snap

            record = EpochRecord(ep, train_t, eval_t, aux, metrics)
            result.history.append(record)
            if artifacts is not None:
                artifacts.on_epoch(record)
            if not quiet:
                log_fn(
                    f"epoch {ep+1:3d} loss {loss:.4f} "
                    + " ".join(f"{k}@{max_n}:{v:.5f}" for k, v in perf.items())
                    + f" (train {train_t:.2f}s eval {eval_t:.2f}s)"
                )
            recall_list.append(perf["recall"])
            # frozen-training detection: with fresh random negatives every
            # epoch, a BIT-IDENTICAL total loss over many epochs means the
            # parameters have stopped moving — observed when embedding
            # norms decay to zero under strong (unsquared-L2) reg and the
            # loss pins at the zero-score value (SHT under the pinned
            # parity config: loss frozen at ln4, recall frozen mid-run —
            # results/stopping_rule_ab/RESULTS.md finding 3). Warn once so
            # the run log explains itself instead of silently flatlining.
            loss_list.append(float(loss))
            if not frozen_warned and _loss_frozen(loss_list):
                frozen_warned = True
                log_fn(
                    f"WARNING: training appears FROZEN — identical epoch "
                    f"loss {loss:.6f} for {_FROZEN_EPOCHS} consecutive "
                    f"epochs despite fresh negative samples. Embedding "
                    f"norms have likely collapsed to zero (strong reg?); "
                    f"metrics will not improve past this point."
                )
            scale = (
                cfg.early_stop_patience_scale
                if cfg.early_stop_patience_scale > 0
                else self.bundle.early_stop_patience_scale
            )
            patience = cfg.early_stopping_steps * scale
            _, should_stop = _early_stopping(
                recall_list, patience, cfg.early_stop_smooth
            )
            if should_stop and not quiet:
                log_fn(f"early stop at epoch {ep+1}")
            return should_stop

        # NOTE: a one-epoch-lagged "async eval" mode used to live here
        # (dispatch eval, materialise its metrics one epoch later). It was
        # removed after measurement (VERDICT r2 #5): a TPU chip has one
        # serial compute stream, so train+eval device work serialises and
        # the lag hid 0% on the real chip (BENCH_r02; reproduce with
        # scripts/eval_overlap_mesh.py --real_chip) while complicating
        # early stopping and best-model tracking. (The CPU backend shows
        # apparent overlap because it runs dispatched programs
        # concurrently on the host thread pool — not TPU behaviour.)
        for ep in range(start_epoch, max_epoch):
            t0 = time.time()
            loss, aux = self.run_epoch(ep)
            jax.block_until_ready(jax.tree.leaves(self.params)[0])
            t1 = time.time()
            examples += self.n_batches * cfg.batch_size
            train_time_total += t1 - t0

            do_eval = ep % max(cfg.evaluate_every, 1) == 0 or last_metrics is None
            dev_metrics = self._eval_dev_metrics() if do_eval else None
            # device copy: the live (params, extras) buffers are DONATED
            # to the next epoch's dispatch, so the best-model snapshot
            # needs its own
            snap = (
                _device_copy((self.params, self.extras))
                if _DONATE
                else (self.params, self.extras)
            )

            if not self.bundle.lr_plateau:
                pass  # reference trains this model at fixed lr (no scheduler)
            elif self.bundle.alternating:
                # per-phase schedulers on per-phase losses (KGAT.py:68-69,140-141)
                self.plateau = self.plateau.step(aux.get("cf_loss", loss))
                self.kg_plateau = self.kg_plateau.step(aux.get("kg_loss", loss))
                self.opt_state["cf"] = set_lr(self.opt_state["cf"], self.plateau.lr)
                self.opt_state["kg"] = set_lr(self.opt_state["kg"], self.kg_plateau.lr)
            else:
                self.plateau = self.plateau.step(loss)
                self.opt_state = set_lr(self.opt_state, self.plateau.lr)
            if ckpt is not None and (ep + 1) % ckpt_every == 0:
                # background save: hand the thread its own device copies —
                # the live buffers are donated to the next epoch's dispatch
                st = (self.params, self.opt_state, self.extras)
                st = _device_copy(st) if (_DONATE and ckpt.background) else st
                ckpt.save(ep, *st, self.rng)

            if dev_metrics is not None:
                jax.block_until_ready(dev_metrics)
            if finalize(ep, loss, aux, dev_metrics, snap, t1 - t0, time.time() - t1):
                break

        # final test with best params (reference: user_emb <- best_user_emb
        # then test(), base/main_recommender.py:179-181)
        self.params, self.extras = best_params, best_extras
        result.best_metrics = best_perf or {}
        result.final_metrics = self.evaluate()
        result.examples_per_sec = examples / max(train_time_total, 1e-9)
        if artifacts is not None:
            artifacts.finish(result)
        return result


def _sequence_epoch_batches(rng, seq_data, batch_size, rounds):
    """Shuffled sequence-window batches + per-position negatives
    (next_batch_sequence, util/sampler.py:292-320; negatives redrawn
    rejection-free against the user's 1-based history)."""
    from ..ops.sampling import sample_negatives

    n = seq_data.seq.shape[0]
    n_batches = -(-n // batch_size)
    total = n_batches * batch_size
    k_perm, k_neg = jax.random.split(rng)
    perm = jax.random.permutation(k_perm, n)
    idx = jnp.concatenate([perm, perm[: total - n]])
    seq = seq_data.seq[idx].reshape(n_batches, batch_size, -1)
    pos = seq_data.pos[idx].reshape(n_batches, batch_size, -1)
    y = seq_data.y[idx].reshape(n_batches, batch_size, -1)
    valid = seq_data.seq_valid[idx].reshape(n_batches, batch_size)
    users = seq_data.seq_user[idx]
    L = seq.shape[-1]
    flat_users = jnp.repeat(users, L)
    # negatives are 1-based: draw 0-based then shift
    negs0 = sample_negatives(
        k_neg, flat_users,
        seq_data.rated_pad_1b - 1,  # membership table back to 0-based
        seq_data.n_items, rounds,
    )
    neg = (negs0 + 1).reshape(n_batches, batch_size, L)
    # zero out padded positions so they never contribute
    neg = jnp.where(y > 0, neg, 0)
    return seq, pos, y, neg, valid


_FROZEN_EPOCHS = 10


def _loss_frozen(loss_list: list[float], n: int = _FROZEN_EPOCHS) -> bool:
    """True when the last n epoch losses are bit-identical, or all NaN.
    Each epoch draws fresh random negatives, so an identical float total
    loss n epochs running implies the parameters (and the sampler's view
    of them) have stopped changing — the norm-collapse freeze signature.
    A NaN flatline (NaN != NaN, so bit-equality alone would miss it) is
    the other common training-dead signature and is treated as frozen."""
    if len(loss_list) < n:
        return False
    tail = loss_list[-n:]
    if math.isnan(tail[0]):
        return all(math.isnan(x) for x in tail)
    return all(x == tail[0] for x in tail)


def _early_stopping(recall_list, stopping_steps, smooth: int = 1):
    """Patience stopping on the per-epoch recall series; smooth>1 runs
    the patience rule on a trailing moving average (the full rationale
    and the reference citation live on eval.early_stopping)."""
    from ..eval import early_stopping

    return early_stopping(recall_list, stopping_steps, smooth)
