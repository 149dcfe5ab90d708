"""Benchmark: flagship KHGRec training throughput on one TPU chip.

Runs the full joint CF+KG+SSL training pipeline (on-device sampling,
per-batch attention refresh, two encoders, fused losses, Adam) on a
LastFM-scale synthetic dataset (~1.9k users, ~18k items, ~93k
interactions, ~250k KG triples) and reports steady-state training
examples/sec, steady-state full-catalog eval latency, epochs/hour, and
the train step's roofline position. Secondary phases: ML-1M-DENSITY
(the dedup-gather auto-selection regime), ML-1M-SHAPE (the full
~1.6M-nnz graph — the real-scale tracked metric, plus the opt-in
cached-propagation K=8 lever), and a profiler-traced epoch that yields
the MEASURED roofline (per-op device durations + optimized-module
bytes; utils/trace_analysis.py) beside the analytic one.

The reference publishes no throughput numbers (BASELINE.md: "measure &
report"). `vs_baseline` is anchored to a MEASUREMENT when
parity/baseline_throughput.json exists: the reference's own KHGRec
epoch loop on the byte-identical bench dataset via the parity sandbox
(CPU — the only hardware it runs on here; the JSON also carries the
10k ex/s single-GPU ESTIMATE as `vs_gpu_estimate` for context).
Without the file it falls back to the estimate with
`baseline_estimated: true`.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Extra diagnostics go to stderr. Phases after the JSON line are
non-fatal diagnostics.

Flags:
  --epochs N      train N extra epochs and report the converged
                  synthetic recall@20 (healthy-model check; ~0.12+ is
                  reachable, chance is ~0.0017)
  --no_async_demo skip the sync-vs-async eval overlap measurement
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def supervise(argv: list[str], deadlines: tuple[float, ...]) -> int:
    """Run the measurement in a child with a wall-clock deadline per
    attempt, killing the exact process group and retrying on expiry.

    The axon remote-compile service has heavy tail latency: the SAME
    epoch module compiled in 24 s and 250-320 s across runs, and
    occasionally wedges outright (>20 min). A wedged XLA call cannot be
    interrupted from inside the process, so the retry has to live a
    process above. Child stdout/stderr are inherited — the JSON line
    flows through untouched."""
    import os
    import signal
    import subprocess

    child_cmd = [sys.executable, "-u", __file__, "--child", *argv]
    rc = 124
    for i, deadline in enumerate(deadlines):
        log(f"[bench-supervisor] attempt {i + 1}/{len(deadlines)} "
            f"(deadline {deadline:.0f}s)")
        proc = subprocess.Popen(child_cmd, start_new_session=True)
        try:
            rc = proc.wait(timeout=deadline)
        except subprocess.TimeoutExpired:
            log(f"[bench-supervisor] attempt {i + 1} exceeded {deadline:.0f}s "
                f"— killing pgid {proc.pid}")
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            rc = 124
            continue
        if rc == 0:
            return 0
        # Abnormal child death (signal exit, e.g. OOM-killed, shows as
        # rc < 0; any nonzero rc) gets a fresh attempt like a timeout.
        log(f"[bench-supervisor] attempt {i + 1} exited rc={rc} — retrying")
    log(f"[bench-supervisor] all attempts failed (last rc={rc})")
    # Signal deaths surface as negative rc from Popen.wait; sys.exit(neg)
    # would wrap mod 256 (SIGKILL -> 247) and collide with real rcs,
    # losing the timeout(124)-vs-crash distinction. Map to the shell
    # convention 128 + signal instead.
    if rc < 0:
        rc = 128 - rc
    return rc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120,
                    help="extra epochs to convergence-check the model "
                         "(healthy-model evidence in the driver artifact; "
                         "~0.6s/epoch steady-state — 0 to skip)")
    ap.add_argument("--no_async_demo", action="store_true")
    ap.add_argument("--no_roofline", action="store_true")
    ap.add_argument("--child", action="store_true",
                    help="run the measurement directly (no supervisor)")
    ap.add_argument("--attempt_deadline", type=float, default=1500.0,
                    help="per-attempt wall-clock budget in supervised mode "
                         "(the ML-1M-shape phase adds a data build, a "
                         "compile draw from the remote-compile lottery, "
                         "and ~3 x 45s epochs to the round-4 budget)")
    args = ap.parse_args()

    if not args.child:
        passthrough = ["--epochs", str(args.epochs)]
        if args.no_async_demo:
            passthrough.append("--no_async_demo")
        if args.no_roofline:
            passthrough.append("--no_roofline")
        d = args.attempt_deadline
        sys.exit(supervise(passthrough, (d, d)))

    import jax

    # NOTE: the persistent XLA compilation cache is intentionally NOT
    # enabled here — with the axon remote-compile TPU backend a cache
    # round-trip was observed to wedge the process.

    # production TPU compute mode: bf16 gathered operands in the pallas
    # segment-SpMM (f32 MXU accumulation, ~0.2% relative error on the
    # propagation — the idiomatic TPU training configuration). The f32
    # path measures 49.7k examples/sec on the same workload.
    from hypergraph_diffusion_for_recommendation_tpu.data import device as _dev

    _dev.PALLAS_BF16 = True

    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
        build_kg_device_data,
        build_knowledge,
        synthetic_dataset,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import (
        build_model,
        model_data_needs,
    )
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    log(f"devices: {jax.devices()}")

    # ---- compile-lottery control (VERDICT r3 #6): compile a PINNED
    # trivial module and time it. The axon remote-compile service has
    # documented 24-634 s latency variance for byte-identical modules;
    # the control's time scales with the service's mood, separating
    # "lottery-slow" from "module-regressed" warmups below.
    import jax.numpy as jnp

    t0 = time.time()
    _ctl = jax.jit(lambda a, b: (a @ b).sum())
    _ctl(jnp.ones((512, 512), jnp.float32), jnp.ones((512, 512), jnp.float32)).block_until_ready()
    control_compile_s = time.time() - t0
    EXPECTED_CONTROL_S = 2.0  # local-service baseline for this module
    lottery_scale = max(control_compile_s / EXPECTED_CONTROL_S, 1.0)
    log(f"compile control: {control_compile_s:.1f}s (lottery scale {lottery_scale:.1f}x)")

    t0 = time.time()
    train, test, kg_df = synthetic_dataset(
        n_users=1890, n_items=17632, mean_degree=49.0, seed=7, with_kg=True
    )
    inter = build_interaction(train, test)
    kg = build_knowledge(kg_df, inter)
    cf_dev = build_cf_device_data(
        inter, eval_user_multiple=512, needs=model_data_needs("KHGRec")
    )
    kg_dev = build_kg_device_data(kg)
    log(
        f"data built in {time.time()-t0:.1f}s: {inter.n_users} users, "
        f"{inter.n_items} items, {inter.n_cf_train} interactions, "
        f"{kg.n_kg_train} kg triples, {kg.n_entities} entities"
    )

    cfg = make_config(
        "KHGRec",
        batch_size=2048,
        batch_size_kg=8192,
        hyper_dim=128,
        relation_dim=32,
        item_ranking=(10, 20, 40),
        eval_user_batch=512,
        max_epoch=4,
        early_stopping_steps=100,
        lrate=0.001,
        temp=1.0,
        cl_rate=0.01,
        drop_rate=0.2,
        mode="full",
    )
    trainer = Trainer(bundle := build_model(cfg, cf_dev, kg_dev))

    # warmup (compile) epoch
    t0 = time.time()
    loss, _ = trainer.run_epoch(0)
    jax.block_until_ready(jax.tree.leaves(trainer.params)[0])
    warmup_s = time.time() - t0
    log(f"warmup epoch (incl. compile): {warmup_s:.1f}s loss={loss:.4f}")

    # timed epochs
    n_timed = 3
    examples = trainer.n_batches * cfg.batch_size * n_timed
    t0 = time.time()
    for ep in range(n_timed):
        loss, _ = trainer.run_epoch(ep + 1)
    jax.block_until_ready(jax.tree.leaves(trainer.params)[0])
    dt = time.time() - t0
    epoch_s = dt / n_timed
    eps = examples / dt
    log(f"{n_timed} epochs in {dt:.2f}s -> {eps:,.0f} examples/sec  (loss {loss:.4f})")

    # ---- ML-1M-density phase (VERDICT r3 #7): a second KHGRec graph at
    # ML-1M column multiplicity (~180 edges/item vs LastFM-bench ~2.5),
    # the regime where the packer's multiplicity auto-selector must pick
    # the dedup gather layout (1.89-1.92x measured, parity/probe_layouts
    # .out). Driver-visible so a regression in the dedup/auto-select
    # path shows in the JSON, not just in a committed probe artifact.
    from hypergraph_diffusion_for_recommendation_tpu.ops.pallas import BlockedCOO

    dedup_auto = None
    ml1m_epoch_s = None
    ml1m_eps = None
    try:
        t0 = time.time()
        m_train, m_test, m_kg_df = synthetic_dataset(
            n_users=1500, n_items=1000, mean_degree=120.0, seed=9, with_kg=True
        )
        m_inter = build_interaction(m_train, m_test)
        m_kg = build_knowledge(m_kg_df, m_inter)
        m_cf = build_cf_device_data(
            m_inter, eval_user_multiple=512, needs=model_data_needs("KHGRec")
        )
        m_kgd = build_kg_device_data(m_kg)
        # the pallas layout hangs off the SparseCOO as .blocked
        _blk = getattr(m_cf.adj.fwd, "blocked", None)
        dedup_auto = bool(
            isinstance(_blk, BlockedCOO) and getattr(_blk, "ucols", None) is not None
        )
        m_cfg = make_config(
            "KHGRec", batch_size=2048, batch_size_kg=8192, hyper_dim=128,
            relation_dim=32, item_ranking=(10, 20), eval_user_batch=512,
            max_epoch=3, early_stopping_steps=100, lrate=0.001, temp=1.0,
            cl_rate=0.01, drop_rate=0.2, mode="full",
        )
        m_trainer = Trainer(build_model(m_cfg, m_cf, m_kgd))
        m_loss, _ = m_trainer.run_epoch(0)  # compile
        jax.block_until_ready(jax.tree.leaves(m_trainer.params)[0])
        ml1m_warm_s = time.time() - t0
        t0 = time.time()
        for ep in range(2):
            m_loss, _ = m_trainer.run_epoch(ep + 1)
        jax.block_until_ready(jax.tree.leaves(m_trainer.params)[0])
        ml1m_epoch_s = (time.time() - t0) / 2
        ml1m_eps = m_trainer.n_batches * m_cfg.batch_size / ml1m_epoch_s
        log(
            f"ML-1M-density phase: {m_inter.n_cf_train} edges over "
            f"{m_inter.n_items} items (multiplicity ~{m_inter.n_cf_train / m_inter.n_items:.0f}), "
            f"dedup auto-selected={dedup_auto}, warmup {ml1m_warm_s:.1f}s, "
            f"steady epoch {ml1m_epoch_s:.3f}s = {ml1m_eps:,.0f} examples/sec "
            f"(loss {float(m_loss):.4f})"
        )
        del m_trainer, m_cf, m_kgd  # free HBM before the eval phase
    except Exception as exc:  # secondary metric must never kill the JSON line
        log(f"ML-1M-density phase FAILED: {type(exc).__name__}: {exc}")

    # ---- ML-1M-SHAPE phase (VERDICT r4 weak #1): the FULL ~1.6M-nnz
    # graph (6040 users x 3706 items, mean degree 147 — the
    # scripts/scale_check.py ML-1M recipe), not the 1000-item density
    # proxy above. This is the framework's weakest perf axis (per-example
    # cost scales with total nnz: the joint model propagates BOTH full
    # graphs every step), so it is now a first-class, driver-tracked
    # number. One traced epoch also yields the MEASURED roofline
    # (VERDICT r4 weak #2): per-op device durations + the optimized
    # module's post-fusion bytes, replacing the analytic >100% figure.
    ml1m_shape: dict = {}
    measured: dict | None = None
    try:
        t0 = time.time()
        s_train, s_test, s_kg_df = synthetic_dataset(
            n_users=6040, n_items=3706, n_clusters=64, mean_degree=147.0,
            seed=7, with_kg=True,
        )
        s_inter = build_interaction(s_train, s_test)
        s_kg = build_knowledge(s_kg_df, s_inter)
        s_cf = build_cf_device_data(
            s_inter, eval_user_multiple=512, needs=model_data_needs("KHGRec")
        )
        s_kgd = build_kg_device_data(s_kg)
        build_shape_s = time.time() - t0
        s_cfg = make_config(
            "KHGRec", batch_size=2048, batch_size_kg=8192, hyper_dim=128,
            relation_dim=32, item_ranking=(10, 20), eval_user_batch=512,
            max_epoch=4, early_stopping_steps=100, lrate=0.001, temp=1.0,
            cl_rate=0.01, drop_rate=0.2, mode="full",
        )
        s_trainer = Trainer(build_model(s_cfg, s_cf, s_kgd))
        t0 = time.time()
        s_loss, _ = s_trainer.run_epoch(0)  # compile
        jax.block_until_ready(jax.tree.leaves(s_trainer.params)[0])
        shape_warm_s = time.time() - t0
        t0 = time.time()
        s_loss, _ = s_trainer.run_epoch(1)
        jax.block_until_ready(jax.tree.leaves(s_trainer.params)[0])
        shape_epoch_s = time.time() - t0
        shape_eps = s_trainer.n_batches * s_cfg.batch_size / shape_epoch_s
        nnz = 2 * s_inter.n_cf_train
        ml1m_shape = {
            "ml1m_shape_nnz": nnz,
            "ml1m_shape_epoch_s": round(shape_epoch_s, 2),
            "ml1m_shape_examples_per_sec": round(shape_eps, 1),
        }
        log(
            f"ML-1M-SHAPE phase: {s_inter.n_cf_train} train edges "
            f"({nnz} nnz bipartite) + {s_kg.n_kg_train} kg triples, build "
            f"{build_shape_s:.1f}s, warmup {shape_warm_s:.1f}s, steady epoch "
            f"{shape_epoch_s:.2f}s = {shape_eps:,.0f} examples/sec "
            f"(loss {float(s_loss):.4f})"
        )
        # traced epoch -> measured roofline at real scale
        try:
            import tempfile

            from hypergraph_diffusion_for_recommendation_tpu.utils.trace_analysis import (
                trace_roofline,
            )

            td = tempfile.mkdtemp(prefix="bench_trace_")
            with jax.profiler.trace(td):
                s_trainer.run_epoch(2)
                jax.block_until_ready(jax.tree.leaves(s_trainer.params)[0])
            # pallas custom-calls report bytes_accessed=0 in the trace;
            # their DMA bytes are exact from the lowered kernel — add
            # them per execution of the dominant (full-chunk) module
            pallas_step_bytes = s_trainer._measured_step_bytes()
            steps_per_exec = (
                s_trainer._chunk_steps
                if isinstance(s_trainer._chunk_steps, int) and s_trainer._chunk_steps > 0
                else s_trainer.n_batches
            )
            measured = trace_roofline(
                td, extra_bytes_per_exec=pallas_step_bytes * steps_per_exec
            )
            pg = measured.get("pallas_gbps")
            log(
                f"MEASURED roofline (ML-1M shape, traced epoch): "
                f"{measured['measured_gbps']:.0f} GB/s "
                f"(HBM {measured['measured_hbm_util']*100:.1f}%), "
                f"{measured['measured_tflops']:.2f} TFLOP/s "
                f"(MFU {measured['measured_mfu']*100:.1f}%), device "
                f"{measured['device_s_per_exec']:.2f}s/exec x "
                f"{measured['n_executions']} execs, op-time coverage "
                f"{measured['op_time_coverage']*100:.0f}%, pallas kernels "
                f"{measured['custom_call_s_per_exec']:.2f}s/exec at "
                f"{pg:.0f} GB/s (exact DMA bytes / measured time)"
                if pg else
                f"MEASURED roofline (ML-1M shape, traced epoch): "
                f"{measured['measured_gbps']:.0f} GB/s "
                f"(HBM {measured['measured_hbm_util']*100:.1f}%)"
            )
            for o in measured["top_ops"][:5]:
                log(
                    f"  top op: {o['name'][:46]:46s} {o['category'][:18]:18s} "
                    f"{o['dur_ms_per_exec']:8.1f} ms/epoch "
                    f"{o['gbps']:6.0f} GB/s  {o['share']*100:4.1f}%"
                )
        except Exception as exc:
            log(f"measured roofline FAILED: {type(exc).__name__}: {exc}")
        del s_trainer
        # cached-propagation lever (--prop_cache_steps 8, opt-in knob;
        # quality A/B in results/prop_cache_ab/): same data, K=8
        try:
            c_cfg = make_config(
                "KHGRec", batch_size=2048, batch_size_kg=8192, hyper_dim=128,
                relation_dim=32, item_ranking=(10, 20), eval_user_batch=512,
                max_epoch=3, early_stopping_steps=100, lrate=0.001, temp=1.0,
                cl_rate=0.01, drop_rate=0.2, mode="full", prop_cache_steps=8,
            )
            c_trainer = Trainer(build_model(c_cfg, s_cf, s_kgd))
            t0 = time.time()
            c_loss, _ = c_trainer.run_epoch(0)  # compile
            jax.block_until_ready(jax.tree.leaves(c_trainer.params)[0])
            c_warm = time.time() - t0
            t0 = time.time()
            c_loss, _ = c_trainer.run_epoch(1)
            jax.block_until_ready(jax.tree.leaves(c_trainer.params)[0])
            c_epoch_s = time.time() - t0
            c_eps = c_trainer.n_batches * c_cfg.batch_size / c_epoch_s
            ml1m_shape["ml1m_shape_cached8_epoch_s"] = round(c_epoch_s, 2)
            ml1m_shape["ml1m_shape_cached8_examples_per_sec"] = round(c_eps, 1)
            log(
                f"ML-1M-SHAPE cached-propagation (K=8): warmup {c_warm:.1f}s, "
                f"steady epoch {c_epoch_s:.2f}s = {c_eps:,.0f} examples/sec "
                f"(loss {float(c_loss):.4f})"
            )
            del c_trainer
        except Exception as exc:
            log(f"cached-propagation phase FAILED: {type(exc).__name__}: {exc}")
        del s_cf, s_kgd  # free HBM before the eval phase
    except Exception as exc:
        log(f"ML-1M-shape phase FAILED: {type(exc).__name__}: {exc}")

    # single benchmark JSON line (driver-parsed): primary = LastFM-shape
    # flagship; secondary ml1m_* fields track the dedup path and the
    # real-scale (full-graph) regime
    # Baseline anchor: measured reference throughput on the EXACT bench
    # dataset via the parity sandbox (scripts/measure_ref_throughput.py,
    # CPU — hardware caveat inside the json) when available; the
    # single-GPU ESTIMATE only as fallback.
    baseline_eps = 10_000.0  # ESTIMATE — reference publishes no throughput
    baseline_measured = None
    try:
        import os

        bt_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "parity", "baseline_throughput.json")
        if os.path.exists(bt_path):
            with open(bt_path) as f:
                bt = json.load(f)
            baseline_measured = bt.get("khgrec_cpu", {}).get("examples_per_sec")
    except Exception as exc:
        log(f"baseline_throughput.json unreadable: {exc}")
    expected_warmup_s = 30.0
    # Warmup classification. Two independent noise sources: (a) service
    # -wide slowness — caught by the pinned control module; (b) PER-
    # MODULE compile variance — the SAME flagship module has drawn
    # 24-634 s across runs with a fast control (BENCH_NOTES), so a slow
    # warmup with a fast control is usually the documented per-module
    # band, not a regression. Only a draw beyond the historical band
    # (with a fast control) reads as module-regressed.
    LOTTERY_BAND_S = 650.0  # max observed for byte-identical modules
    if warmup_s < expected_warmup_s * 4.0:
        warmup_class = "ok"
    elif lottery_scale > 2.0:
        warmup_class = "lottery-slow"  # control slow: service-wide
    elif warmup_s <= LOTTERY_BAND_S:
        warmup_class = "lottery-spread"  # within the per-module band
    else:
        warmup_class = "module-regressed"
    compile_budget_ok = warmup_class != "module-regressed"
    vs_baseline = (
        round(eps / baseline_measured, 3) if baseline_measured
        else round(eps / baseline_eps, 3)
    )
    print(
        json.dumps(
            {
                "metric": "khgrec_train_examples_per_sec",
                "value": round(eps, 1),
                "unit": "examples/sec/chip",
                # measured anchor when available: the reference's own
                # epoch loop on the byte-identical bench dataset (CPU via
                # the parity sandbox — the only hardware it runs on here;
                # the 10k ex/s single-GPU estimate is kept alongside)
                "vs_baseline": vs_baseline,
                "baseline_estimated": baseline_measured is None,
                "baseline_measured_cpu_eps": baseline_measured,
                "baseline_hardware": "cpu" if baseline_measured else None,
                "vs_gpu_estimate": round(eps / baseline_eps, 3),
                # Compile-time telemetry (VERDICT r2 #7 + r3 #6): the
                # axon remote-compile service is a latency lottery
                # (24-634 s observed for byte-identical modules); the
                # pinned control module calibrates today's draw so a
                # genuine module regression can't hide behind it.
                "warmup_s": round(warmup_s, 1),
                "expected_warmup_s": expected_warmup_s,
                "control_compile_s": round(control_compile_s, 1),
                "lottery_scale": round(lottery_scale, 1),
                "compile_budget_ok": compile_budget_ok,
                "warmup_class": warmup_class,
                # ML-1M-density KHGRec steady epoch (dedup auto layout);
                # nulls mean the phase failed (see log) — still a
                # driver-visible signal
                "ml1m_density_epoch_s": (
                    round(ml1m_epoch_s, 3) if ml1m_epoch_s else None
                ),
                "ml1m_density_examples_per_sec": (
                    round(ml1m_eps, 1) if ml1m_eps else None
                ),
                "ml1m_dedup_auto": dedup_auto,
                # real-scale (full ~1.6M-nnz ML-1M-shape graph) phase —
                # nulls mean the phase failed (see stderr log)
                **(ml1m_shape or {
                    "ml1m_shape_nnz": None,
                    "ml1m_shape_epoch_s": None,
                    "ml1m_shape_examples_per_sec": None,
                }),
                # MEASURED roofline at ML-1M shape: per-op device times
                # from the profiler TPU plane x the optimized module's
                # post-fusion bytes (utils/trace_analysis.py) — replaces
                # the analytic HBM figure that over-counted fused operand
                # reuse (>100% in BENCH_r04)
                "measured_roofline": (
                    {
                        "gbps": round(measured["measured_gbps"], 1),
                        "hbm_util": round(measured["measured_hbm_util"], 3),
                        "tflops": round(measured["measured_tflops"], 2),
                        "mfu": round(measured["measured_mfu"], 4),
                        "device_s_per_exec": round(
                            measured["device_s_per_exec"], 3
                        ),
                        "n_executions": measured["n_executions"],
                        "op_time_coverage": round(
                            measured["op_time_coverage"], 3
                        ),
                        "pallas_gbps": (
                            round(measured["pallas_gbps"], 1)
                            if measured.get("pallas_gbps") else None
                        ),
                        "scale": "ml1m_shape",
                        "source": "jax.profiler xplane (measured device "
                                  "times; leaf-op bytes + exact pallas "
                                  "DMA bytes)",
                    }
                    if measured
                    else None
                ),
            }
        ),
        flush=True,
    )

    # ---- eval latency: first call includes remote compile; the second
    # is the steady-state number that matters per-epoch (VERDICT r1 #4).
    # Round-4 profile of the old 0.319s steady eval: encode 29ms +
    # device metrics 8ms + metrics_to_host 315ms — the host conversion
    # made TWELVE per-scalar device->host roundtrips through the remote
    # tunnel. Now a single device_get (eval/metrics.py); the split below
    # keeps the decomposition driver-visible (VERDICT r3 #4).
    # (post-JSON phases are NON-FATAL: the driver metric is already out)
    t_score = 0.1
    n_eval_users = cf_dev.eval_data.n_test_users
    try:
        t0 = time.time()
        m = trainer.evaluate()
        t_eval_cold = time.time() - t0
        # second call: params unchanged -> the encode cache serves the
        # propagated tables and only the score/metric half runs (VERDICT
        # r4 weak #6; equivalence-tested in tests/test_eval_cache.py)
        t0 = time.time()
        m = trainer.evaluate()
        t_eval = time.time() - t0
        # decomposition on the already-compiled split fns: encode (skipped
        # on cache hits) vs score+metrics (always runs)
        t0 = time.time()
        enc = trainer._encode_fn(trainer.params, trainer.extras)
        jax.block_until_ready(jax.tree.leaves(enc))
        t_encode = time.time() - t0
        t0 = time.time()
        dev_m = trainer._score_fn(*enc)
        jax.block_until_ready(jax.tree.leaves(dev_m))
        t_score = time.time() - t0
        log(
            f"full-catalog eval: cold {t_eval_cold:.2f}s (incl. compile), "
            f"steady CACHED {t_eval:.3f}s = {n_eval_users / t_eval:,.0f} users/sec "
            f"(encode {t_encode * 1000:.0f}ms — skipped on cache hit — + "
            f"score {t_score * 1000:.0f}ms)  metrics@20: {m[20]}"
        )
        t_eval_fresh = t_encode + t_score
        log(
            f"epochs/hour: train-only {3600.0 / epoch_s:,.0f}, "
            f"train+eval-every-epoch {3600.0 / (epoch_s + t_eval_fresh):,.0f} "
            f"(eval-after-train re-encodes: params changed)"
        )
    except Exception as exc:
        log(f"eval phase FAILED (diagnostics only): {type(exc).__name__}: {exc}")

    # (the sync-vs-async eval overlap demo was removed with the async_eval
    # machinery: one device queue serialises train+eval — measured 0%
    # hidden here and -4% on the virtual mesh, scripts/eval_overlap_mesh.py)

    # ---- roofline: XLA-reported flops/bytes of the compiled train step
    # against the chip's matmul + HBM roofs (VERDICT r1 #3)
    if not args.no_roofline:
        try:
            from hypergraph_diffusion_for_recommendation_tpu.utils.profiling import (
                cost_analysis,
                roofline,
            )

            def grad_step(p, e, batch, k):
                return jax.value_and_grad(bundle.batch_loss, has_aux=True)(p, e, batch, k)

            batch_sds = trainer._cf_batch_sds()
            stats = cost_analysis(
                grad_step, trainer.params, trainer.extras, batch_sds,
                jax.random.PRNGKey(0),
            )
            step_s = epoch_s / trainer.n_batches
            r = roofline(
                stats.get("flops", 0.0), stats.get("bytes accessed", 0.0), step_s
            )
            # NOTE: bytes come from XLA's analytic cost model, which
            # counts each fused operand access — on-chip reuse inside
            # fusions is over-counted, so >100% of physical peak is
            # possible and simply reads "at the HBM roof".
            hbm_note = " (analytic bytes; >=100% = at the roof)" if r["hbm_util"] >= 1.0 else ""
            log(
                f"train-step roofline (ANALYTIC cost model, bench scale — "
                f"see measured_roofline in the JSON for the trace-derived "
                f"number): {r['achieved_tflops']:.2f} TFLOP/s "
                f"(MFU {r['mfu']*100:.1f}%), {r['achieved_gbps']:.0f} GB/s "
                f"(HBM {r['hbm_util']*100:.1f}%{hbm_note}), intensity "
                f"{r['arithmetic_intensity']:.1f} flop/B "
                f"(ridge {r['ridge_intensity']:.0f})"
            )

            u_sds = jax.ShapeDtypeStruct((cfg.eval_user_batch, cfg.hyper_dim), jnp_f32())
            i_sds = jax.ShapeDtypeStruct((cf_dev.n_items, cfg.hyper_dim), jnp_f32())

            def scorer(u, i):
                import jax.numpy as jnp

                return jax.lax.top_k(jnp.dot(u, i.T, precision="highest"), 20)

            s_stats = cost_analysis(scorer, u_sds, i_sds)
            blocks = -(-n_eval_users // cfg.eval_user_batch)
            # over the measured score-half device time (encode excluded
            # by construction: the split fns time it separately)
            r2 = roofline(
                s_stats.get("flops", 0.0) * blocks,
                s_stats.get("bytes accessed", 0.0) * blocks,
                t_score,
            )
            log(
                f"eval-scorer roofline (score+topk only, over device score "
                f"{t_score * 1000:.0f}ms; encode excluded): "
                f"{r2['achieved_tflops']:.2f} TFLOP/s (MFU {r2['mfu']*100:.1f}%), "
                f"{r2['achieved_gbps']:.0f} GB/s (HBM {r2['hbm_util']*100:.1f}%)"
            )
        except Exception as exc:  # diagnostics only — never fail the bench
            log(f"roofline skipped: {type(exc).__name__}: {exc}")

    # ---- optional convergence check: healthy-model evidence.
    # NON-FATAL: the primary JSON line is already out; a TPU-worker
    # crash here (observed once after a profiler-trace epoch) must not
    # turn a complete measurement into a supervisor retry.
    try:
        _convergence_check(args, trainer, train, test, cf_dev, n_timed)
    except Exception as exc:
        log(f"convergence check FAILED (diagnostics only): "
            f"{type(exc).__name__}: {exc}")


def _convergence_check(args, trainer, train, test, cf_dev, n_timed) -> None:
    import jax

    if args.epochs > 0:
        t0 = time.time()
        for ep in range(args.epochs):
            loss, _ = trainer.run_epoch(ep + n_timed + 1)
        m = trainer.evaluate()
        # EMPIRICAL oracle ceiling (VERDICT r2 #2): score every user-item
        # pair by the exact generative draw weight (Bayes-optimal for
        # this data), mask train-rated, top-20 — computed on host in ~5s.
        # The popularity-only oracle shows how much of that any
        # structure-blind scorer could reach.
        from hypergraph_diffusion_for_recommendation_tpu.data.synthetic import (
            oracle_metrics,
        )

        chance = 20.0 / cf_dev.n_items
        orc = oracle_metrics(
            train, test, n_users=1890, n_items=17632, n_clusters=16,
            mean_degree=49.0, seed=7, cluster_seed=7, k=20,
        )
        r20 = m[20]["recall"]
        post = orc.get("recall_posterior", orc["recall"])
        log(
            f"converged after +{args.epochs} epochs ({time.time()-t0:.1f}s): "
            f"loss {loss:.4f} metrics@20 {m[20]} — recall {r20:.4f} = "
            f"{r20 / chance:.1f}x chance ({chance:.5f}), "
            f"{r20 / post * 100:.0f}% of the ATTAINABLE (posterior-predictive"
            f"-given-train) Bayes ceiling {post:.4f} "
            f"[full-latent oracle {orc['recall']:.4f}, popularity-only "
            f"{orc['recall_pop']:.4f}]"
        )


def jnp_f32():
    import jax.numpy as jnp

    return jnp.float32


if __name__ == "__main__":
    main()
