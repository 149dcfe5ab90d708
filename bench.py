"""Benchmark: flagship KHGRec training throughput on one TPU chip.

Runs the full joint CF+KG+SSL training pipeline (on-device sampling,
per-batch attention refresh, two encoders, fused losses, Adam) on a
LastFM-scale synthetic dataset (~1.9k users, ~18k items, ~93k
interactions, ~250k KG triples) and reports steady-state training
examples/sec, steady-state full-catalog eval latency, epochs/hour, and
the roofline position (MFU + HBM utilisation) of the train step.

The reference publishes no throughput numbers (BASELINE.md: "measure &
report"), so `vs_baseline` is the ratio against an ESTIMATED reference
point of 10k examples/sec — roughly what the reference's torch loop
sustains on a single GPU for this model class (per-batch Python
sampling + CPU sparse softmax round-trips bound it). The JSON line
carries `baseline_estimated: true` to mark it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Extra diagnostics go to stderr.

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
    ap.add_argument("--attempt_deadline", type=float, default=900.0,
                    help="per-attempt wall-clock budget in supervised mode")
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

    # single benchmark JSON line (driver-parsed): primary = LastFM-shape
    # flagship; secondary ml1m_* fields track the dedup path
    baseline_eps = 10_000.0  # ESTIMATE — reference publishes no throughput
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
    print(
        json.dumps(
            {
                "metric": "khgrec_train_examples_per_sec",
                "value": round(eps, 1),
                "unit": "examples/sec/chip",
                "vs_baseline": round(eps / baseline_eps, 3),
                "baseline_estimated": True,
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
    t0 = time.time()
    m = trainer.evaluate()
    t_eval_cold = time.time() - t0
    t0 = time.time()
    m = trainer.evaluate()
    t_eval = time.time() - t0
    # decomposition: device-only eval fn vs host conversion
    t0 = time.time()
    dev_m = trainer._eval_fn(trainer.params, trainer.extras)
    jax.block_until_ready(jax.tree.leaves(dev_m))
    t_eval_device = time.time() - t0
    n_eval_users = cf_dev.eval_data.n_test_users
    log(
        f"full-catalog eval: cold {t_eval_cold:.2f}s (incl. compile), "
        f"steady-state {t_eval:.3f}s = {n_eval_users / t_eval:,.0f} users/sec "
        f"(device {t_eval_device * 1000:.0f}ms + host sync "
        f"{(t_eval - t_eval_device) * 1000:.0f}ms)  metrics@20: {m[20]}"
    )
    log(
        f"epochs/hour: train-only {3600.0 / epoch_s:,.0f}, "
        f"train+eval-every-epoch {3600.0 / (epoch_s + t_eval):,.0f}"
    )

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
                f"train-step roofline: {r['achieved_tflops']:.2f} TFLOP/s "
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
            # over the DEVICE-only eval time: the host-sync tail is a
            # tunnel artifact, not kernel time (round-4 profile)
            r2 = roofline(
                s_stats.get("flops", 0.0) * blocks,
                s_stats.get("bytes accessed", 0.0) * blocks,
                t_eval_device,
            )
            log(
                f"eval-scorer roofline (score+topk only, over device eval "
                f"{t_eval_device * 1000:.0f}ms; encode excluded): "
                f"{r2['achieved_tflops']:.2f} TFLOP/s (MFU {r2['mfu']*100:.1f}%), "
                f"{r2['achieved_gbps']:.0f} GB/s (HBM {r2['hbm_util']*100:.1f}%)"
            )
        except Exception as exc:  # diagnostics only — never fail the bench
            log(f"roofline skipped: {type(exc).__name__}: {exc}")

    # ---- optional convergence check: healthy-model evidence
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
