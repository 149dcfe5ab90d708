"""Scaling-efficiency harness: examples/sec across mesh sizes.

BASELINE.md target: ">= 80% examples/s scaling efficiency 1 chip -> N".
Real multi-chip hardware is not reachable from this environment (one
v5e chip via the axon tunnel), so this harness measures the SAME jitted
sharded program at mesh sizes {1, 2, 4, ...} on whatever devices exist
and reports steady-state examples/sec + efficiency vs linear scaling
from the 1-device point. On a pod slice it produces the BASELINE number
directly; on the forced 8-virtual-CPU backend it validates the harness
and exposes the collective/partitioning overhead of the sharded program
(absolute CPU numbers are not TPU evidence — see BENCH_NOTES.md).

Usage:
  python scripts/scaling_efficiency.py [--model KHGRec] [--sizes 1,2,4,8]
      [--users 1890 --items 6000 --degree 30] [--epochs 3] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="KHGRec")
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--users", type=int, default=945)
    ap.add_argument("--items", type=int, default=3000)
    ap.add_argument("--degree", type=float, default=22.0)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=3, help="per size; first is warmup/compile")
    ap.add_argument("--cpu", action="store_true", help="force the virtual-CPU backend")
    ap.add_argument(
        "--weak", action="store_true",
        help="weak scaling: global batch_size = --batch x devices. The honest "
        "DP mode for full-graph-propagation models (per-step propagation is "
        "batch-independent and replicated; only batch work shards)",
    )
    ap.add_argument(
        "--dp_only", action="store_true",
        help="data axis only (no model axis / row-sharded tables)",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    if args.cpu or max(sizes) > 1:
        # Multi-device runs in this environment are always the virtual-CPU
        # mesh (the axon sitecustomize overrides JAX_PLATFORMS and provides
        # one chip). On a real slice, pass sizes that fit the hardware and
        # drop --cpu.
        from hypergraph_diffusion_for_recommendation_tpu.utils.platform import (
            force_virtual_cpu,
        )

        force_virtual_cpu(max(sizes))
    import jax

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
    from hypergraph_diffusion_for_recommendation_tpu.parallel import make_mesh
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    print(f"backend: {jax.devices()[0].platform} x {len(jax.devices())}", flush=True)
    needs_kg = args.model in ("KHGRec", "KGAT", "HGNN", "HD2", "HGNNAblation")
    train, test, kg_df = synthetic_dataset(
        n_users=args.users, n_items=args.items, mean_degree=args.degree,
        seed=7, with_kg=needs_kg,
    )
    inter = build_interaction(train, test)
    cf_dev = build_cf_device_data(inter, needs=model_data_needs(args.model))
    kg_dev = None
    if needs_kg:
        kg_dev = build_kg_device_data(build_knowledge(kg_df, inter))
    results = []
    for n in sizes:
        if n > len(jax.devices()):
            print(f"size {n}: skipped (only {len(jax.devices())} devices)", flush=True)
            continue
        cfg = make_config(
            args.model, hyper_dim=args.dim,
            batch_size=args.batch * n if args.weak else args.batch,
            max_epoch=args.epochs, early_stopping_steps=args.epochs + 1,
        )
        # default: make_mesh's own auto-factoring (favours a model axis
        # of 2 when n allows), so the measured topology matches what
        # production auto-selection would build
        if n <= 1:
            mesh = None
        elif args.dp_only:
            mesh = make_mesh(n, 1, jax.devices()[:n])
        else:
            mesh = make_mesh(devices=jax.devices()[:n])
        bundle = build_model(cfg, cf_dev, kg_dev, mesh=mesh)
        tr = Trainer(bundle, mesh=mesh)
        times = []
        for ep in range(args.epochs):
            t0 = time.time()
            loss, _ = tr.run_epoch(ep)
            jax.block_until_ready(jax.tree.leaves(tr.params)[0])
            times.append(time.time() - t0)
        steady = min(times[1:]) if len(times) > 1 else times[0]
        exps = tr.n_batches * cfg.batch_size / steady
        results.append((n, exps, float(loss)))
        print(
            f"size {n} (mesh "
            f"{dict(zip(mesh.axis_names, mesh.devices.shape)) if mesh else '1x1'}): "
            f"{steady:.3f}s/epoch  {exps:,.0f} ex/s  loss {loss:.4f}",
            flush=True,
        )

    if results:
        base_n, base_exps, _ = results[0]
        rows = [
            {
                "devices": n,
                "examples_per_sec": round(exps, 1),
                "efficiency_vs_linear": round(exps / (base_exps * n / base_n), 4),
            }
            for n, exps, _ in results
        ]
        print(json.dumps({"model": args.model, "scaling": rows}))


if __name__ == "__main__":
    main()
