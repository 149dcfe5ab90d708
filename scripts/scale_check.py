"""ML-1M-scale check for any registered model, with the pallas guard
raised (HGDR_PALLAS_MAX_NNZ) — the reproduction harness for the round-1
TPU worker fault (HGNN_HD3 on a ~1.9M-nnz power-law adjacency).

Usage:
  HGDR_PALLAS_MAX_NNZ=4000000 timeout 900 python scripts/scale_check.py \
      --model HGNN_HD3 --epochs 2 [--bf16] [--users 6040 --items 3706 --degree 147]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="HGNN_HD3")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--users", type=int, default=6040)
    ap.add_argument("--items", type=int, default=3706)
    ap.add_argument("--degree", type=float, default=147.0)  # ~886k train edges
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--prop_cache_steps", type=int, default=0,
                    help="cached-propagation K for the KHGRec/HD "
                         "families (0 = off; see core/config.py)")
    ap.add_argument("--with-kg", action="store_true")
    ap.add_argument("--mesh", type=str, default="",
                    help="'data,model' axis sizes, e.g. 1,8 — runs on a "
                         "virtual CPU mesh when more devices are requested "
                         "than exist; combines with --shard_graph")
    ap.add_argument("--shard_graph", action="store_true",
                    help="row-window-shard the adjacencies over the model "
                         "axis (per-device edge memory ~nnz/S)")
    args = ap.parse_args()

    mesh = None
    if args.mesh:
        d_ax, m_ax = (int(x) for x in args.mesh.split(","))
        if d_ax * m_ax > 1:
            # this environment exposes ONE real chip; multi-device runs
            # go to a virtual CPU mesh. Must happen BEFORE the backend
            # initialises (so no jax call may precede it).
            from hypergraph_diffusion_for_recommendation_tpu.utils.platform import (
                force_virtual_cpu,
            )

            force_virtual_cpu(d_ax * m_ax)

    import hypergraph_diffusion_for_recommendation_tpu.data.device as devmod

    devmod.PALLAS_BF16 = args.bf16
    if args.mesh:
        from hypergraph_diffusion_for_recommendation_tpu.parallel import make_mesh

        mesh = make_mesh(d_ax, m_ax)
    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
        build_kg_device_data,
        build_knowledge,
        synthetic_dataset,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import build_model
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    print(f"pallas guard: [{devmod.PALLAS_MIN_NNZ}, {devmod.PALLAS_MAX_NNZ}]", flush=True)
    t0 = time.time()
    train, test, kg_df = synthetic_dataset(
        n_users=args.users, n_items=args.items, n_clusters=64,
        mean_degree=args.degree, seed=7, with_kg=args.with_kg,
    )
    print(f"synthetic: {len(train)} train / {len(test)} test pairs "
          f"({time.time()-t0:.1f}s)", flush=True)
    inter = build_interaction(train, test)
    t0 = time.time()
    from hypergraph_diffusion_for_recommendation_tpu.models import model_data_needs

    from hypergraph_diffusion_for_recommendation_tpu.models import model_shard_needs

    shard_needs = model_shard_needs(args.model) if (args.shard_graph and mesh) else frozenset()
    cf_dev = build_cf_device_data(
        inter, eval_user_multiple=512, needs=model_data_needs(args.model),
        mesh=mesh, shard_needs=shard_needs,
    )
    kg_dev = None
    if args.with_kg:
        kg = build_knowledge(kg_df, inter)
        kg_dev = build_kg_device_data(kg, mesh=mesh, shard="kg" in shard_needs)
    print(f"device data: {time.time()-t0:.1f}s; adj nnz={cf_dev.adj.fwd.nnz} "
          f"blocked={'yes' if cf_dev.adj.fwd.blocked is not None else 'no'}", flush=True)

    cfg = make_config(
        args.model, batch_size=args.batch, hyper_dim=args.dim,
        item_ranking=(10, 20, 40), eval_user_batch=512,
        max_epoch=args.epochs, early_stopping_steps=args.epochs + 1,
        prop_cache_steps=args.prop_cache_steps,
    )
    if shard_needs:
        from hypergraph_diffusion_for_recommendation_tpu.parallel import ShardedCOO

        srep = [f for f in sorted(shard_needs) if f != "kg"]
        print(f"sharded adjacencies: {srep + (['kg'] if 'kg' in shard_needs else [])} "
              f"over mesh {args.mesh} (per-device ~1/{m_ax} of edges)", flush=True)
        assert not srep or isinstance(getattr(cf_dev, srep[0]).fwd, ShardedCOO)
    tr = Trainer(build_model(cfg, cf_dev, kg_dev, mesh=mesh), mesh=mesh)
    print(f"chunked execution: {tr._chunk_steps or 'off'} steps/exec "
          f"({tr.n_batches} batches/epoch)", flush=True)
    for ep in range(args.epochs):
        t0 = time.time()
        loss, aux = tr.run_epoch(ep)
        import jax

        jax.block_until_ready(jax.tree.leaves(tr.params)[0])
        print(f"epoch {ep}: loss {loss:.4f} ({time.time()-t0:.1f}s)", flush=True)
    m = tr.evaluate()
    print(f"SCALE_CHECK PASS model={args.model} recall@20={m[20]['recall']:.5f}", flush=True)


if __name__ == "__main__":
    main()
