"""Measure sync-vs-async (one-epoch-lag) eval overlap (VERDICT r2 #5).

A one-epoch-lagged eval defers the device->host metrics sync so the next
train epoch can be dispatched behind it. Measured results for this exact
dispatch pattern (epochs+evals, KHGRec):

  real TPU v5e chip (BENCH_r02 demo):   sync 1.80s  async 1.80s -> 0% hidden
  8-dev virtual CPU mesh (this script): sync ~36s   async ~22s  -> ~40% hidden

The two disagree because the CPU backend EXECUTES separately dispatched
programs concurrently on the host thread pool, while a TPU chip has one
serial compute stream — train and eval device work serialise, so the lag
hides nothing on the deployment hardware (and an SPMD mesh of real chips
behaves like the single chip: both programs occupy all chips). On that
evidence the `async_eval` trainer mode was REMOVED from fit(); this
script hand-rolls both dispatch patterns against the public Trainer API
so the measurement stays reproducible on either backend.

  python scripts/eval_overlap_mesh.py [--devices 8] [--epochs 6]
  python scripts/eval_overlap_mesh.py --real_chip   # on the session TPU
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--real_chip", action="store_true",
                    help="skip the virtual-CPU mesh; run single-chip on "
                         "whatever backend is live (the axon TPU here)")
    args = ap.parse_args()

    if not args.real_chip:
        from hypergraph_diffusion_for_recommendation_tpu.utils.platform import (
            force_virtual_cpu,
        )

        force_virtual_cpu(args.devices)

    import jax

    from __graft_entry__ import _build_flagship
    from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

    mesh = None
    build_kw = {}
    if not args.real_chip:
        from hypergraph_diffusion_for_recommendation_tpu.parallel import make_mesh

        mesh = make_mesh(devices=jax.devices()[: args.devices])
        build_kw = dict(mesh=mesh, shard_graph=True)

    cfg, bundle, cf_dev, kg_dev = _build_flagship(
        n_users=768, n_items=1536, mean_degree=16.0, batch_size=512,
        batch_size_kg=1024, **build_kw,
    )
    trainer = Trainer(bundle, mesh=mesh)
    # warm both compiled paths out of the timed region
    trainer.run_epoch(0)
    trainer.evaluate()

    # sync: block on each epoch's eval metrics before the next epoch
    t0 = time.time()
    for ep in range(args.epochs):
        trainer.run_epoch(ep)
        jax.block_until_ready(trainer._eval_fn(trainer.params, trainer.extras))
    t_sync = time.time() - t0

    # async (one-epoch lag): dispatch eval, materialise its metrics only
    # after the NEXT epoch has been dispatched
    t0 = time.time()
    pending = None
    for ep in range(args.epochs):
        trainer.run_epoch(ep)
        dev_m = trainer._eval_fn(trainer.params, trainer.extras)
        if pending is not None:
            jax.block_until_ready(pending)
        pending = dev_m
    jax.block_until_ready(pending)
    t_async = time.time() - t0

    hidden = 1.0 - t_async / t_sync
    where = ("single real chip" if args.real_chip
             else f"mesh={dict(zip(mesh.axis_names, mesh.devices.shape))}")
    print(f"RESULT {where} sync {t_sync:.2f}s async {t_async:.2f}s "
          f"-> {hidden * 100:.0f}% hidden", flush=True)


if __name__ == "__main__":
    main()
