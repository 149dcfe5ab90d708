"""Profile the host-side device-data build at a given graph scale.

Times each stage (synthetic gen, interaction build, knowledge build,
CF device data, KG device data) separately, on the CPU backend by
default so device_put does not ride the axon tunnel (pass --tpu to
include real transfer time).

Usage: python scripts/profile_build.py --users 30000 --items 20000 --degree 152 --with-kg
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=30000)
    ap.add_argument("--items", type=int, default=20000)
    ap.add_argument("--degree", type=float, default=152.0)
    ap.add_argument("--with-kg", action="store_true")
    ap.add_argument("--model", default="KHGRec")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    if not args.tpu:
        from hypergraph_diffusion_for_recommendation_tpu.utils.platform import (
            force_virtual_cpu,
        )

        force_virtual_cpu(1)
    import jax

    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
        build_kg_device_data,
        build_knowledge,
        synthetic_dataset,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import model_data_needs

    def stage(name, fn):
        t0 = time.time()
        out = fn()
        print(f"{name:>24}: {time.time() - t0:7.1f}s", flush=True)
        return out

    print(f"backend: {jax.devices()[0].platform}", flush=True)
    train, test, kg_df = stage(
        "synthetic_dataset",
        lambda: synthetic_dataset(
            n_users=args.users, n_items=args.items, n_clusters=64,
            mean_degree=args.degree, seed=7, with_kg=args.with_kg,
        ),
    )
    print(f"{'':>24}  ({len(train)} train pairs)", flush=True)
    inter = stage("build_interaction", lambda: build_interaction(train, test))
    cf_dev = stage(
        "build_cf_device_data",
        lambda: build_cf_device_data(inter, needs=model_data_needs(args.model)),
    )
    print(f"{'':>24}  (adj nnz={cf_dev.adj.fwd.nnz if cf_dev.adj else 'n/a'})", flush=True)
    if args.with_kg:
        kg = stage("build_knowledge", lambda: build_knowledge(kg_df, inter))
        stage("build_kg_device_data", lambda: build_kg_device_data(kg))


if __name__ == "__main__":
    main()
