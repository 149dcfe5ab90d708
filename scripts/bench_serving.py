"""Serving micro-benchmark: Retriever batched top-k queries/sec on device.

Builds a catalog-scale serving artifact (random tables — retrieval cost
is independent of training), loads it through the real export/load path,
and measures steady-state masked top-k throughput at several query batch
sizes.

Usage: python scripts/bench_serving.py [--users 60000 --items 200000 --dim 128 --k 20]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=60000)
    ap.add_argument("--items", type=int, default=200000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--max_deg", type=int, default=64)
    ap.add_argument("--batches", default="256,1024,4096")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    from hypergraph_diffusion_for_recommendation_tpu.eval.serving import (
        Retriever,
        export_embeddings,
    )

    rng = np.random.default_rng(0)
    user_emb = rng.standard_normal((args.users, args.dim), dtype=np.float32)
    item_emb = rng.standard_normal((args.items, args.dim), dtype=np.float32)
    rated = rng.integers(0, args.items, (args.users, args.max_deg), dtype=np.int64)
    rated[:, args.max_deg // 2 :] = -1  # half-padded histories

    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/embeddings.npz"
        export_embeddings(
            path, user_emb, item_emb,
            id2user=np.arange(args.users), id2item=np.arange(args.items),
            rated_pad=rated,
        )
        r = Retriever.load(path)
        print(
            f"device: {jax.devices()[0].device_kind}  catalog {args.items:,} items "
            f"x d={args.dim}, {args.users:,} users, k={args.k}",
            flush=True,
        )
        for b in (int(x) for x in args.batches.split(",")):
            q = rng.integers(0, args.users, b)
            ids, scores = r.topk(q, k=args.k)  # warmup/compile
            t0 = time.time()
            for i in range(args.iters):
                q = rng.integers(0, args.users, b)
                ids, scores = r.topk(q, k=args.k)
            dt = (time.time() - t0) / args.iters
            print(
                f"batch {b:>5}: {dt * 1e3:7.2f} ms/query-batch  "
                f"{b / dt:,.0f} queries/sec  (end-to-end incl. host round-trip)",
                flush=True,
            )

        # device-only: the jitted masked-topk body, inputs pre-staged on
        # device, chained without host sync -> isolates chip time from
        # the host/tunnel round-trip above
        import jax.numpy as jnp

        fn = r._fn(args.k, True)
        for b in (int(x) for x in args.batches.split(",")):
            if b != r.block:
                continue  # the jitted body is block-shaped
            q = rng.integers(0, args.users, b)
            u = jnp.asarray(r.user_emb[jnp.asarray(q)])
            rated = jnp.asarray(r.rated_pad[jnp.asarray(q)])
            jax.block_until_ready(fn(u, rated))
            t0 = time.time()
            outs = [fn(u, rated) for _ in range(args.iters)]
            jax.block_until_ready(outs[-1])
            dt = (time.time() - t0) / args.iters
            print(
                f"batch {b:>5}: {dt * 1e3:7.2f} ms/query-batch  "
                f"{b / dt:,.0f} queries/sec  (device-only, pipelined)",
                flush=True,
            )


if __name__ == "__main__":
    main()
