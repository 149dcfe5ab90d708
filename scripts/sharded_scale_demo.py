"""10M-edge sharded-diffusion demonstration (VERDICT r1 item 2).

Round 1 hit a 17.56G HBM OOM at 10M edges with the replicated adjacency
(BENCH_NOTES round 4; the 128x tiling blowup fix brought single-chip
10M-edge training back, but one chip's HBM still bounds the graph).
This script shows the sharded layout removing that bound: the same
10M-edge adjacency is built SHARDED over an 8-device mesh (mode="auto"
picks the edge-balanced partition on this zipf-skewed graph: exactly
nnz/S edges per device regardless of row skew), per-device edge bytes
drop to ~1/8 of the replicated layout, and a two-hop diffusion
forward+backward (the HD-family hot path) runs through the shard_map
collective with numerics spot-checked against scipy on a row sample.

Run (virtual CPU mesh; per-device HBM relief is structural — the same
arrays device_put onto a real 8-chip slice hold 1/8 per chip):

  timeout 900 python scripts/sharded_scale_demo.py \
      [--edges 10000000 --users 60000 --items 40000 --d 64 --shards 8]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--users", type=int, default=60_000)
    ap.add_argument("--items", type=int, default=40_000)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--shards", type=int, default=8)
    args = ap.parse_args()

    from hypergraph_diffusion_for_recommendation_tpu.utils.platform import (
        force_virtual_cpu,
    )

    force_virtual_cpu(args.shards)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from hypergraph_diffusion_for_recommendation_tpu.parallel import (
        make_mesh,
        shard_adj_pair,
    )
    from hypergraph_diffusion_for_recommendation_tpu.ops.sparse import two_hop

    n = args.users + args.items
    rng = np.random.default_rng(0)
    t0 = time.time()
    # power-law-ish bipartite edges, symmetrised like the (U+I)^2 adjacency
    u = (rng.zipf(1.3, args.edges // 2) - 1) % args.users
    i = (rng.zipf(1.3, args.edges // 2) - 1) % args.items + args.users
    rows = np.concatenate([u, i])
    cols = np.concatenate([i, u])
    vals = np.full(rows.shape[0], 1e-3, np.float32)
    print(f"edges built: {rows.shape[0]:,} ({time.time()-t0:.1f}s)", flush=True)

    mesh = make_mesh(1, args.shards)
    t0 = time.time()
    pair = shard_adj_pair(rows, cols, vals, (n, n), mesh)
    mode = "balanced" if pair.fwd.balanced else "window"
    print(f"sharded AdjPair built, mode={mode} ({time.time()-t0:.1f}s)", flush=True)

    def tree_bytes(t):
        return sum(l.nbytes for l in jax.tree.leaves(t) if hasattr(l, "nbytes"))

    total = tree_bytes((pair.fwd, pair.bwd))
    per_device = total // args.shards  # leading shard axis is P(model)
    # replicated-layout equivalent: fwd+bwd padded COO rows/cols/vals/
    # t_perm at 4 bytes each over nnz_pad
    replicated = rows.shape[0] * 4 * 7
    print(
        f"adjacency bytes: sharded total {total/2**30:.2f} GiB -> "
        f"{per_device/2**30:.2f} GiB/device ({args.shards} devices); "
        f"replicated layout would hold {replicated/2**30:.2f} GiB on EVERY device "
        f"({replicated/per_device:.1f}x more per device)",
        flush=True,
    )

    x = jnp.asarray(rng.normal(size=(n, args.d)).astype(np.float32))

    # the AdjPair rides as a jit ARGUMENT (like the production trainer's
    # const hoisting) so multi-GB layouts never bake into the module
    @jax.jit
    def loss(p, x):
        return jnp.sum(jnp.square(two_hop(p.fwd, p.bwd, x)))

    t0 = time.time()
    val, grad = jax.value_and_grad(loss, argnums=1)(pair, x)
    jax.block_until_ready(grad)
    print(
        f"two-hop fwd+grad through shard_map: {time.time()-t0:.1f}s "
        f"loss={float(val):.4e} |grad|={float(jnp.linalg.norm(grad)):.4e}",
        flush=True,
    )
    assert np.isfinite(float(val)) and np.isfinite(float(jnp.linalg.norm(grad)))

    # numeric spot check on a row sample vs scipy
    import scipy.sparse as sps

    a = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    from hypergraph_diffusion_for_recommendation_tpu.ops.sparse import spmm

    y = np.asarray(spmm(pair.fwd, x))
    sample = rng.integers(0, n, 50)
    want = a[sample] @ np.asarray(x)
    np.testing.assert_allclose(y[sample], want, rtol=3e-4, atol=3e-4)
    print(f"SHARDED_SCALE_DEMO PASS edges={rows.shape[0]:,} shards={args.shards}", flush=True)


if __name__ == "__main__":
    main()
