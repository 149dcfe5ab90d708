"""Standalone scale bisect for the pallas blocked segment-SpMM kernel.

A ~1.9M-nnz power-law adjacency under HGNN_HD3 crashed the TPU worker in
round 1 (guard at data/device.py PALLAS_MAX_NNZ). This script exercises
ONLY the kernel at a requested scale so the fault can be attributed:
raw-kernel fault vs whole-model (memory pressure / other op) fault.

Usage: python scripts/bisect_pallas.py --nnz 1900000 --n 9746 --d 64 \
           [--bf16] [--alpha 1.2] [--grad]
Prints one line: BISECT PASS/FAIL nnz=... maxerr=... fwd_ms=...
A worker fault shows up as a crash / hang (run under `timeout`).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def powerlaw_coo(rng: np.random.Generator, nnz: int, n: int, m: int, alpha: float):
    """Zipf-ish rows (long revisit chains in row 0's window) + uniform cols."""
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-alpha)
    p /= p.sum()
    rows = rng.choice(n, size=nnz, p=p)
    cols = rng.integers(0, m, size=nnz)
    vals = rng.uniform(0.1, 1.0, size=nnz).astype(np.float32)
    order = np.lexsort((cols, rows))
    return rows[order], cols[order], vals[order]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nnz", type=int, required=True)
    ap.add_argument("--n", type=int, default=9746)
    ap.add_argument("--m", type=int, default=0, help="cols; default = n (square)")
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--alpha", type=float, default=1.2)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--grad", action="store_true", help="also run the VJP")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--vals", action="store_true",
                    help="pass explicit vals (exercise the src re-gather path)")
    ap.add_argument("--scan", type=int, default=0,
                    help="run N grad steps inside lax.scan (mimics the epoch loop)")
    ap.add_argument("--twohop", action="store_true",
                    help="A @ (A^T @ X) through spmm_pair/AdjPair (the HGCNConv path)")
    ap.add_argument("--eb", type=int, default=None, help="edge block size")
    ap.add_argument("--rb", type=int, default=None, help="row window size")
    ap.add_argument("--dedup", action="store_true",
                    help="pack with the dedup-gather layout (pack_blocked_dedup)")
    ap.add_argument("--ub", type=int, default=None, help="unique-col budget (dedup)")
    args = ap.parse_args()
    m = args.m or args.n

    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)

    from hypergraph_diffusion_for_recommendation_tpu.ops.pallas.segment_spmm import (
        blocked_spmm,
        pack_blocked,
        pack_blocked_dedup,
    )

    rng = np.random.default_rng(0)
    rows, cols, vals = powerlaw_coo(rng, args.nnz, args.n, m, args.alpha)
    top_row_count = int(np.max(np.bincount(rows, minlength=args.n)))
    print(f"top-row degree (revisit-chain proxy): {top_row_count}", flush=True)

    if args.dedup:
        blocked = pack_blocked_dedup(rows, cols, vals, (args.n, m), bf16=args.bf16,
                                     edge_block=args.eb, row_block=args.rb,
                                     unique_block=args.ub)
    else:
        blocked = pack_blocked(rows, cols, vals, (args.n, m), bf16=args.bf16,
                               edge_block=args.eb, row_block=args.rb)
    print(f"n_blocks={blocked.n_blocks} n_windows={blocked.n_windows}", flush=True)

    x = jnp.asarray(rng.standard_normal((m, args.d)).astype(np.float32))

    explicit_vals = jnp.asarray(vals) if args.vals else None
    t0 = time.time()
    y = blocked_spmm(blocked, x, explicit_vals)
    y.block_until_ready()
    print(f"first call (incl compile): {time.time() - t0:.1f}s", flush=True)

    # host scipy reference (NOT the XLA scatter: its accumulation chain
    # serializes on the top row — 329k sequential adds at ML-1M density
    # wedge for minutes, which is exactly why the kernel exists)
    import scipy.sparse as sps

    ref = sps.coo_matrix((vals, (rows, cols)), shape=(args.n, m)).tocsr() @ np.asarray(x)
    maxerr = float(np.max(np.abs(np.asarray(y) - ref)) / (np.max(np.abs(ref)) + 1e-9))

    for _ in range(3):
        blocked_spmm(blocked, x, explicit_vals).block_until_ready()
    t0 = time.time()
    for _ in range(args.iters):
        y = blocked_spmm(blocked, x, explicit_vals)
    y.block_until_ready()
    fwd_ms = (time.time() - t0) / args.iters * 1e3

    grad_ms = -1.0
    if args.grad:
        loss = jax.jit(lambda xx: jnp.sum(blocked_spmm(blocked, xx) ** 2))
        g = jax.jit(jax.grad(loss))
        g(x).block_until_ready()
        t0 = time.time()
        for _ in range(args.iters):
            gg = g(x)
        gg.block_until_ready()
        grad_ms = (time.time() - t0) / args.iters * 1e3

    if args.twohop:
        # the HGCNConv path: dropout vals -> AdjPair -> two_hop under grad
        from hypergraph_diffusion_for_recommendation_tpu.data.device import make_adj_pair
        import hypergraph_diffusion_for_recommendation_tpu.data.device as devmod
        from hypergraph_diffusion_for_recommendation_tpu.ops.sparse import two_hop

        devmod.PALLAS_MAX_NNZ = max(devmod.PALLAS_MAX_NNZ, args.nnz * 2)
        pair = make_adj_pair(rows, cols, vals, (args.n, m))
        print(f"twohop: fwd blocked={pair.fwd.blocked is not None} "
              f"bwd blocked={pair.bwd.blocked is not None}", flush=True)

        def th_loss(xx, key):
            dropped = pair.dropped(key, 0.8)
            return jnp.sum(two_hop(dropped.fwd, dropped.bwd, xx) ** 2)

        gfn = jax.jit(jax.grad(th_loss))
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        gfn(x, key).block_until_ready()
        print(f"twohop grad first call: {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        for i in range(args.iters):
            gg = gfn(x, jax.random.fold_in(key, i))
        gg.block_until_ready()
        print(f"BISECT PASS twohop nnz={args.nnz} "
              f"grad_ms={(time.time() - t0) / args.iters * 1e3:.2f}", flush=True)
        return

    if args.scan:
        vals_j = jnp.asarray(vals)

        def step(xx, key):
            # dropout-style masked vals, re-gathered through `src` (the
            # in-model path: AdjPair.dropped -> _packed_vals)
            v = vals_j * jax.random.bernoulli(key, 0.8, (args.nnz,)) / 0.8
            def loss(xc):
                return jnp.sum(blocked_spmm(blocked, xc, v) ** 2)
            g = jax.grad(loss)(xx)
            return xx - 1e-6 * g, jnp.sum(g)

        @jax.jit
        def run_scan(xx, key):
            keys = jax.random.split(key, args.scan)
            return jax.lax.scan(step, xx, keys)

        t0 = time.time()
        xs, sums = run_scan(x, jax.random.PRNGKey(1))
        xs.block_until_ready()
        print(f"BISECT PASS scan={args.scan} nnz={args.nnz} "
              f"total_s={time.time() - t0:.1f}", flush=True)
        return

    tol = 2e-2 if args.bf16 else 1e-4
    status = "PASS" if maxerr < tol else "FAIL"
    print(
        f"BISECT {status} nnz={args.nnz} d={args.d} bf16={args.bf16} "
        f"maxrelerr={maxerr:.2e} fwd_ms={fwd_ms:.2f} grad_ms={grad_ms:.2f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
