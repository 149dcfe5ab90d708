"""De-risk the sharded dedup gather layout on the REAL chip (VERDICT r3 #8).

The per-shard BlockedCOO packs (parallel/sharded_adj._pack_shard_blocked)
auto-select the dedup layout by pooled column multiplicity exactly like
the single-chip packer, but until round 4 their kernel path had only
been numerics-tested in pallas interpret mode on the CPU backend. This
script runs the sharded pack's ACTUAL kernel on the TPU in single-device
mode (mesh of 1 — the only real topology available here):

  1. builds an ML-1M-density graph (high column multiplicity, the dedup
     regime) and shards it over a 1-device model axis;
  2. asserts the per-shard pack auto-selected the dedup layout;
  3. checks numeric agreement of sharded_spmm (and its VJP) against the
     unsharded single-chip BlockedCOO path AND a dense reference;
  4. times fwd and fwd+bwd per spmm, and reports an epoch-equivalent
     (x spmm-per-epoch count of the KHGRec step) for BENCH_NOTES.

Usage: python scripts/sharded_dedup_real_chip.py [--users 1500 ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=1500)
    ap.add_argument("--items", type=int, default=1000)
    ap.add_argument("--degree", type=float, default=120.0)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_interaction,
        synthetic_dataset,
    )
    from hypergraph_diffusion_for_recommendation_tpu.data import device as _dev
    from hypergraph_diffusion_for_recommendation_tpu.parallel import make_mesh
    from hypergraph_diffusion_for_recommendation_tpu.parallel.sharded_adj import (
        shard_sparse,
        sharded_spmm,
    )

    assert jax.default_backend() == "tpu", (
        f"this probe must run on the real chip (backend={jax.default_backend()})"
    )

    train, test, _ = synthetic_dataset(
        n_users=args.users, n_items=args.items, mean_degree=args.degree, seed=9
    )
    inter = build_interaction(train, test)
    A = inter.ui_adj.tocoo()  # (n+m)^2 bipartite, normalised upstream? raw here
    n = A.shape[0]
    print(f"graph: {n} nodes, {A.nnz} edges, "
          f"multiplicity ~{A.nnz / n:.0f} per node-column pool")

    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    sh = shard_sparse(A.row, A.col, A.data, A.shape, mesh, attach_blocked=True)
    assert sh.blocked is not None, "per-shard pallas pack not attached"
    dedup = sh.blocked.ucols is not None
    print(f"sharded pack: mode={'balanced' if sh.balanced else 'window'}, "
          f"dedup auto-selected={dedup}")
    assert dedup, "expected the dedup layout at this density"

    # single-chip unsharded pack on the same edges
    import scipy.sparse as sp

    from hypergraph_diffusion_for_recommendation_tpu.data.device import (
        adj_pair_from_scipy,
    )

    csr = sp.csr_matrix((A.data, (A.row, A.col)), shape=A.shape)
    pair = adj_pair_from_scipy(csr)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, args.dim)).astype(np.float32))

    f_sh = jax.jit(lambda x: sharded_spmm(sh, x))
    from hypergraph_diffusion_for_recommendation_tpu.ops.sparse import spmm_pair

    f_un = jax.jit(lambda x: spmm_pair(pair.fwd, pair.bwd, x))

    y_sh = np.asarray(f_sh(x))
    y_un = np.asarray(f_un(x))
    y_dense = csr @ np.asarray(x)
    err_sh = np.abs(y_sh - y_dense).max() / max(np.abs(y_dense).max(), 1e-9)
    err_un = np.abs(y_un - y_dense).max() / max(np.abs(y_dense).max(), 1e-9)
    print(f"fwd agreement vs dense: sharded rel {err_sh:.2e}, "
          f"unsharded rel {err_un:.2e}")
    assert err_sh < 5e-2 if _dev.PALLAS_BF16 else err_sh < 1e-4, err_sh

    # VJP agreement
    g_sh = jax.jit(jax.grad(lambda x: sharded_spmm(sh, x).sum()))
    g_un = jax.jit(jax.grad(lambda x: spmm_pair(pair.fwd, pair.bwd, x).sum()))
    gs, gu = np.asarray(g_sh(x)), np.asarray(g_un(x))
    gerr = np.abs(gs - gu).max() / max(np.abs(gu).max(), 1e-9)
    print(f"vjp agreement sharded-vs-unsharded: rel {gerr:.2e}")

    def bench(f, label):
        f(x).block_until_ready()
        t0 = time.time()
        for _ in range(args.iters):
            out = f(x)
        out.block_until_ready()
        ms = (time.time() - t0) / args.iters * 1000
        print(f"{label}: {ms:.2f} ms/spmm")
        return ms

    ms_sh = bench(f_sh, "sharded dedup pack fwd")
    ms_un = bench(f_un, "single-chip pack fwd")
    gsh = bench(g_sh, "sharded dedup pack fwd+bwd")
    gun = bench(g_un, "single-chip pack fwd+bwd")

    # epoch-equivalent: the KHGRec step runs ~12 spmm applications per
    # batch over CF+KG chains (BENCH_NOTES step anatomy); scale by the
    # bench's 11 batches for a steady-epoch-equivalent figure
    spmm_per_epoch = 12 * 11
    print(
        f"epoch-equivalent ({spmm_per_epoch} spmm): "
        f"sharded {gsh * spmm_per_epoch / 1000:.2f}s vs "
        f"single-chip {gun * spmm_per_epoch / 1000:.2f}s "
        f"(overhead {gsh / gun:.2f}x)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
