"""Staged composition bisect for the HGNN_HD3 TPU worker fault.

The standalone kernel harness (bisect_pallas.py) passes at 1.9M nnz, but
the full HGNN_HD3 epoch at ML-1M scale (adj nnz 1.58M) crashes the TPU
worker. This script rebuilds the EXACT scale_check data and runs the
model's op compositions stage by stage — the first stage that kills the
worker identifies the faulting composition. Run under `timeout`; a
crash aborts the process, so the last "OK" line is the bisect answer.

  HGDR_PALLAS_MAX_NNZ=4000000 timeout 1800 python scripts/bisect_hd3_stages.py [--start N]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=0, help="first stage to run")
    ap.add_argument("--stop", type=int, default=99)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import hypergraph_diffusion_for_recommendation_tpu.data.device as devmod
    from hypergraph_diffusion_for_recommendation_tpu.core import make_config
    from hypergraph_diffusion_for_recommendation_tpu.data import (
        build_cf_device_data,
        build_interaction,
        synthetic_dataset,
    )
    from hypergraph_diffusion_for_recommendation_tpu.models import build_model
    from hypergraph_diffusion_for_recommendation_tpu.ops.sparse import two_hop

    print(f"guard=[{devmod.PALLAS_MIN_NNZ},{devmod.PALLAS_MAX_NNZ}] "
          f"backend={jax.default_backend()}", flush=True)

    train, test, _ = synthetic_dataset(
        n_users=6040, n_items=3706, n_clusters=64, mean_degree=147.0, seed=7
    )
    inter = build_interaction(train, test)
    cf = build_cf_device_data(inter, eval_user_multiple=512)
    print(f"adj nnz={cf.adj.fwd.nnz} blocked={cf.adj.fwd.blocked is not None} "
          f"b_hyper nnz={cf.b_hyper.fwd.nnz} blocked={cf.b_hyper.fwd.blocked is not None}",
          flush=True)

    d = 64
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (cf.n_nodes, d))
    xu = x[: cf.n_users]
    xi = x[cf.n_users :]

    def stage(i, name, fn):
        if not (args.start <= i <= args.stop):
            return
        print(f"STAGE {i} START: {name}", flush=True)
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        print(f"STAGE {i} OK ({time.time()-t0:.1f}s)", flush=True)

    # --- A: single two_hop grad on the real adj --------------------------
    g_a = jax.jit(jax.grad(lambda xx: jnp.sum(two_hop(cf.adj.fwd, cf.adj.bwd, xx) ** 2)))
    stage(0, "two_hop(adj) grad", lambda: g_a(x))

    # --- B: dropped adj + two_hop grad (the in-model dropout path) -------
    def b_loss(xx, k):
        a = cf.adj.dropped(k, 0.5)
        return jnp.sum(two_hop(a.fwd, a.bwd, xx) ** 2)

    g_b = jax.jit(jax.grad(b_loss))
    stage(1, "dropped(adj) two_hop grad", lambda: g_b(x, jax.random.PRNGKey(1)))

    # --- C: HWNN theta chains on b_hyper (both sides, 16 rect spmms) -----
    def c_loss(xu_, xi_):
        tu = xu_
        for _ in range(4):
            tu = two_hop(cf.b_hyper.fwd, cf.b_hyper.bwd, tu)
        ti = xi_
        for _ in range(4):
            ti = two_hop(cf.b_hyper.bwd, cf.b_hyper.fwd, ti)
        return jnp.sum(tu ** 2) + jnp.sum(ti ** 2)

    g_c = jax.jit(jax.grad(c_loss, argnums=(0, 1)))
    stage(2, "HWNN-style theta chains on b_hyper grad", lambda: g_c(xu, xi))

    # --- D: adj + b_hyper mixed in one program ---------------------------
    def d_loss(xx, k):
        a = cf.adj.dropped(k, 0.5)
        y = two_hop(a.fwd, a.bwd, xx)
        tu = two_hop(cf.b_hyper.fwd, cf.b_hyper.bwd, y[: cf.n_users])
        ti = two_hop(cf.b_hyper.bwd, cf.b_hyper.fwd, y[cf.n_users :])
        return jnp.sum(tu ** 2) + jnp.sum(ti ** 2)

    g_d = jax.jit(jax.grad(d_loss))
    stage(3, "mixed adj+b_hyper grad", lambda: g_d(x, jax.random.PRNGKey(2)))

    # --- E: one full HGNN_HD3 batch_loss grad (no scan) -------------------
    cfg = make_config(
        "HGNN_HD3", batch_size=2048, hyper_dim=d, item_ranking=(10, 20, 40),
        eval_user_batch=512, max_epoch=2, early_stopping_steps=3,
    )
    bundle = build_model(cfg, cf, None)
    params, extras = bundle.init(jax.random.PRNGKey(3))
    users = jnp.arange(2048, dtype=jnp.int32) % cf.n_users
    pos = jnp.arange(2048, dtype=jnp.int32) % cf.n_items
    neg = (jnp.arange(2048, dtype=jnp.int32) * 3) % cf.n_items

    g_e = jax.jit(
        lambda pp, k: jax.grad(lambda q: bundle.batch_loss(q, extras, (users, pos, neg), k)[0])(pp)
    )
    stage(4, "full HGNN_HD3 batch_loss grad (1 step)", lambda: g_e(params, jax.random.PRNGKey(4)))

    # --- F: N steps under lax.scan (run-length probe) ---------------------
    def f_step(pp, k):
        g = jax.grad(lambda q: bundle.batch_loss(q, extras, (users, pos, neg), k)[0])(pp)
        return jax.tree.map(lambda a, b: a - 1e-4 * b, pp, g), 0.0

    def f_scan_n(n):
        @jax.jit
        def f_scan(pp, k0):
            ks = jax.random.split(k0, n)
            return jax.lax.scan(f_step, pp, ks)[0]

        return lambda: f_scan(params, jax.random.PRNGKey(5))

    stage(5, "20-step lax.scan of batch_loss grad", f_scan_n(20))
    stage(7, "100-step lax.scan (SGD, fixed batch)", f_scan_n(100))
    stage(8, "386-step lax.scan (SGD, fixed batch)", f_scan_n(386))

    # --- I: epoch sampling + 386-step scan (still SGD) ---------------------
    def i_run(k0):
        from hypergraph_diffusion_for_recommendation_tpu.ops.sampling import (
            epoch_pairwise_batches,
        )

        k_cf, k_s = jax.random.split(k0)
        us, ps, ns = epoch_pairwise_batches(
            k_cf, cf.edge_u, cf.edge_i, cf.rated_csr, cf.n_items, 2048
        )

        def step2(pp, xs):
            u, p_, n_, k = xs
            g = jax.grad(lambda q: bundle.batch_loss(q, extras, (u, p_, n_), k)[0])(pp)
            return jax.tree.map(lambda a, b: a - 1e-4 * b, pp, g), 0.0

        ks = jax.random.split(k_s, us.shape[0])
        return jax.lax.scan(step2, params, (us, ps, ns, ks))[0]

    stage(9, "sampled epoch + 386-step scan (SGD)", lambda: jax.jit(i_run)(jax.random.PRNGKey(6)))

    # --- G: the real trainer epoch (386 steps, known to crash) -----------
    def g_run():
        from hypergraph_diffusion_for_recommendation_tpu.train import Trainer

        tr = Trainer(bundle)
        loss, _ = tr.run_epoch(0)
        return jax.tree.leaves(tr.params)[0]

    stage(6, "full Trainer epoch (386 steps)", g_run)

    print("ALL STAGES PASSED", flush=True)


if __name__ == "__main__":
    main()
