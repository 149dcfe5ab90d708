"""Component-level timing of the KHGRec bench step (roadmap item 3).

Builds the exact bench.py workload, then times each step component as a
separately-jitted function at the true shapes:
  * cf encoder forward (2 layers of hgcn_conv over the bipartite adj)
  * kg encoder forward (per layer: att_matvec_t + 4 spmm + att_matvec)
  * TransR projections + loss
  * attention_values + segment softmax refresh
  * SSL contrast terms
  * full batch_loss fwd, and value_and_grad (the real per-step cost)
Prints one line per component: name, ms/call. Run on the TPU when idle:
  timeout 900 python scripts/profile_khgrec.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def timeit(fn, *args, iters=20, warmup=3):
    """Wall-clock per call (includes ~0.5 ms axon dispatch — fine for
    >10 ms composites)."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def timeit_chained(fn, x, iters=50):
    """Device time per call: `iters` dependency-chained invocations inside
    ONE jitted scan, so the remote-dispatch floor is amortised away.
    `fn` must map one float array to array(s) of any shape."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x0):
        def body(c, _):
            y = fn(c)
            eps = sum(
                jnp.sum(l).astype(jnp.float32)
                for l in jax.tree.leaves(y)
                if jnp.issubdtype(l.dtype, jnp.floating)
            )
            return c + eps * 1e-30, 0.0

        return jax.lax.scan(body, x0, None, length=iters)[0]

    run(x).block_until_ready()
    t0 = time.time()
    run(x).block_until_ready()
    return (time.time() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

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
    from hypergraph_diffusion_for_recommendation_tpu.models import build_model
    from hypergraph_diffusion_for_recommendation_tpu.models.kg_common import (
        att_matvec,
        att_matvec_t,
        attention_softmax,
        attention_values,
        project_by_relation,
    )
    from hypergraph_diffusion_for_recommendation_tpu.ops.sparse import spmm_pair, two_hop

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=1890)
    ap.add_argument("--items", type=int, default=17632)
    ap.add_argument("--degree", type=float, default=49.0)
    cli = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    train, test, kg_df = synthetic_dataset(
        n_users=cli.users, n_items=cli.items, mean_degree=cli.degree, seed=7,
        with_kg=True,
    )
    inter = build_interaction(train, test)
    kg = build_knowledge(kg_df, inter)
    cf_dev = build_cf_device_data(inter, eval_user_multiple=512)
    kg_dev = build_kg_device_data(kg)
    print(
        f"adj nnz={cf_dev.adj.fwd.nnz} kg_adj nnz={kg_dev.kg_adj.fwd.nnz} "
        f"entities={kg_dev.n_entities} relations={kg_dev.n_relations}",
        flush=True,
    )

    cfg = make_config(
        "KHGRec", batch_size=2048, batch_size_kg=8192, hyper_dim=128,
        relation_dim=32, item_ranking=(10, 20, 40), eval_user_batch=512,
        max_epoch=4, early_stopping_steps=100, lrate=0.001, temp=1.0,
        cl_rate=0.01, drop_rate=0.2, mode="full",
    )
    bundle = build_model(cfg, cf_dev, kg_dev)
    params, extras = bundle.init(jax.random.PRNGKey(0))

    d = cfg.hyper_dim
    n_nodes = cf_dev.n_nodes
    n_ent = kg_dev.n_entities
    key = jax.random.PRNGKey(1)
    x_nodes = jax.random.normal(key, (n_nodes, d))
    x_ent = jax.random.normal(key, (n_ent, d))
    B = cfg.batch_size_kg
    h = jnp.arange(B, dtype=jnp.int32) % n_ent
    t = (jnp.arange(B, dtype=jnp.int32) * 7) % n_ent
    r = jnp.arange(B, dtype=jnp.int32) % kg_dev.n_relations
    vals = jnp.ones((B,), jnp.float32)
    p = params["params"]

    # --- primitive blocks -------------------------------------------------
    f_cf_twohop = lambda x: two_hop(cf_dev.adj.fwd, cf_dev.adj.bwd, x)
    print(f"cf two_hop (1 conv): {timeit_chained(f_cf_twohop, x_nodes):8.3f} ms", flush=True)

    f_kg_spmm = lambda x: spmm_pair(kg_dev.kg_adj.fwd, kg_dev.kg_adj.bwd, x)
    print(f"kg spmm_pair (2 spmm): {timeit_chained(f_kg_spmm, x_ent):8.3f} ms", flush=True)

    def kg_layer(x):
        y = att_matvec_t(h, t, vals, x, n_ent)
        y = spmm_pair(kg_dev.kg_adj.bwd, kg_dev.kg_adj.fwd, y)
        y = spmm_pair(kg_dev.kg_adj.fwd, kg_dev.kg_adj.bwd, y)
        return att_matvec(h, t, vals, y, n_ent)

    print(f"kg att_conv layer (4 spmm + 2 att): {timeit_chained(kg_layer, x_ent):8.3f} ms", flush=True)

    f_proj = lambda e: project_by_relation(e[h], p["trans_M"], r)
    print(f"project_by_relation (1x): {timeit_chained(f_proj, x_ent):8.3f} ms", flush=True)

    f_attv = lambda e: attention_softmax(
        attention_values(e, p["relation_emb"], p["trans_M"], h, t, r), h, n_ent
    )
    print(f"attention values+softmax: {timeit_chained(f_attv, x_ent):8.3f} ms", flush=True)

    # --- encoder-level ------------------------------------------------------
    from hypergraph_diffusion_for_recommendation_tpu.models.khgrec import KHGRecModule

    module = KHGRecModule(
        kg_dev.n_entities, kg_dev.n_relations, cf_dev.n_users,
        cfg.hyper_dim, cfg.relation_dim, cfg.n_layers, cfg.p,
    )
    att0 = (extras["att_h"], extras["att_t"], extras["att_v"])
    ek = jax.random.PRNGKey(9)

    def _perturbed(e):
        # thread the scan carry INTO the computation (same shape as the
        # entity table) so loop-invariant code motion cannot hoist it
        inner = dict(params["params"])
        inner["user_entity_emb"] = inner["user_entity_emb"] + e * 1e-30
        return {"params": inner}

    def cf_fwd(e):
        return module.apply(
            _perturbed(e), cf_dev, kg_dev, 0.8, True,
            method=KHGRecModule.cf_forward, rngs={"edges": ek, "dropout": ek},
        )

    print(f"cf_forward (train): {timeit_chained(cf_fwd, x_ent):8.3f} ms", flush=True)

    def kg_fwd(e):
        return module.apply(
            _perturbed(e), kg_dev, att0, 0.8, True,
            method=KHGRecModule.kg_forward, rngs={"edges": ek, "dropout": ek},
        )

    print(f"kg_forward (train): {timeit_chained(kg_fwd, x_ent):8.3f} ms", flush=True)

    def full_fwd(e):
        return module.apply(
            _perturbed(e), cf_dev, kg_dev, att0, 0.8, True, True,
            rngs={"edges": ek, "dropout": ek},
        )

    print(f"module full forward (train): {timeit_chained(full_fwd, x_ent):8.3f} ms", flush=True)

    # --- full loss fwd and grad -------------------------------------------
    users = jnp.arange(cfg.batch_size, dtype=jnp.int32) % cf_dev.n_users
    pos = jnp.arange(cfg.batch_size, dtype=jnp.int32) % cf_dev.n_items
    neg = (jnp.arange(cfg.batch_size, dtype=jnp.int32) * 3) % cf_dev.n_items
    batch = (users, pos, neg, h, r, t, (t + 1) % n_ent)
    rng = jax.random.PRNGKey(2)

    f_loss = jax.jit(lambda pp, ex: bundle.batch_loss(pp, ex, batch, rng)[0])
    print(f"batch_loss forward: {timeit(f_loss, params, extras):8.3f} ms", flush=True)

    # NOTE: must RETURN the gradient tree or XLA dead-code-eliminates the
    # whole backward pass and this measures the forward only
    f_grad = jax.jit(
        lambda pp, ex: jax.grad(lambda q: bundle.batch_loss(q, ex, batch, rng)[0])(pp)
    )
    print(f"batch_loss grad: {timeit(f_grad, params, extras):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
