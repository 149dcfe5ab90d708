"""Microbench: att_matvec / segment_softmax scatter costs, sorted vs not.

KHGRec's KG layer spends ~1.1 ms per layer on 8192-edge att ops
(profile_khgrec.py). These are unsorted segment_sum scatters; this
harness measures the sorted-segment alternative (the kg batch can be
emitted pre-sorted by head: the losses and the attention refresh are
order-invariant reductions).

Run: timeout 600 python scripts/bench_att_ops.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit_chained(fn, x, iters=50):
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
    for _ in range(3):
        run(x).block_until_ready()
    return (time.time() - t0) / (3 * iters) * 1e3


def main():
    N, D, B = 19664, 128, 8192
    print(f"devices: {jax.devices()}  N={N} d={D} B={B}", flush=True)
    rng = np.random.default_rng(0)
    h_np = rng.integers(0, N, B).astype(np.int32)
    t_np = rng.integers(0, N, B).astype(np.int32)
    h = jnp.asarray(h_np)
    t = jnp.asarray(t_np)
    hs = jnp.asarray(np.sort(h_np))
    vals = jnp.ones((B,), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    # gather side alone
    f_g = lambda x: x[t]
    print(f"gather x[t] (8k rows):          {timeit_chained(f_g, x0):8.3f} ms", flush=True)

    # unsorted scatter (current att_matvec)
    def f_un(x):
        g = x[t] * vals[:, None]
        return jax.ops.segment_sum(g, h, num_segments=N)

    print(f"att_matvec unsorted:            {timeit_chained(f_un, x0):8.3f} ms", flush=True)

    # sorted scatter
    def f_s(x):
        g = x[t] * vals[:, None]
        return jax.ops.segment_sum(g, hs, num_segments=N, indices_are_sorted=True)

    print(f"att_matvec sorted-h:            {timeit_chained(f_s, x0):8.3f} ms", flush=True)

    # on-device sort cost (argsort + 4-array reorder)
    def f_sort(x):
        order = jnp.argsort(h)
        return h[order], t[order], vals[order], x[:1] * 0

    print(f"argsort+reorder (3 arrays):     {timeit_chained(f_sort, x0):8.3f} ms", flush=True)

    # segment softmax unsorted vs sorted
    from hypergraph_diffusion_for_recommendation_tpu.ops.sparse import segment_softmax

    sc = jnp.asarray(rng.standard_normal(B), jnp.float32)
    f_sm_u = lambda x: segment_softmax(sc + x[0, 0] * 1e-30, h, N)
    print(f"segment_softmax unsorted:       {timeit_chained(f_sm_u, x0):8.3f} ms", flush=True)

    def seg_softmax_sorted(scores, ids, n):
        mx = jax.ops.segment_max(scores, ids, num_segments=n, indices_are_sorted=True)
        mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
        e = jnp.exp(scores - mx[jnp.clip(ids, 0, n - 1)])
        s = jax.ops.segment_sum(e, ids, num_segments=n, indices_are_sorted=True)
        return e / jnp.maximum(s[jnp.clip(ids, 0, n - 1)], 1e-12)

    f_sm_s = lambda x: seg_softmax_sorted(sc + x[0, 0] * 1e-30, hs, N)
    print(f"segment_softmax sorted:         {timeit_chained(f_sm_s, x0):8.3f} ms", flush=True)

    # scalar scatter of batch vals into a packed [262k] array
    slots = jnp.asarray(rng.permutation(262144)[:B].astype(np.int32))

    def f_scat(x):
        return jnp.zeros((262144,), jnp.float32).at[slots].add(sc + x[0, 0] * 1e-30)

    print(f"scalar scatter 8k -> 262k:      {timeit_chained(f_scat, x0):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
