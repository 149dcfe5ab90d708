"""Microbench: can an in-kernel VMEM gather beat the XLA row gather?

The segment-SpMM is gather-bound (BENCH_NOTES: XLA row gathers run at
~228M rows/s regardless of d). The feature table X at bench shapes
(~19.7k x 128) fits in VMEM in bf16 (5 MB) and f32 (10 MB), so a kernel
that keeps X resident and gathers rows in-register could remove both
the row-rate bound and the materialised [nnz, d] HBM round-trip.

Probes (all at bench shapes: N=19712 rows, d=128, nnz=262144):
  1. XLA row gather x[cols]                      (the current floor)
  2. XLA gather + multiply + segment_sum         (current XLA spmm path)
  3. pallas: X resident in VMEM, out = x[idx] per edge block
  4. pallas fused spmm: in-VMEM gather + onehot MXU contraction
  5. current pallas blocked_spmm (XLA gather outside)

Run: timeout 900 python scripts/bench_gather_fusion.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    run(x).block_until_ready()
    return (time.time() - t0) / iters * 1e3


N, D, NNZ = 19712, 128, 262144
EB = 1024  # edge block


def main():
    print(f"devices: {jax.devices()}  N={N} d={D} nnz={NNZ}", flush=True)
    rng = np.random.default_rng(0)
    cols_np = rng.integers(0, N, NNZ).astype(np.int32)
    rows_np = np.sort(rng.integers(0, N, NNZ)).astype(np.int32)
    x0 = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    cols = jnp.asarray(cols_np)
    rows = jnp.asarray(rows_np)
    vals = jnp.ones((NNZ,), jnp.float32)

    # 1. XLA row gather
    f1 = lambda x: x[cols]
    print(f"1. XLA row gather:            {timeit_chained(f1, x0):8.3f} ms", flush=True)

    f1b = lambda x: x.astype(jnp.bfloat16)[cols]
    print(f"1b. XLA row gather (bf16):    {timeit_chained(f1b, x0):8.3f} ms", flush=True)

    # 2. XLA spmm
    def f2(x):
        g = x[cols] * vals[:, None]
        return jax.ops.segment_sum(g, rows, num_segments=N, indices_are_sorted=True)

    print(f"2. XLA gather+segsum spmm:    {timeit_chained(f2, x0):8.3f} ms", flush=True)

    # 3. pallas in-VMEM gather
    nb = NNZ // EB
    idx2d = jnp.asarray(cols_np.reshape(nb, EB, 1))

    def gather_kernel(idx_ref, x_ref, out_ref):
        idx = idx_ref[0, :, 0]  # [EB]
        out_ref[0] = x_ref[idx]

    @jax.jit
    def f3(x):
        return pl.pallas_call(
            gather_kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, EB, 1), lambda b: (b, 0, 0)),
                pl.BlockSpec((N, D), lambda b: (0, 0)),  # X resident
            ],
            out_specs=pl.BlockSpec((1, EB, D), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nb, EB, D), x.dtype),
        )(idx2d, x)

    try:
        out3 = f3(x0)
        ref = x0[cols].reshape(nb, EB, D)
        err = jnp.max(jnp.abs(out3 - ref))
        print(f"3. pallas VMEM gather:        {timeit_chained(f3, x0):8.3f} ms  (maxerr {err:.2e})", flush=True)
    except Exception as e:
        print(f"3. pallas VMEM gather: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

    # 4. fused spmm: in-VMEM gather + onehot contraction, row windows
    RB = 256
    n_windows = N // RB  # 77 windows at N=19712
    # sort edges by row (already sorted), pack into row-window blocks
    from hypergraph_diffusion_for_recommendation_tpu.ops.pallas.segment_spmm import (
        pack_blocked,
    )

    blocked = pack_blocked(rows_np, cols_np, np.ones(NNZ, np.float32), (N, N))
    nb4 = blocked.n_blocks
    bcols = blocked.cols.reshape(nb4, blocked.eb, 1)
    blrows = blocked.local_rows.reshape(nb4, blocked.eb, 1)
    bvals = blocked.vals.reshape(nb4, blocked.eb, 1)

    def fused_kernel(wmap_ref, cols_ref, lrows_ref, vals_ref, x_ref, out_ref, *, eb, rb):
        b = pl.program_id(0)
        idx = cols_ref[0, :, 0]
        g = x_ref[idx] * vals_ref[0]  # [eb, d]
        lrows = lrows_ref[0]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (eb, rb), 1)
        onehot = (lrows == row_ids).astype(g.dtype)
        partial_out = jax.lax.dot_general(
            onehot, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        is_first = b == 0
        prev_idx = jnp.maximum(b - 1, 0)
        new_window = jnp.logical_or(is_first, wmap_ref[b] != wmap_ref[prev_idx])

        @pl.when(new_window)
        def _():
            out_ref[0] = partial_out

        @pl.when(jnp.logical_not(new_window))
        def _():
            out_ref[0] = out_ref[0] + partial_out

    @partial(jax.jit, static_argnames=("bf16",))
    def f4(x, bf16=False):
        xin = x.astype(jnp.bfloat16) if bf16 else x
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb4,),
            in_specs=[
                pl.BlockSpec((1, blocked.eb, 1), lambda b, wmap: (b, 0, 0)),
                pl.BlockSpec((1, blocked.eb, 1), lambda b, wmap: (b, 0, 0)),
                pl.BlockSpec((1, blocked.eb, 1), lambda b, wmap: (b, 0, 0)),
                pl.BlockSpec((N, D), lambda b, wmap: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, blocked.rb, D), lambda b, wmap: (wmap[b], 0, 0)),
        )
        out = pl.pallas_call(
            partial(fused_kernel, eb=blocked.eb, rb=blocked.rb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((blocked.n_windows, blocked.rb, D), jnp.float32),
        )(blocked.wmap, bcols, blrows, bvals.astype(xin.dtype), xin)
        return out.reshape(-1, D)[:N]

    try:
        out4 = f4(x0)
        ref = f2(x0)
        err = jnp.max(jnp.abs(out4 - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9)
        print(f"4. pallas fused spmm f32:     {timeit_chained(f4, x0):8.3f} ms  (relerr {err:.2e})", flush=True)
        f4b = lambda x: f4(x, bf16=True)
        out4b = f4b(x0)
        errb = jnp.max(jnp.abs(out4b - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9)
        print(f"4b. pallas fused spmm bf16:   {timeit_chained(f4b, x0):8.3f} ms  (relerr {errb:.2e})", flush=True)
    except Exception as e:
        print(f"4. pallas fused spmm: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

    # 5. current kernel (XLA gather outside)
    from hypergraph_diffusion_for_recommendation_tpu.ops.pallas.segment_spmm import (
        _blocked_spmm_fwd_only,
    )

    f5 = lambda x: _blocked_spmm_fwd_only(blocked, x)
    print(f"5. current blocked_spmm f32:  {timeit_chained(f5, x0):8.3f} ms", flush=True)

    import dataclasses

    blocked_bf16 = dataclasses.replace(blocked, bf16=True)
    f5b = lambda x: _blocked_spmm_fwd_only(blocked_bf16, x)
    print(f"5b. current blocked_spmm bf16:{timeit_chained(f5b, x0):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
