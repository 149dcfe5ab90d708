"""Compile-time cost analysis + trace helpers.

The reference's only FLOPs accounting is a hand-rolled estimator on one
MLP class (model/layers/MLP.py:119-134) and its only tracing a
commented-out torch.profiler block (HGNN_HD3.py:128-136). Here both are
first-class: `cost_analysis` reads XLA's own per-executable statistics
for ANY jittable function (flops, bytes accessed, peak memory), and
`Trainer.profile_epoch` (train/trainer.py) captures an xplane trace.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping


def cost_analysis(fn: Callable, *args: Any, **kwargs: Any) -> Mapping[str, float]:
    """XLA cost analysis of `fn(*args, **kwargs)` after compilation.

    Returns the backend's statistics dict — keys include `flops`,
    `bytes accessed`, `utilization operand N {}`, and on TPU backends
    per-memory-space traffic. Works with concrete arrays or
    jax.ShapeDtypeStruct placeholders (no data needed).
    """
    import jax

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    stats = compiled.cost_analysis()
    # older jaxlibs return a list with one entry per computation
    if isinstance(stats, (list, tuple)):
        stats = stats[0] if stats else {}
    return dict(stats or {})


def flops_estimate(fn: Callable, *args: Any, **kwargs: Any) -> float:
    """Total compiled FLOPs of one call of `fn` (0.0 if the backend
    does not report them)."""
    return float(cost_analysis(fn, *args, **kwargs).get("flops", 0.0))
