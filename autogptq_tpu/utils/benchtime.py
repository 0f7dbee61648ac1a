"""Slope-timing harness for kernel measurements (shared by the shape
autotuner and the ``scripts/`` benches).

The TPU sits behind an async tunnel: ``block_until_ready`` does not sync and
a synced dispatch costs ~30 ms, so kernels are timed by the SLOPE between
two in-jit loop trip counts with a scalar D2H fetch as the sync point. Use
LONG loops (default n2=2050) for ~20 µs kernels — short loops are dominated
by dispatch variance (a round-1 measurement with n2=110 swung ±2x and once
went negative). Only same-process comparisons are meaningful.

The reference's timing analog is the Triton autotuner's do_bench calls
(nn_modules/triton_utils/custom_autotune.py:60-78); CUDA events have no
equivalent through the tunnel, hence the loop-slope design.
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def make_looped(f):
    """Wrap single-call ``f(x, *args)`` in a jitted n-trip loop whose result
    depends on every iteration (the ``y[0, 0] > 1e30`` condition is never
    true but XLA cannot fold it, so no iteration is dead-code-eliminated)."""

    @partial(jax.jit, static_argnames=("n",))
    def run(x, n, *args):
        def body(i, x):
            y = f(x, *args)
            # un-foldable dependency: y feeds a condition on x
            return jnp.where(y[0, 0] > 1e30, x + 1, x)

        return jax.lax.fori_loop(0, n, body, x)[0, 0]

    return run


def slope_time(f, x, n1=50, n2=2050, reps=5, args=()):
    """Time one call of ``f(x, *args)`` by loop-count slope.

    Pass big pytrees (model params, KV pools) through ``args`` — closing
    over them bakes multi-GB constants into the lowered HLO and can stall
    remote compilation for minutes.
    """
    run = make_looped(f)
    float(np.asarray(run(x, n1, *args)))   # compile both trip counts
    float(np.asarray(run(x, n2, *args)))

    def once(n):
        t0 = time.perf_counter()
        float(np.asarray(run(x, n, *args)))
        return time.perf_counter() - t0

    t1 = min(once(n1) for _ in range(reps))
    t2 = min(once(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)
