"""Micro-benchmark: fused Pallas dequant-matmul vs XLA fallback vs dense bf16.

The TPU here is behind an async tunnel: block_until_ready doesn't sync and a
round-trip costs ~30 ms, so we measure the SLOPE between two in-jit loop trip
counts with a scalar D2H fetch as the sync point.

Run: python scripts/bench_kernel.py [M] [K] [N] [bits] [gs]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from autogptq_tpu.ops import packing, quantlinear
from autogptq_tpu.ops.pallas import gemm

M = int(sys.argv[1]) if len(sys.argv) > 1 else 1
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
N = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
bits = int(sys.argv[4]) if len(sys.argv) > 4 else 4
gs = int(sys.argv[5]) if len(sys.argv) > 5 else 128

rng = np.random.default_rng(0)
g = -(-K // (gs if gs != -1 else K))
scales = (rng.random((g, N)) * 0.05 + 0.01).astype(np.float16)
zeros = rng.integers(1, 2**bits, size=(g, N)).astype(np.int64)
g_idx = (np.arange(K) // (gs if gs != -1 else K)).astype(np.int32)
iw = rng.integers(0, 2**bits, size=(K, N)).astype(np.uint32)

packed = quantlinear.PackedQuantLinear(
    qweight=jnp.asarray(packing.pack_qweight(iw, bits)),
    qzeros=jnp.asarray(packing.pack_qzeros(zeros, bits)),
    scales=jnp.asarray(scales),
    g_idx=jnp.asarray(g_idx),
    bias=None,
    bits=bits,
    group_size=gs,
    in_features=K,
    out_features=N,
)
w_ref = packing.dequantize(np.asarray(packed.qweight), np.asarray(packed.qzeros), scales, g_idx, bits)
ql = quantlinear.from_packed(packed)

x = rng.standard_normal((M, K)).astype(np.float32)
xb = jnp.asarray(x, dtype=jnp.bfloat16)
w_dense = jnp.asarray(w_ref, dtype=jnp.bfloat16)

print("devices:", jax.devices(), "backend:", jax.default_backend(), flush=True)

f_pallas = lambda x: gemm.matmul_pallas(x, ql)
f_xla = lambda x: quantlinear.matmul_xla(x, ql)
f_dense = lambda x: (x @ w_dense).astype(jnp.bfloat16)

# correctness
y_ref = x @ w_ref
for name, f in [("pallas", f_pallas), ("xla", f_xla)]:
    y = np.asarray(jax.jit(f)(xb), dtype=np.float32)
    rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    print(f"{name}: max rel err vs fp32 golden = {rel:.4e}", flush=True)


def make_looped(f):
    @partial(jax.jit, static_argnames=("n",))
    def run(x, n):
        def body(i, x):
            y = f(x)
            # un-foldable dependency: y feeds a condition on x
            return jnp.where(y[0, 0] > 1e30, x + 1, x)

        return jax.lax.fori_loop(0, n, body, x)[0, 0]

    return run


def slope_time(f, x, n1=10, n2=110, reps=4):
    run = make_looped(f)
    float(np.asarray(run(x, n1)))
    float(np.asarray(run(x, n2)))
    t1 = min(
        (lambda: (lambda t0: (float(np.asarray(run(x, n1))), time.perf_counter() - t0)[1])(time.perf_counter()))()
        for _ in range(reps)
    )
    t2 = min(
        (lambda: (lambda t0: (float(np.asarray(run(x, n2))), time.perf_counter() - t0)[1])(time.perf_counter()))()
        for _ in range(reps)
    )
    return (t2 - t1) / (n2 - n1)


for name, f, wbits in [("pallas", f_pallas, bits), ("xla_fallback", f_xla, bits), ("dense_bf16", f_dense, 16)]:
    t = slope_time(f, xb)
    gbps = (K * N * wbits / 8) / t / 1e9
    print(
        f"{name:14s} {t*1e6:9.1f} us   weightBW {gbps:7.1f} GB/s   {2*M*K*N/t/1e12:6.2f} TFLOP/s",
        flush=True,
    )
