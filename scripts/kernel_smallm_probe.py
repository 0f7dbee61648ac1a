"""Small-M decode regime probe: M in {2, 4, 8} hits the Mosaic pathology
where bf16 x blocks with sublane dim < 16 run ~20x slow (see
memory/tpu-kernel-findings). Candidates:

  a) shipped path (bm = max(8, m))
  b) x zero-padded to M=16 rows, bm=16 (wasted dot rows are free at decode)
  c) x kept f32 (f32 sublane tile is 8, no pathology) — dot_dtype f32

    python scripts/kernel_smallm_probe.py [M] [K] [N] [gs]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from scripts.bench_util import slope_time  # noqa: E402

import jax
import jax.numpy as jnp

from autogptq_tpu.ops import packing, quantlinear
from autogptq_tpu.ops.pallas import gemm

M = int(sys.argv[1]) if len(sys.argv) > 1 else 4
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
N = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
GS = int(sys.argv[4]) if len(sys.argv) > 4 else 128

rng = np.random.default_rng(0)
g = K // GS
scales = (rng.random((g, N)) * 0.02 + 0.005).astype(np.float16)
zeros = rng.integers(1, 16, size=(g, N)).astype(np.int64)
g_idx = (np.arange(K) // GS).astype(np.int32)
iw = rng.integers(0, 16, size=(K, N)).astype(np.uint32)
packed = quantlinear.PackedQuantLinear(
    qweight=jnp.asarray(packing.pack_qweight(iw, 4)),
    qzeros=jnp.asarray(packing.pack_qzeros(zeros, 4)),
    scales=jnp.asarray(scales), g_idx=jnp.asarray(g_idx), bias=None,
    bits=4, group_size=GS, in_features=K, out_features=N,
)
ql = quantlinear.from_packed(packed)
w_ref = iw.astype(np.float32) * scales.astype(np.float32)[g_idx] - (
    zeros.astype(np.float32) * scales.astype(np.float32))[g_idx]

x = rng.standard_normal((M, K)).astype(np.float32)
xb = jnp.asarray(x, jnp.bfloat16)
xf = jnp.asarray(x, jnp.float32)
y_ref = np.asarray(xb, np.float32) @ w_ref
wbytes = K * N // 2


def pad16(xi):
    return gemm.matmul_pallas(
        jnp.pad(xi, ((0, 16 - M), (0, 0))), ql, bm=16)[:M]


def report(name, fn, xin):
    y = np.asarray(fn(xin))[:, :N]
    rel = np.abs(y - y_ref).max() / np.abs(y_ref).max()
    t = slope_time(fn, xin)
    print(f"{name:32s} {t * 1e6:8.2f} us  {wbytes / t / 1e9:7.1f} GB/s  relerr {rel:.2e}")


print(f"M={M} K={K} N={N} gs={GS}")
report("a) shipped bm=max(8,M) bf16", lambda xi: gemm.matmul_pallas(xi, ql), xb)
report("b) pad to 16 rows, bm=16", pad16, xb)
report("c) f32 x, bm=8", lambda xi: gemm.matmul_pallas(xi, ql, dot_dtype=jnp.float32), xf)
