"""kb32 probe: block-level quarter-split vs shipped ki32 (same-process).

The shipped ki32 layout quarter-splits each GROUP, so the decode must
re-assemble every group with a 4-part sublane concat (a [gs, BN] VMEM copy
per group — ~2 MB of shuffle traffic per grid step at bk=bn=1024). kb32
quarter-splits the whole K BLOCK instead: masked word m decodes to a
contiguous [bk/4, BN] span of K rows, so each group is a direct static
slice of ONE decoded array — zero copies.

Variants (all 4-bit, M=1 decode regime):
  a) shipped ki32 (gemm._matmul_ki32)
  b) kb32: no concat, per-group dot on direct slices, local accumulate
  c) kb32 with bn in {512, 2048} (re-sweep: VPU load changed)
  d) kb32 "qdot": one dot per QUARTER (bk/4 wide) with the per-group scale
     folded via a per-quarter segmented correction — only when gs == bk/4

    python scripts/kernel_kb32_probe.py [K] [N] [gs]
"""

import sys
from functools import partial

import numpy as np

sys.path.insert(0, ".")

from scripts.bench_util import slope_time  # noqa: E402

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autogptq_tpu.ops import packing, quantlinear
from autogptq_tpu.ops.pallas import gemm

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
GS = int(sys.argv[3]) if len(sys.argv) > 3 else 128
M = 1
S = 1024  # superblock = bk

rng = np.random.default_rng(0)
g = K // GS
scales = (rng.random((g, N)) * 0.02 + 0.005).astype(np.float32)
zeros = rng.integers(1, 16, size=(g, N)).astype(np.int64)
g_idx = (np.arange(K) // GS).astype(np.int32)
iw = rng.integers(0, 16, size=(K, N)).astype(np.uint32)
w_ref = iw.astype(np.float32) * scales[g_idx] - (
    zeros.astype(np.float32) * scales)[g_idx]

packed = quantlinear.PackedQuantLinear(
    qweight=jnp.asarray(packing.pack_qweight(iw, 4)),
    qzeros=jnp.asarray(packing.pack_qzeros(zeros, 4)),
    scales=jnp.asarray(scales.astype(np.float16)),
    g_idx=jnp.asarray(g_idx), bias=None,
    bits=4, group_size=GS, in_features=K, out_features=N,
)
ql = quantlinear.from_packed(packed)
assert ql.layout == "ki32", ql.layout


def pack_kb32(values: np.ndarray, s_blk: int) -> np.ndarray:
    """[K, N] nibbles -> int32 [K/8, N]: per-SUPERBLOCK quarter-split.
    Within each s_blk-row superblock, quarter m = rows [m*s_blk/4,
    (m+1)*s_blk/4); word j packs q_m[2j] at bits 4m and q_m[2j+1] at bits
    16+4m, so masked word m bitcasts to quarter m's rows in K order."""
    k, n = values.shape
    v = values.reshape(k // s_blk, 4, s_blk // 4, n).astype(np.uint32)
    lo, hi = v[:, :, 0::2], v[:, :, 1::2]   # [KB, 4, s_blk/8, N]
    word = np.zeros((k // s_blk, s_blk // 8, n), np.uint32)
    for m in range(4):
        word |= (lo[:, m] << (4 * m)) | (hi[:, m] << (16 + 4 * m))
    return word.reshape(k // 8, n).astype(np.int32)


def _kernel_kb32(x_ref, wp_ref, s_ref, z_ref, out_ref, *, rows_per_blk, gs, bk):
    ki = pl.program_id(2)
    xv = x_ref[...].astype(jnp.bfloat16)
    ws = gemm._ki32_decode_words(wp_ref[...])  # 4 x [bk/4, BN], K-contiguous
    quarter = bk // 4
    gpq = quarter // gs
    total = None
    for r in range(rows_per_blk):
        m, off = r // gpq, (r % gpq) * gs
        wg = ws[m][off:off + gs]
        xr = xv[:, r * gs:(r + 1) * gs]
        acc = jax.lax.dot_general(
            xr, wg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xs = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
        s = s_ref[r, 0, :]
        s128 = s * 128.0
        zadj = s128 + s * z_ref[r, 0, :].astype(jnp.int32).astype(jnp.float32)
        part = acc * s128[None, :] - xs * zadj[None, :]
        total = part if total is None else total + part

    @pl.when(ki == 0)
    def _():
        out_ref[...] = total

    @pl.when(ki != 0)
    def _():
        out_ref[...] += total


def matmul_kb32(x2d, wp32, scales3, sz3, gs, n_pad, bn=1024):
    m, k = x2d.shape
    bk = S
    rows_per_blk = bk // gs
    grid = (1, n_pad // bn, k // bk)
    kernel = partial(_kernel_kb32, rows_per_blk=rows_per_blk, gs=gs, bk=bk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 8, bn), lambda mi, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda mi, j, ki: (mi, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n_pad,
            bytes_accessed=wp32.size * 4 + m * k * 2 + m * n_pad * 4,
            transcendentals=0),
    )(x2d, wp32, scales3, sz3)


wp_kb = jnp.asarray(pack_kb32(iw, S))
s3 = jnp.asarray(scales.reshape(g, 1, N))
z3 = jnp.asarray(zeros.reshape(g, 1, N).astype(np.uint8))

x = rng.standard_normal((M, K)).astype(np.float32)
xb = jnp.asarray(x, dtype=jnp.bfloat16)
y_ref = x @ w_ref

wbytes = K * N // 2


def report(name, fn, xin):
    y = np.asarray(fn(xin))
    rel = np.abs(y[:, :N] - y_ref).max() / np.abs(y_ref).max()
    t = slope_time(fn, xin)
    print(f"{name:28s} {t * 1e6:8.2f} us  {wbytes / t / 1e9:7.1f} GB/s  relerr {rel:.2e}")
    return t


print(f"K={K} N={N} gs={GS} M={M}  weight bytes {wbytes / 1e6:.1f} MB")

t_a = report("a) shipped ki32", lambda xi: gemm.matmul_pallas(xi, ql), xb)
t_b = report("b) kb32 bn=1024",
             lambda xi: matmul_kb32(xi, wp_kb, s3, z3, GS, N, bn=1024), xb)
for bn in (512, 2048):
    report(f"c) kb32 bn={bn}",
           lambda xi, bn=bn: matmul_kb32(xi, wp_kb, s3, z3, GS, N, bn=bn), xb)
print(f"kb32 speedup vs shipped: {t_a / t_b:.3f}x")
