"""kquad decode-kernel variant shootout on the real TPU.

v1: current shipped kernel (two half-width dots per group)
v2: per-group sublane concat -> one full-width dot per group (kpair dot
    structure; tests whether the M=1 slowdown is dot-count-driven)
v3: koct rerun with long loops (the first measurement was noise-dominated)

Loop counts sized so the slope delta is >> tunnel dispatch variance.
    python scripts/kernel_kquad_variants.py [K] [N] [gs]
"""

import sys
import time
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

rng = np.random.default_rng(0)


def build(bits):
    g = K // GS
    scales = (rng.random((g, N)) * 0.02 + 0.005).astype(np.float16)
    zeros = rng.integers(1, 2 ** bits, size=(g, N)).astype(np.int64)
    g_idx = (np.arange(K) // GS).astype(np.int32)
    iw = rng.integers(0, 2 ** bits, size=(K, N)).astype(np.uint32)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, bits)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, bits)),
        scales=jnp.asarray(scales), g_idx=jnp.asarray(g_idx), bias=None,
        bits=bits, group_size=GS, in_features=K, out_features=N,
    )
    ql = quantlinear.from_packed(packed)
    iw_f = iw.astype(np.float32)
    w_ref = iw_f * scales.astype(np.float32)[g_idx] - (
        zeros.astype(np.float32) * scales.astype(np.float32))[g_idx]
    return ql, w_ref


def _kernel_kquad_v2(x_ref, wp_ref, s_ref, z_ref, out_ref, *, rows_per_blk, gs):
    """Per-group concat -> one gs-wide dot per group."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xv = x_ref[...].astype(jnp.bfloat16)
    t = wp_ref[...].astype(jnp.int32)
    w1 = jnp.int32(0x3F803F80) | (t & 3) | (((t >> 2) & 3) << 16)
    w2 = jnp.int32(0x3F803F80) | ((t >> 4) & 3) | (((t >> 6) & 3) << 16)
    wb1 = pltpu.bitcast(w1, jnp.bfloat16)
    wb2 = pltpu.bitcast(w2, jnp.bfloat16)
    half = gs // 2
    for r in range(rows_per_blk):
        rows = slice(r * half, (r + 1) * half)
        wg = jnp.concatenate([wb1[rows], wb2[rows]], axis=0)  # [gs, BN]
        xr = xv[:, r * gs:(r + 1) * gs]
        acc = jax.lax.dot_general(
            xr, wg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xs = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
        s = s_ref[r, 0, :]
        s128 = s * 128.0
        zadj = s128 + s * z_ref[r, 0, :].astype(jnp.int32).astype(jnp.float32)
        out_ref[...] += acc * s128[None, :] - xs * zadj[None, :]


def matmul_v2(x2d, ql, bn=1024):
    m, k = x2d.shape
    gs = ql.group_size
    bk = gemm._pick_bk(k, gs, kquad=True)
    rows_per_blk = bk // gs
    grid = (1, -(-ql.n_pad // bn), k // bk)
    kernel = partial(_kernel_kquad_v2, rows_per_blk=rows_per_blk, gs=gs)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 4, bn), lambda mi, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda mi, j, ki: (mi, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, ql.n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * ql.n_pad,
            bytes_accessed=ql.wp.size + m * k * 2 + m * ql.n_pad * 4,
            transcendentals=0),
    )(x2d, ql.wp, ql.scales, ql.zeros)




x = rng.standard_normal((M, K)).astype(np.float32)
xb = jnp.asarray(x, dtype=jnp.bfloat16)
print("devices:", jax.devices(), flush=True)

ql2, w2_ref = build(2)
ql8, w8_ref = build(8)
ql4, w4_ref = build(4)

cases = [
    ("kquad_v1_2dots", lambda xx: gemm.matmul_pallas(xx, ql2), w2_ref, 2),
    ("kquad_v2_concat", lambda xx: matmul_v2(xx, ql2)[:, :N], w2_ref, 2),
    ("koct_8bit", lambda xx: gemm.matmul_pallas(xx, ql8), w8_ref, 8),
    ("kpair_4bit_ref", lambda xx: gemm.matmul_pallas(xx, ql4), w4_ref, 4),
]

for name, f, w_ref, bits in cases:
    y_ref = x @ w_ref
    y = np.asarray(jax.jit(f)(xb), dtype=np.float32)
    rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    t = slope_time(f, xb)
    gbps = (K * N * bits / 8) / t / 1e9
    print(f"{name:18s} relerr={rel:.3e}  {t*1e6:8.2f} us  "
          f"weightBW {gbps:7.1f} GB/s", flush=True)
