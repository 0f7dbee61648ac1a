"""W4A8 prefill probe: int8 x int8 -> int32 MXU dots vs the bf16 prefill
regime (v5e int8 peak is 2x bf16). Measures the CEILING before building the
full path: per-row-quantized activations against int4-decoded-to-int8
weights with the exact per-group correction

    y = xs_row * s_g * (xq . vq  -  z_g * sum(xq))

Run: python scripts/kernel_w4a8_probe.py [M] [K] [N] [gs]
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

M = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
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

x = (rng.standard_normal((M, K)) * 0.5).astype(np.float32)
y_ref = x @ w_ref


def _kernel_w4a8(xe_ref, xo_ref, xs_ref, wp_ref, s_ref, z_ref, out_ref, *, rows_per_blk, gs):
    """xe/xo int8 [BM, BK/2] (even/odd K columns, de-interleaved host-side —
    Mosaic rejects stride-2 lane slices); per-row scale xs [BM, 1]; wp kpair
    nibbles. Nibbles decode to int8 via mask/shift + i32->i8 cast; lo rows
    pair with even x, hi rows with odd x."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xe = xe_ref[...]
    xo = xo_ref[...]
    t = wp_ref[...].astype(jnp.int32)
    lo = (t & 15).astype(jnp.int8)
    hi = ((t >> 4) & 15).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xe, lo, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ) + jax.lax.dot_general(
        xo, hi, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # single-group correction per block (probe uses gs == bk)
    xsum = (jnp.sum(xe.astype(jnp.int32), axis=1, keepdims=True)
            + jnp.sum(xo.astype(jnp.int32), axis=1, keepdims=True))
    s = s_ref[0, 0, :]
    z = z_ref[0, 0, :].astype(jnp.int32)
    corr = (acc - xsum * z[None, :]).astype(jnp.float32)
    out_ref[...] += corr * (xs_ref[...] * s[None, :])


def matmul_w4a8(x2d, ql, bn=512):
    m, k = x2d.shape
    gs = ql.group_size
    bk = gs  # one group per K block for the probe
    # per-row activation quantization (outside the kernel; fused by XLA)
    xs = jnp.max(jnp.abs(x2d), axis=1, keepdims=True) / 127.0
    xq = jnp.clip(jnp.round(x2d / xs), -127, 127).astype(jnp.int8)
    xe, xo = xq[:, 0::2], xq[:, 1::2]
    bm = min(512, m)
    grid = (m // bm, ql.n_pad // bn, k // bk)
    kernel = partial(_kernel_w4a8, rows_per_blk=1, gs=gs)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk // 2), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk // 2), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda mi, j, ki: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda mi, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, j, ki: (mi, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, ql.n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * ql.n_pad,
            bytes_accessed=ql.wp.size + m * k + m * ql.n_pad * 4,
            transcendentals=0),
    )(xe, xo, xs.astype(jnp.float32), ql.wp, ql.scales, ql.zeros)




xb = jnp.asarray(x)
print("devices:", jax.devices(), flush=True)
for name, f in [
    ("w4a8_int8dot", lambda xx: matmul_w4a8(xx, ql)[:, :N]),
    ("kpair_bf16", lambda xx: gemm.matmul_pallas(xx.astype(jnp.bfloat16), ql)),
]:
    y = np.asarray(jax.jit(f)(xb), dtype=np.float32)
    rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    t = slope_time(f, xb, n1=5, n2=105)
    print(f"{name:14s} relerr={rel:.3e}  {t*1e6:9.1f} us   "
          f"{2*M*K*N/t/1e12:6.2f} TFLOP/s", flush=True)
