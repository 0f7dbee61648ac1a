"""4-bit decode variants probe (same-process comparison on the real TPU):

a) shipped kpair decode (factored per-group, u8 loads)
b) kpair PREFILL regime forced at M=1 (dequant whole tile + one dot) —
   tests whether the factored-decode complexity still pays
c) i32-quad: wp stored as int32 (4 bytes = 8 nibbles per lane); FOUR masked
   words + bitcasts decode 8 codes with ~11 int ops (vs 20 for u8 kpair),
   per-group 4-part sublane concat + one dot

    python scripts/kernel_i32quad_probe.py [K] [N] [gs]
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


def pack_i32quad(values: np.ndarray, gs: int) -> np.ndarray:
    """[K, N] nibbles -> int32 [K/8, N], per-group quarter-split layout:
    word j of group: b0=q0[2j]|q1[2j]<<4, b2=q0[2j+1]|q1[2j+1]<<4,
    b1=q2[2j]|q3[2j]<<4, b3=q2[2j+1]|q3[2j+1]<<4 (quarter m decodes as the
    m-th masked word's contiguous row span)."""
    k, n = values.shape
    v = values.reshape(k // gs, gs, n).astype(np.uint32)
    q = gs // 4
    q0, q1 = v[:, 0:q], v[:, q:2 * q]
    q2, q3 = v[:, 2 * q:3 * q], v[:, 3 * q:]
    b0 = q0[:, 0::2] | (q1[:, 0::2] << 4)
    b2 = q0[:, 1::2] | (q1[:, 1::2] << 4)
    b1 = q2[:, 0::2] | (q3[:, 0::2] << 4)
    b3 = q2[:, 1::2] | (q3[:, 1::2] << 4)
    word = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
    return word.reshape(k // 8, n).astype(np.int32)


def _kernel_i32quad(x_ref, wp_ref, s_ref, z_ref, out_ref, *, rows_per_blk, gs):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xv = x_ref[...].astype(jnp.bfloat16)
    t = wp_ref[...]
    mk = jnp.int32(0x000F000F)
    mg = jnp.int32(0x3F803F80)
    w0 = pltpu.bitcast((t & mk) | mg, jnp.bfloat16)
    w1 = pltpu.bitcast(((t >> 4) & mk) | mg, jnp.bfloat16)
    w2 = pltpu.bitcast(((t >> 8) & mk) | mg, jnp.bfloat16)
    w3 = pltpu.bitcast(((t >> 12) & mk) | mg, jnp.bfloat16)
    q = gs // 4
    for r in range(rows_per_blk):
        rows = slice(r * q, (r + 1) * q)
        wg = jnp.concatenate([w0[rows], w1[rows], w2[rows], w3[rows]], axis=0)
        xr = xv[:, r * gs:(r + 1) * gs]
        acc = jax.lax.dot_general(
            xr, wg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xs = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
        s = s_ref[r, 0, :]
        s128 = s * 128.0
        zadj = s128 + s * z_ref[r, 0, :].astype(jnp.int32).astype(jnp.float32)
        out_ref[...] += acc * s128[None, :] - xs * zadj[None, :]


def matmul_i32quad(x2d, wp32, scales3, sz3, gs, n_pad, bn=1024):
    m, k = x2d.shape
    bk = 1024 if k % 1024 == 0 and 1024 % gs == 0 else gs
    rows_per_blk = bk // gs
    grid = (1, n_pad // bn, k // bk)
    kernel = partial(_kernel_i32quad, rows_per_blk=rows_per_blk, gs=gs)
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


wp32 = jnp.asarray(pack_i32quad(iw, GS))

x = rng.standard_normal((M, K)).astype(np.float32)
xb = jnp.asarray(x, dtype=jnp.bfloat16)
y_ref = x @ w_ref




# forced-prefill variant: reuse _matmul_kpair internals with prefill=True by
# faking m >= 32? simplest: call the private matmul with a tiled x then slice
def forced_prefill(xx):
    x32 = jnp.tile(xx, (32, 1))
    return gemm.matmul_pallas(x32, ql)[:1]


print("devices:", jax.devices(), flush=True)
cases = [
    ("kpair_decode", lambda xx: gemm.matmul_pallas(xx, ql)),
    ("kpair_prefill@M32", forced_prefill),
    ("i32quad_decode", lambda xx: matmul_i32quad(
        xx, wp32, ql.scales, ql.zeros, GS, ql.n_pad)[:, :N]),
]
for name, f in cases:
    y = np.asarray(jax.jit(f)(xb), dtype=np.float32)[:1]
    rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    t = slope_time(f, xb)
    gbps = (K * N * 4 / 8) / t / 1e9
    print(f"{name:18s} relerr={rel:.3e}  {t*1e6:8.2f} us  "
          f"weightBW {gbps:7.1f} GB/s", flush=True)
