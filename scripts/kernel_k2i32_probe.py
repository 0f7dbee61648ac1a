"""2-bit i32-load probe: one int32 = 16 two-bit codes; EIGHT masked words
((t >> 2m) & 0x00030003 | 0x3F803F80) + bitcasts decode 16 codes in ~24
integer ops (~1.5/code vs ~3.25 for the byte-loaded kquad). Per-group
EIGHTH-split layout (needs gs % 128 == 0 so each eighth is >= 16 sublanes).

    python scripts/kernel_k2i32_probe.py [K] [N] [gs]
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

rng = np.random.default_rng(0)
g = K // GS
scales = (rng.random((g, N)) * 0.02 + 0.005).astype(np.float16)
zeros = rng.integers(1, 4, size=(g, N)).astype(np.int64)
g_idx = (np.arange(K) // GS).astype(np.int32)
iw = rng.integers(0, 4, size=(K, N)).astype(np.uint32)
packed = quantlinear.PackedQuantLinear(
    qweight=jnp.asarray(packing.pack_qweight(iw, 2)),
    qzeros=jnp.asarray(packing.pack_qzeros(zeros, 2)),
    scales=jnp.asarray(scales), g_idx=jnp.asarray(g_idx), bias=None,
    bits=2, group_size=GS, in_features=K, out_features=N,
)
ql = quantlinear.from_packed(packed)        # kquad (the shipped 2-bit path)
assert ql.layout == "kquad"
w_ref = iw.astype(np.float32) * scales.astype(np.float32)[g_idx] - (
    zeros.astype(np.float32) * scales.astype(np.float32))[g_idx]


def pack_k2i32(values: np.ndarray, gs: int) -> np.ndarray:
    """[K, N] 2-bit codes -> int32 [K/16, N], per-group eighth-split: word m
    ((t>>2m)&0x30003) decodes eighth m, even rows in the low half-word."""
    k, n = values.shape
    assert gs % 128 == 0 and k % gs == 0
    v = values.reshape(k // gs, gs, n).astype(np.uint32)
    e = gs // 8
    word = np.zeros((k // gs, e // 2, n), np.uint32)
    for m in range(8):
        eighth = v[:, m * e:(m + 1) * e]
        word |= eighth[:, 0::2] << np.uint32(2 * m)        # low half-word
        word |= eighth[:, 1::2] << np.uint32(16 + 2 * m)   # high half-word
    return word.reshape(k // 16, n).astype(np.int32)


def _kernel_k2i32(x_ref, wp_ref, s_ref, z_ref, out_ref, *, rows_per_blk, gs):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xv = x_ref[...].astype(jnp.bfloat16)
    t = wp_ref[...]
    mk = jnp.int32(0x00030003)
    mg = jnp.int32(0x3F803F80)
    ws = [pltpu.bitcast(((t >> (2 * m)) & mk) | mg, jnp.bfloat16)
          for m in range(8)]
    e = gs // 8
    for r in range(rows_per_blk):
        # each ws[m][grows] is this group's eighth m (e rows)
        grows = slice(r * e, (r + 1) * e)
        wg = jnp.concatenate([w[grows] for w in ws], axis=0)   # [gs, BN]
        xr = xv[:, r * gs:(r + 1) * gs]
        acc = jax.lax.dot_general(
            xr, wg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xs = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
        s = s_ref[r, 0, :]
        s128 = s * 128.0
        zadj = s128 + s * z_ref[r, 0, :].astype(jnp.int32).astype(jnp.float32)
        out_ref[...] += acc * s128[None, :] - xs * zadj[None, :]


def matmul_k2i32(x2d, wp32, scales3, sz3, gs, n_pad, bn=1024):
    m, k = x2d.shape
    bk = 1024 if k % 1024 == 0 and 1024 % gs == 0 else gs
    rows_per_blk = bk // gs
    grid = (1, n_pad // bn, k // bk)
    kernel = partial(_kernel_k2i32, rows_per_blk=rows_per_blk, gs=gs)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 16, bn), lambda mi, j, ki: (ki, j), memory_space=pltpu.VMEM),
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


wp32 = jnp.asarray(pack_k2i32(iw, GS))

x = rng.standard_normal((M, K)).astype(np.float32)
xb = jnp.asarray(x, dtype=jnp.bfloat16)
y_ref = x @ w_ref

print("devices:", jax.devices(), flush=True)
cases = [
    ("kquad_decode", lambda xx: gemm.matmul_pallas(xx, ql)),
    ("k2i32_decode", lambda xx: matmul_k2i32(
        xx, wp32, ql.scales, ql.zeros, GS, ql.n_pad)[:, :N]),
]
for name, f in cases:
    y = np.asarray(jax.jit(f)(xb), dtype=np.float32)[:1]
    rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    t = slope_time(f, xb)
    gbps = (K * N * 2 / 8) / t / 1e9
    print(f"{name:16s} relerr={rel:.3e}  {t*1e6:8.2f} us  "
          f"weightBW {gbps:7.1f} GB/s", flush=True)
