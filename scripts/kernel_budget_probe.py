"""Decompose the ki32/kb32 decode kernel time budget (same-process, v5e).

Variants share grid/BlockSpecs (so DMA traffic is identical) and strip the
kernel body back stage by stage:

  a) pure-DMA: load wp blocks, emit one row — the PRACTICAL bandwidth
     ceiling for this pallas pipeline shape (vs the 820 GB/s paper number)
  b) decode-only: 4 masked words + bitcasts + a max-reduce per array
     (forces full decode, no dots)
  c) decode+dots: kb32 per-group dots, corrections skipped
  d) full kb32 (the real kernel)

    python scripts/kernel_budget_probe.py [K] [N] [gs] [bn]
"""

import sys
from functools import partial

import numpy as np

sys.path.insert(0, ".")

from scripts.bench_util import slope_time  # noqa: E402
from scripts.kernel_kb32_probe import pack_kb32  # noqa: E402

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autogptq_tpu.ops.pallas import gemm

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
GS = int(sys.argv[3]) if len(sys.argv) > 3 else 128
BN = int(sys.argv[4]) if len(sys.argv) > 4 else 2048
M, S = 1, 1024

rng = np.random.default_rng(0)
g = K // GS
iw = rng.integers(0, 16, size=(K, N)).astype(np.uint32)
scales = (rng.random((g, N)) * 0.02 + 0.005).astype(np.float32)
zeros = rng.integers(1, 16, size=(g, N)).astype(np.uint8)
wp = jnp.asarray(pack_kb32(iw, S))
s3 = jnp.asarray(scales.reshape(g, 1, N))
z3 = jnp.asarray(zeros.reshape(g, 1, N))
x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)


def _body_dma(x_ref, wp_ref, s_ref, z_ref, out_ref):
    ki = pl.program_id(2)
    # x_ref dependency keeps the call inside the timing loop (no hoisting)
    t = wp_ref[0:1, :].astype(jnp.float32) + x_ref[:, 0:1].astype(jnp.float32)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = t

    @pl.when(ki != 0)
    def _():
        out_ref[...] += t


def _body_decode(x_ref, wp_ref, s_ref, z_ref, out_ref):
    ki = pl.program_id(2)
    ws = gemm._ki32_decode_words(wp_ref[...])
    acc = x_ref[:, 0:1].astype(jnp.float32)
    for w in ws:
        acc = acc + jnp.max(w.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = acc

    @pl.when(ki != 0)
    def _():
        out_ref[...] += acc


def _body_dots(x_ref, wp_ref, s_ref, z_ref, out_ref, *, rows_per_blk, gs, bk, corr):
    ki = pl.program_id(2)
    xv = x_ref[...].astype(jnp.bfloat16)
    ws = gemm._ki32_decode_words(wp_ref[...])
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
        if corr:
            xs = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
            s = s_ref[r, 0, :]
            s128 = s * 128.0
            zadj = s128 + s * z_ref[r, 0, :].astype(jnp.int32).astype(jnp.float32)
            part = acc * s128[None, :] - xs * zadj[None, :]
        else:
            part = acc
        total = part if total is None else total + part

    @pl.when(ki == 0)
    def _():
        out_ref[...] = total

    @pl.when(ki != 0)
    def _():
        out_ref[...] += total


def run(xin, body, bn=BN):
    bk = S
    rows_per_blk = bk // GS
    grid = (1, N // bn, K // bk)
    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, bk), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 8, bn), lambda mi, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda mi, j, ki: (mi, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N, bytes_accessed=wp.size * 4 + M * K * 2 + M * N * 4,
            transcendentals=0),
    )(xin, wp, s3, z3)


wbytes = K * N // 2
print(f"K={K} N={N} gs={GS} bn={BN} M={M}  weight bytes {wbytes / 1e6:.1f} MB")
rows_per_blk = S // GS
for name, body in [
    ("a) pure-DMA", _body_dma),
    ("b) decode-only", _body_decode),
    ("c) decode+dots", partial(_body_dots, rows_per_blk=rows_per_blk, gs=GS, bk=S, corr=False)),
    ("d) full kb32", partial(_body_dots, rows_per_blk=rows_per_blk, gs=GS, bk=S, corr=True)),
]:
    t = slope_time(lambda xi, b=body: run(xi, b), x)
    print(f"{name:18s} {t * 1e6:8.2f} us  {wbytes / t / 1e9:7.1f} GB/s")
