"""Round-3 decode-kernel experiments: push ki32 4-bit decode from ~535 GB/s
toward the 820 GB/s v5e HBM roofline (VERDICT r2 item 1).

Working theory from the round-2 numbers: per K-block the kernel copies ~2 MB
(the 4-part per-group sublane concat that reassembles [gs, BN] tiles from the
four bitcast quarter arrays) while the block's HBM DMA is only 512 KB — the
decode is VPU-copy-bound, not HBM-bound. Variants eliminate the concat:

  base      shipped _matmul_ki32 (concat 4 quarters + 1 dot per group)
  nocat4    4 quarter dots per group, accumulated (no concat, 4x dots)
  batched   groups in the dot BATCH dim (bm=1): four batched quarter dots
            [R,1,q]x[R,q,BN], per-group scaling applied to the [R,BN]
            partials afterwards (no concat, no per-group python loop)
  batchcat  one batched dot [R,1,gs]x[R,gs,BN] over the concatenated tile
            (isolates batched-dot cost from concat cost)
  zadjpre   base kernel with host-precomputed s128/zadj f32 inputs (drops
            the in-kernel u8 zero decode; isolates that cost)

Timing: long-loop slope (n1=50, n2=2050) — see memory/tpu-kernel-findings.md;
only SAME-PROCESS comparisons are meaningful through the tunnel.

Run: python scripts/kernel_r3_variants.py [K] [N] [gs]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

if os.environ.get("VARIANTS_CPU"):  # shape/logic check without the TPU
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

if os.environ.get("VARIANTS_CPU"):
    jax.config.update("jax_platforms", "cpu")
INTERPRET = bool(os.environ.get("VARIANTS_CPU"))
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autogptq_tpu.ops.quantlinear import _ki32_pack
from autogptq_tpu.ops.pallas.gemm import _ki32_decode_words, _cdiv

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
GS = int(sys.argv[3]) if len(sys.argv) > 3 else 128
M = 1
BN = 1024
BK = 1024 if K % 1024 == 0 else 512

rng = np.random.default_rng(0)
iw = rng.integers(0, 16, size=(K, N)).astype(np.uint8)
scales = (rng.random((K // GS, N)) * 0.05 + 0.01).astype(np.float32)
zeros = rng.integers(1, 16, size=(K // GS, N)).astype(np.uint8)
w_ref = (scales.repeat(GS, 0) * (iw.astype(np.float32) - zeros.repeat(GS, 0))).astype(np.float32)
x = rng.standard_normal((M, K)).astype(np.float32)
y_ref = x @ w_ref

wp = jnp.asarray(_ki32_pack(iw, GS))                  # [K/8, N] int32
s3 = jnp.asarray(scales[:, None, :])                  # [G, 1, N]
z3 = jnp.asarray(zeros[:, None, :])                   # [G, 1, N] u8
s128_h = scales * 128.0
zadj_h = s128_h + scales * zeros.astype(np.float32)
s128_3 = jnp.asarray(s128_h[:, None, :])
zadj_3 = jnp.asarray(zadj_h[:, None, :])
xb = jnp.asarray(x, jnp.bfloat16)

R = BK // GS
Q = GS // 4
grid = (_cdiv(M, 8), _cdiv(N, BN), K // BK)
grid1 = (1, _cdiv(N, BN), K // BK)


def _corr(z_row):
    return z_row.astype(jnp.int32).astype(jnp.float32)


# --- base: shipped kernel (import the real thing for honesty) --------------
from autogptq_tpu.ops.pallas.gemm import _kernel_ki32


def _kernel_nocat4(x_ref, wp_ref, s_ref, z_ref, out_ref):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xv = x_ref[...].astype(jnp.bfloat16)
    ws = _ki32_decode_words(wp_ref[...])
    for r in range(R):
        xr = xv[:, r * GS:(r + 1) * GS]
        acc = None
        for m in range(4):
            part = jax.lax.dot_general(
                xr[:, m * Q:(m + 1) * Q], ws[m][r * Q:(r + 1) * Q],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        xs = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
        s = s_ref[r, 0, :]
        s128 = s * 128.0
        zadj = s128 + s * _corr(z_ref[r, 0, :])
        out_ref[...] += acc * s128[None, :] - xs * zadj[None, :]


def _kernel_batched(x_ref, wp_ref, s_ref, z_ref, out_ref):
    """bm=1: groups ride the dot batch dim; zero concat copies."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    x3 = x_ref[...].astype(jnp.bfloat16).reshape(R, GS)   # lane split, BM=1
    ws = _ki32_decode_words(wp_ref[...])
    acc = None
    for m in range(4):
        part = jax.lax.dot_general(
            x3[:, None, m * Q:(m + 1) * Q],               # [R, 1, Q]
            ws[m].reshape(R, Q, -1),                      # [R, Q, BN]
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    p = acc.reshape(R, -1)                                # [R, BN]
    s = s_ref[:, 0, :]                                    # [R, BN]
    s128 = s * 128.0
    zadj = s128 + s * _corr(z_ref[:, 0, :])
    xs = jnp.sum(x3.astype(jnp.float32), axis=1, keepdims=True)  # [R, 1]
    out_ref[...] += jnp.sum(p * s128 - xs * zadj, axis=0, keepdims=True)


def _kernel_batchcat(x_ref, wp_ref, s_ref, z_ref, out_ref):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    x3 = x_ref[...].astype(jnp.bfloat16).reshape(R, GS)
    w0, w1, w2, w3 = _ki32_decode_words(wp_ref[...])
    parts = []
    for r in range(R):
        rows = slice(r * Q, (r + 1) * Q)
        parts.append(jnp.concatenate([w0[rows], w1[rows], w2[rows], w3[rows]], axis=0))
    wt = jnp.concatenate(parts, axis=0).reshape(R, GS, -1)
    p = jax.lax.dot_general(
        x3[:, None, :], wt,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(R, -1)
    s = s_ref[:, 0, :]
    s128 = s * 128.0
    zadj = s128 + s * _corr(z_ref[:, 0, :])
    xs = jnp.sum(x3.astype(jnp.float32), axis=1, keepdims=True)
    out_ref[...] += jnp.sum(p * s128 - xs * zadj, axis=0, keepdims=True)


def _kernel_zadjpre(x_ref, wp_ref, s128_ref, zadj_ref, out_ref):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xv = x_ref[...].astype(jnp.bfloat16)
    w0, w1, w2, w3 = _ki32_decode_words(wp_ref[...])
    for r in range(R):
        rows = slice(r * Q, (r + 1) * Q)
        wg = jnp.concatenate([w0[rows], w1[rows], w2[rows], w3[rows]], axis=0)
        xr = xv[:, r * GS:(r + 1) * GS]
        acc = jax.lax.dot_general(
            xr, wg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xs = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
        out_ref[...] += acc * s128_ref[r, 0, :][None, :] - xs * zadj_ref[r, 0, :][None, :]


def build(kernel, bm, s_in, z_in):
    @jax.jit
    def f(x2d):
        return pl.pallas_call(
            kernel,
            grid=(_cdiv(M, bm), _cdiv(N, BN), K // BK),
            in_specs=[
                pl.BlockSpec((bm, BK), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
                pl.BlockSpec((BK // 8, BN), lambda mi, j, ki: (ki, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 1, BN), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 1, BN), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, BN), lambda mi, j, ki: (mi, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * K * N, bytes_accessed=wp.size * 4 + M * K * 2 + M * N * 4,
                transcendentals=0,
            ),
            interpret=INTERPRET,
        )(x2d, wp, s_in, z_in)

    return f


def base_fn():
    kern = functools.partial(
        _kernel_ki32, rows_per_blk=R, gs=GS, dot_dtype=jnp.bfloat16, prefill=False)
    return build(kern, 8, s3, z3)


VARIANTS = [
    ("base", lambda: base_fn()),
    ("nocat4", lambda: build(_kernel_nocat4, 8, s3, z3)),
    ("batched", lambda: build(_kernel_batched, 1, s3, z3)),
    ("batchcat", lambda: build(_kernel_batchcat, 1, s3, z3)),
    ("zadjpre", lambda: build(_kernel_zadjpre, 8, s128_3, zadj_3)),
]


def make_looped(f):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x2d, n):
        def body(i, x2d):
            y = f(x2d)
            return jnp.where(y[0, 0] > 1e30, x2d + 1, x2d)

        return jax.lax.fori_loop(0, n, body, x2d)[0, 0]

    return run


def slope_time(f, n1=50, n2=2050, reps=3):
    run = make_looped(f)
    float(np.asarray(run(xb, n1)))
    float(np.asarray(run(xb, n2)))
    t1 = []
    t2 = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(np.asarray(run(xb, n1))); t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(np.asarray(run(xb, n2))); t2.append(time.perf_counter() - t0)
    return (min(t2) - min(t1)) / (n2 - n1)


print("devices:", jax.devices(), flush=True)
print(f"K={K} N={N} gs={GS} BK={BK} BN={BN} R={R}", flush=True)
for name, mk in VARIANTS:
    try:
        f = mk()
        y = np.asarray(f(xb), np.float32)
        rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
        if INTERPRET:
            print(f"{name:10s} relerr {rel:.2e}", flush=True)
            continue
        t = slope_time(f)
        gbps = (K * N * 4 / 8) / t / 1e9
        print(f"{name:10s} {t*1e6:8.2f} us  weightBW {gbps:7.1f} GB/s  relerr {rel:.2e}", flush=True)
    except Exception as e:
        print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
