"""Probe: TRUE 3-bit decode layout ("k3i32") vs the shipped nibble-padded
path (3-bit stored as 4-bit ki32/kb32 words, 1.33x traffic).

Layout: 10 codes per i32 word. Code m (m=0..4) of the low half at bits
3m..3m+2, of the high half at bits 16+3m — so masked word m
((t >> 3m) & 0x00070007 | 0x3F803F80) bitcasts to bf16 ``1 + v/128``
exactly like ki32, decoding TENTH m of every 640-row superblock (five
whole g=128 groups per block; tenths are 64 rows = sublane-aligned).
Decode cost: 5 masked words for 10 codes (ki32: 4 words for 8) — same
~1.4 int ops/code; traffic 3.2 bits/weight stored (+ K padded to 640
multiples: 4096 -> 4480, 9.4%) = effective 3.5 bits vs 4.0 nibble-padded,
a ~12% HBM cut for 3-bit checkpoints.

Decision rule: keep if the measured kernel time beats nibble-kb32 by >5%
at 4096^2; else record reject in PARITY (decode is DMA-bound, so the
traffic cut should show up directly).

    python scripts/kernel_k3i32_probe.py [K] [N]
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
GS = 128
SB = 640          # superblock rows: 10 tenths of 64, 5 groups of 128
M = 1

rng = np.random.default_rng(0)
K_PAD = -(-K // SB) * SB
g = K_PAD // GS
scales = (rng.random((g, N)) * 0.02 + 0.005).astype(np.float32)
zeros = rng.integers(1, 8, size=(g, N)).astype(np.int64)
g_idx = (np.arange(K) // GS).astype(np.int32)
iw = rng.integers(0, 8, size=(K, N)).astype(np.uint32)
iw_pad = np.pad(iw, ((0, K_PAD - K), (0, 0)))
scales_np = scales.copy()
scales_np[K // GS:] = 0.0 if K_PAD > K else scales_np[K // GS:]
w_ref = iw.astype(np.float32) * scales[(np.arange(K) // GS)] - (
    zeros.astype(np.float32) * scales)[(np.arange(K) // GS)]


def pack_k3i32_ab(values: np.ndarray) -> np.ndarray:
    """[K_PAD, N] -> int32 [K_PAD*2/20, N]: per 640-row superblock, TWO
    word planes of SB/20=32 rows each; plane A packs tenths 0..4 (code m at
    bits 3m / 16+3m), plane B tenths 5..9. 64 rows of words per superblock
    = 640 codes * 3.2 bits."""
    k, n = values.shape
    v = values.reshape(k // SB, 10, SB // 10, n).astype(np.uint32)
    lo, hi = v[:, :, 0::2], v[:, :, 1::2]     # [KB, 10, 32, N]
    planes = []
    for base in (0, 5):
        word = np.zeros((k // SB, SB // 20, n), np.uint32)
        for m in range(5):
            word |= (lo[:, base + m] << (3 * m)) | (hi[:, base + m] << (16 + 3 * m))
        planes.append(word)
    # [KB, 2, 32, N] -> [KB*64, N]
    return np.stack(planes, axis=1).reshape(k // 10, n).astype(np.int32)


def _decode_k3(t):
    """Five masked words + bitcasts: tenth m (of this word plane)."""
    mk = jnp.int32(0x00070007)
    mg = jnp.int32(0x3F803F80)
    return [
        pltpu.bitcast(((t >> (3 * m)) & mk) | mg, jnp.bfloat16)
        for m in range(5)
    ]


def kernel_k3(x_ref, wp_ref, s_ref, z_ref, out_ref, *, bk):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xv = x_ref[...].astype(jnp.bfloat16)
    nb = bk // SB                     # superblocks per K tile
    rows_w = wp_ref.shape[0]          # bk/10 word rows: nb * 2 planes * 32
    wa = wp_ref[...].reshape(nb * 2, rows_w // (nb * 2), wp_ref.shape[1])
    gpq = (SB // 10) // 1             # 64 rows per tenth
    for b in range(nb):
        tenths = _decode_k3(wa[2 * b]) + _decode_k3(wa[2 * b + 1])
        # groups of 128 rows = tenths [2g, 2g+1]
        for grp in range(SB // GS):
            r = b * (SB // GS) + grp
            wg = jnp.concatenate(
                [tenths[2 * grp], tenths[2 * grp + 1]], axis=0)
            xr = xv[:, (b * SB + grp * GS):(b * SB + (grp + 1) * GS)]
            acc = jax.lax.dot_general(
                xr, wg,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            xs = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
            s = s_ref[r, 0, :]
            s128 = s * 128.0
            zadj = s128 + s * z_ref[r, 0, :].astype(jnp.int32).astype(jnp.float32)
            out_ref[...] += acc * s128[None, :] - xs * zadj[None, :]


@partial(jax.jit, static_argnames=("bk", "bn", "interpret"))
def matmul_k3(x, wp, s3, z3, bk=640, bn=2048, interpret=False):
    m, k = x.shape
    n = wp.shape[1]
    rows_per_blk = bk // GS
    grid = (1, n // bn, k // bk)
    return pl.pallas_call(
        partial(kernel_k3, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((max(8, m), bk), lambda mi, j, ki: (mi, ki)),
            pl.BlockSpec((bk // 10, bn), lambda mi, j, ki: (ki, j)),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j)),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j)),
        ],
        out_specs=pl.BlockSpec((max(8, m), bn), lambda mi, j, ki: (mi, j)),
        out_shape=jax.ShapeDtypeStruct((max(8, m), n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, bytes_accessed=wp.size * 4, transcendentals=0
        ),
        interpret=interpret,
    )(x, wp, s3, z3)


def main():
    wp = jnp.asarray(pack_k3i32_ab(iw_pad))
    s3 = jnp.asarray(scales.reshape(g, 1, N))
    z3 = jnp.asarray(zeros.astype(np.uint8).reshape(g, 1, N))
    x = np.zeros((8, K_PAD), np.float32)
    x[0, :K] = rng.standard_normal(K) * 0.1
    xb = jnp.asarray(x, jnp.bfloat16)

    y = np.asarray(matmul_k3(xb, wp, s3, z3))[0]
    y_ref = (np.asarray(x[0, :K], np.float32) @ w_ref)
    rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    print(f"k3i32 correctness: max rel err {rel:.3e}", flush=True)

    # nibble-padded comparison: the SHIPPED 3-bit path (kb32 words)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, 3)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros[: K // GS], 3)),
        scales=jnp.asarray(scales[: K // GS].astype(np.float16)),
        g_idx=jnp.asarray(g_idx), bias=None,
        bits=3, group_size=GS, in_features=K, out_features=N,
    )
    ql = quantlinear.from_packed(packed)
    print("shipped 3-bit layout:", ql.layout, flush=True)
    xs = jnp.asarray(x[:1, :K], jnp.bfloat16)

    t3 = slope_time(lambda xx: matmul_k3(xx, wp, s3, z3)[0:1], xb)
    tn = slope_time(lambda xx: gemm.matmul_pallas(xx, ql), xs)
    b3 = wp.size * 4
    bn_ = ql.wp.size * 4
    print(
        f"k3i32 (true 3-bit): {t3*1e6:7.2f} us  {b3/t3/1e9:6.1f} GB/s "
        f"({b3/1e6:.1f} MB)", flush=True)
    print(
        f"nibble {ql.layout}:   {tn*1e6:7.2f} us  {bn_/tn/1e9:6.1f} GB/s "
        f"({bn_/1e6:.1f} MB)", flush=True)
    print("KEEP" if t3 < 0.95 * tn else "REJECT", flush=True)


if __name__ == "__main__":
    main()
