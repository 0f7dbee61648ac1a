"""Fused dequant-matmul Pallas TPU kernel family.

One kernel family replaces the reference's seven CUDA/Triton backends.
Weights cross HBM exactly once at their packed width (4 bits per weight for
int4), the speed-of-light for the memory-bound decode regime — the same
insight behind the reference's exllamav2/Marlin kernels.

Two layouts (see ops/quantlinear.py):

* ``kpair`` (3/4-bit, the hot path, `_kernel_kpair`): byte [k', n] packs two
  adjacent K rows; the kernel builds both bf16 bit patterns 0x3F80|v
  (= 1 + v/128) inside one i32 word and row-interleaves them with a single
  i32->bf16 bitcast (~2.5 integer VPU ops/weight, zero int->float casts).
  Decode (M < 32): exact factored per-group dequant
  ``out += 128s*B_g - (128s+sz)*xs_g`` keeps unpack work minimal
  (~500-800 GB/s of the v5e's 820 GB/s HBM). Prefill (M >= 32): the decoded
  tile is dequantized once and contracted in one full-BK MXU dot
  (157 TFLOP/s at M=1024 = 80% of bf16 peak) — the reference's
  reconstruct+GEMM regime (q_gemm.cu:118-158) fused into the same kernel.

* ``planar`` (2/8-bit, `_kernel`): shift/mask per plane, fused
  multiply-subtract dequant, M-tiled MXU matmul.

Both read block widths from the (possibly shard_map-local) arrays so the
same kernels serve explicit tensor parallelism (parallel/tp.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quantlinear import QuantLinear, _planes, _storage_bits


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(x_ref, wp_ref, scales_ref, z_ref, out_ref, *, planes, sbits, rows_per_blk, gs_blk, bk, dot_dtype):
    """Grid: (mi, j, ki); ki innermost accumulates into the same out block.

    x_ref:      [BM, BK]            activations
    wp_ref:     [BK, BNH] uint8     packed weights
    scales_ref: [R, planes, BNH]    per-group scales (R groups in this K blk)
    z_ref:      [R, planes, BNH] u8 per-group integer zero-points
    out_ref:    [BM, planes, BNH]   fp32 accumulator
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[...]
    # Mosaic has no direct uint8 -> float cast; widen to int32 for the
    # shift/mask unpack (register pressure is fine: one [BK, BNH] tile).
    wp = wp_ref[...].astype(jnp.int32)
    mask = (1 << sbits) - 1

    for p in range(planes):
        w_int = ((wp >> (sbits * p)) & mask).astype(jnp.float32)  # [BK, BNH]
        s = scales_ref[:, p, :]                              # [R, BNH]
        # u8 -> i32 -> f32 (Mosaic has no direct u8 -> float cast)
        z = s * z_ref[:, p, :].astype(jnp.int32).astype(jnp.float32)
        if rows_per_blk > 1:
            w3 = w_int.reshape(rows_per_blk, gs_blk, -1)
            w = (w3 * s[:, None, :] - z[:, None, :]).reshape(bk, -1)
        else:
            w = w_int * s - z
        acc = jax.lax.dot_general(
            x.astype(dot_dtype),
            w.astype(dot_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, p, :] += acc


def _pick_bk(k: int, group_size: int, kpair: bool = False, kquad: bool = False, ki32: bool = False, k2i32: bool = False, kb32: bool = False) -> int | None:
    """K-tile size: a multiple or divisor of the group size so each K block
    maps to a whole number of (or a single) group row. kpair additionally
    needs the packed row count bk/2 sublane-aligned (%8); kquad needs bk/4
    sublane-aligned AND whole groups per block; ki32 bk/8 sublane-aligned
    AND whole groups (the per-group quarter-split layout decodes
    group-relative); kb32 is packed per fixed 1024-row superblock, so the
    K tile IS the superblock and each quarter (256 rows) must hold whole
    groups."""
    gs = group_size if group_size != -1 else k
    if kb32:
        if (
            k % 1024 == 0 and gs <= 256 and 256 % gs == 0 and gs % 32 == 0
        ):
            return 1024
        return None
    if k2i32:
        for bk in (1024, 512, 256, 128):
            if k % bk == 0 and bk % gs == 0 and bk % 128 == 0:
                return bk
        if k <= 1024 and k % 128 == 0 and k % gs == 0:  # tiny-K fallback (tests)
            return k
        return None
    if ki32:
        for bk in (1024, 512, 256, 128):
            if k % bk == 0 and bk % gs == 0 and bk % 64 == 0:
                return bk
        if k <= 1024 and k % 64 == 0 and k % gs == 0:   # tiny-K fallback (tests)
            return k
        return None
    if kquad:
        for bk in (1024, 512, 256, 128):
            if k % bk == 0 and bk % gs == 0 and bk % 32 == 0:
                return bk
        if k <= 1024 and k % 32 == 0 and k % gs == 0:   # tiny-K fallback (tests)
            return k
        return None
    sizes = (1024, 512, 256, 128) if kpair else (512, 256, 128)
    for bk in sizes:
        if k % bk:
            continue
        if bk % gs == 0 or gs % bk == 0:
            return bk
    # tiny-K fallback (tests): one block covering all of K. Capped so an
    # oversized non-tileable K (e.g. gs=96, k=4608) routes to matmul_xla
    # instead of risking a whole-K VMEM block.
    kmod = 16 if kpair else 8
    if k <= 1024 and k % kmod == 0 and (k % gs == 0 or gs % k == 0):
        return k
    return None


def supported(ql: QuantLinear) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if ql.layout == "ki32":
        bk = _pick_bk(ql.wp.shape[0] * 8, ql.group_size, ki32=True)
    elif ql.layout == "kb32":
        bk = _pick_bk(ql.wp.shape[0] * 8, ql.group_size, kb32=True)
    elif ql.layout == "kb32l":
        k_stored = ql.wp.shape[0] // (ql.n_pad // ql.wp.shape[2]) * 1024
        bk = _pick_bk(k_stored, ql.group_size, kb32=True)
    elif ql.layout == "k2i32":
        bk = _pick_bk(ql.wp.shape[0] * 16, ql.group_size, k2i32=True)
    elif ql.layout == "kpair":
        bk = _pick_bk(ql.wp.shape[0] * 2, ql.group_size, kpair=True)
    elif ql.layout == "kquad":
        bk = _pick_bk(ql.wp.shape[0] * 4, ql.group_size, kquad=True)
    elif ql.layout == "koct":
        # virtual rows: 2 per byte; groups double in virtual-row space
        gs_v = ql.group_size * 2 if ql.group_size != -1 else -1
        bk = _pick_bk(ql.wp.shape[0] * 2, gs_v, kpair=True)
    else:
        bk = _pick_bk(ql.in_features, ql.group_size)
    if bk is None:
        return False
    c = ql.n_pad // ql.planes
    return c % 128 == 0


def _kernel_kpair(x_ref, wp_ref, s_ref, z_ref, out_ref, *, rows_per_blk, gs_blk, dot_dtype, prefill, variant="kpair"):
    """K-pair bitcast kernel — HBM speed-of-light decode path (~810 GB/s
    effective on v5e vs ~450 for the planar shift/mask kernel).

    Grid: (mi, j, ki); ki innermost accumulates into the same out block.
    x_ref:  [BM, BK]             activations
    wp_ref: [BK/2, BN] uint8     K-pair packed nibbles
    s_ref:  [R, 1, BN] f32       per-group scales
    z_ref:  [R, 1, BN] u8        per-group integer zero-points
    out_ref:[BM, BN] f32         accumulator

    Unpack: one i32 word per byte holds BOTH bf16 bit patterns
    0x3F80|v = 1 + v/128 (v in the LOW mantissa bits: the lo nibble needs no
    shift at all, the hi nibble one shift — 5 integer ops per byte); a single
    i32->bf16 bitcast row-interleaves them back into K order (Mosaic: row 2i
    = low half). Dequant is exact via the factored per-group correction
        x @ (1 + v/128) = xs_g + (x @ v)/128
        out += (128*s) * B_g - (128*s + s*z) * xs_g
    so the per-element work is ~2.5 integer VPU ops per weight with zero
    int->float conversions (the planar kernel's bottleneck).

    ``variant="koct"`` runs the SAME kernel for 8-bit: wp holds one byte per
    logical weight; the word packs (1 + (v&127)/128) in the low half and
    (1 + (v>>7)/128) in the high half, the caller interleaves activations as
    virtual rows (x, 128x), and the algebra works out to an identical
    factored correction with the zero-point scaled by 1/129 (each virtual
    group sums to 129x the logical activation sum)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # The dot and the group-sum correction must see the SAME (rounded) x or
    # the zero-point term amplifies the rounding mismatch.
    xv = x_ref[...].astype(dot_dtype)
    t = wp_ref[...].astype(jnp.int32)
    if variant == "koct":
        word = jnp.int32(0x3F803F80) | (t & 127) | ((t >> 7) << 16)
        zscale = 1.0 / 129.0
    else:
        # (t >> 4) << 16 == t << 12 except it would smear the lo nibble into
        # bits 12-15 (the low bf16's exponent), hence the explicit mask-free
        # shift pair on the hi side and a single mask on the lo side.
        word = jnp.int32(0x3F803F80) | (t & 15) | ((t >> 4) << 16)
        zscale = 1.0
    wb = pltpu.bitcast(word, jnp.bfloat16)  # [BK, BN] = 1 + v/128, K order
    if prefill:
        # Large-M regime (the reference's reconstruct+GEMM idea,
        # q_gemm.cu:118-158): dequantize the whole tile ONCE — the +2 VPU
        # ops per element are amortized over BM rows — and contract the
        # full BK in one MXU-efficient dot instead of per-group slices.
        bn = wb.shape[1]
        sg = s_ref[...].reshape(rows_per_blk, 1, bn)
        s128 = sg * 128.0
        zadj = s128 + (sg * zscale) * (
            z_ref[...].reshape(rows_per_blk, 1, bn).astype(jnp.int32).astype(jnp.float32)
        )
        w3 = wb.astype(jnp.float32).reshape(rows_per_blk, gs_blk, bn)
        wd = (w3 * s128 - zadj).reshape(rows_per_blk * gs_blk, bn)
        out_ref[...] += jax.lax.dot_general(
            xv,
            wd.astype(dot_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return
    wv = wb.astype(dot_dtype)
    for r in range(rows_per_blk):
        xr = xv[:, r * gs_blk:(r + 1) * gs_blk]
        acc = jax.lax.dot_general(
            xr,
            wv[r * gs_blk:(r + 1) * gs_blk, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # per-group activation sums [BM, 1] (2-D slice reduction — Mosaic
        # rejects lane-splitting reshapes like (BM, R, GS) for BM > 1)
        xs = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
        s = s_ref[r, 0, :]
        s128 = s * 128.0
        # u8 -> i32 -> f32 (Mosaic has no direct u8 -> float cast)
        zadj = s128 + (s * zscale) * z_ref[r, 0, :].astype(jnp.int32).astype(jnp.float32)
        out_ref[...] += acc * s128[None, :] - xs * zadj[None, :]


@functools.partial(
    jax.jit, static_argnames=("group_size", "n_pad", "out_features", "interpret", "bm", "bn", "dot_dtype", "variant")
)
def _matmul_kpair(
    x2d,
    wp,
    scales3,
    sz3,
    *,
    group_size,
    n_pad,
    out_features,
    interpret,
    bm,
    bn,
    dot_dtype,
    variant="kpair",
):
    m, k = x2d.shape
    gs = group_size if group_size != -1 else k
    bk = _pick_bk(k, group_size, kpair=True)
    assert bk is not None, "unsupported shape for kpair pallas kernel"
    bn = min(bn, n_pad)

    if bk % gs == 0:
        rows_per_blk = bk // gs
        scale_idx = lambda mi, j, ki: (ki, 0, j)
    else:  # gs % bk == 0
        rows_per_blk = 1
        scale_idx = lambda mi, j, ki: ((ki * bk) // gs, 0, j)
    gs_blk = min(gs, bk)

    grid = (_cdiv(m, bm), _cdiv(n_pad, bn), k // bk)

    kernel = functools.partial(
        _kernel_kpair, rows_per_blk=rows_per_blk, gs_blk=gs_blk,
        dot_dtype=dot_dtype, prefill=m >= 32, variant=variant,
    )

    flops = 2 * m * k * n_pad
    bytes_accessed = wp.size + m * k * x2d.dtype.itemsize + m * n_pad * 4

    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda mi, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), scale_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), scale_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda mi, j, ki: (mi, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x2d, wp, scales3, sz3)

    return y[:, :out_features]


def _ki32_decode_words(t):
    """Four masked words + bitcasts: quarter m of every group in row order
    (see quantlinear._ki32_pack). ~11 integer ops per 8 codes."""
    mk = jnp.int32(0x000F000F)
    mg = jnp.int32(0x3F803F80)
    return (
        pltpu.bitcast((t & mk) | mg, jnp.bfloat16),
        pltpu.bitcast(((t >> 4) & mk) | mg, jnp.bfloat16),
        pltpu.bitcast(((t >> 8) & mk) | mg, jnp.bfloat16),
        pltpu.bitcast(((t >> 12) & mk) | mg, jnp.bfloat16),
    )


def _prenorm_x(x_ref, xf_ref, nw_ref, eps, plus_one, dot_dtype):
    """Fused RMS-norm prologue: normalize this grid step's x block using
    row statistics from the FULL-K x operand (xf_ref — a constant-index
    block that stays VMEM-resident across grid steps). Matches
    arch.rms_norm bit-for-bit up to reduce ordering: f32 math, cast back
    to the activation dtype, then to the dot dtype — exactly the value
    the unfused path would feed the kernel."""
    xf = xf_ref[...].astype(jnp.float32)                  # [bm, K]
    var = jnp.mean(xf * xf, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)                       # [bm, 1]
    w = nw_ref[0].astype(jnp.float32)                     # [bk]
    if plus_one:                                          # gemma (1 + w)
        w = 1.0 + w
    xn = x_ref[...].astype(jnp.float32) * rstd * w[None, :]
    return xn.astype(x_ref.dtype).astype(dot_dtype)


def _kernel_ki32(x_ref, *rest, rows_per_blk, gs, dot_dtype, prefill,
                 norm_eps=0.0, norm_plus_one=False, prenorm=False):
    """i32-loaded 4-bit kernel — the fastest decode path (measured 15.7 us
    vs 19.2 for the byte-loaded kpair at 4096x4096 g128 M=1 on v5e). wp is
    int32 [BK/8, BN] in the per-group quarter-split layout; decode uses half
    the integer ops of kpair. Decode regime: per-group 4-part sublane concat
    + one gs-wide dot + the exact factored correction. Prefill: dequantize
    every quarter once and contract the full BK in one MXU dot.

    ``prenorm``: the RMS norm feeding this linear runs INSIDE the kernel
    (extra operands: full-K x + norm weight) — each decode step otherwise
    pays ~6 us of per-op latency per tiny [1, K] norm, x65 per token."""
    if prenorm:
        xf_ref, nw_ref, wp_ref, s_ref, z_ref, out_ref = rest
    else:
        wp_ref, s_ref, z_ref, out_ref = rest
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    if prenorm:
        xv = _prenorm_x(x_ref, xf_ref, nw_ref, norm_eps, norm_plus_one, dot_dtype)
    else:
        xv = x_ref[...].astype(dot_dtype)
    w0, w1, w2, w3 = _ki32_decode_words(wp_ref[...])
    q = gs // 4
    if prefill:
        parts = []
        for r in range(rows_per_blk):
            rows = slice(r * q, (r + 1) * q)
            s = s_ref[r, 0, :]
            s128 = s * 128.0
            zadj = s128 + s * z_ref[r, 0, :].astype(jnp.int32).astype(jnp.float32)
            for wm in (w0, w1, w2, w3):
                parts.append(
                    wm[rows].astype(jnp.float32) * s128[None, :] - zadj[None, :]
                )
        wd = jnp.concatenate(parts, axis=0)                 # [BK, BN]
        out_ref[...] += jax.lax.dot_general(
            xv, wd.astype(dot_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return
    for r in range(rows_per_blk):
        rows = slice(r * q, (r + 1) * q)
        wg = jnp.concatenate([w0[rows], w1[rows], w2[rows], w3[rows]], axis=0)
        xr = xv[:, r * gs:(r + 1) * gs]
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


@functools.partial(
    jax.jit, static_argnames=("group_size", "n_pad", "out_features", "interpret", "bm", "bn", "dot_dtype", "norm_eps", "norm_plus_one")
)
def _matmul_ki32(
    x2d,
    wp,
    scales3,
    sz3,
    norm_w=None,
    *,
    group_size,
    n_pad,
    out_features,
    interpret,
    bm,
    bn,
    dot_dtype,
    norm_eps=0.0,
    norm_plus_one=False,
):
    m, k = x2d.shape
    gs = group_size if group_size != -1 else k
    bk = _pick_bk(k, group_size, ki32=True)
    assert bk is not None, "unsupported shape for ki32 pallas kernel"
    bn = min(bn, n_pad)
    rows_per_blk = bk // gs          # whole groups per block by construction
    prenorm = norm_w is not None
    assert not (prenorm and m >= 32), "fused prenorm is decode-regime only"

    grid = (_cdiv(m, bm), _cdiv(n_pad, bn), k // bk)
    kernel = functools.partial(
        _kernel_ki32, rows_per_blk=rows_per_blk, gs=gs,
        dot_dtype=dot_dtype, prefill=m >= 32,
        norm_eps=norm_eps, norm_plus_one=norm_plus_one, prenorm=prenorm,
    )
    flops = 2 * m * k * n_pad
    bytes_accessed = wp.size * 4 + m * k * x2d.dtype.itemsize + m * n_pad * 4

    in_specs = [
        pl.BlockSpec((bm, bk), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
    ]
    operands = [x2d]
    if prenorm:
        # full-K x (constant block index: stays VMEM-resident) + norm weight
        in_specs += [
            pl.BlockSpec((bm, k), lambda mi, j, ki: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda mi, j, ki: (0, ki), memory_space=pltpu.VMEM),
        ]
        operands += [x2d, norm_w.reshape(1, k)]
    in_specs += [
        pl.BlockSpec((bk // 8, bn), lambda mi, j, ki: (ki, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
    ]
    operands += [wp, scales3, sz3]

    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda mi, j, ki: (mi, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(*operands)

    return y[:, :out_features]


def _kernel_kb32(x_ref, *rest, rows_per_blk, gs, dot_dtype, prefill, lin=False,
                 norm_eps=0.0, norm_plus_one=False, prenorm=False):
    """Block-quarter-split 4-bit kernel ("kb32" layout). Same masked-word
    decode as ki32, but the quarter split is over the whole 1024-row K
    superblock instead of each group, so every group is a DIRECT static
    slice of ONE decoded array — the per-group 4-part sublane concat
    (~2 MB of VMEM shuffle per grid step at bk=bn=1024) disappears.
    Measured 14.9 vs ki32's 15.7 us at 4096^2 g128 M=1 on v5e (561 GB/s,
    ~91% of the same-grid pure-DMA ceiling). Packing = _ki32_pack with
    granularity 1024 (see quantlinear.from_packed).

    ``lin``: the "kb32l" tile-contiguous storage — wp blocks arrive as
    [1, BK/8, BN] slices of a linearized [(N/bn)*(K/bk), BK/8, BN] array
    whose blocks are CONTIGUOUS in HBM (Marlin's repack idea,
    marlin_repack.cu:8-92), turning the strided block-row DMA into a pure
    sequential stream.

    ``prenorm``: fused RMS-norm prologue (see _kernel_ki32)."""
    if prenorm:
        xf_ref, nw_ref, wp_ref, s_ref, z_ref, out_ref = rest
    else:
        wp_ref, s_ref, z_ref, out_ref = rest
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    if prenorm:
        xv = _prenorm_x(x_ref, xf_ref, nw_ref, norm_eps, norm_plus_one, dot_dtype)
    else:
        xv = x_ref[...].astype(dot_dtype)
    wv = wp_ref[0] if lin else wp_ref[...]
    ws = _ki32_decode_words(wv)            # 4 x [BK/4, BN], K-contiguous
    quarter = (rows_per_blk * gs) // 4
    gpq = quarter // gs                    # whole groups per quarter
    if prefill:
        parts = []
        for r in range(rows_per_blk):
            m, off = r // gpq, (r % gpq) * gs
            s = s_ref[r, 0, :]
            s128 = s * 128.0
            zadj = s128 + s * z_ref[r, 0, :].astype(jnp.int32).astype(jnp.float32)
            parts.append(
                ws[m][off:off + gs].astype(jnp.float32) * s128[None, :] - zadj[None, :]
            )
        wd = jnp.concatenate(parts, axis=0)                 # [BK, BN]
        out_ref[...] += jax.lax.dot_general(
            xv, wd.astype(dot_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return
    for r in range(rows_per_blk):
        m, off = r // gpq, (r % gpq) * gs
        wg = ws[m][off:off + gs]
        xr = xv[:, r * gs:(r + 1) * gs]
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


@functools.partial(
    jax.jit, static_argnames=("group_size", "n_pad", "out_features", "interpret", "bm", "bn", "dot_dtype", "norm_eps", "norm_plus_one")
)
def _matmul_kb32(
    x2d,
    wp,
    scales3,
    sz3,
    norm_w=None,
    *,
    group_size,
    n_pad,
    out_features,
    interpret,
    bm,
    bn,
    dot_dtype,
    norm_eps=0.0,
    norm_plus_one=False,
):
    m, k = x2d.shape
    gs = group_size if group_size != -1 else k
    bk = _pick_bk(k, group_size, kb32=True)
    assert bk is not None, "unsupported shape for kb32 pallas kernel"
    bn = min(bn, n_pad)
    rows_per_blk = bk // gs          # whole groups per block by construction
    prenorm = norm_w is not None
    assert not (prenorm and m >= 32), "fused prenorm is decode-regime only"

    grid = (_cdiv(m, bm), _cdiv(n_pad, bn), k // bk)
    kernel = functools.partial(
        _kernel_kb32, rows_per_blk=rows_per_blk, gs=gs,
        dot_dtype=dot_dtype, prefill=m >= 32,
        norm_eps=norm_eps, norm_plus_one=norm_plus_one, prenorm=prenorm,
    )
    flops = 2 * m * k * n_pad
    bytes_accessed = wp.size * 4 + m * k * x2d.dtype.itemsize + m * n_pad * 4

    in_specs = [
        pl.BlockSpec((bm, bk), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
    ]
    operands = [x2d]
    if prenorm:
        # full-K x (constant block index: stays VMEM-resident) + norm weight
        in_specs += [
            pl.BlockSpec((bm, k), lambda mi, j, ki: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda mi, j, ki: (0, ki), memory_space=pltpu.VMEM),
        ]
        operands += [x2d, norm_w.reshape(1, k)]
    in_specs += [
        pl.BlockSpec((bk // 8, bn), lambda mi, j, ki: (ki, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
    ]
    operands += [wp, scales3, sz3]

    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda mi, j, ki: (mi, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(*operands)

    return y[:, :out_features]


@functools.partial(
    jax.jit, static_argnames=("group_size", "n_pad", "out_features", "interpret", "bm", "dot_dtype")
)
def _matmul_kb32l(
    x2d,
    wp3,                 # [(n_pad/bn)*(k/1024), 128, bn] tile-contiguous words
    scales3,
    sz3,
    *,
    group_size,
    n_pad,
    out_features,
    interpret,
    bm,
    dot_dtype,
):
    """kb32 with tile-contiguous storage ("kb32l"): bn is FIXED by the
    stored block width (wp3.shape[2]); each grid step DMAs one fully
    sequential HBM block instead of bn*4-byte strided rows."""
    m, k = x2d.shape
    gs = group_size if group_size != -1 else k
    bn = wp3.shape[2]
    nbk = k // 1024
    assert wp3.shape[0] == (n_pad // bn) * nbk, "kb32l block count mismatch"
    rows_per_blk = 1024 // gs

    grid = (_cdiv(m, bm), n_pad // bn, nbk)
    kernel = functools.partial(
        _kernel_kb32, rows_per_blk=rows_per_blk, gs=gs,
        dot_dtype=dot_dtype, prefill=m >= 32, lin=True,
    )
    flops = 2 * m * k * n_pad
    bytes_accessed = wp3.size * 4 + m * k * x2d.dtype.itemsize + m * n_pad * 4

    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, 1024), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, bn), lambda mi, j, ki, _nbk=nbk: (j * _nbk + ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda mi, j, ki: (mi, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x2d, wp3, scales3, sz3)

    return y[:, :out_features]


def _kernel_kb32l_manual(x_ref, wp_hbm, s_ref, z_ref, out_ref, scratch, sems,
                         *, nbk, rows_per_blk, gs, dot_dtype, nbuf):
    """Decode-regime kb32l with a MANUAL ``nbuf``-deep DMA pipeline
    (Marlin's 4-stage cp.async analog, marlin_cuda_kernel.cu:55-101).
    Mosaic's automatic BlockSpec pipeline double-buffers; here wp stays in
    HBM and the kernel streams tile-contiguous superblocks through an
    nbuf-slot VMEM scratch with explicit async copies, so up to ``nbuf``
    sequential-span fetches are in flight while the (nearly free) decode +
    per-group dots run. Math is identical to _kernel_kb32's decode branch.
    Opt-in via AUTOGPTQ_TPU_KB32L_MANUAL=<nbuf> (see matmul_pallas)."""
    j = pl.program_id(0)

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            wp_hbm.at[j * nbk + i], scratch.at[slot], sems.at[slot])

    for p in range(min(nbuf, nbk)):
        get_dma(p, p).start()

    out_ref[...] = jnp.zeros_like(out_ref)
    gpq = (rows_per_blk * gs) // 4 // gs    # whole groups per quarter

    def loop_body(i, carry):
        slot = jax.lax.rem(i, nbuf)
        get_dma(slot, i).wait()
        ws = _ki32_decode_words(scratch[slot])
        xv = x_ref[pl.ds(i, 1)][0].astype(dot_dtype)        # [M, 1024]
        sblk = s_ref[pl.ds(i * rows_per_blk, rows_per_blk)]  # [R, 1, BN]
        zblk = z_ref[pl.ds(i * rows_per_blk, rows_per_blk)]
        part = None
        for r in range(rows_per_blk):
            mq, off = r // gpq, (r % gpq) * gs
            wg = ws[mq][off:off + gs]
            xr = xv[:, r * gs:(r + 1) * gs]
            acc = jax.lax.dot_general(
                xr, wg,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            xs = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
            s = sblk[r, 0, :]
            s128 = s * 128.0
            zadj = s128 + s * zblk[r, 0, :].astype(jnp.int32).astype(jnp.float32)
            term = acc * s128[None, :] - xs * zadj[None, :]
            part = term if part is None else part + term
        out_ref[...] += part

        # refill this slot for superblock i+nbuf AFTER its data was consumed
        @pl.when(i + nbuf < nbk)
        def _():
            get_dma(slot, i + nbuf).start()

        return carry

    jax.lax.fori_loop(0, nbk, loop_body, 0)


@functools.partial(
    jax.jit, static_argnames=("group_size", "n_pad", "out_features", "interpret", "nbuf", "dot_dtype")
)
def _matmul_kb32l_manual(
    x2d,
    wp3,                 # [(n_pad/bn)*(k/1024), 128, bn] tile-contiguous words
    scales3,
    sz3,
    *,
    group_size,
    n_pad,
    out_features,
    interpret,
    nbuf,
    dot_dtype,
):
    """Decode-regime (M < 32) kb32l launcher with the manual pipeline:
    grid over column tiles only; the K superblocks stream inside the
    kernel. x is pre-reshaped to [nbk, M, 1024] so the kernel indexes
    K-blocks on an untiled leading axis."""
    m, k = x2d.shape
    gs = group_size if group_size != -1 else k
    bn = wp3.shape[2]
    nbk = k // 1024
    assert wp3.shape[0] == (n_pad // bn) * nbk, "kb32l block count mismatch"
    rows_per_blk = 1024 // gs
    x3 = jnp.transpose(x2d.reshape(m, nbk, 1024), (1, 0, 2))

    kernel = functools.partial(
        _kernel_kb32l_manual, nbk=nbk, rows_per_blk=rows_per_blk, gs=gs,
        dot_dtype=dot_dtype, nbuf=nbuf,
    )
    flops = 2 * m * k * n_pad
    bytes_accessed = wp3.size * 4 + m * k * x2d.dtype.itemsize + m * n_pad * 4

    y = pl.pallas_call(
        kernel,
        grid=(n_pad // bn,),
        in_specs=[
            pl.BlockSpec((nbk, m, 1024), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k // gs, 1, bn), lambda j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // gs, 1, bn), lambda j: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbuf, 128, bn), jnp.int32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x3, wp3, scales3, sz3)

    return y[:, :out_features]


def _kernel_kb32_t(g_ref, wp_ref, s_ref, z_ref, out_ref, *, rows_per_blk, gs, dot_dtype):
    """Transpose kernel (backward: dx = dy @ dequant(W)^T) for kb32 —
    direct superblock-quarter slices, no per-group concat."""
    nj = pl.program_id(2)

    @pl.when(nj == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    gv = g_ref[...].astype(dot_dtype)
    ws = _ki32_decode_words(wp_ref[...])
    quarter = (rows_per_blk * gs) // 4
    gpq = quarter // gs
    parts = []
    for r in range(rows_per_blk):
        m, off = r // gpq, (r % gpq) * gs
        s = s_ref[r, 0, :]
        s128 = s * 128.0
        zadj = s128 + s * z_ref[r, 0, :].astype(jnp.int32).astype(jnp.float32)
        parts.append(
            ws[m][off:off + gs].astype(jnp.float32) * s128[None, :] - zadj[None, :]
        )
    wd = jnp.concatenate(parts, axis=0)                     # [BK, BN]
    out_ref[...] += jax.lax.dot_general(
        gv, wd.astype(dot_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit, static_argnames=("group_size", "interpret", "bm", "bn", "dot_dtype")
)
def _matmul_kb32_t(
    g2d,
    wp,
    scales3,
    sz3,
    *,
    group_size,
    interpret,
    bm,
    bn,
    dot_dtype,
):
    m, n_pad = g2d.shape
    k = wp.shape[0] * 8
    gs = group_size if group_size != -1 else k
    bk = _pick_bk(k, group_size, kb32=True)
    assert bk is not None, "unsupported shape for kb32 transpose kernel"
    bn = min(bn, n_pad)
    rows_per_blk = bk // gs

    grid = (_cdiv(m, bm), k // bk, _cdiv(n_pad, bn))
    kernel = functools.partial(
        _kernel_kb32_t, rows_per_blk=rows_per_blk, gs=gs, dot_dtype=dot_dtype,
    )
    flops = 2 * m * k * n_pad
    bytes_accessed = wp.size * 4 + m * n_pad * g2d.dtype.itemsize + m * k * 4

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bn), lambda mi, ki, nj: (mi, nj), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 8, bn), lambda mi, ki, nj: (ki, nj), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, ki, nj: (ki, 0, nj), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, ki, nj: (ki, 0, nj), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bk), lambda mi, ki, nj: (mi, ki), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(g2d, wp, scales3, sz3)


def _kernel_routed_kb32(sel_ref, x_ref, wp_ref, s_ref, z_ref, out_ref, *,
                        rows_per_blk, gs, dot_dtype):
    """Routed-expert decode kernel (MoE top-k fast path): pair p computes
    x[p] @ dequant(W[sel[p]]). The expert axis of the stacked weights is
    indexed by SCALAR PREFETCH (sel feeds the wp/scales/zeros index_maps),
    so only the selected experts' blocks are ever DMA'd from HBM — the
    TPU-native analog of the reference's per-expert Linear dispatch
    (modeling/mixtral.py:8-40), vs our dense stacked path that reads all E
    experts every step. Decode body = _kernel_kb32's factored per-group
    form over all P_pad x rows; the single valid row p is selected by mask
    (x is tiny; weights are the traffic)."""
    p = pl.program_id(0)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xv = x_ref[...].astype(dot_dtype)            # [P_pad, BK]
    ws = _ki32_decode_words(wp_ref[0])           # 4 x [BK/4, BN]
    quarter = (rows_per_blk * gs) // 4
    gpq = quarter // gs
    acc = None
    for r in range(rows_per_blk):
        m, off = r // gpq, (r % gpq) * gs
        wg = ws[m][off:off + gs]
        xr = xv[:, r * gs:(r + 1) * gs]
        part = jax.lax.dot_general(
            xr, wg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xs = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
        s = s_ref[0, r, 0, :]
        s128 = s * 128.0
        zadj = s128 + s * z_ref[0, r, 0, :].astype(jnp.int32).astype(jnp.float32)
        term = part * s128[None, :] - xs * zadj[None, :]
        acc = term if acc is None else acc + term
    rows = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
    picked = jnp.sum(jnp.where(rows == p, acc, 0.0), axis=0, keepdims=True)
    out_ref[...] += picked[:, None, :]


@functools.partial(
    jax.jit, static_argnames=("group_size", "n_pad", "out_features", "interpret", "bn", "dot_dtype")
)
def _matmul_routed_kb32(
    xp,                    # [P_pad, K] one row per (token, expert) pair
    sel,                   # [P] int32 expert ids
    wp,                    # [E, K/8, N] kb32 words
    scales4,               # [E, G, 1, N]
    sz4,                   # [E, G, 1, N]
    *,
    group_size,
    n_pad,
    out_features,
    interpret,
    bn,
    dot_dtype,
):
    p_pad, k = xp.shape
    p = sel.shape[0]
    gs = group_size if group_size != -1 else k
    bk = _pick_bk(k, group_size, kb32=True)
    assert bk is not None, "unsupported shape for routed kb32 kernel"
    bn = min(bn, n_pad)
    rows_per_blk = bk // gs

    grid = (p, _cdiv(n_pad, bn), k // bk)
    kernel = functools.partial(
        _kernel_routed_kb32, rows_per_blk=rows_per_blk, gs=gs,
        dot_dtype=dot_dtype,
    )
    flops = 2 * p_pad * k * n_pad
    bytes_accessed = p * (k // 8) * n_pad * 4 + p_pad * k * xp.dtype.itemsize

    y = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((p_pad, bk), lambda pi, j, ki, sel: (0, ki)),
                pl.BlockSpec((1, bk // 8, bn), lambda pi, j, ki, sel: (sel[pi], ki, j)),
                pl.BlockSpec((1, rows_per_blk, 1, bn), lambda pi, j, ki, sel: (sel[pi], ki, 0, j)),
                pl.BlockSpec((1, rows_per_blk, 1, bn), lambda pi, j, ki, sel: (sel[pi], ki, 0, j)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bn), lambda pi, j, ki, sel: (pi, 0, j)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((p, 1, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(sel, xp, wp, scales4, sz4)

    return y[:, 0, :out_features]


def supported_routed(sql, interpret: bool = False) -> bool:
    """Routed-expert kernel shape gate (kb32-stacked experts only)."""
    if not interpret and jax.default_backend() != "tpu":
        return False
    if sql.layout != "kb32":
        return False
    k = sql.wp.shape[1] * 8
    if _pick_bk(k, sql.group_size, kb32=True) is None:
        return False
    return sql.n_pad % 128 == 0


def matmul_routed_pallas(xp, sel, sql, interpret: bool = False):
    """Top-k routed expert matmul: row p of the result is
    ``xp[p] @ dequant(W[sel[p]])``. xp rows are padded to >= 8 sublanes."""
    p = sel.shape[0]
    p_pad = max(8, _cdiv(p, 8) * 8)
    if xp.shape[0] != p_pad:
        xp = jnp.pad(xp, ((0, p_pad - xp.shape[0]), (0, 0)))
    k_store = sql.wp.shape[1] * 8
    if xp.shape[1] != k_store:          # load-time K padding: zero-pad x
        xp = jnp.pad(xp, ((0, 0), (0, k_store - xp.shape[1])))
    return _matmul_routed_kb32(
        xp, sel, sql.wp, sql.scales, sql.zeros,
        group_size=sql.group_size, n_pad=sql.wp.shape[2],
        out_features=min(sql.out_features, sql.wp.shape[2]),
        interpret=interpret,
        # decode-regime tile: same default as the kb32 forward
        bn=2048,
        dot_dtype=jnp.bfloat16,
    )


def _kernel_ki32_t(g_ref, wp_ref, s_ref, z_ref, out_ref, *, rows_per_blk, gs, dot_dtype):
    """Transpose kernel (backward: dx = dy @ dequant(W)^T) for ki32 —
    same structure as _kernel_kpair_t with the quarter-split decode."""
    nj = pl.program_id(2)

    @pl.when(nj == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    gv = g_ref[...].astype(dot_dtype)
    w0, w1, w2, w3 = _ki32_decode_words(wp_ref[...])
    q = gs // 4
    parts = []
    for r in range(rows_per_blk):
        rows = slice(r * q, (r + 1) * q)
        s = s_ref[r, 0, :]
        s128 = s * 128.0
        zadj = s128 + s * z_ref[r, 0, :].astype(jnp.int32).astype(jnp.float32)
        for wm in (w0, w1, w2, w3):
            parts.append(
                wm[rows].astype(jnp.float32) * s128[None, :] - zadj[None, :]
            )
    wd = jnp.concatenate(parts, axis=0)                     # [BK, BN]
    out_ref[...] += jax.lax.dot_general(
        gv, wd.astype(dot_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel_k2i32(x_ref, wp_ref, s_ref, z_ref, out_ref, *, rows_per_blk, gs, dot_dtype, prefill):
    """2-bit i32-loaded kernel (per-group EIGHTH-split; see
    quantlinear._k2i32_pack): eight masked words + bitcasts decode 16 codes
    per i32 in ~24 integer ops — measured 11.4 us vs kquad's 17.9 at
    4096x4096 g128 M=1 on v5e (the fastest decode of any width)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xv = x_ref[...].astype(dot_dtype)
    t = wp_ref[...]
    mk = jnp.int32(0x00030003)
    mg = jnp.int32(0x3F803F80)
    ws = [pltpu.bitcast(((t >> (2 * m)) & mk) | mg, jnp.bfloat16)
          for m in range(8)]
    e = gs // 8
    for r in range(rows_per_blk):
        grows = slice(r * e, (r + 1) * e)
        s = s_ref[r, 0, :]
        s128 = s * 128.0
        zadj = s128 + s * z_ref[r, 0, :].astype(jnp.int32).astype(jnp.float32)
        if prefill:
            wd = jnp.concatenate(
                [w[grows].astype(jnp.float32) * s128[None, :] - zadj[None, :]
                 for w in ws], axis=0)                   # [gs, BN] dequantized
            out_ref[...] += jax.lax.dot_general(
                xv[:, r * gs:(r + 1) * gs], wd.astype(dot_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            continue
        wg = jnp.concatenate([w[grows] for w in ws], axis=0)  # [gs, BN]
        xr = xv[:, r * gs:(r + 1) * gs]
        acc = jax.lax.dot_general(
            xr, wg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xs = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
        out_ref[...] += acc * s128[None, :] - xs * zadj[None, :]


@functools.partial(
    jax.jit, static_argnames=("group_size", "n_pad", "out_features", "interpret", "bm", "bn", "dot_dtype")
)
def _matmul_k2i32(
    x2d,
    wp,
    scales3,
    sz3,
    *,
    group_size,
    n_pad,
    out_features,
    interpret,
    bm,
    bn,
    dot_dtype,
):
    m, k = x2d.shape
    gs = group_size if group_size != -1 else k
    bk = _pick_bk(k, group_size, k2i32=True)
    assert bk is not None, "unsupported shape for k2i32 pallas kernel"
    bn = min(bn, n_pad)
    rows_per_blk = bk // gs

    grid = (_cdiv(m, bm), _cdiv(n_pad, bn), k // bk)
    kernel = functools.partial(
        _kernel_k2i32, rows_per_blk=rows_per_blk, gs=gs,
        dot_dtype=dot_dtype, prefill=m >= 32,
    )
    flops = 2 * m * k * n_pad
    bytes_accessed = wp.size * 4 + m * k * x2d.dtype.itemsize + m * n_pad * 4

    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 16, bn), lambda mi, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda mi, j, ki: (mi, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x2d, wp, scales3, sz3)

    return y[:, :out_features]


def _kernel_kquad(x_ref, wp_ref, s_ref, z_ref, out_ref, *, rows_per_blk, gs, dot_dtype, prefill):
    """2-bit K-quad bitcast kernel — true 2 bits/weight HBM traffic with the
    kpair-class decode (VERDICT r1 item 7; replaces the ~2x-slower planar
    shift/mask path for 2-bit).

    Grid: (mi, j, ki); ki innermost accumulates into the same out block.
    x_ref:  [BM, BK]             activations
    wp_ref: [BK/4, BN] uint8     K-quad packed (per-GROUP half-split, see
                                 quantlinear._kquad_pack)
    s_ref:  [R, 1, BN] f32       per-group scales (R whole groups per block)
    z_ref:  [R, 1, BN] u8        per-group integer zero-points
    out_ref:[BM, BN] f32         accumulator

    Each byte holds 4 codes; TWO i32 words build bf16 patterns 0x3F80|v
    (= 1 + v/128, v in [0,3]) for codes (c0,c1) and (c2,c3); two bitcasts
    row-interleave them. Because the host packed codes per group as
    [first-half rows | second-half rows], bitcast #1's rows for group r are
    exactly the group's first gs/2 K rows and bitcast #2's its second gs/2 —
    so the kernel contracts each half against the matching x slice (no
    in-register reshuffle; Mosaic rejects lane-splitting reshapes). Dequant
    stays the exact factored per-group correction of the kpair kernel."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xv = x_ref[...].astype(dot_dtype)
    t = wp_ref[...].astype(jnp.int32)
    w1 = jnp.int32(0x3F803F80) | (t & 3) | (((t >> 2) & 3) << 16)
    w2 = jnp.int32(0x3F803F80) | ((t >> 4) & 3) | (((t >> 6) & 3) << 16)
    wb1 = pltpu.bitcast(w1, jnp.bfloat16)        # [BK/2, BN] first halves
    wb2 = pltpu.bitcast(w2, jnp.bfloat16)        # [BK/2, BN] second halves
    half = gs // 2
    for r in range(rows_per_blk):
        x0 = xv[:, r * gs: r * gs + half]
        x1 = xv[:, r * gs + half: (r + 1) * gs]
        rows = slice(r * half, (r + 1) * half)
        s = s_ref[r, 0, :]
        s128 = s * 128.0
        # u8 -> i32 -> f32 (Mosaic has no direct u8 -> float cast)
        zadj = s128 + s * z_ref[r, 0, :].astype(jnp.int32).astype(jnp.float32)
        if prefill:
            # reconstruct+GEMM regime: dequantize each half once, dot full
            wd1 = wb1[rows].astype(jnp.float32) * s128[None, :] - zadj[None, :]
            wd2 = wb2[rows].astype(jnp.float32) * s128[None, :] - zadj[None, :]
            out_ref[...] += jax.lax.dot_general(
                x0, wd1.astype(dot_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                x1, wd2.astype(dot_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # one full-group-width dot per group: sublane-concat the two
            # halves (measured 276 vs 214 GB/s for two half-width dots —
            # M=1 dot count dominates over the extra copy)
            wg = jnp.concatenate([wb1[rows], wb2[rows]], axis=0)  # [gs, BN]
            xr = xv[:, r * gs:(r + 1) * gs]
            acc = jax.lax.dot_general(
                xr, wg,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            xs = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
            out_ref[...] += acc * s128[None, :] - xs * zadj[None, :]


@functools.partial(
    jax.jit, static_argnames=("group_size", "n_pad", "out_features", "interpret", "bm", "bn", "dot_dtype")
)
def _matmul_kquad(
    x2d,
    wp,
    scales3,
    sz3,
    *,
    group_size,
    n_pad,
    out_features,
    interpret,
    bm,
    bn,
    dot_dtype,
):
    m, k = x2d.shape
    gs = group_size if group_size != -1 else k
    bk = _pick_bk(k, group_size, kquad=True)
    assert bk is not None, "unsupported shape for kquad pallas kernel"
    bn = min(bn, n_pad)
    rows_per_blk = bk // gs          # whole groups per block by construction

    grid = (_cdiv(m, bm), _cdiv(n_pad, bn), k // bk)
    kernel = functools.partial(
        _kernel_kquad, rows_per_blk=rows_per_blk, gs=gs,
        dot_dtype=dot_dtype, prefill=m >= 32,
    )
    flops = 2 * m * k * n_pad
    bytes_accessed = wp.size + m * k * x2d.dtype.itemsize + m * n_pad * 4

    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 4, bn), lambda mi, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda mi, j, ki: (mi, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x2d, wp, scales3, sz3)

    return y[:, :out_features]


def _kernel_kpair_t(g_ref, wp_ref, s_ref, z_ref, out_ref, *, rows_per_blk, gs_blk, dot_dtype):
    """Transpose kernel for the backward pass: dx = dy @ dequant(W)^T.

    The TPU analog of the reference's trainable Triton backward
    (triton_utils/kernels.py:248-339 transpose_quant_matmul_248): weights
    cross HBM once at packed width, are decoded with the same kpair bitcast,
    dequantized ONCE per tile (training M is large, so the prefill regime is
    always right), and contracted against dy with the N axes as the
    contracting dims (an NT-gemm on the MXU).

    Grid: (mi, ki, nj); nj innermost accumulates into the same out block.
    g_ref:  [BM, BN]   upstream cotangent dy
    wp_ref: [BK/2, BN] K-pair packed nibbles
    s_ref:  [R, 1, BN] per-group scales; z_ref the integer zero-points
    out_ref:[BM, BK]   f32 dx accumulator
    """
    nj = pl.program_id(2)

    @pl.when(nj == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    gv = g_ref[...].astype(dot_dtype)
    t = wp_ref[...].astype(jnp.int32)
    word = jnp.int32(0x3F803F80) | (t & 15) | ((t >> 4) << 16)
    wb = pltpu.bitcast(word, jnp.bfloat16)          # [BK, BN] = 1 + v/128
    bn = wb.shape[1]
    sg = s_ref[...].reshape(rows_per_blk, 1, bn)
    s128 = sg * 128.0
    zadj = s128 + sg * (
        z_ref[...].reshape(rows_per_blk, 1, bn).astype(jnp.int32).astype(jnp.float32)
    )
    w3 = wb.astype(jnp.float32).reshape(rows_per_blk, gs_blk, bn)
    wd = (w3 * s128 - zadj).reshape(rows_per_blk * gs_blk, bn)
    out_ref[...] += jax.lax.dot_general(
        gv,
        wd.astype(dot_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit, static_argnames=("group_size", "interpret", "bm", "bn", "dot_dtype")
)
def _matmul_kpair_t(
    g2d,                      # [M, n_pad] cotangent (already padded to n_pad)
    wp,
    scales3,
    sz3,
    *,
    group_size,
    interpret,
    bm,
    bn,
    dot_dtype,
):
    m, n_pad = g2d.shape
    k = wp.shape[0] * 2
    gs = group_size if group_size != -1 else k
    bk = _pick_bk(k, group_size, kpair=True)
    assert bk is not None, "unsupported shape for kpair transpose kernel"
    bn = min(bn, n_pad)

    if bk % gs == 0:
        rows_per_blk = bk // gs
        scale_idx = lambda mi, ki, nj: (ki, 0, nj)
    else:  # gs % bk == 0
        rows_per_blk = 1
        scale_idx = lambda mi, ki, nj: ((ki * bk) // gs, 0, nj)
    gs_blk = min(gs, bk)

    grid = (_cdiv(m, bm), k // bk, _cdiv(n_pad, bn))
    kernel = functools.partial(
        _kernel_kpair_t, rows_per_blk=rows_per_blk, gs_blk=gs_blk,
        dot_dtype=dot_dtype,
    )
    flops = 2 * m * k * n_pad
    bytes_accessed = wp.size + m * n_pad * g2d.dtype.itemsize + m * k * 4

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bn), lambda mi, ki, nj: (mi, nj), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda mi, ki, nj: (ki, nj), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), scale_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), scale_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bk), lambda mi, ki, nj: (mi, ki), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(g2d, wp, scales3, sz3)


@functools.partial(
    jax.jit, static_argnames=("group_size", "interpret", "bm", "bn", "dot_dtype")
)
def _matmul_ki32_t(
    g2d,
    wp,
    scales3,
    sz3,
    *,
    group_size,
    interpret,
    bm,
    bn,
    dot_dtype,
):
    m, n_pad = g2d.shape
    k = wp.shape[0] * 8
    gs = group_size if group_size != -1 else k
    bk = _pick_bk(k, group_size, ki32=True)
    assert bk is not None, "unsupported shape for ki32 transpose kernel"
    bn = min(bn, n_pad)
    rows_per_blk = bk // gs

    grid = (_cdiv(m, bm), k // bk, _cdiv(n_pad, bn))
    kernel = functools.partial(
        _kernel_ki32_t, rows_per_blk=rows_per_blk, gs=gs, dot_dtype=dot_dtype,
    )
    flops = 2 * m * k * n_pad
    bytes_accessed = wp.size * 4 + m * n_pad * g2d.dtype.itemsize + m * k * 4

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bn), lambda mi, ki, nj: (mi, nj), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 8, bn), lambda mi, ki, nj: (ki, nj), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, ki, nj: (ki, 0, nj), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, 1, bn), lambda mi, ki, nj: (ki, 0, nj), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bk), lambda mi, ki, nj: (mi, ki), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(g2d, wp, scales3, sz3)


def matmul_t_pallas(
    g: jnp.ndarray,
    ql: QuantLinear,
    *,
    interpret: bool = False,
    bm: int = 256,
    bnh: int = 1024,
    dot_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Backward fused matmul: ``g`` [..., N] -> ``g @ W^T`` [..., K_stored]
    (K in the runtime layout's row order, incl. load-time padding; callers
    undo kperm / slice padding — see quantlinear.matmul's custom VJP)."""
    batch_shape = g.shape[:-1]
    g2d = g.reshape(-1, g.shape[-1])
    n_loc = ql.wp.shape[1]
    if g2d.shape[-1] != n_loc:  # forward sliced lane padding off; restore it
        g2d = jnp.pad(g2d, ((0, 0), (0, n_loc - g2d.shape[-1])))
    m = g2d.shape[0]
    bm = min(bm, max(8, m))
    fn = {
        "ki32": _matmul_ki32_t,
        "kb32": _matmul_kb32_t,
    }.get(ql.layout, _matmul_kpair_t)
    dx = fn(
        g2d, ql.wp, ql.scales, ql.zeros,
        group_size=ql.group_size, interpret=interpret, bm=bm, bn=bnh,
        dot_dtype=dot_dtype,
    ).astype(g.dtype)
    return dx.reshape(*batch_shape, dx.shape[-1])


@functools.partial(
    jax.jit, static_argnames=("bits", "group_size", "n_pad", "out_features", "interpret", "bm", "bnh", "dot_dtype")
)
def _matmul_planar(
    x2d,
    wp,
    scales3,
    sz3,
    *,
    bits,
    group_size,
    n_pad,
    out_features,
    interpret,
    bm,
    bnh,
    dot_dtype,
):
    m, k = x2d.shape
    planes = _planes(bits)
    sbits = _storage_bits(bits)
    c = n_pad // planes
    gs = group_size if group_size != -1 else k
    bk = _pick_bk(k, group_size)
    assert bk is not None, "unsupported shape for pallas kernel"
    bnh = min(bnh, c)

    if bk % gs == 0:
        rows_per_blk = bk // gs
        scale_idx = lambda mi, j, ki: (ki, 0, j)
    else:  # gs % bk == 0
        rows_per_blk = 1
        scale_idx = lambda mi, j, ki: ((ki * bk) // gs, 0, j)
    gs_blk = min(gs, bk)

    grid = (_cdiv(m, bm), _cdiv(c, bnh), k // bk)

    kernel = functools.partial(
        _kernel,
        planes=planes,
        sbits=sbits,
        rows_per_blk=rows_per_blk,
        gs_blk=gs_blk,
        bk=bk,
        dot_dtype=dot_dtype,
    )

    flops = 2 * m * k * n_pad
    bytes_accessed = wp.size + m * k * x2d.dtype.itemsize + m * n_pad * 4

    y3 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bnh), lambda mi, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, planes, bnh), scale_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, planes, bnh), scale_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, planes, bnh), lambda mi, j, ki: (mi, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, planes, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x2d, wp, scales3, sz3)

    return y3.reshape(m, n_pad)[:, :out_features]


def _autotune_bench(ql: QuantLinear, m: int, bn: int):
    """Candidate builder for :func:`autotune.pick_bn`: a single-call runner
    over DUMMY operands with the node's exact shapes and dtypes (any random
    bit pattern is a valid code word), so measuring never touches — or
    uploads — the real (possibly traced) weights. ``pick_bn`` loops and
    slope-times it via :mod:`autogptq_tpu.utils.benchtime`."""
    fn = {"kpair": _matmul_kpair, "ki32": _matmul_ki32, "kb32": _matmul_kb32,
          "k2i32": _matmul_k2i32, "kquad": _matmul_kquad}.get(ql.layout)
    if fn is None:
        return None
    rng = np.random.default_rng(0)
    wp = jnp.asarray(
        rng.integers(0, 2 ** 31 - 1, size=ql.wp.shape), ql.wp.dtype
    )
    scales = jnp.asarray(
        (rng.random(ql.scales.shape) * 0.02 + 0.005), jnp.float32
    )
    zeros = jnp.asarray(rng.integers(1, 16, size=ql.zeros.shape), jnp.uint8)
    n_loc = ql.wp.shape[1]

    def one(x):
        return fn(
            x, wp, scales, zeros,
            group_size=ql.group_size, n_pad=n_loc,
            out_features=min(ql.out_features, n_loc),
            interpret=False, bm=min(256, max(8, m)), bn=bn,
            dot_dtype=jnp.bfloat16,
        )

    return one


def rms_apply(x, w, eps, plus_one):
    """Unfused RMS norm (matches models.arch.rms_norm exactly) — the
    fallback when a prenorm request is not kernel-eligible."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    wf = w.astype(jnp.float32)
    if plus_one:
        wf = 1.0 + wf
    return (xf * jax.lax.rsqrt(var + eps) * wf).astype(x.dtype)


def matmul_pallas(
    x: jnp.ndarray,
    ql: QuantLinear,
    *,
    interpret: bool = False,
    bm: int = 256,
    bnh: int = 1024,
    dot_dtype=jnp.bfloat16,
    prenorm=None,
) -> jnp.ndarray:
    # bnh default 1024: for the kpair layout, narrower N tiles reduce VMEM
    # pressure (double-buffered wp + the bf16-decoded tile) and pipeline
    # DMA/compute at finer granularity — measured 711 GB/s vs 521 at
    # bnh=2048 and 387 at bnh=4096 (same-run comparison, v5e). The planar
    # layout preferred wide tiles because its plane columns made narrow
    # DMAs strided; kpair rows are contiguous along N so 512KB blocks are
    # already DMA-efficient.
    """Fused quantized matmul. ``x``: [..., K] -> [..., N]."""
    if prenorm is not None and (
        ql.kperm is not None
        or ql.layout not in ("kb32", "ki32")
        or int(np.prod(x.shape[:-1])) >= 32
        or prenorm[0].shape[-1] != x.shape[-1]
    ):
        # not kernel-eligible: apply the norm unfused and fall through
        x = rms_apply(x, *prenorm)
        prenorm = None
    if ql.kperm is not None:
        x = jnp.take(x, ql.kperm, axis=-1)
    batch_shape = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    m = x2d.shape[0]
    bm = min(bm, max(8, m))

    # Opt-in shape autotune (AUTOGPTQ_TPU_AUTOTUNE=1): measured N-tile for
    # this (layout, shape, M-regime) replaces the 4096^2-derived default.
    # An explicit non-default bnh is always honored.
    tuned = False
    if bnh == 1024 and not interpret:
        from . import autotune as _at

        if _at.enabled():
            mult = {"ki32": 8, "kb32": 8, "k2i32": 16, "kpair": 2, "kquad": 4}
            if ql.layout in mult:
                k_stat = ql.wp.shape[0] * mult[ql.layout]
                bnh = _at.pick_bn(
                    ql.layout, k_stat, ql.wp.shape[1], ql.group_size, m,
                    default=2048 if ql.layout == "kb32" else 1024,
                    bench=lambda bn: _autotune_bench(ql, m, bn),
                )
                tuned = True

    if ql.layout == "kb32l":
        k_pad = ql.wp.shape[0] // (ql.n_pad // ql.wp.shape[2]) * 1024
        if k_pad != x2d.shape[-1]:  # load-time K padding: zero-pad x
            x2d = jnp.pad(x2d, ((0, 0), (0, k_pad - x2d.shape[-1])))
        try:
            nbuf_env = int(os.environ.get("AUTOGPTQ_TPU_KB32L_MANUAL", "0"))
        except ValueError:
            nbuf_env = 0          # "off"/"false"/garbage -> disabled
        if nbuf_env > 0 and m < 32:
            # opt-in manual nbuf-deep DMA pipeline (decode regime only)
            y = _matmul_kb32l_manual(
                x2d,
                ql.wp,
                ql.scales,
                ql.zeros,
                group_size=ql.group_size,
                n_pad=ql.n_pad,
                out_features=min(ql.out_features, ql.n_pad),
                interpret=interpret,
                nbuf=max(2, nbuf_env),
                dot_dtype=dot_dtype,
            )
            y = y.astype(x.dtype)
            if ql.bias is not None:
                y = y + ql.bias.astype(y.dtype)
            return y.reshape(*batch_shape, y.shape[-1])
        y = _matmul_kb32l(
            x2d,
            ql.wp,
            ql.scales,
            ql.zeros,
            group_size=ql.group_size,
            n_pad=ql.n_pad,
            out_features=min(ql.out_features, ql.n_pad),
            interpret=interpret,
            bm=bm,
            dot_dtype=dot_dtype,
        )
        y = y.astype(x.dtype)
        if ql.bias is not None:
            y = y + ql.bias.astype(y.dtype)
        return y.reshape(*batch_shape, y.shape[-1])

    if ql.layout == "kb32":
        k_pad = ql.wp.shape[0] * 8
        if k_pad != x2d.shape[-1]:  # load-time K padding: zero-pad x
            if prenorm is not None:   # norm weight length would mismatch
                x2d = rms_apply(x2d, *prenorm)
                prenorm = None
            x2d = jnp.pad(x2d, ((0, 0), (0, k_pad - x2d.shape[-1])))
        n_loc = ql.wp.shape[1]
        y = _matmul_kb32(
            x2d,
            ql.wp,
            ql.scales,
            ql.zeros,
            None if prenorm is None else prenorm[0],
            norm_eps=0.0 if prenorm is None else float(prenorm[1]),
            norm_plus_one=False if prenorm is None else bool(prenorm[2]),
            group_size=ql.group_size,
            n_pad=n_loc,
            out_features=min(ql.out_features, n_loc),
            interpret=interpret,
            bm=bm,
            # decode bn sweep (same-process, 4096^2 g128): 2048 beats 1024
            # for kb32 (14.94 vs 15.52 us) — the concat-free body leaves
            # VMEM headroom the wider tile can use. Honor explicit/tuned bnh.
            bn=bnh if tuned else (2048 if bnh == 1024 else bnh),
            dot_dtype=dot_dtype,
        )
        y = y.astype(x.dtype)
        if ql.bias is not None:
            y = y + ql.bias.astype(y.dtype)
        return y.reshape(*batch_shape, y.shape[-1])

    if ql.layout == "ki32":
        k_pad = ql.wp.shape[0] * 8
        if k_pad != x2d.shape[-1]:  # load-time K padding: zero-pad x
            if prenorm is not None:   # norm weight length would mismatch
                x2d = rms_apply(x2d, *prenorm)
                prenorm = None
            x2d = jnp.pad(x2d, ((0, 0), (0, k_pad - x2d.shape[-1])))
        n_loc = ql.wp.shape[1]
        y = _matmul_ki32(
            x2d,
            ql.wp,
            ql.scales,
            ql.zeros,
            None if prenorm is None else prenorm[0],
            norm_eps=0.0 if prenorm is None else float(prenorm[1]),
            norm_plus_one=False if prenorm is None else bool(prenorm[2]),
            group_size=ql.group_size,
            n_pad=n_loc,
            out_features=min(ql.out_features, n_loc),
            interpret=interpret,
            bm=bm,
            bn=bnh,
            dot_dtype=dot_dtype,
        )
        y = y.astype(x.dtype)
        if ql.bias is not None:
            y = y + ql.bias.astype(y.dtype)
        return y.reshape(*batch_shape, y.shape[-1])

    if ql.layout == "koct":
        # 8-bit: one byte per weight; run the kpair kernel over VIRTUAL rows
        # (x, 128x) per logical row — see _kernel_kpair's koct notes.
        k_pad = ql.wp.shape[0]
        if k_pad != x2d.shape[-1]:  # load-time K padding: zero-pad x
            x2d = jnp.pad(x2d, ((0, 0), (0, k_pad - x2d.shape[-1])))
        xq = jnp.stack([x2d, x2d * 128.0], axis=-1).reshape(x2d.shape[0], -1)
        n_loc = ql.wp.shape[1]
        gs_v = ql.group_size * 2 if ql.group_size != -1 else -1
        y = _matmul_kpair(
            xq,
            ql.wp,
            ql.scales,
            ql.zeros,
            group_size=gs_v,
            n_pad=n_loc,
            out_features=min(ql.out_features, n_loc),
            interpret=interpret,
            bm=bm,
            bn=bnh,
            dot_dtype=dot_dtype,
            variant="koct",
        )
        y = y.astype(x.dtype)
        if ql.bias is not None:
            y = y + ql.bias.astype(y.dtype)
        return y.reshape(*batch_shape, y.shape[-1])

    if ql.layout == "k2i32":
        k_pad = ql.wp.shape[0] * 16
        if k_pad != x2d.shape[-1]:  # load-time K padding: zero-pad x
            x2d = jnp.pad(x2d, ((0, 0), (0, k_pad - x2d.shape[-1])))
        n_loc = ql.wp.shape[1]
        y = _matmul_k2i32(
            x2d,
            ql.wp,
            ql.scales,
            ql.zeros,
            group_size=ql.group_size,
            n_pad=n_loc,
            out_features=min(ql.out_features, n_loc),
            interpret=interpret,
            bm=bm,
            bn=bnh,
            dot_dtype=dot_dtype,
        )
        y = y.astype(x.dtype)
        if ql.bias is not None:
            y = y + ql.bias.astype(y.dtype)
        return y.reshape(*batch_shape, y.shape[-1])

    if ql.layout == "kquad":
        k_pad = ql.wp.shape[0] * 4
        if k_pad != x2d.shape[-1]:  # load-time K padding: zero-pad x
            x2d = jnp.pad(x2d, ((0, 0), (0, k_pad - x2d.shape[-1])))
        n_loc = ql.wp.shape[1]
        y = _matmul_kquad(
            x2d,
            ql.wp,
            ql.scales,
            ql.zeros,
            group_size=ql.group_size,
            n_pad=n_loc,
            out_features=min(ql.out_features, n_loc),
            interpret=interpret,
            bm=bm,
            bn=bnh,
            dot_dtype=dot_dtype,
        )
        y = y.astype(x.dtype)
        if ql.bias is not None:
            y = y + ql.bias.astype(y.dtype)
        return y.reshape(*batch_shape, y.shape[-1])

    if ql.layout == "kpair":
        k_pad = ql.wp.shape[0] * 2
        if k_pad != x2d.shape[-1]:  # load-time K padding: zero-pad x
            x2d = jnp.pad(x2d, ((0, 0), (0, k_pad - x2d.shape[-1])))
        # widths derive from the (possibly shard_map-local) wp, NOT the
        # static metadata — under explicit TP the node carries global
        # in/out_features but holds only its shard
        n_loc = ql.wp.shape[1]
        y = _matmul_kpair(
            x2d,
            ql.wp,
            ql.scales,
            ql.zeros,
            group_size=ql.group_size,
            n_pad=n_loc,
            out_features=min(ql.out_features, n_loc),
            interpret=interpret,
            bm=bm,
            bn=bnh,
            dot_dtype=dot_dtype,
        )
        y = y.astype(x.dtype)
        if ql.bias is not None:
            y = y + ql.bias.astype(y.dtype)
        return y.reshape(*batch_shape, y.shape[-1])

    y = _matmul_planar(
        x2d,
        ql.wp,
        ql.scales,
        ql.zeros,
        bits=ql.bits,
        group_size=ql.group_size,
        n_pad=ql.n_pad,
        out_features=ql.out_features,
        interpret=interpret,
        bm=bm,
        bnh=bnh,
        dot_dtype=dot_dtype,
    )
    y = y.astype(x.dtype)
    if ql.bias is not None:
        y = y + ql.bias.astype(y.dtype)
    return y.reshape(*batch_shape, ql.out_features)


__all__ = ["matmul_pallas", "matmul_t_pallas", "supported"]
