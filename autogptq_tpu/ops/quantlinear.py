"""Quantized linear layers as functional pytrees.

This replaces the reference's per-backend ``QuantLinear`` nn.Module zoo
(/root/reference/auto_gptq/nn_modules/qlinear/ — cuda_64/256, exllama,
exllamav2, marlin, triton, qigen, hpu) with ONE functional representation and
two execution paths:

  * :class:`PackedQuantLinear` — the reference on-disk layout (qweight /
    qzeros / scales / g_idx), used for checkpoint I/O.
  * :class:`QuantLinear` — the TPU runtime layout, built once at load time
    (the analog of exllamav2's load-time weight shuffle, q_matrix.cu:19-42).
    Two storage layouts exist, selected by bit width:

      - ``layout="kpair"`` (3/4-bit, the hot path): byte ``[k', n]`` holds
        ``W[2k', n]`` in the low nibble and ``W[2k'+1, n]`` in the high
        nibble — i.e. two ADJACENT K rows of the same output column. The
        Pallas kernel widens the byte to i32, builds the bf16 bit pattern
        ``0x3F80 | v`` (= ``1 + v/128``) for both nibbles in one i32
        word and does a single i32->bf16 bitcast, which Mosaic defines as
        row-interleaving — so the nibble order above lands the weights in
        exactly K order with ~2.5 integer VPU ops per weight and ZERO
        int->float conversions. Dequant is exact via a per-group factored
        correction (see ops/pallas/gemm.py). 3-bit is stored padded to
        nibbles (4 bits/weight in HBM) — the on-disk format stays true 3-bit.
      - ``layout="planar"`` (2/8-bit): byte ``[k, j]`` holds plane ``p`` of
        logical column ``j + p*C`` in bit field ``p*sbits..``; in-kernel
        unpack is shift/mask per plane. 2-bit uses 4 planes (true 2 bits of
        HBM traffic per weight); 8-bit is direct.
      - per-group f32 ``scales`` and u8 integer ``zeros`` (s*z is computed
        in f32 in-kernel on tiny per-group slices — exact, and 3 bytes per
        group-column less HBM traffic than a premultiplied f32 scale*zero
        array); dequant is a fused multiply-subtract (planar) or a factored
        post-dot correction (kpair). Both are stored ``[G, planes, C]``
        (kpair: planes dim == 1, C == n_pad) — keeping the group axis first
        and the lane axis last for Mosaic-friendly tiling and so the same
        PartitionSpecs shard either layout.
      - ``desc_act`` (arbitrary ``g_idx``) is handled by sorting K rows into
        group-sequential order at load and remapping activations with a
        gather (the exllama ``make_sequential``/``x_map`` idea,
        q4_matrix.cu:63-150, done once functionally).

  * ``matmul(x, ql)`` dispatches to the Pallas fused dequant-matmul kernel on
    TPU or to an XLA dequant+dot fallback (the analog of the reference's
    pure-torch fallback, qlinear_cuda_old.py:291-350) everywhere else.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import native, packing


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


@struct.dataclass
class PackedQuantLinear:
    """Reference on-disk layout (checkpoint interop). All arrays np/jnp."""

    qweight: jnp.ndarray          # int32 [K*bits/32, N]
    qzeros: jnp.ndarray           # int32 [G, N*bits/32]
    scales: jnp.ndarray           # f16   [G, N]
    g_idx: jnp.ndarray            # int32 [K]
    bias: Optional[jnp.ndarray]   # [N] or None
    bits: int = struct.field(pytree_node=False, default=4)
    group_size: int = struct.field(pytree_node=False, default=-1)
    in_features: int = struct.field(pytree_node=False, default=0)
    out_features: int = struct.field(pytree_node=False, default=0)


# How many logical columns share one uint8 (plane count).
def _planes(bits: int) -> int:
    return {2: 4, 3: 2, 4: 2, 8: 1}[bits]


# Effective bits of the runtime storage (3-bit is padded into nibbles).
def _storage_bits(bits: int) -> int:
    return {2: 2, 3: 4, 4: 4, 8: 8}[bits]


@struct.dataclass
class QuantLinear:
    """TPU runtime layout. ``n_pad`` is the padded output width (lane-aligned);
    ``matmul`` slices the result back to ``out_features``.

    ``scales``/``zeros`` are stored in the 3-D view ``[G, planes, C]``
    (planar: C = n_pad / planes; kpair: planes = 1, C = n_pad) so that
    sharding their last axis and ``wp``'s last axis with the same mesh axis
    keeps columns and their quantization params on the same device."""

    wp: jnp.ndarray               # uint8; planar: [K, C]; kpair: [K/2, n_pad]
    scales: jnp.ndarray           # f32 [G, planes, C]
    zeros: jnp.ndarray            # u8  [G, planes, C] integer zero-points
    kperm: Optional[jnp.ndarray]  # int32 [K] activation gather for desc_act
    bias: Optional[jnp.ndarray]   # [N] original width
    bits: int = struct.field(pytree_node=False, default=4)
    group_size: int = struct.field(pytree_node=False, default=-1)
    in_features: int = struct.field(pytree_node=False, default=0)
    out_features: int = struct.field(pytree_node=False, default=0)
    n_pad: int = struct.field(pytree_node=False, default=0)
    layout: str = struct.field(pytree_node=False, default="planar")

    @property
    def planes(self) -> int:
        if self.layout in ("ki32", "kb32", "kb32l", "kpair", "kquad", "k2i32", "koct"):
            return 1
        return _planes(self.bits)

    @property
    def groups(self) -> int:
        return self.scales.shape[0]


# ---------------------------------------------------------------------------
# Runtime layout construction (host side, NumPy).
# ---------------------------------------------------------------------------


def _plane_pack(values: np.ndarray, bits: int, n_pad: int) -> np.ndarray:
    """Pack integer weights [K, n_pad] into planar uint8 [K, n_pad/planes]."""
    planes = _planes(bits)
    sbits = _storage_bits(bits)
    k = values.shape[0]
    cols = n_pad // planes
    v = values.reshape(k, planes, cols).astype(np.uint8)
    out = np.zeros((k, cols), dtype=np.uint8)
    for p in range(planes):
        out |= v[:, p, :] << (sbits * p)
    return out


def plane_unpack_np(wp: np.ndarray, bits: int) -> np.ndarray:
    """Inverse of `_plane_pack` (NumPy, for tests)."""
    planes = _planes(bits)
    sbits = _storage_bits(bits)
    mask = np.uint8((1 << sbits) - 1)
    parts = [((wp >> np.uint8(sbits * p)) & mask) for p in range(planes)]
    return np.concatenate(parts, axis=1)


def _kpair_pack(values: np.ndarray) -> np.ndarray:
    """Pack integer weights [K, n_pad] (values < 16) into K-pair nibbles:
    byte[k', n] = v[2k', n] | v[2k'+1, n] << 4."""
    return (values[0::2, :] | (values[1::2, :] << 4)).astype(np.uint8)


def kpair_unpack_np(wp: np.ndarray) -> np.ndarray:
    """Inverse of `_kpair_pack` (NumPy, for tests)."""
    k2, n = wp.shape
    out = np.empty((k2 * 2, n), dtype=np.uint8)
    out[0::2] = wp & np.uint8(0xF)
    out[1::2] = wp >> np.uint8(4)
    return out


def _ki32_pack(values: np.ndarray, gs: int) -> np.ndarray:
    """Pack nibble codes (3/4-bit, values < 16) [K, n_pad] into int32
    [K/8, n_pad], per-GROUP quarter-split layout: the kernel's four masked
    words + bitcasts each decode one contiguous quarter of every group
    (~11 integer ops per 8 codes vs 20 for the byte-loaded kpair path —
    measured 15.7 vs 19.2 us on v5e decode):

        word j of group: byte0 = q0[2j] | q1[2j] << 4
                         byte1 = q2[2j] | q3[2j] << 4
                         byte2 = q0[2j+1] | q1[2j+1] << 4
                         byte3 = q2[2j+1] | q3[2j+1] << 4

    so (t >> 4m) & 0x000F000F | 0x3F803F80 bitcasts to quarter m's rows in
    order (low 16 bits -> even rows, high -> odd). Per-group (not per-tile)
    splitting keeps group-aligned row-parallel shards valid."""
    k, n = values.shape
    assert gs % 8 == 0 and k % gs == 0
    v = values.reshape(k // gs, gs, n).astype(np.uint32)
    q = gs // 4
    q0, q1 = v[:, 0:q], v[:, q:2 * q]
    q2, q3 = v[:, 2 * q:3 * q], v[:, 3 * q:]
    b0 = q0[:, 0::2] | (q1[:, 0::2] << 4)
    b1 = q2[:, 0::2] | (q3[:, 0::2] << 4)
    b2 = q0[:, 1::2] | (q1[:, 1::2] << 4)
    b3 = q2[:, 1::2] | (q3[:, 1::2] << 4)
    word = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
    return word.reshape(k // 8, n).astype(np.int32)


def ki32_unpack_np(wp: np.ndarray, gs: int) -> np.ndarray:
    """Inverse of `_ki32_pack` (NumPy, host-side)."""
    k8, n = wp.shape
    k = k8 * 8
    w = wp.astype(np.uint32).reshape(k // gs, gs // 8, n)
    q = gs // 4
    out = np.empty((k // gs, gs, n), np.uint8)
    for m in range(4):
        pair = (w >> np.uint32(4 * m))
        out[:, m * q + 0:(m + 1) * q:2] = (pair & np.uint32(15)).astype(np.uint8)
        out[:, m * q + 1:(m + 1) * q:2] = ((pair >> np.uint32(16)) & np.uint32(15)).astype(np.uint8)
    return out.reshape(k, n)


def _k2i32_pack(values: np.ndarray, gs: int) -> np.ndarray:
    """Pack 2-bit codes [K, n_pad] into int32 [K/16, n_pad], per-GROUP
    EIGHTH-split: word m of the kernel ((t >> 2m) & 0x00030003 | 0x3F803F80)
    decodes eighth m of every group, even rows in the low half-word —
    16 codes per i32 in ~24 integer ops (~1.5/code vs ~3.25 for kquad;
    measured 11.4 vs 17.9 us on v5e decode). Needs gs % 128 == 0 so each
    eighth is >= 16 sublanes (bf16 tile alignment)."""
    k, n = values.shape
    assert gs % 128 == 0 and k % gs == 0
    v = values.reshape(k // gs, gs, n).astype(np.uint32)
    e = gs // 8
    word = np.zeros((k // gs, e // 2, n), np.uint32)
    for m in range(8):
        eighth = v[:, m * e:(m + 1) * e]
        word |= eighth[:, 0::2] << np.uint32(2 * m)
        word |= eighth[:, 1::2] << np.uint32(16 + 2 * m)
    return word.reshape(k // 16, n).astype(np.int32)


def k2i32_unpack_np(wp: np.ndarray, gs: int) -> np.ndarray:
    """Inverse of `_k2i32_pack` (NumPy, host-side)."""
    k16, n = wp.shape
    k = k16 * 16
    w = wp.astype(np.uint32).reshape(k // gs, gs // 16, n)
    e = gs // 8
    out = np.empty((k // gs, gs, n), np.uint8)
    for m in range(8):
        pair = w >> np.uint32(2 * m)
        out[:, m * e + 0:(m + 1) * e:2] = (pair & np.uint32(3)).astype(np.uint8)
        out[:, m * e + 1:(m + 1) * e:2] = ((pair >> np.uint32(16)) & np.uint32(3)).astype(np.uint8)
    return out.reshape(k, n)


def _kquad_pack(values: np.ndarray, gs: int) -> np.ndarray:
    """Pack 2-bit weights [K, n_pad] (values < 4) into K-quad bytes, split
    per GROUP of ``gs`` rows so the kernel's two-bitcast decode lands rows in
    contiguous half-group order (see pallas/gemm._kernel_kquad):

        byte[g, j, n] = v[g*gs + 2j] | v[g*gs + 2j+1] << 2
                      | v[g*gs + gs/2 + 2j] << 4 | v[g*gs + gs/2 + 2j+1] << 6

    Per-group (not per-K-tile) splitting keeps the layout independent of the
    kernel's block size, so group-aligned row-parallel shards stay valid."""
    k, n = values.shape
    assert gs % 4 == 0 and k % gs == 0
    v = values.reshape(k // gs, gs, n).astype(np.uint8)
    a, b = v[:, : gs // 2], v[:, gs // 2:]
    out = a[:, 0::2] | (a[:, 1::2] << 2) | (b[:, 0::2] << 4) | (b[:, 1::2] << 6)
    return out.reshape(k // 4, n)


def kquad_unpack_np(wp: np.ndarray, gs: int) -> np.ndarray:
    """Inverse of `_kquad_pack` (NumPy, for tests)."""
    k4, n = wp.shape
    k = k4 * 4
    b4 = wp.reshape(k // gs, gs // 4, n)
    first = np.empty((k // gs, gs // 2, n), np.uint8)
    second = np.empty_like(first)
    first[:, 0::2] = b4 & np.uint8(3)
    first[:, 1::2] = (b4 >> np.uint8(2)) & np.uint8(3)
    second[:, 0::2] = (b4 >> np.uint8(4)) & np.uint8(3)
    second[:, 1::2] = b4 >> np.uint8(6)
    return np.concatenate([first, second], axis=1).reshape(k, n)


def from_packed(packed: PackedQuantLinear, layout: Optional[str] = None) -> QuantLinear:
    """Build the TPU runtime layout from reference-format tensors (host-side,
    one-time at load).

    ``layout`` overrides the automatic choice (tests/experiments). Defaults:
    3/4-bit -> kpair, 2-bit -> kquad, 8-bit -> planar. 8-bit measured on
    v5e: planar 532 GB/s (one cast per weight) vs the koct virtual-row
    kernel 438 GB/s (the doubled dot width costs more than the cast saves),
    so koct stays opt-in."""
    bits = packed.bits
    k, n = packed.in_features, packed.out_features
    qweight = np.asarray(packed.qweight)
    qzeros = np.asarray(packed.qzeros)
    scales = np.asarray(packed.scales).astype(np.float32)
    g_idx = np.asarray(packed.g_idx)

    zeros = packing.unpack_qzeros(qzeros, bits)[:, :n]         # [G, N] uint32
    g = scales.shape[0]

    # desc_act: sort rows into group-sequential order; remap x at runtime.
    trivial_gs = packed.group_size if packed.group_size != -1 else k
    trivial = np.array_equal(g_idx, np.arange(k) // trivial_gs)
    if trivial:
        kperm = None
    else:
        counts = np.bincount(g_idx, minlength=g)
        if not np.all(counts == counts[0]):
            raise ValueError(
                "non-uniform g_idx group sizes are not supported by the "
                "runtime layout (GPTQ always produces uniform groups)"
            )
        kperm = np.argsort(g_idx, kind="stable").astype(np.int32)

    # Pad N to a lane-friendly multiple. Padded columns get scale=0 so they
    # contribute nothing and dequantize to 0.
    gs_eff = packed.group_size if packed.group_size != -1 else k
    if layout is None:
        # ki32 quarter slices are gs/4 SUBLANES of a bf16 value; gs % 32
        # keeps the pairing even and is hardware-validated down to gs=32
        # (q=8-row slices compile and run correctly; measured 31.9 us vs
        # kpair's 33.0 at gs=32 — small groups are slower either way).
        if (
            _storage_bits(bits) == 4 and k >= 1024
            and gs_eff % 32 == 0 and 256 % gs_eff == 0 and k % gs_eff == 0
            and _round_up(k, 1024) - k <= k // 8
        ):
            # Superblock quarter-split: same words as ki32 at granularity
            # 1024, but the kernel slices groups directly out of the four
            # decoded quarters (no per-group concat) — measured 14.9 vs
            # 15.7 us at 4096^2 g128. Needs K padded to 1024 multiples
            # (only taken when the pad is <= K/8) and whole groups per
            # 256-row quarter (gs | 256).
            layout = "kb32"
        elif (
            _storage_bits(bits) == 4 and k % 8 == 0
            and gs_eff % 32 == 0 and k % gs_eff == 0
        ):
            layout = "ki32"   # i32-loaded quarter-split: fastest decode
        elif _storage_bits(bits) == 4 and k % 2 == 0:
            layout = "kpair"
        elif bits == 2 and gs_eff % 128 == 0 and k % gs_eff == 0:
            layout = "k2i32"  # i32-loaded eighth-split: fastest 2-bit decode
        elif bits == 2 and gs_eff % 4 == 0 and k % gs_eff == 0:
            layout = "kquad"  # true 2 bits/weight with the bitcast decode
        else:
            layout = "planar"
    planes = 1 if layout in ("ki32", "kb32", "kb32l", "kpair", "kquad", "k2i32", "koct") else _planes(bits)
    n_pad = _round_up(n, 128 * planes)
    if layout == "kb32l":
        # tile-contiguous storage: N must cover whole 1024-wide blocks
        # (padded columns carry zero scales, contributing exactly 0)
        n_pad = _round_up(n, 1024)

    # Fused native repack (load-time hot path): qweight words -> runtime
    # words in ONE multithreaded C++ pass, folding in the kperm gather and
    # all K/N padding — no [K, N] uint32 intermediate (measured 2 ms vs
    # 108 ms for the NumPy unpack+pack at 4096^2). Covers the DEFAULT
    # layouts: ki32 (4-bit direct; 3-bit via native unpack + values pack)
    # and k2i32 (2-bit direct).
    fused = None
    if native.available():
        # kb32 shares the ki32 entry points: its words ARE the ki32 pack at
        # granularity 1024 (superblock) instead of the group size.
        if layout in ("ki32", "kb32", "kb32l") and bits == 4 and k % 8 == 0:
            fused = "ki32_qw"
        elif layout in ("ki32", "kb32", "kb32l"):
            fused = "ki32_vals"
        elif layout == "k2i32" and bits == 2 and k % 16 == 0:
            fused = "k2i32_qw"

    def _w_int_slow(qw, b, k_, kp, pad_n):
        out = packing.unpack_qweight(qw, b)[:k_]               # [K, N] uint32
        if kp is not None:
            out = out[kp[:k_]]
        if pad_n:
            out = np.pad(out, ((0, 0), (0, pad_n)))
        return out

    w_int = None if fused else _w_int_slow(qweight, bits, k, kperm, n_pad - n)
    if n_pad != n:
        scales = np.pad(scales, ((0, 0), (0, n_pad - n)))
        zeros = np.pad(zeros, ((0, 0), (0, n_pad - n)))

    if layout in ("ki32", "kb32", "kb32l"):
        if layout == "kb32l" and not (
            gs_eff <= 256 and 256 % gs_eff == 0 and gs_eff % 32 == 0
            and k % gs_eff == 0
        ):
            # Validate BEFORE the (expensive, multithreaded) native repack
            # below — an unsupported shape must fail fast, not after paying
            # the full per-layer repack cost.
            raise ValueError(
                f"kb32l requires group_size | 256, group_size % 32 == 0 "
                f"and group-aligned K (got K={k}, gs={gs_eff})"
            )
        # Same K-padding rule as kpair below (whole zero-scale groups).
        from .pallas.gemm import _pick_bk  # local: avoid import cycle at top

        k_out = k
        if layout in ("kb32", "kb32l"):
            # The superblock IS the K tile: K must be a 1024 multiple.
            # gs | 256 | 1024 (selection rule), so padding adds whole
            # zero-scale groups and stays exact with zero-padded x.
            k_out = _round_up(k, 1024)
            if k_out != k:
                g_pad = _cdiv(k_out, packed.group_size)
                if g_pad > g:
                    scales = np.pad(scales, ((0, g_pad - g), (0, 0)))
                    zeros = np.pad(zeros, ((0, g_pad - g), (0, 0)))
                    g = g_pad
        else:
            bk = _pick_bk(k, packed.group_size, ki32=True)
            if k >= 2048 and (bk is None or bk < 512) and packed.group_size != -1:
                k_pad = _round_up(k, 1024)
                if (_pick_bk(k_pad, packed.group_size, ki32=True) or 0) >= 512:
                    k_out = k_pad
                    g_pad = _cdiv(k_pad, packed.group_size)
                    if g_pad > g:
                        scales = np.pad(scales, ((0, g_pad - g), (0, 0)))
                        zeros = np.pad(zeros, ((0, g_pad - g), (0, 0)))
                        g = g_pad
        # kb32's pack granularity is the 1024-row superblock, not the group.
        gs_k = 1024 if layout in ("kb32", "kb32l") else min(gs_eff, k_out)
        if fused == "ki32_qw":
            wp = native.repack_ki32(qweight, kperm, k, k_out, n, n_pad, gs_k)
        elif fused == "ki32_vals":
            vals = packing.unpack_qweight(qweight, bits)[:k]
            wp = native.pack_ki32_values(vals, kperm, k, k_out, n, n_pad, gs_k)
        else:
            wp = None
        if wp is None:
            if w_int is None:  # native call failed late; rebuild the slow way
                w_int = _w_int_slow(qweight, bits, k, kperm, n_pad - n)
            if k_out != k:
                w_int = np.pad(w_int, ((0, k_out - k), (0, 0)))
            wp = _ki32_pack(w_int, gs_k)
        if k_out != k and kperm is not None:
            kperm = np.pad(kperm, (0, k_out - k))
        if layout == "kb32l":
            # Linearize into tile-contiguous [(n_pad/1024)*(k/1024), 128,
            # 1024] blocks: each kernel grid step then DMAs one fully
            # sequential HBM span (see gemm._matmul_kb32l). Shape support
            # was validated up front (before the repack work).
            nbk = wp.shape[0] // 128
            nbn = n_pad // 1024
            wp = np.ascontiguousarray(
                np.asarray(wp).reshape(nbk, 128, nbn, 1024)
                .transpose(2, 0, 1, 3)
            ).reshape(nbn * nbk, 128, 1024)
    elif layout == "kpair":
        # Pad K so the Pallas kernel can use a large K tile (bk>=512):
        # measured ~490 GB/s at bk>=512 vs ~374 at bk=256 for the
        # down_proj shape (K=11008). Runtime pads x with ZEROS, which makes
        # any padded wp/scales values contribute exactly 0 (dot term and
        # group-sum term both vanish), so padding is unconditionally safe.
        from .pallas.gemm import _pick_bk  # local: avoid import cycle at top

        bk = _pick_bk(k, packed.group_size, kpair=True)
        if k >= 2048 and (bk is None or bk < 512):
            k_pad = _round_up(k, 1024)
            if (_pick_bk(k_pad, packed.group_size, kpair=True) or 0) >= 512:
                w_int = np.pad(w_int, ((0, k_pad - k), (0, 0)))
                if kperm is not None:
                    # Keep kperm the same length as the padded K so a
                    # row-parallel K shard of wp pairs with the SAME shard of
                    # kperm (parallel/sharding.py). The padded entries gather
                    # arbitrary x values, which is safe: they land in padded
                    # groups whose scales are zero (desc_act implies
                    # group_size != -1, so whole zero-scale groups are added
                    # below), contributing exactly 0 to the output.
                    kperm = np.pad(kperm, (0, k_pad - k))
                if packed.group_size != -1:
                    # whole new groups; padded scale rows are zero (gs == -1
                    # keeps its single group — zero-padded x already makes
                    # the padded rows contribute nothing)
                    g_pad = _cdiv(k_pad, packed.group_size)
                    if g_pad > g:
                        scales = np.pad(scales, ((0, g_pad - g), (0, 0)))
                        zeros = np.pad(zeros, ((0, g_pad - g), (0, 0)))
                        g = g_pad
        wp = native.repack_kint4(w_int.astype(np.uint32), None)
        if wp is None:
            wp = _kpair_pack(w_int.astype(np.uint8))
    elif layout == "kquad":
        # Pad K to enable a large K tile, whole zero-scale groups only
        # (mirrors the kpair rule above; zero-padded x keeps it exact).
        from .pallas.gemm import _pick_bk

        bk = _pick_bk(k, packed.group_size, kquad=True)
        if k >= 2048 and (bk is None or bk < 512) and packed.group_size != -1:
            k_pad = _round_up(k, 1024)
            if (_pick_bk(k_pad, packed.group_size, kquad=True) or 0) >= 512:
                w_int = np.pad(w_int, ((0, k_pad - k), (0, 0)))
                if kperm is not None:
                    kperm = np.pad(kperm, (0, k_pad - k))
                g_pad = _cdiv(k_pad, packed.group_size)
                if g_pad > g:
                    scales = np.pad(scales, ((0, g_pad - g), (0, 0)))
                    zeros = np.pad(zeros, ((0, g_pad - g), (0, 0)))
                    g = g_pad
        wp = _kquad_pack(w_int.astype(np.uint8), min(gs_eff, w_int.shape[0]))
    elif layout == "k2i32":
        from .pallas.gemm import _pick_bk

        k_out = k
        bk = _pick_bk(k, packed.group_size, k2i32=True)
        if k >= 2048 and (bk is None or bk < 512) and packed.group_size != -1:
            k_pad = _round_up(k, 1024)
            if (_pick_bk(k_pad, packed.group_size, k2i32=True) or 0) >= 512:
                k_out = k_pad
                g_pad = _cdiv(k_pad, packed.group_size)
                if g_pad > g:
                    scales = np.pad(scales, ((0, g_pad - g), (0, 0)))
                    zeros = np.pad(zeros, ((0, g_pad - g), (0, 0)))
                    g = g_pad
        gs_k = min(gs_eff, k_out)
        wp = (
            native.repack_k2i32(qweight, kperm, k, k_out, n, n_pad, gs_k)
            if fused == "k2i32_qw"
            else None
        )
        if wp is None:
            if w_int is None:
                w_int = _w_int_slow(qweight, bits, k, kperm, n_pad - n)
            if k_out != k:
                w_int = np.pad(w_int, ((0, k_out - k), (0, 0)))
            wp = _k2i32_pack(w_int, gs_k)
        if k_out != k and kperm is not None:
            kperm = np.pad(kperm, (0, k_out - k))
    elif layout == "koct":
        # K padding for a large virtual-row tile (bk >= 512 over 2K rows)
        from .pallas.gemm import _pick_bk

        gs_v = packed.group_size * 2 if packed.group_size != -1 else -1
        bk = _pick_bk(2 * k, gs_v, kpair=True)
        if k >= 1024 and (bk is None or bk < 512) and packed.group_size != -1:
            k_pad = _round_up(k, 512)
            if (_pick_bk(2 * k_pad, gs_v, kpair=True) or 0) >= 512:
                w_int = np.pad(w_int, ((0, k_pad - k), (0, 0)))
                if kperm is not None:
                    kperm = np.pad(kperm, (0, k_pad - k))
                g_pad = _cdiv(k_pad, packed.group_size)
                if g_pad > g:
                    scales = np.pad(scales, ((0, g_pad - g), (0, 0)))
                    zeros = np.pad(zeros, ((0, g_pad - g), (0, 0)))
                    g = g_pad
        wp = w_int.astype(np.uint8)           # [K, n_pad], one byte/weight
    else:
        wp = _plane_pack(w_int, bits, n_pad)
    c = n_pad // planes
    scales = scales.reshape(g, planes, c)
    zeros = zeros.astype(np.uint8).reshape(g, planes, c)

    return QuantLinear(
        wp=jnp.asarray(wp),
        scales=jnp.asarray(scales),
        zeros=jnp.asarray(zeros),
        kperm=None if kperm is None else jnp.asarray(kperm),
        bias=None if packed.bias is None else jnp.asarray(packed.bias),
        bits=bits,
        group_size=packed.group_size,
        in_features=k,
        out_features=n,
        n_pad=n_pad,
        layout=layout,
    )


# ---------------------------------------------------------------------------
# XLA fallback execution path.
# ---------------------------------------------------------------------------


def dequantize_xla(ql: QuantLinear, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dequantize the runtime layout to a dense ``[K, n_pad]`` matrix.

    Note: rows are in kperm order when desc_act; pair with remapped x.
    """
    if ql.layout in ("ki32", "kb32", "kb32l"):
        if ql.layout == "kb32l":
            # de-linearize the tile-contiguous blocks back to [K/8, n_pad]
            wp3 = ql.wp
            bn = wp3.shape[2]
            nbn = ql.n_pad // bn
            nbk = wp3.shape[0] // nbn
            wp2 = wp3.reshape(nbn, nbk, 128, bn).transpose(1, 2, 0, 3)
            wp2 = wp2.reshape(nbk * 128, nbn * bn)
            gs = 1024
        else:
            wp2 = ql.wp
            if ql.layout == "kb32":
                gs = 1024  # pack granularity = superblock, not the group size
            else:
                gs = ql.group_size if ql.group_size != -1 else ql.wp.shape[0] * 8
        n_loc = wp2.shape[1]
        w = wp2.view(jnp.uint32).reshape(-1, gs // 8, n_loc)  # [G, gs/8, N]
        quarters = []
        for m in range(4):
            pair = w >> np.uint32(4 * m)
            even = (pair & np.uint32(15))
            odd = (pair >> np.uint32(16)) & np.uint32(15)
            quarters.append(
                jnp.stack([even, odd], axis=2).reshape(-1, gs // 4, n_loc)
            )
        w_int = jnp.concatenate(quarters, axis=1).reshape(-1, n_loc).astype(jnp.float32)
    elif ql.layout == "kpair":
        lo = ql.wp & np.uint8(0xF)
        hi = ql.wp >> np.uint8(4)
        # widths derive from the (possibly shard_map-local) arrays, NOT the
        # static metadata — under explicit TP the node carries GLOBAL
        # in/out_features but holds only its shard
        w_int = jnp.stack([lo, hi], axis=1).reshape(-1, ql.wp.shape[1]).astype(jnp.float32)
    elif ql.layout == "k2i32":
        n_loc = ql.wp.shape[1]
        gs = ql.group_size if ql.group_size != -1 else ql.wp.shape[0] * 16
        w = ql.wp.view(jnp.uint32).reshape(-1, gs // 16, n_loc)
        eighths = []
        for m in range(8):
            pair = w >> np.uint32(2 * m)
            even = pair & np.uint32(3)
            odd = (pair >> np.uint32(16)) & np.uint32(3)
            eighths.append(
                jnp.stack([even, odd], axis=2).reshape(-1, gs // 8, n_loc)
            )
        w_int = jnp.concatenate(eighths, axis=1).reshape(-1, n_loc).astype(jnp.float32)
    elif ql.layout == "koct":
        w_int = ql.wp.astype(jnp.float32)              # [K, n_loc] bytes
    elif ql.layout == "kquad":
        n_loc = ql.wp.shape[1]
        gs = ql.group_size if ql.group_size != -1 else ql.wp.shape[0] * 4
        b4 = ql.wp.reshape(-1, gs // 4, n_loc).astype(jnp.int32)
        first = jnp.stack([b4 & 3, (b4 >> 2) & 3], axis=2).reshape(-1, gs // 2, n_loc)
        second = jnp.stack([(b4 >> 4) & 3, b4 >> 6], axis=2).reshape(-1, gs // 2, n_loc)
        w_int = jnp.concatenate([first, second], axis=1).reshape(-1, n_loc).astype(jnp.float32)
    else:
        sbits = _storage_bits(ql.bits)
        mask = np.uint8((1 << sbits) - 1)
        parts = [
            ((ql.wp >> np.uint8(sbits * p)) & mask) for p in range(ql.planes)
        ]
        w_int = jnp.concatenate(parts, axis=1).astype(jnp.float32)   # [K, n_pad]
    k = w_int.shape[0]            # may exceed in_features (kpair K padding)
    g = ql.groups
    n_loc = w_int.shape[1]
    scales2 = ql.scales.reshape(g, n_loc)
    sz2 = scales2 * ql.zeros.reshape(g, n_loc).astype(jnp.float32)
    if k % g == 0:
        gs = k // g
        w3 = w_int.reshape(g, gs, n_loc)
        w3 = w3 * scales2[:, None, :] - sz2[:, None, :]
        w = w3.reshape(k, n_loc)
    else:  # ragged last group: fall back to a row gather of params
        g_of_k = jnp.minimum(
            jnp.arange(k) // (ql.group_size if ql.group_size != -1 else k), g - 1
        )
        w = w_int * scales2[g_of_k] - sz2[g_of_k]
    return w.astype(dtype)


def logical_weight(ql: QuantLinear, dtype=jnp.float32) -> jnp.ndarray:
    """Dense ``[in_features, out_features]`` weight in LOGICAL row/column
    order: kperm (desc_act load-time sort) undone, load-time K padding and
    lane padding sliced off. Used where the weight matrix itself is needed
    (e.g. the MLA absorbed-attention trick folds kv_b_proj into the q/out
    einsums — models/arch.py) rather than a matmul against activations."""
    w = dequantize_xla(ql, dtype)                   # [K_stored, n_loc]
    if ql.kperm is not None:
        # stored row i is logical row kperm[i]; padded rows (duplicate index
        # 0 from kperm padding) carry zero-scale rows, so scatter-ADD leaves
        # logical row 0 intact
        out = jnp.zeros((ql.in_features, w.shape[1]), w.dtype)
        w = out.at[ql.kperm].add(w)
    return w[: ql.in_features, : ql.out_features]


def matmul_xla(x: jnp.ndarray, ql: QuantLinear) -> jnp.ndarray:
    """Dequant-then-dot fallback: correct everywhere, lets XLA fuse what it
    can. ``x``: [..., K]. Returns [..., N]."""
    if ql.kperm is not None:
        x = jnp.take(x, ql.kperm, axis=-1)
    w = dequantize_xla(ql, dtype=x.dtype)
    if w.shape[0] != x.shape[-1]:  # kpair K padding: zero-pad x to match
        pad = [(0, 0)] * (x.ndim - 1) + [(0, w.shape[0] - x.shape[-1])]
        x = jnp.pad(x, pad)
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y[..., : min(ql.out_features, w.shape[1])].astype(x.dtype)
    if ql.bias is not None:
        y = y + ql.bias.astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Dispatch.
# ---------------------------------------------------------------------------


def _matmul_impl(x: jnp.ndarray, ql: QuantLinear, backend: str) -> jnp.ndarray:
    if backend == "xla":
        return matmul_xla(x, ql)
    from .pallas import gemm as pallas_gemm  # lazy: keeps CPU-only paths light

    if backend == "pallas":
        return pallas_gemm.matmul_pallas(x, ql)
    if backend == "pallas_interpret":
        return pallas_gemm.matmul_pallas(x, ql, interpret=True)
    if pallas_gemm.supported(ql):
        return pallas_gemm.matmul_pallas(x, ql)
    return matmul_xla(x, ql)


def matmul_t(g: jnp.ndarray, ql: QuantLinear, k_out: int, backend: str = "auto") -> jnp.ndarray:
    """Cotangent propagation for ``y = matmul(x, ql)``: returns
    ``dx = dy @ dequant(W)^T`` shaped [..., k_out], undoing the forward's
    kperm gather and load-time K padding. The fused transpose kernel (kpair
    layout) is the TPU analog of the reference's trainable Triton backward
    (triton_utils/kernels.py:248-339)."""
    # Restore lane padding the forward sliced off.
    from .pallas import gemm as pallas_gemm

    use_pallas = (
        ql.layout in ("kpair", "ki32", "kb32")
        and backend != "xla"
        and (
            backend == "pallas_interpret"
            or backend == "pallas"
            or pallas_gemm.supported(ql)
        )
    )
    if use_pallas:
        dxp = pallas_gemm.matmul_t_pallas(
            g, ql, interpret=(backend == "pallas_interpret")
        )
    else:
        n_loc = ql.wp.shape[1] if ql.layout in ("kpair", "ki32", "kb32") else ql.n_pad
        if g.shape[-1] != n_loc:
            pad = [(0, 0)] * (g.ndim - 1) + [(0, n_loc - g.shape[-1])]
            g = jnp.pad(g, pad)
        w = dequantize_xla(ql, dtype=g.dtype)                  # [K_stored, n_loc]
        dxp = jax.lax.dot_general(
            g, w,
            dimension_numbers=(((g.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(g.dtype)
    if ql.kperm is not None:
        # forward gathered x[..., kperm]; transpose is a scatter-add (kperm
        # may carry duplicate padding indices whose dxp entries are 0 —
        # padded groups have zero scales)
        dx = jnp.zeros((*g.shape[:-1], k_out), dxp.dtype)
        return dx.at[..., ql.kperm].add(dxp)
    return dxp[..., :k_out]


def _zero_cotangent(leaf):
    if leaf is None:
        return None
    if jnp.issubdtype(leaf.dtype, jnp.floating):
        return jnp.zeros_like(leaf)
    # integer leaves (wp / zeros / kperm): float0 per JAX convention
    return np.zeros(leaf.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _matmul_vjp(x: jnp.ndarray, ql: QuantLinear, backend: str) -> jnp.ndarray:
    return _matmul_impl(x, ql, backend)


def _matmul_vjp_fwd(x, ql, backend):
    # zero-element token whose SHAPE carries x's (possibly shard-local) K
    # width into bwd — residual leaves must be arrays, and shapes of traced
    # residuals are static
    k_token = jnp.zeros((x.shape[-1], 0), jnp.float32)
    return _matmul_impl(x, ql, backend), (k_token, ql)


def _matmul_vjp_bwd(backend, res, g):
    k_token, ql = res
    dx = matmul_t(g, ql, k_token.shape[0], backend)
    # quantized weights are frozen (the reference's trainable mode likewise
    # never differentiates qweight, kernels.py:408-426); scales/zeros/bias
    # get zero cotangents
    return dx, jax.tree_util.tree_map(_zero_cotangent, ql)


_matmul_vjp.defvjp(_matmul_vjp_fwd, _matmul_vjp_bwd)


def matmul(x: jnp.ndarray, ql: QuantLinear, backend: str = "auto",
           prenorm=None) -> jnp.ndarray:
    """Quantized matmul ``y = x @ dequant(W) + b``.

    backend: "auto" | "pallas" | "pallas_interpret" | "xla". "auto" uses the
    fused Pallas kernel on TPU when the shape constraints hold, else the XLA
    fallback. "pallas_interpret" runs the kernel in Pallas interpret mode —
    the way CPU-mesh tests exercise the REAL kernel path (incl. its
    shard_map-local block-width behavior) without TPU hardware.

    Differentiable w.r.t. ``x`` on EVERY backend via a custom VJP whose
    backward runs the fused transpose kernel (so LoRA/AdaLoRA training keeps
    the 4x kernel advantage instead of dropping to the XLA dequant path).

    ``prenorm=(weight, eps, plus_one)`` applies an RMS norm to ``x`` first —
    fused INTO the decode kernel when eligible (kb32/ki32 layout, decode
    regime, no kperm), else computed unfused. Inference-only (the prenorm
    path is outside the custom VJP).
    """
    if prenorm is not None:
        from .pallas import gemm as pallas_gemm

        if backend != "xla" and (
            backend in ("pallas", "pallas_interpret")
            or pallas_gemm.supported(ql)
        ):
            # matmul_pallas resolves fine-grained eligibility itself and
            # falls back to an unfused norm when the kernel can't fuse it
            return pallas_gemm.matmul_pallas(
                x, ql, interpret=(backend == "pallas_interpret"),
                prenorm=prenorm,
            )
        x = pallas_gemm.rms_apply(x, *prenorm)
    return _matmul_vjp(x, ql, backend)


def _ki32_gs(ql: QuantLinear) -> int:
    return ql.group_size if ql.group_size != -1 else ql.wp.shape[0] * 8


def _runtime_unpack_np(ql: QuantLinear) -> np.ndarray:
    """Host-side: stored wp -> integer codes [K_stored, wp_width]."""
    if ql.layout == "kpair":
        return kpair_unpack_np(np.asarray(ql.wp))
    if ql.layout == "ki32":
        return ki32_unpack_np(np.asarray(ql.wp), _ki32_gs(ql))
    if ql.layout == "kb32":
        return ki32_unpack_np(np.asarray(ql.wp), 1024)
    raise ValueError(f"unsupported layout {ql.layout!r}")


def _runtime_pack_np(w_int: np.ndarray, like: QuantLinear) -> np.ndarray:
    """Host-side inverse of :func:`_runtime_unpack_np` for ``like``'s layout."""
    if like.layout == "kpair":
        return _kpair_pack(w_int.astype(np.uint8))
    if like.layout == "ki32":
        gs = like.group_size if like.group_size != -1 else w_int.shape[0]
        return _ki32_pack(w_int, gs)
    if like.layout == "kb32":
        return _ki32_pack(w_int, 1024)
    raise ValueError(f"unsupported layout {like.layout!r}")


def concat_qls(qls: list[QuantLinear]) -> QuantLinear:
    """Concatenate QuantLinears along the OUTPUT axis into one fused linear
    (static QKV / gate+up fusion — the load-time analog of the reference's
    fused-attention injection, fused_llama_attn.py:163-207). Concatenation
    happens at the LOGICAL column level (per-part lane padding is dropped
    and re-applied once at the end), so callers can split the fused output
    at plain logical offsets. kpair layout only; host-side, one-time."""
    first = qls[0]
    for q in qls:
        if (q.layout != first.layout or q.bits != first.bits
                or q.group_size != first.group_size
                or q.wp.shape[0] != first.wp.shape[0]):
            raise ValueError("fusion requires matching K/layout/bits/group")
        if q.kperm is not None:
            raise ValueError("fusion requires trivial kperm (no desc_act)")
    if first.layout not in ("kpair", "ki32", "kb32"):
        raise ValueError("fusion implemented for the kpair/ki32/kb32 layouts only")

    w_parts, s_parts, z_parts = [], [], []
    for q in qls:
        n = q.out_features
        w_parts.append(_runtime_unpack_np(q)[:, :n])
        s_parts.append(np.asarray(q.scales)[:, :, :n])
        z_parts.append(np.asarray(q.zeros)[:, :, :n])
    w_int = np.concatenate(w_parts, axis=-1)
    scales = np.concatenate(s_parts, axis=-1)
    zeros = np.concatenate(z_parts, axis=-1)
    n_tot = w_int.shape[1]
    n_pad = _round_up(n_tot, 128)
    if n_pad != n_tot:
        w_int = np.pad(w_int, ((0, 0), (0, n_pad - n_tot)))
        scales = np.pad(scales, ((0, 0), (0, 0), (0, n_pad - n_tot)))
        zeros = np.pad(zeros, ((0, 0), (0, 0), (0, n_pad - n_tot)))

    biases = [q.bias for q in qls]
    if any(b is not None for b in biases):
        bias = jnp.concatenate(
            [jnp.asarray(b) if b is not None else jnp.zeros((q.out_features,), jnp.float32)
             for b, q in zip(biases, qls)], axis=-1)
    else:
        bias = None
    return QuantLinear(
        wp=jnp.asarray(_runtime_pack_np(w_int, first)),
        scales=jnp.asarray(scales),
        zeros=jnp.asarray(zeros),
        kperm=None,
        bias=bias,
        bits=first.bits,
        group_size=first.group_size,
        in_features=first.in_features,
        out_features=n_tot,
        n_pad=n_pad,
        layout=first.layout,
    )


def split_qls(ql: QuantLinear, widths: list[int]) -> list[QuantLinear]:
    """Inverse of :func:`concat_qls`: split a fused QuantLinear back into
    parts of the given logical output widths (host-side, one-time).

    Used by the explicit-TP path (parallel/tp.py): a fused [q|k|v] (or
    [gate|up]) node cannot be column-sharded directly — each rank would get a
    contiguous chunk of the GLOBAL concat instead of [q_loc|k_loc|v_loc] —
    so TP preparation unfuses first and shards the parts independently."""
    if ql.layout not in ("kpair", "ki32", "kb32"):
        raise ValueError("split_qls implemented for the kpair/ki32/kb32 layouts only")
    if ql.kperm is not None:
        raise ValueError("split_qls requires trivial kperm (no desc_act)")
    if sum(widths) != ql.out_features:
        raise ValueError(f"widths {widths} must sum to {ql.out_features}")
    w_int = _runtime_unpack_np(ql)
    scales = np.asarray(ql.scales)
    zeros = np.asarray(ql.zeros)
    bias = None if ql.bias is None else np.asarray(ql.bias)
    outs, off = [], 0
    for w in widths:
        sl = slice(off, off + w)
        n_pad = _round_up(w, 128)
        wi = w_int[:, sl]
        sc = scales[:, :, sl]
        zr = zeros[:, :, sl]
        if n_pad != w:
            wi = np.pad(wi, ((0, 0), (0, n_pad - w)))
            sc = np.pad(sc, ((0, 0), (0, 0), (0, n_pad - w)))
            zr = np.pad(zr, ((0, 0), (0, 0), (0, n_pad - w)))
        outs.append(QuantLinear(
            wp=jnp.asarray(_runtime_pack_np(wi, ql)),
            scales=jnp.asarray(sc),
            zeros=jnp.asarray(zr),
            kperm=None,
            bias=None if bias is None else jnp.asarray(bias[sl]),
            bits=ql.bits, group_size=ql.group_size,
            in_features=ql.in_features, out_features=w, n_pad=n_pad,
            layout=ql.layout,
        ))
        off += w
    return outs


# ---------------------------------------------------------------------------
# Stacked experts (MoE): one pytree holding E runtime layouts with a leading
# expert axis. Enables expert-parallel sharding (P("ep", ...)) and batched
# execution instead of the reference's 24-separate-Linears enumeration
# (modeling/mixtral.py:8-40).
# ---------------------------------------------------------------------------


@struct.dataclass
class StackedQuantLinear:
    wp: jnp.ndarray               # uint8 [E, K(/2), C]
    scales: jnp.ndarray           # f32 [E, G, planes, C]
    zeros: jnp.ndarray            # u8  [E, G, planes, C]
    bias: Optional[jnp.ndarray]   # [E, N] or None
    bits: int = struct.field(pytree_node=False, default=4)
    group_size: int = struct.field(pytree_node=False, default=-1)
    in_features: int = struct.field(pytree_node=False, default=0)
    out_features: int = struct.field(pytree_node=False, default=0)
    n_pad: int = struct.field(pytree_node=False, default=0)
    layout: str = struct.field(pytree_node=False, default="planar")

    @property
    def num_experts(self) -> int:
        return self.wp.shape[0]

    def expert(self, e: int) -> QuantLinear:
        return QuantLinear(
            wp=self.wp[e], scales=self.scales[e], zeros=self.zeros[e],
            kperm=None, bias=None if self.bias is None else self.bias[e],
            bits=self.bits, group_size=self.group_size,
            in_features=self.in_features, out_features=self.out_features,
            n_pad=self.n_pad, layout=self.layout,
        )


def stack_experts(qls: list[QuantLinear]) -> StackedQuantLinear:
    """Stack per-expert QuantLinears (identical shapes, trivial kperm)."""
    first = qls[0]
    if any(q.kperm is not None for q in qls):
        raise ValueError("stacked experts require trivial g_idx (no desc_act)")
    return StackedQuantLinear(
        wp=jnp.stack([q.wp for q in qls]),
        scales=jnp.stack([q.scales for q in qls]),
        zeros=jnp.stack([q.zeros for q in qls]),
        bias=None if first.bias is None else jnp.stack([q.bias for q in qls]),
        bits=first.bits, group_size=first.group_size,
        in_features=first.in_features, out_features=first.out_features,
        n_pad=first.n_pad, layout=first.layout,
    )


def matmul_stacked(x: jnp.ndarray, sql: StackedQuantLinear, backend: str = "auto") -> jnp.ndarray:
    """Dense-MoE execution: every expert applied to the same x.
    Returns [E, ..., N]."""
    def one(wp, scales, sz, bias):
        ql = QuantLinear(
            wp=wp, scales=scales, zeros=sz, kperm=None, bias=bias,
            bits=sql.bits, group_size=sql.group_size,
            in_features=sql.in_features, out_features=sql.out_features,
            n_pad=sql.n_pad, layout=sql.layout,
        )
        return matmul(x, ql, backend=backend)

    if sql.bias is None:
        return jax.vmap(lambda w, s, z: one(w, s, z, None))(
            sql.wp, sql.scales, sql.zeros
        )
    return jax.vmap(one)(sql.wp, sql.scales, sql.zeros, sql.bias)


def matmul_routed(x: jnp.ndarray, sql: StackedQuantLinear, sel: jnp.ndarray,
                  backend: str = "auto") -> jnp.ndarray:
    """Sparse-MoE decode execution: row p of the result is
    ``x[p] @ dequant(W[sel[p]])`` (x ``[P, K]``, sel ``[P]`` int32 ->
    ``[P, N]``).

    On TPU this runs the scalar-prefetch Pallas kernel that DMAs ONLY the
    selected experts' weights — at Mixtral decode (top-2 of 8) that is 4x
    less weight traffic than the dense stacked path, mirroring how the
    reference touches only routed experts (modeling/mixtral.py:8-40). The
    XLA fallback gathers the selected experts then dequantizes."""
    from .pallas import gemm as pallas_gemm

    use_pallas = backend != "xla" and (
        backend in ("pallas", "pallas_interpret")
        or pallas_gemm.supported_routed(sql)
    )
    if use_pallas:
        y = pallas_gemm.matmul_routed_pallas(
            x, sel, sql, interpret=(backend == "pallas_interpret")
        ).astype(x.dtype)
    else:
        wps = jnp.take(sql.wp, sel, axis=0)
        sc = jnp.take(sql.scales, sel, axis=0)
        zr = jnp.take(sql.zeros, sel, axis=0)

        def one(xr, wp_e, s_e, z_e):
            ql = QuantLinear(
                wp=wp_e, scales=s_e, zeros=z_e, kperm=None, bias=None,
                bits=sql.bits, group_size=sql.group_size,
                in_features=sql.in_features, out_features=sql.out_features,
                n_pad=sql.n_pad, layout=sql.layout,
            )
            return matmul_xla(xr[None], ql)[0]

        y = jax.vmap(one)(x[: sel.shape[0]], wps, sc, zr).astype(x.dtype)
    if sql.bias is not None:
        y = y + jnp.take(sql.bias, sel, axis=0).astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Construction from a solver result / dense weights, and back to disk format.
# ---------------------------------------------------------------------------


def pack_from_solver(
    w: np.ndarray,                # [N, K] fake-quantized (or raw) weights
    scale: np.ndarray,            # [G, N]
    zero: np.ndarray,             # [G, N]
    g_idx: np.ndarray,            # [K]
    bits: int,
    group_size: int,
    bias: Optional[np.ndarray] = None,
) -> PackedQuantLinear:
    """Pack GPTQ solver outputs into the reference checkpoint layout.

    Mirrors reference pack semantics (qlinear_cuda_old.py:110-200): scales are
    stored fp16; intweight = round(w / scale + zero) clipped to [0, maxq].
    """
    n, k = w.shape
    scales16 = scale.astype(np.float16)
    tensors = packing.pack_layer(
        np.ascontiguousarray(w.T),
        scales16.astype(np.float32),
        np.rint(zero).astype(np.float32),
        np.asarray(g_idx, dtype=np.int64),
        bits,
        group_size,
    )
    return PackedQuantLinear(
        qweight=jnp.asarray(tensors["qweight"]),
        qzeros=jnp.asarray(tensors["qzeros"]),
        scales=jnp.asarray(tensors["scales"]),
        g_idx=jnp.asarray(tensors["g_idx"]),
        bias=None if bias is None else jnp.asarray(bias),
        bits=bits,
        group_size=group_size,
        in_features=k,
        out_features=n,
    )


__all__ = [
    "PackedQuantLinear",
    "concat_qls",
    "split_qls",
    "QuantLinear",
    "from_packed",
    "pack_from_solver",
    "matmul",
    "matmul_xla",
    "dequantize_xla",
    "plane_unpack_np",
]
