"""Bit-exact GPTQ pack/unpack library (NumPy, host-side).

Implements the on-disk tensor layout used by GPTQ checkpoints so that
checkpoints produced by this framework are interchangeable with ones produced
by the reference implementation (see reference layout definition in
/root/reference/auto_gptq/nn_modules/qlinear/qlinear_cuda_old.py:50-200):

  * ``qweight``: ``int32[K * bits / 32, N]`` — quantized weights packed
    little-endian along the K (input-feature) axis. For bits in {2, 4, 8}
    each int32 word holds ``32 // bits`` consecutive K values. For 3-bit,
    32 values are interleaved across 3 words (10 + split + 10 + split + 10).
  * ``qzeros``: ``int32[ceil(K / group_size), N * bits / 32]`` — per-group
    zero points **minus one** (a historical quirk of the format), packed
    along the N (output-feature) axis with the same bit layout.
  * ``scales``: ``fp16[ceil(K / group_size), N]``.
  * ``g_idx``:  ``int32[K]`` — group index of each input feature (non-trivial
    when quantized with activation reordering / ``desc_act``).

Dequantization semantics (reference: qlinear_cuda_old.py:295-349):

  ``W[k, n] = scales[g_idx[k], n] * (w_q[k, n] - zero[g_idx[k], n])``

where ``zero = (unpacked_qzeros + 1) & maxq`` for bits in {2, 4, 8} and
``zero = (unpacked_qzeros & 0x7) + 1`` (no re-mask!) for 3-bit — this exact
cast/mask ordering is load-bearing and reproduced here.

Everything here is plain NumPy: it runs on the host at pack/load time and is
also the golden reference the Pallas kernels are tested against.
"""

from __future__ import annotations

import numpy as np

SUPPORTED_BITS = (2, 3, 4, 8)


def _check_bits(bits: int) -> None:
    if bits not in SUPPORTED_BITS:
        raise NotImplementedError(f"Only {SUPPORTED_BITS} bits are supported, got {bits}.")


# ---------------------------------------------------------------------------
# Core packing along an axis (the K axis of qweight / the N axis of qzeros).
# ---------------------------------------------------------------------------


def _pack_cols_pow2(values: np.ndarray, bits: int) -> np.ndarray:
    """Pack ``values`` (uint32, packed along axis 0) for bits in {2, 4, 8}.

    values: [K, ...] with K % (32 // bits) == 0 -> returns [K * bits / 32, ...].
    """
    pack = 32 // bits
    k = values.shape[0]
    assert k % pack == 0, f"axis length {k} not divisible by {pack}"
    v = values.reshape(k // pack, pack, *values.shape[1:]).astype(np.uint32)
    shifts = (bits * np.arange(pack, dtype=np.uint32)).reshape(
        (1, pack) + (1,) * (values.ndim - 1)
    )
    return np.bitwise_or.reduce(v << shifts, axis=1)


def _unpack_cols_pow2(packed: np.ndarray, bits: int) -> np.ndarray:
    """Inverse of :func:`_pack_cols_pow2`: [R, ...] -> [R * 32 / bits, ...]."""
    pack = 32 // bits
    r = packed.shape[0]
    shifts = (bits * np.arange(pack, dtype=np.uint32)).reshape(
        (1, pack) + (1,) * (packed.ndim - 1)
    )
    mask = np.uint32((1 << bits) - 1)
    vals = (packed.astype(np.uint32)[:, None] >> shifts) & mask
    return vals.reshape(r * pack, *packed.shape[1:])


def _pack_cols_3bit(values: np.ndarray) -> np.ndarray:
    """3-bit packing: 32 values -> 3 uint32 words (reference interleave).

    Word layout per 32-value block (v = values, little-endian bit offsets):
      word0: v0..v9 at bits 0,3,..,27; v10 bits[1:0] at 30..31
      word1: v10 bit[2] at 0; v11..v20 at bits 1,4,..,28; v21 bit[0] at 31
      word2: v21 bits[2:1] at 0..1; v22..v31 at bits 2,5,..,29
    """
    k = values.shape[0]
    assert k % 32 == 0, f"axis length {k} not divisible by 32"
    v = values.reshape(k // 32, 32, *values.shape[1:]).astype(np.uint32) & np.uint32(7)
    out_shape = (k // 32, 3) + values.shape[1:]
    out = np.zeros(out_shape, dtype=np.uint32)
    for j in range(10):
        out[:, 0] |= v[:, j] << np.uint32(3 * j)
    out[:, 0] |= v[:, 10] << np.uint32(30)
    out[:, 1] |= v[:, 10] >> np.uint32(2)
    for j in range(10):
        out[:, 1] |= v[:, 11 + j] << np.uint32(3 * j + 1)
    out[:, 1] |= v[:, 21] << np.uint32(31)
    out[:, 2] |= (v[:, 21] >> np.uint32(1)) & np.uint32(0x3)
    for j in range(10):
        out[:, 2] |= v[:, 22 + j] << np.uint32(3 * j + 2)
    return out.reshape((k // 32 * 3,) + values.shape[1:])


def _unpack_cols_3bit(packed: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_pack_cols_3bit`: [R, ...] -> [R * 32 / 3, ...]."""
    r = packed.shape[0]
    assert r % 3 == 0
    w = packed.astype(np.uint32).reshape(r // 3, 3, *packed.shape[1:])
    out_shape = (r // 3, 32) + packed.shape[1:]
    v = np.zeros(out_shape, dtype=np.uint32)
    for j in range(10):
        v[:, j] = (w[:, 0] >> np.uint32(3 * j)) & np.uint32(7)
    v[:, 10] = ((w[:, 0] >> np.uint32(30)) | (w[:, 1] << np.uint32(2))) & np.uint32(7)
    for j in range(10):
        v[:, 11 + j] = (w[:, 1] >> np.uint32(3 * j + 1)) & np.uint32(7)
    v[:, 21] = ((w[:, 1] >> np.uint32(31)) | (w[:, 2] << np.uint32(1))) & np.uint32(7)
    for j in range(10):
        v[:, 22 + j] = (w[:, 2] >> np.uint32(3 * j + 2)) & np.uint32(7)
    return v.reshape((r // 3 * 32,) + packed.shape[1:])


def pack_along_axis0(values: np.ndarray, bits: int) -> np.ndarray:
    _check_bits(bits)
    if bits == 3:
        return _pack_cols_3bit(values)
    return _pack_cols_pow2(values, bits)


def unpack_along_axis0(packed: np.ndarray, bits: int) -> np.ndarray:
    _check_bits(bits)
    if bits == 3:
        return _unpack_cols_3bit(packed)
    return _unpack_cols_pow2(packed, bits)


# ---------------------------------------------------------------------------
# GPTQ checkpoint tensors.
# ---------------------------------------------------------------------------


def pack_qweight(intweight: np.ndarray, bits: int) -> np.ndarray:
    """Pack integer weights ``intweight[K, N]`` (values in [0, 2^bits)) into
    ``qweight int32[K * bits / 32, N]`` (reference layout)."""
    _check_bits(bits)
    if intweight.ndim != 2:
        raise ValueError(f"intweight must be 2-D [K, N], got {intweight.shape}")
    return pack_along_axis0(intweight.astype(np.uint32), bits).view(np.int32)


def unpack_qweight(qweight: np.ndarray, bits: int) -> np.ndarray:
    """Unpack ``qweight int32[K * bits / 32, N]`` to ``uint32[K, N]``."""
    _check_bits(bits)
    return unpack_along_axis0(qweight.view(np.uint32), bits)


def pack_qzeros(zeros: np.ndarray, bits: int) -> np.ndarray:
    """Pack per-group zero points ``zeros[G, N]`` into
    ``qzeros int32[G, N * bits / 32]``. Stores ``zeros - 1`` (format quirk)."""
    _check_bits(bits)
    if zeros.ndim != 2:
        raise ValueError(f"zeros must be 2-D [G, N], got {zeros.shape}")
    stored = (zeros.astype(np.int64) - 1).astype(np.uint32)  # wraps for zero == 0
    packed = pack_along_axis0(stored.T, bits).T
    return np.ascontiguousarray(packed).view(np.int32)


def unpack_qzeros(qzeros: np.ndarray, bits: int) -> np.ndarray:
    """Unpack ``qzeros`` to effective zero points ``uint32[G, N]``.

    Reproduces the reference dequant semantics exactly: for 2/4/8-bit the +1
    is applied then masked to ``bits``; for 3-bit the +1 is NOT re-masked
    (qlinear_cuda_old.py:301-330).
    """
    _check_bits(bits)
    stored = unpack_along_axis0(qzeros.view(np.uint32).T, bits).T
    if bits == 3:
        return (stored & np.uint32(7)) + np.uint32(1)
    maxq = np.uint32((1 << bits) - 1)
    return (stored + np.uint32(1)) & maxq


def dequantize(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: np.ndarray | None,
    bits: int,
    dtype=np.float32,
) -> np.ndarray:
    """Golden-reference dequantization: returns ``W[K, N]`` such that
    ``y = x @ W`` matches the reference fallback matmul path."""
    w_q = unpack_qweight(qweight, bits).astype(np.int64)
    zeros = unpack_qzeros(qzeros, bits).astype(np.int64)
    k = w_q.shape[0]
    if g_idx is None:
        group_size = k // scales.shape[0] if scales.shape[0] else k
        g_idx = np.arange(k) // group_size
    g_idx = np.asarray(g_idx).astype(np.int64)
    s = scales.astype(np.float64)[g_idx]  # [K, N]
    z = zeros[g_idx]  # [K, N]
    return (s * (w_q - z)).astype(dtype)


def quantize_weight_rtn(
    w: np.ndarray, scales: np.ndarray, zeros: np.ndarray, g_idx: np.ndarray, bits: int
) -> np.ndarray:
    """Round ``w[K, N]`` to integer grid given per-group params (the packing
    step of the reference: qlinear_cuda_old.py:124-129, where
    ``intweight = round((w + scale*zero) / scale)``)."""
    maxq = (1 << bits) - 1
    s = scales.astype(np.float64)[g_idx]
    z = zeros.astype(np.float64)[g_idx]
    q = np.rint(w.astype(np.float64) / s + z)
    return np.clip(q, 0, maxq).astype(np.uint32)


def pack_layer(
    w: np.ndarray,
    scales: np.ndarray,
    zeros: np.ndarray,
    g_idx: np.ndarray | None,
    bits: int,
    group_size: int,
) -> dict:
    """Full layer pack: fp weights ``w[K, N]`` + solver outputs -> checkpoint
    tensors. ``scales``/``zeros`` are [G, N]; returns dict of np arrays."""
    k, n = w.shape
    if g_idx is None:
        gs = group_size if group_size != -1 else k
        g_idx = (np.arange(k) // gs).astype(np.int32)
    intweight = quantize_weight_rtn(w, scales, zeros, g_idx, bits)
    return {
        "qweight": pack_qweight(intweight, bits),
        "qzeros": pack_qzeros(np.rint(zeros).astype(np.int64), bits),
        "scales": scales.astype(np.float16),
        "g_idx": np.asarray(g_idx, dtype=np.int32),
    }


# ---------------------------------------------------------------------------
# AWQ GEMM format -> GPTQ conversion.
# ---------------------------------------------------------------------------

# AWQ-GEMM packs 8 4-bit values per int32 along N: nibble slot ``s`` (bit
# offset 4*s) holds the logical value at offset ``_AWQ_ORDER[s]`` within the
# 8-value block (reference behavior: modeling/_utils.py:525-617
# `awq_reverse_reorder_int_tensor` / `unpack_awq`). AWQ stores true zero
# points (no -1 quirk).
_AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])
_AWQ_INV_ORDER = np.argsort(_AWQ_ORDER)  # [0, 4, 1, 5, 2, 6, 3, 7]


def unpack_awq(
    awq_qweight: np.ndarray, awq_qzeros: np.ndarray, bits: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Unpack AWQ-GEMM tensors -> (intweight uint32[K, N], zeros uint32[G, N])."""
    if bits != 4:
        raise NotImplementedError("AWQ conversion only supports 4-bit.")
    pack = 32 // bits
    shifts = (bits * np.arange(pack, dtype=np.uint32))[None, None, :]
    mask = np.uint32((1 << bits) - 1)

    def unpack_n(x):
        vals = (x.view(np.uint32)[:, :, None] >> shifts) & mask  # [R, C, 8] slot order
        # logical[j] lives in slot argsort(order)[j]
        vals = vals[:, :, _AWQ_INV_ORDER]
        return vals.reshape(x.shape[0], x.shape[1] * pack)

    return unpack_n(awq_qweight), unpack_n(awq_qzeros)


def pack_awq_tensor(values: np.ndarray, bits: int = 4) -> np.ndarray:
    """Pack logical int values ``[R, C]`` along C into AWQ-GEMM int32 words
    (inverse of the unpack above; used for AWQ export and tests)."""
    if bits != 4:
        raise NotImplementedError("AWQ conversion only supports 4-bit.")
    pack = 32 // bits
    r, c = values.shape
    v = values.astype(np.uint32).reshape(r, c // pack, pack)
    v = v[:, :, _AWQ_ORDER]  # slot s <- logical order[s]
    shifts = (bits * np.arange(pack, dtype=np.uint32))[None, None, :]
    return np.bitwise_or.reduce(v << shifts, axis=2).view(np.int32)


def awq_to_gptq(
    awq_qweight: np.ndarray,
    awq_qzeros: np.ndarray,
    awq_scales: np.ndarray,
    bits: int = 4,
) -> dict:
    """Convert an AWQ-GEMM layer to reference-GPTQ layout (trivial g_idx)."""
    intweight, zeros = unpack_awq(awq_qweight, awq_qzeros, bits)
    k, n = intweight.shape
    group_size = k // awq_scales.shape[0]
    return {
        "qweight": pack_qweight(intweight, bits),
        "qzeros": pack_qzeros(zeros.astype(np.int64), bits),
        "scales": np.asarray(awq_scales, dtype=np.float16),
        "g_idx": (np.arange(k, dtype=np.int32) // group_size).astype(np.int32),
    }


# ---------------------------------------------------------------------------
# Packed-tensor column surgery (fused-QKV split/merge for gpt2/neox/bloom...).
# ---------------------------------------------------------------------------


def _unpack_qzeros_stored(qzeros: np.ndarray, bits: int) -> np.ndarray:
    """Raw stored zero codes (the ``zero - 1`` values), uint32[G, N]."""
    return unpack_along_axis0(qzeros.view(np.uint32).T, bits).T


def _pack_qzeros_stored(stored: np.ndarray, bits: int) -> np.ndarray:
    packed = pack_along_axis0(stored.astype(np.uint32).T, bits).T
    return np.ascontiguousarray(packed).view(np.int32)


def select_packed_columns(tensors: dict, cols: np.ndarray, bits: int) -> dict:
    """Select output columns (the N axis) of a packed GPTQ layer, bit-exactly.

    ``tensors``: qweight/qzeros/scales[/g_idx/bias]. qweight and scales index
    directly; qzeros round-trips through the raw stored codes. Used to split
    fused QKV checkpoints (gpt2 c_attn, neox/bloom query_key_value) into
    separate logical linears and to merge them back for saving.
    """
    cols = np.asarray(cols)
    out = {
        "qweight": np.ascontiguousarray(np.asarray(tensors["qweight"])[:, cols]),
        "scales": np.ascontiguousarray(np.asarray(tensors["scales"])[:, cols]),
    }
    stored = _unpack_qzeros_stored(np.asarray(tensors["qzeros"]), bits)
    out["qzeros"] = _pack_qzeros_stored(np.ascontiguousarray(stored[:, cols]), bits)
    if tensors.get("g_idx") is not None:
        out["g_idx"] = np.asarray(tensors["g_idx"])
    if tensors.get("bias") is not None:
        out["bias"] = np.ascontiguousarray(np.asarray(tensors["bias"])[cols])
    return out


def merge_packed_columns(parts: list[dict], col_dest: np.ndarray, bits: int) -> dict:
    """Inverse of column selection: concatenate parts along N and place the
    concatenated columns at positions ``col_dest`` (len == total N)."""
    col_dest = np.asarray(col_dest)
    inv = np.argsort(col_dest)

    def cat(key):
        return np.concatenate([np.asarray(p[key]) for p in parts], axis=1)

    qweight = cat("qweight")[:, inv]
    scales = cat("scales")[:, inv]
    stored = np.concatenate(
        [_unpack_qzeros_stored(np.asarray(p["qzeros"]), bits) for p in parts], axis=1
    )[:, inv]
    out = {
        "qweight": np.ascontiguousarray(qweight),
        "qzeros": _pack_qzeros_stored(np.ascontiguousarray(stored), bits),
        "scales": np.ascontiguousarray(scales),
    }
    g_idx = parts[0].get("g_idx")
    if g_idx is not None:
        for p in parts[1:]:
            if not np.array_equal(np.asarray(p["g_idx"]), np.asarray(g_idx)):
                raise ValueError("fused merge requires identical g_idx across parts")
        out["g_idx"] = np.asarray(g_idx)
    if all(p.get("bias") is not None for p in parts):
        out["bias"] = np.concatenate([np.asarray(p["bias"]) for p in parts])[inv]
    return out


__all__ = [
    "SUPPORTED_BITS",
    "select_packed_columns",
    "merge_packed_columns",
    "pack_qweight",
    "unpack_qweight",
    "pack_qzeros",
    "unpack_qzeros",
    "dequantize",
    "quantize_weight_rtn",
    "pack_layer",
    "unpack_awq",
    "pack_awq_tensor",
    "awq_to_gptq",
    "pack_along_axis0",
    "unpack_along_axis0",
]
