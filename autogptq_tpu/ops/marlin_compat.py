"""Marlin checkpoint format conversion (both directions, host-side NumPy).

The Marlin format (reference: nn_modules/qlinear/qlinear_marlin.py:54-175,
marlin_repack.cu) stores 4-bit symmetric weights for Ampere tensor cores:

  * ``B int32[K/16, N*16/8]``: codes (+8 offset, no stored zeros) arranged by
    a 16x16 tile transpose followed by a 1024-element thread permutation
    (``_get_perms``), 8 codes per int32 word.
  * ``s fp16[K/group, N]``: scales with a per-row block permutation
    (64-wide blocks when grouped, 32-wide when per-column).

Constraints (marlin_utils.py:102-115): bits=4, group_size in {-1, 128},
symmetric (zero == 8), no act-order, K % 128 == 0, N % 256 == 0.

This module converts Marlin checkpoints -> reference GPTQ layout at load
(so `from_quantized(..., checkpoint_format="marlin")` works on TPU) and
GPTQ -> Marlin for export (parity with `convert_to_marlin`).
"""

from __future__ import annotations

import numpy as np

from . import packing

_TILE = 16


def _marlin_perms() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The Marlin thread permutations (mirrors reference _get_perms())."""
    perm = []
    for i in range(32):
        perm1 = []
        col = i // 4
        for block in (0, 1):
            for row in (
                2 * (i % 4),
                2 * (i % 4) + 1,
                2 * (i % 4 + 4),
                2 * (i % 4 + 4) + 1,
            ):
                perm1.append(16 * row + col + 8 * block)
        for j in range(4):
            perm.extend(p + 256 * j for p in perm1)
    perm = np.array(perm)
    interleave = np.array([0, 2, 4, 6, 1, 3, 5, 7])
    perm = perm.reshape(-1, 8)[:, interleave].ravel()

    scale_perm = [i + 8 * j for i in range(8) for j in range(8)]
    scale_perm_single = [
        2 * i + j for i in range(4) for j in (0, 1, 8, 9, 16, 17, 24, 25)
    ]
    return perm, np.array(scale_perm), np.array(scale_perm_single)


_PERM, _SCALE_PERM, _SCALE_PERM_SINGLE = _marlin_perms()


def validate_marlin_compat(bits: int, group_size: int, desc_act: bool, sym: bool,
                           in_features: int | None = None, out_features: int | None = None) -> str | None:
    """Reason string if not Marlin-compatible, else None (marlin_utils.py:102-115)."""
    if bits != 4:
        return f"The quantized model uses a bits = {bits} config."
    if group_size not in (-1, 128):
        return f"The quantized model uses a group_size = {group_size} config."
    if not sym:
        return "The quantized model uses asymmetric quantization."
    if desc_act:
        return "The quantized model uses act-order (desc_act) scheme."
    if in_features is not None and in_features % 128 != 0:
        return f"in_features = {in_features} is not divisible by 128."
    if out_features is not None and out_features % 256 != 0:
        return f"out_features = {out_features} is not divisible by 256."
    return None


def _tile_forward(w_int: np.ndarray) -> np.ndarray:
    """[K, N] -> marlin pre-pack arrangement [K/16, N*16] with thread perm."""
    k, n = w_int.shape
    w = w_int.reshape(k // _TILE, _TILE, n // _TILE, _TILE)
    w = w.transpose(0, 2, 1, 3).reshape(k // _TILE, n * _TILE)
    return w.reshape(-1, _PERM.size)[:, _PERM].reshape(k // _TILE, n * _TILE)


def _tile_inverse(res: np.ndarray, k: int, n: int) -> np.ndarray:
    """Inverse of _tile_forward: [K/16, N*16] -> [K, N]."""
    inv = np.argsort(_PERM)
    pre = res.reshape(-1, _PERM.size)[:, inv].reshape(k // _TILE, n * _TILE)
    w = pre.reshape(k // _TILE, n // _TILE, _TILE, _TILE)
    return w.transpose(0, 2, 1, 3).reshape(k, n)


def gptq_to_marlin(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: np.ndarray | None,
    group_size: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Reference-GPTQ tensors -> (B int32[K/16, N], s fp16[G, N]).

    Requires symmetric 4-bit (all zero points == 8) and trivial g_idx.
    """
    bits = 4
    w_int = packing.unpack_qweight(qweight, bits).astype(np.int64)
    zeros = packing.unpack_qzeros(qzeros, bits).astype(np.int64)
    k, n = w_int.shape
    if not np.all(zeros == 8):
        raise ValueError("Marlin requires symmetric quantization (zero == 8).")
    gs = group_size if group_size != -1 else k
    if g_idx is not None and not np.array_equal(np.asarray(g_idx), np.arange(k) // gs):
        raise ValueError("Marlin does not support act-order (non-trivial g_idx).")

    res = _tile_forward(w_int.astype(np.uint32))
    q = np.zeros((res.shape[0], res.shape[1] // 8), dtype=np.uint32)
    for i in range(8):
        q |= res[:, i::8] << np.uint32(4 * i)

    s = np.asarray(scales, dtype=np.float16)
    if gs != k:
        s = s.reshape(-1, _SCALE_PERM.size)[:, _SCALE_PERM]
    else:
        s = s.reshape(-1, _SCALE_PERM_SINGLE.size)[:, _SCALE_PERM_SINGLE]
    s = s.reshape(-1, n)
    return q.view(np.int32), s


def marlin_to_gptq(
    b: np.ndarray,
    s: np.ndarray,
    group_size: int,
) -> dict:
    """Marlin tensors -> reference-GPTQ layout dict (qweight/qzeros/scales/g_idx)."""
    b = np.asarray(b).view(np.uint32)
    rows, cols = b.shape          # [K/16, N*16/8]
    k = rows * _TILE
    n = cols * 8 // _TILE
    gs = group_size if group_size != -1 else k

    res = np.zeros((rows, cols * 8), dtype=np.uint32)
    for i in range(8):
        res[:, i::8] = (b >> np.uint32(4 * i)) & np.uint32(0xF)
    w_int = _tile_inverse(res, k, n)

    s = np.asarray(s, dtype=np.float16)
    if gs != k:
        inv = np.argsort(_SCALE_PERM)
        s = s.reshape(-1, _SCALE_PERM.size)[:, inv]
    else:
        inv = np.argsort(_SCALE_PERM_SINGLE)
        s = s.reshape(-1, _SCALE_PERM_SINGLE.size)[:, inv]
    s = s.reshape(-1, n)

    g = k // gs
    zeros = np.full((g, n), 8, dtype=np.int64)
    return {
        "qweight": packing.pack_qweight(w_int.astype(np.uint32), 4),
        "qzeros": packing.pack_qzeros(zeros, 4),
        "scales": s,
        "g_idx": (np.arange(k) // gs).astype(np.int32),
    }


def convert_checkpoint_marlin_to_gptq(tensors: dict, group_size: int) -> dict:
    """Convert every Marlin layer (identified by a `.B` + `.s` pair) in a
    checkpoint tensor dict to GPTQ layout under the same module prefix."""
    out = {}
    for name, t in tensors.items():
        if name.endswith(".B") and name[:-2] + ".s" in tensors:
            base = name[:-2]
            conv = marlin_to_gptq(t, tensors[base + ".s"], group_size)
            for key, val in conv.items():
                out[f"{base}.{key}"] = val
        elif name.endswith(".s") and name[:-2] + ".B" in tensors:
            continue
        elif name.endswith(".workspace"):
            continue
        else:
            out[name] = t
    return out


__all__ = [
    "gptq_to_marlin",
    "marlin_to_gptq",
    "convert_checkpoint_marlin_to_gptq",
    "validate_marlin_compat",
]
