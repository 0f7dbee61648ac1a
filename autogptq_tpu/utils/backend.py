"""Backend availability & selection (analog of the reference's
utils/import_utils.dynamically_import_QuantLinear decision tree, :59-112).

The seven-backend CUDA zoo collapses to two execution paths on TPU:

  * "pallas" — the fused sub-byte dequant-matmul kernel (TPU only, shapes
    must tile: see ops/pallas/gemm.supported)
  * "xla"    — dequantize + dot fallback (everywhere: CPU tests, interpret
    mode, autodiff through quantized layers, odd shapes)

"auto" picks per-layer at trace time. This module exposes the availability
flags and a select() helper so user code can introspect the decision the
way reference users used `dynamically_import_QuantLinear`.
"""

from __future__ import annotations

import jax

BACKENDS = ("pallas", "xla")


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def xla_available() -> bool:
    return True


def select_backend(
    bits: int = 4,
    group_size: int = -1,
    in_features: int | None = None,
    out_features: int | None = None,
    desc_act: bool = False,
    trainable: bool = False,
) -> str:
    """The backend "auto" would choose for a layer with these properties."""
    # trainable mode no longer forces the fallback: matmul() carries a custom
    # VJP whose backward runs the fused transpose kernel (the Triton-v1 role,
    # reference triton_utils/kernels.py:248-339) — LoRA/AdaLoRA training keeps
    # the Pallas path. 2/8-bit (planar) backward falls back to XLA dequant.
    if trainable and bits not in (3, 4):
        return "xla"
    if not pallas_available():
        return "xla"
    if in_features is not None:
        from ..ops.pallas.gemm import _pick_bk

        if _pick_bk(in_features, group_size) is None:
            return "xla"
    return "pallas"


def diagnostics() -> dict:
    return {
        "jax_backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "pallas_available": pallas_available(),
        "native_packlib": _native_available(),
    }


def _native_available() -> bool:
    from ..ops import native

    return native.available()


__all__ = ["BACKENDS", "pallas_available", "xla_available", "select_backend", "diagnostics"]
