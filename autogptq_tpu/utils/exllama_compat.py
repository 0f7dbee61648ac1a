"""API-compat shims for reference helpers that have no TPU equivalent.

``exllama_set_max_input_length`` (reference utils/exllama_utils.py:8-79)
resizes the exllama act-order scratch buffers. The TPU runtime has no such
buffers — act-order is handled by a load-time row sort + activation gather —
so this is a no-op kept for drop-in source compatibility.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


def exllama_set_max_input_length(model, max_input_length: int):
    """No-op on TPU: there are no exllama scratch buffers to resize. Any
    input length up to the model's position limit works out of the box."""
    logger.info(
        "exllama_set_max_input_length(%d) is a no-op on the TPU backend "
        "(no act-order scratch buffers exist).",
        max_input_length,
    )
    return model


__all__ = ["exllama_set_max_input_length"]
