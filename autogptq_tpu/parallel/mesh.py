"""Device mesh construction + multi-host init.

The reference has NO distributed layer (multi-GPU is naive accelerate layer
placement, modeling/_base.py:929-960, which its own README shows scaling
below 1x). The TPU-native replacement is a GSPMD mesh: shardings are
declared on the params pytree (see sharding.py) and XLA inserts/overlaps the
collectives over ICI/DCN.

Axis convention: ("dp", "tp") by default — data/batch outermost (crosses DCN
on multi-host), tensor-parallel innermost (rides ICI). An optional "ep" axis
shards MoE experts.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def multihost_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running on a multi-host slice.

    No-ops when single-process (e.g. local runs / tests). TPU pods discover
    topology automatically; explicit args cover DCN clusters.
    """
    if jax.process_count() > 1:
        return  # already initialized
    env_ok = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if env_ok or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    tp: Optional[int] = None,
    dp: int = 1,
    ep: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: Optional[tuple[str, ...]] = None,
) -> Mesh:
    """Build a ("dp", "ep", "tp") mesh over the available devices.

    Defaults: all devices on the tp axis (the right choice for single-model
    serving on one slice). dp should span hosts (DCN), tp should stay within
    a host/ICI domain — the device order from jax.devices() already groups
    by process, so dp-outermost achieves that.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        tp = n // (dp * ep)
    if dp * ep * tp != n:
        raise ValueError(f"dp({dp}) * ep({ep}) * tp({tp}) != device count {n}")
    arr = np.asarray(devices).reshape(dp, ep, tp)
    names = axis_names or ("dp", "ep", "tp")
    return Mesh(arr, names)


__all__ = ["make_mesh", "multihost_initialize"]
