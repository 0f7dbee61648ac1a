"""Shape-aware tile autotuning for the fused decode kernels.

The reference ships a Triton autotuner that times tile candidates per M
(custom_autotune.py:19-94). XLA/Mosaic has no runtime tuner, so the kernel
wrappers use measured-at-4096^2 defaults — right at the LLaMA sweet spot
but unverified off it. This module closes that gap:

- ``pick_bn`` returns the N-tile for a (layout, K, N, gs, M-regime) shape:
  a measured value when one exists, else the caller's default heuristic.
- With ``AUTOGPTQ_TPU_AUTOTUNE=1`` (TPU only), the first use of an unseen
  shape times the candidate tiles EAGERLY with dummy operands of the real
  shapes (in-graph loop, slope between two trip counts — single dispatches
  through the axon tunnel are meaningless) and picks the fastest.
- Results persist to ``$AUTOGPTQ_TPU_AUTOTUNE_CACHE`` (default
  ``~/.cache/autogptq_tpu/autotune.json``) and are loaded on import, so a
  serving fleet pays the sweep once.
"""

from __future__ import annotations

import functools
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from ...utils.benchtime import slope_time

_CANDIDATE_BN = (512, 1024, 2048, 4096)


def _cache_path() -> str:
    return os.environ.get(
        "AUTOGPTQ_TPU_AUTOTUNE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "autogptq_tpu", "autotune.json"
        ),
    )


@functools.lru_cache(maxsize=1)
def _load() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


_session: dict[str, int] = {}


def _save(profile: dict) -> None:
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(profile, f, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only home: session cache still applies


def _m_class(m: int) -> str:
    # decode (M<32, factored per-group regime) vs prefill (one big dot);
    # the kernels themselves switch regime at M>=32
    return "decode" if m < 32 else "prefill"


def enabled() -> bool:
    return os.environ.get("AUTOGPTQ_TPU_AUTOTUNE", "") not in ("", "0")


def pick_bn(layout: str, k: int, n_pad: int, gs: int, m: int,
            default: int, bench=None) -> int:
    """Tile choice for this shape. ``bench(bn) -> fn(x)`` builds a runnable
    single-call candidate (dummy weights, real shapes) that
    :func:`~autogptq_tpu.utils.benchtime.slope_time` loops and times; only
    consulted when autotuning is enabled and the shape is unseen."""
    key = f"{layout}:{k}:{n_pad}:{gs}:{_m_class(m)}"
    hit = _session.get(key)
    if hit is not None:
        return hit
    hit = _load().get(key)
    if hit is not None:
        _session[key] = int(hit)
        return int(hit)
    if not enabled() or bench is None or jax.default_backend() != "tpu":
        return default
    best_bn, best_t = default, float("inf")
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((max(8, m), k)) * 0.1,
        jnp.bfloat16,
    )
    for bn in _CANDIDATE_BN:
        if bn > n_pad or n_pad % bn != 0:
            continue
        try:
            t = slope_time(bench(bn), x, n1=50, n2=1050, reps=3)
        except Exception:
            continue
        if t < best_t:
            best_bn, best_t = bn, t
    if best_t == float("inf"):
        # nothing measured (every candidate raised or was filtered) —
        # don't poison the caches with an untuned default; retry next call
        return default
    _session[key] = best_bn
    profile = dict(_load())
    profile[key] = best_bn
    _save(profile)
    return best_bn
