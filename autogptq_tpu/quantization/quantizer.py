"""Scale/zero-point search ("quantizer") in pure JAX.

Functional re-design of the reference's stateful ``Quantizer`` module
(reference semantics: /root/reference/auto_gptq/quantization/quantizer.py).
Instead of an nn.Module holding buffers, this exposes pure functions that are
jit/vmap-friendly and run on TPU or CPU:

  * :func:`find_params` — per-channel (or per-tensor) min/max scale & zero
    search with optional symmetric mode and MSE grid-search refinement.
  * :func:`quantize_rtn` — round-to-nearest quantize/dequantize given params.

Conventions: weight matrices are ``[rows, cols] = [out_features, in_features]``
slices; ``find_params(w)`` returns per-row ``scale``/``zero`` of shape
``[rows]`` (the reference's ``weight=True, perchannel=True`` path, which is
the only path GPTQ uses).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class QuantizerConfig:
    bits: int = 4
    sym: bool = True
    mse: bool = False
    norm: float = 2.4
    grid: int = 100
    maxshrink: float = 0.8

    @property
    def maxq(self) -> int:
        return (1 << self.bits) - 1


def quantize_rtn(x: jnp.ndarray, scale: jnp.ndarray, zero: jnp.ndarray, maxq: int) -> jnp.ndarray:
    """Round-to-nearest fake-quantization: ``scale * (clip(round(x/scale)+zero) - zero)``.

    Matches reference ``quantize()`` (quantizer.py:10-14). ``scale``/``zero``
    broadcast against ``x``.
    """
    q = jnp.clip(jnp.round(x / scale) + zero, 0, maxq)
    return scale * (q - zero)


@partial(jax.jit, static_argnames=("cfg",))
def find_params(x: jnp.ndarray, cfg: QuantizerConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row quantization params for a weight slice ``x[rows, cols]``.

    Returns ``(scale[rows], zero[rows])``. Semantics mirror the reference
    weight path (quantizer.py:45-116): ranges include 0, symmetric mode
    mirrors the max magnitude, degenerate all-zero rows get range [-1, 1],
    symmetric zero point is the fixed midpoint ``(maxq + 1) / 2``, and the
    optional MSE pass shrinks the range over a grid minimizing the
    ``norm``-power reconstruction error.

    Note on parity: XLA's fp32 division is not IEEE-correctly-rounded, so on
    exact .5 rounding boundaries the asymmetric zero point can differ from a
    torch/numpy computation by one code. This shifts the grid by one step but
    does not change reconstruction error bounds (still <= scale/2 per value).
    """
    maxq = cfg.maxq
    x = x.astype(jnp.float32)
    xmin = jnp.minimum(jnp.min(x, axis=1), 0.0)
    xmax = jnp.maximum(jnp.max(x, axis=1), 0.0)

    if cfg.sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)

    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)

    scale = (xmax - xmin) / maxq
    if cfg.sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = jnp.round(-xmin / scale)

    if cfg.mse:
        def body(i, state):
            best, scale, zero = state
            p = 1.0 - i / cfg.grid
            xmin1 = p * xmin
            xmax1 = p * xmax
            scale1 = (xmax1 - xmin1) / maxq
            zero1 = zero if cfg.sym else jnp.round(-xmin1 / scale1)
            q = quantize_rtn(x, scale1[:, None], zero1[:, None], maxq)
            err = jnp.sum(jnp.abs(q - x) ** cfg.norm, axis=1)
            better = err < best
            return (
                jnp.where(better, err, best),
                jnp.where(better, scale1, scale),
                jnp.where(better, zero1, zero),
            )

        best = jnp.full(x.shape[0], jnp.inf, dtype=jnp.float32)
        n_steps = int(cfg.maxshrink * cfg.grid)
        best, scale, zero = jax.lax.fori_loop(
            0, n_steps, body, (best, scale, zero)
        )

    return scale, zero


def find_params_tensor(x: jnp.ndarray, cfg: QuantizerConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor variant (the reference's ``perchannel=False``): one scalar
    scale/zero for the whole array."""
    scale, zero = find_params(x.reshape(1, -1), cfg)
    return scale[0], zero[0]


__all__ = ["QuantizerConfig", "find_params", "find_params_tensor", "quantize_rtn"]
