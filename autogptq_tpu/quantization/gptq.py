"""GPTQ solver: Hessian-weighted error-compensated quantization, in pure JAX.

Functional TPU-native re-design of the reference algorithm
(/root/reference/auto_gptq/quantization/gptq.py:19-206). The reference is a
stateful class doing per-column Python/torch work on GPU; here the whole
solve is a single jittable function:

  * Hessian accumulation is a pure fold (:func:`hessian_update`) —
    ``H = (2 / n) * sum_i x_i x_i^T`` maintained as a running mean.
  * :func:`gptq_quantize` performs the damped-Cholesky blockwise solve:
    dead-column zeroing, optional activation-order permutation (desc_act),
    per-group scale/zero search, and rank-1 error propagation, with the
    128-column blocks as a statically unrolled loop and the per-column inner
    loop as ``lax.fori_loop`` (compiler-friendly: all shapes static).

Numerics deliberately mirror the reference step-for-step (fp32 Hessian and
weights, damp = percdamp * mean(diag H), the stale-within-block W used for
group param search) so that checkpoints match within test tolerance.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .quantizer import QuantizerConfig, find_params, quantize_rtn


@dataclass(frozen=True)
class GPTQConfig:
    """Static solver configuration (hashable: used as a jit static arg)."""

    bits: int = 4
    group_size: int = -1
    sym: bool = True
    desc_act: bool = False          # activation-order ("act-order") quantization
    static_groups: bool = False
    percdamp: float = 0.01
    blocksize: int = 128
    mse: bool = False

    @property
    def maxq(self) -> int:
        return (1 << self.bits) - 1

    def quantizer(self) -> QuantizerConfig:
        return QuantizerConfig(bits=self.bits, sym=self.sym, mse=self.mse)


class GPTQResult(NamedTuple):
    qweight: jnp.ndarray   # [N, K] fake-quantized (dequantized) weights, fp32
    scale: jnp.ndarray     # [G, N] per-group scales
    zero: jnp.ndarray      # [G, N] per-group zero points (integral, stored float)
    g_idx: jnp.ndarray     # [K]    per-input-feature group index (original order)
    total_loss: jnp.ndarray  # scalar sum of proxy losses (reference: sum(Losses))
    row_loss: jnp.ndarray = None  # [N] per-output-row loss (splits a batched
    #                               multi-layer solve back into per-layer sums)


# ---------------------------------------------------------------------------
# Hessian accumulation.
# ---------------------------------------------------------------------------


def hessian_init(columns: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.zeros((columns, columns), jnp.float32), jnp.zeros((), jnp.int32)


@jax.jit
def hessian_update(
    h: jnp.ndarray, nsamples: jnp.ndarray, x: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold a batch of layer inputs into the running Hessian.

    ``x``: ``[B, T, K]`` or ``[T, K]`` activations feeding the linear layer.
    Matches reference ``add_batch`` (gptq.py:34-60): the sample count is the
    number of *sequences* (leading batch dim), not tokens.
    """
    if x.ndim == 2:
        x = x[None]
    batch = x.shape[0]
    x2d = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    new_n = nsamples + batch
    coeff = nsamples.astype(jnp.float32) / new_n.astype(jnp.float32)
    xs = x2d * jnp.sqrt(2.0 / new_n.astype(jnp.float32))
    # Full fp32 accumulation: the TPU default matmul precision is bf16, which
    # is far too coarse for a Hessian that gets Cholesky-factored later.
    h = h * coeff + jnp.matmul(xs.T, xs, precision=jax.lax.Precision.HIGHEST)
    return h, new_n


# ---------------------------------------------------------------------------
# The solver.
# ---------------------------------------------------------------------------


def _cholesky_inv_upper(h: jnp.ndarray) -> jnp.ndarray:
    """Upper-triangular U with ``H^{-1} = U^T U`` (reference gptq.py:116-118)."""
    l = jnp.linalg.cholesky(h)
    eye = jnp.eye(h.shape[0], dtype=h.dtype)
    hinv = jax.scipy.linalg.cho_solve((l, True), eye)
    # cholesky(A, upper=True) in torch is the transpose of the lower factor.
    return jnp.linalg.cholesky(hinv).T


@partial(jax.jit, static_argnames=("cfg",))
def gptq_quantize(w: jnp.ndarray, h: jnp.ndarray, cfg: GPTQConfig) -> GPTQResult:
    """Quantize one weight matrix ``w[N, K]`` given Hessian ``h[K, K]``.

    Returns fake-quantized weights plus per-group parameters and ``g_idx``,
    all in the *original* (unpermuted) column order.
    """
    n, k = w.shape
    gs = cfg.group_size if cfg.group_size != -1 else k
    n_groups = -(-k // gs)
    k_pad = n_groups * gs
    bs = cfg.blocksize
    qcfg = cfg.quantizer()
    maxq = cfg.maxq

    w = w.astype(jnp.float32)
    h = h.astype(jnp.float32)

    # Whole-matrix params (used when group_size == -1): computed on the raw W
    # before dead-column zeroing, matching reference order (gptq.py:79-86).
    full_scale, full_zero = find_params(w, qcfg)

    diag = jnp.diagonal(h)
    dead = diag == 0
    h = h + jnp.diag(jnp.where(dead, 1.0, 0.0))
    w = jnp.where(dead[None, :], 0.0, w)

    # Static-group params are found on the *unpermuted* dead-zeroed W
    # (reference gptq.py:93-102).
    if cfg.static_groups:
        sg_scale = jnp.zeros((n_groups, n), jnp.float32)
        sg_zero = jnp.zeros((n_groups, n), jnp.float32)
        w_pad0 = jnp.pad(w, ((0, 0), (0, k_pad - k)))
        for g in range(n_groups):
            s, z = find_params(w_pad0[:, g * gs : (g + 1) * gs], qcfg)
            sg_scale = sg_scale.at[g].set(s)
            sg_zero = sg_zero.at[g].set(z)
    else:
        sg_scale = sg_zero = None

    if cfg.desc_act:
        perm = jnp.argsort(-jnp.diagonal(h))
        w = w[:, perm]
        h = h[perm][:, perm]
        invperm = jnp.argsort(perm)
    else:
        perm = invperm = None

    damp = cfg.percdamp * jnp.mean(jnp.diagonal(h))
    h = h + damp * jnp.eye(k, dtype=jnp.float32)
    hinv = _cholesky_inv_upper(h)

    # Global W, zero-padded so in-loop group slices are always full-width
    # (zero columns are exactly neutral for find_params — see quantizer docs).
    w_pad = jnp.pad(w, ((0, 0), (0, k_pad - k)))

    q_full = jnp.zeros((n, k), jnp.float32)
    scale_arr = jnp.zeros((n_groups, n), jnp.float32)
    zero_arr = jnp.zeros((n_groups, n), jnp.float32)
    if cfg.static_groups:
        scale_arr, zero_arr = sg_scale, sg_zero
    elif cfg.group_size == -1:
        scale_arr = full_scale[None, :]
        zero_arr = full_zero[None, :]
    total_loss = jnp.zeros((n,), jnp.float32)   # per-row; summed at the end

    col_idx = jnp.arange(bs)
    # Current-group params carry across block boundaries (matters when
    # group_size > blocksize); they start as the whole-matrix params.
    cur_s, cur_z = full_scale, full_zero

    for i1 in range(0, k, bs):
        i2 = min(i1 + bs, k)
        count = i2 - i1
        w1 = w_pad[:, i1:i2]                       # [N, count]
        hinv1 = hinv[i1:i2, i1:i2]                 # [count, count]
        cidx = col_idx[:count]

        def column_step(i, state):
            w1, q1, err1, scale_arr, zero_arr, cur_s, cur_z, loss = state
            j = i1 + i  # global column in (permuted) order

            if cfg.group_size != -1 and not cfg.static_groups:
                # Entering a new group: search params on the stale global W
                # (reference reads the un-updated block-start W, gptq.py:138).
                def new_params(args):
                    scale_arr, zero_arr, _, _ = args
                    cols = jax.lax.dynamic_slice(w_pad, (0, j), (n, gs))
                    s, z = find_params(cols, qcfg)
                    g = j // gs
                    return (
                        scale_arr.at[g].set(s),
                        zero_arr.at[g].set(z),
                        s,
                        z,
                    )

                scale_arr, zero_arr, cur_s, cur_z = jax.lax.cond(
                    j % gs == 0,
                    new_params,
                    lambda args: args,
                    (scale_arr, zero_arr, cur_s, cur_z),
                )
            elif cfg.static_groups:
                # Group of the ORIGINAL column index (reference gptq.py:144-148).
                orig = perm[j] if cfg.desc_act else j
                g = orig // gs
                cur_s = scale_arr[g]
                cur_z = zero_arr[g]

            wcol = jax.lax.dynamic_slice(w1, (0, i), (n, 1))[:, 0]
            d = hinv1[i, i]
            q = quantize_rtn(wcol, cur_s, cur_z, maxq)
            e = (wcol - q) / d
            loss = loss + ((wcol - q) ** 2 / d**2) / 2.0

            hrow = hinv1[i, :]                      # [count]
            upd = e[:, None] * hrow[None, :]
            w1 = w1 - jnp.where(cidx[None, :] >= i, upd, 0.0)
            q1 = q1.at[:, i].set(q)
            err1 = err1.at[:, i].set(e)
            return (w1, q1, err1, scale_arr, zero_arr, cur_s, cur_z, loss)

        init = (
            w1,
            jnp.zeros((n, count), jnp.float32),
            jnp.zeros((n, count), jnp.float32),
            scale_arr,
            zero_arr,
            cur_s,
            cur_z,
            total_loss,
        )
        (w1, q1, err1, scale_arr, zero_arr, cur_s, cur_z, total_loss) = jax.lax.fori_loop(
            0, count, column_step, init
        )

        q_full = q_full.at[:, i1:i2].set(q1)
        if i2 < k:
            # Propagate block error to the remaining real columns (fp32 MXU).
            w_pad = w_pad.at[:, i2:k].add(
                -jnp.matmul(err1, hinv[i1:i2, i2:], precision=jax.lax.Precision.HIGHEST)
            )

    # Group indices in original column order.
    if cfg.static_groups and cfg.desc_act:
        g_idx_perm = perm // gs                     # group of original column
        g_idx = g_idx_perm[invperm]
    else:
        g_idx = jnp.arange(k, dtype=jnp.int32) // gs
        if cfg.desc_act:
            g_idx = g_idx[invperm]

    if cfg.desc_act:
        q_full = q_full[:, invperm]

    return GPTQResult(
        qweight=q_full,
        scale=scale_arr,
        zero=zero_arr,
        g_idx=g_idx.astype(jnp.int32),
        total_loss=jnp.sum(total_loss),
        row_loss=total_loss,
    )


__all__ = ["GPTQConfig", "GPTQResult", "gptq_quantize", "hessian_init", "hessian_update"]
