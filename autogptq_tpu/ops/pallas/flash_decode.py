"""Flash-decode attention over the CONTIGUOUS stacked KV cache.

The batch-1/batched decode step previously attended through an XLA f32
einsum over ``cache[layer]`` — profiled at ~0.4-1.0 ms/token (window
dependent) vs ~0.2 ms of raw KV HBM traffic, plus per-layer slice ops of
the stacked cache. This kernel is the contiguous-cache sibling of
``paged_attn.paged_attention_mh`` (the multi-head-per-DMA idea):

- the FULL stacked cache ``[L, B, S, Hkv, D]`` is the operand; the layer
  is baked into the BlockSpec index_map, so no per-layer slice of the
  cache is ever materialized;
- the grid is ``(batch, S/sblk)`` and each step DMAs one contiguous
  ``[sblk, Hkv, D]`` span of the cache (position-major — the cache's
  native order, a single sequential HBM stream);
- scores are computed densely as ``q [H, D] @ span [sblk*Hkv, D]^T`` —
  one MXU dot per span for scores, one for values — with a
  (query-head -> its kv head) block mask plus per-row ``[lo, hi)``
  validity bounds (left-padding + causality as scalars, no mask array);
- blocks at/after a row's live length are clamped by the index_map to
  the last live block (consecutive identical indices skip the copy), so
  DMA traffic tracks the LIVE context, not the padded window;
- streaming softmax (running max / denominator / weighted sum) across
  the S grid dimension, exactly like the paged kernel.

Numerics: all math f32 (bf16 cache values upcast in-kernel), matching the
einsum path's f32 compute to float-reassociation error.

Reference role: the reference's CUDA decode runs torch SDPA over a
dynamic cache (auto_gptq has no attention kernel of its own); this is the
TPU-native replacement for the static-cache einsum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def pick_sblk(s: int, hkv: int, d: int, dtype_bytes: int = 2,
              vmem_budget: int = 2 * 1024 * 1024) -> int | None:
    """Largest divisor of ``s`` whose [sblk, hkv, d] K block fits the
    per-buffer VMEM budget (double-buffered k+v plus the in-kernel f32
    upcasts put ~6x this in flight). Returns None when only degenerate
    (< 8 positions) splits exist."""
    cap = max(1, vmem_budget // (hkv * d * dtype_bytes))
    best = None
    for sblk in range(min(s, cap), 0, -1):
        if s % sblk == 0:
            best = sblk
            break
    if best is None or (best < 8 and s > best):
        return None
    return best


def _kernel(lo_ref, hi_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            *, sblk, hkv, rep, h_pad, scale, nw):
    b = pl.program_id(0)
    w = pl.program_id(1)

    @pl.when(w == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    lo = lo_ref[b]
    hi = hi_ref[b]

    @pl.when((w * sblk < hi) & ((w + 1) * sblk > lo))
    def _compute():
        d = q_ref.shape[-1]
        cols = sblk * hkv
        q = q_ref[0].astype(jnp.float32)                     # [h_pad, D]
        kf = k_ref[0, 0].astype(jnp.float32).reshape(cols, d)
        s = jax.lax.dot_general(
            q, kf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                            # [h_pad, cols]
        # position-major span: col = srow * hkv + kh
        qh = jax.lax.broadcasted_iota(jnp.int32, (h_pad, cols), 0) // rep
        kcol = jax.lax.broadcasted_iota(jnp.int32, (h_pad, cols), 1)
        kh = kcol % hkv
        pos = w * sblk + kcol // hkv
        mask = (qh == kh) & (pos >= lo) & (pos < hi)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        vf = v_ref[0, 0].astype(jnp.float32).reshape(cols, d)
        pv = jax.lax.dot_general(
            p, vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [h_pad, D]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(
            alpha * l_prev + jnp.sum(p, axis=1, keepdims=True), l_ref.shape
        )

    @pl.when(w == nw - 1)
    def _finish():
        o_ref[0] = (
            acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("layer", "sm_scale", "sblk", "hkv", "interpret")
)
def flash_decode(
    q: jnp.ndarray,        # [B, H, D] one query token per row
    k_cache: jnp.ndarray,  # [L, B, S, Hkv, D] stacked cache (post-write)
    v_cache: jnp.ndarray,  # [L, B, S, Hkv, D]
    lo: jnp.ndarray,       # [B] int32 first attendable slot (left-pad count)
    hi: jnp.ndarray,       # [B] int32 exclusive upper slot bound
    *,
    layer: int,
    sm_scale: float,
    sblk: int,
    hkv: int | None = None,  # this LAYER's kv heads (cache may pad: var-GQA)
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, H, D] f32 attention outputs for one decode token per
    row, attending cache slots ``[lo[b], hi[b])`` of ``layer``. ``sblk``
    must divide S (use :func:`pick_sblk`). With a head-padded cache
    (variable GQA), pass the layer's true ``hkv`` — padded kv heads never
    match any query head and drop out through the block mask."""
    b, h, d = q.shape
    _, _, s, hkv_c, _ = k_cache.shape
    nw = s // sblk
    rep = h // (hkv if hkv is not None else min(hkv_c, h))
    h_pad = max(8, -(-h // 8) * 8)
    if h_pad != h:
        q = jnp.pad(q, ((0, 0), (0, h_pad - h), (0, 0)))

    kernel = functools.partial(
        _kernel, sblk=sblk, hkv=hkv_c, rep=rep, h_pad=h_pad,
        scale=float(sm_scale), nw=nw,
    )

    def span_map(b_, w_, lo_, hi_):
        # clamp dead trailing blocks to the row's last live block:
        # consecutive identical indices skip the DMA entirely
        live = jnp.maximum((hi_[b_] - 1) // sblk, 0)
        return (layer, b_, jnp.minimum(w_, live), 0, 0)

    span_spec = pl.BlockSpec((1, 1, sblk, hkv_c, d), span_map)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nw),
            in_specs=[
                pl.BlockSpec((1, h_pad, d), lambda b_, w_, lo_, hi_: (b_, 0, 0)),
                span_spec,
                span_spec,
            ],
            out_specs=pl.BlockSpec(
                (1, h_pad, d), lambda b_, w_, lo_, hi_: (b_, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((h_pad, 128), jnp.float32),   # running max
                pltpu.VMEM((h_pad, 128), jnp.float32),   # running denom
                pltpu.VMEM((h_pad, d), jnp.float32),     # weighted sum
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h_pad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lo.astype(jnp.int32), hi.astype(jnp.int32), q, k_cache, v_cache)
    return out[:, :h]


def flash_decode_ref(q, k_cache, v_cache, lo, hi, *, layer, sm_scale,
                     hkv=None):
    """Dense jnp reference (exact math, any backend)."""
    b, h, d = q.shape
    hkv_c = k_cache.shape[3]
    if hkv is None:
        hkv = min(hkv_c, h)
    rep = h // hkv
    keys = k_cache[layer, :, :, :hkv].astype(jnp.float32)    # [B, S, hkv, D]
    vals = v_cache[layer, :, :, :hkv].astype(jnp.float32)
    s = keys.shape[1]
    qh = q.reshape(b, hkv, rep, d).astype(jnp.float32)
    sc = jnp.einsum("bhrd,bshd->bhrs", qh, keys,
                    precision=jax.lax.Precision.HIGHEST) * sm_scale
    pos = jnp.arange(s)[None, :]
    mask = (pos >= lo[:, None]) & (pos < hi[:, None])
    sc = jnp.where(mask[:, None, None, :], sc, NEG_INF)
    p = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("bhrs,bshd->bhrd", p, vals,
                   precision=jax.lax.Precision.HIGHEST)
    return o.reshape(b, h, d)
