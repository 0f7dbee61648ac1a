"""Multi-head-per-DMA paged attention for decode (one query token/row).

The stock Pallas paged-attention kernel iterates (batch, kv_head) in its
grid and issues ONE async copy PER PAGE PER HEAD
(paged_attention_kernel.py:75-79) — 4 KB transfers for ps=16, d=128 bf16.
At beam/serving batch sizes with MHA models that is thousands of tiny DMAs
per layer, and decode attention runs far below HBM speed. This kernel makes
the PAGE the DMA unit instead:

- pools are PAGE-MAJOR ``[n_pages, hkv, ps, d]`` so one page holds every
  kv head's slab contiguously (128 KB for hkv=32, ps=16, d=128 bf16);
- the grid is ``(batch_rows, window_pages)`` and the page block is fetched
  via a scalar-prefetched page-table index_map — Pallas double-buffers
  consecutive page fetches automatically (no manual copy machinery);
- scores are computed DENSELY as ``q [H, D] @ page [hkv*ps, D]^T`` — one
  MXU dot per page for scores and one for the weighted values — with a
  block-diagonal (query-head -> its kv head) + length mask; off-head
  probabilities are exactly 0, so the single ``p @ v`` dot contracts to
  the right per-head sums. Flops are hkv-times redundant, but decode
  attention is DMA-bound: trading free MXU cycles for 32x fewer, 32x
  larger DMAs is the whole point.

Callers keep traffic length-proportional by slicing the page table to a
(power-of-two-bucketed) window of pages covering the live positions — the
same growing-window idea as utils.generation._window_phases.

The reference has no counterpart (no serving layer); the vLLM-style role
mirrors serving_paged.py. Exactness: tests compare against the dense jnp
path bit-for-bit shapes and HF-token-exact beam search.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _mh_kernel(lengths_ref, tables_ref, q_ref, k_ref, v_ref, *rest,
               ps, hkv, rep, h_pad, scale, w_total, quantized):
    if quantized:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    w = pl.program_id(1)

    @pl.when(w == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    length = lengths_ref[b]

    @pl.when(w * ps < length)
    def _compute():
        d = q_ref.shape[-1]
        cols = hkv * ps
        q = q_ref[0].astype(jnp.float32)                      # [h_pad, D]
        # block rank differs between per-layer [P,...] pools (leading 1) and
        # stacked [L, P, ...] pools (leading 1, 1) — reshape normalizes
        kf3 = k_ref[...].reshape(hkv, ps, d).astype(jnp.float32)
        if quantized:  # int8 pages, per-(page, head, position) scales
            # scales arrive [hkv, ps] (3-D pool blocks: a (1, N)-block over a
            # 2-D (P, N) pool is NOT liftable on real TPU hardware — the
            # second-to-last block dim must divide 8 or equal the array's);
            # apply them BEFORE the [hkv, ps, D] -> [cols, D] collapse so no
            # sublane->lane reshape of the scale vector is ever needed
            kf3 = kf3 * (ks_ref[...].reshape(hkv, ps)[..., None] * (1.0 / 127.5))
        kf = kf3.reshape(cols, d)
        s = jax.lax.dot_general(
            q, kf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                             # [h_pad, cols]
        qh = jax.lax.broadcasted_iota(jnp.int32, (h_pad, cols), 0) // rep
        kcol = jax.lax.broadcasted_iota(jnp.int32, (h_pad, cols), 1)
        kh = kcol // ps
        pos = w * ps + kcol % ps
        mask = (qh == kh) & (pos < length)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)             # [h_pad, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)                       # [h_pad, 1]
        vf3 = v_ref[...].reshape(hkv, ps, d).astype(jnp.float32)
        if quantized:
            vf3 = vf3 * (vs_ref[...].reshape(hkv, ps)[..., None] * (1.0 / 127.5))
        vf = vf3.reshape(cols, d)
        pv = jax.lax.dot_general(
            p, vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # [h_pad, D]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(
            alpha * l_prev + jnp.sum(p, axis=1, keepdims=True), l_ref.shape
        )

    @pl.when(w == w_total - 1)
    def _finish():
        o_ref[0] = (
            acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret", "layer"))
def paged_attention_mh(
    q: jnp.ndarray,        # [B, H, D] one query token per row
    k_pages: jnp.ndarray,  # [P, Hkv, ps, D] page-major pool, or [L, P, ...]
    v_pages: jnp.ndarray,  #   with layer=<static int> (stacked pools)
    lengths: jnp.ndarray,  # [B] int32 valid tokens per row
    tables: jnp.ndarray,   # [B, W] int32 page ids (W = the live window)
    k_scales: jnp.ndarray | None = None,   # [(L,) P, Hkv, ps] f32 (int8)
    v_scales: jnp.ndarray | None = None,
    *,
    sm_scale: float,
    interpret: bool = False,
    layer: int | None = None,
) -> jnp.ndarray:
    """Returns [B, H, D] attention outputs. ``tables``'s width W bounds the
    pages read per row — slice it to the live window before calling. int8
    pools pass per-(page, head, position) ``k_scales``/``v_scales``
    (dequant = q * s / 127.5, the serving int8 convention).

    Stacked pools: pass the full [L, P, Hkv, ps, D] pool with a static
    ``layer`` — the layer is baked into the BlockSpec index_map, so no
    [P, ...] slice is ever materialized (a per-layer slice of a 256-token
    beam pool profiled at 0.85 ms/step across 32 layers x 2 pools)."""
    b, h, d = q.shape
    stacked = k_pages.ndim == 5
    if stacked and layer is None:
        raise ValueError("layer= is required for stacked [L, P, ...] pools")
    hkv, ps = k_pages.shape[-3], k_pages.shape[-2]
    w_total = tables.shape[1]
    rep = h // hkv
    h_pad = max(8, -(-h // 8) * 8)
    if h_pad != h:
        q = jnp.pad(q, ((0, 0), (0, h_pad - h), (0, 0)))
    quantized = k_scales is not None

    kernel = functools.partial(
        _mh_kernel, ps=ps, hkv=hkv, rep=rep, h_pad=h_pad,
        scale=float(sm_scale), w_total=w_total, quantized=quantized,
    )
    grid = (b, w_total)
    if stacked:
        lyr = int(layer)
        page_spec = pl.BlockSpec(
            (1, 1, hkv, ps, d),
            lambda b_, w_, L, T: (lyr, T[b_, w_], 0, 0, 0),
        )
        scale_spec = pl.BlockSpec(
            (1, 1, hkv, ps), lambda b_, w_, L, T: (lyr, T[b_, w_], 0, 0)
        )
    else:
        page_spec = pl.BlockSpec(
            (1, hkv, ps, d), lambda b_, w_, L, T: (T[b_, w_], 0, 0, 0)
        )
        scale_spec = pl.BlockSpec(
            (1, hkv, ps), lambda b_, w_, L, T: (T[b_, w_], 0, 0)
        )
    in_specs = [
        pl.BlockSpec((1, h_pad, d), lambda b_, w_, L, T: (b_, 0, 0)),
        page_spec,
        page_spec,
    ]
    operands = [lengths.astype(jnp.int32), tables.astype(jnp.int32),
                q, k_pages, v_pages]
    if quantized:
        in_specs += [scale_spec, scale_spec]
        operands += [k_scales, v_scales]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, h_pad, d), lambda b_, w_, L, T: (b_, 0, 0)),
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
    )(*operands)
    return out[:, :h]


# Pool token-write strategy, A/B-able per process:
#   "auto"    — dus for int8 pools and the width-1 f32 scale pools,
#               scatter for float full-width pools (the per-dtype winners)
#   "dus"     — unrolled per-sequence dynamic_update_slice chain
#   "scatter" — the vector-index .at[].set form (XLA scatter)
# Same semantics when each sequence owns its current page (duplicate
# (page, off) pairs are last-wins in both). Same-session beam-4 e2e on
# v5e: int8 cache 272.8 (all-dus) vs 187.0 (all-scatter); bf16 218.3
# (dus) vs 236.5 (scatter) — "auto" reproduces the winner of each.
_POOL_WRITE = os.environ.get("AUTOGPTQ_TPU_POOL_WRITE", "auto")


def write_token_pages(pool, layer: int, page_of, off, rows):
    """Write one token's rows into a page-major pool, per sequence:
    ``pool[layer, page_of[b], :, off[b]] = rows[b]``.

    5-D pools take ``rows`` [B, hkv, d_or_1]; 4-D [L, P, hkv, ps] pools
    (the beam int8 SCALE pools — stored without the trailing 1 so the
    attention kernel never needs a full-pool squeeze-reshape) take
    [B, hkv]. ``page_of``/``off``: [B] int32 (each sequence owns its
    current page, so the updates never alias). Strategy selected by
    AUTOGPTQ_TPU_POOL_WRITE (see _POOL_WRITE above)."""
    if pool.ndim == 4:
        if rows.ndim == 3:  # callers may pass [B, hkv, 1] scale rows
            rows = rows[..., 0]
        b = rows.shape[0]
        r4 = rows[:, None, None, :, None].astype(pool.dtype)  # [B,1,1,hkv,1]
        zero = jnp.int32(0)
        for i in range(b):
            pool = jax.lax.dynamic_update_slice(
                pool, r4[i], (jnp.int32(layer), page_of[i], zero, off[i]))
        return pool
    strategy = _POOL_WRITE
    if strategy == "auto":
        strategy = (
            "dus" if pool.dtype == jnp.int8 or pool.shape[-1] == 1
            else "scatter"
        )
    if strategy == "scatter":
        return pool.at[layer, page_of, :, off].set(rows.astype(pool.dtype))
    b = rows.shape[0]
    r5 = rows[:, None, None, :, None, :].astype(pool.dtype)  # [B,1,1,hkv,1,d]
    zero = jnp.int32(0)
    for i in range(b):
        pool = jax.lax.dynamic_update_slice(
            pool, r5[i], (jnp.int32(layer), page_of[i], zero, off[i], zero))
    return pool


def _write_kernel(pof_ref, off_ref, kin, vin, krow_ref, vrow_ref, kout, vout,
                  *, ps):
    """Masked-select page RMW: copy the page block, overwrite row ``off``.
    A direct sub-block store at a dynamic sublane offset does not lower
    (Mosaic vector_store), so the row select is a vectorized where over the
    page — ~128 KB of VPU select per page, negligible."""
    b = pl.program_id(0)
    o = off_ref[b]
    sel = jax.lax.broadcasted_iota(
        jnp.int32, kin.shape, kin.ndim - 2) == o
    kout[...] = jnp.where(sel, krow_ref[...][:, None, :, None, :], kin[...])
    vout[...] = jnp.where(sel, vrow_ref[...][:, None, :, None, :], vin[...])


def write_token_pages_kernel(k_pool, v_pool, layer: int, page_of, off,
                             krows, vrows, *, interpret: bool = False):
    """Pallas in-place token write for BOTH pools of one layer:
    ``pool[layer, page_of[b], :, off[b]] = rows[b]`` for every sequence.

    Exists because any XLA lowering of this write (scatter or dus chains)
    gives the pool a layout preference that conflicts with the paged
    attention custom-call's default layout — XLA then inserts TWO
    full-pool layout-conversion copies per decode step (profiled: 0.94 ms
    at a 22-page pool, scaling with pool size to ~4-5 ms at 512-token beam
    pools). With the write as an aliased custom call, every pool use keeps
    the default layout. Each sequence owns its page (copy-on-share), so
    grid steps never collide; inactive serving slots all target the
    reserved null page, whose content is never attended.

    HAZARD: only use for float pools with a full-width minor dim. The
    int8-pool + width-1 f32 scale-pool combination compiled but FAULTED
    the TPU worker at runtime (Mosaic 1-lane blocks are a known danger
    zone); int8 paths keep the dus chain, which also measured fastest
    there (beam-4 int8 272.8 all-dus)."""
    b = page_of.shape[0]
    _, _, hkv, ps, d = k_pool.shape
    grid = (b,)
    pool_spec = pl.BlockSpec(
        (1, 1, hkv, ps, d),
        lambda i, pof, o, _l=layer: (_l, pof[i], 0, 0, 0))
    row_spec = pl.BlockSpec((1, hkv, d), lambda i, pof, o: (i, 0, 0))
    kernel = functools.partial(_write_kernel, ps=ps)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[pool_spec, pool_spec, row_spec, row_spec],
            out_specs=[pool_spec, pool_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ],
        input_output_aliases={2: 0, 3: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(page_of.astype(jnp.int32), off.astype(jnp.int32),
      k_pool, v_pool,
      krows.astype(k_pool.dtype), vrows.astype(v_pool.dtype))


def _gather_pages_kernel(src_ref, kin, vin, kout, vout):
    del src_ref
    kout[...] = kin[...]
    vout[...] = vin[...]


def _scatter_pages_kernel(dst_ref, kpg, vpg, kin, vin, kout, vout):
    del dst_ref, kin, vin   # pool inputs exist only for the aliasing
    kout[...] = kpg[...]
    vout[...] = vpg[...]


def copy_pages_pair(k_pool, v_pool, src, dst, *, interpret: bool = False):
    """``pool[:, dst[i]] = pool[:, src[i]]`` for BOTH pools, as two aliased
    Pallas calls: gather every src page into a compact [L, n, ...] buffer
    (all reads see the PRE-copy pools), then scatter it at ``dst``.

    Exists because the dynamic-slice + dynamic-update-slice form reads and
    writes the same buffer, which defeats XLA's in-place buffer assignment
    for the scan carry: the fused slice/update writes a fresh buffer and
    XLA restores the carry with a FULL-POOL copy — profiled at 4 x ~0.9 ms
    per beam-4 step on 256-token pools (the dominant beam-search cost,
    scaling with pool size). The scatter call aliases the pools
    (input_output_aliases), so only the n dst pages move. dst entries are
    unique (each beam's own page); src may alias another copy's dst, which
    the gather-first phase makes safe."""
    L, P, hkv, ps, d = k_pool.shape
    n = int(src.shape[0])
    grid = (n, L)
    page_blk = (1, 1, hkv, ps, d)

    def _pool_at(sel):
        return pl.BlockSpec(page_blk, lambda i, l, S: (l, sel(S, i), 0, 0, 0))

    def _compact():
        return pl.BlockSpec(page_blk, lambda i, l, S: (l, i, 0, 0, 0))

    pages_shape = jax.ShapeDtypeStruct((L, n, hkv, ps, d), k_pool.dtype)
    kpg, vpg = pl.pallas_call(
        _gather_pages_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[_pool_at(lambda S, i: S[i]), _pool_at(lambda S, i: S[i])],
            out_specs=[_compact(), _compact()],
        ),
        out_shape=[pages_shape, pages_shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(src.astype(jnp.int32), k_pool, v_pool)

    pool_shape = jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype)
    return pl.pallas_call(
        _scatter_pages_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                _compact(), _compact(),
                _pool_at(lambda S, i: S[i]), _pool_at(lambda S, i: S[i]),
            ],
            out_specs=[_pool_at(lambda S, i: S[i]),
                       _pool_at(lambda S, i: S[i])],
        ),
        out_shape=[pool_shape, pool_shape],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(dst.astype(jnp.int32), kpg, vpg, k_pool, v_pool)


def copy_pages(pool, src, dst):
    """Copy whole pages ``pool[:, dst[i]] = pool[:, src[i]]`` for each i —
    the beam-search copy-on-share primitive. The gather+scatter form
    (``pool.at[:, dst].set(pool[:, src])``) profiled at 2.3 ms/step on TPU;
    per-page dynamic_slice + dynamic_update_slice moves the same bytes at
    HBM rate. Two-phase (gather every src page FIRST, then write) because a
    dst page can be another copy's src in the same reorder (a sibling
    beam's parent page); dst entries themselves are unique (each beam's own
    page), matching the one-shot gather+scatter semantics."""
    n = src.shape[0]
    zero = jnp.int32(0)
    zeros = (zero,) * (pool.ndim - 2)
    sizes = (pool.shape[0], 1) + pool.shape[2:]
    pages = [
        jax.lax.dynamic_slice(pool, (zero, src[i]) + zeros, sizes)
        for i in range(n)            # all reads see the PRE-copy pool
    ]
    for i in range(n):
        pool = jax.lax.dynamic_update_slice(
            pool, pages[i], (zero, dst[i]) + zeros)
    return pool


def page_window_bucket(need: int, page_size: int, width: int) -> int:
    """Power-of-two page-table window (>= 8 pages) whose span covers ``need``
    positions, clamped to the preallocated table ``width``. The mh kernel
    walks the full table width it is given, so callers slice their tables to
    this bucket to keep DMA traffic proportional to the LIVE context. Shared
    by the paged-beam decode phases (utils/generation._page_phases) and the
    paged serving engine so the coverage contract (bucket * page_size >=
    live length, unless clamped at the full table) lives in one place."""
    wb = 8
    while wb * page_size < need:
        wb *= 2
    return min(wb, width)


def paged_attention_mh_ref(q, k_pages, v_pages, lengths, tables,
                           k_scales=None, v_scales=None, *, sm_scale):
    """Dense jnp reference (exact math, any backend): gathers the window's
    pages and does masked softmax attention."""
    b, h, d = q.shape
    _, hkv, ps, _ = k_pages.shape
    w = tables.shape[1]
    rep = h // hkv
    kg = k_pages[tables].astype(jnp.float32)     # [B, W, Hkv, ps, D]
    vg = v_pages[tables].astype(jnp.float32)
    if k_scales is not None:
        ks = k_scales[tables].reshape(b, w, hkv, ps, 1) / 127.5
        vs = v_scales[tables].reshape(b, w, hkv, ps, 1) / 127.5
        kg = kg * ks
        vg = vg * vs
    kg = kg.transpose(0, 2, 1, 3, 4).reshape(b, hkv, w * ps, d)
    vg = vg.transpose(0, 2, 1, 3, 4).reshape(b, hkv, w * ps, d)
    qh = q.reshape(b, hkv, rep, d).astype(jnp.float32)
    s = jnp.einsum("bhrd,bhtd->bhrt", qh, kg.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST) * sm_scale
    pos = jnp.arange(w * ps)[None, :]
    mask = pos < lengths[:, None]
    s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhrt,bhtd->bhrd", p, vg.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    return o.reshape(b, h, d)
