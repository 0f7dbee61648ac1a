"""Jit-compiled autoregressive generation: greedy / temperature sampling /
beam search, with a preallocated KV cache.

Protocol matches the reference benchmark (examples/benchmark/
generation_speed.py:23-75): ``min_new_tokens`` suppresses EOS until the
minimum is produced (their MinNewTokensLengthLogitsProcessor), tokens/s is
counted over generated tokens only.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import arch
from ..models.arch import KVCache

NEG_INF = -1e30

# Whole-program jit for generate(): without it the prefill forward and the
# inter-phase cache slice/merge dispatch op-by-op and every phase scan is a
# separate executable launch — through the remote-TPU tunnel that measured
# ~0.4 ms/token of device idle between launches. One jit = one launch per
# generate() call. "0" restores per-op dispatch (debugging knob).
JIT_GENERATE = os.environ.get("AUTOGPTQ_TPU_JIT_GENERATE", "1") != "0"


def _maybe_jit(**jit_kwargs):
    """jax.jit under the JIT_GENERATE knob (identity decorator when off)."""
    if JIT_GENERATE:
        return functools.partial(jax.jit, **jit_kwargs)
    return lambda fn: fn


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _prep_inputs(input_ids, pad_token_id=0):
    if isinstance(input_ids, (list, tuple)):
        arr = [np.asarray(x).reshape(-1) for x in input_ids]
    else:
        arr = np.asarray(input_ids)
        if arr.ndim == 1:
            arr = arr[None]
        arr = list(arr)
    t = max(len(a) for a in arr)
    ids = np.full((len(arr), t), pad_token_id, np.int32)
    mask = np.zeros((len(arr), t), np.int32)
    for i, a in enumerate(arr):
        ids[i, t - len(a):] = a
        mask[i, t - len(a):] = 1
    return ids, mask


def _window_phases(t: int, max_new_tokens: int, total: int):
    """Static growing attention windows for the decode scan.

    Phase ``(s0, s1, w)`` runs steps ``[s0, s1)`` with the cache's S axis
    sliced to ``w`` (``w >= t + s1``, so every read AND write lands inside
    the window). The decode attention reads the whole (padded) cache every
    step under jit; growing the window in power-of-two phases cuts that KV
    read traffic ~30% over a 512-token generation and far more at batch>1
    — the HF/reference stack gets this for free from its dynamic cache
    (torch cat per step); this is the static-shape equivalent."""
    phases = []
    s, w = 1, 128
    while s < max_new_tokens:
        while w < total and w - t - 1 < s:
            w *= 2
        w_eff = min(w, total)
        s1 = max_new_tokens if w_eff >= total else min(max_new_tokens, w_eff - t)
        phases.append((s, s1, w_eff))
        s = s1
    return phases


def _page_phases(t: int, max_new_tokens: int, width: int, ps: int):
    """Static growing PAGE windows for the paged-beam decode scan — the
    page-space analog of :func:`_window_phases`. Phase ``(s0, s1, wb)``
    runs steps ``[s0, s1)`` with the attention page table sliced to its
    first ``wb`` entries (``wb * ps >= t + s1``, so every live position is
    covered). The mh paged-attention kernel walks the table width
    unconditionally (dead entries point at live-ish pages whose data is
    masked), so slicing the table keeps its DMA traffic proportional to
    the LIVE context instead of the preallocated width."""
    from ..ops.pallas.paged_attn import page_window_bucket

    phases = []
    s = 1
    while s < max_new_tokens:
        wb = page_window_bucket(t + s + 1, ps, width)
        if wb >= width:
            phases.append((s, max_new_tokens, width))
            break
        s1 = min(max_new_tokens, wb * ps - t)
        phases.append((s, s1, wb))
        s = s1
    return phases


def _slice_cache(c: KVCache, w: int) -> KVCache:
    sl = lambda a: jax.lax.slice_in_dim(a, 0, w, axis=2)
    return KVCache(
        k=sl(c.k), v=sl(c.v), length=c.length,
        k_scale=None if c.k_scale is None else sl(c.k_scale),
        v_scale=None if c.v_scale is None else sl(c.v_scale),
    )


def _merge_cache(full: KVCache, part: KVCache) -> KVCache:
    zero = (0,) * 5
    upd = lambda f, p: jax.lax.dynamic_update_slice(f, p, zero)
    return KVCache(
        k=upd(full.k, part.k), v=upd(full.v, part.v), length=part.length,
        k_scale=None if full.k_scale is None else upd(full.k_scale, part.k_scale),
        v_scale=None if full.v_scale is None else upd(full.v_scale, part.v_scale),
    )


@_maybe_jit(
    static_argnames=(
        "cfg", "max_new_tokens", "min_new_tokens", "eos_token_id",
        "temperature", "backend", "dtype", "kv_quant", "pad_token_id",
        "phased",
    ),
)
def _generate_greedy(
    params,
    tokens,           # [B, T] int32
    mask,             # [B, T]
    cfg,
    max_new_tokens,
    min_new_tokens,
    eos_token_id,
    temperature,
    backend,
    dtype,
    rng_key,
    kv_quant=False,
    pad_token_id=0,
    phased=True,
):
    b, t = tokens.shape
    total = t + max_new_tokens
    cache = KVCache.create(cfg, b, total, dtype=dtype, quantized=kv_quant)
    validity = jnp.zeros((b, total), jnp.int32)
    validity = validity.at[:, :t].set(mask)

    positions = jnp.maximum(jnp.cumsum(mask, axis=-1) - 1, 0)
    logits, cache = arch.forward(
        params, tokens, cfg, cache=cache, positions=positions,
        backend=backend, attn_mask=validity, dtype=dtype, fresh_prefill=True,
        logits_last_only=True,   # left-padded: last position is the newest
    )
    last_logits = logits[:, -1, :]
    next_pos = positions[:, -1] + 1

    def sample(logits, step, key):
        if eos_token_id is not None and min_new_tokens > 0:
            logits = jnp.where(
                (step < min_new_tokens)
                & (jnp.arange(logits.shape[-1])[None, :] == eos_token_id),
                NEG_INF,
                logits,
            )
        if temperature and temperature > 0.0:
            return jax.random.categorical(key, logits / temperature, axis=-1)
        return jnp.argmax(logits, axis=-1)

    key0, rng_key = jax.random.split(rng_key)
    first_tok = sample(last_logits, 0, key0).astype(jnp.int32)
    finished0 = jnp.zeros((b,), bool)
    if eos_token_id is not None:
        finished0 = first_tok == eos_token_id

    out_tokens0 = jnp.zeros((b, max_new_tokens), jnp.int32)
    out_tokens0 = out_tokens0.at[:, 0].set(first_tok)

    def step_fn(state, step):
        cache, validity, cur_tok, cur_pos, finished, out, key = state
        validity = jax.lax.dynamic_update_slice(
            validity, jnp.ones((b, 1), jnp.int32), (0, cache.length)
        )
        logits, cache = arch.forward(
            params, cur_tok[:, None], cfg, cache=cache,
            positions=cur_pos[:, None], backend=backend, attn_mask=validity, dtype=dtype,
            mask_contig=True,   # validity = left-pad run + appended ones
        )
        if temperature and temperature > 0.0:
            key, sub = jax.random.split(key)
        else:       # greedy: skip the per-step threefry hash entirely
            sub = key
        raw = sample(logits[:, -1, :], step, sub).astype(jnp.int32)
        nxt = raw
        if eos_token_id is not None:
            # HF protocol: the EOS token itself is kept; positions AFTER it
            # are filled with pad_token_id (not more EOS)
            nxt = jnp.where(finished, pad_token_id, raw)
            finished = finished | (raw == eos_token_id)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, step))
        return (cache, validity, nxt, cur_pos + 1, finished, out, key), None

    state = (cache, validity, first_tok, next_pos, finished0, out_tokens0, rng_key)
    phases = (
        _window_phases(t, max_new_tokens, total)
        if phased else [(1, max_new_tokens, total)]
    )
    for s0, s1, w in phases:
        if s1 <= s0:
            continue
        if w >= total:
            state, _ = jax.lax.scan(step_fn, state, jnp.arange(s0, s1))
        else:
            cache_f, validity_f = state[0], state[1]
            st = (_slice_cache(cache_f, w), validity_f[:, :w]) + state[2:]
            st, _ = jax.lax.scan(step_fn, st, jnp.arange(s0, s1))
            state = (
                _merge_cache(cache_f, st[0]),
                jax.lax.dynamic_update_slice(validity_f, st[1], (0, 0)),
            ) + st[2:]
    return state[5]


def _gather_beams(tree, idx):
    """Gather along the leading (flattened batch*beam) axis."""
    return jax.tree_util.tree_map(lambda x: x[idx] if x.ndim >= 1 else x, tree)


def _flat_top2k(cand):
    """top_k(cand.reshape(b, k*vocab), 2k) computed in two stages (per-beam
    top-2k over [b, k, vocab], then a tiny merge). A single-row top_k over
    k*vocab lanes reduces serially on TPU (profiled 0.51 ms/step at beam 4,
    Llama vocab); the per-beam stage uses the k sublane rows in parallel.
    EXACTLY equivalent, ties included: within a beam, top_k orders equal
    values by ascending index (same as flat); across beams the merge input
    is ordered beam-major (same as flat); and a beam can contribute at most
    2k entries to the global 2k, which its own stage-1 list always covers.
    Returns (values [b, 2k], flat indices [b, 2k])."""
    b, k, vocab = cand.shape
    k2 = 2 * k
    v1, i1 = jax.lax.top_k(cand, k2)                        # [b, k, 2k]
    i1f = (jnp.arange(k, dtype=jnp.int32)[None, :, None] * vocab
           + i1.astype(jnp.int32)).reshape(b, k * k2)
    v2, sel = jax.lax.top_k(v1.reshape(b, k * k2), k2)      # [b, 2k]
    return v2, jnp.take_along_axis(i1f, sel, axis=1)



def _beam_row_done(done_scores, best_raw, gen_len, p, early_stopping,
                   max_new_tokens):
    """HF BeamHypotheses.is_done, vectorized: pool full AND (early_stopping
    is True, or no candidate can still beat the worst kept hypothesis at
    the best attainable normalization — generated-length based,
    generation/beam_search.py:is_done; early_stopping='never' with p > 0
    normalizes by max_length - prompt = max_new_tokens)."""
    pool_full = done_scores[:, -1] > NEG_INF / 2
    if early_stopping is True:
        return pool_full
    if early_stopping == "never" and p > 0.0:
        div = float(max_new_tokens) ** p
    else:   # False, or 'never' with p <= 0: best length is the current one
        div = gen_len ** p
    return pool_full & (done_scores[:, -1] >= best_raw / div)


def _beam_pool_seed(lp0, k, eos, p, early_stopping, max_new_tokens):
    """Step-0 HF BeamSearchScorer.process + is_done. HF normalizes a done
    hypothesis by its GENERATED length (= 1 here: process passes
    generated_len = cur_len + 1 - decoder_prompt_len), only finalizes EOS
    candidates ranked within the top num_beams
    (is_beam_token_worse_than_top_num_beams), and can mark a row done at
    the first step. Returns (done_scores, done_tokens, frozen,
    s2k-with-eos-masked, tok2k)."""
    b = lp0.shape[0]
    done_scores = jnp.full((b, k), NEG_INF)
    done_tokens = jnp.zeros((b, k, max_new_tokens), jnp.int32)
    frozen = jnp.zeros((b,), bool)
    s2k, tok2k = jax.lax.top_k(lp0, 2 * k)
    if eos is not None:
        is_eos = tok2k == eos
        rank_ok = jnp.arange(2 * k)[None, :] < k
        cand = jnp.where(is_eos & rank_ok, s2k, NEG_INF)   # / (1 ** p)
        pool_s = jnp.concatenate([done_scores, cand], axis=1)
        pool_t = jnp.concatenate(
            [done_tokens,
             jnp.zeros((b, 2 * k, max_new_tokens), jnp.int32)
             .at[:, :, 0].set(eos)],
            axis=1)
        done_scores, di = jax.lax.top_k(pool_s, k)
        done_tokens = jnp.take_along_axis(pool_t, di[:, :, None], axis=1)
        frozen = _beam_row_done(done_scores, jnp.max(s2k, axis=1), 1.0,
                                p, early_stopping, max_new_tokens)
        s2k = jnp.where(is_eos, NEG_INF, s2k)
    return done_scores, done_tokens, frozen, s2k, tok2k


def _beam_pool_update(step, out, s2k, tok2k, beam2k, done_scores, done_tokens,
                      frozen, k, eos, p, early_stopping, max_new_tokens):
    """Per-step HF BeamSearchScorer.process + is_done, vectorized over rows.
    generated_len = step + 1 (HF: cur_len + 1 - decoder_prompt_len); EOS
    candidates finalize only when ranked within the top num_beams; is_done
    compares against the best RAW candidate (including EOS ones). Returns
    (s2k with EOS masked for live selection, pool scores/tokens, frozen).
    The single source of truth for both _generate_beam and
    _generate_beam_paged."""
    b = s2k.shape[0]
    k2 = 2 * k
    is_eos = tok2k == eos
    rank_ok = jnp.arange(k2)[None, :] < k
    gen_len = step + 1.0
    cand_norm = jnp.where(is_eos & rank_ok & ~frozen[:, None],
                          s2k / (gen_len ** p), NEG_INF)
    cand_tok = jnp.take_along_axis(out, beam2k[:, :, None], axis=1)
    cand_tok = jax.lax.dynamic_update_slice(
        cand_tok, jnp.full((b, k2, 1), eos, jnp.int32), (0, 0, step))
    pool_s = jnp.concatenate([done_scores, cand_norm], axis=1)
    pool_t = jnp.concatenate([done_tokens, cand_tok], axis=1)
    done_scores, di = jax.lax.top_k(pool_s, k)
    done_tokens = jnp.take_along_axis(pool_t, di[:, :, None], axis=1)
    frozen = frozen | _beam_row_done(
        done_scores, jnp.max(s2k, axis=1), gen_len, p, early_stopping,
        max_new_tokens)
    s2k = jnp.where(is_eos, NEG_INF, s2k)
    return s2k, done_scores, done_tokens, frozen


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "min_new_tokens", "eos_token_id", "num_beams",
        "backend", "dtype", "kv_quant", "length_penalty", "early_stopping",
        "num_return_sequences",
    ),
)
def _generate_beam(
    params,
    tokens,           # [B, T]
    mask,
    cfg,
    max_new_tokens,
    min_new_tokens,
    eos_token_id,
    num_beams,
    backend,
    dtype,
    kv_quant=False,
    length_penalty=1.0,
    early_stopping=False,
    num_return_sequences=1,
):
    """Beam search with HF BeamSearchScorer semantics (the reference runs
    plain HF generate, examples/benchmark/generation_speed.py): 2k candidates
    per step, EOS-hitting candidates move to a per-row done-hypothesis pool
    normalized by ``(cur_len ** length_penalty)``, non-EOS candidates
    continue as the k live beams; rows freeze once the pool is full and
    (early_stopping, or the best attainable raw score can no longer beat the
    worst kept hypothesis). Returns [B, num_return_sequences, max_new]."""
    b, t = tokens.shape
    k = num_beams
    bk = b * k
    total = t + max_new_tokens
    vocab = cfg.vocab_size
    p = float(length_penalty)
    eos = eos_token_id

    # Prefill ONCE per batch row, then broadcast the cache/logits to the k
    # beams (beams are identical until step 0 decides) — a k-fold saving in
    # prefill FLOPs and weight/KV traffic for long prompts.
    cache_b = KVCache.create(cfg, b, total, dtype=dtype, quantized=kv_quant)
    validity_b = jnp.zeros((b, total), jnp.int32).at[:, :t].set(mask)
    positions_b = jnp.maximum(jnp.cumsum(mask, axis=-1) - 1, 0)
    logits, cache_b = arch.forward(
        params, tokens, cfg, cache=cache_b, positions=positions_b,
        backend=backend, attn_mask=validity_b, dtype=dtype, fresh_prefill=True,
        logits_last_only=True,   # left-padded: last position is the newest
    )

    def _rep_beams(a):
        return None if a is None else jnp.repeat(a, k, axis=1)

    cache = KVCache(
        k=_rep_beams(cache_b.k), v=_rep_beams(cache_b.v),
        length=cache_b.length,
        k_scale=_rep_beams(cache_b.k_scale),
        v_scale=_rep_beams(cache_b.v_scale),
    )
    validity = jnp.repeat(validity_b, k, axis=0)
    positions = jnp.repeat(positions_b, k, axis=0)
    logprobs_b = jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32))

    def mask_eos(lp, step):
        if eos is not None and min_new_tokens > 0:
            return jnp.where(
                (step < min_new_tokens)
                & (jnp.arange(vocab)[None, :] == eos),
                NEG_INF,
                lp,
            )
        return lp

    lp0 = mask_eos(logprobs_b, 0)                                   # [B, V]

    # done-hypothesis pool (HF BeamHypotheses, vectorized): step 0 takes
    # 2k candidates; top-num_beams-ranked EOS ones enter the pool, the best
    # k non-EOS become the live beams (shared helper = HF semantics)
    done_scores0, done_tokens0, frozen0, s2k0, tok2k0 = _beam_pool_seed(
        lp0, k, eos, p, early_stopping, max_new_tokens)
    beam_scores0, sel0 = jax.lax.top_k(s2k0, k)                     # [B, k]
    top_tok = jnp.take_along_axis(tok2k0, sel0, axis=1)

    out0 = jnp.zeros((b, k, max_new_tokens), jnp.int32)
    out0 = out0.at[:, :, 0].set(top_tok)
    cur_tok0 = top_tok.reshape(bk)
    next_pos = positions[:, -1] + 1

    def step_fn(state, step):
        (cache, validity, cur_tok, cur_pos, scores, out,
         done_scores, done_tokens, frozen) = state
        validity = jax.lax.dynamic_update_slice(
            validity, jnp.ones((bk, 1), jnp.int32), (0, cache.length)
        )
        logits, cache = arch.forward(
            params, cur_tok[:, None], cfg, cache=cache,
            positions=cur_pos[:, None], backend=backend, attn_mask=validity, dtype=dtype,
            mask_contig=True,   # beam rows are gathered left-pad runs
        )
        lp = jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32))
        lp = mask_eos(lp, step).reshape(b, k, vocab)

        cand = scores[:, :, None] + lp                              # [B, k, V]
        k2 = 2 * k                                                  # HF: 2k cands
        s2k, flat_idx = _flat_top2k(cand)                           # [B, 2k]
        beam2k = flat_idx // vocab
        tok2k = (flat_idx % vocab).astype(jnp.int32)

        if eos is not None:
            s2k, done_scores, done_tokens, frozen = _beam_pool_update(
                step, out, s2k, tok2k, beam2k, done_scores, done_tokens,
                frozen, k, eos, p, early_stopping, max_new_tokens)

        new_scores, sel = jax.lax.top_k(s2k, k)                     # [B, k]
        beam_idx = jnp.take_along_axis(beam2k, sel, axis=1)
        tok_idx = jnp.take_along_axis(tok2k, sel, axis=1)

        gather = (jnp.arange(b)[:, None] * k + beam_idx).reshape(bk)
        # Physically reordering the KV cache costs ~2 x cache-size of HBM
        # traffic per step — skip it when every beam keeps its own parent
        # (the common steady state after the beams de-correlate).
        identity = jnp.all(gather == jnp.arange(bk))

        def _reorder(c):
            return KVCache(
                k=c.k[:, gather], v=c.v[:, gather], length=c.length,
                k_scale=None if c.k_scale is None else c.k_scale[:, gather],
                v_scale=None if c.v_scale is None else c.v_scale[:, gather],
            )

        cache = jax.lax.cond(identity, lambda c: c, _reorder, cache)
        validity = validity[gather]
        cur_pos = cur_pos[gather]
        out = jnp.take_along_axis(out, beam_idx[:, :, None], axis=1)
        out = jax.lax.dynamic_update_slice(
            out, tok_idx[:, :, None], (0, 0, step)
        )
        return (cache, validity, tok_idx.reshape(bk), cur_pos + 1, new_scores,
                out, done_scores, done_tokens, frozen), None

    state = (cache, validity, cur_tok0, next_pos, beam_scores0, out0,
             done_scores0, done_tokens0, frozen0)
    state, _ = jax.lax.scan(step_fn, state, jnp.arange(1, max_new_tokens))
    scores, out = state[4], state[5]
    done_scores, done_tokens, frozen = state[6], state[7], state[8]

    # HF finalize: every row that did NOT stop early (is_done/frozen) adds
    # its live beams to the pool, normalized at the final length (add()
    # replaces worse kept hypotheses even when the pool is full).
    # HF finalize passes generated_len = final length - prompt = max_new
    final_norm = scores / (float(max_new_tokens) ** p)
    live_norm = jnp.where(frozen[:, None], NEG_INF, final_norm)
    pool_s = jnp.concatenate([done_scores, live_norm], axis=1)
    pool_t = jnp.concatenate([done_tokens, out], axis=1)
    top_s, ti = jax.lax.top_k(pool_s, num_return_sequences)
    return jnp.take_along_axis(pool_t, ti[:, :, None], axis=1)  # [B, R, M]


BEAM_PAGED = "auto"   # "auto" | "always" | "never" (tests force paths)


def _beam_paged_ok(model) -> bool:
    """Gather-free (paged) beam cache fast path: supported for the standard
    rope/GQA pre-norm decoder families with unfused q/k/v projections."""
    if BEAM_PAGED == "never":
        return False
    from ..serving_paged import paged_cfg_ok

    cfg = model.cfg
    layer0 = model.params["layers"][0]
    return (
        paged_cfg_ok(cfg)
        and "q_proj" in layer0.get("attn", {})
        and not any("adaption" in b.get("attn", {}) for b in model.params["layers"])
    )


@_maybe_jit(
    static_argnames=(
        "cfg", "max_new_tokens", "min_new_tokens", "eos_token_id",
        "num_beams", "backend", "dtype", "kv_quant", "length_penalty",
        "early_stopping", "num_return_sequences", "page_size", "use_kernel",
        "phased",
    ),
)
def _generate_beam_paged(
    params,
    tokens,           # [B, T]
    mask,
    cfg,
    max_new_tokens,
    min_new_tokens,
    eos_token_id,
    num_beams,
    backend,
    dtype,
    kv_quant=False,
    length_penalty=1.0,
    early_stopping=False,
    num_return_sequences=1,
    page_size=16,
    use_kernel=False,
    phased=True,
):
    """Beam search with a GATHER-FREE KV cache: HF BeamSearchScorer
    semantics identical to :func:`_generate_beam`, but instead of physically
    reordering the whole preallocated cache every step (~2x cache size of
    HBM traffic), beams index a shared page pool through per-beam page
    tables. Reorder = gather the [bk, W] int32 tables + copy ONE page per
    beam (the current partial page, copy-on-share); completed pages are
    append-only and shared between sibling beams. Attention runs the stock
    Pallas paged-attention kernel on TPU (the vLLM-PagedAttention analog)
    and an exact jnp page gather elsewhere, reading only ceil(len/page)
    pages — length-proportional instead of preallocated-length traffic.

    Page pool layout (physical ids are static functions of (row, beam)):
      page 0                   reserved null page
      1 + r*PPS + i            prompt page i of batch row r (shared by its
                               k beams; prompt KV is compacted to [0, p_r))
      G0 + (r*k+j)*GMAX + c    generated page c of beam (r, j) — each beam
                               only ever WRITES its own pages, so sibling
                               beams sharing history never conflict.

    Pools are PAGE-MAJOR ([L, P, Hkv, ps, D]) and attention runs the
    multi-head-per-DMA kernel (ops/pallas/paged_attn.py): one 128 KB
    contiguous DMA per page instead of the stock kernel's 4 KB per
    (page, head) copy.
    """
    from ..ops.pallas.paged_attn import (
        paged_attention_mh,
        paged_attention_mh_ref,
        write_token_pages as _write_pages,
        write_token_pages_kernel as _write_kernel_pages,
    )

    b, t = tokens.shape
    k = num_beams
    bk = b * k
    total = t + max_new_tokens
    vocab = cfg.vocab_size
    p = float(length_penalty)
    eos = eos_token_id
    ps = page_size
    h, hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    scale = cfg.attn_scale if cfg.attn_scale is not None else d ** -0.5

    pps = _cdiv(t, ps)                      # prompt pages per row (generated
                                            # tokens live in per-beam OWN
                                            # pages from ordinal c0 on)
    gmax = _cdiv(max_new_tokens, ps) + 1    # own (write) pages per beam
    g0 = 1 + b * pps
    n_pages = g0 + bk * gmax
    width = _cdiv(pps + gmax, 8) * 8        # table width (rounded for tiling)
    cache_dtype = jnp.int8 if kv_quant else dtype

    # ---- prefill once per row through the ordinary contiguous path ----
    cache_b = KVCache.create(cfg, b, t, dtype=dtype)
    validity_b = mask
    positions_b = jnp.maximum(jnp.cumsum(mask, axis=-1) - 1, 0)
    logits, cache_b = arch.forward(
        params, tokens, cfg, cache=cache_b, positions=positions_b,
        backend=backend, attn_mask=validity_b, dtype=dtype, fresh_prefill=True,
        logits_last_only=True,   # left-padded: last position is the newest
    )
    plen = jnp.sum(mask, axis=-1).astype(jnp.int32)                 # [B]

    # Prompts are LEFT-padded; the paged kernel masks a CONTIGUOUS [0, len)
    # prefix, so compact each row's valid KV to slots [0, p_r).
    tpad = pps * ps
    shift = (t - plen)[:, None]                                     # [B, 1]
    src = jnp.clip(shift + jnp.arange(tpad)[None, :], 0, t - 1)     # [B, tpad]

    def _to_pages(a):                       # [L, B, t, Hkv, D] -> pool block
        g = jnp.take_along_axis(a, src[None, :, :, None, None], axis=2)
        L = a.shape[0]
        g = g.reshape(L, b, pps, ps, hkv, d).transpose(0, 1, 2, 4, 3, 5)
        return g.reshape(L, b * pps, hkv, ps, d)    # page-major

    def _quant(x):                          # per-(slot, head) int8, D-wise
        s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        s = jnp.maximum(s, 1e-8)
        q = jnp.rint(x.astype(jnp.float32) * (127.5 / s))
        return jnp.clip(q, -127, 127).astype(jnp.int8), s

    L = cfg.num_layers
    k_pool = jnp.zeros((L, n_pages, hkv, ps, d), cache_dtype)
    v_pool = jnp.zeros((L, n_pages, hkv, ps, d), cache_dtype)
    # Scale pools are 4-D [L, P, hkv, ps] (no trailing 1): the attention
    # kernel's scale blocks are [hkv, ps], and squeezing a 5-D pool per
    # layer per step relayouts the whole pool
    ks_pool = jnp.ones((L, n_pages, hkv, ps), jnp.float32) if kv_quant else None
    vs_pool = jnp.ones((L, n_pages, hkv, ps), jnp.float32) if kv_quant else None
    if kv_quant:
        kq, ksc = _quant(_to_pages(cache_b.k))
        vq, vsc = _quant(_to_pages(cache_b.v))
        k_pool = k_pool.at[:, 1:g0].set(kq)
        v_pool = v_pool.at[:, 1:g0].set(vq)
        ks_pool = ks_pool.at[:, 1:g0].set(ksc[..., 0])
        vs_pool = vs_pool.at[:, 1:g0].set(vsc[..., 0])
    else:
        k_pool = k_pool.at[:, 1:g0].set(_to_pages(cache_b.k).astype(cache_dtype))
        v_pool = v_pool.at[:, 1:g0].set(_to_pages(cache_b.v).astype(cache_dtype))

    # ---- per-beam page tables ----
    rows_bk = jnp.arange(bk) // k                                   # [bk]
    plen_bk = plen[rows_bk]                                         # [bk]
    c0 = plen_bk // ps                 # ordinal of the first written page
    ar = jnp.arange(width)[None, :]                                 # [1, W]
    own = g0 + jnp.arange(bk)[:, None] * gmax + (ar - c0[:, None])  # [bk, W]
    own_ok = (ar >= c0[:, None]) & (ar - c0[:, None] < gmax)
    prompt_pg = 1 + rows_bk[:, None] * pps + ar
    tables0 = jnp.where(
        own_ok, own,
        jnp.where(ar < pps, prompt_pg, 0),
    ).astype(jnp.int32)
    # copy-on-share of the boundary page: generation continues inside the
    # prompt's last (partial) page, which each beam must own before writing
    # page-aligned prompts (plen % ps == 0) have an EMPTY boundary page:
    # c0 == pps would index the next row's pages, so clamp — the copied
    # content is fully masked/overwritten in that case
    bsrc = jnp.clip(1 + rows_bk * pps + jnp.minimum(c0, pps - 1),
                    0, n_pages - 1)
    bdst = g0 + jnp.arange(bk) * gmax

    from ..ops.pallas.paged_attn import copy_pages as _copy_pages
    from ..ops.pallas.paged_attn import copy_pages_pair as _copy_pages_pair

    def _copy_kv(kp, vp, src, dst):
        """Page copy-on-share for the two big K/V pools: the aliased Pallas
        pair on TPU (a dus-chain copy defeats in-place carry assignment —
        XLA restores the scan carry with FULL-POOL copies, ~3.5 ms/step at
        256-token beam-4 pools), dus chains elsewhere. The width-1 scale
        pools stay on the dus path (1-lane Pallas blocks are a known
        Mosaic hazard; the pools are 1/64th the size)."""
        if use_kernel:
            return _copy_pages_pair(kp, vp, src, dst,
                                    interpret=use_kernel == "interpret")
        return _copy_pages(kp, src, dst), _copy_pages(vp, src, dst)

    k_pool, v_pool = _copy_kv(k_pool, v_pool, bsrc, bdst)
    if kv_quant:
        ks_pool = _copy_pages(ks_pool, bsrc, bdst)
        vs_pool = _copy_pages(vs_pool, bsrc, bdst)

    # ---- step-0 beam bookkeeping (identical to _generate_beam) ----
    logprobs_b = jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32))

    def mask_eos(lp, step):
        if eos is not None and min_new_tokens > 0:
            return jnp.where(
                (step < min_new_tokens)
                & (jnp.arange(vocab)[None, :] == eos),
                NEG_INF,
                lp,
            )
        return lp

    lp0 = mask_eos(logprobs_b, 0)
    done_scores0, done_tokens0, frozen0, s2k0, tok2k0 = _beam_pool_seed(
        lp0, k, eos, p, early_stopping, max_new_tokens)
    beam_scores0, sel0 = jax.lax.top_k(s2k0, k)
    top_tok = jnp.take_along_axis(tok2k0, sel0, axis=1)
    out0 = jnp.zeros((b, k, max_new_tokens), jnp.int32)
    out0 = out0.at[:, :, 0].set(top_tok)
    cur_tok0 = top_tok.reshape(bk)

    def _attend(q, kp, vp, ksp, vsp, lengths, tables, layer):
        # kp/vp/ksp/vsp are the FULL stacked [L, P, ...] pools; the kernel
        # bakes ``layer`` into its index_map so no per-layer [P, ...] slice
        # is materialized (0.85 ms/step across 32 layers x 2 pools at
        # 256-token beam pools). The jnp reference path slices — it exists
        # for CPU exactness tests where the copies are irrelevant.
        # Scale blocks must stay >=3-D: a (1, N) block over a 2-D (P, N)
        # pool is unliftable on real TPU hardware.
        if use_kernel:  # True on TPU; "interpret" runs the REAL kernel on CPU
            return paged_attention_mh(
                q, kp, vp, lengths, tables, ksp, vsp, sm_scale=float(scale),
                interpret=use_kernel == "interpret", layer=layer,
            )
        ks = None if ksp is None else ksp[layer]
        vs = None if vsp is None else vsp[layer]
        return paged_attention_mh_ref(
            q, kp[layer], vp[layer], lengths, tables, ks, vs,
            sm_scale=float(scale))

    def _fwd_step(pools, tables, cur_tok, pos, wb):
        """One decode token per beam over the paged pools; writes the token's
        K/V into each beam's current (owned) page, then attends over the
        first ``wb`` (static) table entries — the live page window."""
        k_pool, v_pool, ks_pool, vs_pool = pools
        att_tables = tables[:, :wb]
        x = arch.embed(params, cur_tok[:, None], pos[:, None], cfg, dtype)
        rows = jnp.arange(bk)
        page_of = tables[rows, pos // ps]
        off = pos % ps
        # Fused norm+matmul (FUSE_NORM): same gating idea as block_forward —
        # this inline loop is already restricted to the standard pre-norm
        # rope decoder (_beam_paged_ok), so only the norm type matters.
        fuse_norm = arch.FUSE_NORM != "0" and cfg.norm_type == "rmsnorm"
        if fuse_norm:
            _pn = lambda node, inp, np_: arch._prenorm_linear(
                node, inp, np_, cfg, backend)
        else:
            _pn = lambda node, inp, np_: arch.apply_linear(
                node, arch.apply_norm(np_, inp, cfg), backend)
        for idx, bp in enumerate(params["layers"]):
            ap = bp["attn"]
            inorm = bp["input_norm"]
            q = _pn(ap["q_proj"], x, inorm).reshape(bk, 1, h, d)
            kk = _pn(ap["k_proj"], x, inorm).reshape(bk, 1, hkv, d)
            vv = _pn(ap["v_proj"], x, inorm).reshape(bk, 1, hkv, d)
            q, kk = arch.apply_rope(q, kk, pos[:, None], cfg)
            if cfg.logn_attn_seq_len is not None:
                ln = jnp.maximum(
                    jnp.log(pos.astype(jnp.float32) + 1.0)
                    / math.log(float(cfg.logn_attn_seq_len)), 1.0)
                q = (q.astype(jnp.float32) * ln[:, None, None, None]).astype(x.dtype)
            if kv_quant:
                # int8 pools stay on the dus chain (the measured-best int8
                # config; the Pallas write on int8/width-1 blocks faulted
                # the TPU worker — Mosaic 1-lane blocks are a known hazard)
                kq, ksc = _quant(kk[:, 0])
                vq, vsc = _quant(vv[:, 0])
                k_pool = _write_pages(k_pool, idx, page_of, off, kq)
                v_pool = _write_pages(v_pool, idx, page_of, off, vq)
                ks_pool = _write_pages(ks_pool, idx, page_of, off, ksc)
                vs_pool = _write_pages(vs_pool, idx, page_of, off, vsc)
                of = _attend(q[:, 0], k_pool, v_pool,
                             ks_pool, vs_pool, pos + 1, att_tables, idx)
            else:
                if use_kernel:  # aliased Pallas write: keeps the pools'
                    # default layout (any XLA write lowering gives them a
                    # layout preference that fights the attention
                    # custom-call — two full-pool copies per step)
                    k_pool, v_pool = _write_kernel_pages(
                        k_pool, v_pool, idx, page_of, off, kk[:, 0], vv[:, 0],
                        interpret=use_kernel == "interpret")
                else:
                    k_pool = _write_pages(k_pool, idx, page_of, off, kk[:, 0])
                    v_pool = _write_pages(v_pool, idx, page_of, off, vv[:, 0])
                of = _attend(q[:, 0], k_pool, v_pool,
                             None, None, pos + 1, att_tables, idx)
            of = of.reshape(bk, 1, h * d).astype(x.dtype)
            x = x + arch.apply_linear(ap["o_proj"], of, backend)
            if fuse_norm:
                x = x + arch.mlp(bp["mlp"], x, cfg, backend,
                                 prenorm=bp["post_norm"])
            else:
                h2 = arch.apply_norm(bp["post_norm"], x, cfg)
                x = x + arch.mlp(bp["mlp"], h2, cfg, backend)
        logits = arch.unembed(params, x, cfg)[:, -1, :]
        return (k_pool, v_pool, ks_pool, vs_pool), logits

    def step_fn(state, step, wb=width):
        (k_pool, v_pool, ks_pool, vs_pool, tables, cur_tok, scores, out,
         done_scores, done_tokens, frozen) = state
        pos = plen_bk + step - 1            # slot of the incoming token
        pools, logits = _fwd_step(
            (k_pool, v_pool, ks_pool, vs_pool), tables, cur_tok, pos, wb)
        k_pool, v_pool, ks_pool, vs_pool = pools
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        lp = mask_eos(lp, step).reshape(b, k, vocab)

        cand = scores[:, :, None] + lp
        k2 = 2 * k
        s2k, flat_idx = _flat_top2k(cand)
        beam2k = flat_idx // vocab
        tok2k = (flat_idx % vocab).astype(jnp.int32)

        if eos is not None:
            s2k, done_scores, done_tokens, frozen = _beam_pool_update(
                step, out, s2k, tok2k, beam2k, done_scores, done_tokens,
                frozen, k, eos, p, early_stopping, max_new_tokens)

        new_scores, sel = jax.lax.top_k(s2k, k)
        beam_idx = jnp.take_along_axis(beam2k, sel, axis=1)
        tok_idx = jnp.take_along_axis(tok2k, sel, axis=1)
        gather = (jnp.arange(b)[:, None] * k + beam_idx).reshape(bk)

        # Gather-free reorder: shuffle the page TABLES (tiny), copy-on-share
        # the ONE partial page the next token lands in (parent's content ->
        # this beam's own page), then re-own every ordinal from the next
        # write position on (fresh pages, nothing to move).
        tables = tables[gather]             # parent's view of history
        next_pos = pos + 1                  # uniform per row across beams
        nc_vec = next_pos // ps             # next write ordinal [bk]
        psrc = tables[jnp.arange(bk), nc_vec]             # parent's page
        pdst = bdst + (nc_vec - c0)                       # own page, same ord
        k_pool, v_pool = _copy_kv(k_pool, v_pool, psrc, pdst)
        if kv_quant:
            ks_pool = _copy_pages(ks_pool, psrc, pdst)
            vs_pool = _copy_pages(vs_pool, psrc, pdst)
        own_from = (ar >= nc_vec[:, None]) & own_ok
        tables = jnp.where(own_from, own, tables).astype(jnp.int32)

        out = jnp.take_along_axis(out, beam_idx[:, :, None], axis=1)
        out = jax.lax.dynamic_update_slice(
            out, tok_idx[:, :, None], (0, 0, step)
        )
        return (k_pool, v_pool, ks_pool, vs_pool, tables,
                tok_idx.reshape(bk), new_scores, out,
                done_scores, done_tokens, frozen), None

    state = (k_pool, v_pool, ks_pool, vs_pool, tables0, cur_tok0,
             beam_scores0, out0, done_scores0, done_tokens0, frozen0)
    page_phases = (
        _page_phases(t, max_new_tokens, width, ps)
        if phased else [(1, max_new_tokens, width)]
    )
    for s0, s1, wb in page_phases:
        if s1 <= s0:
            continue
        state, _ = jax.lax.scan(
            functools.partial(step_fn, wb=wb), state, jnp.arange(s0, s1))
    scores, out = state[6], state[7]
    done_scores, done_tokens, frozen = state[8], state[9], state[10]

    # HF finalize passes generated_len = final length - prompt = max_new
    final_norm = scores / (float(max_new_tokens) ** p)
    live_norm = jnp.where(frozen[:, None], NEG_INF, final_norm)
    pool_s = jnp.concatenate([done_scores, live_norm], axis=1)
    pool_t = jnp.concatenate([done_tokens, out], axis=1)
    top_s, ti = jax.lax.top_k(pool_s, num_return_sequences)
    return jnp.take_along_axis(pool_t, ti[:, :, None], axis=1)  # [B, R, M]


def _tp_generate(model, ids, mask, max_new_tokens, min_new_tokens,
                 eos_token_id, temperature, num_beams, seed, kv_quant,
                 length_penalty=1.0, early_stopping=False,
                 num_return_sequences=1, pad_token_id=0, phased=True):
    """Sharded generate: the WHOLE generate loop (prefill + decode scan) runs
    under shard_map on the model's mesh — every device executes the fused
    quantized matmuls on its local weight shard, the KV cache lives sharded
    (heads on "tp", created inside the body with local head counts), and
    sampling is replicated, so the tokens match single-device generate
    exactly. See parallel/tp.py:TPModel."""
    key = (num_beams, max_new_tokens, min_new_tokens, eos_token_id,
           float(temperature or 0.0), kv_quant, float(length_penalty),
           early_stopping, num_return_sequences, pad_token_id,
           bool(phased))
    run = model._gen_cache.get(key)
    if run is None:
        lcfg = model.lcfg
        if num_beams > 1:
            def core(p, ids_, mask_):
                return _generate_beam(
                    p, ids_, mask_, lcfg, max_new_tokens, min_new_tokens,
                    eos_token_id, num_beams, model.backend, model.dtype,
                    kv_quant=kv_quant, length_penalty=float(length_penalty),
                    early_stopping=early_stopping,   # True | False | "never"
                    num_return_sequences=num_return_sequences,
                )
            run = jax.jit(model.shard_generate(core, n_batch_args=2))
        else:
            def core(p, ids_, mask_, rng):
                return _generate_greedy(
                    p, ids_, mask_, lcfg, max_new_tokens, min_new_tokens,
                    eos_token_id, float(temperature or 0.0), model.backend,
                    model.dtype, rng, kv_quant=kv_quant,
                    pad_token_id=pad_token_id, phased=phased,
                )
            run = jax.jit(model.shard_generate(core, n_batch_args=2, n_repl_args=1))
        model._gen_cache[key] = run
    if num_beams > 1:
        return run(model.params, jnp.asarray(ids), jnp.asarray(mask))
    return run(model.params, jnp.asarray(ids), jnp.asarray(mask),
               jax.random.PRNGKey(seed))


def generate(
    model,
    input_ids,
    max_new_tokens: int = 128,
    temperature: float = 0.0,
    num_beams: int = 1,
    eos_token_id: Optional[int] = None,
    min_new_tokens: int = 0,
    seed: int = 0,
    pad_token_id: int = 0,
    kv_quant: bool = False,
    length_penalty: float = 1.0,
    early_stopping: bool = False,
    num_return_sequences: int = 1,
    phased: bool = True,
) -> np.ndarray:
    """HF-generate-protocol decoding. With ``num_return_sequences`` R > 1,
    returns [B*R, T+new] HF-style: the top R beams under beam search, or R
    independent samples per input row under temperature sampling.
    ``phased=False`` disables the growing-attention-window decode (A/B and
    numerics-debug knob; see :func:`_window_phases`)."""
    if num_beams > 1:
        if num_return_sequences > num_beams:
            raise ValueError("num_return_sequences must be <= num_beams")
        if temperature and temperature > 0.0:
            raise NotImplementedError(
                "beam-sample (num_beams > 1 with temperature > 0) is not "
                "supported; use beam search (temperature=0) or sampling "
                "(num_beams=1)"
            )
        if early_stopping not in (True, False, "never"):
            raise ValueError(
                "early_stopping must be True, False, or 'never' "
                f"(got {early_stopping!r})"
            )
    elif num_return_sequences > 1 and not temperature:
        # HF raises the same way: greedy without beams is deterministic, so
        # R > 1 would just duplicate rows.
        raise ValueError(
            "num_return_sequences > 1 requires sampling (temperature > 0) "
            "or beam search (num_beams > 1)"
        )
    ids, mask = _prep_inputs(input_ids, pad_token_id)
    if num_beams == 1 and num_return_sequences > 1:
        # Sampling expansion: tile each row R times; jax.random.categorical
        # draws independently per batch row, so the copies are independent
        # samples. Row order matches HF (all R samples of input 0 first).
        ids = np.repeat(ids, num_return_sequences, axis=0)
        mask = np.repeat(mask, num_return_sequences, axis=0)
        num_return_sequences = 1
    if getattr(model, "is_tp", False):
        new = _tp_generate(
            model, ids, mask, max_new_tokens, min_new_tokens, eos_token_id,
            temperature, num_beams, seed, kv_quant,
            length_penalty, early_stopping, num_return_sequences,
            pad_token_id, phased=phased,
        )
    elif num_beams > 1:
        paged = BEAM_PAGED == "always" or (
            BEAM_PAGED == "auto" and _beam_paged_ok(model)
        )
        beam_fn = _generate_beam_paged if paged else _generate_beam
        extra = (
            {"use_kernel": jax.default_backend() == "tpu", "phased": phased}
            if paged else {}
        )
        new = beam_fn(
            model.params,
            jnp.asarray(ids),
            jnp.asarray(mask),
            model.cfg,
            max_new_tokens,
            min_new_tokens,
            eos_token_id,
            num_beams,
            model.backend,
            model.dtype,
            kv_quant=kv_quant,
            length_penalty=float(length_penalty),
            early_stopping=early_stopping,   # True | False | "never"
            num_return_sequences=num_return_sequences,
            **extra,
        )
    else:
        new = _generate_greedy(
            model.params,
            jnp.asarray(ids),
            jnp.asarray(mask),
            model.cfg,
            max_new_tokens,
            min_new_tokens,
            eos_token_id,
            temperature if temperature else 0.0,
            model.backend,
            model.dtype,
            jax.random.PRNGKey(seed),
            kv_quant=kv_quant,
            pad_token_id=pad_token_id,
            phased=phased,
        )
    new = np.array(new)
    if num_beams > 1:
        # _generate_beam returns [B, R, M]; flatten HF-style to [B*R, M]
        b, r, m = new.shape
        ids = np.repeat(ids, r, axis=0)
        new = new.reshape(b * r, m)
        if eos_token_id is not None:
            # HF finalize pads positions AFTER a hypothesis' EOS with
            # pad_token_id (the done pool stores zeros there)
            hit = new == eos_token_id
            after = np.cumsum(hit, axis=1) - hit.astype(np.int64) > 0
            new[after] = pad_token_id
    return np.concatenate([ids, new], axis=1)


__all__ = ["generate"]
