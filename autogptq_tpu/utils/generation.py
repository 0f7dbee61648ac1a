"""Jit-compiled autoregressive generation: greedy / temperature sampling /
beam search, with a preallocated KV cache.

Protocol matches the reference benchmark (examples/benchmark/
generation_speed.py:23-75): ``min_new_tokens`` suppresses EOS until the
minimum is produced (their MinNewTokensLengthLogitsProcessor), tokens/s is
counted over generated tokens only.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import arch
from ..models.arch import KVCache

NEG_INF = -1e30


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


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "min_new_tokens", "eos_token_id", "temperature", "backend", "dtype", "kv_quant",
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
        )
        key, sub = jax.random.split(key)
        nxt = sample(logits[:, -1, :], step, sub).astype(jnp.int32)
        if eos_token_id is not None:
            nxt = jnp.where(finished, eos_token_id, nxt)
            finished = finished | (nxt == eos_token_id)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, step))
        return (cache, validity, nxt, cur_pos + 1, finished, out, key), None

    state = (cache, validity, first_tok, next_pos, finished0, out_tokens0, rng_key)
    state, _ = jax.lax.scan(step_fn, state, jnp.arange(1, max_new_tokens))
    return state[5]


def _gather_beams(tree, idx):
    """Gather along the leading (flattened batch*beam) axis."""
    return jax.tree_util.tree_map(lambda x: x[idx] if x.ndim >= 1 else x, tree)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "min_new_tokens", "eos_token_id", "num_beams", "backend", "dtype", "kv_quant",
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
):
    """Standard length-normalization-free beam search (HF default alpha=0)."""
    b, t = tokens.shape
    k = num_beams
    bk = b * k
    total = t + max_new_tokens
    vocab = cfg.vocab_size

    # Expand inputs to beams.
    tokens_e = jnp.repeat(tokens, k, axis=0)
    mask_e = jnp.repeat(mask, k, axis=0)

    cache = KVCache.create(cfg, bk, total, dtype=dtype, quantized=kv_quant)
    validity = jnp.zeros((bk, total), jnp.int32).at[:, :t].set(mask_e)
    positions = jnp.maximum(jnp.cumsum(mask_e, axis=-1) - 1, 0)
    logits, cache = arch.forward(
        params, tokens_e, cfg, cache=cache, positions=positions,
        backend=backend, attn_mask=validity, dtype=dtype, fresh_prefill=True,
    )
    logprobs_full = jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32))

    def mask_eos(lp, step):
        if eos_token_id is not None and min_new_tokens > 0:
            return jnp.where(
                (step < min_new_tokens)
                & (jnp.arange(vocab)[None, :] == eos_token_id),
                NEG_INF,
                lp,
            )
        return lp

    lp0 = mask_eos(logprobs_full, 0).reshape(b, k, vocab)[:, 0, :]  # beams identical
    top_lp, top_tok = jax.lax.top_k(lp0, k)                         # [B, k]

    beam_scores0 = top_lp                                           # [B, k]
    out0 = jnp.zeros((b, k, max_new_tokens), jnp.int32)
    out0 = out0.at[:, :, 0].set(top_tok)
    cur_tok0 = top_tok.reshape(bk)
    next_pos = positions[:, -1] + 1
    finished0 = (
        (cur_tok0.reshape(b, k) == eos_token_id) if eos_token_id is not None
        else jnp.zeros((b, k), bool)
    )

    def step_fn(state, step):
        cache, validity, cur_tok, cur_pos, scores, finished, out = state
        validity = jax.lax.dynamic_update_slice(
            validity, jnp.ones((bk, 1), jnp.int32), (0, cache.length)
        )
        logits, cache = arch.forward(
            params, cur_tok[:, None], cfg, cache=cache,
            positions=cur_pos[:, None], backend=backend, attn_mask=validity, dtype=dtype,
        )
        lp = jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32))
        lp = mask_eos(lp, step).reshape(b, k, vocab)

        # Finished beams only propose EOS at score 0 delta.
        if eos_token_id is not None:
            frozen = jnp.full((vocab,), NEG_INF).at[eos_token_id].set(0.0)
            lp = jnp.where(finished[:, :, None], frozen[None, None, :], lp)

        cand = scores[:, :, None] + lp                              # [B, k, V]
        flat = cand.reshape(b, k * vocab)
        new_scores, flat_idx = jax.lax.top_k(flat, k)               # [B, k]
        beam_idx = flat_idx // vocab                                # [B, k]
        tok_idx = (flat_idx % vocab).astype(jnp.int32)

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
        finished = jnp.take_along_axis(finished, beam_idx, axis=1)
        if eos_token_id is not None:
            finished = finished | (tok_idx == eos_token_id)
        return (cache, validity, tok_idx.reshape(bk), cur_pos + 1, new_scores, finished, out), None

    state = (cache, validity, cur_tok0, next_pos, beam_scores0, finished0, out0)
    state, _ = jax.lax.scan(step_fn, state, jnp.arange(1, max_new_tokens))
    out, scores = state[6], state[4]
    best = jnp.argmax(scores, axis=1)
    return jnp.take_along_axis(out, best[:, None, None], axis=1)[:, 0, :]


def _tp_generate(model, ids, mask, max_new_tokens, min_new_tokens,
                 eos_token_id, temperature, num_beams, seed, kv_quant):
    """Sharded generate: the WHOLE generate loop (prefill + decode scan) runs
    under shard_map on the model's mesh — every device executes the fused
    quantized matmuls on its local weight shard, the KV cache lives sharded
    (heads on "tp", created inside the body with local head counts), and
    sampling is replicated, so the tokens match single-device generate
    exactly. See parallel/tp.py:TPModel."""
    key = (num_beams, max_new_tokens, min_new_tokens, eos_token_id,
           float(temperature or 0.0), kv_quant)
    run = model._gen_cache.get(key)
    if run is None:
        lcfg = model.lcfg
        if num_beams > 1:
            def core(p, ids_, mask_):
                return _generate_beam(
                    p, ids_, mask_, lcfg, max_new_tokens, min_new_tokens,
                    eos_token_id, num_beams, model.backend, model.dtype,
                    kv_quant=kv_quant,
                )
            run = jax.jit(model.shard_generate(core, n_batch_args=2))
        else:
            def core(p, ids_, mask_, rng):
                return _generate_greedy(
                    p, ids_, mask_, lcfg, max_new_tokens, min_new_tokens,
                    eos_token_id, float(temperature or 0.0), model.backend,
                    model.dtype, rng, kv_quant=kv_quant,
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
) -> np.ndarray:
    ids, mask = _prep_inputs(input_ids, pad_token_id)
    if getattr(model, "is_tp", False):
        new = _tp_generate(
            model, ids, mask, max_new_tokens, min_new_tokens, eos_token_id,
            temperature, num_beams, seed, kv_quant,
        )
    elif num_beams > 1:
        new = _generate_beam(
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
        )
    return np.concatenate([ids, np.asarray(new)], axis=1)


__all__ = ["generate"]
