"""Draft-model speculative decoding (greedy verification).

Net-new vs the reference (SURVEY §2.3 scope: production serving): a small
draft model proposes ``gamma`` tokens per iteration; ONE target forward over
the gamma+1-token window verifies them. With greedy decoding the emitted
stream is EXACTLY the target model's own greedy output (the acceptance rule
keeps the longest prefix where the draft matches the target argmax and then
emits the target's correction/bonus token), so speedup costs zero quality.

TPU-native structure: everything is one jitted ``lax.while_loop`` whose body
does static-shape work (a gamma-step ``lax.scan`` of draft decodes + one
gamma+1-token cached target forward — the chunked-prefill machinery).
Variable acceptance is handled with WRITE CURSORS, not dynamic shapes: the
out buffer is written at the cursor every iteration and stale tail entries
are overwritten by the next iteration; both KV caches "rewind" by setting
their length cursor (entries past it are causally masked and later
overwritten in place).

Batch 1 (speculative decoding is a latency feature; batched throughput uses
the continuous-batching engine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import arch
from ..models.arch import KVCache


@functools.partial(
    jax.jit,
    static_argnames=("tcfg", "dcfg", "gamma", "max_new_tokens",
                     "t_backend", "d_backend", "t_dtype", "d_dtype"),
)
def _spec_generate(
    t_params, d_params, tokens,               # [1, T]
    tcfg, dcfg, gamma, max_new_tokens,
    t_backend, d_backend, t_dtype, d_dtype,
):
    b, t = tokens.shape
    g1 = gamma + 1
    total = t + max_new_tokens + g1          # headroom for the last window
    t_cache = KVCache.create(tcfg, b, total, dtype=t_dtype)
    d_cache = KVCache.create(dcfg, b, total, dtype=d_dtype)
    positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))

    t_logits, t_cache = arch.forward(
        t_params, tokens, tcfg, cache=t_cache, positions=positions,
        backend=t_backend, dtype=t_dtype, fresh_prefill=True,
    )
    _, d_cache = arch.forward(
        d_params, tokens, dcfg, cache=d_cache, positions=positions,
        backend=d_backend, dtype=d_dtype, fresh_prefill=True,
    )
    cur0 = jnp.argmax(t_logits[:, -1, :], axis=-1).astype(jnp.int32)  # [1]

    out0 = jnp.zeros((max_new_tokens + g1,), jnp.int32)
    out0 = out0.at[0].set(cur0[0])

    def set_len(cache, n):
        return KVCache(k=cache.k, v=cache.v, length=n,
                       k_scale=cache.k_scale, v_scale=cache.v_scale)

    # state: (t_cache, d_cache, cur [1], pos scalar, out, produced)
    def cond(s):
        return s[5] < max_new_tokens

    def body(s):
        t_cache, d_cache, cur, pos, out, produced = s

        # --- draft gamma tokens greedily --------------------------------
        # gamma+1 steps: the last one's OUTPUT token is discarded (the
        # target provides the bonus/correction), but its forward writes
        # d_gamma's K/V — on full acceptance the draft history advances to
        # pos+gamma+1, and without this step that row would be stale.
        def d_step(carry, _):
            dc, tok, p = carry
            lg, dc = arch.forward(
                d_params, tok[:, None], dcfg, cache=dc,
                positions=p[None, None], backend=d_backend, dtype=d_dtype,
            )
            nxt = jnp.argmax(lg[:, -1, :], axis=-1).astype(jnp.int32)
            return (dc, nxt, p + 1), nxt

        (d_cache, _, _), drafts = jax.lax.scan(
            d_step, (d_cache, cur, pos), None, length=gamma + 1
        )
        drafts = drafts[:gamma, 0]                             # [gamma]

        # --- one target forward over [cur, d_1..d_gamma] ----------------
        window = jnp.concatenate([cur, drafts])[None, :]       # [1, g1]
        wpos = pos + jnp.arange(g1, dtype=jnp.int32)[None, :]
        lg, t_cache = arch.forward(
            t_params, window, tcfg, cache=t_cache, positions=wpos,
            backend=t_backend, dtype=t_dtype,
        )
        t_next = jnp.argmax(lg[0], axis=-1).astype(jnp.int32)  # [g1]

        # accept the longest draft prefix matching the target argmax, then
        # emit the target's own next token (correction or bonus)
        match = drafts == t_next[:gamma]
        n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))
        emitted = n_acc + 1                                    # tokens out

        # out[produced : produced+g1] <- t_next (tail past `emitted` is
        # stale and gets overwritten next iteration)
        out = jax.lax.dynamic_update_slice(out, t_next, (produced,))

        # rewind both caches to the accepted history
        new_len = pos + emitted
        t_cache = set_len(t_cache, new_len)
        d_cache = set_len(d_cache, new_len)

        cur = t_next[n_acc][None]
        return (t_cache, d_cache, cur, pos + emitted, out, produced + emitted)

    state = (t_cache, d_cache, cur0, jnp.int32(t), out0, jnp.int32(1))
    state = jax.lax.while_loop(cond, body, state)
    return state[4][:max_new_tokens]


def generate_speculative(
    model,
    draft_model,
    input_ids,
    max_new_tokens: int = 128,
    gamma: int = 4,
    eos_token_id=None,
    pad_token_id: int = 0,
) -> np.ndarray:
    """Greedy speculative decoding: returns [1, T + max_new_tokens], token-
    identical to ``generate(model, ..., temperature=0)``."""
    ids = np.asarray(input_ids, np.int32)
    if ids.ndim == 1:
        ids = ids[None]
    if ids.shape[0] != 1:
        raise ValueError("speculative decoding is batch-1 (latency path)")
    if model.cfg.vocab_size != draft_model.cfg.vocab_size:
        raise ValueError("draft and target models must share a vocabulary")

    new = _spec_generate(
        model.params, draft_model.params, jnp.asarray(ids),
        model.cfg, draft_model.cfg, gamma, max_new_tokens,
        model.backend, draft_model.backend, model.dtype, draft_model.dtype,
    )
    new = np.array(new)  # writable copy (np.asarray of a jax array is RO)
    if eos_token_id is not None and eos_token_id in new:
        # HF protocol (and generate()): keep the EOS, pad after it
        idx = int(np.argmax(new == eos_token_id))
        new[idx + 1:] = pad_token_id
    return np.concatenate([ids, new[None]], axis=1)


__all__ = ["generate_speculative"]
