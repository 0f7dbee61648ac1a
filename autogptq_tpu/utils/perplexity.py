"""llama.cpp-compatible sliding-window perplexity harness.

Protocol mirrors the reference (/root/reference/auto_gptq/utils/
perplexity_utils.py:96-200): the corpus is tokenized as one stream, split
into ``n_ctx`` chunks; the first token of each chunk is replaced by BOS; NLL
is accumulated over positions ``[min(512, n_ctx // 2), n_ctx - 1)`` of each
chunk (the second half, where the model has enough context).

Air-gapped design: takes raw text (or pre-tokenized ids) instead of pulling
datasets from the Hub; the wikitext-2 recipe lives in examples/.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def prepare_text(rows: Sequence[str]) -> str:
    """Format dataset rows the way the reference does (perplexity_utils.py:75)."""
    return "".join(" \n" if s == "" else s for s in rows)


class Perplexity:
    def __init__(
        self,
        model,                       # GPTQModel (or anything with .forward)
        tokenizer=None,
        text: Optional[str] = None,
        tokens: Optional[np.ndarray] = None,
        bos_token_id: Optional[int] = None,
    ):
        self._model = model
        self._tokenizer = tokenizer
        if tokens is None:
            if tokenizer is None or text is None:
                raise ValueError("provide either `tokens` or (`tokenizer` and `text`)")
            tokenizer.model_max_length = int(1e12)
            tokens = np.asarray(
                tokenizer(text, truncation=False, return_tensors="np").input_ids[0]
            )
        self._tokens = np.asarray(tokens).reshape(-1).astype(np.int32)
        if bos_token_id is None and tokenizer is not None:
            bos_token_id = tokenizer.bos_token_id
        self._bos = bos_token_id if bos_token_id is not None else int(self._tokens[0])
        self._logprob_fn = None
        self._seg_fn = None

    def _chunk_logprobs(self, chunk: np.ndarray, targets: np.ndarray) -> np.ndarray:
        """log P(target_{j+1} | chunk_{<=j}) for all j, one jit per chunk len."""
        if self._logprob_fn is None:
            model = self._model

            @jax.jit
            def fn(params, tokens, targets):
                from ..models import arch

                logits, _ = arch.forward(
                    params, tokens[None], model.cfg, backend=model.backend,
                    dtype=model.dtype,
                )
                lp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
                return jnp.take_along_axis(lp[:-1], targets[:, None], axis=-1)[:, 0]

            self._logprob_fn = fn
        return np.asarray(
            self._logprob_fn(self._model.params, jnp.asarray(chunk), jnp.asarray(targets))
        )

    def _chunk_logprobs_batched(
        self, chunk: np.ndarray, targets: np.ndarray, n_ctx: int, n_batch: int
    ) -> np.ndarray:
        """Same result as :meth:`_chunk_logprobs`, but the chunk is evaluated
        in ``n_batch``-token segments threading a KV cache — bounding
        activation memory per dispatch (the reference's n_batch semantics)."""
        from ..models import arch as _arch

        if self._seg_fn is None:
            model = self._model

            @jax.jit
            def fn(params, seg, tgt, cache):
                logits, cache = _arch.forward(
                    params, seg[None], model.cfg, cache=cache,
                    backend=model.backend, dtype=model.dtype,
                )
                lp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
                g = jnp.take_along_axis(
                    lp[: tgt.shape[0]], tgt[:, None], axis=-1
                )[:, 0]
                return g, cache

            self._seg_fn = fn
        from ..models.arch import KVCache

        cache = KVCache.create(self._model.cfg, 1, n_ctx, dtype=self._model.dtype)
        out = []
        for s in range(0, n_ctx, n_batch):
            seg = chunk[s : s + n_batch]
            # position j predicts chunk[j+1]; the final position of the last
            # segment has no target (targets has n_ctx - 1 entries)
            tgt = targets[s : min(s + len(seg), n_ctx - 1)]
            g, cache = self._seg_fn(
                self._model.params, jnp.asarray(seg), jnp.asarray(tgt), cache
            )
            out.append(np.asarray(g))
        return np.concatenate(out)

    def calculate_perplexity(self, n_ctx: int = 512, n_batch: int = 512) -> list[float]:
        tokens = self._tokens
        n_chunks = len(tokens) // n_ctx
        if n_chunks == 0:
            raise ValueError(f"need at least {n_ctx} tokens, got {len(tokens)}")

        nll, count = 0.0, 0
        all_ppl = []
        start_j = min(512, n_ctx // 2)
        for i in range(n_chunks):
            start = i * n_ctx
            chunk = tokens[start : start + n_ctx].copy()
            chunk[0] = self._bos
            targets = tokens[start + 1 : start + n_ctx]
            if n_batch < n_ctx:
                logprobs = self._chunk_logprobs_batched(chunk, targets, n_ctx, n_batch)
            else:
                logprobs = self._chunk_logprobs(chunk, targets)  # [n_ctx - 1]
            # NLL over the second half of the window (reference :188-199)
            sel = logprobs[start_j : n_ctx - 1]
            nll += float(-np.sum(sel))
            count += sel.shape[0]
            all_ppl.append(float(np.exp(nll / count)))
        return all_ppl


__all__ = ["Perplexity", "prepare_text"]
