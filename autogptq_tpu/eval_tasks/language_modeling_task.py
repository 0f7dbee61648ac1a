"""Language-modeling eval: perplexity over prompt/label pairs.

Reference: eval_tasks/language_modeling_task.py:31-41 (mean NLL -> PPL over
the label tokens only)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ._base import BaseTask


class LanguageModelingTask(BaseTask):
    def __init__(self, model, tokenizer, data, prompt_col="prompt", label_col="label", **kw):
        super().__init__(model, tokenizer, data, **kw)
        self.prompt_col = prompt_col
        self.label_col = label_col

    @staticmethod
    def _bucket(n: int) -> int:
        b = 16
        while b < n:
            b *= 2
        return b

    def _predict(self, batch):
        # Left-pad each sample to a power-of-2 bucket so XLA compiles once
        # per bucket instead of once per distinct sequence length (first
        # compiles cost 1-2 min each on the tunneled TPU).
        pad_id = self.tokenizer.pad_token_id
        if pad_id is None:
            pad_id = self.tokenizer.eos_token_id or 0
        out = []
        for s in batch:
            p_ids = self.tokenizer(s[self.prompt_col])["input_ids"]
            l_ids = self.tokenizer(s[self.label_col], add_special_tokens=False)["input_ids"]
            toks = p_ids + l_ids
            width = self._bucket(len(toks))
            pad = width - len(toks)
            ids = np.full((1, width), pad_id, np.int32)
            mask = np.zeros((1, width), np.int32)
            ids[0, pad:] = toks
            mask[0, pad:] = 1
            logits = np.asarray(self.model.forward(ids, attn_mask=mask))[0]
            lp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
            lp = np.asarray(lp)
            # NLL of the label tokens (positions shifted by the left pad)
            start = pad + len(p_ids)
            tgt = np.asarray(toks[len(p_ids):])
            sel = lp[np.arange(start - 1, start - 1 + len(l_ids)), tgt]
            out.append(float(-np.mean(sel)))
        return out

    def _reference(self, sample):
        return 0.0

    def _metric(self, predictions, references):
        mean_nll = float(np.mean(predictions))
        return {"mean_nll": mean_nll, "ppl": float(np.exp(mean_nll))}
