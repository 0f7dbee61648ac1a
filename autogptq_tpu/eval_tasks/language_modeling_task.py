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

    def _predict(self, batch):
        out = []
        for s in batch:
            p_ids = self.tokenizer(s[self.prompt_col])["input_ids"]
            l_ids = self.tokenizer(s[self.label_col], add_special_tokens=False)["input_ids"]
            ids = np.asarray(p_ids + l_ids, np.int32)[None]
            logits = np.asarray(self.model.forward(ids))[0]
            lp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
            lp = np.asarray(lp)
            # NLL of the label tokens
            start = len(p_ids)
            tgt = ids[0, start:]
            sel = lp[np.arange(start - 1, start - 1 + len(l_ids)), tgt]
            out.append(float(-np.mean(sel)))
        return out

    def _reference(self, sample):
        return 0.0

    def _metric(self, predictions, references):
        mean_nll = float(np.mean(predictions))
        return {"mean_nll": mean_nll, "ppl": float(np.exp(mean_nll))}
