"""Sequence classification by generation + closest-label vote.

Reference: eval_tasks/sequence_classification_task.py:13-60 — generate a few
tokens, map the text to the nearest label via Levenshtein distance, report
accuracy."""

from __future__ import annotations

import numpy as np

from ._base import BaseTask, closest_label, decode_generated


class SequenceClassificationTask(BaseTask):
    def __init__(
        self, model, tokenizer, data, classes, prompt_col="prompt", label_col="label",
        max_new_tokens: int = 8, **kw,
    ):
        super().__init__(model, tokenizer, data, **kw)
        self.classes = list(classes)
        self.prompt_col = prompt_col
        self.label_col = label_col
        self.max_new_tokens = max_new_tokens

    def _predict(self, batch):
        prompts = [self.tokenizer(s[self.prompt_col])["input_ids"] for s in batch]
        out = self.model.generate(
            prompts, max_new_tokens=self.max_new_tokens,
            eos_token_id=self.tokenizer.eos_token_id,
        )
        width = out.shape[1] - self.max_new_tokens
        eos = self.tokenizer.eos_token_id
        texts = [decode_generated(self.tokenizer, row[width:], eos) for row in out]
        return [closest_label(t, self.classes) for t in texts]

    def _reference(self, sample):
        lab = sample[self.label_col]
        return self.classes[lab] if isinstance(lab, int) else lab

    def _metric(self, predictions, references):
        acc = float(np.mean([p == r for p, r in zip(predictions, references)]))
        return {"acc": acc, "num_samples": len(predictions)}
