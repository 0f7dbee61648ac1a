"""Text summarization eval with self-contained ROUGE-1/2/L.

Reference: eval_tasks/text_summarization_task.py (uses the `rouge` package;
here ROUGE is implemented locally to stay dependency-free/air-gapped)."""

from __future__ import annotations

from collections import Counter

import numpy as np

from ._base import BaseTask, decode_generated


def _ngrams(tokens, n):
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def rouge_n(pred: str, ref: str, n: int = 1) -> float:
    p, r = pred.lower().split(), ref.lower().split()
    if len(r) < n or len(p) < n:
        return 0.0
    pc, rc = _ngrams(p, n), _ngrams(r, n)
    overlap = sum((pc & rc).values())
    denom = sum(rc.values())
    return overlap / denom if denom else 0.0


def rouge_l(pred: str, ref: str) -> float:
    p, r = pred.lower().split(), ref.lower().split()
    if not p or not r:
        return 0.0
    # LCS length, O(len(p)*len(r))
    prev = [0] * (len(r) + 1)
    for a in p:
        cur = [0]
        for j, b in enumerate(r, 1):
            cur.append(prev[j - 1] + 1 if a == b else max(prev[j], cur[-1]))
        prev = cur
    lcs = prev[-1]
    prec = lcs / len(p)
    rec = lcs / len(r)
    return 0.0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)


class TextSummarizationTask(BaseTask):
    def __init__(
        self, model, tokenizer, data, prompt_col="prompt", label_col="summary",
        max_new_tokens: int = 64, **kw,
    ):
        super().__init__(model, tokenizer, data, **kw)
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
        return [decode_generated(self.tokenizer, row[width:], eos) for row in out]

    def _reference(self, sample):
        return sample[self.label_col]

    def _metric(self, predictions, references):
        r1 = float(np.mean([rouge_n(p, r, 1) for p, r in zip(predictions, references)]))
        r2 = float(np.mean([rouge_n(p, r, 2) for p, r in zip(predictions, references)]))
        rl = float(np.mean([rouge_l(p, r) for p, r in zip(predictions, references)]))
        return {"rouge-1": r1, "rouge-2": r2, "rouge-L": rl}
