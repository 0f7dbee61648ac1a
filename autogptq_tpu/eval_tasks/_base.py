"""Downstream evaluation task framework.

Reference counterpart: eval_tasks/_base.py:11-65 (BaseTask.run = batched
inference + task metric). Data comes in as already-loaded lists of dicts
(air-gapped: no Hub datasets); each task implements _predict + _metric.
"""

from __future__ import annotations

import abc
from typing import Any, Iterable, Sequence

import numpy as np


class BaseTask(abc.ABC):
    def __init__(self, model, tokenizer, data: Sequence[dict], batch_size: int = 4, **kwargs):
        self.model = model
        self.tokenizer = tokenizer
        self.data = list(data)
        self.batch_size = batch_size

    def _batches(self) -> Iterable[list[dict]]:
        for i in range(0, len(self.data), self.batch_size):
            yield self.data[i : i + self.batch_size]

    @abc.abstractmethod
    def _predict(self, batch: list[dict]) -> list[Any]:
        ...

    @abc.abstractmethod
    def _metric(self, predictions: list[Any], references: list[Any]) -> dict:
        ...

    @abc.abstractmethod
    def _reference(self, sample: dict) -> Any:
        ...

    def run(self) -> dict:
        preds, refs = [], []
        for batch in self._batches():
            preds.extend(self._predict(batch))
            refs.extend(self._reference(s) for s in batch)
        return self._metric(preds, refs)


def decode_generated(tokenizer, row, eos_token_id=None) -> str:
    """Decode generated tokens, trimming at the first EOS. generate() fills
    post-EOS positions with pad_token_id (HF protocol), which for tokenizers
    whose id 0 is a real token (e.g. GPT-2's "!") would otherwise leak junk
    into the decoded text."""
    toks = [int(t) for t in row]
    if eos_token_id is not None and eos_token_id in toks:
        toks = toks[: toks.index(eos_token_id)]
    return tokenizer.decode(toks, skip_special_tokens=True)


def levenshtein(a: str, b: str) -> int:
    """Edit distance (reference: eval_tasks/_utils/classification_utils.py)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def closest_label(pred: str, labels: Sequence[str]) -> str:
    """Map generated text to the nearest classification label by edit
    distance (the reference's Levenshtein vote)."""
    return min(labels, key=lambda l: levenshtein(pred.strip().lower(), l.strip().lower()))


__all__ = ["BaseTask", "decode_generated", "levenshtein", "closest_label"]
