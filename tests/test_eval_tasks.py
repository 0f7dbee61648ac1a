"""Eval-task framework tests with a tiny model and a stub tokenizer."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.eval_tasks import (  # noqa: E402
    LanguageModelingTask,
    SequenceClassificationTask,
    TextSummarizationTask,
)
from autogptq_tpu.eval_tasks._base import closest_label, levenshtein  # noqa: E402
from autogptq_tpu.eval_tasks.text_summarization_task import rouge_l, rouge_n  # noqa: E402


class StubTokenizer:
    eos_token_id = 0
    bos_token_id = 1
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=True, **kw):
        if isinstance(text, list):
            return {"input_ids": [self(t)["input_ids"] for t in text]}
        ids = [(ord(c) % 250) + 2 for c in text][:32]
        return {"input_ids": ids}

    def decode(self, ids, **kw):
        return "".join(chr(int(i) + 40) for i in ids if i > 1)


class StubModel:
    """Deterministic fake LM over vocab 256."""

    def __init__(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location("ge3", "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        self.params, self.cfg = mod._tiny_quantized_llama(hidden=128, inter=256, layers=1, group_size=32)
        self.backend = "xla"
        self.dtype = jnp.float32

    def forward(self, ids, attn_mask=None):
        from autogptq_tpu.models import arch

        logits, _ = arch.forward(
            self.params, jnp.asarray(ids), self.cfg, backend="xla", dtype=jnp.float32
        )
        return logits

    def generate(self, prompts, **kw):
        from autogptq_tpu.utils import generation

        return generation.generate(self, prompts, max_new_tokens=kw.get("max_new_tokens", 4))


def test_levenshtein_and_closest():
    assert levenshtein("kitten", "sitting") == 3
    assert closest_label("positve", ["positive", "negative"]) == "positive"


def test_rouge():
    assert rouge_n("the cat sat", "the cat sat", 1) == 1.0
    assert rouge_l("a b c d", "a x c d") > 0.5
    assert rouge_n("", "ref words", 1) == 0.0


def test_language_modeling_task():
    t = LanguageModelingTask(
        StubModel(), StubTokenizer(),
        [{"prompt": "hello wor", "label": "ld"}, {"prompt": "abc", "label": "def"}],
        batch_size=2,
    )
    m = t.run()
    assert np.isfinite(m["ppl"]) and m["ppl"] > 0


def test_sequence_classification_task():
    t = SequenceClassificationTask(
        StubModel(), StubTokenizer(),
        [{"prompt": "x", "label": 0}, {"prompt": "y", "label": 1}],
        classes=["yes", "no"],
        max_new_tokens=2,
    )
    m = t.run()
    assert 0.0 <= m["acc"] <= 1.0 and m["num_samples"] == 2


def test_summarization_task():
    t = TextSummarizationTask(
        StubModel(), StubTokenizer(),
        [{"prompt": "long document text", "summary": "short"}],
        max_new_tokens=3,
    )
    m = t.run()
    assert set(m) == {"rouge-1", "rouge-2", "rouge-L"}
