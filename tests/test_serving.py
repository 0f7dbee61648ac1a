"""Continuous batching engine: outputs must equal sequential greedy
generation; slots must be reused across requests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.serving import ContinuousBatchEngine, Request  # noqa: E402


class Shim:
    def __init__(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location("ge4", "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        self.params, self.cfg = mod._tiny_quantized_llama(hidden=128, inter=256, layers=2, group_size=32)
        self.backend = "xla"
        self.dtype = jnp.float32


def sequential_greedy(model, prompt, n):
    from autogptq_tpu.utils import generation

    out = generation.generate(model, prompt[None], max_new_tokens=n)
    return out[0, len(prompt):]


def test_continuous_matches_sequential(rng):
    model = Shim()
    engine = ContinuousBatchEngine(model, max_slots=2, max_seq_len=128)

    prompts = [
        rng.integers(0, model.cfg.vocab_size, size=(p,)).astype(np.int32)
        for p in (5, 9, 17)
    ]
    reqs = [Request(req_id=i, prompt=p, max_new_tokens=6) for i, p in enumerate(prompts)]
    results = engine.run(reqs)
    assert set(results) == {0, 1, 2}

    for i, p in enumerate(prompts):
        expected = sequential_greedy(model, p, 6)
        np.testing.assert_array_equal(results[i], expected)


def test_slot_reuse_and_eos(rng):
    model = Shim()
    engine = ContinuousBatchEngine(model, max_slots=1, max_seq_len=64)
    p1 = rng.integers(0, 256, size=(4,)).astype(np.int32)
    p2 = rng.integers(0, 256, size=(6,)).astype(np.int32)
    results = engine.run([
        Request(0, p1, max_new_tokens=4),
        Request(1, p2, max_new_tokens=3),
    ])
    assert len(results[0]) == 4 and len(results[1]) == 3
    np.testing.assert_array_equal(results[0], sequential_greedy(model, p1, 4))
    np.testing.assert_array_equal(results[1], sequential_greedy(model, p2, 3))
