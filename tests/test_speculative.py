"""Speculative decoding: greedy verification makes the output EXACTLY the
target model's own greedy stream, for any draft model — that equality is
the whole test surface (plus the all-accepted fast path when draft ==
target)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.utils import generation  # noqa: E402
from autogptq_tpu.utils.speculative import generate_speculative  # noqa: E402


class Shim:
    def __init__(self, params, cfg):
        self.params, self.cfg = params, cfg
        self.backend, self.dtype = "xla", jnp.float32


def _tiny(seed=0, layers=2, hidden=128, **kw):
    import importlib.util

    spec = importlib.util.spec_from_file_location("ge_spec", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._tiny_quantized_llama(
        hidden=hidden, inter=2 * hidden, layers=layers, group_size=32,
        seed=seed, **kw)


@pytest.fixture(scope="module")
def target():
    return Shim(*_tiny(seed=0))


@pytest.mark.parametrize("gamma", [1, 3, 5])
def test_draft_equals_target_all_accepted(target, gamma, rng):
    """draft == target: every draft accepted, output == plain greedy."""
    prompt = rng.integers(0, target.cfg.vocab_size, size=(6,)).astype(np.int32)
    ref = generation.generate(target, prompt[None], max_new_tokens=12)
    got = generate_speculative(target, target, prompt[None],
                               max_new_tokens=12, gamma=gamma)
    np.testing.assert_array_equal(got, ref)


def test_different_draft_still_exact(target, rng):
    """A DIFFERENT (weaker) draft model must not change the output stream —
    greedy verification guarantees target-greedy tokens regardless of
    draft quality."""
    draft = Shim(*_tiny(seed=7, layers=1, hidden=128))
    prompt = rng.integers(0, target.cfg.vocab_size, size=(5,)).astype(np.int32)
    ref = generation.generate(target, prompt[None], max_new_tokens=10)
    got = generate_speculative(target, draft, prompt[None],
                               max_new_tokens=10, gamma=4)
    np.testing.assert_array_equal(got, ref)


def test_eos_padding_matches_generate(target, rng):
    prompt = rng.integers(0, target.cfg.vocab_size, size=(5,)).astype(np.int32)
    base = generation.generate(target, prompt[None], max_new_tokens=8)
    eos = int(base[0, len(prompt) + 2])  # token greedy emits at step 2
    ref = generation.generate(target, prompt[None], max_new_tokens=8,
                              eos_token_id=eos)
    got = generate_speculative(target, target, prompt[None],
                               max_new_tokens=8, gamma=3, eos_token_id=eos)
    np.testing.assert_array_equal(got, ref)


def test_vocab_mismatch_rejected(target):
    bad = Shim(*_tiny(seed=1, vocab=128))
    with pytest.raises(ValueError, match="vocabulary"):
        generate_speculative(target, bad, np.zeros((1, 4), np.int32))
