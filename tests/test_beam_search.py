"""Beam search correctness: the cached, scan-based, cond-reordering beam
decode must match a brute-force reference beam search that recomputes the
full forward each step (no cache, no reorder)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.models import arch  # noqa: E402
from autogptq_tpu.utils import generation  # noqa: E402


def _model():
    import importlib.util

    spec = importlib.util.spec_from_file_location("ge_beam", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._tiny_quantized_llama(hidden=128, inter=256, layers=2, group_size=32)


class Shim:
    def __init__(self, params, cfg):
        self.params, self.cfg = params, cfg
        self.backend, self.dtype = "xla", jnp.float32


def brute_force_beam(model, prompt, n, k):
    """HF-default (alpha=0) beam search recomputing the full forward."""
    def lp_next(ids):
        logits, _ = arch.forward(
            model.params, jnp.asarray(ids[None], jnp.int32), model.cfg,
            backend="xla", dtype=jnp.float32)
        return np.asarray(jax.nn.log_softmax(logits[0, -1].astype(jnp.float32)))

    lp = lp_next(prompt)
    order = np.argsort(-lp)[:k]
    beams = [(np.concatenate([prompt, [t]]), lp[t]) for t in order]
    for _ in range(n - 1):
        cands = []
        for seq, score in beams:
            lp = lp_next(seq)
            for t in np.argsort(-lp)[: 2 * k]:   # enough candidates
                cands.append((np.concatenate([seq, [t]]), score + lp[t]))
        cands.sort(key=lambda c: -c[1])
        beams = cands[:k]
    best = max(beams, key=lambda c: c[1])
    return best[0][len(prompt):]


def test_beam_matches_brute_force(rng):
    params, cfg = _model()
    model = Shim(params, cfg)
    prompt = rng.integers(0, cfg.vocab_size, size=(5,)).astype(np.int32)
    got = generation.generate(model, prompt[None], max_new_tokens=5, num_beams=3)[0, 5:]
    ref = brute_force_beam(model, prompt, 5, 3)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_beam_kv_quant_runs(rng):
    params, cfg = _model()
    model = Shim(params, cfg)
    prompt = rng.integers(0, cfg.vocab_size, size=(5,)).astype(np.int32)
    out = generation.generate(model, prompt[None], max_new_tokens=5, num_beams=3, kv_quant=True)
    assert out.shape == (1, 10)
