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


# ---------------------------------------------------------------------------
# HF generate() parity: length_penalty / early_stopping / num_return_sequences
# (the reference benchmark runs plain HF generate; BeamSearchScorer is the
# semantics bar). Same tiny fp checkpoint driven through torch HF generate
# and through our beam decode; tokens must match exactly.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hf_pair(tmp_path_factory):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from autogptq_tpu import AutoGPTQForCausalLM
    from tests.test_models import save_tiny_llama

    d = tmp_path_factory.mktemp("beamfp")
    hf = save_tiny_llama(d).float().eval()
    # align: our loader reads the f16-rounded checkpoint
    with torch.no_grad():
        for p in hf.parameters():
            p.data = p.data.half().float()
    ours = AutoGPTQForCausalLM.from_pretrained(str(d), dtype=jnp.float32)
    return hf, ours


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(num_beams=3, length_penalty=1.0, early_stopping=False),
        dict(num_beams=3, length_penalty=2.0, early_stopping=False),
        dict(num_beams=4, length_penalty=0.5, early_stopping=True),
        dict(num_beams=4, length_penalty=1.0, early_stopping=False,
             num_return_sequences=3),
        # finalize corner: small beam count, long horizon, penalty favoring
        # pooled-early hypotheses — exercises the frozen-vs-pool-full gate
        dict(num_beams=2, length_penalty=1.5, early_stopping=False),
        dict(num_beams=2, length_penalty=0.0, early_stopping=True),
    ],
)
def test_beam_matches_hf_generate(hf_pair, rng, kwargs):
    torch = pytest.importorskip("torch")
    hf, ours = hf_pair
    n = 8
    prompt = rng.integers(2, 250, size=(1, 6)).astype(np.int64)
    eos = 1

    with torch.no_grad():
        ref = hf.generate(
            torch.from_numpy(prompt),
            max_new_tokens=n, min_new_tokens=2, eos_token_id=eos,
            pad_token_id=0, do_sample=False, **kwargs,
        ).numpy()
    got = ours.generate(
        prompt.astype(np.int32), max_new_tokens=n, min_new_tokens=2,
        eos_token_id=eos, **kwargs,
    )
    assert got.shape[0] == ref.shape[0]
    for i in range(ref.shape[0]):
        r = ref[i, prompt.shape[1]:]
        g = got[i, prompt.shape[1]:]
        # HF pads after EOS; compare up to and including the EOS
        rl = list(r)
        end = rl.index(eos) + 1 if eos in rl else len(rl)
        np.testing.assert_array_equal(g[:end], r[:end])


def test_sampling_num_return_sequences(hf_pair, rng):
    """num_beams==1 + temperature>0 + R>1 returns R independent samples per
    input row (HF sampling expansion), shape [B*R, T+new]."""
    _, ours = hf_pair
    prompt = rng.integers(2, 250, size=(2, 5)).astype(np.int32)
    out = ours.generate(
        prompt, max_new_tokens=6, temperature=1.0,
        num_return_sequences=3, seed=0,
    )
    assert out.shape == (6, 11)
    # prompt rows are repeated consecutively (HF ordering)
    np.testing.assert_array_equal(out[0, :5], prompt[0])
    np.testing.assert_array_equal(out[2, :5], prompt[0])
    np.testing.assert_array_equal(out[3, :5], prompt[1])
    # the samples for one input are not all identical
    gens = out[:3, 5:]
    assert not (np.array_equal(gens[0], gens[1]) and np.array_equal(gens[1], gens[2]))


def test_greedy_num_return_sequences_rejected(hf_pair):
    _, ours = hf_pair
    with pytest.raises(ValueError, match="num_return_sequences"):
        ours.generate(np.ones((1, 4), np.int32), max_new_tokens=3,
                      num_return_sequences=2)


@pytest.fixture(scope="module")
def hf_pair_eosy(tmp_path_factory):
    """Tiny checkpoint with the EOS logit BIASED UP so EOS hypotheses enter
    the 2k candidates and the done pool genuinely competes with live beams
    — the regime where generated-length normalization, the
    top-num_beams EOS rank gate, and step-0 freezing actually matter
    (random checkpoints almost never exercise them)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from autogptq_tpu import AutoGPTQForCausalLM
    from tests.test_models import save_tiny_llama

    d = tmp_path_factory.mktemp("beameos")
    hf = save_tiny_llama(d).float().eval()
    with torch.no_grad():
        for p in hf.parameters():
            p.data = p.data.half().float()
        hf.lm_head.weight.data[1] += 0.35        # bias token 1 (eos) up
        hf.lm_head.weight.data = hf.lm_head.weight.data.half().float()
    hf.save_pretrained(str(d), safe_serialization=True)
    ours = AutoGPTQForCausalLM.from_pretrained(str(d), dtype=jnp.float32)
    return hf, ours


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(num_beams=3, length_penalty=2.0, early_stopping=False),
        dict(num_beams=3, length_penalty=1.0, early_stopping=True),
        dict(num_beams=2, length_penalty=-0.5, early_stopping=False),
        dict(num_beams=3, length_penalty=2.0, early_stopping="never"),
        dict(num_beams=4, length_penalty=0.0, early_stopping="never",
             num_return_sequences=2),
        dict(num_beams=2, length_penalty=1.5, early_stopping=True),
    ],
)
@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("path", ["paged", "contiguous"])
def test_beam_eos_pool_matches_hf_generate(hf_pair_eosy, kwargs, seed, path,
                                           monkeypatch):
    """Token-exact vs HF generate INCLUDING the post-EOS padding, on a
    checkpoint where EOS hypotheses actually reach the candidate set —
    through BOTH beam implementations."""
    torch = pytest.importorskip("torch")
    monkeypatch.setattr(generation, "BEAM_PAGED",
                        "always" if path == "paged" else "never")
    hf, ours = hf_pair_eosy
    rng = np.random.default_rng(seed)
    n = 8
    prompt = rng.integers(2, 250, size=(1, 6)).astype(np.int64)
    eos = 1

    with torch.no_grad():
        ref = hf.generate(
            torch.from_numpy(prompt),
            max_new_tokens=n, min_new_tokens=1, eos_token_id=eos,
            pad_token_id=0, do_sample=False, **kwargs,
        ).numpy()
    got = ours.generate(
        prompt.astype(np.int32), max_new_tokens=n, min_new_tokens=1,
        eos_token_id=eos, pad_token_id=0, **kwargs,
    )
    assert got.shape[0] == ref.shape[0]
    for i in range(ref.shape[0]):
        r = ref[i, prompt.shape[1]:]
        g = got[i, prompt.shape[1]:][: len(r)]
        np.testing.assert_array_equal(g[: len(r)], r, err_msg=f"row {i}")


def test_beam_rejects_bad_early_stopping_and_beam_sample(hf_pair_eosy, rng):
    _, ours = hf_pair_eosy
    prompt = rng.integers(2, 250, size=(1, 5)).astype(np.int32)
    with pytest.raises(ValueError, match="early_stopping"):
        ours.generate(prompt, max_new_tokens=4, num_beams=2,
                      early_stopping="sometimes")
    with pytest.raises(NotImplementedError, match="beam-sample"):
        ours.generate(prompt, max_new_tokens=4, num_beams=2, temperature=0.7)
