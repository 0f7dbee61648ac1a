"""Serving engine v2 (VERDICT r1 item 5): chunked prefill interleaved with
decode, per-request sampling (temperature/top-p/top-k/seed), in-graph EOS +
min_new_tokens masking. Reference bar: none (net-new; BASELINE config 5)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.serving import ContinuousBatchEngine, Request  # noqa: E402


class Shim:
    def __init__(self, **kw):
        import importlib.util

        spec = importlib.util.spec_from_file_location("ge_v2", "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        kw.setdefault("hidden", 128)
        kw.setdefault("inter", 256)
        kw.setdefault("layers", 2)
        kw.setdefault("group_size", 32)
        self.params, self.cfg = mod._tiny_quantized_llama(**kw)
        self.backend = "xla"
        self.dtype = jnp.float32


@pytest.fixture(scope="module")
def model():
    return Shim()


def sequential_greedy(model, prompt, n):
    from autogptq_tpu.utils import generation

    out = generation.generate(model, prompt[None], max_new_tokens=n)
    return out[0, len(prompt):]


def test_chunked_prefill_matches_sequential(model, rng):
    """Prompts longer than prefill_chunk go through the cache-continuation
    path (fresh_prefill=False chunks written straight into the slot cache);
    tokens must equal whole-prompt sequential generation exactly."""
    engine = ContinuousBatchEngine(
        model, max_slots=2, max_seq_len=128, prefill_chunk=8,
    )
    prompts = [
        rng.integers(0, model.cfg.vocab_size, size=(p,)).astype(np.int32)
        for p in (21, 5, 13, 30)  # mixed: chunked (21, 13, 30) and bucketed (5)
    ]
    reqs = [Request(req_id=i, prompt=p, max_new_tokens=6) for i, p in enumerate(prompts)]
    results = engine.run(reqs)
    assert set(results) == set(range(len(prompts)))
    for i, p in enumerate(prompts):
        np.testing.assert_array_equal(results[i], sequential_greedy(model, p, 6))


def test_chunked_prefill_interleaves_with_decode(model, rng):
    """A long prompt arriving while another slot decodes must not stall it:
    the decoding slot advances on every engine step (one chunk per step)."""
    engine = ContinuousBatchEngine(
        model, max_slots=2, max_seq_len=128, prefill_chunk=8,
    )
    short = rng.integers(0, model.cfg.vocab_size, size=(4,)).astype(np.int32)
    long = rng.integers(0, model.cfg.vocab_size, size=(40,)).astype(np.int32)

    engine.submit(Request(0, short, max_new_tokens=10))
    engine.step()  # prefill short + 1 decode
    engine.submit(Request(1, long, max_new_tokens=3))

    gen_progress = []
    for _ in range(6):  # long needs 5 chunks of 8; decode must advance anyway
        engine.step()
        gen_progress.append(len(engine.slots[0].generated))
    # slot 0 produced a token on EVERY step even while slot 1 was chunking
    assert gen_progress == sorted(gen_progress)
    assert gen_progress[-1] - gen_progress[0] >= 4

    while engine.queue or any(st.req is not None for st in engine.slots):
        engine.step()
    np.testing.assert_array_equal(
        engine.finished[0], sequential_greedy(model, short, 10))
    np.testing.assert_array_equal(
        engine.finished[1], sequential_greedy(model, long, 3))


def test_sampling_deterministic_per_seed(model, rng):
    prompts = [
        rng.integers(0, model.cfg.vocab_size, size=(p,)).astype(np.int32)
        for p in (5, 9)
    ]

    def run(seed0):
        eng = ContinuousBatchEngine(model, max_slots=2, max_seq_len=64)
        reqs = [
            Request(i, p, max_new_tokens=8, temperature=0.9, top_p=0.95,
                    seed=seed0 + i)
            for i, p in enumerate(prompts)
        ]
        return eng.run(reqs)

    a, b = run(100), run(100)
    for i in a:
        np.testing.assert_array_equal(a[i], b[i])
    c = run(999)
    assert any(not np.array_equal(a[i], c[i]) for i in a), \
        "different seeds produced identical samples for every request"


def test_sampling_reproducible_across_batch_composition(model, rng):
    """A request's sampled stream depends only on (its seed, its token
    index) — not on what else is co-scheduled (keys fold per-slot seed and
    per-token step, not a shared stream)."""
    p = rng.integers(0, model.cfg.vocab_size, size=(6,)).astype(np.int32)
    other = rng.integers(0, model.cfg.vocab_size, size=(11,)).astype(np.int32)
    req = lambda: Request(0, p, max_new_tokens=6, temperature=0.7, seed=42)

    solo = ContinuousBatchEngine(model, max_slots=2, max_seq_len=64).run([req()])
    busy = ContinuousBatchEngine(model, max_slots=2, max_seq_len=64).run(
        [req(), Request(1, other, max_new_tokens=6, temperature=1.3, seed=7)]
    )
    np.testing.assert_array_equal(solo[0], busy[0])


def test_top_k1_matches_greedy(model, rng):
    p = rng.integers(0, model.cfg.vocab_size, size=(7,)).astype(np.int32)
    eng = ContinuousBatchEngine(model, max_slots=1, max_seq_len=64)
    out = eng.run([Request(0, p, max_new_tokens=6, temperature=1.0, top_k=1)])
    np.testing.assert_array_equal(out[0], sequential_greedy(model, p, 6))


def test_min_new_tokens_suppresses_eos(model, rng):
    p = rng.integers(0, model.cfg.vocab_size, size=(5,)).astype(np.int32)
    base = sequential_greedy(model, p, 8)
    eos = int(base[1])  # greedy would emit this at index 1 -> early stop

    eng = ContinuousBatchEngine(model, max_slots=1, max_seq_len=64)
    short = eng.run([Request(0, p, max_new_tokens=8, eos_token_id=eos)])
    assert len(short[0]) == 2 and short[0][-1] == eos

    eng2 = ContinuousBatchEngine(model, max_slots=1, max_seq_len=64)
    long = eng2.run([
        Request(0, p, max_new_tokens=8, eos_token_id=eos, min_new_tokens=5)
    ])
    # EOS masked for the first 5 tokens: it cannot appear there
    assert eos not in list(long[0][:5])
    assert len(long[0]) >= 5


def test_chunked_prefill_nondividing_chunk(model, rng):
    """Regression: when prefill_chunk does not divide the prompt (or
    max_seq_len), the final chunk REALIGNS backward to [p-C, p) instead of
    writing a padded span past p — a padded write start+C > max_seq_len
    would be CLAMPED by dynamic_update_slice, silently shifting the chunk
    over valid earlier cache entries."""
    engine = ContinuousBatchEngine(
        model, max_slots=1, max_seq_len=128, prefill_chunk=48,
    )
    p = rng.integers(0, model.cfg.vocab_size, size=(100,)).astype(np.int32)
    out = engine.run([Request(0, p, max_new_tokens=6)])
    np.testing.assert_array_equal(out[0], sequential_greedy(model, p, 6))


def test_chunked_prefill_kv_quant(model, rng):
    from autogptq_tpu.utils import generation

    engine = ContinuousBatchEngine(
        model, max_slots=2, max_seq_len=128, prefill_chunk=8, kv_quant=True,
    )
    p = rng.integers(0, model.cfg.vocab_size, size=(19,)).astype(np.int32)
    out = engine.run([Request(0, p, max_new_tokens=6)])
    ref = generation.generate(model, p[None], max_new_tokens=6, kv_quant=True)
    np.testing.assert_array_equal(out[0], np.asarray(ref)[0, len(p):])


def test_oversized_request_rejected(model):
    eng = ContinuousBatchEngine(model, max_slots=1, max_seq_len=32)
    with pytest.raises(ValueError, match="exceeds"):
        eng.submit(Request(0, np.arange(20, dtype=np.int32), max_new_tokens=20))


def test_cancel_queued_and_running(model, rng):
    eng = ContinuousBatchEngine(model, max_slots=1, max_seq_len=64)
    p = rng.integers(0, model.cfg.vocab_size, size=(5,)).astype(np.int32)
    eng.submit(Request(0, p, max_new_tokens=30))
    eng.submit(Request(1, p, max_new_tokens=5))   # queued behind req 0
    eng.step()
    eng.step()
    assert eng.cancel(0)                          # running: free the slot
    assert len(eng.finished[0]) >= 1              # partial output recorded
    assert not eng.cancel(99)
    while eng.queue or any(st.req is not None for st in eng.slots):
        eng.step()
    np.testing.assert_array_equal(
        eng.finished[1], sequential_greedy(model, p, 5))


def test_streaming_callback(model, rng):
    streamed = []
    eng = ContinuousBatchEngine(
        model, max_slots=2, max_seq_len=64,
        on_token=lambda rid, tok: streamed.append((rid, tok)),
    )
    p = rng.integers(0, model.cfg.vocab_size, size=(6,)).astype(np.int32)
    out = eng.run([Request(0, p, max_new_tokens=5)])
    got_stream = [t for rid, t in streamed if rid == 0]
    np.testing.assert_array_equal(np.asarray(got_stream, np.int32), out[0])


def test_streaming_stops_at_eos(model, rng):
    """The post-EOS token is excluded from the output, so the stream must
    not contain it either (stream == finished, exactly)."""
    p = rng.integers(0, model.cfg.vocab_size, size=(5,)).astype(np.int32)
    base = sequential_greedy(model, p, 8)
    eos = int(base[2])
    streamed = []
    eng = ContinuousBatchEngine(
        model, max_slots=1, max_seq_len=64,
        on_token=lambda rid, tok: streamed.append(tok),
    )
    out = eng.run([Request(0, p, max_new_tokens=8, eos_token_id=eos)])
    np.testing.assert_array_equal(np.asarray(streamed, np.int32), out[0])


def test_bucket_rounding_rejected_at_submit(model):
    eng = ContinuousBatchEngine(model, max_slots=1, max_seq_len=48,
                                prefill_chunk=None)
    with pytest.raises(ValueError, match="bucket"):
        eng.submit(Request(0, np.arange(40, dtype=np.int32), max_new_tokens=8))
