"""Continuous batching engine: outputs must equal sequential greedy
generation; slots must be reused across requests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.serving import ContinuousBatchEngine, Request  # noqa: E402


class Shim:
    def __init__(self, seed=0):
        import importlib.util

        spec = importlib.util.spec_from_file_location("ge4", "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        self.params, self.cfg = mod._tiny_quantized_llama(
            hidden=128, inter=256, layers=2, group_size=32, seed=seed)
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


def test_continuous_kv_quant_matches_sequential(rng):
    """Engine with the int8 KV cache must equal sequential greedy generation
    with the SAME int8 quantization (identical write/dequant math) — the
    analog of test_continuous_matches_sequential for the quantized cache.
    (bf16-vs-int8 token agreement is meaningless on a random tiny model:
    a first-token argmax flip cascades.)"""
    from autogptq_tpu.utils import generation

    model = Shim()
    eng = ContinuousBatchEngine(model, max_slots=2, max_seq_len=128, kv_quant=True)
    assert eng.cache_k.dtype == jnp.int8 and eng.cache_ks is not None

    prompts = [rng.integers(0, model.cfg.vocab_size, size=(p,)).astype(np.int32)
               for p in (5, 9)]
    for i, p in enumerate(prompts):
        eng.submit(Request(req_id=i, prompt=p, max_new_tokens=6))
    for _ in range(40):
        eng.step()
        if len(eng.finished) == len(prompts):
            break
    assert len(eng.finished) == len(prompts)
    for i, p in enumerate(prompts):
        ref = generation.generate(model, p[None], max_new_tokens=6, kv_quant=True)[0, len(p):]
        np.testing.assert_array_equal(np.asarray(eng.finished[i]), np.asarray(ref))


def test_warmup_precompiles_and_preserves_state(rng):
    model = Shim()
    eng = ContinuousBatchEngine(model, max_slots=2, max_seq_len=128)
    eng.warmup(buckets=(32, 64))
    assert 32 in eng._prefill_fns and 64 in eng._prefill_fns
    assert (False, None) in eng._decode_fns  # greedy decode compiled
    assert (False, 32) in eng._decode_fns  # window-bucketed variant too
    assert all(st.req is None for st in eng.slots)
    assert int(eng.lengths.sum()) == 0
    # engine still works normally after warmup
    p = rng.integers(0, model.cfg.vocab_size, size=(5,)).astype(np.int32)
    eng.submit(Request(req_id=0, prompt=p, max_new_tokens=4))
    for _ in range(10):
        eng.step()
        if eng.finished:
            break
    expected = sequential_greedy(model, p, 4)
    np.testing.assert_array_equal(eng.finished[0], expected)


def test_warmup_default_covers_every_reachable_variant(rng):
    """warmup() with no arguments must precompile EVERY jit variant the
    engine can request at runtime — prefill buckets, chunked-prefill
    windows, and decode windows — so no compile ever fires mid-serving."""
    model = Shim()
    eng = ContinuousBatchEngine(
        model, max_slots=2, max_seq_len=128, prefill_chunk=16)
    eng.warmup(sampling=False)
    warmed_prefill = set(eng._prefill_fns)
    warmed_chunk = set(eng._chunk_fns)
    warmed_decode = set(eng._decode_fns)

    # drive requests whose prompts/lengths walk through chunked prefill and
    # growing decode windows; no NEW variants may appear
    prompts = [rng.integers(0, model.cfg.vocab_size, size=(p,)).astype(np.int32)
               for p in (40, 5)]
    for i, p in enumerate(prompts):
        eng.submit(Request(req_id=i, prompt=p, max_new_tokens=30))
    for _ in range(200):
        eng.step()
        if len(eng.finished) == len(prompts):
            break
    assert len(eng.finished) == len(prompts)
    assert set(eng._prefill_fns) <= warmed_prefill
    assert set(eng._chunk_fns) <= warmed_chunk
    assert set(eng._decode_fns) <= warmed_decode


def test_engine_stats_counters(rng):
    """EngineStats tracks steps, tokens, prefills, and completions; warmup
    does not pollute the counters."""
    model = Shim()
    eng = ContinuousBatchEngine(model, max_slots=2, max_seq_len=128)
    assert eng.stats.steps == 0
    prompts = [rng.integers(0, model.cfg.vocab_size, size=(p,)).astype(np.int32)
               for p in (5, 9)]
    eng.run([Request(i, p, max_new_tokens=6) for i, p in enumerate(prompts)])
    st = eng.stats
    assert st.requests_completed == 2
    assert st.prefills == 2
    assert st.prefill_tokens == 14
    # 2 slots x 6 tokens, co-scheduled: 12 slot-tokens over >= 6 steps
    assert st.tokens_generated == 12
    assert 6 <= st.steps <= 12
    assert st.step_time_s > 0
    snap = st.snapshot()
    assert snap["decode_tok_s"] > 0
    assert snap["preemptions"] == 0


# -- speculative serving (draft-model proposals verified in-engine) ---------


def _draft_shim():
    """A DIFFERENT tiny model (same vocab) — low acceptance exercises the
    correction path."""
    return Shim(seed=123)


def test_spec_serving_matches_plain_engine(rng):
    model = Shim()
    prompts = [rng.integers(0, model.cfg.vocab_size, size=(p,)).astype(np.int32)
               for p in (5, 9, 3)]
    mk = lambda: [Request(i, p, max_new_tokens=n)
                  for i, (p, n) in enumerate(zip(prompts, (12, 7, 9)))]
    plain = ContinuousBatchEngine(model, max_slots=2, max_seq_len=128).run(mk())

    # draft == target: near-full acceptance; draft != target: corrections
    for draft in (model, _draft_shim()):
        eng = ContinuousBatchEngine(
            model, max_slots=2, max_seq_len=128, draft_model=draft,
            spec_gamma=3)
        got = eng.run(mk())
        for rid in plain:
            np.testing.assert_array_equal(got[rid], plain[rid])
        assert eng.stats.tokens_generated >= 28   # 12+7+9 tokens emitted
        # speculative steps emit multiple tokens: fewer steps than tokens
        # when the draft is the target itself
        if draft is model:
            assert eng.stats.steps < 28


def test_spec_serving_eos_and_streaming(rng):
    model = Shim()
    p = rng.integers(0, model.cfg.vocab_size, size=(6,)).astype(np.int32)
    plain = ContinuousBatchEngine(model, max_slots=1, max_seq_len=128).run(
        [Request(0, p, max_new_tokens=12)])
    eos = int(plain[0][4])       # force an EOS mid-stream
    plain_eos = ContinuousBatchEngine(model, max_slots=1, max_seq_len=128).run(
        [Request(0, p, max_new_tokens=12, eos_token_id=eos)])
    streams = {}
    eng = ContinuousBatchEngine(
        model, max_slots=1, max_seq_len=128, draft_model=model, spec_gamma=4,
        on_token=lambda rid, t: streams.setdefault(rid, []).append(t))
    got = eng.run([Request(0, p, max_new_tokens=12, eos_token_id=eos)])
    np.testing.assert_array_equal(got[0], plain_eos[0])
    np.testing.assert_array_equal(np.asarray(streams[0], np.int32), got[0])


def test_spec_serving_falls_back_for_sampling_and_min_new(rng):
    model = Shim()
    prompts = [rng.integers(0, model.cfg.vocab_size, size=(p,)).astype(np.int32)
               for p in (5, 7)]
    mk = lambda: [
        Request(0, prompts[0], max_new_tokens=8),
        Request(1, prompts[1], max_new_tokens=8, temperature=0.9, seed=7),
    ]
    plain = ContinuousBatchEngine(model, max_slots=2, max_seq_len=128).run(mk())
    eng = ContinuousBatchEngine(
        model, max_slots=2, max_seq_len=128, draft_model=model)
    got = eng.run(mk())
    for rid in plain:
        np.testing.assert_array_equal(got[rid], plain[rid])
    assert eng._spec_fns == {}    # sampling slot present -> never engaged


def test_spec_serving_with_chunked_prefill(rng):
    """Long prompt: target prefills in chunks, draft prefills whole; the
    speculative stream must still equal the plain engine's."""
    model = Shim()
    p = rng.integers(0, model.cfg.vocab_size, size=(40,)).astype(np.int32)
    mk = lambda: [Request(0, p, max_new_tokens=10)]
    plain = ContinuousBatchEngine(
        model, max_slots=1, max_seq_len=128, prefill_chunk=16).run(mk())
    eng = ContinuousBatchEngine(
        model, max_slots=1, max_seq_len=128, prefill_chunk=16,
        draft_model=_draft_shim(), spec_gamma=3)
    got = eng.run(mk())
    np.testing.assert_array_equal(got[0], plain[0])


def test_spec_serving_int8_kv_matches_plain_int8(rng):
    """Speculative serving composes with the int8 KV cache: output equals
    the plain int8-KV engine exactly (both quantize per written row, and
    the multi-token vector-cursor write carries the scales)."""
    model = Shim()
    prompts = [rng.integers(0, model.cfg.vocab_size, size=(p,)).astype(np.int32)
               for p in (5, 8)]
    mk = lambda: [Request(i, p, max_new_tokens=9)
                  for i, p in enumerate(prompts)]
    plain = ContinuousBatchEngine(
        model, max_slots=2, max_seq_len=128, kv_quant=True).run(mk())
    eng = ContinuousBatchEngine(
        model, max_slots=2, max_seq_len=128, kv_quant=True,
        draft_model=_draft_shim(), spec_gamma=3)
    got = eng.run(mk())
    for rid in plain:
        np.testing.assert_array_equal(got[rid], plain[rid])


def test_spec_warmup_covers_all_variants_and_windows(rng):
    """warmup() on a speculative engine precompiles the draft prefill
    buckets and every reachable spec-step window; serving then triggers no
    new compiles, and the (window-bucketed) spec stream stays exact."""
    model = Shim()
    eng = ContinuousBatchEngine(
        model, max_slots=2, max_seq_len=128, draft_model=_draft_shim(),
        spec_gamma=3)
    eng.warmup(sampling=False)
    warmed_spec = set(eng._spec_fns)
    warmed_draft = set(eng._draft_prefill_fns)
    assert len(warmed_spec) > 1          # windowed variants + full-cache

    p = rng.integers(0, model.cfg.vocab_size, size=(30,)).astype(np.int32)
    plain = ContinuousBatchEngine(model, max_slots=1, max_seq_len=128).run(
        [Request(0, p, max_new_tokens=60)])
    got = eng.run([Request(0, p, max_new_tokens=60)])   # crosses windows
    np.testing.assert_array_equal(got[0], plain[0])
    assert set(eng._spec_fns) == warmed_spec
    assert set(eng._draft_prefill_fns) == warmed_draft


def test_spec_draft_prefill_bucket_exceeds_max_seq_len(rng):
    """A chunk-admitted prompt whose bucket exceeds max_seq_len must not
    crash the draft prefill (K/V clipped to the cache; rows past it are
    bucket padding)."""
    model = Shim()
    p = rng.integers(0, model.cfg.vocab_size, size=(70,)).astype(np.int32)
    plain = ContinuousBatchEngine(
        model, max_slots=1, max_seq_len=96, prefill_chunk=16).run(
        [Request(0, p, max_new_tokens=10)])
    eng = ContinuousBatchEngine(
        model, max_slots=1, max_seq_len=96, prefill_chunk=16,
        draft_model=_draft_shim(), spec_gamma=3)
    got = eng.run([Request(0, p, max_new_tokens=10)])
    np.testing.assert_array_equal(got[0], plain[0])
