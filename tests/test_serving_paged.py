"""Paged-KV continuous batching: outputs must equal sequential generation
while cache memory is bounded by the shared page pool (tokens actually
resident), with on-demand growth, page reuse across requests, and
recompute-preemption when the pool runs dry."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.serving import Request  # noqa: E402
from autogptq_tpu.serving_paged import PagedContinuousBatchEngine  # noqa: E402


class Shim:
    def __init__(self, **kw):
        import importlib.util

        spec = importlib.util.spec_from_file_location("ge_paged", "__graft_entry__.py")
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


def test_paged_matches_sequential(model, rng):
    eng = PagedContinuousBatchEngine(
        model, max_slots=2, total_pages=32, page_size=8, pages_per_seq=8,
    )
    prompts = [
        rng.integers(0, model.cfg.vocab_size, size=(p,)).astype(np.int32)
        for p in (5, 11, 17)
    ]
    results = eng.run([Request(i, p, max_new_tokens=6) for i, p in enumerate(prompts)])
    assert set(results) == {0, 1, 2}
    for i, p in enumerate(prompts):
        np.testing.assert_array_equal(results[i], sequential_greedy(model, p, 6))
    assert eng.pages_in_use() == 0            # all pages freed at retirement


def test_paged_on_demand_growth_and_reuse(model, rng):
    """Pool sized well below max_slots * pages_per_seq: sequences grow page
    by page and retired sequences' pages are recycled."""
    eng = PagedContinuousBatchEngine(
        model, max_slots=2, total_pages=9, page_size=4, pages_per_seq=8,
    )
    peak = {"v": 0}
    orig_alloc = eng._alloc

    def tracking_alloc(n):
        out = orig_alloc(n)
        peak["v"] = max(peak["v"], eng.pages_in_use())
        return out

    eng._alloc = tracking_alloc
    prompts = [
        rng.integers(0, model.cfg.vocab_size, size=(p,)).astype(np.int32)
        for p in (6, 9, 5, 7)
    ]
    results = eng.run([Request(i, p, max_new_tokens=5) for i, p in enumerate(prompts)])
    for i, p in enumerate(prompts):
        np.testing.assert_array_equal(results[i], sequential_greedy(model, p, 5))
    # the pool (8 usable pages = 32 tokens) is far below the 4 requests'
    # total footprint — reuse must have happened
    assert peak["v"] <= 8
    assert eng.pages_in_use() == 0


def test_paged_preemption_recompute(model, rng):
    """When growth needs a page and none are free, the youngest active
    sequence is evicted and re-queued; output is still exact (greedy is
    deterministic, so recompute reproduces the same tokens)."""
    eng = PagedContinuousBatchEngine(
        model, max_slots=2, total_pages=5, page_size=4, pages_per_seq=8,
    )
    p1 = rng.integers(0, model.cfg.vocab_size, size=(7,)).astype(np.int32)
    p2 = rng.integers(0, model.cfg.vocab_size, size=(6,)).astype(np.int32)
    results = eng.run([
        Request(0, p1, max_new_tokens=8),
        Request(1, p2, max_new_tokens=8),
    ])
    np.testing.assert_array_equal(results[0], sequential_greedy(model, p1, 8))
    np.testing.assert_array_equal(results[1], sequential_greedy(model, p2, 8))


def test_paged_sampling_deterministic(model, rng):
    p = rng.integers(0, model.cfg.vocab_size, size=(6,)).astype(np.int32)

    def run():
        eng = PagedContinuousBatchEngine(
            model, max_slots=2, total_pages=16, page_size=8, pages_per_seq=8,
        )
        return eng.run([Request(0, p, max_new_tokens=6, temperature=0.8, seed=11)])

    a, b = run(), run()
    np.testing.assert_array_equal(a[0], b[0])


def test_paged_matches_contiguous_engine(model, rng):
    """Paged and contiguous engines produce identical streams for the same
    mixed workload (incl. sampling)."""
    from autogptq_tpu.serving import ContinuousBatchEngine

    prompts = [
        rng.integers(0, model.cfg.vocab_size, size=(p,)).astype(np.int32)
        for p in (5, 9)
    ]
    mk = lambda: [
        Request(0, prompts[0], max_new_tokens=6),
        Request(1, prompts[1], max_new_tokens=6, temperature=0.9, seed=3),
    ]
    ref = ContinuousBatchEngine(model, max_slots=2, max_seq_len=64).run(mk())
    got = PagedContinuousBatchEngine(
        model, max_slots=2, total_pages=16, page_size=8, pages_per_seq=8,
    ).run(mk())
    for rid in ref:
        np.testing.assert_array_equal(got[rid], ref[rid])


def test_paged_rejects_oversized_and_exotic(model):
    eng = PagedContinuousBatchEngine(
        model, max_slots=1, total_pages=8, page_size=4, pages_per_seq=4,
    )
    with pytest.raises(ValueError, match="exceed"):
        eng.submit(Request(0, np.arange(10, dtype=np.int32), max_new_tokens=10))


def test_paged_nondividing_page_size(model, rng):
    """page_size that does not divide the prefill bucket: the padded
    scatter must not shift a partial last page over earlier tokens."""
    eng = PagedContinuousBatchEngine(
        model, max_slots=1, total_pages=8, page_size=48, pages_per_seq=4,
    )
    p = rng.integers(0, model.cfg.vocab_size, size=(60,)).astype(np.int32)
    out = eng.run([Request(0, p, max_new_tokens=6)])
    np.testing.assert_array_equal(out[0], sequential_greedy(model, p, 6))


def test_paged_infeasible_request_rejected(model):
    eng = PagedContinuousBatchEngine(
        model, max_slots=1, total_pages=8, page_size=4, pages_per_seq=16,
    )
    with pytest.raises(ValueError, match="pool"):
        eng.submit(Request(0, np.arange(29, dtype=np.int32), max_new_tokens=4))


def test_paged_stream_no_duplicates_under_preemption(model, rng):
    """Preemption replays a request; the stream must not repeat tokens and
    must equal the final output exactly."""
    streams = {}

    def cb(rid, tok):
        streams.setdefault(rid, []).append(tok)

    eng = PagedContinuousBatchEngine(
        model, max_slots=2, total_pages=5, page_size=4, pages_per_seq=8,
        on_token=cb,
    )
    p1 = rng.integers(0, model.cfg.vocab_size, size=(7,)).astype(np.int32)
    p2 = rng.integers(0, model.cfg.vocab_size, size=(6,)).astype(np.int32)
    out = eng.run([Request(0, p1, max_new_tokens=8),
                   Request(1, p2, max_new_tokens=8)])
    for rid in out:
        np.testing.assert_array_equal(np.asarray(streams[rid], np.int32), out[rid])


def test_paged_engine_real_kernel_interpret(model, rng):
    """The engine through the REAL mh paged-attention kernel (interpret
    mode) must reproduce sequential generation exactly."""
    eng = PagedContinuousBatchEngine(
        model, max_slots=2, total_pages=32, page_size=8, pages_per_seq=8,
        use_kernel="interpret")
    prompts = [rng.integers(0, model.cfg.vocab_size, size=(p,)).astype(np.int32)
               for p in (5, 11)]
    out = eng.run([Request(i, p, max_new_tokens=6) for i, p in enumerate(prompts)])
    for i, p in enumerate(prompts):
        np.testing.assert_array_equal(out[i], np.asarray(sequential_greedy(model, p, 6)))


def test_paged_warmup_precompiles_all_window_buckets(model, rng):
    """warmup() must precompile every decode-step variant the engine can
    request at runtime: the decode fn re-traces at each page-window bucket
    crossing (tables[:, :wb] grows with the live context), which on real
    hardware is a 1-2 min mid-serving XLA stall unless warmed here."""
    eng = PagedContinuousBatchEngine(
        model, max_slots=2, total_pages=64, page_size=8, pages_per_seq=16,
    )
    eng.warmup(sampling=False)
    warmed_prefill = set(eng._prefill_fns)
    warmed_decode = eng._decode_fns[False]._cache_size()
    assert all(st.req is None for st in eng.slots)   # state untouched
    assert eng.pages_in_use() == 0

    # 30-token prompt + 50 new crosses the 8->16 page-window bucket
    # (need > 64 positions) and two prefill buckets; no NEW compiles may
    # fire and the output must still equal sequential greedy decoding.
    p = rng.integers(0, model.cfg.vocab_size, size=(30,)).astype(np.int32)
    res = eng.run([Request(0, p, max_new_tokens=50)])
    assert set(eng._prefill_fns) == warmed_prefill
    assert eng._decode_fns[False]._cache_size() == warmed_decode
    np.testing.assert_array_equal(
        res[0], np.asarray(sequential_greedy(model, p, 50)))


def test_paged_engine_stats(model, rng):
    """Paged EngineStats additionally tracks preemptions and the page
    high-water mark."""
    eng = PagedContinuousBatchEngine(
        model, max_slots=2, total_pages=6, page_size=8, pages_per_seq=4,
    )
    prompts = [rng.integers(0, model.cfg.vocab_size, size=(p,)).astype(np.int32)
               for p in (7, 9)]
    # tight pool (5 usable pages; both sequences grow to 3 pages = 6)
    # forces a recompute preemption
    out = eng.run([Request(i, p, max_new_tokens=14) for i, p in enumerate(prompts)])
    st = eng.stats
    assert st.requests_completed == 2
    assert st.prefills >= 2                 # preempted prompts re-prefill
    assert st.tokens_generated >= 28
    assert st.steps > 0 and st.step_time_s > 0
    assert 0 < st.pages_high_water <= 5
    assert st.preemptions >= 1
    for i, p in enumerate(prompts):
        np.testing.assert_array_equal(out[i], sequential_greedy(model, p, 14))


def test_paged_warmup_covers_overhang_prefill_bucket(model, rng):
    """A prompt near max context prefills at a bucket LARGER than
    pages_per_seq * page_size; warmup must precompile it too (it was
    filtered out, leaving a mid-serving compile)."""
    eng = PagedContinuousBatchEngine(
        model, max_slots=1, total_pages=32, page_size=8, pages_per_seq=12,
    )
    eng.warmup(sampling=False)
    warmed = set(eng._prefill_fns)
    p = rng.integers(0, model.cfg.vocab_size, size=(70,)).astype(np.int32)
    res = eng.run([Request(0, p, max_new_tokens=5)])
    assert set(eng._prefill_fns) == warmed      # no new prefill compiles
    np.testing.assert_array_equal(
        res[0], np.asarray(sequential_greedy(model, p, 5)))


# -- automatic prefix caching (opt-in) ---------------------------------------


def test_prefix_cache_shares_pages_and_matches(model, rng):
    """Two co-scheduled requests with the same long prompt: the second
    reuses the first's full prompt pages (tables overlap) and both outputs
    equal sequential greedy."""
    eng = PagedContinuousBatchEngine(
        model, max_slots=2, total_pages=32, page_size=8, pages_per_seq=8,
        enable_prefix_cache=True,
    )
    p = rng.integers(0, model.cfg.vocab_size, size=(21,)).astype(np.int32)
    out = eng.run([Request(0, p, max_new_tokens=6),
                   Request(1, p.copy(), max_new_tokens=6)])
    want = np.asarray(sequential_greedy(model, p, 6))
    np.testing.assert_array_equal(out[0], want)
    np.testing.assert_array_equal(out[1], want)
    # 21 tokens at page_size 8 -> 2 full pages shareable
    assert eng.stats.prefix_hit_tokens == 16
    assert eng.pages_cached() > 0             # retired pages stay cached


def test_prefix_cache_reuse_after_retirement(model, rng):
    """A retired request's prompt pages serve a LATER identical prompt:
    the second prefill computes only the suffix."""
    eng = PagedContinuousBatchEngine(
        model, max_slots=1, total_pages=32, page_size=8, pages_per_seq=8,
        enable_prefix_cache=True,
    )
    p = rng.integers(0, model.cfg.vocab_size, size=(19,)).astype(np.int32)
    out1 = eng.run([Request(0, p, max_new_tokens=5)])
    t_before = eng.stats.prefill_tokens
    out2 = eng.run([Request(1, p.copy(), max_new_tokens=5)])
    np.testing.assert_array_equal(out1[0], out2[1])
    # second prefill computed only 19 - 16 = 3 tokens
    assert eng.stats.prefill_tokens - t_before == 3
    assert eng.stats.prefix_hit_tokens == 16


def test_prefix_cache_partial_prefix_divergence(model, rng):
    """Prompts sharing only the first page: only that page is reused and
    both streams stay exact."""
    eng = PagedContinuousBatchEngine(
        model, max_slots=2, total_pages=32, page_size=8, pages_per_seq=8,
        enable_prefix_cache=True,
    )
    base = rng.integers(0, model.cfg.vocab_size, size=(20,)).astype(np.int32)
    other = base.copy()
    other[10:] = rng.integers(0, model.cfg.vocab_size, size=(10,))
    out = eng.run([Request(0, base, max_new_tokens=6),
                   Request(1, other, max_new_tokens=6)])
    np.testing.assert_array_equal(out[0], np.asarray(sequential_greedy(model, base, 6)))
    np.testing.assert_array_equal(out[1], np.asarray(sequential_greedy(model, other, 6)))
    assert eng.stats.prefix_hit_tokens == 8    # exactly one shared page


def test_prefix_cache_eviction_under_pressure(model, rng):
    """Cached (refcount-0) pages are evicted LRU when the pool runs dry;
    subsequent different prompts still decode exactly."""
    eng = PagedContinuousBatchEngine(
        model, max_slots=1, total_pages=8, page_size=8, pages_per_seq=6,
        enable_prefix_cache=True,
    )
    prompts = [rng.integers(0, model.cfg.vocab_size, size=(17,)).astype(np.int32)
               for _ in range(3)]
    for i, p in enumerate(prompts):
        out = eng.run([Request(i, p, max_new_tokens=8)])
        np.testing.assert_array_equal(
            out[i], np.asarray(sequential_greedy(model, p, 8)))


def test_prefix_cache_preemption_interplay(model, rng):
    """Recompute-preemption with the prefix cache on: exact outputs, and
    the replayed request can reuse its own cached prompt pages."""
    eng = PagedContinuousBatchEngine(
        model, max_slots=2, total_pages=6, page_size=4, pages_per_seq=8,
        enable_prefix_cache=True,
    )
    p1 = rng.integers(0, model.cfg.vocab_size, size=(7,)).astype(np.int32)
    p2 = rng.integers(0, model.cfg.vocab_size, size=(6,)).astype(np.int32)
    out = eng.run([Request(0, p1, max_new_tokens=8),
                   Request(1, p2, max_new_tokens=8)])
    np.testing.assert_array_equal(out[0], np.asarray(sequential_greedy(model, p1, 8)))
    np.testing.assert_array_equal(out[1], np.asarray(sequential_greedy(model, p2, 8)))


def test_prefix_cache_warmup_no_midserving_compiles(model, rng):
    """warmup() on a prefix-cache engine precompiles the page gathers and
    suffix continuation prefills: a later cache HIT triggers no new
    compiles."""
    eng = PagedContinuousBatchEngine(
        model, max_slots=1, total_pages=32, page_size=8, pages_per_seq=8,
        enable_prefix_cache=True,
    )
    eng.warmup(sampling=False)
    warmed = (set(eng._prefill_fns), set(eng._gather_fns),
              set(eng._suffix_fns))
    p = rng.integers(0, model.cfg.vocab_size, size=(19,)).astype(np.int32)
    out1 = eng.run([Request(0, p, max_new_tokens=5)])
    out2 = eng.run([Request(1, p.copy(), max_new_tokens=5)])   # cache hit
    np.testing.assert_array_equal(out1[0], out2[1])
    assert eng.stats.prefix_hit_tokens == 16
    assert (set(eng._prefill_fns), set(eng._gather_fns),
            set(eng._suffix_fns)) == warmed
