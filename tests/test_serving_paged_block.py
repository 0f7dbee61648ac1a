"""Paged-engine multi-step decode blocks (decode_block=K): streams must be
token-identical to the one-step paged engine — including preemption under
pool pressure, prefix caching, near-context-cap fallback, and mid-block
retirement truncation."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from autogptq_tpu.serving import Request  # noqa: E402
from autogptq_tpu.serving_paged import PagedContinuousBatchEngine  # noqa: E402
from tests.test_serving_paged import Shim  # noqa: E402


@pytest.fixture(scope="module")
def model():
    return Shim()


def _reqs(rng, m, n=3, max_new=9, **kw):
    prompts = [rng.integers(0, m.cfg.vocab_size, size=(p,)).astype(np.int32)
               for p in (5, 11, 17)[:n]]
    return [Request(i, p, max_new_tokens=max_new, **kw)
            for i, p in enumerate(prompts)]


def _run_pair(model, reqs, block=4, **kw):
    one = PagedContinuousBatchEngine(model, **kw)
    blk = PagedContinuousBatchEngine(model, decode_block=block, **kw)
    return one.run(list(reqs)), blk.run(list(reqs)), blk


def test_paged_block_greedy_matches_one_step(model, rng):
    kw = dict(max_slots=2, total_pages=32, page_size=8, pages_per_seq=8)
    out1, outb, eng = _run_pair(model, _reqs(np.random.default_rng(2), model), **kw)
    assert set(outb) == set(out1)
    for k in out1:
        np.testing.assert_array_equal(outb[k], out1[k])
    assert eng.pages_in_use() == 0
    assert eng._block_fns, "block path never compiled"


def test_paged_block_sampling_matches_one_step(model, rng):
    r = np.random.default_rng(3)
    reqs = [Request(i, r.integers(0, model.cfg.vocab_size, size=(7,)).astype(np.int32),
                    max_new_tokens=8, temperature=0.9, top_k=13, seed=41 + i)
            for i in range(3)]
    kw = dict(max_slots=2, total_pages=32, page_size=8, pages_per_seq=8)
    out1, outb, _ = _run_pair(model, reqs, **kw)
    for k in out1:
        np.testing.assert_array_equal(outb[k], out1[k])


def test_paged_block_eos_mid_block(model, rng):
    r = np.random.default_rng(5)
    prompt = r.integers(0, model.cfg.vocab_size, size=(6,)).astype(np.int32)
    kw = dict(max_slots=1, total_pages=16, page_size=8, pages_per_seq=8)
    probe = PagedContinuousBatchEngine(model, **kw)
    ref = probe.run([Request(0, prompt, max_new_tokens=10)])[0]
    eos = int(ref[4])
    reqs = [Request(0, prompt, max_new_tokens=10, eos_token_id=eos,
                    min_new_tokens=2)]
    out1, outb, _ = _run_pair(model, reqs, block=4, **kw)
    np.testing.assert_array_equal(outb[0], out1[0])


def test_paged_block_preemption_exactness(model, rng):
    """A pool too small for all sequences forces recompute-preemption; the
    block engine preallocates nblk pages ahead so it preempts earlier, but
    final outputs must still be exact."""
    r = np.random.default_rng(7)
    reqs = [Request(i, r.integers(0, model.cfg.vocab_size, size=(9,)).astype(np.int32),
                    max_new_tokens=12) for i in range(3)]
    kw = dict(max_slots=3, total_pages=10, page_size=8, pages_per_seq=8)
    out1, outb, eng = _run_pair(model, reqs, block=4, **kw)
    for k in out1:
        np.testing.assert_array_equal(outb[k], out1[k])


def test_paged_block_near_cap_falls_back(model, rng):
    """Sequences whose context approaches pages_per_seq*page_size must fall
    back to single steps (no out-of-table writes) and stay exact."""
    r = np.random.default_rng(9)
    # prompt 11 + 12 new = 23 of a 24-token cap (3 pages x 8)
    prompt = r.integers(0, model.cfg.vocab_size, size=(11,)).astype(np.int32)
    reqs = [Request(0, prompt, max_new_tokens=12)]
    kw = dict(max_slots=1, total_pages=8, page_size=8, pages_per_seq=3)
    out1, outb, _ = _run_pair(model, reqs, block=4, **kw)
    np.testing.assert_array_equal(outb[0], out1[0])


def test_paged_block_with_prefix_cache(model, rng):
    """decode_block composes with automatic prefix caching: shared-prefix
    waves through the block engine emit the exact one-step streams."""
    r = np.random.default_rng(11)
    shared = r.integers(0, model.cfg.vocab_size, size=(16,)).astype(np.int32)
    reqs = [Request(i, np.concatenate([shared,
                                       r.integers(0, model.cfg.vocab_size,
                                                  size=(3 + i,)).astype(np.int32)]),
                    max_new_tokens=7) for i in range(3)]
    kw = dict(max_slots=2, total_pages=32, page_size=8, pages_per_seq=8,
              enable_prefix_cache=True)
    out1, outb, eng = _run_pair(model, reqs, block=3, **kw)
    for k in out1:
        np.testing.assert_array_equal(outb[k], out1[k])
    assert eng.stats.prefix_hit_tokens > 0


def test_paged_block_warmup_no_new_compiles(model, rng):
    eng = PagedContinuousBatchEngine(
        model, max_slots=2, total_pages=32, page_size=8, pages_per_seq=8,
        decode_block=3)
    eng.warmup(sampling=False)
    import jax as _jax

    r = np.random.default_rng(13)
    reqs = [Request(i, r.integers(0, model.cfg.vocab_size, size=(6,)).astype(np.int32),
                    max_new_tokens=8) for i in range(3)]
    with _jax.log_compiles(True):
        import logging
        import io

        buf = io.StringIO()
        h = logging.StreamHandler(buf)
        logging.getLogger("jax._src.interpreters.pxla").addHandler(h)
        try:
            eng.run(reqs)
        finally:
            logging.getLogger("jax._src.interpreters.pxla").removeHandler(h)
        assert "Compiling" not in buf.getvalue(), buf.getvalue()
