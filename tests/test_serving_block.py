"""Multi-step decode blocks (decode_block=K): the engine must emit EXACTLY
the plain one-step engine's streams while syncing tokens to the host once
per block — greedy, sampled, EOS retirement, min_new suppression, chunked
prefill interplay, and mid-block retirement truncation."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.serving import ContinuousBatchEngine, Request  # noqa: E402
from tests.test_serving import Shim  # noqa: E402


def _run_both(reqs_fn, rng, block=4, **eng_kw):
    """Run identical request sets through a plain and a block engine."""
    m = Shim()
    plain = ContinuousBatchEngine(m, max_slots=2, max_seq_len=128, **eng_kw)
    blk = ContinuousBatchEngine(m, max_slots=2, max_seq_len=128,
                                decode_block=block, **eng_kw)
    r_plain = plain.run(reqs_fn(rng, m))
    r_blk = blk.run(reqs_fn(np.random.default_rng(rng_seed(rng)), m))
    return r_plain, r_blk, blk


_SEED = [0]


def rng_seed(_):
    return 1234


def _mk_reqs(rng, m, **kw):
    prompts = [
        rng.integers(0, m.cfg.vocab_size, size=(p,)).astype(np.int32)
        for p in (5, 9, 17)
    ]
    return [Request(req_id=i, prompt=p, max_new_tokens=11, **kw)
            for i, p in enumerate(prompts)]


def test_block_greedy_matches_plain(rng):
    r_plain, r_blk, eng = _run_both(
        lambda r, m: _mk_reqs(np.random.default_rng(7), m), rng)
    assert set(r_blk) == set(r_plain)
    for k in r_plain:
        np.testing.assert_array_equal(r_blk[k], r_plain[k])
    # the block path actually ran: fewer host syncs than generated tokens
    assert eng._block_fns, "block fns never compiled — block path not taken"


def test_block_sampling_matches_plain(rng):
    def reqs(r, m):
        return [Request(req_id=i, prompt=p, max_new_tokens=9,
                        temperature=0.8, top_p=0.9, top_k=17, seed=100 + i)
                for i, p in enumerate(
                    r.integers(0, m.cfg.vocab_size, size=(3, 8)).astype(np.int32))]

    r_plain, r_blk, _ = _run_both(
        lambda r, m: reqs(np.random.default_rng(3), m), rng)
    for k in r_plain:
        np.testing.assert_array_equal(r_blk[k], r_plain[k])


def test_block_eos_and_min_new(rng):
    """EOS mid-block retires the request with the post-EOS tokens discarded;
    min_new suppression must decrement in-graph identically."""
    m = Shim()
    r = np.random.default_rng(5)
    prompt = r.integers(0, m.cfg.vocab_size, size=(6,)).astype(np.int32)
    # find a token this model actually produces so EOS fires organically
    plain = ContinuousBatchEngine(m, max_slots=1, max_seq_len=128)
    ref = plain.run([Request(0, prompt, max_new_tokens=12)])[0]
    eos = int(ref[4])              # force retirement partway through
    kw = dict(max_new_tokens=12, eos_token_id=eos, min_new_tokens=3)
    p2 = ContinuousBatchEngine(m, max_slots=1, max_seq_len=128)
    b2 = ContinuousBatchEngine(m, max_slots=1, max_seq_len=128, decode_block=4)
    out_p = p2.run([Request(0, prompt, **kw)])[0]
    out_b = b2.run([Request(0, prompt, **kw)])[0]
    np.testing.assert_array_equal(out_b, out_p)


def test_block_with_chunked_prefill(rng):
    """Long prompts (chunked prefill) must interleave: blocks only run when
    nothing is mid-prefill, plain steps otherwise; streams stay exact."""
    m = Shim()
    r = np.random.default_rng(11)
    long_p = r.integers(0, m.cfg.vocab_size, size=(40,)).astype(np.int32)
    short_p = r.integers(0, m.cfg.vocab_size, size=(4,)).astype(np.int32)
    kw = dict(max_slots=2, max_seq_len=128, prefill_chunk=16)
    plain = ContinuousBatchEngine(m, **kw)
    blk = ContinuousBatchEngine(m, decode_block=4, **kw)
    reqs = [Request(0, short_p, max_new_tokens=10),
            Request(1, long_p, max_new_tokens=10)]
    out_p = plain.run(list(reqs))
    out_b = blk.run(list(reqs))
    for k in out_p:
        np.testing.assert_array_equal(out_b[k], out_p[k])


def test_block_slot_reuse(rng):
    """More requests than slots: mid-block retirements must free slots for
    the queue and the reused slot's streams stay exact."""
    m = Shim()
    r = np.random.default_rng(13)
    prompts = [r.integers(0, m.cfg.vocab_size, size=(p,)).astype(np.int32)
               for p in (5, 7, 9, 11)]
    reqs = [Request(i, p, max_new_tokens=5 + i) for i, p in enumerate(prompts)]
    plain = ContinuousBatchEngine(m, max_slots=2, max_seq_len=128)
    blk = ContinuousBatchEngine(m, max_slots=2, max_seq_len=128, decode_block=3)
    out_p = plain.run(list(reqs))
    out_b = blk.run(list(reqs))
    for k in out_p:
        np.testing.assert_array_equal(out_b[k], out_p[k])


def test_block_warmup_covers_variants(rng):
    """warmup() on a block engine precompiles the block fns; serving then
    triggers no new compiles (mirrors the plain warmup contract)."""
    m = Shim()
    eng = ContinuousBatchEngine(m, max_slots=2, max_seq_len=64,
                                decode_block=4, prefill_chunk=None)
    eng.warmup()
    n_block = len(eng._block_fns)
    assert n_block > 0
    r = np.random.default_rng(17)
    reqs = [Request(i, r.integers(0, m.cfg.vocab_size, size=(6,)).astype(np.int32),
                    max_new_tokens=8, temperature=0.7 if i else 0.0, seed=i)
            for i in range(3)]
    eng.run(reqs)
    assert len(eng._block_fns) == n_block, "serving compiled a new block fn"
