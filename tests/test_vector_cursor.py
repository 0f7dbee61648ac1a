"""arch.attention per-slot write cursors with T > 1 (the speculative verify
window): a multi-token forward at vector cursors must equal the same tokens
fed one step at a time — logits AND cache contents — including unequal
cursors per slot and the int8 KV cache."""

import importlib.util

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.models import arch  # noqa: E402
from autogptq_tpu.models.arch import KVCache  # noqa: E402


@pytest.fixture(scope="module")
def model():
    spec = importlib.util.spec_from_file_location("ge_vc", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    params, cfg = mod._tiny_quantized_llama(
        hidden=128, inter=256, layers=2, group_size=32)
    return params, cfg


@pytest.mark.parametrize("kv_quant", [False, True])
def test_multitoken_vector_cursor_equals_sequential(model, rng, kv_quant):
    params, cfg = model
    B, S, T = 2, 32, 3
    cache = KVCache.create(cfg, B, S, dtype=jnp.float32, quantized=kv_quant)
    cache = KVCache(k=cache.k, v=cache.v,
                    length=jnp.zeros((B,), jnp.int32),
                    k_scale=cache.k_scale, v_scale=cache.v_scale)
    toks = rng.integers(0, cfg.vocab_size, size=(B, 9)).astype(np.int32)
    for j in range(5):
        _, cache = arch.forward(params, jnp.asarray(toks[:, j:j + 1]), cfg,
                                cache=cache, backend="xla", dtype=jnp.float32)
    # UNEQUAL per-slot cursors (speculative rewind): slot1 back to 3
    cache = KVCache(k=cache.k, v=cache.v,
                    length=jnp.asarray([5, 3], jnp.int32),
                    k_scale=cache.k_scale, v_scale=cache.v_scale)
    win = jnp.asarray(toks[:, 5:5 + T])
    lg_win, c_win = arch.forward(params, win, cfg, cache=cache,
                                 backend="xla", dtype=jnp.float32)
    c_seq, lgs = cache, []
    for j in range(T):
        lg1, c_seq = arch.forward(params, win[:, j:j + 1], cfg, cache=c_seq,
                                  backend="xla", dtype=jnp.float32)
        lgs.append(lg1[:, 0])
    np.testing.assert_allclose(np.asarray(lg_win),
                               np.asarray(jnp.stack(lgs, axis=1)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(c_win.length),
                                  np.asarray(c_seq.length))
    np.testing.assert_allclose(np.asarray(c_win.k, np.float32),
                               np.asarray(c_seq.k, np.float32),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_win.v, np.float32),
                               np.asarray(c_seq.v, np.float32),
                               rtol=1e-5, atol=1e-5)
    if kv_quant:
        np.testing.assert_allclose(np.asarray(c_win.k_scale),
                                   np.asarray(c_seq.k_scale),
                                   rtol=1e-6, atol=1e-7)


def test_multitoken_vector_cursor_drop_mode(model, rng):
    """Writes past the cache end are DROPPED (parked/overflow cursors), not
    clamped over valid rows."""
    params, cfg = model
    B, S = 2, 16
    cache = KVCache.create(cfg, B, S, dtype=jnp.float32)
    cache = KVCache(k=cache.k, v=cache.v,
                    length=jnp.asarray([2, S - 1], jnp.int32),
                    k_scale=None, v_scale=None)
    before = np.asarray(cache.k)
    win = rng.integers(0, cfg.vocab_size, size=(B, 3)).astype(np.int32)
    _, c2 = arch.forward(params, jnp.asarray(win), cfg, cache=cache,
                         backend="xla", dtype=jnp.float32)
    after = np.asarray(c2.k)
    # slot0 rows [2,5) changed; slot1 could only write row S-1 (rows past
    # the end dropped) — earlier rows untouched
    assert not np.allclose(after[:, 0, 2:5], before[:, 0, 2:5])
    np.testing.assert_array_equal(after[:, 1, : S - 1], before[:, 1, : S - 1])
