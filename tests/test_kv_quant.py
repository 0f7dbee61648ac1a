"""int8 KV cache option: forward parity vs the bf16 cache and cached
generation end-to-end (net-new — the reference has no KV-cache machinery)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.models import arch  # noqa: E402


def _model():
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry_kv", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._tiny_quantized_llama(hidden=128, inter=256, layers=2, group_size=32)


def test_int8_cache_forward_parity(rng):
    params, cfg = _model()
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)), jnp.int32)

    c16 = arch.KVCache.create(cfg, 2, 16, dtype=jnp.float32)
    c8 = arch.KVCache.create(cfg, 2, 16, quantized=True)
    assert c8.k.dtype == jnp.int8 and c8.k_scale is not None

    l16, c16b = arch.forward(params, ids, cfg, cache=c16, backend="xla", dtype=jnp.float32)
    l8, c8b = arch.forward(params, ids, cfg, cache=c8, backend="xla", dtype=jnp.float32)
    # int8 KV costs ~0.4% relative error on attention outputs
    p16 = jax.nn.softmax(np.asarray(l16[:, -1]).astype(np.float64))
    p8 = jax.nn.softmax(np.asarray(l8[:, -1]).astype(np.float64))
    assert np.abs(np.asarray(p16) - np.asarray(p8)).max() < 5e-2
    assert int(c8b.length) == 12
    # decode step with the updated quantized cache
    nxt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 1)), jnp.int32)
    l8d, _ = arch.forward(params, nxt, cfg, cache=c8b, backend="xla", dtype=jnp.float32)
    assert np.isfinite(np.asarray(l8d)).all()


def test_generate_kv_quant(rng):
    params, cfg = _model()

    class Shim:
        pass

    m = Shim()
    m.params, m.cfg, m.backend, m.dtype = params, cfg, "xla", jnp.float32
    from autogptq_tpu.utils import generation

    ids = rng.integers(0, cfg.vocab_size, (1, 6)).astype(np.int32)
    out16 = generation.generate(m, ids, max_new_tokens=6)
    out8 = generation.generate(m, ids, max_new_tokens=6, kv_quant=True)
    assert out8.shape == out16.shape == (1, 12)
    # same prompt, near-identical distributions: most greedy tokens agree
    assert (out8[0, 6:] == out16[0, 6:]).mean() >= 0.5


def test_int8_cache_continuous_batching(rng):
    """The per-slot-cursor branch (serving engine pattern) with int8 KV."""
    params, cfg = _model()
    b = 2
    cache = arch.KVCache.create(cfg, b, 16, quantized=True)
    lengths = jnp.asarray([3, 5], jnp.int32)
    cache = arch.KVCache(
        k=cache.k, v=cache.v, length=lengths,
        k_scale=cache.k_scale, v_scale=cache.v_scale,
    )
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 1)), jnp.int32)
    logits, cache2 = arch.forward(
        params, tok, cfg, cache=cache, positions=lengths[:, None],
        backend="xla", dtype=jnp.float32,
    )
    assert np.isfinite(np.asarray(logits)).all()
    np.testing.assert_array_equal(np.asarray(cache2.length), [4, 6])
    # the written scale rows are nonzero exactly at the cursor positions
    ks = np.asarray(cache2.k_scale)  # [L, B, S, H, 1]
    assert (ks[0, 0, 3] > 0).all() and (ks[0, 1, 5] > 0).all()
    assert (ks[0, 0, 4] == 0).all()
