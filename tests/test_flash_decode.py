"""Flash-decode kernel (contiguous stacked cache): kernel-vs-dense-reference
exactness (interpret mode) and end-to-end token equality through generate().

The kernel replaces the decode-step f32 attention einsum (the reference's
torch-SDPA-over-dynamic-cache role) — see ops/pallas/flash_decode.py.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.models import arch  # noqa: E402
from autogptq_tpu.ops.pallas import flash_decode as fd  # noqa: E402
from autogptq_tpu.utils import generation  # noqa: E402


def _rand_case(rng, *, L=3, B=2, S=48, h=8, hkv=4, hkv_cache=None, d=64,
               dtype=jnp.float32):
    hkv_c = hkv_cache or hkv
    q = jnp.asarray(rng.standard_normal((B, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((L, B, S, hkv_c, d)), dtype)
    v = jnp.asarray(rng.standard_normal((L, B, S, hkv_c, d)), dtype)
    lo = jnp.asarray(rng.integers(0, 4, size=B), jnp.int32)
    hi = jnp.asarray(rng.integers(5, S + 1, size=B), jnp.int32)
    return q, k, v, lo, hi


@pytest.mark.parametrize(
    "kw, sblk",
    [
        (dict(), 16),                            # GQA, pow2 block
        (dict(), 12),                            # non-pow2 divisor block
        (dict(h=4, hkv=4), 48),                  # MHA, single block
        (dict(h=8, hkv=2, hkv_cache=4), 16),     # var-GQA padded cache
        (dict(S=33), 33),                        # odd S, one odd block
        (dict(dtype=jnp.bfloat16), 16),          # bf16 cache
    ],
)
def test_kernel_matches_dense_reference(rng, kw, sblk):
    q, k, v, lo, hi = _rand_case(rng, **kw)
    hkv = kw.get("hkv", 4)
    for layer in range(k.shape[0]):
        got = fd.flash_decode(
            q, k, v, lo, hi, layer=layer, sm_scale=0.17, sblk=sblk,
            hkv=hkv, interpret=True)
        want = fd.flash_decode_ref(
            q, k, v, lo, hi, layer=layer, sm_scale=0.17, hkv=hkv)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_parked_cursor_rows_are_finite(rng):
    # serving parks retired slots at huge cursors: hi > S must not produce
    # NaNs (the row attends the whole window, matching the einsum path)
    q, k, v, lo, hi = _rand_case(rng)
    hi = hi.at[1].set(10_000)
    got = fd.flash_decode(q, k, v, lo, hi, layer=0, sm_scale=0.2, sblk=16,
                          hkv=4, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    want = fd.flash_decode_ref(q, k, v, lo, jnp.minimum(hi, k.shape[2]),
                               layer=0, sm_scale=0.2, hkv=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pick_sblk():
    assert fd.pick_sblk(528, 32, 128) == 176
    assert fd.pick_sblk(512, 32, 128) == 256
    assert fd.pick_sblk(128, 32, 128) == 128
    assert fd.pick_sblk(6, 32, 128) == 6          # single short block
    assert fd.pick_sblk(523, 32, 128) is None     # prime > cap: fall back
    # huge head counts shrink the cap, never exceed the budget
    sblk = fd.pick_sblk(4096, 32, 128)
    assert sblk is not None and sblk * 32 * 128 * 2 <= 2 * 1024 * 1024


class _Shim:
    def __init__(self, **kw):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ge_fd", "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        self.params, self.cfg = mod._tiny_quantized_llama(**kw)
        self.backend, self.dtype = "auto", jnp.float32


@pytest.fixture(autouse=True)
def _restore_flag():
    yield
    arch.FLASH_DECODE = "1"
    jax.clear_caches()


@pytest.mark.parametrize("temperature", [0.0, 0.8])
def test_generate_token_equality(rng, temperature):
    model = _Shim()
    prompts = [rng.integers(0, 255, size=n) for n in (5, 9)]  # ragged: left pad
    kw = dict(max_new_tokens=12, temperature=temperature, seed=3,
              eos_token_id=None)
    arch.FLASH_DECODE = "0"
    jax.clear_caches()
    want = generation.generate(model, prompts, **kw)
    arch.FLASH_DECODE = "interpret"
    jax.clear_caches()
    calls = []
    orig = fd.flash_decode
    fd.flash_decode = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        got = generation.generate(model, prompts, **kw)
    finally:
        fd.flash_decode = orig
    assert calls, "flash-decode kernel path never fired"
    np.testing.assert_array_equal(got, want)


def test_beam_token_equality(rng):
    model = _Shim()
    prompts = [rng.integers(0, 255, size=n) for n in (4, 7)]
    kw = dict(max_new_tokens=10, num_beams=3, eos_token_id=7)
    generation.BEAM_PAGED = "never"   # exercise the contiguous beam path
    try:
        arch.FLASH_DECODE = "0"
        jax.clear_caches()
        want = generation.generate(model, prompts, **kw)
        arch.FLASH_DECODE = "interpret"
        jax.clear_caches()
        got = generation.generate(model, prompts, **kw)
    finally:
        generation.BEAM_PAGED = "auto"
    np.testing.assert_array_equal(got, want)
