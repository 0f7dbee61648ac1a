"""Gather-free (paged) beam search: token-exact vs the physical-reorder
path, correct routing/fallback, and int8 paged cache viability."""

import importlib.util

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.utils import generation  # noqa: E402


class Shim:
    def __init__(self, **kw):
        spec = importlib.util.spec_from_file_location("ge_bp", "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        kw.setdefault("hidden", 128)
        kw.setdefault("inter", 256)
        kw.setdefault("layers", 2)
        kw.setdefault("group_size", 32)
        self.params, self.cfg = mod._tiny_quantized_llama(**kw)
        self.backend, self.dtype = "xla", jnp.float32


@pytest.fixture(scope="module")
def model():
    return Shim()


@pytest.fixture(autouse=True)
def _restore_flag():
    yield
    generation.BEAM_PAGED = "auto"


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(num_beams=4, eos_token_id=7),
        dict(num_beams=3, eos_token_id=7, length_penalty=1.3),
        dict(num_beams=2, eos_token_id=None),
        dict(num_beams=4, eos_token_id=7, early_stopping=True,
             num_return_sequences=3),
        dict(num_beams=2, eos_token_id=7, min_new_tokens=4),
    ],
)
def test_paged_beam_matches_gather_beam(model, rng, kwargs):
    """The paged cache path must produce EXACTLY the physical-reorder
    path's tokens for every HF knob combination."""
    prompts = [
        rng.integers(1, model.cfg.vocab_size, size=(n,)).astype(np.int32)
        for n in (5, 9, 17)
    ]
    generation.BEAM_PAGED = "never"
    ref = generation.generate(model, prompts, max_new_tokens=12, **kwargs)
    generation.BEAM_PAGED = "always"
    got = generation.generate(model, prompts, max_new_tokens=12, **kwargs)
    np.testing.assert_array_equal(got, ref)


def test_paged_beam_long_generation_page_boundaries(model, rng):
    """max_new_tokens spanning several pages (page_size=16) exercises the
    copy-on-share + re-own logic across many boundaries."""
    prompts = [rng.integers(1, 256, size=(n,)).astype(np.int32) for n in (3, 30)]
    generation.BEAM_PAGED = "never"
    ref = generation.generate(model, prompts, max_new_tokens=40, num_beams=3,
                              eos_token_id=9)
    generation.BEAM_PAGED = "always"
    got = generation.generate(model, prompts, max_new_tokens=40, num_beams=3,
                              eos_token_id=9)
    np.testing.assert_array_equal(got, ref)


def test_paged_beam_kv_quant_runs(model, rng):
    """int8 paged cache: a different (per-slot, per-head D-wise) scheme than
    the contiguous int8 cache, so no token equality — but it must run and
    produce sane output."""
    generation.BEAM_PAGED = "always"
    prompt = rng.integers(1, 256, size=(6,)).astype(np.int32)
    out = generation.generate(model, prompt[None], max_new_tokens=6,
                              num_beams=3, kv_quant=True)
    assert out.shape == (1, 12)
    assert (out[:, 6:] >= 0).all() and (out[:, 6:] < model.cfg.vocab_size).all()


def test_paged_beam_routing_and_fallback(model):
    """auto routes supported models to the paged path; exotic configs fall
    back to the gather path instead of failing."""
    assert generation._beam_paged_ok(model)

    import dataclasses

    exotic = Shim()
    exotic.cfg = dataclasses.replace(exotic.cfg, attn_softcap=30.0)
    assert not generation._beam_paged_ok(exotic)


def test_paged_beam_real_kernel_interpret(model, rng):
    """The REAL mh paged-attention kernel (interpret mode) must produce the
    exact gather-path tokens — covers the kernel plumbing the CPU ref path
    skips (page-major pools, scale reshapes, window width)."""
    prompts = [rng.integers(1, model.cfg.vocab_size, size=(n,)).astype(np.int32)
               for n in (5, 9)]
    ids, mask = generation._prep_inputs(prompts, 0)
    ref = generation._generate_beam(
        model.params, jnp.asarray(ids), jnp.asarray(mask), model.cfg,
        10, 0, 7, 3, model.backend, model.dtype)
    got = generation._generate_beam_paged(
        model.params, jnp.asarray(ids), jnp.asarray(mask), model.cfg,
        10, 0, 7, 3, model.backend, model.dtype, use_kernel="interpret")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_paged_beam_real_kernel_interpret_int8(model, rng):
    """int8 paged cache through the real kernel (interpret) matches the
    jnp-ref paged path (same quantization scheme, same pools)."""
    prompts = [rng.integers(1, model.cfg.vocab_size, size=(7,)).astype(np.int32)]
    ids, mask = generation._prep_inputs(prompts, 0)
    args = (model.params, jnp.asarray(ids), jnp.asarray(mask), model.cfg,
            8, 0, 7, 2, model.backend, model.dtype)
    ref = generation._generate_beam_paged(*args, kv_quant=True, use_kernel=False)
    got = generation._generate_beam_paged(*args, kv_quant=True,
                                          use_kernel="interpret")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_paged_beam_phased_window_token_exact(model, rng):
    """Growing page-window phases must not change tokens (phased=False is
    the monolithic full-width scan), through both the ref path and the
    real kernel in interpret mode, with a prompt long enough to cross
    several page-window boundaries."""
    prompts = [rng.integers(1, model.cfg.vocab_size, size=(n,)).astype(np.int32)
               for n in (21, 9)]
    ids, mask = generation._prep_inputs(prompts, 0)
    args = (model.params, jnp.asarray(ids), jnp.asarray(mask), model.cfg,
            150, 0, 7, 3, model.backend, model.dtype)
    mono = generation._generate_beam_paged(*args, phased=False)
    ph = generation._generate_beam_paged(*args, phased=True)
    np.testing.assert_array_equal(np.asarray(ph), np.asarray(mono))
    ph_k = generation._generate_beam_paged(*args, phased=True,
                                           use_kernel="interpret")
    np.testing.assert_array_equal(np.asarray(ph_k), np.asarray(mono))


def test_beam_paged_page_aligned_prompt(model, rng):
    """Prompt length an exact page multiple: the boundary page is empty and
    the (clamped) copy-on-share must not corrupt anything; paged == plain."""
    prompt = rng.integers(0, model.cfg.vocab_size, size=(1, 16)).astype(np.int32)
    generation.BEAM_PAGED = "never"
    want = generation.generate(model, prompt, max_new_tokens=7,
                               num_beams=3, eos_token_id=1)
    generation.BEAM_PAGED = "always"
    got = generation.generate(model, prompt, max_new_tokens=7,
                              num_beams=3, eos_token_id=1)
    np.testing.assert_array_equal(got, want)
