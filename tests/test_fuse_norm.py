"""Fused norm+matmul decode path (AUTOGPTQ_TPU_FUSE_NORM): the RMS norm
feeding a quantized linear runs inside the Pallas kernel. Checks
kernel-vs-unfused equality (interpret mode) and end-to-end token equality.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.models import arch  # noqa: E402
from autogptq_tpu.ops import packing, quantlinear  # noqa: E402
from autogptq_tpu.ops.pallas import gemm  # noqa: E402
from autogptq_tpu.utils import generation  # noqa: E402


def _make_ql(rng, k, n, bits=4, group_size=128):
    g = k // group_size
    scales = (rng.random((g, n)) * 0.02 + 0.005).astype(np.float16)
    zeros = rng.integers(1, 2**bits, size=(g, n)).astype(np.int64)
    iw = rng.integers(0, 2**bits, size=(k, n)).astype(np.uint32)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, bits)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, bits)),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray((np.arange(k) // group_size).astype(np.int32)),
        bias=None,
        bits=bits, group_size=group_size, in_features=k, out_features=n,
    )
    return quantlinear.from_packed(packed)


@pytest.mark.parametrize(
    "k, gs, want_layout, plus_one",
    [
        (1024, 128, "kb32", False),   # kb32 superblock layout
        (1024, 128, "kb32", True),    # gemma-style (1 + w)
        (256, 64, "ki32", False),     # ki32 per-group layout
    ],
)
def test_prenorm_kernel_matches_unfused(rng, k, gs, want_layout, plus_one):
    ql = _make_ql(rng, k, 2 * k, group_size=gs)
    assert ql.layout == want_layout
    x = jnp.asarray(rng.standard_normal((2, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k,)) * 0.1 + 1.0, jnp.float32)
    eps = 1e-6
    fused = gemm.matmul_pallas(
        x, ql, interpret=True, prenorm=(w, eps, plus_one))
    unfused = gemm.matmul_pallas(
        gemm.rms_apply(x, w, eps, plus_one), ql, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(unfused), rtol=2e-5, atol=2e-5)


def test_prenorm_falls_back_for_prefill_and_kperm(rng):
    ql = _make_ql(rng, 1024, 512)
    w = jnp.ones((1024,), jnp.float32)
    # prefill regime (m >= 32): must not crash, must equal unfused
    x = jnp.asarray(rng.standard_normal((64, 1024)), jnp.float32)
    fused = gemm.matmul_pallas(x, ql, interpret=True, prenorm=(w, 1e-6, False))
    unfused = gemm.matmul_pallas(
        gemm.rms_apply(x, w, 1e-6, False), ql, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               rtol=2e-5, atol=2e-5)


def test_rms_apply_matches_arch_rms_norm(rng):
    x = jnp.asarray(rng.standard_normal((3, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256,)), jnp.float32)
    got = gemm.rms_apply(x, w, 1e-5, False)
    want = arch.rms_norm(x, w, 1e-5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    got1 = gemm.rms_apply(x, w, 1e-5, True)
    want1 = arch.rms_norm(x, w, 1e-5, plus_one=True)
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(want1))


class _Shim:
    def __init__(self, **kw):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ge_fn", "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        self.params, self.cfg = mod._tiny_quantized_llama(**kw)
        self.backend, self.dtype = "pallas_interpret", jnp.float32


@pytest.fixture(autouse=True)
def _restore_flags():
    yield
    arch.FUSE_NORM = "0"
    arch.FLASH_DECODE = "1"
    jax.clear_caches()


def test_generate_token_equality(rng):
    model = _Shim(layers=2)
    prompts = [rng.integers(0, 255, size=n) for n in (4, 6)]
    kw = dict(max_new_tokens=6, eos_token_id=None)
    arch.FUSE_NORM = "0"
    jax.clear_caches()
    want = generation.generate(model, prompts, **kw)
    arch.FUSE_NORM = "1"
    jax.clear_caches()
    calls = []
    orig = quantlinear.matmul

    def spy(x, ql, backend="auto", prenorm=None):
        if prenorm is not None:
            calls.append(1)
        return orig(x, ql, backend, prenorm)

    quantlinear.matmul = spy
    arch.qlin.matmul = spy
    try:
        got = generation.generate(model, prompts, **kw)
    finally:
        quantlinear.matmul = orig
        arch.qlin.matmul = orig
    assert calls, "fused-norm path never fired"
    np.testing.assert_array_equal(got, want)


def test_beam_paged_token_equality(rng):
    model = _Shim(layers=2)
    prompts = [rng.integers(0, 255, size=n) for n in (4, 7)]
    kw = dict(max_new_tokens=6, num_beams=2, eos_token_id=7)
    generation.BEAM_PAGED = "always"
    try:
        arch.FUSE_NORM = "0"
        jax.clear_caches()
        want = generation.generate(model, prompts, **kw)
        arch.FUSE_NORM = "1"
        jax.clear_caches()
        got = generation.generate(model, prompts, **kw)
    finally:
        generation.BEAM_PAGED = "auto"
    np.testing.assert_array_equal(got, want)
