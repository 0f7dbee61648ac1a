"""kb32 layout (i32-loaded 4-bit decode, per-1024-row-SUPERBLOCK
quarter-split): the default runtime layout for 3/4-bit checkpoints with
K >= 1024 and gs | 256. Same masked-word decode as ki32, but each group is
a direct static slice of one decoded quarter — no per-group sublane concat
(measured 14.9 vs 15.7 us at 4096^2 g128 decode on v5e). Interpret mode
runs the REAL kernel on CPU."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.ops import packing, quantlinear  # noqa: E402
from autogptq_tpu.ops.pallas import gemm  # noqa: E402


def _make_ql(rng, k, n, gs, bits=4, desc_act=False, layout=None):
    iw = rng.integers(0, 2 ** bits, size=(k, n)).astype(np.uint32)
    g = k // gs if gs != -1 else 1
    scales = (rng.random((g, n)) * 0.05 + 0.01).astype(np.float16)
    zeros = rng.integers(1, 2 ** bits, size=(g, n)).astype(np.int64)
    g_idx = (np.arange(k) // (gs if gs != -1 else k)).astype(np.int32)
    if desc_act:
        g_idx = rng.permutation(g_idx)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, bits)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, bits)),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray(g_idx),
        bias=None,
        bits=bits, group_size=gs, in_features=k, out_features=n,
    )
    return quantlinear.from_packed(packed, layout=layout)


def test_from_packed_selects_kb32(rng):
    ql = _make_ql(rng, 1024, 128, 128)
    assert ql.layout == "kb32"
    assert ql.wp.shape == (128, 128) and ql.wp.dtype == jnp.int32
    assert ql.scales.shape == (8, 1, 128)
    # every gs | 256 picks kb32 once K >= 1024
    for gs in (32, 64, 256):
        assert _make_ql(rng, 1024, 128, gs).layout == "kb32"
    # gs = 96 does not divide 256 -> ki32
    assert _make_ql(rng, 1152, 128, 96).layout == "ki32"
    # K < 1024 -> ki32
    assert _make_ql(rng, 256, 128, 64).layout == "ki32"
    # K = 1152: pad to 2048 would waste 78% -> ki32
    assert _make_ql(rng, 1152, 128, 128).layout == "ki32"


def test_kb32_pack_matches_ki32_at_superblock(rng):
    """kb32 words ARE the ki32 pack at granularity 1024."""
    w = rng.integers(0, 16, size=(2048, 128)).astype(np.uint32)
    wp = quantlinear._ki32_pack(w, 1024)
    np.testing.assert_array_equal(quantlinear.ki32_unpack_np(wp, 1024), w)


@pytest.mark.parametrize("bits", [3, 4])
@pytest.mark.parametrize("gs", [64, 128, 256])
@pytest.mark.parametrize("m", [1, 64])       # decode + prefill regimes
def test_kb32_kernel_matches_xla(rng, bits, gs, m):
    ql = _make_ql(rng, 1024, 128, gs, bits=bits)
    assert ql.layout == "kb32"
    x = (rng.standard_normal((m, 1024)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    got = gemm.matmul_pallas(jnp.asarray(x), ql, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_kb32_kernel_desc_act(rng):
    ql = _make_ql(rng, 1024, 128, 128, desc_act=True)
    assert ql.layout == "kb32" and ql.kperm is not None
    x = (rng.standard_normal((1, 1024)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    got = gemm.matmul_pallas(jnp.asarray(x), ql, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_kb32_padded_k(rng):
    """K = 2944 pads to 3072 (pad 128 <= K/8) with zero-scale groups."""
    ql = _make_ql(rng, 2944, 128, 128)
    assert ql.layout == "kb32"
    assert ql.wp.shape[0] * 8 == 3072
    x = (rng.standard_normal((2, 2944)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    got = gemm.matmul_pallas(jnp.asarray(x), ql, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_kb32_dequant_matches_reference_unpack(rng):
    k, n, gs = 1024, 128, 128
    iw = rng.integers(0, 16, size=(k, n)).astype(np.uint32)
    g = k // gs
    scales = (rng.random((g, n)) * 0.05 + 0.01).astype(np.float16)
    zeros = rng.integers(1, 16, size=(g, n)).astype(np.int64)
    g_idx = (np.arange(k) // gs).astype(np.int32)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, 4)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, 4)),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray(g_idx),
        bias=None,
        bits=4, group_size=gs, in_features=k, out_features=n,
    )
    ql = quantlinear.from_packed(packed)
    assert ql.layout == "kb32"
    w = np.asarray(quantlinear.dequantize_xla(ql, jnp.float32))[:k, :n]
    expect = (iw.astype(np.float32) - zeros[g_idx].astype(np.float32)) \
        * scales[g_idx].astype(np.float32)
    np.testing.assert_allclose(w, expect, rtol=1e-5, atol=1e-5)


def test_kb32_vjp_matches_xla_grad(rng):
    """The fused transpose kernel backs the custom VJP for kb32 too."""
    ql = _make_ql(rng, 1024, 128, 128)
    assert ql.layout == "kb32"
    x = jnp.asarray(rng.standard_normal((4, 1024)) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)

    def f(backend):
        return jax.grad(
            lambda xx: jnp.sum(quantlinear.matmul(xx, ql, backend=backend) * cot)
        )(x)

    ref = f("xla")
    got = f("pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_kb32_concat_split_roundtrip(rng):
    a = _make_ql(rng, 1024, 128, 128)
    b = _make_ql(rng, 1024, 256, 128)
    fused = quantlinear.concat_qls([a, b])
    assert fused.layout == "kb32" and fused.out_features == 384
    x = jnp.asarray(rng.standard_normal((2, 1024)) * 0.1, jnp.float32)
    ya = quantlinear.matmul_xla(x, a)
    yb = quantlinear.matmul_xla(x, b)
    yf = quantlinear.matmul_xla(x, fused)
    np.testing.assert_allclose(np.asarray(yf),
                               np.concatenate([ya, yb], -1), rtol=1e-4, atol=1e-5)
    back = quantlinear.split_qls(fused, [128, 256])
    np.testing.assert_allclose(np.asarray(quantlinear.matmul_xla(x, back[0])),
                               np.asarray(ya), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(quantlinear.matmul_xla(x, back[1])),
                               np.asarray(yb), rtol=1e-4, atol=1e-5)


def test_kb32_native_matches_numpy_pack(rng):
    """Fused C++ repack (ki32 entry at granularity 1024) == NumPy pack."""
    from autogptq_tpu.ops import native
    if not native.available():
        pytest.skip("native packlib not built")
    k, n, gs = 1024, 128, 128
    iw = rng.integers(0, 16, size=(k, n)).astype(np.uint32)
    qweight = packing.pack_qweight(iw, 4)
    wp = native.repack_ki32(np.asarray(qweight), None, k, k, n, n, 1024)
    np.testing.assert_array_equal(wp, quantlinear._ki32_pack(iw, 1024))


def test_phased_decode_matches_monolithic(rng):
    """Growing-window decode (generation._window_phases): the phase plan
    covers every step with a window large enough for its write slot, and
    phased vs monolithic generate produce the same tokens."""
    import transformers

    from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig
    from autogptq_tpu.utils import generation

    for t, mx, total in ((16, 512, 528), (3, 5, 8), (100, 300, 400), (1, 1, 2)):
        phases = generation._window_phases(t, mx, total)
        covered = 1
        for s0, s1, w in phases:
            assert s0 == covered and s1 > s0
            assert w >= t + s1 or w == total
            assert w <= total
            covered = s1
        assert covered == max(1, mx)

    import torch

    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        tie_word_embeddings=False,
    )
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        transformers.LlamaForCausalLM(cfg).save_pretrained(
            td + "/fp", safe_serialization=True)
        qc = BaseQuantizeConfig(bits=4, group_size=32, desc_act=False)
        m = AutoGPTQForCausalLM.from_pretrained(
            td + "/fp", quantize_config=qc, dtype=jnp.float32)
        m.quantize([
            {"input_ids": rng.integers(0, 256, size=(16,))} for _ in range(2)
        ])
    prompt = rng.integers(0, 256, size=(2, 5)).astype(np.int32)
    # 200 new tokens from a 5-token prompt -> multiple phases (128, 205)
    a = generation.generate(m, prompt, max_new_tokens=200, phased=True)
    b = generation.generate(m, prompt, max_new_tokens=200, phased=False)
    np.testing.assert_array_equal(a, b)
    # sampled path, fixed seed
    a = generation.generate(m, prompt, max_new_tokens=150, temperature=0.8,
                            seed=3, phased=True)
    b = generation.generate(m, prompt, max_new_tokens=150, temperature=0.8,
                            seed=3, phased=False)
    np.testing.assert_array_equal(a, b)
    # int8 KV cache path slices the scale planes too
    a = generation.generate(m, prompt, max_new_tokens=150, kv_quant=True,
                            phased=True)
    b = generation.generate(m, prompt, max_new_tokens=150, kv_quant=True,
                            phased=False)
    np.testing.assert_array_equal(a, b)


# -- kb32l: tile-contiguous (linearized) storage, opt-in --------------------


def _make_both(rng, k, n, gs, bits=4, desc_act=False):
    """Same packed checkpoint -> (kb32 node, kb32l node)."""
    iw = rng.integers(0, 2 ** bits, size=(k, n)).astype(np.uint32)
    g = k // gs
    scales = (rng.random((g, n)) * 0.05 + 0.01).astype(np.float16)
    zeros = rng.integers(1, 2 ** bits, size=(g, n)).astype(np.int64)
    g_idx = (np.arange(k) // gs).astype(np.int32)
    if desc_act:
        g_idx = rng.permutation(g_idx)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, bits)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, bits)),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray(g_idx),
        bias=None,
        bits=bits, group_size=gs, in_features=k, out_features=n,
    )
    return (quantlinear.from_packed(packed, layout="kb32"),
            quantlinear.from_packed(packed, layout="kb32l"))


@pytest.mark.parametrize("k,n,gs", [(1024, 128, 128), (2048, 1024, 64),
                                    (1024, 1312, 256)])
@pytest.mark.parametrize("m", [1, 64])
def test_kb32l_matches_kb32(rng, k, n, gs, m):
    """The linearized layout must agree with kb32 (independent path) via
    BOTH the XLA delinearize fallback and the interpret-mode kernel —
    including non-1024-multiple N (padded columns carry zero scales)."""
    ql, qll = _make_both(rng, k, n, gs)
    assert qll.layout == "kb32l" and qll.wp.ndim == 3
    assert qll.wp.shape[1:] == (128, 1024) and qll.n_pad % 1024 == 0
    x = (rng.standard_normal((m, k)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    via_xla = quantlinear.matmul_xla(jnp.asarray(x), qll)
    np.testing.assert_allclose(np.asarray(via_xla), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    got = gemm.matmul_pallas(jnp.asarray(x), qll, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_kb32l_desc_act_and_grad(rng):
    ql, qll = _make_both(rng, 1024, 256, 128, desc_act=True)
    assert qll.kperm is not None
    x = (rng.standard_normal((2, 1024)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    got = gemm.matmul_pallas(jnp.asarray(x), qll, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)
    # backward falls to the XLA dequant path and must match kb32's
    f = lambda q: lambda xx: quantlinear.matmul(xx, q, backend="xla").sum()
    g_ref = jax.grad(f(ql))(jnp.asarray(x))
    g_lin = jax.grad(f(qll))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_lin), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_kb32l_rejects_unsupported_shapes(rng):
    with pytest.raises(ValueError, match="kb32l"):
        _make_ql(rng, 1152, 128, 96, layout="kb32l")  # gs does not divide 256


def test_kb32l_numpy_fallback_matches_native(rng, monkeypatch):
    """from_packed without the native library (NumPy _ki32_pack path) must
    produce identical kb32l words."""
    from autogptq_tpu.ops import native as native_mod

    # same rng stream per build so both see identical packed inputs
    r1, r2 = (np.random.default_rng(7) for _ in range(2))
    monkeypatch.setattr(native_mod, "available", lambda: False)
    a = _make_ql(r1, 1024, 256, 128, layout="kb32l")
    monkeypatch.undo()
    b = _make_ql(r2, 1024, 256, 128, layout="kb32l")
    np.testing.assert_array_equal(np.asarray(a.wp), np.asarray(b.wp))


@pytest.mark.parametrize("k,n,gs,nbuf", [(1024, 128, 128, 3), (2048, 1024, 64, 2),
                                         (4096, 1312, 256, 4), (2048, 128, 128, 8)])
@pytest.mark.parametrize("m", [1, 8])
def test_kb32l_manual_pipeline_matches(rng, monkeypatch, k, n, gs, nbuf, m):
    """The manual nbuf-deep DMA-pipelined decode launcher
    (AUTOGPTQ_TPU_KB32L_MANUAL=<nbuf>) must agree with the standard kb32l
    kernel and the XLA reference — including nbuf > nbk (prologue clamps),
    non-1024-multiple N, and every decode batch size."""
    ql, qll = _make_both(rng, k, n, gs)
    x = (rng.standard_normal((m, k)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    monkeypatch.setenv("AUTOGPTQ_TPU_KB32L_MANUAL", str(nbuf))
    got = gemm.matmul_pallas(jnp.asarray(x), qll, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_kb32l_manual_pipeline_prefill_falls_through(rng, monkeypatch):
    """M >= 32 stays on the standard (prefill-regime) kb32l kernel even
    with the manual knob set."""
    ql, qll = _make_both(rng, 1024, 128, 128)
    x = (rng.standard_normal((64, 1024)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    monkeypatch.setenv("AUTOGPTQ_TPU_KB32L_MANUAL", "3")
    got = gemm.matmul_pallas(jnp.asarray(x), qll, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


@pytest.mark.parametrize("val", ["0", "off", ""])
def test_kb32l_manual_knob_disabled_values(rng, monkeypatch, val):
    """AUTOGPTQ_TPU_KB32L_MANUAL=0/off/'' must DISABLE the manual pipeline
    (and never crash) — '0' was truthy and non-numeric values raised."""
    ql, qll = _make_both(rng, 1024, 128, 128)
    x = (rng.standard_normal((1, 1024)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    monkeypatch.setenv("AUTOGPTQ_TPU_KB32L_MANUAL", val)
    got = gemm.matmul_pallas(jnp.asarray(x), qll, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)
