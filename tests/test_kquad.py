"""2-bit K-quad layout + kernel (VERDICT r1 item 7): true 2 bits/weight with
the kpair-class bitcast decode, replacing the planar shift/mask path.
Interpret mode runs the REAL kernel on CPU; parity vs the XLA dequant path
pins the per-group half-split layout and both (decode / prefill) regimes."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.ops import packing, quantlinear  # noqa: E402
from autogptq_tpu.ops.pallas import gemm  # noqa: E402


def test_kquad_pack_roundtrip(rng):
    for gs, k, n in ((32, 128, 128), (64, 256, 256), (8, 64, 128)):
        w = rng.integers(0, 4, size=(k, n)).astype(np.uint8)
        wp = quantlinear._kquad_pack(w, gs)
        assert wp.shape == (k // 4, n)
        np.testing.assert_array_equal(quantlinear.kquad_unpack_np(wp, gs), w)


def _make_ql(rng, k, n, gs, desc_act=False):
    iw = rng.integers(0, 4, size=(k, n)).astype(np.uint32)
    g = k // gs if gs != -1 else 1
    scales = (rng.random((g, n)) * 0.05 + 0.01).astype(np.float16)
    zeros = rng.integers(1, 4, size=(g, n)).astype(np.int64)
    g_idx = (np.arange(k) // (gs if gs != -1 else k)).astype(np.int32)
    if desc_act:
        g_idx = rng.permutation(g_idx)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, 2)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, 2)),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray(g_idx),
        bias=None,
        bits=2, group_size=gs, in_features=k, out_features=n,
    )
    return quantlinear.from_packed(packed)


def test_from_packed_selects_kquad(rng):
    ql = _make_ql(rng, 128, 128, 32)
    assert ql.layout == "kquad"
    assert ql.wp.shape == (32, 128)          # K/4 byte rows
    assert ql.scales.shape == (4, 1, 128)    # planes = 1


@pytest.mark.parametrize("gs", [32, 64])
@pytest.mark.parametrize("m", [1, 64])       # decode + prefill regimes
def test_kquad_kernel_matches_xla(rng, gs, m):
    ql = _make_ql(rng, 256, 128, gs)
    assert ql.layout == "kquad"
    x = (rng.standard_normal((m, 256)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    got = gemm.matmul_pallas(jnp.asarray(x), ql, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-3)


def test_kquad_kernel_desc_act(rng):
    ql = _make_ql(rng, 128, 128, 32, desc_act=True)
    assert ql.layout == "kquad" and ql.kperm is not None
    x = (rng.standard_normal((1, 128)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    got = gemm.matmul_pallas(jnp.asarray(x), ql, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-3)


def test_kquad_dequant_matches_reference_unpack(rng):
    """dequantize_xla over the kquad layout equals the reference-format
    dequant math (packing.dequantize on the original packed tensors)."""
    k, n, gs = 128, 128, 32
    iw = rng.integers(0, 4, size=(k, n)).astype(np.uint32)
    g = k // gs
    scales = (rng.random((g, n)) * 0.05 + 0.01).astype(np.float16)
    zeros = rng.integers(1, 4, size=(g, n)).astype(np.int64)
    g_idx = (np.arange(k) // gs).astype(np.int32)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, 2)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, 2)),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray(g_idx),
        bias=None,
        bits=2, group_size=gs, in_features=k, out_features=n,
    )
    ql = quantlinear.from_packed(packed)
    assert ql.layout == "kquad"
    w = np.asarray(quantlinear.dequantize_xla(ql, jnp.float32))[:k, :n]
    expect = (iw.astype(np.float32) - zeros[g_idx].astype(np.float32)) \
        * scales[g_idx].astype(np.float32)
    np.testing.assert_allclose(w, expect, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# koct (8-bit byte-per-weight, kpair kernel over (x, 128x) virtual rows)
# ---------------------------------------------------------------------------


def _make_ql8(rng, k, n, gs, desc_act=False):
    iw = rng.integers(0, 256, size=(k, n)).astype(np.uint32)
    g = k // gs if gs != -1 else 1
    scales = (rng.random((g, n)) * 0.02 + 0.004).astype(np.float16)
    zeros = rng.integers(1, 256, size=(g, n)).astype(np.int64)
    g_idx = (np.arange(k) // (gs if gs != -1 else k)).astype(np.int32)
    if desc_act:
        g_idx = rng.permutation(g_idx)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, 8)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, 8)),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray(g_idx),
        bias=None,
        bits=8, group_size=gs, in_features=k, out_features=n,
    )
    # koct is opt-in: planar measured faster for 8-bit on v5e (532 vs 438
    # GB/s — the virtual-row trick doubles dot width per weight)
    return quantlinear.from_packed(packed, layout="koct")


def test_koct_opt_in_layout(rng):
    ql = _make_ql8(rng, 128, 128, 32)
    assert ql.layout == "koct"
    assert ql.wp.shape == (128, 128) and ql.wp.dtype == jnp.uint8
    assert ql.scales.shape == (4, 1, 128)
    # default for 8-bit stays planar
    iw = rng.integers(0, 256, size=(128, 128)).astype(np.uint32)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, 8)),
        qzeros=jnp.asarray(packing.pack_qzeros(
            rng.integers(1, 256, size=(4, 128)).astype(np.int64), 8)),
        scales=jnp.asarray((rng.random((4, 128)) * 0.02).astype(np.float16)),
        g_idx=jnp.asarray((np.arange(128) // 32).astype(np.int32)),
        bias=None, bits=8, group_size=32, in_features=128, out_features=128,
    )
    assert quantlinear.from_packed(packed).layout == "planar"


@pytest.mark.parametrize("gs", [32, 64])
@pytest.mark.parametrize("m", [1, 64])       # decode + prefill regimes
def test_koct_kernel_matches_xla(rng, gs, m):
    ql = _make_ql8(rng, 256, 128, gs)
    assert ql.layout == "koct"
    x = (rng.standard_normal((m, 256)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    got = gemm.matmul_pallas(jnp.asarray(x), ql, interpret=True)
    # 8-bit codes up to 255 with the z/129 trick: bf16 dot rounding class
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_koct_kernel_desc_act(rng):
    ql = _make_ql8(rng, 128, 128, 32, desc_act=True)
    assert ql.layout == "koct" and ql.kperm is not None
    x = (rng.standard_normal((1, 128)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    got = gemm.matmul_pallas(jnp.asarray(x), ql, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_koct_dequant_matches_reference_unpack(rng):
    k, n, gs = 128, 128, 32
    iw = rng.integers(0, 256, size=(k, n)).astype(np.uint32)
    g = k // gs
    scales = (rng.random((g, n)) * 0.02 + 0.004).astype(np.float16)
    zeros = rng.integers(1, 256, size=(g, n)).astype(np.int64)
    g_idx = (np.arange(k) // gs).astype(np.int32)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, 8)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, 8)),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray(g_idx),
        bias=None,
        bits=8, group_size=gs, in_features=k, out_features=n,
    )
    ql = quantlinear.from_packed(packed, layout="koct")
    assert ql.layout == "koct"
    w = np.asarray(quantlinear.dequantize_xla(ql, jnp.float32))[:k, :n]
    expect = (iw.astype(np.float32) - zeros[g_idx].astype(np.float32)) \
        * scales[g_idx].astype(np.float32)
    np.testing.assert_allclose(w, expect, rtol=1e-5, atol=1e-5)


def test_kquad_e2e_quantize_roundtrip(tmp_path, rng):
    """2-bit quantize -> save -> reload routes through kquad and still
    forwards correctly (XLA fallback on CPU; kernel parity pinned above)."""
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig
    from tests.test_models import save_tiny_llama

    save_tiny_llama(tmp_path / "fp")
    qc = BaseQuantizeConfig(bits=2, group_size=32, desc_act=False)
    model = AutoGPTQForCausalLM.from_pretrained(
        str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32
    )
    model.quantize([{"input_ids": rng.integers(0, 256, size=(16,))} for _ in range(2)])
    model.save_quantized(str(tmp_path / "q"))
    reloaded = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    for blk in reloaded.params["layers"]:
        assert blk["attn"]["q_proj"].layout == "kquad"
    ids = rng.integers(0, 256, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(reloaded.forward(ids)), np.asarray(model.forward(ids)),
        rtol=2e-3, atol=2e-3,
    )


# ---------------------------------------------------------------------------
# k2i32 (2-bit i32-loaded eighth-split — the fastest 2-bit decode)
# ---------------------------------------------------------------------------


def _make_ql2(rng, k, n, gs, desc_act=False):
    iw = rng.integers(0, 4, size=(k, n)).astype(np.uint32)
    g = k // gs if gs != -1 else 1
    scales = (rng.random((g, n)) * 0.05 + 0.01).astype(np.float16)
    zeros = rng.integers(1, 4, size=(g, n)).astype(np.int64)
    g_idx = (np.arange(k) // (gs if gs != -1 else k)).astype(np.int32)
    if desc_act:
        g_idx = rng.permutation(g_idx)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, 2)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, 2)),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray(g_idx),
        bias=None,
        bits=2, group_size=gs, in_features=k, out_features=n,
    )
    return quantlinear.from_packed(packed)


def test_k2i32_pack_roundtrip(rng):
    for gs, k in ((128, 256), (256, 512)):
        w = rng.integers(0, 4, size=(k, 128)).astype(np.uint32)
        wp = quantlinear._k2i32_pack(w, gs)
        assert wp.shape == (k // 16, 128) and wp.dtype == np.int32
        np.testing.assert_array_equal(quantlinear.k2i32_unpack_np(wp, gs), w)


def test_from_packed_selects_k2i32(rng):
    ql = _make_ql2(rng, 256, 128, 128)
    assert ql.layout == "k2i32"
    assert ql.wp.shape == (16, 128) and ql.wp.dtype == jnp.int32
    # gs below 128 stays kquad (eighths must be >= 16 sublanes)
    assert _make_ql2(rng, 256, 128, 64).layout == "kquad"
    # gs=-1 with k % 128 == 0 -> single-group k2i32
    assert _make_ql2(rng, 256, 128, -1).layout == "k2i32"


@pytest.mark.parametrize("gs", [128, -1])
@pytest.mark.parametrize("m", [1, 64])
def test_k2i32_kernel_matches_xla(rng, gs, m):
    ql = _make_ql2(rng, 256, 128, gs)
    assert ql.layout == "k2i32"
    x = (rng.standard_normal((m, 256)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    got = gemm.matmul_pallas(jnp.asarray(x), ql, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_k2i32_kernel_desc_act(rng):
    ql = _make_ql2(rng, 256, 128, 128, desc_act=True)
    assert ql.layout == "k2i32" and ql.kperm is not None
    x = (rng.standard_normal((1, 256)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    got = gemm.matmul_pallas(jnp.asarray(x), ql, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_k2i32_dequant_matches_reference_unpack(rng):
    k, n, gs = 256, 128, 128
    iw = rng.integers(0, 4, size=(k, n)).astype(np.uint32)
    g = k // gs
    scales = (rng.random((g, n)) * 0.05 + 0.01).astype(np.float16)
    zeros = rng.integers(1, 4, size=(g, n)).astype(np.int64)
    g_idx = (np.arange(k) // gs).astype(np.int32)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, 2)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, 2)),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray(g_idx),
        bias=None,
        bits=2, group_size=gs, in_features=k, out_features=n,
    )
    ql = quantlinear.from_packed(packed)
    assert ql.layout == "k2i32"
    w = np.asarray(quantlinear.dequantize_xla(ql, jnp.float32))[:k, :n]
    expect = (iw.astype(np.float32) - zeros[g_idx].astype(np.float32)) \
        * scales[g_idx].astype(np.float32)
    np.testing.assert_allclose(w, expect, rtol=1e-5, atol=1e-5)


def test_k2i32_e2e_quantize_roundtrip(tmp_path, rng):
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    import torch
    import transformers

    from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig

    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        tie_word_embeddings=False,
    )
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        tmp_path / "fp", safe_serialization=True)
    qc = BaseQuantizeConfig(bits=2, group_size=128, desc_act=False)
    model = AutoGPTQForCausalLM.from_pretrained(
        str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    model.quantize([{"input_ids": rng.integers(0, 256, size=(16,))} for _ in range(2)])
    model.save_quantized(str(tmp_path / "q"))
    reloaded = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    assert reloaded.params["layers"][0]["attn"]["q_proj"].layout == "k2i32"
    ids = rng.integers(0, 256, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(reloaded.forward(ids)), np.asarray(model.forward(ids)),
        rtol=2e-3, atol=2e-3,
    )
