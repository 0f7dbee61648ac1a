"""ki32 layout (i32-loaded 4-bit decode, per-group quarter-split): the
default runtime layout for 3/4-bit checkpoints with gs % 64 == 0 — measured
~19% faster decode than the byte-loaded kpair path on v5e. Interpret mode
runs the REAL kernel on CPU."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.ops import packing, quantlinear  # noqa: E402
from autogptq_tpu.ops.pallas import gemm  # noqa: E402


def test_ki32_pack_roundtrip(rng):
    for gs, k, n in ((64, 256, 128), (128, 256, 256), (256, 256, 128)):
        w = rng.integers(0, 16, size=(k, n)).astype(np.uint32)
        wp = quantlinear._ki32_pack(w, gs)
        assert wp.shape == (k // 8, n) and wp.dtype == np.int32
        np.testing.assert_array_equal(quantlinear.ki32_unpack_np(wp, gs), w)


def _make_ql(rng, k, n, gs, bits=4, desc_act=False):
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
    return quantlinear.from_packed(packed)


def test_from_packed_selects_ki32(rng):
    ql = _make_ql(rng, 256, 128, 64)
    assert ql.layout == "ki32"
    assert ql.wp.shape == (32, 128) and ql.wp.dtype == jnp.int32
    assert ql.scales.shape == (4, 1, 128)
    # gs=32 also selects ki32 (hardware-validated); gs=24 stays kpair
    assert _make_ql(rng, 256, 128, 32).layout == "ki32"
    # gs=-1 with k % 64 == 0 -> single-group ki32
    assert _make_ql(rng, 256, 128, -1).layout == "ki32"


@pytest.mark.parametrize("bits", [3, 4])
@pytest.mark.parametrize("gs", [32, 64, 128, -1])
@pytest.mark.parametrize("m", [1, 64])       # decode + prefill regimes
def test_ki32_kernel_matches_xla(rng, bits, gs, m):
    ql = _make_ql(rng, 256, 128, gs, bits=bits)
    assert ql.layout == "ki32"
    x = (rng.standard_normal((m, 256)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    got = gemm.matmul_pallas(jnp.asarray(x), ql, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_ki32_kernel_desc_act(rng):
    ql = _make_ql(rng, 256, 128, 64, desc_act=True)
    assert ql.layout == "ki32" and ql.kperm is not None
    x = (rng.standard_normal((1, 256)) * 0.1).astype(np.float32)
    ref = quantlinear.matmul_xla(jnp.asarray(x), ql)
    got = gemm.matmul_pallas(jnp.asarray(x), ql, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_ki32_dequant_matches_reference_unpack(rng):
    k, n, gs = 256, 128, 64
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
    assert ql.layout == "ki32"
    w = np.asarray(quantlinear.dequantize_xla(ql, jnp.float32))[:k, :n]
    expect = (iw.astype(np.float32) - zeros[g_idx].astype(np.float32)) \
        * scales[g_idx].astype(np.float32)
    np.testing.assert_allclose(w, expect, rtol=1e-5, atol=1e-5)


def test_ki32_vjp_matches_xla_grad(rng):
    """The fused transpose kernel backs the custom VJP for ki32 too."""
    ql = _make_ql(rng, 256, 128, 64)
    x = jnp.asarray(rng.standard_normal((4, 256)) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)

    def f(backend):
        return jax.grad(
            lambda xx: jnp.sum(quantlinear.matmul(xx, ql, backend=backend) * cot)
        )(x)

    ref = f("xla")
    got = f("pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_ki32_concat_split_roundtrip(rng):
    a = _make_ql(rng, 256, 128, 64)
    b = _make_ql(rng, 256, 256, 64)
    fused = quantlinear.concat_qls([a, b])
    assert fused.layout == "ki32" and fused.out_features == 384
    x = jnp.asarray(rng.standard_normal((2, 256)) * 0.1, jnp.float32)
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


def test_ki32_e2e_quantize_roundtrip(tmp_path, rng):
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    import transformers
    import torch

    from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig

    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        tie_word_embeddings=False,
    )
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        tmp_path / "fp", safe_serialization=True)
    qc = BaseQuantizeConfig(bits=4, group_size=64, desc_act=False)
    model = AutoGPTQForCausalLM.from_pretrained(
        str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    model.quantize([{"input_ids": rng.integers(0, 256, size=(16,))} for _ in range(2)])
    model.save_quantized(str(tmp_path / "q"))
    reloaded = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    assert reloaded.params["layers"][0]["attn"]["q_proj"].layout == "ki32"
    ids = rng.integers(0, 256, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(reloaded.forward(ids)), np.asarray(model.forward(ids)),
        rtol=2e-3, atol=2e-3,
    )
