"""QuantLinear runtime layout + XLA fallback + Pallas kernel (interpret mode)
numerics tests, all validated against the NumPy golden dequantize path."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.ops import packing, quantlinear  # noqa: E402
from autogptq_tpu.ops.pallas import gemm  # noqa: E402

BITS = [2, 3, 4, 8]


def make_packed(rng, bits, k, n, group_size, desc_act=False, bias=False):
    gs = group_size if group_size != -1 else k
    g = -(-k // gs)
    scales = (rng.random((g, n)) * 0.05 + 0.01).astype(np.float16)
    zeros = rng.integers(1, 2**bits, size=(g, n)).astype(np.int64)
    if desc_act:
        g_idx = rng.permutation(np.repeat(np.arange(g), gs)[:k]).astype(np.int32)
        # keep uniform group sizes
    else:
        g_idx = (np.arange(k) // gs).astype(np.int32)
    iw = rng.integers(0, 2**bits, size=(k, n)).astype(np.uint32)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, bits)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, bits)),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray(g_idx),
        bias=jnp.asarray(rng.standard_normal(n).astype(np.float32)) if bias else None,
        bits=bits,
        group_size=group_size,
        in_features=k,
        out_features=n,
    )
    w_ref = packing.dequantize(
        np.asarray(packed.qweight), np.asarray(packed.qzeros), scales, g_idx, bits
    )  # [K, N] float32
    return packed, w_ref


@pytest.mark.parametrize("bits", BITS)
@pytest.mark.parametrize("group_size", [32, -1])
def test_runtime_layout_dequant(bits, group_size, rng):
    k, n = 64, 128
    packed, w_ref = make_packed(rng, bits, k, n, group_size)
    ql = quantlinear.from_packed(packed)
    w = np.asarray(quantlinear.dequantize_xla(ql, dtype=jnp.float32))
    np.testing.assert_allclose(w[:, :n], w_ref, rtol=1e-5, atol=1e-6)
    assert np.all(w[:, n:] == 0)  # padded columns dead


@pytest.mark.parametrize("bits", BITS)
def test_matmul_xla(bits, rng):
    k, n = 64, 96
    packed, w_ref = make_packed(rng, bits, k, n, 32, bias=True)
    ql = quantlinear.from_packed(packed)
    x = rng.standard_normal((3, 5, k)).astype(np.float32)
    y = np.asarray(quantlinear.matmul_xla(jnp.asarray(x), ql))
    expected = x @ w_ref + np.asarray(packed.bias)
    np.testing.assert_allclose(y, expected, rtol=2e-3, atol=2e-3)


def test_matmul_xla_desc_act(rng):
    k, n = 64, 96
    packed, w_ref = make_packed(rng, 4, k, n, 16, desc_act=True)
    ql = quantlinear.from_packed(packed)
    assert ql.kperm is not None
    x = rng.standard_normal((2, k)).astype(np.float32)
    y = np.asarray(quantlinear.matmul_xla(jnp.asarray(x), ql))
    np.testing.assert_allclose(y, x @ w_ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("bits", BITS)
@pytest.mark.parametrize("group_size", [64, 128, -1])
@pytest.mark.parametrize("m", [1, 9, 40])  # 40 hits the prefill regime (m >= 32)
def test_matmul_pallas_interpret(bits, group_size, m, rng):
    k, n = 128, 256
    packed, w_ref = make_packed(rng, bits, k, n, group_size)
    ql = quantlinear.from_packed(packed)
    x = rng.standard_normal((m, k)).astype(np.float32)
    y = np.asarray(
        gemm.matmul_pallas(jnp.asarray(x), ql, interpret=True, dot_dtype=jnp.float32)
    )
    np.testing.assert_allclose(y, x @ w_ref, rtol=2e-3, atol=2e-3)


def test_matmul_pallas_interpret_desc_act(rng):
    k, n = 128, 256
    packed, w_ref = make_packed(rng, 4, k, n, 32, desc_act=True)
    ql = quantlinear.from_packed(packed)
    x = rng.standard_normal((4, k)).astype(np.float32)
    y = np.asarray(
        gemm.matmul_pallas(jnp.asarray(x), ql, interpret=True, dot_dtype=jnp.float32)
    )
    np.testing.assert_allclose(y, x @ w_ref, rtol=2e-3, atol=2e-3)


def test_pack_from_solver_roundtrip(rng):
    """Solver output -> disk format -> runtime -> matmul consistency."""
    import jax.numpy as jnp

    from autogptq_tpu.quantization import GPTQConfig, gptq_quantize, hessian_init, hessian_update

    n, k, gs = 16, 64, 32
    w = rng.standard_normal((n, k)).astype(np.float32)
    x = rng.standard_normal((4, 8, k)).astype(np.float32)
    h, ns = hessian_init(k)
    h, ns = hessian_update(h, ns, jnp.asarray(x))
    cfg = GPTQConfig(bits=4, group_size=gs, sym=False)
    res = gptq_quantize(jnp.asarray(w), h, cfg)

    packed = quantlinear.pack_from_solver(
        np.asarray(res.qweight),
        np.asarray(res.scale),
        np.asarray(res.zero),
        np.asarray(res.g_idx),
        bits=4,
        group_size=gs,
    )
    ql = quantlinear.from_packed(packed)
    xt = rng.standard_normal((2, k)).astype(np.float32)
    y = np.asarray(quantlinear.matmul_xla(jnp.asarray(xt), ql))
    # fake-quantized weights (fp32) vs fp16-scale packed roundtrip
    expected = xt @ np.asarray(res.qweight).T
    np.testing.assert_allclose(y, expected, rtol=5e-3, atol=5e-3)


def test_fused_qkv_gateup_forward_parity(rng):
    """Static QKV/gate-up fusion (the reference's fused-module injection done
    as a load-time params transform) must not change the forward."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("ge_fuse", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    params, cfg = mod._tiny_quantized_llama(hidden=128, inter=256, layers=2, group_size=32)

    from autogptq_tpu.models import arch
    from autogptq_tpu.models.params import fuse_qkv_gateup

    fused = fuse_qkv_gateup(params)
    b0 = fused["layers"][0]
    assert "qkv_proj" in b0["attn"] and "q_proj" not in b0["attn"]
    assert "gateup_proj" in b0["mlp"] and "gate_proj" not in b0["mlp"]

    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)
    ref, _ = arch.forward(params, tokens, cfg, backend="xla", dtype=jnp.float32)
    got, _ = arch.forward(fused, tokens, cfg, backend="xla", dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
