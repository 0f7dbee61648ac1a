"""Custom VJP through the fused quantized matmul (VERDICT r1 item 3, the
reference Triton-v1 trainable role, triton_utils/kernels.py:248-339):
jax.grad through matmul(..., backend="pallas_interpret") must match the
gradient of the plain differentiable XLA dequant path."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.ops import packing, quantlinear  # noqa: E402


def _make_ql(rng, k, n, bits=4, group_size=32, desc_act=False):
    g = k // group_size
    scales = (rng.random((g, n)) * 0.02 + 0.005).astype(np.float16)
    zeros = rng.integers(1, 2 ** bits, size=(g, n)).astype(np.int64)
    g_idx = (np.arange(k) // group_size).astype(np.int32)
    if desc_act:
        g_idx = rng.permutation(g_idx)
    iw = rng.integers(0, 2 ** bits, size=(k, n)).astype(np.uint32)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, bits)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, bits)),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray(g_idx),
        bias=None,
        bits=bits, group_size=group_size, in_features=k, out_features=n,
    )
    return quantlinear.from_packed(packed)


def _ref_grad(x, ql, cot):
    """Gradient through the plain (non-custom-VJP) dequant+dot path."""
    def f(xx):
        return jnp.sum(quantlinear.matmul_xla(xx, ql) * cot)

    return jax.grad(f)(x)


@pytest.mark.parametrize("desc_act", [False, True])
def test_grad_pallas_interpret_matches_xla(rng, desc_act):
    k, n = 128, 256
    ql = _make_ql(rng, k, n, desc_act=desc_act)
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)

    ref = _ref_grad(x, ql, cot)

    def f(xx):
        return jnp.sum(quantlinear.matmul(xx, ql, backend="pallas_interpret") * cot)

    got = jax.grad(f)(x)
    # bf16 dot in the kernel vs f32 reference
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("desc_act", [False, True])
def test_grad_custom_vjp_xla_backend_exact(rng, desc_act):
    """The custom VJP's own XLA fallback (incl. the kperm scatter-add) must
    be numerically identical to plain autodiff."""
    k, n = 96, 200  # n not lane-aligned: exercises the pad-restore in bwd
    ql = _make_ql(rng, k, n, desc_act=desc_act)
    x = jnp.asarray(rng.standard_normal((3, k)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)

    ref = _ref_grad(x, ql, cot)

    def f(xx):
        return jnp.sum(quantlinear.matmul(xx, ql, backend="xla") * cot)

    got = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_grad_planar_8bit_fallback(rng):
    ql = _make_ql(rng, 64, 256, bits=8, group_size=32)
    x = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)

    def f(xx):
        return jnp.sum(quantlinear.matmul(xx, ql, backend="xla") ** 2)

    got = jax.grad(f)(x)
    assert np.isfinite(np.asarray(got)).all()


def test_lora_training_step_through_kernel(rng):
    """A LoRA-style adapter trains with the base matmul on the kernel path:
    grads flow to the adapter, loss decreases."""
    k, n = 128, 256
    ql = _make_ql(rng, k, n)
    x = jnp.asarray(rng.standard_normal((8, k)), jnp.float32)
    y_tgt = jnp.asarray(rng.standard_normal((8, n)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((k, 8)) * 0.1, jnp.float32)
    b = jnp.zeros((8, n), jnp.float32)

    def loss_fn(ab):
        a_, b_ = ab
        y = quantlinear.matmul(x, ql, backend="pallas_interpret") + (x @ a_) @ b_
        return jnp.mean((y - y_tgt) ** 2)

    params = (a, b)
    l0 = float(loss_fn(params))
    for _ in range(10):
        g = jax.grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda p, gg: p - 0.1 * gg, params, g)
    l1 = float(loss_fn(params))
    assert np.isfinite(l1) and l1 < l0
