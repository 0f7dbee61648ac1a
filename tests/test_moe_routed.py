"""Routed-expert MoE decode path: the scalar-prefetch Pallas kernel reads
only the selected experts' weights. Interpret mode runs the REAL kernel on
CPU; results must match the dense masked/stacked execution."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.ops import packing, quantlinear  # noqa: E402
from autogptq_tpu.ops.pallas import gemm  # noqa: E402


def _make_ql(rng, k, n, gs, bits=4):
    iw = rng.integers(0, 2 ** bits, size=(k, n)).astype(np.uint32)
    g = k // gs
    scales = (rng.random((g, n)) * 0.05 + 0.01).astype(np.float16)
    zeros = rng.integers(1, 2 ** bits, size=(g, n)).astype(np.int64)
    g_idx = (np.arange(k) // gs).astype(np.int32)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, bits)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, bits)),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray(g_idx),
        bias=None,
        bits=bits, group_size=gs, in_features=k, out_features=n,
    )
    return quantlinear.from_packed(packed)


def _make_stack(rng, e=4, k=1024, n=128, gs=128):
    qls = [_make_ql(rng, k, n, gs) for _ in range(e)]
    sql = quantlinear.stack_experts(qls)
    assert sql.layout == "kb32"
    return sql, qls


def test_routed_matches_per_expert(rng):
    sql, qls = _make_stack(rng)
    p = 3
    sel = jnp.asarray([2, 0, 3], jnp.int32)
    x = jnp.asarray(rng.standard_normal((p, 1024)) * 0.1, jnp.float32)
    got = quantlinear.matmul_routed(x, sql, sel, backend="pallas_interpret")
    for i, eidx in enumerate([2, 0, 3]):
        ref = quantlinear.matmul_xla(x[i][None], qls[eidx])[0]
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(ref), rtol=2e-2,
            atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_routed_xla_fallback_matches(rng):
    sql, qls = _make_stack(rng)
    sel = jnp.asarray([1, 1, 0, 2], jnp.int32)
    x = jnp.asarray(rng.standard_normal((4, 1024)) * 0.1, jnp.float32)
    got = quantlinear.matmul_routed(x, sql, sel, backend="xla")
    for i, eidx in enumerate([1, 1, 0, 2]):
        ref = quantlinear.matmul_xla(x[i][None], qls[eidx])[0]
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_supported_routed_gates():
    class _S:
        layout = "kb32"
        group_size = 128
        n_pad = 128
        wp = np.zeros((4, 128, 128), np.int32)   # K = 1024

    assert gemm.supported_routed(_S(), interpret=True)
    _S.layout = "ki32"
    assert not gemm.supported_routed(_S(), interpret=True)


def test_moe_mlp_routed_matches_masked(rng):
    """arch.moe_mlp decode fast path (routed) == dense stacked execution."""
    from autogptq_tpu.models import arch

    e, k_top, hid = 4, 2, 1024
    sql_gate, _ = _make_stack(rng, e, hid, 1024, 128)
    sql_up, _ = _make_stack(rng, e, hid, 1024, 128)
    sql_down, _ = _make_stack(rng, e, 1024, hid, 128)
    # router: bias-free dense
    router = arch.DenseLinear(
        kernel=jnp.asarray(rng.standard_normal((hid, e)) * 0.1, jnp.float32),
        bias=None,
    )
    bp = {
        "router": router,
        "experts_stacked": {
            "gate_proj": sql_gate, "up_proj": sql_up, "down_proj": sql_down,
        },
    }
    cfg = arch.ArchConfig(
        model_type="mixtral", vocab_size=128, hidden_size=hid, num_layers=1,
        num_heads=4, num_kv_heads=4, head_dim=hid // 4,
        intermediate_size=1024, moe_num_experts=e, moe_top_k=k_top,
    )
    x = jnp.asarray(rng.standard_normal((1, 1, hid)) * 0.1, jnp.float32)
    # decode shape (1 token): pairs = 2 <= e -> routed path (interpret)
    got = arch.moe_mlp(bp, x, cfg, backend="pallas_interpret")
    # masked/stacked reference: force by making pairs > e via backend xla
    ref = arch.moe_mlp(bp, x, cfg, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-2,
        atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_moe_mlp_routed_batch(rng):
    """Batched decode (b=2) still routes correctly per token."""
    from autogptq_tpu.models import arch

    e, hid = 8, 1024
    bp = {
        "router": arch.DenseLinear(
            kernel=jnp.asarray(rng.standard_normal((hid, e)) * 0.1, jnp.float32),
            bias=None,
        ),
        "experts_stacked": {
            "gate_proj": _make_stack(rng, e, hid, 1024, 128)[0],
            "up_proj": _make_stack(rng, e, hid, 1024, 128)[0],
            "down_proj": _make_stack(rng, e, 1024, hid, 128)[0],
        },
    }
    cfg = arch.ArchConfig(
        model_type="mixtral", vocab_size=128, hidden_size=hid, num_layers=1,
        num_heads=4, num_kv_heads=4, head_dim=hid // 4,
        intermediate_size=1024, moe_num_experts=e, moe_top_k=2,
    )
    x = jnp.asarray(rng.standard_normal((2, 1, hid)) * 0.1, jnp.float32)
    got = arch.moe_mlp(bp, x, cfg, backend="pallas_interpret")
    ref = arch.moe_mlp(bp, x, cfg, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-2,
        atol=np.abs(np.asarray(ref)).max() * 2e-2)
