"""Golden-vector regression tests (the reference's CUDA_OLD_REFERENCE idea,
tests/test_q4.py:29): checked-in packed tensors + expected matmul outputs.
These run WITHOUT the reference mount and pin the format + both execution
paths against bit drift."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.ops import packing, quantlinear  # noqa: E402
from autogptq_tpu.ops.pallas import gemm  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_quantlinear.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_golden_dequant_matmul(golden, bits):
    x = golden["x"]
    w = packing.dequantize(
        golden[f"qweight_{bits}"], golden[f"qzeros_{bits}"],
        golden[f"scales_{bits}"], golden[f"g_idx_{bits}"], bits,
    )
    y = x @ w
    np.testing.assert_allclose(y, golden[f"y_{bits}"], rtol=3e-5, atol=2e-5)


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_golden_runtime_paths(golden, bits):
    k = golden["x"].shape[1]
    n = golden[f"scales_{bits}"].shape[1]
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(golden[f"qweight_{bits}"]),
        qzeros=jnp.asarray(golden[f"qzeros_{bits}"]),
        scales=jnp.asarray(golden[f"scales_{bits}"]),
        g_idx=jnp.asarray(golden[f"g_idx_{bits}"]),
        bias=None, bits=bits, group_size=32, in_features=k, out_features=n,
    )
    ql = quantlinear.from_packed(packed)
    x = jnp.asarray(golden["x"])
    # XLA fallback (tolerances from the reference golden tests: rtol 3e-5,
    # atol 2e-2 — we hold fp32 paths much tighter)
    y_xla = np.asarray(quantlinear.matmul_xla(x, ql))
    np.testing.assert_allclose(y_xla, golden[f"y_{bits}"], rtol=3e-5, atol=2e-4)
    # Pallas kernel (interpret mode, fp32 accumulation)
    y_pl = np.asarray(gemm.matmul_pallas(x, ql, interpret=True, dot_dtype=jnp.float32))
    np.testing.assert_allclose(y_pl, golden[f"y_{bits}"], rtol=3e-5, atol=2e-4)
