"""Randomized cross-width layout sweep: for a grid of (bits, group_size, K)
combinations — spanning every runtime layout the selector can pick (ki32,
kpair, k2i32, kquad, planar) — from_packed -> dequantize_xla must equal the
reference dequant math, and the interpret-mode kernel (when supported) must
match the XLA fallback. Guards the layout-selection matrix against future
regressions."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.ops import packing, quantlinear  # noqa: E402
from autogptq_tpu.ops.pallas import gemm  # noqa: E402

CASES = [
    # (bits, gs, k, n, expected_layout)
    (4, 128, 256, 128, "ki32"),
    (4, 32, 128, 128, "ki32"),
    (4, -1, 256, 128, "ki32"),
    (4, 16, 128, 128, "kpair"),     # gs % 32 != 0
    (4, 24, 96, 128, "kpair"),
    (3, 64, 256, 128, "ki32"),
    (3, 16, 64, 128, "kpair"),
    (2, 128, 256, 128, "k2i32"),
    (2, -1, 256, 128, "k2i32"),
    (2, 32, 128, 128, "kquad"),
    (2, 12, 96, 128, "kquad"),      # gs % 4 == 0, k % gs == 0 -> kquad
    (2, 28, 80, 128, "planar"),     # gs % 4 == 0 but k % gs != 0 -> planar
    (8, 32, 128, 128, "planar"),
    (8, -1, 64, 128, "planar"),
]


@pytest.mark.parametrize("bits,gs,k,n,expected", CASES)
def test_layout_selection_and_dequant(bits, gs, k, n, expected, rng):
    iw = rng.integers(0, 2 ** bits, size=(k, n)).astype(np.uint32)
    gs_eff = gs if gs != -1 else k
    g = -(-k // gs_eff)
    scales = (rng.random((g, n)) * 0.05 + 0.01).astype(np.float16)
    zeros = rng.integers(1, 2 ** bits, size=(g, n)).astype(np.int64)
    g_idx = np.minimum(np.arange(k) // gs_eff, g - 1).astype(np.int32)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, bits)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, bits)),
        scales=jnp.asarray(scales),
        g_idx=jnp.asarray(g_idx),
        bias=None,
        bits=bits, group_size=gs, in_features=k, out_features=n,
    )
    ql = quantlinear.from_packed(packed)
    assert ql.layout == expected, (ql.layout, expected)

    w = np.asarray(quantlinear.dequantize_xla(ql, jnp.float32))[:k, :n]
    want = (iw.astype(np.float32) - zeros[g_idx].astype(np.float32)) \
        * scales[g_idx].astype(np.float32)
    np.testing.assert_allclose(w, want, rtol=1e-5, atol=1e-5)

    # interpret-mode kernel parity where the kernel supports the shape
    x = (rng.standard_normal((1, k)) * 0.1).astype(np.float32)
    ref = np.asarray(quantlinear.matmul_xla(jnp.asarray(x), ql))
    if expected != "planar":
        got = np.asarray(gemm.matmul_pallas(jnp.asarray(x), ql, interpret=True))
        np.testing.assert_allclose(
            got, ref, rtol=2e-2, atol=np.abs(ref).max() * 2e-2)
