"""Bit-exactness tests for the GPTQ pack/unpack library.

Includes oracle tests against the reference implementation's CPU pack path
(imported by file path from the read-only reference mount) — these guarantee
checkpoint interchangeability at the bit level.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from autogptq_tpu.ops import packing
from tests.conftest import REFERENCE_ROOT, requires_reference

BITS = [2, 3, 4, 8]


@pytest.mark.parametrize("bits", BITS)
def test_qweight_roundtrip(bits, rng):
    k, n = 128, 64
    iw = rng.integers(0, 2**bits, size=(k, n)).astype(np.uint32)
    packed = packing.pack_qweight(iw, bits)
    assert packed.dtype == np.int32
    assert packed.shape == (k * bits // 32, n)
    out = packing.unpack_qweight(packed, bits)
    np.testing.assert_array_equal(out, iw)


@pytest.mark.parametrize("bits", BITS)
def test_qzeros_roundtrip(bits, rng):
    g, n = 4, 64
    zeros = rng.integers(1, 2**bits, size=(g, n)).astype(np.int64)  # avoid 0 quirk
    packed = packing.pack_qzeros(zeros, bits)
    assert packed.shape == (g, n * bits // 32)
    out = packing.unpack_qzeros(packed, bits)
    np.testing.assert_array_equal(out, zeros.astype(np.uint32))


def test_qzeros_zero_quirk():
    # zero == 0 wraps: 2/4/8-bit masks back to 0; 3-bit yields 8 (reference
    # fallback behavior, qlinear_cuda_old.py:301-330).
    zeros = np.zeros((1, 32), dtype=np.int64)
    for bits in (2, 4, 8):
        out = packing.unpack_qzeros(packing.pack_qzeros(zeros, bits), bits)
        np.testing.assert_array_equal(out, np.zeros_like(out))
    out3 = packing.unpack_qzeros(packing.pack_qzeros(zeros, 3), 3)
    np.testing.assert_array_equal(out3, np.full_like(out3, 8))


@pytest.mark.parametrize("bits", BITS)
def test_dequantize_identity_grid(bits, rng):
    """Weights already on the quant grid reconstruct exactly."""
    k, n, gs = 64, 32, 32
    g = k // gs
    iw = rng.integers(0, 2**bits, size=(k, n)).astype(np.uint32)
    zeros = rng.integers(1, 2**bits, size=(g, n)).astype(np.int64)
    scales = (rng.random((g, n)) * 0.1 + 0.01).astype(np.float16)
    g_idx = np.arange(k) // gs
    w = scales.astype(np.float64)[g_idx] * (iw.astype(np.float64) - zeros[g_idx])

    packed = {
        "qweight": packing.pack_qweight(iw, bits),
        "qzeros": packing.pack_qzeros(zeros, bits),
    }
    w_hat = packing.dequantize(
        packed["qweight"], packed["qzeros"], scales, g_idx, bits, dtype=np.float64
    )
    np.testing.assert_allclose(w_hat, w, rtol=0, atol=0)


@pytest.mark.parametrize("bits", BITS)
def test_pack_layer_roundtrip(bits, rng):
    k, n, gs = 128, 64, 64
    g = k // gs
    scales = (rng.random((g, n)) * 0.05 + 0.01).astype(np.float32)
    zeros = rng.integers(1, 2**bits, size=(g, n)).astype(np.float32)
    g_idx = (np.arange(k) // gs).astype(np.int32)
    iw = rng.integers(0, 2**bits, size=(k, n)).astype(np.uint32)
    w = scales[g_idx] * (iw.astype(np.float32) - zeros[g_idx])

    tensors = packing.pack_layer(w, scales, zeros, g_idx, bits, gs)
    np.testing.assert_array_equal(packing.unpack_qweight(tensors["qweight"], bits), iw)
    w_hat = packing.dequantize(
        tensors["qweight"], tensors["qzeros"], tensors["scales"], g_idx, bits
    )
    np.testing.assert_allclose(w_hat, w, rtol=1e-3, atol=1e-4)


def test_awq_roundtrip(rng):
    k, n, gs = 64, 64, 32
    iw = rng.integers(0, 16, size=(k, n)).astype(np.uint32)
    zeros = rng.integers(1, 16, size=(k // gs, n)).astype(np.uint32)
    awq_w = packing.pack_awq_tensor(iw, 4)
    awq_z = packing.pack_awq_tensor(zeros, 4)
    iw2, z2 = packing.unpack_awq(awq_w, awq_z, 4)
    np.testing.assert_array_equal(iw2, iw)
    np.testing.assert_array_equal(z2, zeros)


def test_awq_to_gptq(rng):
    k, n, gs = 64, 64, 32
    iw = rng.integers(0, 16, size=(k, n)).astype(np.uint32)
    zeros = rng.integers(1, 16, size=(k // gs, n)).astype(np.uint32)
    scales = (rng.random((k // gs, n)) * 0.05 + 0.01).astype(np.float16)
    out = packing.awq_to_gptq(
        packing.pack_awq_tensor(iw, 4), packing.pack_awq_tensor(zeros, 4), scales, 4
    )
    np.testing.assert_array_equal(packing.unpack_qweight(out["qweight"], 4), iw)
    np.testing.assert_array_equal(packing.unpack_qzeros(out["qzeros"], 4), zeros)


# ---------------------------------------------------------------------------
# Oracle tests against the reference CPU pack implementation.
# ---------------------------------------------------------------------------


def _load_reference_qlinear():
    path = os.path.join(
        REFERENCE_ROOT, "auto_gptq", "nn_modules", "qlinear", "qlinear_cuda_old.py"
    )
    spec = importlib.util.spec_from_file_location("ref_qlinear_cuda_old", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_qlinear_cuda_old"] = mod
    spec.loader.exec_module(mod)
    return mod


@requires_reference
@pytest.mark.parametrize("bits", BITS)
@pytest.mark.parametrize("group_size", [32, 128])
def test_pack_bit_exact_vs_reference(bits, group_size, rng):
    torch = pytest.importorskip("torch")
    ref = _load_reference_qlinear()

    k, n = 128, 64
    g = k // group_size
    # fp16-representable scales so reference (fp32 master) and ours (fp16
    # storage) pack identically.
    scales = (rng.random((g, n)) * 0.05 + 0.01).astype(np.float16).astype(np.float32)
    zeros = rng.integers(1, 2**bits, size=(g, n)).astype(np.float32)
    g_idx = (np.arange(k) // group_size).astype(np.int32)
    iw = rng.integers(0, 2**bits, size=(k, n)).astype(np.uint32)
    w = scales[g_idx] * (iw.astype(np.float32) - zeros[g_idx])  # [K, N]

    # Reference pack (expects torch linear with weight [N, K], scales/zeros [N, G]).
    lin = torch.nn.Linear(k, n, bias=False)
    lin.weight.data = torch.from_numpy(w.T.copy()).float()
    ql = ref.QuantLinear(bits, group_size, k, n, bias=False, use_cuda_fp16=False)
    ql.pack(
        lin,
        torch.from_numpy(scales.T.copy()),
        torch.from_numpy(zeros.T.copy()),
        g_idx=None,
    )

    ours = packing.pack_layer(w, scales, zeros, g_idx, bits, group_size)
    np.testing.assert_array_equal(ours["qweight"], ql.qweight.numpy())
    np.testing.assert_array_equal(ours["qzeros"], ql.qzeros.numpy())
    np.testing.assert_array_equal(
        ours["scales"].astype(np.float32), ql.scales.numpy().astype(np.float32)
    )

    # And the reference torch fallback forward agrees with our dequantize.
    if bits != 3 or group_size == k:  # ref 3-bit fallback requires gs | 32-block
        x = rng.standard_normal((4, k)).astype(np.float32)
        y_ref = ql(torch.from_numpy(x)).detach().numpy()
        w_hat = packing.dequantize(ours["qweight"], ours["qzeros"], ours["scales"], g_idx, bits)
        y_ours = x @ w_hat
        np.testing.assert_allclose(y_ref, y_ours, rtol=1e-4, atol=1e-4)
