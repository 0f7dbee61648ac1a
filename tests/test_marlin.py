"""Marlin format conversion tests: roundtrip, dequant equivalence, and an
oracle comparison against the reference Marlin pack() (run on torch CPU by
bypassing the CUDA-gated constructor)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from autogptq_tpu.ops import marlin_compat, packing
from tests.conftest import REFERENCE_ROOT, requires_reference


def make_sym_gptq(rng, k, n, group_size):
    gs = group_size if group_size != -1 else k
    g = k // gs
    scales = (rng.random((g, n)) * 0.05 + 0.01).astype(np.float16)
    iw = rng.integers(0, 16, size=(k, n)).astype(np.uint32)
    zeros = np.full((g, n), 8, dtype=np.int64)
    return {
        "qweight": packing.pack_qweight(iw, 4),
        "qzeros": packing.pack_qzeros(zeros, 4),
        "scales": scales,
        "g_idx": (np.arange(k) // gs).astype(np.int32),
    }, iw


@pytest.mark.parametrize("group_size", [128, -1])
def test_marlin_roundtrip(group_size, rng):
    k, n = 256, 256
    gptq, iw = make_sym_gptq(rng, k, n, group_size)
    b, s = marlin_compat.gptq_to_marlin(
        gptq["qweight"], gptq["qzeros"], gptq["scales"], gptq["g_idx"], group_size
    )
    assert b.shape == (k // 16, n * 16 // 8)
    back = marlin_compat.marlin_to_gptq(b, s, group_size)
    np.testing.assert_array_equal(back["qweight"], gptq["qweight"])
    np.testing.assert_array_equal(back["qzeros"], gptq["qzeros"])
    np.testing.assert_array_equal(back["scales"], gptq["scales"])
    np.testing.assert_array_equal(back["g_idx"], gptq["g_idx"])


def test_marlin_validation():
    assert marlin_compat.validate_marlin_compat(4, 128, False, True) is None
    assert "bits" in marlin_compat.validate_marlin_compat(3, 128, False, True)
    assert "group_size" in marlin_compat.validate_marlin_compat(4, 64, False, True)
    assert "asymmetric" in marlin_compat.validate_marlin_compat(4, 128, False, False)
    assert "act-order" in marlin_compat.validate_marlin_compat(4, 128, True, True)


@requires_reference
@pytest.mark.parametrize("group_size", [128, -1])
def test_marlin_pack_matches_reference(group_size, rng):
    """Our gptq_to_marlin must produce byte-identical B/s to the reference
    Marlin pack() for the same fake-quantized weights."""
    torch = pytest.importorskip("torch")
    path = os.path.join(REFERENCE_ROOT, "auto_gptq", "nn_modules", "qlinear", "qlinear_marlin.py")
    spec = importlib.util.spec_from_file_location("ref_marlin", path)
    ref = importlib.util.module_from_spec(spec)
    sys.modules["ref_marlin"] = ref
    spec.loader.exec_module(ref)

    k, n = 256, 256
    gptq, iw = make_sym_gptq(rng, k, n, group_size)
    gs = group_size if group_size != -1 else k
    g_idx = np.arange(k) // gs
    scales = gptq["scales"].astype(np.float32)
    # fake-quantized fp16 weights [K, N] -> torch linear [N, K]
    w = (scales[g_idx] * (iw.astype(np.float32) - 8.0)).astype(np.float16)

    # Bypass the CUDA-capability-gated constructor; pack() itself is CPU-pure.
    ql = ref.QuantLinear.__new__(ref.QuantLinear)
    torch.nn.Module.__init__(ql)
    ql.infeatures, ql.outfeatures = k, n
    ql.group_size = gs
    ql.register_buffer("B", torch.empty((k // 16, n * 16 // 8), dtype=torch.int))
    ql.register_buffer("s", torch.empty((k // gs, n), dtype=torch.half))
    ql.bias = None

    lin = torch.nn.Linear(k, n, bias=False)
    lin.weight.data = torch.from_numpy(w.T.copy()).half()
    ql.pack(lin, torch.from_numpy(scales.T.copy().astype(np.float16)))

    b_ours, s_ours = marlin_compat.gptq_to_marlin(
        gptq["qweight"], gptq["qzeros"], gptq["scales"], gptq["g_idx"], group_size
    )
    np.testing.assert_array_equal(b_ours, ql.B.numpy())
    np.testing.assert_array_equal(s_ours.view(np.uint16), ql.s.numpy().view(np.uint16))


def test_convert_checkpoint(rng):
    k, n = 256, 256
    gptq, _ = make_sym_gptq(rng, k, n, 128)
    b, s = marlin_compat.gptq_to_marlin(
        gptq["qweight"], gptq["qzeros"], gptq["scales"], gptq["g_idx"], 128
    )
    ckpt = {
        "model.layers.0.self_attn.q_proj.B": b,
        "model.layers.0.self_attn.q_proj.s": s,
        "model.layers.0.self_attn.q_proj.workspace": np.zeros(4, np.int32),
        "model.norm.weight": np.ones(8, np.float16),
    }
    out = marlin_compat.convert_checkpoint_marlin_to_gptq(ckpt, 128)
    assert "model.layers.0.self_attn.q_proj.qweight" in out
    assert "model.norm.weight" in out
    assert not any(x.endswith(".workspace") for x in out)
    np.testing.assert_array_equal(
        out["model.layers.0.self_attn.q_proj.qweight"], gptq["qweight"]
    )
