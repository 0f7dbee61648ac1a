"""70B desc_act load-plan rehearsal (CI-fast edition of
scripts/rehearse_70b_load.py): the streaming loader + kperm repack + TP
shard plan at GQA-shaped (scaled-down) dims, plus the pure PLAN checks at
the REAL 70B dims (no data)."""

import importlib.util
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _script():
    spec = importlib.util.spec_from_file_location(
        "rehearse70b", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "rehearse_70b_load.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scaled_70b_shape_load_and_shard_plan(tmp_path, rng):
    """Build a GQA-shaped desc_act checkpoint (same structure as 70B:
    sharded files + index, random g_idx permutations), stream-load it, and
    validate the 8-way group-aligned shard plan + a forward."""
    mod = _script()
    from autogptq_tpu import AutoGPTQForCausalLM

    gs = 32
    mod.build_checkpoint(
        str(tmp_path), 2, rng, hidden=512, inter=768, heads=8, kv_heads=2,
        vocab=256, gs=gs)
    model = AutoGPTQForCausalLM.from_quantized(str(tmp_path), dtype=jnp.float32)
    n = mod.validate_shard_plan(model, tp=8, gs=gs)
    assert n == 14
    out = model.forward(np.array([[1, 2, 3]], np.int32))
    assert np.isfinite(np.asarray(out, np.float32)).all()

    # the load-time kperm sort actually engaged (desc_act permutations)
    from autogptq_tpu.ops.quantlinear import QuantLinear

    anyperm = any(
        isinstance(v, QuantLinear) and v.kperm is not None
        for b in model.params["layers"] for v in b["attn"].values()
    )
    assert anyperm


def test_real_70b_dims_plan_only():
    """PLAN-level invariants at the true Llama-2-70B dims: every linear's
    8-way K shard is group-aligned (the desc_act TP requirement) and the
    projected int4 runtime memory fits a v5e-8's HBM envelope."""
    hidden, inter, heads, kv_heads, gs, layers = 8192, 28672, 64, 8, 128, 80
    d = hidden // heads
    shapes = [
        (hidden, heads * d), (hidden, kv_heads * d), (hidden, kv_heads * d),
        (heads * d, hidden), (hidden, inter), (hidden, inter), (inter, hidden),
    ]
    weight_bits = 0
    for k, n in shapes:
        assert (k // 8) % gs == 0, (k, "shard not group-aligned")
        weight_bits += k * n * 4 + (k // gs) * n * (16 + 4)  # w + scales+zeros
    total_gb = layers * weight_bits / 8 / 1e9
    # ~35 GB of int4 weights + scales: fits 8 x 16 GB HBM with room for KV
    assert 30 < total_gb < 45
