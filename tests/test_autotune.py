"""Shape autotuner (ops/pallas/autotune.py): persisted profiles override
tile defaults; disabled mode falls back to the heuristic default (the
reference analog is the Triton custom_autotune.py tuner)."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.ops import packing, quantlinear  # noqa: E402
from autogptq_tpu.ops.pallas import autotune, gemm  # noqa: E402


@pytest.fixture(autouse=True)
def _fresh_cache(tmp_path, monkeypatch):
    monkeypatch.setenv(
        "AUTOGPTQ_TPU_AUTOTUNE_CACHE", str(tmp_path / "autotune.json"))
    autotune._load.cache_clear()
    autotune._session.clear()
    yield
    autotune._load.cache_clear()
    autotune._session.clear()


def test_disabled_returns_default(monkeypatch):
    monkeypatch.delenv("AUTOGPTQ_TPU_AUTOTUNE", raising=False)
    assert not autotune.enabled()
    assert autotune.pick_bn("kb32", 4096, 4096, 128, 1, default=2048) == 2048


def test_profile_overrides_default(tmp_path, monkeypatch):
    path = tmp_path / "autotune.json"
    key = "kb32:4096:4096:128:decode"
    path.write_text(json.dumps({key: 512}))
    autotune._load.cache_clear()
    assert autotune.pick_bn("kb32", 4096, 4096, 128, 1, default=2048) == 512
    # prefill regime is a separate key -> default
    assert autotune.pick_bn("kb32", 4096, 4096, 128, 64, default=2048) == 2048


def test_session_cache_wins_without_reload():
    autotune._session["ki32:2048:1024:128:decode"] = 1024
    assert autotune.pick_bn("ki32", 2048, 1024, 128, 4, default=512) == 1024


def test_matmul_honors_profiled_tile(tmp_path, monkeypatch, rng):
    """End-to-end: a profiled bn flows through matmul_pallas dispatch (the
    kernel result is tile-invariant; this exercises the lookup path)."""
    monkeypatch.setenv("AUTOGPTQ_TPU_AUTOTUNE", "1")
    k, n, gs = 1024, 256, 128
    iw = rng.integers(0, 16, size=(k, n)).astype(np.uint32)
    g = k // gs
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, 4)),
        qzeros=jnp.asarray(packing.pack_qzeros(
            rng.integers(1, 16, size=(g, n)).astype(np.int64), 4)),
        scales=jnp.asarray((rng.random((g, n)) * 0.05 + 0.01).astype(np.float16)),
        g_idx=jnp.asarray((np.arange(k) // gs).astype(np.int32)),
        bias=None, bits=4, group_size=gs, in_features=k, out_features=n,
    )
    ql = quantlinear.from_packed(packed)
    assert ql.layout == "kb32"
    key = f"kb32:{ql.wp.shape[0]*8}:{ql.wp.shape[1]}:{gs}:decode"
    (tmp_path / "autotune.json").write_text(json.dumps({key: 128}))
    autotune._load.cache_clear()
    x = jnp.asarray(rng.standard_normal((1, k)) * 0.1, jnp.float32)
    ref = quantlinear.matmul_xla(x, ql)
    # interpret path skips the tuner; non-interpret on CPU is unsupported —
    # call pick_bn directly to confirm the profile resolves, then run the
    # kernel with that tile.
    bn = autotune.pick_bn("kb32", ql.wp.shape[0] * 8, ql.wp.shape[1], gs, 1,
                          default=2048)
    assert bn == 128
    got = gemm.matmul_pallas(x, ql, interpret=True, bnh=bn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_measured_result_persists(tmp_path, monkeypatch):
    """When enabled with a bench fn, the winning tile is saved to disk."""
    monkeypatch.setenv("AUTOGPTQ_TPU_AUTOTUNE", "1")
    calls = []

    # off-TPU, pick_bn must not invoke bench (returns default)
    def bench(bn):
        calls.append(bn)
        raise AssertionError("bench must not run off-TPU")

    out = autotune.pick_bn("ki32", 4096, 4096, 128, 1, default=1024,
                           bench=bench)
    if jax.default_backend() != "tpu":
        assert out == 1024 and not calls


def test_failed_sweep_does_not_poison_cache(tmp_path, monkeypatch):
    """If every candidate raises (transient OOM/compile failure), the
    default must be returned WITHOUT persisting — a later call retries."""
    monkeypatch.setenv("AUTOGPTQ_TPU_AUTOTUNE", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def bench(bn):
        raise RuntimeError("transient")

    out = autotune.pick_bn("ki32", 4096, 4096, 128, 1, default=1024,
                           bench=bench)
    assert out == 1024
    assert "ki32:4096:4096:128:decode" not in autotune._session
    assert not (tmp_path / "autotune.json").exists()

    # a later successful sweep DOES persist
    def bench_ok(bn):
        def one(x):
            return jnp.zeros((8, bn), jnp.float32)
        return one

    monkeypatch.setattr(autotune, "slope_time",
                        lambda f, x, **kw: 1.0 / f(None).shape[1])
    out = autotune.pick_bn("ki32", 4096, 4096, 128, 1, default=1024,
                           bench=bench_ok)
    assert out == 4096  # fastest (largest bn under the fake timer)
    assert json.loads((tmp_path / "autotune.json").read_text())[
        "ki32:4096:4096:128:decode"] == 4096
