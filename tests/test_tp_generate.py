"""Multi-chip KV-cached decode (VERDICT r1 item 1 / BASELINE configs 4-5):
sharded generate() must produce EXACTLY the single-device tokens on the
8-device CPU mesh, including through the real Pallas kernel path
(interpret mode) so kernel-under-shard_map semantics are what's tested."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.parallel import make_mesh  # noqa: E402
from autogptq_tpu.parallel.tp import TPModel  # noqa: E402
from autogptq_tpu.utils import generation  # noqa: E402


class _Model:
    def __init__(self, params, cfg, backend="xla", dtype=jnp.float32):
        self.params = params
        self.cfg = cfg
        self.backend = backend
        self.dtype = dtype


def _tiny(**kw):
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry_tpg", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._tiny_quantized_llama(**kw)


@pytest.fixture(scope="module")
def tiny():
    return _tiny(hidden=256, inter=512, layers=2, heads=4, kv_heads=4, group_size=32)


def _prompts(rng, cfg, lens=(5, 9)):
    return [rng.integers(1, cfg.vocab_size, (n,)).astype(np.int32) for n in lens]


@pytest.mark.parametrize("tp_size", [2, 4])
def test_tp_greedy_matches_single_device(tiny, tp_size, rng):
    params, cfg = tiny
    prompts = _prompts(rng, cfg)
    ref = generation.generate(
        _Model(params, cfg), prompts, max_new_tokens=8, min_new_tokens=8,
    )
    mesh = make_mesh(tp=tp_size, devices=jax.devices()[:tp_size])
    tpm = TPModel(params, cfg, mesh=mesh, backend="xla", dtype=jnp.float32)
    got = generation.generate(tpm, prompts, max_new_tokens=8, min_new_tokens=8)
    np.testing.assert_array_equal(got, ref)


def test_tp_greedy_pallas_interpret_kernel_path(tiny, rng):
    """The REAL fused kernel (interpret mode) under shard_map: exercises
    local block-width handling (gemm.py reads widths from the local shard)."""
    params, cfg = tiny
    prompts = _prompts(rng, cfg, lens=(6,))
    ref = generation.generate(
        _Model(params, cfg, backend="pallas_interpret"), prompts,
        max_new_tokens=4, min_new_tokens=4,
    )
    mesh = make_mesh(tp=2, devices=jax.devices()[:2])
    tpm = TPModel(params, cfg, mesh=mesh, backend="pallas_interpret", dtype=jnp.float32)
    got = generation.generate(tpm, prompts, max_new_tokens=4, min_new_tokens=4)
    np.testing.assert_array_equal(got, ref)


def test_tp_beam_matches_single_device(tiny, rng):
    params, cfg = tiny
    prompts = _prompts(rng, cfg, lens=(7,))
    ref = generation.generate(
        _Model(params, cfg), prompts, max_new_tokens=6, min_new_tokens=6,
        num_beams=3,
    )
    mesh = make_mesh(tp=4, devices=jax.devices()[:4])
    tpm = TPModel(params, cfg, mesh=mesh, backend="xla", dtype=jnp.float32)
    got = generation.generate(tpm, prompts, max_new_tokens=6, min_new_tokens=6,
                              num_beams=3)
    np.testing.assert_array_equal(got, ref)


def test_tp_kv_quant_matches_single_device(tiny, rng):
    params, cfg = tiny
    prompts = _prompts(rng, cfg, lens=(5, 5))
    ref = generation.generate(
        _Model(params, cfg), prompts, max_new_tokens=5, min_new_tokens=5,
        kv_quant=True,
    )
    mesh = make_mesh(tp=2, devices=jax.devices()[:2])
    tpm = TPModel(params, cfg, mesh=mesh, backend="xla", dtype=jnp.float32)
    got = generation.generate(tpm, prompts, max_new_tokens=5, min_new_tokens=5,
                              kv_quant=True)
    np.testing.assert_array_equal(got, ref)


def test_dp_tp_greedy_matches_single_device(tiny, rng):
    """Batch sharded over dp x weights over tp: the full 2x4 mesh decode."""
    params, cfg = tiny
    prompts = _prompts(rng, cfg, lens=(5, 9, 4, 7))
    ref = generation.generate(
        _Model(params, cfg), prompts, max_new_tokens=6, min_new_tokens=6,
    )
    mesh = make_mesh(tp=4, dp=2, devices=jax.devices()[:8])
    tpm = TPModel(params, cfg, mesh=mesh, dp_axis="dp", backend="xla",
                  dtype=jnp.float32)
    got = generation.generate(tpm, prompts, max_new_tokens=6, min_new_tokens=6)
    np.testing.assert_array_equal(got, ref)


def test_tp_fused_params_are_unfused(tiny, rng):
    """ADVICE r1 (medium): fused qkv/gateup nodes silently corrupted explicit
    TP. TPModel must unfuse and then match exactly."""
    from autogptq_tpu.models import params as params_lib

    params, cfg = tiny
    fused = params_lib.fuse_qkv_gateup(params)
    assert "qkv_proj" in fused["layers"][0]["attn"]
    prompts = _prompts(rng, cfg, lens=(6,))
    ref = generation.generate(
        _Model(params, cfg), prompts, max_new_tokens=5, min_new_tokens=5,
    )
    mesh = make_mesh(tp=2, devices=jax.devices()[:2])
    tpm = TPModel(fused, cfg, mesh=mesh, backend="xla", dtype=jnp.float32)
    got = generation.generate(tpm, prompts, max_new_tokens=5, min_new_tokens=5)
    np.testing.assert_array_equal(got, ref)
