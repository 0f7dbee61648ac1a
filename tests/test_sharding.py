"""Multi-device tests on the virtual 8-device CPU mesh: sharded quantized
forward must equal single-device forward; dryrun entry points must run."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from autogptq_tpu.models import arch  # noqa: E402
from autogptq_tpu.parallel import make_mesh, param_pspecs, shard_params  # noqa: E402


def _tiny_model():
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_mesh_shapes():
    mesh = make_mesh(tp=4, dp=2)
    assert mesh.shape == {"dp": 2, "ep": 1, "tp": 4}
    with pytest.raises(ValueError):
        make_mesh(tp=3, dp=3)


def test_tp_forward_matches_single_device(rng):
    mod = _tiny_model()
    params, cfg = mod._tiny_quantized_llama(hidden=256, inter=512, group_size=64)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)

    logits_single, _ = jax.jit(
        lambda p, t: arch.forward(p, t, cfg, backend="xla", dtype=jnp.float32)
    )(params, tokens)

    mesh = make_mesh(tp=8, dp=1)
    sharded = shard_params(params, cfg, mesh)
    with mesh:
        logits_tp, _ = jax.jit(
            lambda p, t: arch.forward(p, t, cfg, backend="xla", dtype=jnp.float32)
        )(sharded, tokens)

    np.testing.assert_allclose(
        np.asarray(logits_tp), np.asarray(logits_single), rtol=2e-4, atol=2e-4
    )


def test_tp_dp_forward(rng):
    mod = _tiny_model()
    params, cfg = mod._tiny_quantized_llama(hidden=256, inter=512, group_size=64)
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(params, cfg, mesh)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 8)), jnp.int32)
    tokens = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))

    logits_single, _ = jax.jit(
        lambda p, t: arch.forward(p, t, cfg, backend="xla", dtype=jnp.float32)
    )(params, jnp.asarray(np.asarray(tokens)))

    with mesh:
        logits, _ = jax.jit(
            lambda p, t: arch.forward(p, t, cfg, backend="xla", dtype=jnp.float32)
        )(sharded, tokens)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_single), rtol=2e-4, atol=2e-4
    )


def test_quantlinear_pspec_alignment():
    """Sharded wp / scales last axes must stay aligned (planar invariant).

    group_size=32 so K/tp (256/8=32) lands on group boundaries; with larger
    groups row-parallel layers correctly fall back to replication."""
    mod = _tiny_model()
    params, cfg = mod._tiny_quantized_llama(hidden=256, inter=512, group_size=32)
    mesh = make_mesh(tp=8, dp=1)
    specs = param_pspecs(params, cfg, mesh)
    attn = specs["layers"][0]["attn"]
    assert attn["q_proj"].wp == P(None, "tp")
    assert attn["q_proj"].scales == P(None, None, "tp")
    # o_proj is row-parallel: K axis sharded, groups sharded
    assert attn["o_proj"].wp == P("tp", None)
    assert attn["o_proj"].scales == P("tp", None, None)


def test_dryrun_multichip_entry():
    mod = _tiny_model()
    mod.dryrun_multichip(8)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 16, 256)
