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


def test_kb32_row_parallel_pspec_and_parity(rng):
    """kb32 nodes row-shard only on superblock (1024-row) boundaries; a
    tp=2 GSPMD shard of a K=2048 kb32 linear matches the unsharded result."""
    from jax.sharding import PartitionSpec as P

    from autogptq_tpu.ops import packing, quantlinear
    from autogptq_tpu.parallel.sharding import _quant_specs

    k, n, gs = 2048, 256, 128
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

    # tp=2: 1024-row shards = whole superblocks -> row-parallel allowed
    spec2 = _quant_specs(ql, col=False, tp="tp", tp_size=2)
    assert spec2.wp == P("tp", None)
    # tp=4: 512-row shards split a superblock -> replicate
    spec4 = _quant_specs(ql, col=False, tp="tp", tp_size=4)
    assert spec4.wp == P(None, None)

    x = jnp.asarray(rng.standard_normal((2, k)) * 0.1, jnp.float32)
    ref = quantlinear.matmul_xla(x, ql)
    mesh = make_mesh(tp=2, dp=4)
    with mesh:
        shard = lambda a, s: jax.device_put(a, NamedSharding(mesh, s))
        qls = quantlinear.QuantLinear(
            wp=shard(ql.wp, spec2.wp), scales=shard(ql.scales, spec2.scales),
            zeros=shard(ql.zeros, spec2.zeros), kperm=None, bias=None,
            bits=ql.bits, group_size=ql.group_size,
            in_features=ql.in_features, out_features=ql.out_features,
            n_pad=ql.n_pad, layout=ql.layout,
        )
        got = jax.jit(quantlinear.matmul_xla)(x, qls)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
