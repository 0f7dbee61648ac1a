"""desc_act row-parallel sharding (VERDICT r1 item 2): after the load-time
kperm sort K rows are group-sequential, so o_proj/down_proj shard K in whole
groups; each rank takes ITS slice of kperm and arch.* all-gathers the
row-parallel input first. Reference analog: exllama make_sequential applied
per shard (/root/reference/autogptq_extension/exllama/cuda_func/
q4_matrix.cu:63-150)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from autogptq_tpu.models import arch  # noqa: E402
from autogptq_tpu.parallel import make_mesh, param_pspecs  # noqa: E402
from autogptq_tpu.parallel import tp  # noqa: E402
from autogptq_tpu.parallel.tp import TPModel  # noqa: E402
from autogptq_tpu.utils import generation  # noqa: E402


def _tiny(**kw):
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry_da", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._tiny_quantized_llama(**kw)


@pytest.fixture(scope="module")
def tiny_desc():
    return _tiny(hidden=256, inter=512, layers=2, heads=4, kv_heads=4,
                 group_size=32, desc_act=True)


def test_desc_act_specs_shard_row_parallel(tiny_desc):
    params, cfg = tiny_desc
    mesh = make_mesh(tp=4, devices=jax.devices()[:4])
    specs = param_pspecs(params, cfg, mesh)
    o_spec = specs["layers"][0]["attn"]["o_proj"]
    assert o_spec.wp == P("tp", None), "desc_act o_proj must K-shard"
    assert o_spec.kperm == P("tp"), "kperm shards with the K axis"
    assert o_spec.scales == P("tp", None, None)
    d_spec = specs["layers"][0]["mlp"]["down_proj"]
    assert d_spec.wp == P("tp", None)


@pytest.mark.parametrize("tp_size", [2, 4])
def test_desc_act_tp_forward_exact(tiny_desc, tp_size, rng):
    params, cfg = tiny_desc
    mesh = make_mesh(tp=tp_size, devices=jax.devices()[:tp_size])
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10)), jnp.int32)
    ref, _ = arch.forward(params, tokens, cfg, backend="xla", dtype=jnp.float32)
    prepared, run = tp.make_tp_forward(params, cfg, mesh, backend="xla", dtype=jnp.float32)
    got = run(prepared, tokens)
    # bit-identical: same f32 ops per shard, psum is deterministic on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_desc_act_tp_generate_exact(tiny_desc, rng):
    params, cfg = tiny_desc

    class _M:
        pass

    m = _M()
    m.params, m.cfg, m.backend, m.dtype = params, cfg, "xla", jnp.float32
    prompts = [rng.integers(1, cfg.vocab_size, (6,)).astype(np.int32)]
    ref = generation.generate(m, prompts, max_new_tokens=6, min_new_tokens=6)
    mesh = make_mesh(tp=4, devices=jax.devices()[:4])
    tpm = TPModel(params, cfg, mesh=mesh, backend="xla", dtype=jnp.float32)
    got = generation.generate(tpm, prompts, max_new_tokens=6, min_new_tokens=6)
    np.testing.assert_array_equal(got, ref)


def test_desc_act_tp_pallas_interpret(tiny_desc, rng):
    """The fused kernel (interpret mode) on desc_act K shards: the kperm
    gather + local-group scales must agree with the unsharded kernel."""
    params, cfg = tiny_desc
    mesh = make_mesh(tp=2, devices=jax.devices()[:2])
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 4)), jnp.int32)
    ref, _ = arch.forward(params, tokens, cfg, backend="pallas_interpret",
                          dtype=jnp.float32)
    prepared, run = tp.make_tp_forward(params, cfg, mesh,
                                       backend="pallas_interpret", dtype=jnp.float32)
    got = run(prepared, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_desc_act_misaligned_still_raises(rng):
    # K/tp not group-aligned: hidden=256, tp=4 -> 64-row shards, groups of 128
    params, cfg = _tiny(hidden=256, inter=512, layers=1, heads=4, kv_heads=4,
                        group_size=128, desc_act=True)
    mesh = make_mesh(tp=4, devices=jax.devices()[:4])
    with pytest.raises(NotImplementedError, match="K axis"):
        tp.make_tp_forward(params, cfg, mesh)
