"""Explicit shard_map tensor parallelism (parallel/tp.py): logits match the
sequential forward bit-for-bit-ish on the 8-device CPU mesh. This is the
path that keeps the fused Pallas kernel usable on real multi-chip meshes
(GSPMD cannot partition a pallas_call)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from autogptq_tpu.models import arch  # noqa: E402
from autogptq_tpu.parallel import tp  # noqa: E402


def _model(**kw):
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry_tp", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._tiny_quantized_llama(**kw)


@pytest.mark.parametrize("tp_size", [2, 4])
def test_tp_forward_matches_sequential(tp_size, rng):
    params, cfg = _model(hidden=256, inter=512, layers=2, heads=4, kv_heads=4, group_size=32)
    mesh = Mesh(np.array(jax.devices()[:tp_size]), ("tp",))
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10)), jnp.int32)

    ref, _ = arch.forward(params, tokens, cfg, backend="xla", dtype=jnp.float32)
    prepared, run = tp.make_tp_forward(params, cfg, mesh, backend="xla", dtype=jnp.float32)
    got = run(prepared, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_tp_rejects_unsplittable(rng):
    params, cfg = _model(hidden=256, inter=512, layers=1, heads=4, kv_heads=2, group_size=32)
    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    with pytest.raises(ValueError, match="heads"):
        tp.make_tp_forward(params, cfg, mesh)  # kv_heads=2 % 4 != 0


def test_tp_rejects_group_misaligned(rng):
    # K/tp not group-aligned: hidden=256, tp=4 -> K shard 64, group 128
    params, cfg = _model(hidden=256, inter=512, layers=1, heads=4, kv_heads=4, group_size=128)
    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    with pytest.raises(NotImplementedError, match="K axis"):
        tp.make_tp_forward(params, cfg, mesh)
