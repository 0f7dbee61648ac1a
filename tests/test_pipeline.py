"""Pipeline parallelism: microbatched stage execution over a 'pp' mesh axis
matches the plain sequential forward (8-device CPU mesh)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from autogptq_tpu.models import arch  # noqa: E402
from autogptq_tpu.parallel import pipeline  # noqa: E402


def _model(layers=4):
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry_pp", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._tiny_quantized_llama(hidden=128, inter=256, layers=layers, group_size=32)


@pytest.mark.parametrize("num_stages,microbatches", [(4, 6), (2, 3)])
def test_pipeline_forward_matches_sequential(num_stages, microbatches, rng):
    params, cfg = _model(layers=4)
    devices = np.array(jax.devices()[:num_stages])
    mesh = Mesh(devices, ("pp",))

    m, mb, t = microbatches, 2, 10
    tokens = rng.integers(0, cfg.vocab_size, (m, mb, t)).astype(np.int32)

    staged = pipeline.stage_params(params, num_stages)
    logits_pp = np.asarray(
        pipeline.pipeline_forward(
            staged, jnp.asarray(tokens), cfg, mesh, backend="xla", dtype=jnp.float32
        )
    )

    for i in range(m):
        ref, _ = arch.forward(params, jnp.asarray(tokens[i]), cfg, backend="xla", dtype=jnp.float32)
        np.testing.assert_allclose(
            logits_pp[i], np.asarray(ref), rtol=2e-4, atol=2e-4,
            err_msg=f"microbatch {i}",
        )


def test_stage_params_shape():
    params, cfg = _model(layers=4)
    staged = pipeline.stage_params(params, 2)
    wp = staged["layers"]["attn"]["q_proj"].wp
    assert wp.shape[:2] == (2, 2)  # [S, L/S, ...]
    with pytest.raises(ValueError):
        pipeline.stage_params(params, 3)
