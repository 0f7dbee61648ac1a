"""Stacked (expert-parallel-ready) MoE execution: equivalence with the
per-expert list path, and ep x tp sharded forward on the CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig  # noqa: E402
from autogptq_tpu.models import params as params_lib  # noqa: E402
from autogptq_tpu.parallel import make_mesh, shard_params  # noqa: E402


@pytest.fixture(scope="module")
def quantized_mixtral(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mixtral")
    cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, intermediate_size=64,
        num_local_experts=8, num_experts_per_tok=2,
    )
    torch.manual_seed(0)
    transformers.MixtralForCausalLM(cfg).save_pretrained(tmp, safe_serialization=True)
    qc = BaseQuantizeConfig(bits=4, group_size=16, desc_act=False)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp), quantize_config=qc, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    model.quantize([{"input_ids": rng.integers(0, 128, size=(16,))} for _ in range(2)])
    return model


def test_stacked_matches_list(quantized_mixtral, rng):
    model = quantized_mixtral
    ids = rng.integers(0, 128, size=(2, 8)).astype(np.int32)
    base = np.asarray(model.forward(ids))

    stacked = params_lib.stack_moe_experts(model.params)
    assert "experts_stacked" in stacked["layers"][0]["mlp"]

    from autogptq_tpu.models import arch

    logits, _ = jax.jit(
        lambda p, t: arch.forward(p, t, model.cfg, backend="xla", dtype=jnp.float32)
    )(stacked, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), base, rtol=2e-4, atol=2e-4)


def test_ep_tp_sharded_moe(quantized_mixtral, rng):
    model = quantized_mixtral
    stacked = params_lib.stack_moe_experts(model.params)
    mesh = make_mesh(tp=2, dp=2, ep=2)
    sharded = shard_params(stacked, model.cfg, mesh)

    # the stacked expert tensors must actually be expert-sharded
    wp = sharded["layers"][0]["mlp"]["experts_stacked"]["gate_proj"].wp
    assert "ep" in str(wp.sharding.spec)

    ids = rng.integers(0, 128, size=(4, 8)).astype(np.int32)
    base = np.asarray(model.forward(ids))

    from autogptq_tpu.models import arch

    tokens = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P("dp", None)))
    with mesh:
        logits, _ = jax.jit(
            lambda p, t: arch.forward(p, t, model.cfg, backend="xla", dtype=jnp.float32)
        )(sharded, tokens)
    np.testing.assert_allclose(np.asarray(logits), base, rtol=2e-4, atol=2e-4)


def test_mixtral_nonstandard_expert_count(tmp_path, rng):
    """The spec must follow num_local_experts (found via a real-TPU smoke:
    a 4-expert checkpoint crashed the previously-hardcoded 8-expert lists)."""
    import torch
    import transformers

    from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig

    torch.manual_seed(0)
    cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2, tie_word_embeddings=False,
    )
    transformers.MixtralForCausalLM(cfg).save_pretrained(tmp_path / "fp", safe_serialization=True)
    qc = BaseQuantizeConfig(bits=4, group_size=16, desc_act=False)
    m = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    assert m.cfg.moe_num_experts == 4
    m.quantize([{"input_ids": rng.integers(0, 128, size=(16,))} for _ in range(2)])
    m.save_quantized(str(tmp_path / "q"))
    m2 = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    ids = rng.integers(0, 128, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(m2.forward(ids)), np.asarray(m.forward(ids)), rtol=2e-3, atol=2e-3)
