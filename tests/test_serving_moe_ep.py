"""BASELINE config 5: "Mixtral-8x7B int4 expert-sharded with continuous
batching" — the continuous-batching engine over a GSPMD expert-sharded
(ep x dp) stacked-MoE Mixtral must produce exactly the unsharded engine's
tokens (CPU-mesh edition of the multi-chip serving config)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig  # noqa: E402
from autogptq_tpu.models import params as params_lib  # noqa: E402
from autogptq_tpu.parallel import make_mesh, shard_params  # noqa: E402
from autogptq_tpu.serving import ContinuousBatchEngine, Request  # noqa: E402


class _Shim:
    def __init__(self, params, cfg):
        self.params, self.cfg = params, cfg
        self.backend, self.dtype = "xla", jnp.float32


@pytest.fixture(scope="module")
def quantized_mixtral(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mixtral_serve")
    cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, intermediate_size=64,
        num_local_experts=4, num_experts_per_tok=2,
    )
    torch.manual_seed(0)
    transformers.MixtralForCausalLM(cfg).save_pretrained(tmp, safe_serialization=True)
    qc = BaseQuantizeConfig(bits=4, group_size=16, desc_act=False)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp), quantize_config=qc, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    model.quantize([{"input_ids": rng.integers(0, 128, size=(16,))} for _ in range(2)])
    return model


def test_moe_ep_sharded_continuous_batching(quantized_mixtral, rng):
    model = quantized_mixtral
    prompts = [
        rng.integers(1, 128, size=(p,)).astype(np.int32) for p in (5, 9, 4)
    ]
    reqs = lambda: [Request(i, p, max_new_tokens=5) for i, p in enumerate(prompts)]

    ref_engine = ContinuousBatchEngine(_Shim(model.params, model.cfg),
                                       max_slots=2, max_seq_len=64)
    ref = ref_engine.run(reqs())

    stacked = params_lib.stack_moe_experts(model.params)
    mesh = make_mesh(ep=4, dp=2, tp=1)
    sharded = shard_params(stacked, model.cfg, mesh)
    wp = sharded["layers"][0]["mlp"]["experts_stacked"]["gate_proj"].wp
    assert "ep" in str(wp.sharding.spec)  # experts actually sharded

    ep_engine = ContinuousBatchEngine(_Shim(sharded, model.cfg),
                                      max_slots=2, max_seq_len=64)
    got = ep_engine.run(reqs())

    assert set(got) == set(ref)
    for rid in ref:
        np.testing.assert_array_equal(got[rid], ref[rid])


def test_moe_ep_sharded_engine_sampling_and_chunked(quantized_mixtral, rng):
    """Chunked prefill + sampling paths also run over the ep-sharded model."""
    model = quantized_mixtral
    stacked = params_lib.stack_moe_experts(model.params)
    mesh = make_mesh(ep=4, dp=2, tp=1)
    sharded = shard_params(stacked, model.cfg, mesh)

    long_prompt = rng.integers(1, 128, size=(21,)).astype(np.int32)
    eng = ContinuousBatchEngine(_Shim(sharded, model.cfg), max_slots=2,
                                max_seq_len=64, prefill_chunk=8)
    out = eng.run([
        Request(0, long_prompt, max_new_tokens=4),
        Request(1, long_prompt[:6], max_new_tokens=4, temperature=0.8, seed=7),
    ])
    ref_eng = ContinuousBatchEngine(_Shim(stacked, model.cfg), max_slots=2,
                                    max_seq_len=64, prefill_chunk=8)
    ref = ref_eng.run([
        Request(0, long_prompt, max_new_tokens=4),
        Request(1, long_prompt[:6], max_new_tokens=4, temperature=0.8, seed=7),
    ])
    for rid in ref:
        np.testing.assert_array_equal(out[rid], ref[rid])
