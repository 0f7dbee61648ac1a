"""End-to-end model tests: HF-checkpoint parity (vs torch transformers on
CPU), quantize -> save -> reload -> generate."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig  # noqa: E402
from autogptq_tpu.models import arch  # noqa: E402


def save_tiny_llama(tmp_path, moe=False):
    cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model = model.eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    return model


def save_tiny_opt(tmp_path):
    cfg = transformers.OPTConfig(
        vocab_size=256,
        hidden_size=64,
        ffn_dim=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=128,
        do_layer_norm_before=True,
        word_embed_proj_dim=64,
    )
    torch.manual_seed(0)
    model = transformers.OPTForCausalLM(cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    return model


def save_tiny_gptj(tmp_path):
    cfg = transformers.GPTJConfig(
        vocab_size=256,
        n_embd=64,
        n_layer=2,
        n_head=4,
        n_positions=128,
        rotary_dim=8,
    )
    torch.manual_seed(0)
    model = transformers.GPTJForCausalLM(cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    return model


@pytest.mark.parametrize(
    "maker", [save_tiny_llama, save_tiny_opt, save_tiny_gptj], ids=["llama", "opt", "gptj"]
)
def test_fp_forward_matches_hf(maker, tmp_path, rng):
    hf_model = maker(tmp_path)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)

    ids = rng.integers(0, 256, size=(2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()

    ours = np.asarray(model.forward(ids))
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)


def test_fp_forward_left_padded(tmp_path, rng):
    hf_model = save_tiny_llama(tmp_path)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)

    ids = rng.integers(1, 256, size=(1, 8)).astype(np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.numpy()

    # left-pad by 3 and check the valid-token logits agree
    pad = 3
    ids_p = np.concatenate([np.zeros((1, pad), np.int64), ids], axis=1)
    mask = np.concatenate([np.zeros((1, pad), np.int32), np.ones((1, 8), np.int32)], axis=1)
    ours = np.asarray(model.forward(ids_p.astype(np.int32), attn_mask=mask))
    np.testing.assert_allclose(ours[:, pad:], ref, rtol=5e-3, atol=5e-3)


def test_kv_cache_decode_consistency(tmp_path, rng):
    """Prefill+decode path must produce the same logits as full forward."""
    save_tiny_llama(tmp_path)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)

    ids = rng.integers(0, 256, size=(1, 10)).astype(np.int32)
    full = np.asarray(model.forward(ids))  # [1, 10, V]

    cache = arch.KVCache.create(model.cfg, 1, 16, dtype=jnp.float32)
    validity = jnp.zeros((1, 16), jnp.int32).at[:, :6].set(1)
    logits_p, cache = arch.forward(
        model.params, jnp.asarray(ids[:, :6]), model.cfg, cache=cache,
        backend="xla", attn_mask=validity, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(logits_p), full[:, :6], rtol=2e-3, atol=2e-3)

    for i in range(6, 10):
        validity = validity.at[:, i].set(1)
        logits_i, cache = arch.forward(
            model.params, jnp.asarray(ids[:, i : i + 1]), model.cfg, cache=cache,
            backend="xla", attn_mask=validity, dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(logits_i[:, 0]), full[:, i], rtol=2e-3, atol=2e-3
        )


def test_generate_greedy_matches_hf(tmp_path, rng):
    hf_model = save_tiny_llama(tmp_path)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    ids = rng.integers(0, 256, size=(1, 8)).astype(np.int64)
    with torch.no_grad():
        ref = hf_model.generate(
            torch.from_numpy(ids), max_new_tokens=8, do_sample=False,
            num_beams=1, pad_token_id=0,
        ).numpy()
    ours = model.generate(ids.astype(np.int32), max_new_tokens=8)
    np.testing.assert_array_equal(ours, ref)


def test_quantize_save_load_roundtrip(tmp_path, rng):
    save_tiny_llama(tmp_path / "fp")
    qc = BaseQuantizeConfig(bits=4, group_size=32, desc_act=False, sym=True)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)

    fp_logits = None
    ids = rng.integers(0, 256, size=(1, 16)).astype(np.int32)
    fp_logits = np.asarray(model.forward(ids))

    examples = [
        {"input_ids": rng.integers(0, 256, size=(24,))} for _ in range(4)
    ]
    model.quantize(examples, batch_size=2)
    assert model.quantized
    assert len(model.packed_layers) == 2 * 7  # 2 layers x 7 linears

    q_logits = np.asarray(model.forward(ids))
    # int4 g32 on a tiny random model: logits close but not equal
    assert np.mean(np.argmax(q_logits, -1) == np.argmax(fp_logits, -1)) > 0.5
    assert np.abs(q_logits - fp_logits).mean() < 2.0

    model.save_quantized(str(tmp_path / "q"))
    assert os.path.isfile(tmp_path / "q" / "quantize_config.json")
    assert os.path.isfile(tmp_path / "q" / "config.json")
    with open(tmp_path / "q" / "config.json") as f:
        assert json.load(f)["quantization_config"]["bits"] == 4
    # the checkpoint file must be named after model_file_base_name — the
    # reference's get_checkpoints searches only that name
    with open(tmp_path / "q" / "quantize_config.json") as f:
        base = json.load(f)["model_file_base_name"]
    assert base == "gptq_model-4bit-32g"
    assert os.path.isfile(tmp_path / "q" / f"{base}.safetensors")

    reloaded = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    r_logits = np.asarray(reloaded.forward(ids))
    np.testing.assert_allclose(r_logits, q_logits, rtol=2e-3, atol=2e-3)


def test_from_quantized_reference_kwargs_compat(tmp_path, rng):
    """Call sites migrating from the reference pass its kwargs
    (_base.py:690-715): model_basename must select the checkpoint file,
    torch_dtype must map to the JAX dtype, and kernel/placement flags must
    be accepted and ignored rather than raising."""
    save_tiny_llama(tmp_path / "fp")
    qc = BaseQuantizeConfig(bits=4, group_size=32, desc_act=False)
    model = AutoGPTQForCausalLM.from_pretrained(
        str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    model.quantize(
        [{"input_ids": rng.integers(0, 256, size=(16,))} for _ in range(2)])
    model.save_quantized(str(tmp_path / "q"))
    # rename the checkpoint to a custom basename the config does NOT record
    old = tmp_path / "q" / "gptq_model-4bit-32g.safetensors"
    os.rename(old, tmp_path / "q" / "custom-name.safetensors")
    reloaded = AutoGPTQForCausalLM.from_quantized(
        str(tmp_path / "q"),
        model_basename="custom-name",
        torch_dtype="torch.float32",
        device="cuda:0",
        use_triton=True,
        use_safetensors=True,
        trainable=True,
        disable_exllama=True,
    )
    assert reloaded.dtype == jnp.float32
    ids = rng.integers(0, 256, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(reloaded.forward(ids)),
        np.asarray(model.forward(ids)), rtol=2e-3, atol=2e-3)


def test_quantize_desc_act(tmp_path, rng):
    save_tiny_llama(tmp_path / "fp")
    qc = BaseQuantizeConfig(bits=4, group_size=16, desc_act=True, sym=False)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    examples = [{"input_ids": rng.integers(0, 256, size=(16,))} for _ in range(2)]
    model.quantize(examples)
    ids = rng.integers(0, 256, size=(1, 8)).astype(np.int32)
    model.save_quantized(str(tmp_path / "q"))
    reloaded = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(reloaded.forward(ids)),
        np.asarray(model.forward(ids)),
        rtol=2e-3,
        atol=2e-3,
    )
    # g_idx must be non-trivial somewhere
    anyperm = any(
        not np.array_equal(
            np.asarray(p.g_idx), np.arange(p.in_features) // 16
        )
        for p in model.packed_layers.values()
    )
    assert anyperm


def test_sharded_checkpoint_save_load(tmp_path, rng):
    """max_shard_size forces multi-file safetensors + index.json; loads back."""
    save_tiny_llama(tmp_path / "fp")
    qc = BaseQuantizeConfig(bits=4, group_size=32, desc_act=False)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    model.quantize([{"input_ids": rng.integers(0, 256, size=(16,))} for _ in range(2)])
    model.save_quantized(str(tmp_path / "q"), max_shard_size=64 * 1024)

    import os
    files = os.listdir(tmp_path / "q")
    # Index is named after the basename so the reference's get_checkpoints
    # (modeling/_utils.py:715) can discover the sharded save.
    assert "gptq_model-4bit-32g.safetensors.index.json" in files
    shards = [f for f in files if f.endswith(".safetensors")]
    assert len(shards) >= 2

    ids = rng.integers(0, 256, size=(1, 8)).astype(np.int32)
    reloaded = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(reloaded.forward(ids)), np.asarray(model.forward(ids)),
        rtol=2e-3, atol=2e-3,
    )


def test_from_quantized_config_override_and_plain_dtype(tmp_path, rng):
    """Two more reference-compat corners (_base.py:690-715, 811-815):
    an explicit quantize_config= must take precedence over (here: replace a
    missing) on-disk config, and the plain HF dtype strings
    ("float16"/"bfloat16"/"float32"/"auto") must map like the repr forms."""
    save_tiny_llama(tmp_path / "fp")
    qc = BaseQuantizeConfig(bits=4, group_size=32, desc_act=False)
    model = AutoGPTQForCausalLM.from_pretrained(
        str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    model.quantize(
        [{"input_ids": rng.integers(0, 256, size=(16,))} for _ in range(2)])
    model.save_quantized(str(tmp_path / "q"))
    os.remove(tmp_path / "q" / "quantize_config.json")

    qc2 = BaseQuantizeConfig(bits=4, group_size=32, desc_act=False)
    reloaded = AutoGPTQForCausalLM.from_quantized(
        str(tmp_path / "q"),
        quantize_config=qc2,
        torch_dtype="float32",      # plain HF string form
    )
    assert reloaded.dtype == jnp.float32
    assert reloaded.quantize_config is qc2
    ids = rng.integers(0, 256, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(reloaded.forward(ids)),
        np.asarray(model.forward(ids)), rtol=2e-3, atol=2e-3)
    # "auto" keeps the default dtype instead of silently vanishing
    auto_m = AutoGPTQForCausalLM.from_quantized(
        str(tmp_path / "q"), quantize_config=BaseQuantizeConfig(
            bits=4, group_size=32, desc_act=False),
        torch_dtype="auto")
    assert auto_m.dtype == jnp.bfloat16
