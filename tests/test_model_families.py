"""HF-parity tests for the extended model-family registry (fused-QKV
families included), plus quantize->save->reload interop for a fused family."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig  # noqa: E402


def _mk(config_cls, model_cls, tmp_path, **kw):
    torch.manual_seed(0)
    cfg = config_cls(**kw)
    model = model_cls(cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    return model


MAKERS = {
    "gpt2": lambda p: _mk(
        transformers.GPT2Config, transformers.GPT2LMHeadModel, p,
        vocab_size=128, n_embd=32, n_layer=2, n_head=2, n_positions=64,
    ),
    "gpt_neox": lambda p: _mk(
        transformers.GPTNeoXConfig, transformers.GPTNeoXForCausalLM, p,
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, rotary_pct=0.25,
    ),
    "gpt_neox_seq": lambda p: _mk(
        transformers.GPTNeoXConfig, transformers.GPTNeoXForCausalLM, p,
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, rotary_pct=1.0,
        use_parallel_residual=False,
    ),
    "bloom": lambda p: _mk(
        transformers.BloomConfig, transformers.BloomForCausalLM, p,
        vocab_size=128, hidden_size=32, n_layer=2, n_head=2,
    ),
    "gpt_bigcode": lambda p: _mk(
        transformers.GPTBigCodeConfig, transformers.GPTBigCodeForCausalLM, p,
        vocab_size=128, n_embd=32, n_layer=2, n_head=2, n_positions=64,
        multi_query=True,
    ),
    "phi": lambda p: _mk(
        transformers.PhiConfig, transformers.PhiForCausalLM, p,
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, partial_rotary_factor=0.5,
    ),
    "stablelm": lambda p: _mk(
        transformers.StableLmConfig, transformers.StableLmForCausalLM, p,
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, intermediate_size=64,
    ),
    "starcoder2": lambda p: _mk(
        transformers.Starcoder2Config, transformers.Starcoder2ForCausalLM, p,
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, intermediate_size=64,
    ),
    "codegen": lambda p: _mk(
        # mp_num=4 interleave requires n_head % 4 == 0
        transformers.CodeGenConfig, transformers.CodeGenForCausalLM, p,
        vocab_size=128, n_embd=64, n_layer=2, n_head=4, rotary_dim=8,
        n_positions=64,
    ),
    "mpt": lambda p: _mk(
        transformers.MptConfig, transformers.MptForCausalLM, p,
        vocab_size=128, d_model=32, n_layers=2, n_heads=2,
    ),
    "falcon": lambda p: _mk(
        transformers.FalconConfig, transformers.FalconForCausalLM, p,
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, new_decoder_architecture=False,
        multi_query=True, alibi=False, parallel_attn=True, bias=False,
    ),
    "falcon_new": lambda p: _mk(
        transformers.FalconConfig, transformers.FalconForCausalLM, p,
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2, new_decoder_architecture=True,
        alibi=False, bias=False,
    ),
    "mixtral": lambda p: _mk(
        transformers.MixtralConfig, transformers.MixtralForCausalLM, p,
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, intermediate_size=64,
        num_local_experts=8, num_experts_per_tok=2,
    ),
    "gemma": lambda p: _mk(
        transformers.GemmaConfig, transformers.GemmaForCausalLM, p,
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, intermediate_size=64,
        head_dim=16,
    ),
    "gemma2": lambda p: _mk(
        transformers.Gemma2Config, transformers.Gemma2ForCausalLM, p,
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, intermediate_size=64,
        head_dim=16, attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        sliding_window=8, query_pre_attn_scalar=16,
    ),
    "cohere": lambda p: _mk(
        transformers.CohereConfig, transformers.CohereForCausalLM, p,
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, intermediate_size=64,
    ),
    "qwen2": lambda p: _mk(
        transformers.Qwen2Config, transformers.Qwen2ForCausalLM, p,
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, intermediate_size=64,
    ),
    # opt-350m shape: word_embed_proj_dim != hidden_size (project_in/out
    # pair) + do_layer_norm_before=False (post-LN blocks, no final norm)
    "opt_350m_style": lambda p: _mk(
        transformers.OPTConfig, transformers.OPTForCausalLM, p,
        vocab_size=128, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=32, do_layer_norm_before=False,
    ),
}


@pytest.mark.parametrize("family", sorted(MAKERS))
def test_forward_matches_hf(family, tmp_path, rng):
    hf_model = MAKERS[family](tmp_path)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    ids = rng.integers(0, 128, size=(2, 10)).astype(np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids.astype(np.int64))).logits.float().numpy()
    ours = np.asarray(model.forward(ids))
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)
    # tighter mean agreement
    assert np.abs(ours - ref).mean() < 2e-3


def test_gpt2_fused_quantize_roundtrip(tmp_path, rng):
    """Fused-QKV family: quantize -> save (c_attn re-fused) -> reload."""
    MAKERS["gpt2"](tmp_path / "fp")
    qc = BaseQuantizeConfig(bits=4, group_size=16, desc_act=False, sym=False)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    examples = [{"input_ids": rng.integers(0, 128, size=(24,))} for _ in range(3)]
    model.quantize(examples)
    model.save_quantized(str(tmp_path / "q"))

    from safetensors import safe_open

    ckpt = next((tmp_path / "q").glob("gptq_model-*.safetensors"))
    with safe_open(ckpt, framework="np") as f:
        names = set(f.keys())
    # saved checkpoint uses the HF fused name (reference-compatible)
    assert "transformer.h.0.attn.c_attn.qweight" in names
    assert "transformer.h.0.attn.c_attn.bias" in names
    assert not any("q_proj" in n for n in names)

    ids = rng.integers(0, 128, size=(1, 8)).astype(np.int32)
    reloaded = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(reloaded.forward(ids)),
        np.asarray(model.forward(ids)),
        rtol=2e-3, atol=2e-3,
    )


def test_neox_per_head_fused_quantize_roundtrip(tmp_path, rng):
    MAKERS["gpt_neox"](tmp_path / "fp")
    qc = BaseQuantizeConfig(bits=4, group_size=16, desc_act=True, sym=True)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    examples = [{"input_ids": rng.integers(0, 128, size=(16,))} for _ in range(2)]
    model.quantize(examples)
    model.save_quantized(str(tmp_path / "q"))
    ids = rng.integers(0, 128, size=(1, 8)).astype(np.int32)
    reloaded = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(reloaded.forward(ids)),
        np.asarray(model.forward(ids)),
        rtol=2e-3, atol=2e-3,
    )


def test_mixtral_quantize_roundtrip(tmp_path, rng):
    MAKERS["mixtral"](tmp_path / "fp")
    qc = BaseQuantizeConfig(bits=4, group_size=16, desc_act=False)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    examples = [{"input_ids": rng.integers(0, 128, size=(16,))} for _ in range(2)]
    model.quantize(examples)
    # 4 attn + 24 expert linears per layer, 2 layers (router not quantized)
    assert len(model.packed_layers) == 2 * 28
    model.save_quantized(str(tmp_path / "q"))
    ids = rng.integers(0, 128, size=(1, 8)).astype(np.int32)
    reloaded = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(reloaded.forward(ids)),
        np.asarray(model.forward(ids)),
        rtol=2e-3, atol=2e-3,
    )


def test_opt350m_style_quantize_roundtrip_and_decode(tmp_path, rng):
    """project_in/out + post-LN OPT: KV-cached greedy decode matches the
    uncached forward argmax chain, and quantize->save->reload preserves the
    projection pair."""
    hf = MAKERS["opt_350m_style"](tmp_path / "fp")
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), dtype=jnp.float32)
    ids = rng.integers(0, 128, size=(1, 6)).astype(np.int32)

    # cached decode vs HF generate (greedy)
    with torch.no_grad():
        ref = hf.generate(
            torch.from_numpy(ids.astype(np.int64)), max_new_tokens=6,
            do_sample=False, pad_token_id=0,
        ).numpy()
    got = model.generate(ids, max_new_tokens=6)
    np.testing.assert_array_equal(got, ref)

    qc = BaseQuantizeConfig(bits=4, group_size=16, desc_act=False)
    qm = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    qm.quantize([{"input_ids": rng.integers(0, 128, size=(24,))} for _ in range(3)])
    qm.save_quantized(str(tmp_path / "q"))

    from safetensors import safe_open

    ckpt = next((tmp_path / "q").glob("gptq_model-*.safetensors"))
    with safe_open(ckpt, framework="np") as f:
        names = set(f.keys())
    assert "model.decoder.project_in.weight" in names
    assert "model.decoder.project_out.weight" in names

    reloaded = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(reloaded.forward(ids)), np.asarray(qm.forward(ids)),
        rtol=2e-3, atol=2e-3,
    )
