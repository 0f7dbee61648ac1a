"""Quality regression: int4 GPTQ perplexity must track the fp model's
perplexity through the llama.cpp-window harness (the in-repo analog of the
BASELINE 'PPL within 0.05 of reference' gate, runnable air-gapped)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
transformers = pytest.importorskip("transformers")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig  # noqa: E402
from autogptq_tpu.utils.perplexity import Perplexity  # noqa: E402


def test_quantized_ppl_tracks_fp(tmp_path, rng):
    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        tie_word_embeddings=False,
    )
    transformers.LlamaForCausalLM(cfg).save_pretrained(tmp_path / "fp", safe_serialization=True)

    # a structured token stream (repeating pattern) so PPL is meaningfully
    # below uniform for both models
    tokens = np.tile(np.arange(32, dtype=np.int32), 40)

    fp = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), dtype=jnp.float32)
    ppl_fp = Perplexity(fp, tokens=tokens, bos_token_id=1).calculate_perplexity(
        n_ctx=64, n_batch=64)[-1]

    qc = BaseQuantizeConfig(bits=4, group_size=32, desc_act=True)
    q = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    q.quantize([{"input_ids": rng.integers(0, 128, size=(48,))} for _ in range(4)])
    ppl_q = Perplexity(q, tokens=tokens, bos_token_id=1).calculate_perplexity(
        n_ctx=64, n_batch=64)[-1]

    assert np.isfinite(ppl_fp) and np.isfinite(ppl_q)
    # int4 g32 on a tiny model: quantized PPL within 10% of fp
    assert ppl_q < ppl_fp * 1.10, (ppl_fp, ppl_q)


def test_n_batch_segmented_matches_full(tmp_path, rng):
    """n_batch < n_ctx evaluates the chunk in KV-cached segments and must
    reproduce the single-dispatch logprobs."""
    torch.manual_seed(1)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        tie_word_embeddings=False,
    )
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        tmp_path / "fp", safe_serialization=True)
    fp = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), dtype=jnp.float32)
    tokens = np.tile(np.arange(16, dtype=np.int32), 12)  # 192 tokens

    full = Perplexity(fp, tokens=tokens, bos_token_id=1).calculate_perplexity(
        n_ctx=64, n_batch=64)
    seg = Perplexity(fp, tokens=tokens, bos_token_id=1).calculate_perplexity(
        n_ctx=64, n_batch=24)  # uneven split: 24+24+16
    np.testing.assert_allclose(seg, full, rtol=1e-4, atol=1e-5)
