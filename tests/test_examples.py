"""Smoke tests for the example scripts (the reference never tests its
examples; ours are air-gap-runnable, so we drive the real argparse mains in
subprocesses on tiny local checkpoints)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# sitecustomize forces jax onto CPU inside the subprocesses (the axon TPU
# plugin ignores JAX_PLATFORMS=cpu; without this the examples would fight
# over the single tunneled TPU and run ~10x slower).
ENV = dict(
    os.environ,
    XLA_FLAGS="--xla_force_host_platform_device_count=1",
    PYTHONPATH=os.pathsep.join([os.path.join(REPO, "tests", "_force_cpu"), REPO]),
)


def _run(args, cwd=None):
    r = subprocess.run(
        [sys.executable, *args], capture_output=True, text=True, timeout=900,
        env=ENV, cwd=cwd or REPO,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    return r.stdout


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    """A tiny llama + tokenizer + quantized copy, saved to disk."""
    base = tmp_path_factory.mktemp("example_models")
    fp = base / "fp"
    import torch

    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        tie_word_embeddings=False,
    )
    transformers.LlamaForCausalLM(cfg).save_pretrained(fp, safe_serialization=True)
    # minimal char-level tokenizer the AutoTokenizer can load
    tok = transformers.PreTrainedTokenizerFast(
        tokenizer_object=_char_tokenizer(), pad_token="<pad>", bos_token="<s>",
        eos_token="</s>",
    )
    tok.save_pretrained(fp)

    rng = np.random.default_rng(0)
    qc = BaseQuantizeConfig(bits=4, group_size=16, desc_act=False)
    m = AutoGPTQForCausalLM.from_pretrained(str(fp), quantize_config=qc, dtype=jnp.float32)
    m.quantize([{"input_ids": rng.integers(0, 256, size=(24,))} for _ in range(2)])
    q = base / "q"
    m.save_quantized(str(q))
    tok.save_pretrained(q)
    return {"fp": str(fp), "q": str(q), "base": base}


def _char_tokenizer():
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {chr(i): i for i in range(32, 127)}
    vocab.update({"<pad>": 127, "<s>": 128, "</s>": 129, "<unk>": 130})
    t = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    t.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    return t


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    base = tmp_path_factory.mktemp("example_data")
    rows_lm = [{"prompt": "hello", "label": "world"} for _ in range(4)]
    rows_cls = [{"prompt": "good film.", "label": "positive"},
                {"prompt": "bad film.", "label": "negative"}]
    rows_sum = [{"prompt": "a long text about cats", "summary": "cats"}]
    rows_inst = [{"instruction": "say hi", "output": "hi"} for _ in range(6)]
    paths = {}
    for name, rows in [("lm", rows_lm), ("cls", rows_cls), ("sum", rows_sum), ("inst", rows_inst)]:
        p = base / f"{name}.json"
        p.write_text(json.dumps(rows))
        paths[name] = str(p)
    text = base / "text.txt"
    text.write_text("\n".join("the quick brown fox jumps over the lazy dog" for _ in range(40)))
    paths["text"] = str(text)
    return paths


def test_example_perplexity(tiny_model, tiny_data):
    out = _run(["examples/benchmark/perplexity.py", tiny_model["q"],
                tiny_data["text"], "--quantized", "--n_ctx", "32", "--n_batch", "32"])
    assert "perplexity" in out


def test_example_sequence_classification(tiny_model, tiny_data):
    out = _run(["examples/evaluation/run_sequence_classification_task.py",
                "--base_model_dir", tiny_model["fp"],
                "--quantized_model_dir", tiny_model["q"],
                "--data", tiny_data["cls"], "--labels", "negative", "positive"])
    assert "quantized eval" in out


def test_example_lora_training(tiny_model, tiny_data, tmp_path):
    out = _run(["examples/peft/peft_lora_clm_instruction_tuning.py",
                "--quantized_model_dir", tiny_model["q"],
                "--data", tiny_data["inst"], "--out", str(tmp_path / "adapter"),
                "--rank", "4", "--block_max_len", "64", "--batch_size", "2"])
    assert "adapter saved" in out


def test_example_quant_with_alpaca(tiny_model, tiny_data, tmp_path):
    out = _run(["examples/quantization/quant_with_alpaca.py",
                "--pretrained_model_dir", tiny_model["fp"],
                "--quantized_model_dir", str(tmp_path / "q2"),
                "--data", tiny_data["inst"], "--group_size", "16",
                "--num_samples", "4", "--batch_size", "2"])
    assert "saved" in out


def test_example_adaption_prompt_training(tiny_model, tiny_data, tmp_path):
    out = _run(["examples/peft/peft_adaption_prompt_clm_instruction_tuning.py",
                "--quantized_model_dir", tiny_model["q"],
                "--data", tiny_data["inst"], "--out", str(tmp_path / "adapter"),
                "--adapter_len", "4", "--adapter_layers", "2",
                "--block_max_len", "64", "--batch_size", "2"])
    assert "adapter saved" in out


def test_example_serving_continuous_batching(tiny_model):
    out = _run(["examples/serving/continuous_batching.py",
                "--quantized_model_dir", tiny_model["q"],
                "--num_random_requests", "3", "--max_new_tokens", "6",
                "--max_seq_len", "128", "--prefill_chunk", "16",
                "--temperature", "0.7"])
    assert "aggregate tok/s" in out


def test_example_multi_chip_generate(tmp_path):
    """Explicit TP needs unpadded column widths (out % 128*tp == 0), so this
    example gets its own hidden=256 checkpoint instead of tiny_model."""
    import torch

    torch.manual_seed(0)
    fp = tmp_path / "fp"
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        tie_word_embeddings=False,
    )
    transformers.LlamaForCausalLM(cfg).save_pretrained(fp, safe_serialization=True)
    qc = BaseQuantizeConfig(bits=4, group_size=32, desc_act=False)
    m = AutoGPTQForCausalLM.from_pretrained(str(fp), quantize_config=qc, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    m.quantize([{"input_ids": rng.integers(0, 256, size=(16,))} for _ in range(2)])
    q = tmp_path / "q"
    m.save_quantized(str(q))

    env = dict(ENV, XLA_FLAGS="--xla_force_host_platform_device_count=4")
    r = subprocess.run(
        [sys.executable, "examples/inference/multi_chip_generate.py",
         "--quantized_model_dir", str(q), "--tp", "2", "--dp", "2",
         "--max_new_tokens", "5", "--verify_vs_single_chip"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    assert "verified: sharded tokens == single-device tokens" in r.stdout


def test_example_speculative_decoding(tiny_model):
    out = _run(["examples/inference/speculative_decoding.py",
                "--quantized_model_dir", tiny_model["q"],
                "--draft_model_dir", tiny_model["q"],
                "--max_new_tokens", "6", "--gamma", "3", "--verify"])
    assert "verified: speculative tokens == plain greedy tokens" in out


def test_example_serving_paged(tiny_model):
    out = _run(["examples/serving/continuous_batching.py",
                "--quantized_model_dir", tiny_model["q"],
                "--num_random_requests", "3", "--max_new_tokens", "6",
                "--max_seq_len", "128", "--paged", "--total_pages", "32",
                "--page_size", "8"])
    assert "aggregate tok/s" in out
