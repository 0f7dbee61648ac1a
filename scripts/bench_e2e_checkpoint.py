"""End-to-end real-checkpoint benchmark (VERDICT r1 item 10).

Unlike bench.py (which builds random weights ON DEVICE because the tunnel
makes a 3.5GB host->device transfer slow), this script measures tok/s through
the EXACT path a user runs: a 7B-shaped Llama GPTQ checkpoint in the
reference on-disk layout is written to disk once (random weights — speed is
layout/shape dependent only), then ``AutoGPTQForCausalLM.from_quantized()``
loads it (host unpack -> ki32 repack -> device upload) and
``model.generate()`` produces the tokens.

Run: python scripts/bench_e2e_checkpoint.py [new_tokens] [ckpt_dir]
Prints one JSON line like bench.py. Load time is reported separately; tok/s
counts generation only (the reference protocol, generation_speed.py:189-226).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

BASELINE_TOK_S = 25.53

HIDDEN, INTER, LAYERS, HEADS, VOCAB = 4096, 11008, 32, 32, 32000
BITS, GS = 4, 128


def build_checkpoint(ckpt_dir: str) -> None:
    """Write a 7B-shaped GPTQ llama checkpoint in reference layout."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    tensors = {}

    def pack_linear(prefix, k, n):
        tensors[f"{prefix}.qweight"] = rng.integers(
            np.iinfo(np.int32).min, np.iinfo(np.int32).max,
            size=(k * BITS // 32, n), dtype=np.int64).astype(np.int32)
        g = k // GS
        tensors[f"{prefix}.qzeros"] = rng.integers(
            np.iinfo(np.int32).min, np.iinfo(np.int32).max,
            size=(g, n * BITS // 32), dtype=np.int64).astype(np.int32)
        tensors[f"{prefix}.scales"] = (
            rng.random((g, n)) * 0.015 + 0.005).astype(np.float16)
        tensors[f"{prefix}.g_idx"] = (np.arange(k) // GS).astype(np.int32)

    tensors["model.embed_tokens.weight"] = (
        rng.standard_normal((VOCAB, HIDDEN)) * 0.02).astype(np.float16)
    tensors["lm_head.weight"] = (
        rng.standard_normal((VOCAB, HIDDEN)) * 0.02).astype(np.float16)
    tensors["model.norm.weight"] = np.ones((HIDDEN,), np.float16)
    for i in range(LAYERS):
        p = f"model.layers.{i}"
        pack_linear(f"{p}.self_attn.q_proj", HIDDEN, HIDDEN)
        pack_linear(f"{p}.self_attn.k_proj", HIDDEN, HIDDEN)
        pack_linear(f"{p}.self_attn.v_proj", HIDDEN, HIDDEN)
        pack_linear(f"{p}.self_attn.o_proj", HIDDEN, HIDDEN)
        pack_linear(f"{p}.mlp.gate_proj", HIDDEN, INTER)
        pack_linear(f"{p}.mlp.up_proj", HIDDEN, INTER)
        pack_linear(f"{p}.mlp.down_proj", INTER, HIDDEN)
        tensors[f"{p}.input_layernorm.weight"] = np.ones((HIDDEN,), np.float16)
        tensors[f"{p}.post_attention_layernorm.weight"] = np.ones((HIDDEN,), np.float16)

    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
        json.dump({
            "model_type": "llama", "vocab_size": VOCAB, "hidden_size": HIDDEN,
            "intermediate_size": INTER, "num_hidden_layers": LAYERS,
            "num_attention_heads": HEADS, "num_key_value_heads": HEADS,
            "rms_norm_eps": 1e-5, "max_position_embeddings": 4096,
            "tie_word_embeddings": False,
        }, f)
    with open(os.path.join(ckpt_dir, "quantize_config.json"), "w") as f:
        json.dump({"bits": BITS, "group_size": GS, "desc_act": False,
                   "sym": True}, f)
    save_file(tensors, os.path.join(ckpt_dir, "model.safetensors"))


def main():
    new_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ckpt_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_e2e_llama7b_gptq"

    if not os.path.isfile(os.path.join(ckpt_dir, "model.safetensors")):
        t0 = time.perf_counter()
        build_checkpoint(ckpt_dir)
        print(f"checkpoint built in {time.perf_counter() - t0:.0f}s -> {ckpt_dir}",
              file=sys.stderr, flush=True)

    import jax.numpy as jnp

    from autogptq_tpu import AutoGPTQForCausalLM

    t0 = time.perf_counter()
    model = AutoGPTQForCausalLM.from_quantized(ckpt_dir, dtype=jnp.bfloat16)
    load_s = time.perf_counter() - t0
    print(f"from_quantized: {load_s:.0f}s (host unpack + i32 repack + upload)",
          file=sys.stderr, flush=True)
    lay = model.params["layers"][0]["attn"]["q_proj"].layout
    assert lay in ("ki32", "kb32"), lay

    prompt = (np.arange(16, dtype=np.int32)[None, :] % 1000)
    out = model.generate(prompt, max_new_tokens=new_tokens)  # warmup/compile
    assert out.shape[1] == 16 + new_tokens

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        model.generate(prompt, max_new_tokens=new_tokens)
        times.append(time.perf_counter() - t0)
    tok_s = new_tokens / min(times)
    print(json.dumps({
        "metric": "llama7b_int4_e2e_checkpoint_tokens_per_sec",
        "value": round(tok_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
        "load_seconds": round(load_s, 1),
    }))


if __name__ == "__main__":
    main()
