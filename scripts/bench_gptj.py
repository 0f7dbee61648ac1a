"""GPT-J-6B int4 generation benchmark (the reference README's second model:
29.55 tok/s beam=1 int4 on an RTX3060, README.md:38).

Same protocol as bench.py (512 forced tokens, batch 1, tokens/s = tokens /
generate() wall time); prints one JSON line. Run on the real TPU."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

import bench
from autogptq_tpu.models.arch import ArchConfig, DenseLinear

BASELINE_TOK_S = 29.55  # 1xRTX3060-12G, reference README.md:38


def build_gptj(bits=4, group_size=128, layers=28, hidden=4096, inter=16384,
               heads=16, vocab=50400, seed=0, dtype=jnp.bfloat16):
    import jax

    cfg = ArchConfig(
        model_type="gptj", vocab_size=vocab, hidden_size=hidden,
        num_layers=layers, num_heads=heads, num_kv_heads=heads,
        head_dim=hidden // heads, intermediate_size=inter,
        max_position_embeddings=2048, norm_type="layernorm",
        pos_embedding="rope_gptj", rotary_dim=64, mlp_act="gelu_new",
        mlp_bias=True, parallel_block=True,
    )
    key = jax.random.PRNGKey(seed)
    kk = jax.random.split(key, layers * 8 + 2)

    @jax.jit
    def emb(k):
        return (jax.random.normal(k, (vocab, hidden), jnp.float32) * 0.02).astype(dtype)

    params = {
        "embed_tokens": emb(kk[0]),
        "final_norm": {"weight": jnp.ones((hidden,), dtype), "bias": jnp.zeros((hidden,), dtype)},
        "lm_head": DenseLinear(kernel=emb(kk[1]).T.astype(dtype), bias=jnp.zeros((vocab,), dtype)),
        "layers": [],
    }
    for i in range(layers):
        b = kk[2 + i * 8:]
        params["layers"].append({
            "input_norm": {"weight": jnp.ones((hidden,), dtype), "bias": jnp.zeros((hidden,), dtype)},
            "attn": {
                "q_proj": bench.device_quant_linear(b[0], hidden, hidden, bits, group_size),
                "k_proj": bench.device_quant_linear(b[1], hidden, hidden, bits, group_size),
                "v_proj": bench.device_quant_linear(b[2], hidden, hidden, bits, group_size),
                "o_proj": bench.device_quant_linear(b[3], hidden, hidden, bits, group_size),
            },
            "mlp": {
                "up_proj": bench.device_quant_linear(b[4], hidden, inter, bits, group_size),
                "down_proj": bench.device_quant_linear(b[5], inter, hidden, bits, group_size),
            },
        })
    return params, cfg


def main():
    new_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    params, cfg = build_gptj()
    from autogptq_tpu.utils import generation

    model = bench._Shim(params, cfg)
    prompt = np.arange(16, dtype=np.int32)[None, :] % 1000
    out = generation.generate(model, prompt, max_new_tokens=new_tokens)
    assert out.shape[1] == 16 + new_tokens
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        generation.generate(model, prompt, max_new_tokens=new_tokens)
        times.append(time.perf_counter() - t0)
    tok_s = new_tokens / min(times)
    print(json.dumps({
        "metric": "gptj6b_int4_tokens_per_sec_per_chip",
        "value": round(tok_s, 2), "unit": "tokens/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
    }))


if __name__ == "__main__":
    main()
