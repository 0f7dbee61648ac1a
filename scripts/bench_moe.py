"""Mixtral-shaped MoE decode benchmark (single v5e chip).

Mixtral-8x7B geometry (hidden 4096, intermediate 14336, 8 experts top-2,
GQA-8) at reduced depth so the int4 weights fit one chip's HBM
(8 layers ~= 5.8 GB; the full 32-layer model needs multi-chip — covered by
the EP path in __graft_entry__.py). Reference counterpart: AutoGPTQ
benchmarks Mixtral via examples/benchmark/generation_speed.py with
per-expert Linears (modeling/mixtral.py:8-40).

Decode runs the ROUTED expert path (scalar-prefetch kernel reads only the
2 selected experts per token: ~1.6 GB/step effective) unless
BENCH_MOE_DENSE=1 forces the dense stacked path (all 8 experts: ~5.8 GB).

    python scripts/bench_moe.py [new_tokens] [layers]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench
from autogptq_tpu.models.arch import ArchConfig, DenseLinear
from autogptq_tpu.ops.quantlinear import StackedQuantLinear
from autogptq_tpu.utils import generation

NEW_TOKENS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
LAYERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

HID, INTER, E, TOPK = 4096, 14336, 8, 2
HEADS, KV_HEADS, VOCAB = 32, 8, 32000


def device_stacked(key, e, k, n, bits=4, gs=128):
    """Random kb32-layout stacked experts built on device (cf.
    bench.device_quant_linear — random words are valid code words)."""
    n_pad = -(-n // 128) * 128
    k_pad = k if k % 1024 == 0 else -(-k // 1024) * 1024
    g = k_pad // gs
    k1, k2, k3 = jax.random.split(key, 3)
    wp = jax.random.randint(
        k1, (e, k_pad // 8, n_pad), jnp.iinfo(jnp.int32).min,
        jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    scales = jax.random.uniform(k2, (e, g, 1, n_pad), jnp.float32, 0.005, 0.02)
    zeros = jax.random.randint(k3, (e, g, 1, n_pad), 1, 2 ** bits, jnp.int32)
    return StackedQuantLinear(
        wp=wp, scales=scales, zeros=zeros.astype(jnp.uint8), bias=None,
        bits=bits, group_size=gs, in_features=k, out_features=n,
        n_pad=n_pad, layout="kb32",
    )


def build_moe_model(layers=LAYERS, dtype=jnp.bfloat16):
    cfg = ArchConfig(
        model_type="mixtral", vocab_size=VOCAB, hidden_size=HID,
        num_layers=layers, num_heads=HEADS, num_kv_heads=KV_HEADS,
        head_dim=HID // HEADS, intermediate_size=INTER,
        max_position_embeddings=4096, moe_num_experts=E, moe_top_k=TOPK,
    )
    key = jax.random.PRNGKey(0)
    kk = jax.random.split(key, layers * 16 + 2)

    @jax.jit
    def make_embed(k):
        return (jax.random.normal(k, (VOCAB, HID), jnp.float32) * 0.02).astype(dtype)

    d = HID // HEADS
    params = {
        "embed_tokens": make_embed(kk[0]),
        "final_norm": {"weight": jnp.ones((HID,), dtype)},
        "lm_head": DenseLinear(kernel=make_embed(kk[1]).T.astype(dtype), bias=None),
        "layers": [],
    }
    for i in range(layers):
        b = kk[2 + i * 16:]
        params["layers"].append({
            "input_norm": {"weight": jnp.ones((HID,), dtype)},
            "post_norm": {"weight": jnp.ones((HID,), dtype)},
            "attn": {
                "q_proj": bench.device_quant_linear(b[0], HID, HEADS * d),
                "k_proj": bench.device_quant_linear(b[1], HID, KV_HEADS * d),
                "v_proj": bench.device_quant_linear(b[2], HID, KV_HEADS * d),
                "o_proj": bench.device_quant_linear(b[3], HEADS * d, HID),
            },
            "mlp": {
                "router": DenseLinear(
                    kernel=(jax.random.normal(b[4], (HID, E), jnp.float32) * 0.1).astype(dtype),
                    bias=None),
                "experts_stacked": {
                    "gate_proj": device_stacked(b[5], E, HID, INTER),
                    "up_proj": device_stacked(b[6], E, HID, INTER),
                    "down_proj": device_stacked(b[7], E, INTER, HID),
                },
            },
        })
    return params, cfg


def main():
    if os.environ.get("BENCH_MOE_DENSE"):
        from autogptq_tpu.ops.pallas import gemm
        gemm.supported_routed = lambda *a, **k: False
        print("mode: DENSE stacked (all experts)", flush=True)
    else:
        print("mode: ROUTED top-k (scalar-prefetch kernel)", flush=True)

    params, cfg = build_moe_model()
    model = bench._Shim(params, cfg)
    prompt = np.arange(16, dtype=np.int32)[None, :] % 1000

    out = generation.generate(model, prompt, max_new_tokens=NEW_TOKENS)
    assert out.shape[1] == 16 + NEW_TOKENS

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        generation.generate(model, prompt, max_new_tokens=NEW_TOKENS)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    tok_s = NEW_TOKENS / dt
    attn_b = LAYERS * (HID * HID * 2 + HID * KV_HEADS * (HID // HEADS) * 2) / 2
    moe_routed_b = LAYERS * TOPK * 3 * HID * INTER / 2
    active_gb = (attn_b + moe_routed_b) / 1e9
    print(
        f"mixtral-shaped {LAYERS}L decode: {tok_s:.2f} tok/s "
        f"({dt/NEW_TOKENS*1e3:.2f} ms/tok; routed active weights "
        f"{active_gb:.2f} GB/step -> {active_gb/(dt/NEW_TOKENS):.0f} GB/s effective)",
        flush=True,
    )


if __name__ == "__main__":
    main()
