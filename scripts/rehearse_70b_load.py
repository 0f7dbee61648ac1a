"""Llama-2-70B desc_act load rehearsal (BASELINE config 4 / VERDICT r2 #6).

Builds an N-layer checkpoint with TRUE 70B shapes (hidden 8192, inter
28672, GQA 64q/8kv heads, head_dim 128, desc_act g_idx permutations) in
the reference on-disk layout, then drives the real load path
(``from_quantized``: LazyTensors streaming + host repack + kperm sort) on
CPU while sampling host RSS. Reports:

  * peak RSS during the load and the per-layer resident increment,
  * the streaming transient (peak - resident), which must stay O(1 layer),
  * an 80-layer projection: resident_80 = base + 80 * per_layer,
    peak_80 = resident_80 + transient  -> asserted < 100 GB,
  * 8-way TP shard-plan validation for every 70B linear: group-aligned
    K shards ((K/8) % group_size == 0) and per-shard kperm slice coverage.

Reference counterpart being scaled: modeling/_utils.py:704-770 (load) —
the reference stages through accelerate; ours streams mmap'd safetensors
one tensor at a time.

    python scripts/rehearse_70b_load.py [n_layers] [out_dir]
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, ".")

import numpy as np

HIDDEN, INTER, HEADS, KV_HEADS, VOCAB = 8192, 28672, 64, 8, 32000
BITS, GS = 4, 128
D = HIDDEN // HEADS


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def cur_rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return 0.0


def build_checkpoint(out_dir: str, n_layers: int, rng,
                     hidden=HIDDEN, inter=INTER, heads=HEADS,
                     kv_heads=KV_HEADS, vocab=VOCAB, gs=GS) -> None:
    """Reference-layout int4 desc_act checkpoint with true 70B shapes,
    written layer by layer (so the BUILD itself stays low-RSS too)."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    d = hidden // heads
    shapes = {
        "self_attn.q_proj": (hidden, heads * d),
        "self_attn.k_proj": (hidden, kv_heads * d),
        "self_attn.v_proj": (hidden, kv_heads * d),
        "self_attn.o_proj": (heads * d, hidden),
        "mlp.gate_proj": (hidden, inter),
        "mlp.up_proj": (hidden, inter),
        "mlp.down_proj": (inter, hidden),
    }
    weight_map = {}
    fnames = []
    for li in range(n_layers):
        tensors = {}
        for name, (k, n) in shapes.items():
            g = k // gs
            prefix = f"model.layers.{li}.{name}"
            tensors[f"{prefix}.qweight"] = rng.integers(
                -2**31, 2**31 - 1, size=(k // 8, n), dtype=np.int64
            ).astype(np.int32)
            tensors[f"{prefix}.qzeros"] = rng.integers(
                -2**31, 2**31 - 1, size=(g, n // 8), dtype=np.int64
            ).astype(np.int32)
            tensors[f"{prefix}.scales"] = (
                rng.random((g, n)) * 0.01 + 0.002
            ).astype(np.float16)
            # desc_act: a genuine activation-order permutation of groups
            tensors[f"{prefix}.g_idx"] = rng.permutation(
                (np.arange(k) // gs).astype(np.int32))
        for nrm in ("input_layernorm", "post_attention_layernorm"):
            tensors[f"model.layers.{li}.{nrm}.weight"] = np.ones(
                (hidden,), np.float16)
        fname = f"model-{li:05d}.safetensors"
        save_file(tensors, os.path.join(out_dir, fname))
        weight_map.update({t: fname for t in tensors})
        fnames.append(fname)
        del tensors
    top = {
        "model.embed_tokens.weight": np.zeros((vocab, hidden), np.float16),
        "model.norm.weight": np.ones((hidden,), np.float16),
        "lm_head.weight": np.zeros((vocab, hidden), np.float16),
    }
    save_file(top, os.path.join(out_dir, "model-top.safetensors"))
    weight_map.update({t: "model-top.safetensors" for t in top})
    with open(os.path.join(out_dir, "model.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {}, "weight_map": weight_map}, f)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({
            "model_type": "llama", "vocab_size": vocab,
            "hidden_size": hidden, "intermediate_size": inter,
            "num_hidden_layers": n_layers, "num_attention_heads": heads,
            "num_key_value_heads": kv_heads,
            "max_position_embeddings": 4096, "rms_norm_eps": 1e-5,
            "tie_word_embeddings": False,
        }, f)
    with open(os.path.join(out_dir, "quantize_config.json"), "w") as f:
        json.dump({"bits": BITS, "group_size": gs, "desc_act": True,
                   "sym": True}, f)


def validate_shard_plan(model, tp: int = 8, gs: int = GS) -> int:
    """Every 70B linear must K-shard group-aligned for desc_act TP."""
    from autogptq_tpu.ops.quantlinear import QuantLinear

    checked = 0
    for block in model.params["layers"]:
        for grp in ("attn", "mlp"):
            for name, node in block[grp].items():
                if not isinstance(node, QuantLinear):
                    continue
                k_eff = node.wp.shape[0] * (
                    8 if node.layout in ("ki32", "kb32") else 2)
                assert k_eff % tp == 0, (name, k_eff)
                shard_k = k_eff // tp
                assert shard_k % gs == 0, \
                    f"{name}: shard K {shard_k} not group-aligned"
                if node.kperm is not None:
                    assert node.kperm.shape[0] == k_eff, name
                checked += 1
    return checked


def main():
    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rehearse70b"

    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from autogptq_tpu import AutoGPTQForCausalLM

    rng = np.random.default_rng(0)
    t0 = time.time()
    if not os.path.isdir(os.path.join(out_dir)):
        build_checkpoint(out_dir, n_layers, rng)
    t_build = time.time() - t0
    ckpt_gb = sum(
        os.path.getsize(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)) / 1e9
    rss_before = cur_rss_gb()
    print(f"checkpoint: {n_layers} layers, {ckpt_gb:.2f} GB on disk "
          f"(built in {t_build:.0f}s); RSS before load {rss_before:.2f} GB")

    t0 = time.time()
    model = AutoGPTQForCausalLM.from_quantized(out_dir, dtype=jnp.bfloat16)
    t_load = time.time() - t0
    rss_after = cur_rss_gb()
    peak = rss_gb()
    resident = rss_after - rss_before
    transient = peak - rss_after
    per_layer = resident / n_layers
    proj_resident_80 = rss_before + 80 * per_layer
    proj_peak_80 = proj_resident_80 + max(transient, 0)
    print(f"load: {t_load:.1f}s  peak RSS {peak:.2f} GB  "
          f"resident +{resident:.2f} GB ({per_layer:.3f} GB/layer)  "
          f"streaming transient {transient:.2f} GB")
    print(f"80-layer projection: resident {proj_resident_80:.1f} GB, "
          f"peak {proj_peak_80:.1f} GB (budget 100 GB)")
    assert proj_peak_80 < 100.0, "projected 80-layer peak exceeds 100 GB"

    n = validate_shard_plan(model, tp=8)
    print(f"shard plan OK: {n} linears group-aligned for tp=8 desc_act")

    # one tiny forward proves the loaded desc_act model actually runs
    out = model.forward(np.array([[1, 2, 3, 4]], np.int32))
    assert np.isfinite(np.asarray(out, np.float32)).all()
    print("forward OK:", tuple(out.shape))


if __name__ == "__main__":
    main()
