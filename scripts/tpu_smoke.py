"""Real-TPU smoke: tiny desc_act llama + tiny mixtral (stacked experts)
through the public API on the actual chip (kpair kernel + kperm + vmap).
Run from the repo root on the TPU."""
import sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)

import transformers, torch
from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig

rng = np.random.default_rng(0)
torch.manual_seed(0)

# --- desc_act llama (exercises the kperm gather + kpair kernel) ---
cfg = transformers.LlamaConfig(vocab_size=256, hidden_size=256, intermediate_size=512,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2, tie_word_embeddings=False)
transformers.LlamaForCausalLM(cfg).save_pretrained("/tmp/sm/llama_fp", safe_serialization=True)
qc = BaseQuantizeConfig(bits=4, group_size=64, desc_act=True)
m = AutoGPTQForCausalLM.from_pretrained("/tmp/sm/llama_fp", quantize_config=qc, dtype=jnp.float32)
m.quantize([{"input_ids": rng.integers(0, 256, size=(32,))} for _ in range(2)])
m.save_quantized("/tmp/sm/llama_q")
m2 = AutoGPTQForCausalLM.from_quantized("/tmp/sm/llama_q")  # bf16, TPU, backend auto
ids = rng.integers(0, 256, size=(1, 8)).astype(np.int32)
out = m2.generate(ids, max_new_tokens=8)
# cross-check vs the XLA fallback on the same params
y_pallas = np.asarray(m2.forward(ids))
m2.backend = "xla"; m2._jit_cache.clear()
y_xla = np.asarray(m2.forward(ids))
err = np.abs(y_pallas - y_xla).max() / max(np.abs(y_xla).max(), 1e-6)
print(f"llama desc_act TPU OK: gen {out.shape}, pallas-vs-xla rel err {err:.2e}", flush=True)
assert err < 2e-2

# --- tiny mixtral with stacked experts ---
mcfg = transformers.MixtralConfig(vocab_size=256, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    num_local_experts=4, num_experts_per_tok=2, tie_word_embeddings=False)
transformers.MixtralForCausalLM(mcfg).save_pretrained("/tmp/sm/mix_fp", safe_serialization=True)
qc2 = BaseQuantizeConfig(bits=4, group_size=32, desc_act=False)
mm = AutoGPTQForCausalLM.from_pretrained("/tmp/sm/mix_fp", quantize_config=qc2, dtype=jnp.float32)
mm.quantize([{"input_ids": rng.integers(0, 256, size=(24,))} for _ in range(2)])
mm.save_quantized("/tmp/sm/mix_q")
mm2 = AutoGPTQForCausalLM.from_quantized("/tmp/sm/mix_q")
from autogptq_tpu.models.params import stack_moe_experts as stack_expert_weights
try:
    mm2.params = stack_expert_weights(mm2.params)
    print("experts stacked", flush=True)
except Exception as e:
    print("stacking unavailable:", e, flush=True)
out2 = mm2.generate(ids, max_new_tokens=8)
print(f"mixtral TPU OK: gen {out2.shape}", flush=True)
