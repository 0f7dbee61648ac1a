"""Beam-4 Llama-7B benchmark (reference README beam=4 row, 91.30 tok/s
baseline). Reports honest seq-tok/s and the reference's beams-counted
accounting. Toggle kv_quant=True in the generate call for the int8 cache
(measured 212 vs 117 beam-tok/s)."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import bench
from autogptq_tpu.utils import generation

params, cfg = bench.build_model()
model = bench._Shim(params, cfg)
prompt = (np.arange(16, dtype=np.int32)[None, :] % 1000)
new_tokens = 512
KV = bool(int(__import__("os").environ.get("BENCH_KV_QUANT", "0")))
out = generation.generate(model, prompt, max_new_tokens=new_tokens, num_beams=4, kv_quant=KV)
assert out.shape[1] == 16 + new_tokens
times = []
for _ in range(2):
    t0 = time.perf_counter()
    generation.generate(model, prompt, max_new_tokens=new_tokens, num_beams=4, kv_quant=KV)
    times.append(time.perf_counter() - t0)
dt = min(times)
print(f"beam=4: {new_tokens/dt:.2f} seq-tok/s honest; "
      f"{4*new_tokens/dt:.2f} beam-tok/s (reference accounting, baseline 91.30)", flush=True)
