import sys, time
sys.path.insert(0, ".")
import numpy as np
import bench
from autogptq_tpu.utils import generation

params, cfg = bench.build_model()
model = bench._Shim(params, cfg)
for b in (1, 8):
    prompt = np.tile(np.arange(16, dtype=np.int32)[None, :] % 1000, (b, 1))
    generation.generate(model, prompt, max_new_tokens=256)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        generation.generate(model, prompt, max_new_tokens=256)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"batch {b}: {b*256/dt:7.1f} aggregate tok/s ({256/dt:6.1f} per stream)", flush=True)
