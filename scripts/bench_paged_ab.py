"""Same-process A/B: paged engine decode_block=8 with the Pallas write
kernel vs the dus chain (post-crash sessions drift ~10%; only in-process
comparisons are valid).

    python scripts/bench_paged_ab.py
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np

import bench
from autogptq_tpu.serving import Request
from autogptq_tpu.serving_paged import PagedContinuousBatchEngine

SLOTS, NEW = 8, 64
params, cfg = bench.build_model()
model = bench._Shim(params, cfg)
rng = np.random.default_rng(0)


def requests():
    return [Request(req_id=i,
                    prompt=rng.integers(0, 1000, size=(16,)).astype(np.int32),
                    max_new_tokens=NEW) for i in range(SLOTS)]


for wk in (True, False, True):      # repeat first config to expose drift
    eng = PagedContinuousBatchEngine(
        model, max_slots=SLOTS, total_pages=SLOTS * 16 + 8, page_size=16,
        pages_per_seq=16, decode_block=8, write_kernel=wk)
    eng.run(requests())
    t0 = time.perf_counter()
    out = eng.run(requests())
    dt = time.perf_counter() - t0
    tot = sum(len(v) for v in out.values())
    print(f"write_kernel={wk}: {tot/dt:7.1f} aggregate tok/s "
          f"(decode_tok_s {eng.stats.decode_tok_s():.1f})", flush=True)
