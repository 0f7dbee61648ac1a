"""Trace the REAL 32-layer batch-1 decode (bench.py model + generate) and
print per-op device self-times per token — the honest glue decomposition.

    python scripts/profile_decode_trace.py [new_tokens]
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax

import bench
from autogptq_tpu.utils import generation

sys.path.insert(0, "scripts")
from xplane_util import print_report

NEW = int(sys.argv[1]) if len(sys.argv) > 1 else 64
# Unique per process: jax.profiler.trace adds a snapshot per run and
# xplane_util globs recursively — a reused dir sums unrelated runs.
import os as _os

LOGDIR = f"/tmp/trace_decode32-{_os.getpid()}"

params, cfg = bench._build_with_knobs()
model = bench._Shim(params, cfg)
prompt = np.arange(16, dtype=np.int32)[None, :] % 1000

out = generation.generate(model, prompt, max_new_tokens=NEW)
print("warmup done", out.shape, flush=True)
t0 = time.perf_counter()
out = generation.generate(model, prompt, max_new_tokens=NEW)
wall = time.perf_counter() - t0
print(f"steady-state: {NEW/wall:.1f} tok/s ({wall/NEW*1e3:.2f} ms/tok)", flush=True)

with jax.profiler.trace(LOGDIR):
    out = generation.generate(model, prompt, max_new_tokens=NEW)
    np.asarray(out[:1, :1])
print("trace captured", flush=True)

rows = print_report(LOGDIR, top=45)
tot_ms = sum(t for t, _, _ in rows) / 1e3
print(f"\nper-token device time: {tot_ms/NEW:.3f} ms "
      f"(wall {wall/NEW*1e3:.2f} ms) -> idle/dispatch gap "
      f"{(wall*1e3 - tot_ms)/NEW:.3f} ms/tok")
