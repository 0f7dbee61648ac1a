"""Capture a jax.profiler device trace of the paged beam-4 decode and dump
per-op device self-times (the honest step decomposition — the slope-timing
component probes mis-measure in-place update costs).

    python scripts/profile_beam_trace.py [mode] [new_tokens]   # mode: beam|batch8

Parses the xplane locally via scripts/xplane_util.py (the
tensorboard_plugin_profile wrapper is broken in this environment).
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

MODE = sys.argv[1] if len(sys.argv) > 1 else "beam"
NEW = int(sys.argv[2]) if len(sys.argv) > 2 else 64
import os as _os

# Unique per process: a reused dir would make xplane_util sum this run
# with stale snapshots (it globs recursively).
LOGDIR = f"/tmp/trace_{MODE}-{_os.getpid()}"

params, cfg = bench.build_model()
model = bench._Shim(params, cfg)
if MODE == "beam":
    prompt = (np.arange(16, dtype=np.int32)[None, :] % 1000)
    kw = dict(num_beams=4)
else:
    prompt = np.tile(np.arange(16, dtype=np.int32)[None, :] % 1000, (8, 1))
    kw = {}

# compile everything first so the trace holds only steady-state steps
out = generation.generate(model, prompt, max_new_tokens=NEW, **kw)
print("warmup done", out.shape, flush=True)
t0 = time.perf_counter()
out = generation.generate(model, prompt, max_new_tokens=NEW, **kw)
np.asarray(out[:1, :1])
wall = time.perf_counter() - t0
print(f"steady-state: {NEW/wall:.1f} step-tok/s ({wall/NEW*1e3:.2f} ms/step)",
      flush=True)

with jax.profiler.trace(LOGDIR):
    out = generation.generate(model, prompt, max_new_tokens=NEW, **kw)
    np.asarray(out[:1, :1])
print("trace captured", flush=True)

rows = print_report(LOGDIR, top=45)
tot_ms = sum(t for t, _, _ in rows) / 1e3
print(f"\nper-step device time: {tot_ms/NEW:.3f} ms "
      f"(wall {wall/NEW*1e3:.2f} ms) -> idle/dispatch gap "
      f"{(wall*1e3 - tot_ms)/NEW:.3f} ms/step")
