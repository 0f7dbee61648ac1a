"""Capture a jax.profiler device trace of the paged beam-4 decode and dump
per-op self-times (the honest step decomposition — the slope-timing
component probes mis-measure in-place update costs).

    python scripts/profile_beam_trace.py [mode]   # mode: beam|batch8

Parses the xplane locally via tensorboard_plugin_profile.
"""
import glob
import os
import sys

sys.path.insert(0, ".")
import numpy as np
import jax

import bench
from autogptq_tpu.utils import generation

MODE = sys.argv[1] if len(sys.argv) > 1 else "beam"
LOGDIR = f"/tmp/trace_{MODE}"

params, cfg = bench.build_model()
model = bench._Shim(params, cfg)
if MODE == "beam":
    prompt = (np.arange(16, dtype=np.int32)[None, :] % 1000)
    kw = dict(num_beams=4)
else:
    prompt = np.tile(np.arange(16, dtype=np.int32)[None, :] % 1000, (8, 1))
    kw = {}

# compile everything first so the trace holds only steady-state steps
out = generation.generate(model, prompt, max_new_tokens=64, **kw)
print("warmup done", out.shape, flush=True)

with jax.profiler.trace(LOGDIR):
    out = generation.generate(model, prompt, max_new_tokens=64, **kw)
    np.asarray(out[:1, :1])
print("trace captured", flush=True)

# ---- parse: per-op self time on the device plane ----
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

files = glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True)
print("xplane files:", files, flush=True)
params_tool = {"tqx": "out:csv;"}
csv, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", params_tool)
if isinstance(csv, bytes):
    csv = csv.decode()
lines = csv.splitlines()
print(lines[0], flush=True)
import csv as _csv

rows = list(_csv.reader(lines))
hdr = rows[0]


def col(name):
    return hdr.index(name)


try:
    i_name, i_total = col("Operation"), col("Total self-time (us)")
except ValueError:
    print("columns:", hdr, flush=True)
    i_name = 1
    i_total = next(i for i, h in enumerate(hdr) if "self" in h.lower())
data = []
for r in rows[1:]:
    try:
        data.append((float(r[i_total]), r[i_name]))
    except (ValueError, IndexError):
        continue
data.sort(reverse=True)
tot = sum(t for t, _ in data)
print(f"total self-time {tot/1e3:.1f} ms over trace")
for t, name in data[:30]:
    print(f"{t/1e3:9.3f} ms  {100*t/tot:5.1f}%  {name[:90]}")
