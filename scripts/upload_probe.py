"""Measure raw host->device transfer bandwidth through the axon tunnel.

Decides whether the 7B from_quantized load time (72 s for ~3.6 GB of
runtime-layout tensors) is tunnel-bound (nothing to optimize on our side)
or host-bound (pipeline harder). D2H of one element forces the sync —
block_until_ready does not actually sync through the tunnel.
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

for mb in (64, 256, 512):
    a = np.random.randint(-2**31, 2**31 - 1, size=(mb * 1024 * 1024 // 4,),
                          dtype=np.int32)
    d = jax.device_put(a)            # warm the path once
    np.asarray(d[:1])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(a)
        np.asarray(d[:1])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"H2D {mb:5d} MB: {dt:7.2f} s = {mb / dt:8.1f} MB/s", flush=True)
