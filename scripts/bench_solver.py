"""Benchmark the GPTQ solver on the real TPU: one 4096x4096 solve vs a
grouped 3x (q/k/v-shaped) N-concatenated solve.

VERDICT r2 item 8 target: <= 4 s per 4096^2 layer equivalent.
Reference hot loop being beaten: auto_gptq/quantization/gptq.py:121-161
(per-column Python loop on GPU, ~8.5 s/layer measured round 2).
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from autogptq_tpu.quantization import (
    GPTQConfig, gptq_quantize, hessian_init, hessian_update)


def run(n, k, desc_act, tag):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((n, k)).astype(np.float32)
    x = rng.standard_normal((8, 512, k)).astype(np.float32)
    h, ns = hessian_init(k)
    h, ns = hessian_update(h, ns, jnp.asarray(x))
    cfg = GPTQConfig(bits=4, group_size=128, sym=False, desc_act=desc_act)
    wj = jnp.asarray(w)

    res = gptq_quantize(wj, h, cfg)           # compile
    np.asarray(res.qweight)                   # sync (D2H)
    times = []
    for _ in range(3):
        t0 = time.time()
        res = gptq_quantize(wj, h, cfg)
        np.asarray(res.qweight); np.asarray(res.total_loss)  # sync all
        times.append(time.time() - t0)
    best = min(times)
    print(f"{tag}: n={n} k={k} desc_act={desc_act}  best {best:.2f}s "
          f"(per-4096^2-layer-equiv {best * (4096 * 4096) / (n * k):.2f}s)")
    return best


if __name__ == "__main__":
    print("devices:", jax.devices())
    for da in (False, True):
        run(4096, 4096, da, "single")
        run(3 * 4096, 4096, da, "grouped-qkv")
