"""End-to-end prefill benchmark: one long prompt through the full 7B model
(quantized matmuls in the prefill regime + flash attention + cache writes).

    python scripts/bench_prefill.py [prompt_len]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench
from autogptq_tpu.models import arch
from autogptq_tpu.models.arch import KVCache


def main():
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    params, cfg = bench.build_model()
    tokens = (np.arange(t_len, dtype=np.int32)[None, :] % 1000) + 1

    @jax.jit
    def prefill(p, toks):
        cache = KVCache.create(cfg, 1, t_len + 8, dtype=jnp.bfloat16)
        logits, cache = arch.forward(
            p, toks, cfg, cache=cache,
            positions=jnp.arange(t_len, dtype=jnp.int32)[None, :],
            backend="auto", dtype=jnp.bfloat16, fresh_prefill=True,
        )
        return logits[:, -1, :]

    tj = jnp.asarray(tokens)
    np.asarray(prefill(params, tj))          # compile + warmup (D2H syncs)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(prefill(params, tj))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    # model flops: 2 * params_matmul * tokens (attention extra excluded —
    # the conventional prefill accounting)
    h, inter, layers, vocab = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers, cfg.vocab_size
    per_tok = 2 * (layers * (4 * h * h + 3 * h * inter) + h * vocab)
    tflops = per_tok * t_len / dt / 1e12
    print(json.dumps({
        "metric": "llama7b_int4_prefill_tflops",
        "prompt_len": t_len,
        "seconds": round(dt, 3),
        "value": round(tflops, 1),
        "unit": "TFLOP/s",
    }))


if __name__ == "__main__":
    main()
