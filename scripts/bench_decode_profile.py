"""Decompose decode-step time: full step vs quantized matmuls only vs
lm_head only. Run on TPU. Uses the bench.py model builder.

params are passed as EXPLICIT jit args — a closure-captured params tree
becomes constants in the compile payload, and the tunnel's remote_compile
rejects multi-hundred-MB requests (HTTP 413)."""
import sys
import time
from functools import partial

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

import bench
from autogptq_tpu.ops import quantlinear

params, cfg = bench.build_model(layers=4)
h = cfg.hidden_size


def time_fn(name, fn, x, n1=20, n2=120):
    @partial(jax.jit, static_argnames=("n",))
    def loop(p, x, n):
        def body(i, x):
            y = fn(p, x)
            return jnp.where(y.reshape(-1)[0] > 1e30, x + 1e-12, x)
        return jax.lax.fori_loop(0, n, body, x)[0]

    def t(n):
        np.asarray(loop(params, x, n))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(params, x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (t(n2) - t(n1)) / (n2 - n1)
    print(f"{name:34s} {dt*1e3:8.3f} ms", flush=True)
    return dt


x = jnp.ones((1, h), jnp.bfloat16)


# 1. all quantized matmuls of all layers, chained (x -> proj -> reduce back)
def mm_all(p, x):
    acc = x
    for lp in p["layers"]:
        a, m = lp["attn"], lp["mlp"]
        q = quantlinear.matmul(acc, a["q_proj"])
        k = quantlinear.matmul(acc, a["k_proj"])
        v = quantlinear.matmul(acc, a["v_proj"])
        o = quantlinear.matmul(q + k + v, a["o_proj"])
        g = quantlinear.matmul(o, m["gate_proj"])
        u = quantlinear.matmul(o, m["up_proj"])
        d = quantlinear.matmul(jax.nn.silu(g) * u, m["down_proj"])
        acc = d
    return acc


t_mm = time_fn("matmuls only (7x4 layers)", mm_all, x)

# 2. lm_head (bf16 dense 4096x32000)
t_lm = time_fn("lm_head bf16", lambda p, xx: xx @ p["lm_head"].kernel, x)

# 3. full decode step via the generation machinery
from autogptq_tpu.models import arch  # noqa: E402

cache0 = arch.KVCache.create(cfg, batch=1, max_len=544, dtype=jnp.bfloat16)
cache0 = arch.KVCache(k=cache0.k, v=cache0.v, length=jnp.int32(256))


def step(p, tok_f):
    logits, _ = arch.forward(p, tok_f.astype(jnp.int32), cfg,
                             cache=cache0, backend="auto")
    return logits.astype(jnp.float32)


t_full = time_fn("full decode step (w/ lm_head)", step,
                 jnp.ones((1, 1), jnp.bfloat16))
print(f"per-32-layer estimate: matmuls {t_mm*8*1e3:.2f} ms, "
      f"full {(t_full + t_mm*7)*1e3:.2f} ms", flush=True)
