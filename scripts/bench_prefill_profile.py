"""Decompose end-to-end prefill time (the 94 vs 165 TFLOP/s gap): time the
full model, then each per-layer component in isolation at the same M, and
compare component-sum vs whole. Run on TPU (slope timing: each piece loops
in-graph so tunnel dispatch noise cancels).

    python scripts/bench_prefill_profile.py [prompt_len]
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from autogptq_tpu.models import arch
from autogptq_tpu.models.arch import KVCache


def time_fn(name, fn, *args, n1=3, n2=13):
    """Loop fn in-graph n times; report (t(n2)-t(n1))/(n2-n1)."""

    @partial(jax.jit, static_argnames=("n",))
    def loop(n, *a):
        def body(i, a0):
            y = fn(*a0)
            # feed a data dependency back into the first arg so the loop
            # cannot be collapsed; the perturbation is numerically nil
            x0 = a0[0]
            bump = (y.reshape(-1)[0] * 0.0).astype(x0.dtype)
            return (x0 + bump,) + a0[1:]
        return jax.lax.fori_loop(0, n, body, a)[0]

    np.asarray(loop(n1, *args).reshape(-1)[:1])  # compile both variants
    np.asarray(loop(n2, *args).reshape(-1)[:1])
    t = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        np.asarray(loop(n, *args).reshape(-1)[:1])
        t[n] = time.perf_counter() - t0
    per = (t[n2] - t[n1]) / (n2 - n1) * 1e3
    print(f"{name:28s} {per:8.3f} ms/iter", flush=True)
    return per


def main():
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    params, cfg = bench.build_model()
    h, d, nh = cfg.hidden_size, cfg.head_dim, cfg.num_heads
    inter, L = cfg.intermediate_size, cfg.num_layers
    lp = params["layers"][0]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, t_len, h), jnp.bfloat16)
    pos = jnp.arange(t_len, dtype=jnp.int32)[None, :]

    # --- whole model ---
    tokens = jnp.asarray((np.arange(t_len, dtype=np.int32)[None, :] % 1000) + 1)

    @jax.jit
    def prefill(p, toks):
        cache = KVCache.create(cfg, 1, t_len + 8, dtype=jnp.bfloat16)
        logits, cache = arch.forward(
            p, toks, cfg, cache=cache, positions=pos,
            backend="auto", dtype=jnp.bfloat16, fresh_prefill=True,
        )
        return logits[:, -1, :]

    np.asarray(prefill(params, tokens))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(prefill(params, tokens))
        times.append(time.perf_counter() - t0)
    full_ms = min(times) * 1e3
    print(f"{'FULL prefill':28s} {full_ms:8.1f} ms total", flush=True)

    # --- components (one layer's worth; x32 for the model). Every params
    # object is threaded as an EXPLICIT loop arg — closure capture would
    # embed it as compile-payload constants (tunnel HTTP 413) ---
    comp = {}
    comp["qkvo (4 matmuls)"] = time_fn(
        "qkvo 4x4096^2 matmuls", lambda xx, a: (
            arch.apply_linear(a["q_proj"], xx)
            + arch.apply_linear(a["k_proj"], xx)
            + arch.apply_linear(a["v_proj"], xx)
            + arch.apply_linear(a["o_proj"], xx)
        ), x, lp["attn"])
    comp["mlp (3 matmuls + silu)"] = time_fn(
        "mlp gate/up/down+silu",
        lambda xx, m: arch.mlp(m, xx, cfg, "auto"), x, lp["mlp"])
    comp["2x rmsnorm"] = time_fn(
        "2x rmsnorm", lambda xx, n1, n2: arch.apply_norm(
            n2, arch.apply_norm(n1, xx, cfg), cfg),
        x, lp["input_norm"], lp["post_norm"])

    q4 = jax.random.normal(key, (1, t_len, nh, d), jnp.bfloat16)
    k4 = jax.random.normal(key, (1, t_len, cfg.num_kv_heads, d), jnp.bfloat16)
    comp["rope(q,k)"] = time_fn(
        "rope(q,k)", lambda qq, kk: arch.apply_rope(qq, kk, pos, cfg)[0], q4, k4)

    # flash attention alone (same kernel the prefill path uses)
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa
    qf = jax.random.normal(key, (1, nh, t_len, d), jnp.bfloat16)
    comp["flash attention"] = time_fn(
        "flash attention", lambda qq, kf: _fa.flash_attention(
            qq, kf, kf, causal=True, sm_scale=float(d) ** -0.5), qf, qf)

    # cache write: two dynamic_update_slice of one layer's [1, T, Hkv, D]
    cache = KVCache.create(cfg, 1, t_len + 8, dtype=jnp.bfloat16)
    kv = jax.random.normal(key, (1, t_len, cfg.num_kv_heads, d), jnp.bfloat16)

    def cache_write(kk, ck, cv):
        zero = (0,) * ck.ndim
        nk = jax.lax.dynamic_update_slice(ck, kk.astype(ck.dtype), zero)
        nv = jax.lax.dynamic_update_slice(cv, kk.astype(cv.dtype), zero)
        return (nk.reshape(-1)[:1] + nv.reshape(-1)[:1])

    comp["kv cache write"] = time_fn(
        "kv cache write (x1 layer)", cache_write, kv, cache.k[0], cache.v[0])

    comp["lm_head (/32)"] = time_fn(
        "lm_head bf16",
        lambda xx, lm: (xx.reshape(-1, lm.kernel.shape[0]) @ lm.kernel),
        x, params["lm_head"]) / L

    per_layer = sum(comp.values())
    print(f"\n{'component sum x{} layers'.format(L):28s} {per_layer * L:8.1f} ms")
    print(f"{'unaccounted (glue/fusion)':28s} {full_ms - per_layer * L:8.1f} ms")


if __name__ == "__main__":
    main()
