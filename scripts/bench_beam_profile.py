"""Decompose the paged beam-4 step time (same-process, 7B shapes).

  T1: the 7 quantized matmuls x 32 layers at M=4 (weights only, no attn)
  T2: the stock paged-attention kernel alone, 32 calls at beam shapes
  T3: the pool token-write scatter alone, 32 layers x 2 pools
  T5: page copy-on-share (2 pools x 4 pages)

    python scripts/bench_beam_profile.py [gen_len]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench
from scripts.bench_util import slope_time

GEN = int(sys.argv[1]) if len(sys.argv) > 1 else 512

params, cfg = bench.build_model()
bk = 4
L, H, HKV, D = cfg.num_layers, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
ps = 16
total = 16 + GEN
pps = -(-total // ps)
gmax = -(-GEN // ps) + 1
P = 1 + pps + bk * gmax
W = -(-(pps + gmax) // 8) * 8
print(f"bk={bk} pages={P} pool={L * HKV * P * ps * D * 2 / 1e6:.0f} MB x2")

rng = np.random.default_rng(0)
k_pool = jnp.zeros((L, HKV, P, ps, D), jnp.bfloat16)
v_pool = jnp.zeros((L, HKV, P, ps, D), jnp.bfloat16)
tables = jnp.asarray(rng.integers(1, P, size=(bk, W)), jnp.int32)
lengths = jnp.full((bk,), total // 2, jnp.int32)
x0 = jnp.asarray(rng.standard_normal((bk, cfg.hidden_size)), jnp.bfloat16)

from autogptq_tpu.models import arch  # noqa: E402
from autogptq_tpu.ops import quantlinear as q  # noqa: E402


def t1_weights(x, params, k_pool, v_pool):
    for bp in params["layers"]:
        ap = bp["attn"]
        h = arch.apply_norm(bp["input_norm"], x[:, None], cfg)[:, 0]
        qq = q.matmul(h, ap["q_proj"], backend="auto")
        kk = q.matmul(h, ap["k_proj"], backend="auto")
        vv = q.matmul(h, ap["v_proj"], backend="auto")
        x = x + q.matmul(qq + kk + vv, ap["o_proj"], backend="auto")
        h2 = arch.apply_norm(bp["post_norm"], x[:, None], cfg)[:, 0]
        g = q.matmul(h2, bp["mlp"]["gate_proj"], backend="auto")
        u = q.matmul(h2, bp["mlp"]["up_proj"], backend="auto")
        x = x + q.matmul(jax.nn.silu(g) * u, bp["mlp"]["down_proj"], backend="auto")
    return x[:, :1]


def make_t2_paged_attn(ppcb):
    def t2(x, params, k_pool, v_pool):
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention,
        )

        qv = jnp.broadcast_to(x[:, :D][:, None, :], (bk, H, D)).astype(jnp.bfloat16)
        acc = jnp.zeros((bk, 1))
        for i in range(L):
            o = paged_attention(qv, k_pool[i], v_pool[i], lengths, tables,
                                pages_per_compute_block=ppcb)
            acc = acc + o[:, 0, :1].astype(jnp.float32)
        return acc

    return t2


def make_t2_mh(wb):
    """T2 variant for the SHIPPED decode path: the multi-head-per-DMA kernel
    over page-major pools, tables sliced to the live window wb (what
    _generate_beam_paged / serving_paged actually execute per step)."""
    from autogptq_tpu.ops.pallas.paged_attn import paged_attention_mh

    k_pm = jnp.zeros((P, HKV, ps, D), jnp.bfloat16)
    v_pm = jnp.zeros((P, HKV, ps, D), jnp.bfloat16)
    tw = tables[:, :wb]

    def t2(x, params, k_pool, v_pool):
        qv = jnp.broadcast_to(x[:, :D][:, None, :], (bk, H, D)).astype(jnp.bfloat16)
        acc = jnp.zeros((bk, 1))
        for _ in range(L):
            o = paged_attention_mh(qv, k_pm, v_pm, lengths, tw,
                                   sm_scale=D ** -0.5)
            acc = acc + o[:, 0, :1].astype(jnp.float32)
        return acc

    return t2


def t3_scatter(x, params, k_pool, v_pool):
    kp, vp = k_pool, v_pool
    rows = jnp.arange(bk)
    page_of = tables[rows, 3]
    off = rows % ps
    kk = jnp.broadcast_to(x[:, :D][:, None, :], (bk, HKV, D)).astype(jnp.bfloat16)
    for i in range(L):
        kp = kp.at[i, :, page_of, off].set(kk)
        vp = vp.at[i, :, page_of, off].set(kk)
    return (kp[0, 0, 0, 0, :1] + vp[0, 0, 0, 0, :1]).reshape(1, 1)


def t5_pagecopy(x, params, k_pool, v_pool):
    kp, vp = k_pool, v_pool
    src = tables[jnp.arange(bk), 2]
    dst = tables[jnp.arange(bk), 4]
    kp = kp.at[:, :, dst].set(kp[:, :, src] + x[0, 0].astype(jnp.bfloat16))
    vp = vp.at[:, :, dst].set(vp[:, :, src])
    return (kp[0, 0, 0, 0, :1] + vp[0, 0, 0, 0, :1]).reshape(1, 1)


def t4_unembed_topk(x, params, k_pool, v_pool):
    logits = arch.unembed(params, x[:, None], cfg)[:, -1, :]
    lp = jax.nn.log_softmax(logits.astype(jnp.float32)).reshape(1, -1)
    s2k, idx = jax.lax.top_k(lp, 2 * bk)
    return s2k[:, :1]


probes = [("T1 weights-only", t1_weights)]
for ppcb in (8, 16, 24):
    if W % ppcb == 0:
        # baseline: the stock head-major kernel beam used BEFORE round 3
        probes.append((f"T2 stock ppcb={ppcb}", make_t2_paged_attn(ppcb)))
from autogptq_tpu.ops.pallas.paged_attn import page_window_bucket  # noqa: E402

wb_live = page_window_bucket(int(lengths[0]) + 1, ps, W)
for wb in sorted({wb_live, W}):
    probes.append((f"T2 mh wb={wb}", make_t2_mh(wb)))
probes += [("T3 scatter x32", t3_scatter),
           ("T4 unembed+topk", t4_unembed_topk),
           ("T5 page copy", t5_pagecopy)]


# -- shipped-path variants: page-major pools + the dus-chain helpers --------
from autogptq_tpu.ops.pallas import paged_attn as _pa  # noqa: E402


def t3b_dus_write(x, params, kp, vp):
    rows = jnp.arange(bk)
    page_of = tables[rows, 3]
    off = rows % ps
    kk = jnp.broadcast_to(x[:, :D][:, None, :], (bk, HKV, D)).astype(jnp.bfloat16)
    for i in range(L):
        kp = _pa.write_token_pages(kp, i, page_of, off, kk)
        vp = _pa.write_token_pages(vp, i, page_of, off, kk)
    return (kp[0, 0, 0, 0, :1] + vp[0, 0, 0, 0, :1]).reshape(1, 1)


def t5b_dus_copy(x, params, kp, vp):
    src = tables[jnp.arange(bk), 2]
    dst = tables[jnp.arange(bk), 4]
    kp = _pa.copy_pages(kp, src, dst)
    vp = _pa.copy_pages(vp, src, dst)
    return ((kp[0, 0, 0, 0, :1] + x[0, 0].astype(jnp.bfloat16))
            + vp[0, 0, 0, 0, :1]).reshape(1, 1)


for name, fn in probes:
    try:
        t = slope_time(fn, x0, n1=20, n2=220, args=(params, k_pool, v_pool))
    except Exception as e:
        print(f"{name:22s} FAILED {type(e).__name__}: {e}", flush=True)
        continue
    print(f"{name:22s} {t * 1e3:8.3f} ms/step", flush=True)

# page-major pools for the shipped-path probes (threaded as args — a
# closure-captured pool becomes compile-payload constants -> tunnel 413)
k_pm_pool = jnp.zeros((L, P, HKV, ps, D), jnp.bfloat16)
v_pm_pool = jnp.zeros((L, P, HKV, ps, D), jnp.bfloat16)
for name, fn in [("T3b dus write x32", t3b_dus_write),
                 ("T5b dus page copy", t5b_dus_copy)]:
    try:
        t = slope_time(fn, x0, n1=20, n2=220, args=(params, k_pm_pool, v_pm_pool))
    except Exception as e:
        print(f"{name:22s} FAILED {type(e).__name__}: {e}", flush=True)
        continue
    print(f"{name:22s} {t * 1e3:8.3f} ms/step", flush=True)
