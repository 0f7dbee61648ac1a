"""Paged-attention KERNEL path smoke on the real TPU.

Correctness gate: the multi-head-per-DMA paged-attention kernel
(ops/pallas/paged_attn.py, page-major pools) vs the exact jnp gather
reference on random pages — NUMERIC comparison (token equality over long
greedy runs is meaningless on random weights: the two paths round in
different orders and a single argmax flip cascades). Also slope-times the
kernel at beam-4 7B shapes (the stock per-(page, head)-DMA kernel this
replaces was the suspected beam bottleneck).

Then runs the paged ENGINE with use_kernel=True end-to-end for a
throughput number.

    python scripts/smoke_paged_tpu.py [new_tokens]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from autogptq_tpu.ops.pallas.paged_attn import (  # noqa: E402
    paged_attention_mh,
    paged_attention_mh_ref,
)
from autogptq_tpu.serving import Request  # noqa: E402
from autogptq_tpu.serving_paged import PagedContinuousBatchEngine  # noqa: E402


class Shim:
    def __init__(self, params, cfg):
        self.params, self.cfg = params, cfg
        self.backend, self.dtype = "auto", jnp.bfloat16


def check_kernel_numerics() -> None:
    rng = np.random.default_rng(0)
    B, H, HKV, D, PAGE, PPS, P = 4, 32, 32, 128, 16, 40, 256
    q = jnp.asarray(rng.standard_normal((B, H, D)) * 0.3, jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((P, HKV, PAGE, D)) * 0.3, jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((P, HKV, PAGE, D)) * 0.3, jnp.bfloat16)
    lengths = jnp.asarray([25, 490, 397, 634], jnp.int32)
    tables = jnp.asarray(rng.integers(1, P, size=(B, PPS)), jnp.int32)
    scale = D ** -0.5
    ref = np.asarray(
        paged_attention_mh_ref(q, kp, vp, lengths, tables, sm_scale=scale),
        np.float32)
    out = np.asarray(
        paged_attention_mh(q, kp, vp, lengths, tables, sm_scale=scale),
        np.float32)
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2, f"mh paged kernel diverges from reference: rel={rel}"
    print(f"mh paged kernel vs jnp reference: max rel diff {rel:.2e} OK",
          flush=True)

    from scripts.bench_util import slope_time

    t = slope_time(
        lambda qq: paged_attention_mh(qq, kp, vp, lengths, tables,
                                      sm_scale=scale)[:, 0, :1],
        q, n1=50, n2=1050, reps=3)
    live = float(np.asarray(lengths, np.float32).sum())
    bytes_ = live * HKV * D * 2 * 2          # K+V bf16, live tokens
    read = B * PPS * PAGE * HKV * D * 2 * 2  # window reads (incl. dead pages)
    print(f"mh kernel 1-layer beam-shape: {t * 1e6:.2f} us  "
          f"live {bytes_ / t / 1e9:.1f} GB/s  window {read / t / 1e9:.1f} GB/s",
          flush=True)


def main():
    new_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    check_kernel_numerics()

    params, cfg = bench.build_model(layers=8)   # 8-layer 7B-width slice
    model = Shim(params, cfg)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 1000, size=(int(n),)).astype(np.int32)
               for n in (24, 48, 96, 33)]
    reqs = lambda: [Request(i, p, max_new_tokens=new_tokens)
                    for i, p in enumerate(prompts)]

    mk = lambda: PagedContinuousBatchEngine(
        model, max_slots=4, total_pages=256, page_size=16, pages_per_seq=64,
        use_kernel=True,
    )
    out = mk().run(reqs())                      # compile + run
    assert all(len(v) == new_tokens for v in out.values())
    t0 = time.perf_counter()
    out = mk().run(reqs())
    dt = time.perf_counter() - t0
    total = sum(len(v) for v in out.values())
    print(f"paged engine (kernel path): {total} tokens in {dt:.2f}s = "
          f"{total / dt:.1f} aggregate tok/s")


if __name__ == "__main__":
    main()
