"""Serving-engine benchmark under concurrent load (real TPU).

Runs the contiguous-KV ContinuousBatchEngine and the paged-KV engine over
the same 8-request workload on the 7B-shaped model and reports aggregate
generated tok/s (the reference has no serving layer; the comparison points
are our own single-stream decode and the batch-8 generate number).

IMPORTANT caveat (docs/PARITY.md): the engines are host-driven — every
step syncs through the axon tunnel (~30 ms RTT), so absolute engine tok/s
in THIS environment is tunnel-latency-bound. The number still tracks
step-graph improvements (window bucketing, scatter fusion) because the
per-step device time dominates at 7B scale.

    python scripts/bench_serving_engines.py [new_tokens] [slots]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench
from autogptq_tpu.serving import ContinuousBatchEngine, Request

NEW = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SLOTS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def requests(rng):
    return [
        Request(req_id=i, prompt=rng.integers(0, 1000, size=(16,)).astype(np.int32),
                max_new_tokens=NEW)
        for i in range(SLOTS)
    ]


def run_contiguous(model, rng, decode_block=1):
    eng = ContinuousBatchEngine(model, max_slots=SLOTS, max_seq_len=256,
                                prefill_chunk=None, decode_block=decode_block)
    eng.warmup(buckets=(32,), sampling=False)
    out = eng.run(requests(rng))          # includes first-step compiles
    t0 = time.perf_counter()
    out = eng.run(requests(rng))
    dt = time.perf_counter() - t0
    tot = sum(len(v) for v in out.values())
    print(f"contiguous engine (block={decode_block}): {tot} tokens in "
          f"{dt:.2f}s = {tot/dt:.1f} aggregate tok/s ({SLOTS} concurrent)",
          flush=True)
    print(f"  stats: {eng.stats.snapshot()}", flush=True)


def run_paged(model, rng, decode_block=1):
    from autogptq_tpu.serving_paged import PagedContinuousBatchEngine

    eng = PagedContinuousBatchEngine(
        model, max_slots=SLOTS, total_pages=SLOTS * 16 + 8, page_size=16,
        pages_per_seq=16, decode_block=decode_block)
    out = eng.run(requests(rng))
    t0 = time.perf_counter()
    out = eng.run(requests(rng))
    dt = time.perf_counter() - t0
    tot = sum(len(v) for v in out.values())
    print(f"paged engine (block={decode_block}):      {tot} tokens in "
          f"{dt:.2f}s = {tot/dt:.1f} aggregate tok/s ({SLOTS} concurrent)",
          flush=True)
    print(f"  stats: {eng.stats.snapshot()}", flush=True)


def run_paged_prefix_cache(model, rng):
    """TTFT benefit of automatic prefix caching: every request shares a
    page-aligned 'system prompt' prefix; the second wave's prefills compute
    only the per-request suffix."""
    from autogptq_tpu.serving_paged import PagedContinuousBatchEngine

    eng = PagedContinuousBatchEngine(
        model, max_slots=SLOTS, total_pages=SLOTS * 24 + 8, page_size=16,
        pages_per_seq=24, enable_prefix_cache=True)
    system = rng.integers(0, 1000, size=(128,)).astype(np.int32)

    def wave(base):
        return [
            Request(req_id=base + i,
                    prompt=np.concatenate(
                        [system,
                         rng.integers(0, 1000, size=(9,)).astype(np.int32)]),
                    max_new_tokens=NEW)
            for i in range(SLOTS)
        ]

    t0 = time.perf_counter()
    eng.run(wave(0))               # first wave: one cold + 7 hits
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng.run(wave(100))             # second wave: ALL prefix hits
    warm = time.perf_counter() - t0
    print(f"paged+prefix-cache: wave1 {cold:.2f}s, wave2 {warm:.2f}s "
          f"(128-token shared prefix, {SLOTS} requests/wave)", flush=True)
    print(f"  stats: {eng.stats.snapshot()}", flush=True)


def main():
    rng = np.random.default_rng(0)
    params, cfg = bench.build_model()
    model = bench._Shim(params, cfg)
    run_contiguous(model, rng)
    run_contiguous(model, rng, decode_block=8)
    run_paged(model, rng)
    run_paged(model, rng, decode_block=8)
    run_paged_prefix_cache(model, rng)


if __name__ == "__main__":
    main()
