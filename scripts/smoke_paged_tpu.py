"""Paged-attention KERNEL path smoke on the real TPU: the stock Pallas
paged-attention kernel (use_kernel=True) must produce the same tokens as
the jnp gather reference (use_kernel=False) and as sequential generate, on
a real-sized-enough model; prints an aggregate-throughput number.

    python scripts/smoke_paged_tpu.py [new_tokens]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from autogptq_tpu.serving import Request  # noqa: E402
from autogptq_tpu.serving_paged import PagedContinuousBatchEngine  # noqa: E402


class Shim:
    def __init__(self, params, cfg):
        self.params, self.cfg = params, cfg
        self.backend, self.dtype = "auto", jnp.bfloat16


def main():
    new_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    params, cfg = bench.build_model(layers=8)   # 8-layer 7B-width slice
    model = Shim(params, cfg)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 1000, size=(int(n),)).astype(np.int32)
               for n in (24, 48, 96, 33)]
    reqs = lambda: [Request(i, p, max_new_tokens=new_tokens)
                    for i, p in enumerate(prompts)]

    kern = PagedContinuousBatchEngine(
        model, max_slots=4, total_pages=256, page_size=16, pages_per_seq=64,
        use_kernel=True,
    )
    out_k = kern.run(reqs())                    # compile + run
    t0 = time.perf_counter()
    out_k = PagedContinuousBatchEngine(
        model, max_slots=4, total_pages=256, page_size=16, pages_per_seq=64,
        use_kernel=True,
    ).run(reqs())
    dt = time.perf_counter() - t0

    ref = PagedContinuousBatchEngine(
        model, max_slots=4, total_pages=256, page_size=16, pages_per_seq=64,
        use_kernel=False,
    ).run(reqs())
    for rid in ref:
        assert np.array_equal(out_k[rid], ref[rid]), \
            f"kernel != reference for request {rid}"
    total = sum(len(v) for v in out_k.values())
    print(f"paged kernel == jnp reference for {len(ref)} requests; "
          f"{total} tokens in {dt:.2f}s = {total / dt:.1f} aggregate tok/s")


if __name__ == "__main__":
    main()
