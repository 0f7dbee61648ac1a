"""Hardware numerics smoke for the manual-pipelined kb32l decode kernel.

Interpret mode validates the math but NOT the DMA/compute ordering on real
hardware (a race between the slot refill and the vector reads would corrupt
values only on-device). Run on the v5e BEFORE trusting the manual e2e
bench:    python scripts/smoke_kb32l_manual.py [K] [N] [gs]
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from autogptq_tpu.ops import packing, quantlinear
from autogptq_tpu.ops.pallas import gemm

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
GS = int(sys.argv[3]) if len(sys.argv) > 3 else 128

rng = np.random.default_rng(0)
g = K // GS
iw = rng.integers(0, 16, size=(K, N)).astype(np.uint32)
scales = (rng.random((g, N)) * 0.05 + 0.01).astype(np.float16)
zeros = rng.integers(1, 16, size=(g, N)).astype(np.int64)
packed = quantlinear.PackedQuantLinear(
    qweight=jnp.asarray(packing.pack_qweight(iw, 4)),
    qzeros=jnp.asarray(packing.pack_qzeros(zeros, 4)),
    scales=jnp.asarray(scales),
    g_idx=jnp.asarray((np.arange(K) // GS).astype(np.int32)),
    bias=None, bits=4, group_size=GS, in_features=K, out_features=N,
)
ql = quantlinear.from_packed(packed, layout="kb32l")
w_ref = packing.dequantize(
    np.asarray(packed.qweight), np.asarray(packed.qzeros), scales,
    np.asarray(packed.g_idx), 4)

print("devices:", jax.devices(), flush=True)
for m in (1, 4, 8):
    x = (rng.standard_normal((m, K)) * 0.1).astype(np.float32)
    y_ref = x @ w_ref
    for nbuf in (2, 3, 4):
        os.environ["AUTOGPTQ_TPU_KB32L_MANUAL"] = str(nbuf)
        y = np.asarray(gemm.matmul_pallas(jnp.asarray(x, jnp.bfloat16), ql),
                       np.float32)
        rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
        status = "OK" if rel < 2e-2 else "FAIL"
        print(f"M={m} nbuf={nbuf}  relerr={rel:.3e}  {status}", flush=True)
    # repeated runs with the SAME compiled fn: a DMA race shows up as
    # nondeterminism even when one draw happens to pass
    os.environ["AUTOGPTQ_TPU_KB32L_MANUAL"] = "4"
    y1 = np.asarray(gemm.matmul_pallas(jnp.asarray(x, jnp.bfloat16), ql))
    y2 = np.asarray(gemm.matmul_pallas(jnp.asarray(x, jnp.bfloat16), ql))
    print(f"M={m} determinism: {np.array_equal(y1, y2)}", flush=True)
os.environ.pop("AUTOGPTQ_TPU_KB32L_MANUAL", None)
