"""Per-bit-width decode kernel bench: new kquad (2-bit) / koct (8-bit)
layouts vs the planar shift/mask path they replace (VERDICT r1 item 7).

Slope-timed through the tunnel (see bench_kernel.py). Run on the real TPU:
    python scripts/bench_widths.py [K] [N] [gs] [M]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

from scripts.bench_util import slope_time  # noqa: E402

import jax
import jax.numpy as jnp

from autogptq_tpu.ops import packing, quantlinear
from autogptq_tpu.ops.pallas import gemm

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
GS = int(sys.argv[3]) if len(sys.argv) > 3 else 128
M = int(sys.argv[4]) if len(sys.argv) > 4 else 1

rng = np.random.default_rng(0)


def build(bits, force_planar=False):
    # per-call deterministic draw: the planar rebuild must quantize the
    # SAME weights as the default-layout build its relerr is judged against
    rng = np.random.default_rng(1234 + bits)
    g = K // GS
    scales = (rng.random((g, N)) * 0.02 + 0.005).astype(np.float16)
    zeros = rng.integers(1, 2 ** bits, size=(g, N)).astype(np.int64)
    g_idx = (np.arange(K) // GS).astype(np.int32)
    iw = rng.integers(0, 2 ** bits, size=(K, N)).astype(np.uint32)
    packed = quantlinear.PackedQuantLinear(
        qweight=jnp.asarray(packing.pack_qweight(iw, bits)),
        qzeros=jnp.asarray(packing.pack_qzeros(zeros, bits)),
        scales=jnp.asarray(scales), g_idx=jnp.asarray(g_idx), bias=None,
        bits=bits, group_size=GS, in_features=K, out_features=N,
    )
    ql = quantlinear.from_packed(packed)
    if force_planar and ql.layout != "planar":
        planes = quantlinear._planes(bits)
        n_pad = -(-N // (128 * planes)) * (128 * planes)
        iw_p = np.pad(iw, ((0, 0), (0, n_pad - N)))
        sc = np.pad(scales.astype(np.float32), ((0, 0), (0, n_pad - N)))
        zr = np.pad(zeros, ((0, 0), (0, n_pad - N)))
        c = n_pad // planes
        ql = quantlinear.QuantLinear(
            wp=jnp.asarray(quantlinear._plane_pack(iw_p, bits, n_pad)),
            scales=jnp.asarray(sc.reshape(g, planes, c)),
            zeros=jnp.asarray(zr.astype(np.uint8).reshape(g, planes, c)),
            kperm=None, bias=None, bits=bits, group_size=GS,
            in_features=K, out_features=N, n_pad=n_pad, layout="planar",
        )
    iw_f = iw.astype(np.float32)
    w_ref = iw_f * scales.astype(np.float32)[g_idx] - (
        zeros.astype(np.float32) * scales.astype(np.float32))[g_idx]
    return ql, w_ref




x = rng.standard_normal((M, K)).astype(np.float32)
xb = jnp.asarray(x, dtype=jnp.bfloat16)
print("devices:", jax.devices(), flush=True)

for bits in (2, 3, 4, 8):
    ql_new, w_ref = build(bits)
    ql_old, _ = build(bits, force_planar=True)
    y_ref = x @ w_ref
    # HBM traffic uses the RUNTIME storage width (3-bit is nibble-padded,
    # VERDICT r2 weak #5 — the row quantifies its 1.33x traffic tax)
    sb = quantlinear._storage_bits(bits)
    for name, ql in ((f"{bits}bit {ql_new.layout}", ql_new),
                     (f"{bits}bit planar", ql_old)):
        f = lambda xx, q=ql: gemm.matmul_pallas(xx, q)
        y = np.asarray(jax.jit(f)(xb), dtype=np.float32)
        rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
        t = slope_time(f, xb)
        # planar ALSO nibble-pads 3-bit (_planes(3)=2 -> 4 bits/weight)
        gbps = (K * N * sb / 8) / t / 1e9
        eff = (K * N * bits / 8) / t / 1e9
        print(f"{name:14s} relerr={rel:.3e}  {t*1e6:8.1f} us  "
              f"storedBW {gbps:7.1f} GB/s  effBW {eff:7.1f} GB/s",
              flush=True)
