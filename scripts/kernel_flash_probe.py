"""Flash-attention block-size sweep at 7B prefill shapes (same-process).

    python scripts/kernel_flash_probe.py [t_len]
"""
import sys

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu import flash_attention as fa

from scripts.bench_util import slope_time

T = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
H, D = 32, 128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((1, H, T, D)) * 0.1, jnp.bfloat16)
x0 = jnp.asarray(rng.standard_normal((1, D)), jnp.bfloat16)
flops = 2 * 2 * T * T * D * H / 2          # causal halves the work

print("devices:", jax.devices(), flush=True)
for blk in (128, 256, 512, 1024):
    if T % blk:
        continue
    bs = fa.BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )

    def f(x, qq, bs=bs):
        o = fa.flash_attention(
            qq + x[0, 0].astype(qq.dtype) * 0, qq, qq, causal=True,
            sm_scale=D ** -0.5, block_sizes=bs)
        return o[0, 0, :1, :1].astype(jnp.float32)

    t = slope_time(f, x0, n1=10, n2=110, args=(q,))
    print(f"block={blk:5d}  {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TFLOP/s",
          flush=True)
