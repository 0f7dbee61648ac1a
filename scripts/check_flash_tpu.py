"""Flash-attention numerics on hardware, two tight like-for-like checks:

1. flash(block=512) vs flash(block=128) on identical q/k/v — same kernel,
   different tiling; f32 accumulation makes reassociation drift tiny.
2. flash f32 vs exact einsum attention on the same q/k/v.

(Comparing full-model flash-vs-xla prefills also swaps the quantized
matmul backend, which dominates the diff — that comparison is meaningless
for attention numerics.)
"""
import sys

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu import flash_attention as fa

H, D, T = 8, 128, 1024
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((1, H, T, D)) * 0.3, jnp.float32)
k = jnp.asarray(rng.standard_normal((1, H, T, D)) * 0.3, jnp.float32)
v = jnp.asarray(rng.standard_normal((1, H, T, D)) * 0.3, jnp.float32)
scale = D ** -0.5


def blocks(n):
    return fa.BlockSizes(
        block_q=n, block_k_major=n, block_k=n, block_b=1,
        block_q_major_dkv=n, block_k_major_dkv=n, block_k_dkv=n,
        block_q_dkv=n, block_k_major_dq=n, block_k_dq=n, block_q_dq=n)


o512 = np.asarray(fa.flash_attention(
    q, k, v, causal=True, sm_scale=scale, block_sizes=blocks(512)))
o128 = np.asarray(fa.flash_attention(
    q, k, v, causal=True, sm_scale=scale, block_sizes=blocks(128)))
# NOTE: on hardware the kernel's dots run at the TPU default matmul
# precision (bf16 products), and different tiles split the reduction
# differently — interpret mode shows the tile logic itself is exact to
# 7e-8. Assert on scale-aware metrics, not near-zero-relative blowups.
scale_ref = np.abs(o128).max()
d1 = np.abs(o512 - o128).max() / scale_ref
d1m = np.mean(np.abs(o512 - o128)) / scale_ref
print(f"flash 512 vs 128 tiles: max {d1:.3e} mean {d1m:.3e} (of out scale)")

s = jnp.einsum("bhtd,bhsd->bhts", q, k,
               precision=jax.lax.Precision.HIGHEST) * scale
mask = jnp.tril(jnp.ones((T, T), bool))
s = jnp.where(mask[None, None], s, -1e30)
p = jax.nn.softmax(s, axis=-1)
ref = np.asarray(jnp.einsum("bhts,bhsd->bhtd", p, v,
                            precision=jax.lax.Precision.HIGHEST))
d2 = np.abs(o512 - ref).max() / np.abs(ref).max()
d2m = np.mean(np.abs(o512 - ref)) / np.abs(ref).max()
print(f"flash 512 vs exact einsum: max {d2:.3e} mean {d2m:.3e} (of out scale)")

assert d1 < 5e-2 and d1m < 1e-3, "tiling changed flash numerics beyond bf16 product noise"
assert d2 < 5e-2 and d2m < 1e-3, "flash diverges from exact attention"
print("FLASH NUMERICS OK")
