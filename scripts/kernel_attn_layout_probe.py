"""Probe: decode-attention cache layout [B,S,H,D] (shipped) vs [B,H,S,D].

Hypothesis for the batch-8 efficiency gap (532 vs ~850 expected aggregate
tok/s): the decode einsum "bthrd,bshd->bhrts" contracts d with batch dims
(b,h) non-adjacent in the [B,S,H,D] cache, so XLA physically transposes
the whole cache per layer per step. [B,H,S,D] puts batch dims leading and
the contraction last for BOTH attention dots (QK over d, PV over s needs
probs [B,H,1,S] x values [B,H,S,D] — s adjacent) — no transpose.

Times ONE layer's full decode-attention chain (scatter write + QK +
softmax + PV) over the cache, slope-timed, for both layouts, plus a
pure cache-read baseline.

    python scripts/kernel_attn_layout_probe.py [B] [S] [H] [D]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from scripts.bench_util import slope_time  # noqa: E402

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
S = int(sys.argv[2]) if len(sys.argv) > 2 else 272
H = int(sys.argv[3]) if len(sys.argv) > 3 else 32
D = int(sys.argv[4]) if len(sys.argv) > 4 else 128

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, 1, H, D)) * 0.1, jnp.bfloat16)
k_new = jnp.asarray(rng.standard_normal((B, 1, H, D)) * 0.1, jnp.bfloat16)
v_new = jnp.asarray(rng.standard_normal((B, 1, H, D)) * 0.1, jnp.bfloat16)
ck_bshd = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.1, jnp.bfloat16)
cv_bshd = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.1, jnp.bfloat16)
ck_bhsd = jnp.swapaxes(ck_bshd, 1, 2)
cv_bhsd = jnp.swapaxes(cv_bshd, 1, 2)
start = jnp.full((B,), S // 2, jnp.int32)
scale = D ** -0.5


def attn_bshd(q, kn, vn, ck, cv, start):
    rows = jnp.arange(B)
    ck = ck.at[rows, start].set(kn[:, 0])
    cv = cv.at[rows, start].set(vn[:, 0])
    mask = jnp.arange(S)[None, None, :] <= start[:, None, None]
    logits = jnp.einsum(
        "bthd,bshd->bhts", q.astype(jnp.float32), ck.astype(jnp.float32)
    ) * scale
    logits = jnp.where(mask[:, None, :, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs, cv.astype(jnp.float32))
    return out.astype(jnp.bfloat16), ck, cv


def attn_bhsd(q, kn, vn, ck, cv, start):
    rows = jnp.arange(B)
    ck = ck.at[rows, :, start].set(kn[:, 0])
    cv = cv.at[rows, :, start].set(vn[:, 0])
    mask = jnp.arange(S)[None, None, :] <= start[:, None, None]
    logits = jnp.einsum(
        "bthd,bhsd->bhts", q.astype(jnp.float32), ck.astype(jnp.float32)
    ) * scale
    logits = jnp.where(mask[:, None, :, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bhsd->bthd", probs, cv.astype(jnp.float32))
    return out.astype(jnp.bfloat16), ck, cv


def read_only(q, kn, vn, ck, cv, start):
    # pure bandwidth floor: touch both caches once, no dots
    s = ck.astype(jnp.float32).sum() + cv.astype(jnp.float32).sum()
    return (q + s.astype(jnp.bfloat16)), ck, cv


kv_bytes = 2 * B * S * H * D * 2

for name, f, ck, cv in (
    ("bshd (shipped)", attn_bshd, ck_bshd, cv_bshd),
    ("bhsd", attn_bhsd, ck_bhsd, cv_bhsd),
    ("read-floor", read_only, ck_bhsd, cv_bhsd),
):
    def wrapped(qq, f=f, ck=ck, cv=cv):
        out, _, _ = f(qq, k_new, v_new, ck, cv, start)
        return out.reshape(B, -1)

    t = slope_time(wrapped, q)
    print(
        f"{name:15s} {t*1e6:8.2f} us   cacheBW {kv_bytes/t/1e9:7.1f} GB/s",
        flush=True,
    )
