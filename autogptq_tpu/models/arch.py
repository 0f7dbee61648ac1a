"""Generic decoder-only transformer engine (functional JAX).

The reference implements 31 model families as declarative name-lists over HF
torch modules (/root/reference/auto_gptq/modeling/*.py). Here the equivalent
is ONE pure-functional transformer parameterized by :class:`ArchConfig`;
each family module only supplies (a) an HF-config translation, (b) an HF
checkpoint name map, and (c) the quantization ordering lists (the analog of
``inside_layer_modules``).

Everything is jit-compatible: static shapes, KV cache as a fixed-size pytree
with a write cursor, linear layers dispatched between dense bf16 and
quantized (Pallas / XLA fallback) at trace time based on pytree node type.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops import quantlinear as qlin


@dataclasses.dataclass(frozen=True)
class ArchConfig:
    """Static architecture description (hashable; safe as a jit static arg)."""

    model_type: str = "llama"
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    intermediate_size: int = 11008
    max_position_embeddings: int = 2048
    # "rmsnorm" | "layernorm"
    norm_type: str = "rmsnorm"
    norm_eps: float = 1e-5
    # "rope" (neox/llama interleaved-halves) | "rope_gptj" (even/odd) |
    # "learned" (OPT/GPT2 positional table) | "alibi" | "none"
    pos_embedding: str = "rope"
    rope_theta: float = 10000.0
    rotary_dim: Optional[int] = None          # partial rotary (GPT-J, NeoX, phi)
    # "silu_glu" (gate/up), "gelu_glu", "gelu", "gelu_new", "relu"
    mlp_act: str = "silu_glu"
    parallel_block: bool = False              # GPT-J/NeoX-style attn+mlp in parallel
    # NeoX-style parallel residual: the MLP reads post_norm(x) rather than
    # the attention's input_norm(x) (GPT-J shares one norm).
    parallel_norms: bool = False
    # Bloom: LayerNorm right after the embedding lookup.
    embed_norm: bool = False
    attn_qkv_bias: bool = False
    attn_out_bias: bool = False
    mlp_bias: bool = False
    tie_word_embeddings: bool = False
    # OPT applies final layer norm; GPT2 uses ln_f; llama rms final norm.
    final_norm: bool = True
    # learned-position offset (OPT uses +2)
    pos_offset: int = 0
    # scale embeddings by sqrt(hidden) (gemma)
    scale_embedding: bool = False
    # normalize before lm head with embedding scale etc are handled per family
    moe_num_experts: int = 0                  # >0 => Mixtral-style MoE MLP
    moe_top_k: int = 2
    # attention softmax scale override (None => 1/sqrt(head_dim))
    attn_scale: Optional[float] = None
    sliding_window: Optional[int] = None      # mistral
    # gemma2: sliding window only on even layers
    sliding_window_every_other: bool = False
    # gemma-style RMSNorm multiplies by (1 + weight)
    norm_plus_one: bool = False
    # gemma2 "sandwich" norms: extra norms on attn/mlp OUTPUTS
    post_sublayer_norms: bool = False
    # classic post-layernorm blocks (norm AFTER each residual add, e.g. OPT
    # with do_layer_norm_before=False — opt-350m); default is pre-norm
    pre_norm: bool = True
    # gemma2 logit softcaps; cohere logit scale
    attn_softcap: Optional[float] = None
    final_softcap: Optional[float] = None
    logit_scale: Optional[float] = None
    # Baichuan2 NormHead: lm_head rows L2-normalized at inference (official
    # modeling_baichuan.py NormHead.forward; detected by the v2 vocab size)
    lm_head_normalize: bool = False
    # qwen-v1 long-context extensions (official modeling_qwen.py): logn
    # attention scaling (q *= max(1, log_L(pos+1))) and dynamic-NTK rope,
    # both keyed on the training seq_length
    logn_attn_seq_len: Optional[int] = None
    rope_ntk_seq_len: Optional[int] = None
    # --- MLA (multi-head latent attention, minicpm3/deepseek-v2 style) ---
    # head_dim must be qk_nope_head_dim + qk_rope_head_dim; the KV cache
    # stores per-head K at that width and V zero-padded to it.
    attn_variant: str = "mha"                  # "mha" | "mla"
    q_lora_rank: Optional[int] = None
    kv_lora_rank: Optional[int] = None
    qk_nope_head_dim: Optional[int] = None
    qk_rope_head_dim: Optional[int] = None
    v_head_dim: Optional[int] = None
    # minicpm: scale_emb on embeddings, scale_depth/sqrt(L) on residual adds
    embed_scale: Optional[float] = None
    residual_scale: Optional[float] = None
    # longrope-style per-dim inverse-frequency divisors + attention factor
    rope_factors: Optional[tuple] = None
    rope_attn_factor: Optional[float] = None
    # DeciLM-style variable GQA: kv heads per layer (num_kv_heads then holds
    # the max, sizing the uniform KV cache; unused head slots stay zero)
    num_kv_heads_per_layer: Optional[tuple] = None
    # Explicit tensor parallelism (shard_map path, parallel/tp.py): when set,
    # row-parallel partial sums (o_proj / down_proj outputs) are psum'd over
    # this mesh axis. The cfg passed into the shard_map body must already
    # carry LOCAL head/intermediate counts.
    tp_axis: Optional[str] = None
    # Sequence (context) parallelism (parallel/ring.py): when set and the
    # forward is cache-less, attention runs the ring schedule over this mesh
    # axis — the SEQUENCE dim is sharded, K/V blocks rotate via ppermute with
    # streaming-softmax accumulation. Long-context scoring/calibration path.
    sp_axis: Optional[str] = None

    @property
    def kv_repeat(self) -> int:
        return self.num_heads // self.num_kv_heads


# Escape hatch for the Pallas flash-attention prefill path (debugging /
# A-B comparisons); the per-call eligibility conditions live in attention().
FLASH_PREFILL = True

# Flash-attention tile sizes. The stock kernel defaults to 128x128 blocks
# (BlockSizes.get_default carries a "TODO: select better parameters"), which
# measured ~34 TFLOP/s on v5e at 7B prefill shapes — ~20% efficiency, 2.0 ms
# of a 7.5 ms layer. Larger q/k tiles amortize the per-block softmax
# bookkeeping; 512 measured 3.1x faster (see docs/PARITY.md round 4).
# Override with AUTOGPTQ_TPU_FLASH_BLOCK=<n> for A/Bs.
FLASH_BLOCK = int(os.environ.get("AUTOGPTQ_TPU_FLASH_BLOCK", "512"))

# Flash-DECODE kernel over the contiguous stacked cache
# (ops/pallas/flash_decode.py): "1" = on where eligible (TPU, t == 1,
# bf16/f32 cache, contiguous key validity), "0" = einsum path,
# "interpret" = run the kernel in interpret mode (CPU tests).
FLASH_DECODE = os.environ.get("AUTOGPTQ_TPU_FLASH_DECODE", "1")

# Fused norm+matmul for the decode step: the RMS norm feeding each
# quantized q/k/v/gate/up runs inside the Pallas kernel (~6 us of per-op
# latency per tiny [1, K] norm otherwise, x65 per decode token). "0" = off,
# "1" = on where eligible (fine-grained gates live in quantlinear.matmul /
# matmul_pallas, which fall back to an unfused norm elsewhere).
FUSE_NORM = os.environ.get("AUTOGPTQ_TPU_FUSE_NORM", "0")


def _prenorm_linear(node, x, norm_params, cfg, backend):
    """apply_linear(node, apply_norm(norm, x)) with the norm fused into the
    quantized decode kernel when the node/shape is eligible."""
    if isinstance(node, qlin.QuantLinear):
        return qlin.matmul(
            x, node, backend,
            prenorm=(norm_params["weight"], cfg.norm_eps, cfg.norm_plus_one),
        )
    return apply_linear(node, apply_norm(norm_params, x, cfg), backend)

# A "linear" in a params tree is either a DenseLinear or a
# quantlinear.QuantLinear; dispatch happens on node type at trace time.


@struct.dataclass
class DenseLinear:
    kernel: jnp.ndarray                 # [K, N]
    bias: Optional[jnp.ndarray] = None


def apply_linear(p: Any, x: jnp.ndarray, backend: str = "auto") -> jnp.ndarray:
    # Adapter nodes are detected by duck-typing to avoid a circular import.
    if hasattr(p, "lora_e"):
        from ..utils.peft import apply_adalora

        return apply_adalora(p, x, backend)
    if hasattr(p, "lora_a"):
        from ..utils.peft import apply_lora

        return apply_lora(p, x, backend)
    if isinstance(p, qlin.QuantLinear):
        return qlin.matmul(x, p, backend=backend)
    y = jax.lax.dot_general(
        x, p.kernel.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if p.bias is not None:
        y = y + p.bias.astype(x.dtype)
    return y


def _row_parallel_input(x: jnp.ndarray, node: Any, cfg: "ArchConfig") -> jnp.ndarray:
    """desc_act + explicit TP: a row-parallel layer's K permutation (kperm)
    is GLOBAL — each rank's K shard draws activation elements from ALL heads
    (or the full intermediate width), not just its local slice. All-gather
    the local shard into the full vector first; the node's (sharded) kperm
    then selects exactly this rank's rows of the sorted order. The gather is
    tiny next to the weight HBM traffic (decode: [B,1,K] bf16 over ICI) and
    only fires for desc_act checkpoints."""
    if cfg.tp_axis is not None and getattr(node, "kperm", None) is not None:
        return jax.lax.all_gather(x, cfg.tp_axis, axis=x.ndim - 1, tiled=True)
    return x


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float, plus_one: bool = False) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if plus_one:  # gemma-style
        w = 1.0 + w
    return (normed * w).astype(dtype)


def layer_norm(x, weight, bias, eps):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def apply_norm(norm_params: dict, x: jnp.ndarray, cfg: ArchConfig) -> jnp.ndarray:
    if cfg.norm_type == "rmsnorm":
        return rms_norm(x, norm_params["weight"], cfg.norm_eps, cfg.norm_plus_one)
    return layer_norm(x, norm_params["weight"], norm_params.get("bias"), cfg.norm_eps)


# ---------------------------------------------------------------------------
# Rotary embeddings
# ---------------------------------------------------------------------------


def _rope_freqs(cfg: ArchConfig, positions: jnp.ndarray, rotary_dim: int):
    if cfg.rope_ntk_seq_len is not None:
        # qwen-v1 dynamic NTK (official modeling_qwen.py): base scaled by
        # alpha^(d/(d-2)) with alpha = max(2^ceil(log2(len/L)+1) - 1, 1);
        # fully traceable from the positions actually being encoded, so the
        # switch stays inside jit (cached keys keep the alpha of their own
        # encode step, matching the official incremental behavior). Alpha is
        # PER ROW (max over that sequence's own positions) so batched rows
        # at different lengths — e.g. serving slots — don't share one base.
        L = float(cfg.rope_ntk_seq_len)
        seqlen = jnp.max(positions, axis=-1, keepdims=True).astype(jnp.float32) + 1.0
        ctx = jnp.ceil(jnp.log2(jnp.maximum(seqlen / L, 1.0)) + 1.0)
        alpha = jnp.maximum(2.0 ** ctx - 1.0, 1.0)          # [B, 1]
        base = cfg.rope_theta * alpha ** (rotary_dim / (rotary_dim - 2))
        inv_freq = 1.0 / (
            base[..., None]                                  # [B, 1, 1]
            ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim)
        )[:, 0, :]                                           # [B, rd/2]
        inv_freq = inv_freq[:, None, :]                      # [B, 1, rd/2]
        angles = positions.astype(jnp.float32)[..., None] * inv_freq
        cos, sin = jnp.cos(angles), jnp.sin(angles)
        if cfg.rope_attn_factor is not None:
            cos = cos * cfg.rope_attn_factor
            sin = sin * cfg.rope_attn_factor
        return cos, sin
    else:
        inv_freq = 1.0 / (
            cfg.rope_theta ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim)
        )
    if cfg.rope_factors is not None:  # longrope per-dim divisors
        inv_freq = inv_freq / jnp.asarray(cfg.rope_factors, jnp.float32)
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., T, rd/2]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    if cfg.rope_attn_factor is not None:
        cos = cos * cfg.rope_attn_factor
        sin = sin * cfg.rope_attn_factor
    return cos, sin


def apply_rope(q, k, positions, cfg: ArchConfig):
    """q/k: [B, T, H, D]; positions: [B, T]. Neox-style (rotate halves) or
    GPT-J-style (rotate even/odd pairs), with optional partial rotary_dim."""
    d = q.shape[-1]
    rd = cfg.rotary_dim or d
    cos, sin = _rope_freqs(cfg, positions, rd)  # [B, T, rd/2]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]

    def rot(x):
        x_rot, x_pass = x[..., :rd], x[..., rd:]
        if cfg.pos_embedding == "rope_gptj":
            x1 = x_rot[..., 0::2]
            x2 = x_rot[..., 1::2]
            r1 = x1 * cos - x2 * sin
            r2 = x2 * cos + x1 * sin
            out = jnp.stack([r1, r2], axis=-1).reshape(x_rot.shape)
        else:  # neox/llama: split halves
            half = rd // 2
            x1 = x_rot[..., :half]
            x2 = x_rot[..., half:]
            r1 = x1 * cos - x2 * sin
            r2 = x2 * cos + x1 * sin
            out = jnp.concatenate([r1, r2], axis=-1)
        if rd == d:
            return out.astype(x.dtype)
        return jnp.concatenate([out.astype(x.dtype), x_pass], axis=-1)

    return rot(q), rot(k)


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def cache_shapes(cfg: "ArchConfig", batch: int, max_len: int):
    """(k_shape, v_shape) of the KV cache arrays.

    MLA stores the LATENT per token — k holds the shared rope tail
    ``[.., 1, qk_rope_head_dim]``, v the compressed kv ``[.., 1,
    kv_lora_rank]`` (DeepSeek-V2 §2.1 / reference modeling/minicpm3.py
    semantics) — cutting cache bytes/token by ~2·H·d / (rkv + dr) (≈27x for
    MiniCPM3-4B) instead of materializing per-head K/V."""
    if cfg.attn_variant == "mla" and cfg.kv_lora_rank is not None:
        base = (cfg.num_layers, batch, max_len, 1)
        return base + (cfg.qk_rope_head_dim,), base + (cfg.kv_lora_rank,)
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return shape, shape


@struct.dataclass
class KVCache:
    """KV cache. ``quantized=True`` at create time stores K/V as int8 with a
    per-(position, head) fp32 scale — halves cache HBM traffic for
    long-context decode at ~0.4% dequant error (net-new vs the reference,
    which has no KV machinery at all — HF generate owns its cache there).
    For MLA models the arrays hold the latent (see :func:`cache_shapes`)."""

    k: jnp.ndarray        # [L, B, S, Hkv, D]  (bf16/f32 or int8)
    v: jnp.ndarray        # [L, B, S, Hkv, D]
    length: jnp.ndarray   # scalar int32: number of valid positions
    k_scale: Optional[jnp.ndarray] = None   # f32 [L, B, S, Hkv, 1] (int8 mode)
    v_scale: Optional[jnp.ndarray] = None

    @classmethod
    def create(cls, cfg: ArchConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
               quantized: bool = False):
        kshape, vshape = cache_shapes(cfg, batch, max_len)
        if quantized:
            return cls(
                k=jnp.zeros(kshape, jnp.int8), v=jnp.zeros(vshape, jnp.int8),
                length=jnp.zeros((), jnp.int32),
                k_scale=jnp.zeros(kshape[:-1] + (1,), jnp.float32),
                v_scale=jnp.zeros(vshape[:-1] + (1,), jnp.float32),
            )
        return cls(
            k=jnp.zeros(kshape, dtype), v=jnp.zeros(vshape, dtype),
            length=jnp.zeros((), jnp.int32),
        )


def _kv_quantize(x: jnp.ndarray):
    """Per-(token, head) symmetric int8 quantization over the D axis."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    q = jnp.round(xf / jnp.maximum(scale, 1e-10)).astype(jnp.int8)
    return q, scale


# ---------------------------------------------------------------------------
# Attention / MLP / Block
# ---------------------------------------------------------------------------


def _mla_interleave_to_halves(x: jnp.ndarray) -> jnp.ndarray:
    """DeepSeek/MiniCPM3 MLA rope pre-permutation: the checkpoint stores the
    rope dims interleaved; the official code does
    ``view(..., d/2, 2).transpose(-1, -2).reshape(..., d)`` (even indices
    first) before the neox-style rotate-half."""
    *lead, dr = x.shape
    return x.reshape(*lead, dr // 2, 2).swapaxes(-1, -2).reshape(*lead, dr)


def _mla_common(bp, x, positions, cfg: ArchConfig, backend, capture):
    """Shared MLA front half (minicpm3, reference modeling/minicpm3.py:8-15;
    module structure follows the official MiniCPM3Attention): low-rank q
    (q_a -> norm -> q_b) and kv (kv_a_proj_with_mqa -> [latent | shared
    k_pe], norm), rope (interleaved-storage pre-permutation + neox rotate)
    only on the qk_rope_head_dim tail. Returns (q_nope [B,T,H,dn],
    q_pe [B,T,H,dr] roped, kv_lat [B,T,rkv] post-norm, k_pe [B,T,dr] roped)."""
    b, t, _ = x.shape
    h = cfg.num_heads
    dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    d = dn + dr
    rkv = cfg.kv_lora_rank

    if capture is not None:
        capture["q_a_proj"] = capture["kv_a_proj"] = x
    qa = apply_linear(bp["q_a_proj"], x, backend)
    qa = rms_norm(qa, bp["q_a_norm"]["weight"], cfg.norm_eps)
    if capture is not None:
        capture["q_b_proj"] = qa
    q = apply_linear(bp["q_b_proj"], qa, backend).reshape(b, t, h, d)

    kva = apply_linear(bp["kv_a_proj"], x, backend)          # [B,T,rkv+dr]
    kv_lat, k_pe = kva[..., :rkv], kva[..., rkv:]
    kv_lat = rms_norm(kv_lat, bp["kv_a_norm"]["weight"], cfg.norm_eps)

    # rope on the pe tails (checkpoint stores them interleaved)
    q_pe = _mla_interleave_to_halves(q[..., dn:])            # [B,T,H,dr]
    k_pe = _mla_interleave_to_halves(k_pe)                   # [B,T,dr]
    cos, sin = _rope_freqs(cfg, positions, dr)               # [B,T,dr/2]

    def rot(xr, cs, sn):
        x1, x2 = xr[..., : dr // 2], xr[..., dr // 2:]
        return jnp.concatenate([x1 * cs - x2 * sn, x2 * cs + x1 * sn], -1)

    q_pe = rot(q_pe.astype(jnp.float32),
               cos[:, :, None, :], sin[:, :, None, :]).astype(x.dtype)
    k_pe = rot(k_pe.astype(jnp.float32), cos, sin).astype(x.dtype)
    return q[..., :dn], q_pe, kv_lat, k_pe


def _mla_qkv(bp, x, positions, cfg: ArchConfig, backend, capture):
    """Materialized MLA q/k/v for the cache-less path (calibration /
    scoring): per-head K = [k_nope | k_pe]. Returns (q [B,T,H,d],
    k [B,T,H,d], v [B,T,H,d] zero-padded from v_head_dim),
    d = qk_nope_head_dim + qk_rope_head_dim = cfg.head_dim."""
    b, t, _ = x.shape
    h = cfg.num_heads
    dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    d = dn + dr

    q_nope, q_pe, kv_lat, k_pe = _mla_common(bp, x, positions, cfg, backend, capture)
    if capture is not None:
        capture["kv_b_proj"] = kv_lat
    kv = apply_linear(bp["kv_b_proj"], kv_lat, backend).reshape(b, t, h, dn + dv)
    k_nope, v = kv[..., :dn], kv[..., dn:]

    q = jnp.concatenate([q_nope, q_pe], axis=-1)
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe[:, :, None, :], (b, t, h, dr))], -1
    )
    v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, d - dv)))
    return q, k, v


def _mla_attention_cached(
    bp, x, layer_idx, cache: KVCache, positions, cfg: ArchConfig, backend,
    attn_mask,
):
    """Cached MLA attention over the LATENT cache (VERDICT r1 item 6).

    The cache stores per token only ``k_pe`` (shared rope tail, dr dims) and
    the post-norm compressed kv latent (rkv dims) — see :func:`cache_shapes`.
    Per-head K/V are never materialized for past tokens; instead kv_b_proj
    is absorbed into the attention einsums (the DeepSeek-V2 "absorption"
    identity, matching the reference minicpm3 semantics exactly):

        q_h . k_h = (W_h^K.T q_nope_h) . lat  +  q_pe_h . k_pe
        out_h     = W_h^V (sum_s probs_s lat_s)

    so decode reads (rkv + dr) instead of 2*H*d values per cached token
    (~27x less cache HBM traffic for MiniCPM3-4B)."""
    b, t, _ = x.shape
    h = cfg.num_heads
    dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    rkv = cfg.kv_lora_rank
    d = dn + dr

    q_nope, q_pe, kv_lat, k_pe = _mla_common(bp, x, positions, cfg, backend, None)

    k_new = k_pe[:, :, None, :]                              # [B,T,1,dr]
    v_new = kv_lat[:, :, None, :]                            # [B,T,1,rkv]
    kv_int8 = cache.k.dtype == jnp.int8
    if kv_int8:
        kq, ks = _kv_quantize(k_new)
        vq, vs = _kv_quantize(v_new)
    else:
        kq, vq = k_new.astype(cache.k.dtype), v_new.astype(cache.v.dtype)
        ks = vs = None
    cks = cvs = None
    start = cache.length
    # Writes target the FULL stacked arrays (see attention(): restacking a
    # per-layer slice forced a whole-cache copy per step).
    if start.ndim == 1:  # continuous batching: per-slot cursors (T == 1)
        rows = jnp.arange(b)
        ck = cache.k.at[layer_idx, rows, start].set(kq[:, 0])
        cv = cache.v.at[layer_idx, rows, start].set(vq[:, 0])
        if kv_int8:
            cks = cache.k_scale.at[layer_idx, rows, start].set(ks[:, 0])
            cvs = cache.v_scale.at[layer_idx, rows, start].set(vs[:, 0])
        s = ck.shape[2]
        mask = jnp.arange(s)[None, None, :] <= start[:, None, None]  # [B,1,S]
    else:
        ck = jax.lax.dynamic_update_slice(cache.k, kq[None], (layer_idx, 0, start, 0, 0))
        cv = jax.lax.dynamic_update_slice(cache.v, vq[None], (layer_idx, 0, start, 0, 0))
        if kv_int8:
            cks = jax.lax.dynamic_update_slice(cache.k_scale, ks[None], (layer_idx, 0, start, 0, 0))
            cvs = jax.lax.dynamic_update_slice(cache.v_scale, vs[None], (layer_idx, 0, start, 0, 0))
        s = ck.shape[2]
        q_slot = (start + jnp.arange(t))[None, :, None]
        mask = jnp.arange(s)[None, None, :] <= q_slot        # [1,T,S]
    mask = jnp.broadcast_to(mask, (b, t, s))
    if attn_mask is not None:
        mask = mask & attn_mask[:, None, :].astype(bool)

    pe_s = ck[layer_idx, :, :, 0, :].astype(jnp.float32)     # [B,S,dr]
    lat_s = cv[layer_idx, :, :, 0, :].astype(jnp.float32)    # [B,S,rkv]
    if kv_int8:  # latent is ~27x smaller than per-head K/V: a f32 dequant
        pe_s = pe_s * cks[layer_idx, :, :, 0, :]   # copy here is still far
        lat_s = lat_s * cvs[layer_idx, :, :, 0, :] # below the bf16 cache

    # absorbed kv_b (dequantized once per call; rkv x H x (dn+dv) is small)
    node = bp["kv_b_proj"]
    if isinstance(node, qlin.QuantLinear):
        w_kb = qlin.logical_weight(node, jnp.float32)
    else:  # dense [K, N] kernel (unquantized load / LoRA-free fine-tune)
        w_kb = node.kernel.astype(jnp.float32)
    w_kb = w_kb.reshape(rkv, h, dn + dv)
    w_k, w_v = w_kb[..., :dn], w_kb[..., dn:]

    scale = cfg.attn_scale if cfg.attn_scale is not None else d ** -0.5
    q_eff = jnp.einsum("bthd,rhd->bthr", q_nope.astype(jnp.float32), w_k)
    logits = (
        jnp.einsum("bthr,bsr->bhts", q_eff, lat_s)
        + jnp.einsum("bthd,bsd->bhts", q_pe.astype(jnp.float32), pe_s)
    ) * scale
    logits = jnp.where(mask[:, None, :, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("bhts,bsr->bthr", probs, lat_s)
    out = jnp.einsum("bthr,rhd->bthd", ctx, w_v)             # [B,T,H,dv]
    out = out.reshape(b, t, h * dv).astype(x.dtype)
    out = apply_linear(bp["o_proj"], _row_parallel_input(out, bp["o_proj"], cfg), backend)
    if cfg.tp_axis is not None:
        out = jax.lax.psum(out, cfg.tp_axis)
    if kv_int8:
        return out, (ck, cv, cks, cvs)
    return out, (ck, cv)


def _ring_attention(q, k, v, axis: str, scale: float):
    """Ring (context-parallel) causal attention under ``jax.shard_map``.

    q/k/v: LOCAL sequence chunks [B, Tc, H, D] (kv heads already repeated to
    H); the global sequence is n_devices * Tc, laid out in axis-index order.
    Each of n steps contracts the local queries against the K/V block
    currently held (starting with our own, then ring-rotated via ppermute),
    maintaining streaming-softmax accumulators (running max m, denominator
    l, weighted sum acc) — attention memory stays O(Tc^2) per device
    instead of O(T_global^2), and the K/V traffic rides the ICI ring.
    """
    n = jax.lax.psum(1, axis)
    r = jax.lax.axis_index(axis)
    b, tc, h, d = q.shape
    qf = q.astype(jnp.float32)

    q_pos = r * tc + jnp.arange(tc)                       # global positions
    m0 = jnp.full((b, h, tc), -1e30)
    l0 = jnp.zeros((b, h, tc))
    acc0 = jnp.zeros((b, tc, h, d))
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(s, carry):
        k_cur, v_cur, m, l, acc = carry
        j = (r - s) % n                                   # block k_cur holds
        scores = jnp.einsum(
            "bthd,bshd->bhts", qf, k_cur.astype(jnp.float32)
        ) * scale                                          # [B,H,Tc,Tc]
        kv_pos = j * tc + jnp.arange(tc)
        mask = kv_pos[None, :] <= q_pos[:, None]          # causal, global
        scores = jnp.where(mask[None, None], scores, -1e30)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        p = jnp.exp(scores - m_new[..., None])            # [B,H,Tc,Tc]
        p = jnp.where(mask[None, None], p, 0.0)
        corr = jnp.exp(m - m_new)                         # [B,H,Tc]
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr.transpose(0, 2, 1)[..., None] + jnp.einsum(
            "bhts,bshd->bthd", p, v_cur.astype(jnp.float32)
        )
        k_cur = jax.lax.ppermute(k_cur, axis, perm)
        v_cur = jax.lax.ppermute(v_cur, axis, perm)
        return k_cur, v_cur, m_new, l, acc

    _, _, _, l, acc = jax.lax.fori_loop(0, n, step, (k, v, m0, l0, acc0))
    return acc / l.transpose(0, 2, 1)[..., None]          # [B,Tc,H,D]


def attention(
    bp: dict,
    x: jnp.ndarray,                     # [B, T, H*D?] hidden
    layer_idx: int,
    cache: Optional[KVCache],
    positions: jnp.ndarray,             # [B, T]
    cfg: ArchConfig,
    backend: str = "auto",
    attn_mask: Optional[jnp.ndarray] = None,   # [B, S] key-side validity
    capture: Optional[dict] = None,            # calibration: linear inputs
    fresh_prefill: bool = False,        # static: cache is known empty
    mask_contig: bool = False,          # static: attn_mask is a contiguous
                                        # left-pad run (enables flash-decode)
    prenorm: Optional[dict] = None,     # input-norm params: x arrives RAW and
                                        # the norm fuses into q/k/v (FUSE_NORM)
):
    b, t, _ = x.shape
    h, hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if cfg.num_kv_heads_per_layer is not None:
        hkv = cfg.num_kv_heads_per_layer[layer_idx]

    if cfg.attn_variant == "mla" and cache is not None:
        # latent cache + absorbed kv_b: per-head K/V never materialized for
        # cached tokens (capture never coexists with a cache — calibration
        # forwards are cache-less)
        return _mla_attention_cached(
            bp, x, layer_idx, cache, positions, cfg, backend, attn_mask,
        )
    if cfg.attn_variant == "mla":
        q, k, v = _mla_qkv(bp, x, positions, cfg, backend, capture)
        hkv = h  # cache-less path materializes per-head K/V
    else:
        if capture is not None:
            capture["q_proj"] = capture["k_proj"] = capture["v_proj"] = x

        if prenorm is not None:
            _lin = lambda node, inp: _prenorm_linear(node, inp, prenorm, cfg, backend)
        else:
            _lin = lambda node, inp: apply_linear(node, inp, backend)
        if "qkv_proj" in bp:  # statically fused at load (params.fuse_qkv_gateup)
            qkv = _lin(bp["qkv_proj"], x)
            hq = h * d
            q = qkv[..., :hq].reshape(b, t, h, d)
            k = qkv[..., hq:hq + hkv * d].reshape(b, t, hkv, d)
            v = qkv[..., hq + hkv * d:].reshape(b, t, hkv, d)
        else:
            q = _lin(bp["q_proj"], x).reshape(b, t, h, d)
            k = _lin(bp["k_proj"], x).reshape(b, t, hkv, d)
            v = _lin(bp["v_proj"], x).reshape(b, t, hkv, d)

        if cfg.pos_embedding in ("rope", "rope_gptj"):
            q, k = apply_rope(q, k, positions, cfg)
        if cfg.logn_attn_seq_len is not None:
            # qwen-v1 logn scaling: amplify long-position queries by
            # log_L(pos+1), clamped at 1 inside the training length
            L = float(cfg.logn_attn_seq_len)
            logn = jnp.maximum(
                jnp.log(positions.astype(jnp.float32) + 1.0) / math.log(L), 1.0
            )
            q = (q.astype(jnp.float32) * logn[:, :, None, None]).astype(q.dtype)

    if cfg.sp_axis is not None and cache is None:
        # Sequence parallelism (context parallel): ring attention over the
        # sp mesh axis; the T dim here is the LOCAL chunk.
        if (
            cfg.attn_variant == "mla" or cfg.pos_embedding == "alibi"
            or cfg.attn_softcap is not None or cfg.sliding_window is not None
            or capture is not None or "adaption" in bp
            # dynamic NTK derives alpha from the LOCAL chunk's max position;
            # sp ranks would encode K with inconsistent bases
            or cfg.rope_ntk_seq_len is not None
        ):
            raise NotImplementedError(
                "sequence parallelism supports standard causal attention only"
            )
        rep = h // hkv
        kf = jnp.repeat(k, rep, axis=2) if rep > 1 else k
        vf = jnp.repeat(v, rep, axis=2) if rep > 1 else v
        scale_sp = cfg.attn_scale if cfg.attn_scale is not None else d ** -0.5
        of = _ring_attention(q, kf, vf, cfg.sp_axis, float(scale_sp))
        of = of.reshape(b, t, h * d).astype(x.dtype)
        out = apply_linear(bp["o_proj"], _row_parallel_input(of, bp["o_proj"], cfg), backend)
        if cfg.tp_axis is not None:
            out = jax.lax.psum(out, cfg.tp_axis)
        return out, None

    window = cfg.sliding_window
    if window is not None and cfg.sliding_window_every_other and layer_idx % 2 == 1:
        window = None  # gemma2: odd layers attend globally
    scale = cfg.attn_scale if cfg.attn_scale is not None else d ** -0.5

    # Causality is computed in cache-SLOT space (uniform across the batch,
    # works with left padding); logical positions feed only RoPE/learned-pos.
    #
    # Cache writes go into the FULL stacked [L, B, S, Hkv, D] arrays at
    # [layer_idx, ...] and the full arrays are returned: updating a per-layer
    # slice and restacking it in forward() made XLA rewrite the whole cache
    # every decode step (~4 full-cache copy fusions/step, ~0.2 ms/tok at a
    # 128 window and growing linearly with it — measured on the v5e trace).
    # In-place chained updates on the scan-carried arrays are free.
    if cache is not None:
        start = cache.length
        kv_int8 = cache.k.dtype == jnp.int8
        if kv_int8:
            kq, ks = _kv_quantize(k)
            vq, vs = _kv_quantize(v)
        else:
            kq, vq = k.astype(cache.k.dtype), v.astype(cache.v.dtype)
            ks = vs = None
        cks = cvs = None
        if start.ndim == 1:
            # Continuous batching: per-slot write cursors. T == 1 is the
            # serving decode step; T > 1 is the speculative verify window
            # (slot i writes its T tokens at start[i] + [0..T)).
            # Variable-GQA families size the cache for the MAX kv-head
            # count; pad this layer's heads so the vector-indexed write
            # matches the cache width (the read path slices [:hkv] back).
            ch = cache.k.shape[3]
            if kq.shape[2] != ch:
                hpad = ((0, 0), (0, 0), (0, ch - kq.shape[2]), (0, 0))
                kq = jnp.pad(kq, hpad)
                vq = jnp.pad(vq, hpad)
                if kv_int8:
                    ks = jnp.pad(ks, hpad)
                    vs = jnp.pad(vs, hpad)
            rows = jnp.arange(b)
            # mode="drop": a cursor at/after S falls outside the cache and
            # the write is DISCARDED (not clamped). Real decode cursors are
            # always in-bounds; this makes the serving engine's parked
            # cursors (max_seq_len - 1, beyond any sliced decode window)
            # safe under window-bucketed steps.
            if t == 1:
                ck = cache.k.at[layer_idx, rows, start].set(kq[:, 0], mode="drop")
                cv = cache.v.at[layer_idx, rows, start].set(vq[:, 0], mode="drop")
                if kv_int8:
                    cks = cache.k_scale.at[layer_idx, rows, start].set(ks[:, 0], mode="drop")
                    cvs = cache.v_scale.at[layer_idx, rows, start].set(vs[:, 0], mode="drop")
            else:
                idx = start[:, None] + jnp.arange(t)[None, :]      # [B, T]
                r2 = rows[:, None]
                ck = cache.k.at[layer_idx, r2, idx].set(kq, mode="drop")
                cv = cache.v.at[layer_idx, r2, idx].set(vq, mode="drop")
                if kv_int8:
                    cks = cache.k_scale.at[layer_idx, r2, idx].set(ks, mode="drop")
                    cvs = cache.v_scale.at[layer_idx, r2, idx].set(vs, mode="drop")
            s = ck.shape[2]
            kv_slot = jnp.arange(s)
            q_slot = (start[:, None] + jnp.arange(t)[None, :])[:, :, None]
            mask = kv_slot[None, None, :] <= q_slot        # [B, T, S]
        else:
            ck = jax.lax.dynamic_update_slice(cache.k, kq[None], (layer_idx, 0, start, 0, 0))
            cv = jax.lax.dynamic_update_slice(cache.v, vq[None], (layer_idx, 0, start, 0, 0))
            if kv_int8:
                cks = jax.lax.dynamic_update_slice(cache.k_scale, ks[None], (layer_idx, 0, start, 0, 0))
                cvs = jax.lax.dynamic_update_slice(cache.v_scale, vs[None], (layer_idx, 0, start, 0, 0))
            s = ck.shape[2]
            kv_slot = jnp.arange(s)[None, :]               # [1, S]
            q_slot = (start + jnp.arange(t))[None, :, None]  # [1, T, 1]
            mask = kv_slot[:, None, :] <= q_slot           # [1, T, S]
        # Decode fast path: Pallas flash-decode over the stacked cache —
        # the layer index lives in the kernel's BlockSpec, so no per-layer
        # cache slice or f32 key/value copy is ever materialized, and each
        # grid step DMAs one contiguous [sblk, Hkv, D] cache span (see
        # ops/pallas/flash_decode.py). Key validity must be expressible as
        # per-row [lo, hi) bounds: causality gives hi = start + 1; a
        # CONTIGUOUS left-pad mask gives lo (mask_contig is the caller's
        # static promise — utils.generation builds masks by left-padding,
        # so its decode steps always qualify).
        if (
            t == 1
            and not kv_int8
            and capture is None
            and FLASH_DECODE != "0"
            and backend != "xla"
            and (FLASH_DECODE == "interpret" or jax.default_backend() == "tpu")
            and cfg.pos_embedding != "alibi"
            and cfg.attn_softcap is None
            and window is None
            and "adaption" not in bp
            and (d % 128 == 0 or FLASH_DECODE == "interpret")
            and (attn_mask is None or mask_contig)
        ):
            from ..ops.pallas import flash_decode as _fd

            sblk = _fd.pick_sblk(
                ck.shape[2], ck.shape[3], d, ck.dtype.itemsize)
            if sblk is not None:
                if attn_mask is None:
                    lo = jnp.zeros((b,), jnp.int32)
                else:  # first valid slot of the contiguous mask
                    lo = jnp.argmax(
                        attn_mask.astype(jnp.int32), axis=1).astype(jnp.int32)
                hi = (start + 1).astype(jnp.int32)
                if hi.ndim == 0:
                    hi = jnp.broadcast_to(hi, (b,))
                of = _fd.flash_decode(
                    q[:, 0], ck, cv, lo, hi, layer=layer_idx,
                    sm_scale=float(scale), sblk=sblk, hkv=hkv,
                    interpret=FLASH_DECODE == "interpret",
                )
                of = of.reshape(b, 1, h * d).astype(x.dtype)
                out = apply_linear(
                    bp["o_proj"],
                    _row_parallel_input(of, bp["o_proj"], cfg), backend)
                if cfg.tp_axis is not None:
                    out = jax.lax.psum(out, cfg.tp_axis)
                return out, (ck, cv)

        # int8 cache: keys/values stay int8 here; the per-(token, head)
        # scales are folded into the attention dots below (logits *= k_scale
        # after the QK dot, probs *= v_scale before the PV dot) — exact
        # same math, but no [B,S,Hkv,D] dequantized copy is ever written,
        # so the HBM traffic win of the int8 cache is preserved.
        keys, values = ck[layer_idx], cv[layer_idx]
        key_sc = cks[layer_idx] if kv_int8 else None    # f32 [B, S, Hkv, 1]
        val_sc = cvs[layer_idx] if kv_int8 else None
        if keys.shape[2] != hkv:  # variable-GQA cache sized for max kv heads
            keys = keys[:, :, :hkv, :]
            values = values[:, :, :hkv, :]
            if kv_int8:
                key_sc = key_sc[:, :, :hkv, :]
                val_sc = val_sc[:, :, :hkv, :]
        mask = jnp.broadcast_to(mask, (b, t, s))
    else:
        keys, values = k, v
        key_sc = val_sc = None
        s = t
        q_slot = jnp.arange(t)[None, :, None]
        mask = jnp.broadcast_to(jnp.tril(jnp.ones((t, s), bool))[None], (b, t, s))

    if attn_mask is not None:
        # attn_mask: [B, S] key-side validity (pads = 0)
        mask = mask & attn_mask[:, None, :].astype(bool)

    if window is not None:
        kv_slot = jnp.arange(s)[None, None, :]
        mask = mask & (kv_slot > q_slot - window)

    # Prefill fast path: the Pallas flash-attention kernel avoids
    # materializing the T x S score matrix (the dominant prefill cost at
    # long context). Only the fresh q/k/v take part (prefill attends within
    # the prompt: every call site with t > 1 has an empty cache), so it
    # composes with the cache writes above. Left padding is expressed as
    # segment ids (pads = segment 0). Falls back to the einsum path for
    # alibi / softcap / sliding-window / ragged shapes / non-TPU.
    if (
        FLASH_PREFILL
        and t > 1
        # a cached multi-token chunk could be a CONTINUATION (chunked
        # prefill); flash only attends within the chunk, so it is only safe
        # when the caller statically knows the cache is empty
        and (cache is None or fresh_prefill)
        and backend != "xla"
        and jax.default_backend() == "tpu"
        and cfg.pos_embedding != "alibi"
        and cfg.attn_softcap is None
        and window is None
        and capture is None
        and "adaption" not in bp
        and t % 128 == 0
        and d % 128 == 0
    ):
        from jax.experimental.pallas.ops.tpu import flash_attention as _fa

        rep = h // hkv
        kf = jnp.repeat(k, rep, axis=2) if rep > 1 else k
        vf = jnp.repeat(v, rep, axis=2) if rep > 1 else v
        seg = None
        if attn_mask is not None:
            ids32 = attn_mask[:, :t].astype(jnp.float32)
            seg = _fa.SegmentIds(q=ids32, kv=ids32)
        # Feed the kernel at the model dtype: bf16 q/k/v keeps the MXU at
        # full rate and halves attention HBM traffic vs an f32 upcast (the
        # kernel's softmax/accumulation is f32 internally either way). f32
        # models (numerics tests) still run f32 end-to-end.
        fa_dt = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
        blk = max(128, min(FLASH_BLOCK, t))        # t % 128 == 0 guaranteed
        while t % blk:
            blk //= 2
        bs = _fa.BlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
            block_q_major_dkv=blk, block_k_major_dkv=blk,
            block_k_dkv=blk, block_q_dkv=blk,
            block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
        )
        of = _fa.flash_attention(
            q.swapaxes(1, 2).astype(fa_dt),
            kf.swapaxes(1, 2).astype(fa_dt),
            vf.swapaxes(1, 2).astype(fa_dt),
            segment_ids=seg,
            causal=True,
            sm_scale=float(scale),
            block_sizes=bs,
        ).swapaxes(1, 2)                                   # [B, T, H, D]
        if cfg.attn_variant == "mla":
            of = of[..., : cfg.v_head_dim]
            of = of.reshape(b, t, h * cfg.v_head_dim).astype(x.dtype)
        else:
            of = of.reshape(b, t, h * d).astype(x.dtype)
        out = apply_linear(bp["o_proj"], _row_parallel_input(of, bp["o_proj"], cfg), backend)
        if cfg.tp_axis is not None:
            out = jax.lax.psum(out, cfg.tp_axis)
        if cache is not None:
            if cache.k.dtype == jnp.int8:
                return out, (ck, cv, cks, cvs)
            return out, (ck, cv)
        return out, None

    # GQA: fold repeat into the einsum via head grouping.
    rep = h // hkv
    qh = q.reshape(b, t, hkv, rep, d)
    logits = jnp.einsum(
        "bthrd,bshd->bhrts", qh.astype(jnp.float32), keys.astype(jnp.float32)
    ) * scale                                               # [B, Hkv, rep, T, S]
    if key_sc is not None:  # int8 cache: per-(position, head) scale post-dot
        logits = logits * key_sc[..., 0].transpose(0, 2, 1)[:, :, None, None, :]
    if cfg.attn_softcap is not None:
        logits = cfg.attn_softcap * jnp.tanh(logits / cfg.attn_softcap)
    logits = jnp.where(mask[:, None, None, :, :], logits, -1e30)

    if cfg.pos_embedding == "alibi":
        # Slot-space relative distances == logical distances inside the valid
        # region (both shift by the pad length under left padding).
        slopes = _alibi_slopes(h).reshape(1, hkv, rep, 1, 1)
        kv_slot_a = jnp.arange(s).reshape(1, 1, 1, 1, s)
        q_slot_a = q_slot.reshape(1, 1, 1, t, 1)
        logits = logits + slopes * (kv_slot_a - q_slot_a)

    probs = jax.nn.softmax(logits, axis=-1)
    if val_sc is not None:  # int8 cache: fold v_scale into the probabilities
        probs = probs * val_sc[..., 0].transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum("bhrts,bshd->bthrd", probs, values.astype(jnp.float32))
    if "adaption" in bp and cfg.attn_variant != "mla":
        # LLaMA-Adapter adaption prompt (peft AdaptedAttention semantics):
        # prompt rows through the frozen k/v projections (NO rope on the
        # adapter keys), separate softmax over the prompt length, added with
        # a zero-init gate. q here is already post-rope, matching peft's
        # compute_query_states.
        ad = bp["adaption"]
        plen = ad.prompt.shape[0]
        pr = ad.prompt[None].astype(x.dtype)                  # [1, P, hidden]
        kp = apply_linear(bp["k_proj"], pr, backend).reshape(1, plen, hkv, d)
        vp = apply_linear(bp["v_proj"], pr, backend).reshape(1, plen, hkv, d)
        ascore = jnp.einsum(
            "bthrd,xphd->bhrtp", qh.astype(jnp.float32), kp.astype(jnp.float32)
        ) * scale
        aprobs = jax.nn.softmax(ascore, axis=-1) * ad.gate.astype(jnp.float32)
        out = out + jnp.einsum("bhrtp,xphd->bthrd", aprobs, vp.astype(jnp.float32))
    if cfg.attn_variant == "mla":
        # V was zero-padded to head_dim for the uniform cache; slice back.
        out = out[..., : cfg.v_head_dim]
        out = out.reshape(b, t, h * cfg.v_head_dim).astype(x.dtype)
    else:
        out = out.reshape(b, t, h * d).astype(x.dtype)
    if capture is not None:
        capture["o_proj"] = out
    out = apply_linear(bp["o_proj"], _row_parallel_input(out, bp["o_proj"], cfg), backend)
    if cfg.tp_axis is not None:  # row-parallel partial sum (megatron pattern)
        out = jax.lax.psum(out, cfg.tp_axis)

    if cache is not None:
        if cache.k.dtype == jnp.int8:
            return out, (ck, cv, cks, cvs)
        return out, (ck, cv)
    return out, None


def _alibi_slopes(num_heads: int) -> jnp.ndarray:
    import math

    def slopes_power_of_2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(num_heads).is_integer():
        s = slopes_power_of_2(num_heads)
    else:
        closest = 2 ** math.floor(math.log2(num_heads))
        s = slopes_power_of_2(closest)
        extra = slopes_power_of_2(2 * closest)[0::2][: num_heads - closest]
        s = s + extra
    return jnp.asarray(s, jnp.float32)


def mlp(
    bp: dict,
    x: jnp.ndarray,
    cfg: ArchConfig,
    backend: str = "auto",
    capture: Optional[dict] = None,
    prenorm: Optional[dict] = None,     # post-norm params: x arrives RAW and
                                        # the norm fuses into gate/up (FUSE_NORM)
) -> jnp.ndarray:
    if cfg.moe_num_experts > 0:
        assert prenorm is None  # MoE routing needs the normed hidden
        return moe_mlp(bp, x, cfg, backend, capture)
    if prenorm is not None:
        _lin = lambda node, inp: _prenorm_linear(node, inp, prenorm, cfg, backend)
    else:
        _lin = lambda node, inp: apply_linear(node, inp, backend)
    if capture is not None:
        capture["up_proj"] = x
        if cfg.mlp_act.endswith("_glu"):
            capture["gate_proj"] = x
    if cfg.mlp_act.endswith("_glu"):
        if "gateup_proj" in bp:  # statically fused at load
            gu = _lin(bp["gateup_proj"], x)
            half = gu.shape[-1] // 2
            gate, up = gu[..., :half], gu[..., half:]
        else:
            gate = _lin(bp["gate_proj"], x)
            up = _lin(bp["up_proj"], x)
        act = jax.nn.silu if cfg.mlp_act == "silu_glu" else jax.nn.gelu
        h = act(gate) * up
        if capture is not None:
            capture["down_proj"] = h
        y = apply_linear(bp["down_proj"], _row_parallel_input(h, bp["down_proj"], cfg), backend)
        if cfg.tp_axis is not None:
            y = jax.lax.psum(y, cfg.tp_axis)
        return y
    h = _lin(bp["up_proj"], x)
    if cfg.mlp_act == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    elif cfg.mlp_act == "gelu_new":
        h = jax.nn.gelu(h, approximate=True)
    elif cfg.mlp_act == "relu":
        h = jax.nn.relu(h)
    else:
        raise ValueError(f"unknown activation {cfg.mlp_act}")
    if capture is not None:
        capture["down_proj"] = h
    y = apply_linear(bp["down_proj"], _row_parallel_input(h, bp["down_proj"], cfg), backend)
    if cfg.tp_axis is not None:
        y = jax.lax.psum(y, cfg.tp_axis)
    return y


def moe_mlp(
    bp: dict,
    x: jnp.ndarray,
    cfg: ArchConfig,
    backend: str = "auto",
    capture: Optional[dict] = None,
) -> jnp.ndarray:
    """Mixtral-style sparse MoE: dense top-k routing.

    TPU-first design: instead of the reference's 24 separate Linears per
    block (modeling/mixtral.py:8-40), experts are evaluated with a shared
    batched einsum over a [E, ...] stacked weight tree when dense, or a
    per-expert loop of quantized matmuls (static unroll over E) with the
    routing weights applied as a mask — compiler-friendly, no dynamic shapes.
    """
    b, t, hdim = x.shape
    router_logits = apply_linear(bp["router"], x, backend)          # [B, T, E]
    e = cfg.moe_num_experts
    weights, sel = jax.lax.top_k(router_logits.astype(jnp.float32), cfg.moe_top_k)
    weights = jax.nn.softmax(weights, axis=-1)                      # [B, T, k]
    # dense combine mask [B, T, E]
    combine = jnp.zeros((b, t, e), jnp.float32)
    combine = jax.vmap(
        lambda c, s, w: c.at[s].add(w), in_axes=(0, 0, 0)
    )(combine.reshape(-1, e), sel.reshape(-1, cfg.moe_top_k), weights.reshape(-1, cfg.moe_top_k))
    combine = combine.reshape(b, t, e)

    if "experts_stacked" in bp:
        # Expert-parallel execution: batched matmuls over the expert axis
        # (shardable on "ep"); dense routing combine.
        from ..ops.quantlinear import StackedQuantLinear, matmul_routed, matmul_stacked

        st = bp["experts_stacked"]
        pairs = b * t * cfg.moe_top_k
        if (
            capture is None
            and backend != "xla"
            and pairs <= e          # decode regime: fewer pairs than experts
            and isinstance(st.get("gate_proj"), StackedQuantLinear)
        ):
            from ..ops.pallas import gemm as _pgemm

            routed_ok = all(
                _pgemm.supported_routed(
                    st[nm], interpret=(backend == "pallas_interpret")
                )
                for nm in ("gate_proj", "up_proj", "down_proj")
            )
            if routed_ok:
                # Top-k routed execution: the scalar-prefetch kernel DMAs
                # ONLY the selected experts' weights — top-2-of-8 decode
                # reads 4x less than the dense stacked path below (the
                # reference likewise touches only routed experts,
                # modeling/mixtral.py:8-40).
                sel_flat = sel.reshape(-1)
                xt = jnp.repeat(
                    x.reshape(b * t, hdim), cfg.moe_top_k, axis=0
                )
                gate = matmul_routed(xt, st["gate_proj"], sel_flat, backend)
                up = matmul_routed(xt, st["up_proj"], sel_flat, backend)
                hmid = jax.nn.silu(gate) * up
                y = matmul_routed(hmid, st["down_proj"], sel_flat, backend)
                out = y.astype(jnp.float32) * weights.reshape(-1)[:, None]
                out = out.reshape(b, t, cfg.moe_top_k, hdim).sum(axis=2)
                return out.astype(x.dtype)
        gate = matmul_stacked(x, st["gate_proj"], backend)            # [E, B, T, I]
        up = matmul_stacked(x, st["up_proj"], backend)
        h = jax.nn.silu(gate) * up
        from ..ops import quantlinear as _q

        y = jax.vmap(lambda he, wp, s, z: _q.matmul(
            he,
            _q.QuantLinear(
                wp=wp, scales=s, zeros=z, kperm=None, bias=None,
                bits=st["down_proj"].bits, group_size=st["down_proj"].group_size,
                in_features=st["down_proj"].in_features,
                out_features=st["down_proj"].out_features,
                n_pad=st["down_proj"].n_pad,
                layout=st["down_proj"].layout,
            ),
            backend=backend,
        ))(h, st["down_proj"].wp, st["down_proj"].scales, st["down_proj"].zeros)
        out = jnp.einsum(
            "ebth,bte->bth", y.astype(jnp.float32), combine
        )
        return out.astype(x.dtype)

    out = jnp.zeros_like(x, dtype=jnp.float32)
    for i in range(e):
        ep = bp["experts"][i]
        routed = (combine[..., i] > 0).astype(x.dtype)[..., None]   # [B, T, 1]
        if capture is not None:
            # Hessians must see only the tokens actually routed to this
            # expert (zeroed rows contribute nothing to X^T X), mirroring the
            # reference's hook-on-routed-inputs behavior.
            capture[f"experts.{i}.gate_proj"] = x * routed
            capture[f"experts.{i}.up_proj"] = x * routed
        gate = apply_linear(ep["gate_proj"], x, backend)
        up = apply_linear(ep["up_proj"], x, backend)
        h = jax.nn.silu(gate) * up
        if capture is not None:
            capture[f"experts.{i}.down_proj"] = h * routed
        y = apply_linear(ep["down_proj"], h, backend)
        out = out + y.astype(jnp.float32) * combine[..., i][..., None]
    return out.astype(x.dtype)


def block_forward(
    bp: dict,
    x: jnp.ndarray,
    layer_idx: int,
    cache: Optional[KVCache],
    positions: jnp.ndarray,
    cfg: ArchConfig,
    backend: str = "auto",
    attn_mask: Optional[jnp.ndarray] = None,
    capture: Optional[dict] = None,
    fresh_prefill: bool = False,
    mask_contig: bool = False,
):
    """One decoder block. Returns (hidden, (cache_k, cache_v) or None).

    With ``capture`` a dict, inputs feeding each linear are recorded under
    the block-relative path ("attn.q_proj", "mlp.down_proj", ...) — the
    functional replacement for the reference's forward hooks
    (modeling/_base.py:310-334).
    """
    attn_cap = {} if capture is not None else None
    mlp_cap = {} if capture is not None else None

    if not cfg.pre_norm:
        # classic post-LN (OPT do_layer_norm_before=False): the sublayer
        # reads the raw residual stream; the norm is applied after the add
        attn_out, kv = attention(
            bp["attn"], x, layer_idx, cache, positions, cfg, backend,
            attn_mask, attn_cap, fresh_prefill, mask_contig,
        )
        x = apply_norm(bp["input_norm"], x + attn_out, cfg)
        mlp_out = mlp(bp["mlp"], x, cfg, backend, mlp_cap)
        x = apply_norm(bp["post_norm"], x + mlp_out, cfg)
        if capture is not None:
            for k, v in attn_cap.items():
                capture[f"attn.{k}"] = v
            for k, v in mlp_cap.items():
                capture[f"mlp.{k}"] = v
        return x, kv

    # Fused-norm decode: pass RAW x into attention/mlp with the norm params;
    # the RMS norm runs inside the quantized kernels (FUSE_NORM knob). Only
    # the standard sequential pre-norm block shape qualifies.
    fuse_norm = (
        FUSE_NORM != "0"
        and cfg.norm_type == "rmsnorm"
        and capture is None
        and cache is not None
        and x.shape[1] == 1
        and not cfg.parallel_block
        and cfg.attn_variant != "mla"
        and cfg.moe_num_experts == 0
    )
    if fuse_norm:
        attn_out, kv = attention(
            bp["attn"], x, layer_idx, cache, positions, cfg, backend,
            attn_mask, attn_cap, fresh_prefill, mask_contig,
            prenorm=bp["input_norm"],
        )
    else:
        h = apply_norm(bp["input_norm"], x, cfg)
        attn_out, kv = attention(
            bp["attn"], h, layer_idx, cache, positions, cfg, backend, attn_mask,
            attn_cap, fresh_prefill, mask_contig,
        )
    rs = cfg.residual_scale  # minicpm: scale_depth / sqrt(num_layers)
    if cfg.parallel_block:
        h_mlp = apply_norm(bp["post_norm"], x, cfg) if cfg.parallel_norms else h
        mlp_out = mlp(bp["mlp"], h_mlp, cfg, backend, mlp_cap)
        if rs is not None:
            attn_out, mlp_out = attn_out * rs, mlp_out * rs
        x = x + attn_out + mlp_out
    else:
        if cfg.post_sublayer_norms:  # gemma2 sandwich norms
            attn_out = apply_norm(bp["post_attn_norm"], attn_out, cfg)
        x = x + (attn_out if rs is None else attn_out * rs)
        if fuse_norm:
            mlp_out = mlp(bp["mlp"], x, cfg, backend, mlp_cap,
                          prenorm=bp["post_norm"])
        else:
            h2 = apply_norm(bp["post_norm"], x, cfg)
            mlp_out = mlp(bp["mlp"], h2, cfg, backend, mlp_cap)
        if cfg.post_sublayer_norms:
            mlp_out = apply_norm(bp["post_ffn_norm"], mlp_out, cfg)
        x = x + (mlp_out if rs is None else mlp_out * rs)

    if capture is not None:
        for k, v in attn_cap.items():
            capture[f"attn.{k}"] = v
        for k, v in mlp_cap.items():
            capture[f"mlp.{k}"] = v
    return x, kv


def embed(params: dict, tokens: jnp.ndarray, positions: jnp.ndarray, cfg: ArchConfig, dtype=jnp.bfloat16):
    x = params["embed_tokens"][tokens].astype(dtype)
    if "project_in" in params:
        # OPT word_embed_proj_dim != hidden_size (opt-350m): tokens embed at
        # the projection dim, project_in lifts to hidden before pos-embed
        x = apply_linear(params["project_in"], x, backend="auto").astype(dtype)
    if cfg.scale_embedding:
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, dtype)
    if cfg.embed_scale is not None:  # minicpm scale_emb
        x = x * jnp.asarray(cfg.embed_scale, dtype)
    if cfg.pos_embedding == "learned":
        x = x + params["embed_positions"][positions + cfg.pos_offset].astype(dtype)
    if cfg.embed_norm:
        x = apply_norm(params["embed_norm"], x, cfg)
    return x


def unembed(params: dict, x: jnp.ndarray, cfg: ArchConfig) -> jnp.ndarray:
    if cfg.final_norm:
        x = apply_norm(params["final_norm"], x, cfg)
    if "project_out" in params:
        # mirror of project_in: drop hidden back to the embedding dim so the
        # (usually tied) head at word_embed_proj_dim applies
        x = apply_linear(params["project_out"], x, backend="auto")
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.einsum("bth,vh->btv", x.astype(jnp.float32), params["embed_tokens"].astype(jnp.float32))
    elif cfg.lm_head_normalize:
        # Baichuan2 NormHead: per-vocab-row L2 normalization at inference
        # (official modeling_baichuan.py). Requires the dense head; the
        # opt-in quantized lm_head is unsupported for this family.
        w = params["lm_head"].kernel.astype(jnp.float32)     # [H, V]
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
        logits = jnp.einsum("bth,hv->btv", x.astype(jnp.float32), w)
    else:
        logits = apply_linear(params["lm_head"], x, backend="auto").astype(jnp.float32)
    if cfg.logit_scale is not None:
        logits = logits * cfg.logit_scale
    if cfg.final_softcap is not None:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return logits


def forward(
    params: dict,
    tokens: jnp.ndarray,                # [B, T]
    cfg: ArchConfig,
    cache: Optional[KVCache] = None,
    positions: Optional[jnp.ndarray] = None,
    backend: str = "auto",
    attn_mask: Optional[jnp.ndarray] = None,
    dtype=jnp.bfloat16,
    fresh_prefill: bool = False,        # static: cache is known empty
    logits_last_only: bool = False,     # static: unembed only position T-1
    mask_contig: bool = False,          # static: attn_mask is left-pad runs
):
    """Full forward. Returns (logits [B, T, V], new_cache or None).

    ``logits_last_only`` unembeds only the final position (returned as
    [B, 1, V]) — generation prefill discards every other row, and at 7B/2048
    the full [B, T, V] head costs ~3.4 ms + a 262 MB f32 buffer. NOTE: with
    left padding the LAST position is the newest token for every row (the
    generation call sites pad left), so slicing x is exact there."""
    b, t = tokens.shape
    if positions is None:
        start = cache.length if cache is not None else 0
        if attn_mask is not None and cache is None:
            positions = jnp.maximum(jnp.cumsum(attn_mask, axis=-1) - 1, 0)
        elif getattr(start, "ndim", 0) == 1:
            # per-slot write cursors (continuous batching / speculative
            # verify): slot i's T tokens sit at positions start[i] + [0, T)
            positions = start[:, None] + jnp.arange(t, dtype=start.dtype)[None, :]
        else:
            positions = jnp.broadcast_to(jnp.arange(t)[None, :] + start, (b, t))

    x = embed(params, tokens, positions, cfg, dtype)

    # The layer's attention updates its rows of the FULL stacked cache in
    # place and returns the full arrays; thread them through the layer loop
    # (restacking per-layer slices here cost a whole-cache copy per step).
    cur = cache
    for i, bp in enumerate(params["layers"]):
        x, kv = block_forward(
            bp, x, i, cur, positions, cfg, backend, attn_mask,
            fresh_prefill=fresh_prefill, mask_contig=mask_contig,
        )
        if cache is not None:
            cur = KVCache(
                k=kv[0], v=kv[1], length=cur.length,
                k_scale=kv[2] if len(kv) == 4 else None,
                v_scale=kv[3] if len(kv) == 4 else None,
            )

    logits = unembed(params, x[:, -1:] if logits_last_only else x, cfg)
    if cache is not None:
        cache = KVCache(
            k=cur.k, v=cur.v, length=cache.length + t,
            k_scale=cur.k_scale, v_scale=cur.v_scale,
        )
    return logits, cache


__all__ = [
    "ArchConfig",
    "DenseLinear",
    "KVCache",
    "cache_shapes",
    "apply_linear",
    "apply_norm",
    "attention",
    "mlp",
    "moe_mlp",
    "block_forward",
    "embed",
    "unembed",
    "forward",
]
