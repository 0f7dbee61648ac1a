"""MiniCPM3 (MLA attention) and Baichuan (fused W_pack) family tests.

Neither family has a native `transformers` class (both are remote-code on
the Hub and this box is air-gapped), so parity is checked against
independent NumPy oracles written from the official modeling semantics
(MiniCPM3Attention / BaichuanAttention), plus quantize->save->reload
roundtrips through the full pipeline (which exercises the MLA calibration
captures and the W_pack packed-column merge)."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from safetensors.numpy import save_file  # noqa: E402

from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig  # noqa: E402

# ---------------------------------------------------------------------------
# tiny configs
# ---------------------------------------------------------------------------

MCPM = dict(
    model_type="minicpm3", vocab_size=128, hidden_size=32,
    num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=64,
    q_lora_rank=16, kv_lora_rank=16, qk_nope_head_dim=8,
    qk_rope_head_dim=8, v_head_dim=8, scale_emb=12.0, scale_depth=1.4,
    dim_model_base=16,
)

BCH = dict(
    model_type="baichuan", vocab_size=128, hidden_size=32,
    num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
    rms_norm_eps=1e-6, max_position_embeddings=64,
)


def _w(rng, *shape):
    return (rng.standard_normal(shape) * 0.1).astype(np.float32)


def _save_ckpt(path, cfg, tensors):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    save_file(tensors, os.path.join(path, "model.safetensors"))


def make_minicpm3(rng, path):
    c = MCPM
    h, nh = c["hidden_size"], c["num_attention_heads"]
    dn, dr, dv = c["qk_nope_head_dim"], c["qk_rope_head_dim"], c["v_head_dim"]
    rq, rkv = c["q_lora_rank"], c["kv_lora_rank"]
    t = {
        "model.embed_tokens.weight": _w(rng, c["vocab_size"], h),
        "model.norm.weight": 1 + 0.1 * _w(rng, h),
        "lm_head.weight": _w(rng, c["vocab_size"], h),
    }
    for i in range(c["num_hidden_layers"]):
        p = f"model.layers.{i}"
        t[f"{p}.self_attn.q_a_proj.weight"] = _w(rng, rq, h)
        t[f"{p}.self_attn.q_a_layernorm.weight"] = 1 + 0.1 * _w(rng, rq)
        t[f"{p}.self_attn.q_b_proj.weight"] = _w(rng, nh * (dn + dr), rq)
        t[f"{p}.self_attn.kv_a_proj_with_mqa.weight"] = _w(rng, rkv + dr, h)
        t[f"{p}.self_attn.kv_a_layernorm.weight"] = 1 + 0.1 * _w(rng, rkv)
        t[f"{p}.self_attn.kv_b_proj.weight"] = _w(rng, nh * (dn + dv), rkv)
        t[f"{p}.self_attn.o_proj.weight"] = _w(rng, h, nh * dv)
        t[f"{p}.input_layernorm.weight"] = 1 + 0.1 * _w(rng, h)
        t[f"{p}.post_attention_layernorm.weight"] = 1 + 0.1 * _w(rng, h)
        t[f"{p}.mlp.gate_proj.weight"] = _w(rng, c["intermediate_size"], h)
        t[f"{p}.mlp.up_proj.weight"] = _w(rng, c["intermediate_size"], h)
        t[f"{p}.mlp.down_proj.weight"] = _w(rng, h, c["intermediate_size"])
    _save_ckpt(path, c, t)
    return t


def make_baichuan(rng, path):
    c = BCH
    h = c["hidden_size"]
    t = {
        "model.embed_tokens.weight": _w(rng, c["vocab_size"], h),
        "model.norm.weight": 1 + 0.1 * _w(rng, h),
        "lm_head.weight": _w(rng, c["vocab_size"], h),
    }
    for i in range(c["num_hidden_layers"]):
        p = f"model.layers.{i}"
        t[f"{p}.self_attn.W_pack.weight"] = _w(rng, 3 * h, h)
        t[f"{p}.self_attn.o_proj.weight"] = _w(rng, h, h)
        t[f"{p}.input_layernorm.weight"] = 1 + 0.1 * _w(rng, h)
        t[f"{p}.post_attention_layernorm.weight"] = 1 + 0.1 * _w(rng, h)
        t[f"{p}.mlp.gate_proj.weight"] = _w(rng, c["intermediate_size"], h)
        t[f"{p}.mlp.up_proj.weight"] = _w(rng, c["intermediate_size"], h)
        t[f"{p}.mlp.down_proj.weight"] = _w(rng, h, c["intermediate_size"])
    _save_ckpt(path, c, t)
    return t


# ---------------------------------------------------------------------------
# NumPy oracles (written from the official modeling code semantics)
# ---------------------------------------------------------------------------


def np_rms(x, w, eps=1e-6):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def np_rope_halves(x, pos, dr, theta=10000.0):
    """neox-style rotate-half over the last dr dims; x [B,T,H,dr]."""
    inv = 1.0 / theta ** (np.arange(0, dr, 2, dtype=np.float64) / dr)
    ang = pos[..., None] * inv                     # [B,T,dr/2]
    cos, sin = np.cos(ang)[:, :, None, :], np.sin(ang)[:, :, None, :]
    x1, x2 = x[..., : dr // 2], x[..., dr // 2:]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


def _softmax_causal(logits):
    # logits [B,H,T,S], causal over the last two dims
    t, s = logits.shape[-2:]
    mask = np.tril(np.ones((t, s), bool))
    logits = np.where(mask, logits, -1e30)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def oracle_minicpm3(t, ids):
    c = MCPM
    h, nh, L = c["hidden_size"], c["num_attention_heads"], c["num_hidden_layers"]
    dn, dr, dv = c["qk_nope_head_dim"], c["qk_rope_head_dim"], c["v_head_dim"]
    rkv = c["kv_lora_rank"]
    d = dn + dr
    rs = c["scale_depth"] / np.sqrt(L)
    b, tt = ids.shape
    pos = np.broadcast_to(np.arange(tt, dtype=np.float64)[None], (b, tt))

    def perm(z):  # official interleave -> halves pre-permutation
        s = z.shape
        return z.reshape(*s[:-1], dr // 2, 2).swapaxes(-1, -2).reshape(*s)

    x = t["model.embed_tokens.weight"][ids].astype(np.float64) * c["scale_emb"]
    for i in range(L):
        p = f"model.layers.{i}"
        hh = np_rms(x, t[f"{p}.input_layernorm.weight"])
        qa = np_rms(hh @ t[f"{p}.self_attn.q_a_proj.weight"].T,
                    t[f"{p}.self_attn.q_a_layernorm.weight"])
        q = (qa @ t[f"{p}.self_attn.q_b_proj.weight"].T).reshape(b, tt, nh, d)
        kva = hh @ t[f"{p}.self_attn.kv_a_proj_with_mqa.weight"].T
        lat, kpe = kva[..., :rkv], kva[..., rkv:]
        lat = np_rms(lat, t[f"{p}.self_attn.kv_a_layernorm.weight"])
        kv = (lat @ t[f"{p}.self_attn.kv_b_proj.weight"].T).reshape(b, tt, nh, dn + dv)
        k_nope, v = kv[..., :dn], kv[..., dn:]
        q_pe = np_rope_halves(perm(q[..., dn:]), pos, dr)
        kpe_r = np_rope_halves(perm(kpe)[:, :, None, :], pos, dr)
        qf = np.concatenate([q[..., :dn], q_pe], -1)
        kf = np.concatenate([k_nope, np.broadcast_to(kpe_r, (b, tt, nh, dr))], -1)
        logits = np.einsum("bthd,bshd->bhts", qf, kf) / np.sqrt(d)
        att = _softmax_causal(logits)
        o = np.einsum("bhts,bshd->bthd", att, v).reshape(b, tt, nh * dv)
        x = x + (o @ t[f"{p}.self_attn.o_proj.weight"].T) * rs
        h2 = np_rms(x, t[f"{p}.post_attention_layernorm.weight"])
        g = h2 @ t[f"{p}.mlp.gate_proj.weight"].T
        u = h2 @ t[f"{p}.mlp.up_proj.weight"].T
        silu = g / (1 + np.exp(-g)) * u
        x = x + (silu @ t[f"{p}.mlp.down_proj.weight"].T) * rs
    x = np_rms(x, t["model.norm.weight"])
    return (x @ t["lm_head.weight"].T) * (c["dim_model_base"] / h)


def oracle_baichuan(t, ids):
    c = BCH
    h, nh, L = c["hidden_size"], c["num_attention_heads"], c["num_hidden_layers"]
    d = h // nh
    b, tt = ids.shape
    pos = np.broadcast_to(np.arange(tt, dtype=np.float64)[None], (b, tt))
    x = t["model.embed_tokens.weight"][ids].astype(np.float64)
    for i in range(L):
        p = f"model.layers.{i}"
        hh = np_rms(x, t[f"{p}.input_layernorm.weight"])
        qkv = hh @ t[f"{p}.self_attn.W_pack.weight"].T        # [B,T,3H]
        q = qkv[..., :h].reshape(b, tt, nh, d)
        k = qkv[..., h:2 * h].reshape(b, tt, nh, d)
        v = qkv[..., 2 * h:].reshape(b, tt, nh, d)
        q = np_rope_halves(q, pos, d)
        k = np_rope_halves(k, pos, d)
        att = _softmax_causal(np.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d))
        o = np.einsum("bhts,bshd->bthd", att, v).reshape(b, tt, h)
        x = x + o @ t[f"{p}.self_attn.o_proj.weight"].T
        h2 = np_rms(x, t[f"{p}.post_attention_layernorm.weight"])
        g = h2 @ t[f"{p}.mlp.gate_proj.weight"].T
        u = h2 @ t[f"{p}.mlp.up_proj.weight"].T
        x = x + ((g / (1 + np.exp(-g)) * u) @ t[f"{p}.mlp.down_proj.weight"].T)
    x = np_rms(x, t["model.norm.weight"])
    return x @ t["lm_head.weight"].T


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_minicpm3_forward_oracle(tmp_path, rng):
    t = make_minicpm3(rng, str(tmp_path))
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    ids = rng.integers(0, 128, size=(2, 9)).astype(np.int32)
    ref = oracle_minicpm3(t, ids)
    ours = np.asarray(model.forward(ids))
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)
    assert np.abs(ours - ref).mean() < 2e-3


def test_minicpm3_latent_cache_generate(tmp_path, rng):
    """Cached decode runs over the LATENT cache (VERDICT r1 item 6:
    [kv_lora_rank] + [qk_rope_head_dim] per token, kv_b absorbed into the
    attention einsums) and must produce the same tokens as cache-less
    step-by-step argmax re-forwarding."""
    from autogptq_tpu.models import arch

    make_minicpm3(rng, str(tmp_path))
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)

    # cache bytes/token shrink: [1, dr] + [1, rkv] instead of 2*[H, dn+dr]
    c = MCPM
    kshape, vshape = arch.cache_shapes(model.cfg, 1, 16)
    assert kshape[-2:] == (1, c["qk_rope_head_dim"])
    assert vshape[-2:] == (1, c["kv_lora_rank"])

    ids = rng.integers(0, 128, size=(1, 5)).astype(np.int32)
    out = model.generate(ids, max_new_tokens=5)

    # oracle: no cache, full re-forward each step, greedy
    cur = ids.copy()
    for _ in range(5):
        logits = np.asarray(model.forward(cur))
        nxt = logits[:, -1].argmax(-1).astype(np.int32)
        cur = np.concatenate([cur, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(np.asarray(out), cur)


def test_minicpm3_latent_cache_int8_generate(tmp_path, rng):
    """int8-quantized latent cache decodes (scales per cached token)."""
    make_minicpm3(rng, str(tmp_path))
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    ids = rng.integers(0, 128, size=(1, 6)).astype(np.int32)
    out_fp = model.generate(ids, max_new_tokens=4)
    out_i8 = model.generate(ids, max_new_tokens=4, kv_quant=True)
    assert out_i8.shape == out_fp.shape
    # int8 latent rounding can flip argmax on a random tiny model; the
    # guarantee here is that the path runs and matches shapes/prefix
    np.testing.assert_array_equal(out_i8[:, :6], out_fp[:, :6])


def test_minicpm3_quantize_roundtrip(tmp_path, rng):
    make_minicpm3(rng, str(tmp_path / "fp"))
    qc = BaseQuantizeConfig(bits=4, group_size=8, desc_act=False)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    examples = [{"input_ids": rng.integers(0, 128, size=(16,))} for _ in range(2)]
    model.quantize(examples)
    model.save_quantized(str(tmp_path / "q"))
    from safetensors import safe_open

    ckpt = next((tmp_path / "q").glob("gptq_model-*.safetensors"))
    with safe_open(ckpt, framework="np") as f:
        names = set(f.keys())
    # all five MLA linears quantized under their HF names (minicpm3.py:8-15)
    for mod in ("q_a_proj", "q_b_proj", "kv_a_proj_with_mqa", "kv_b_proj", "o_proj"):
        assert f"model.layers.0.self_attn.{mod}.qweight" in names
    reloaded = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    ids = rng.integers(0, 128, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(reloaded.forward(ids)), np.asarray(model.forward(ids)),
        rtol=2e-3, atol=2e-3,
    )


def test_baichuan_forward_oracle(tmp_path, rng):
    t = make_baichuan(rng, str(tmp_path))
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    ids = rng.integers(0, 128, size=(2, 9)).astype(np.int32)
    ref = oracle_baichuan(t, ids)
    ours = np.asarray(model.forward(ids))
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)
    assert np.abs(ours - ref).mean() < 2e-3


def test_baichuan2_normhead(tmp_path, rng):
    """Baichuan2 (vocab >= 100k) L2-normalizes lm_head rows at inference
    (NormHead, official modeling_baichuan.py); detected by vocab size."""
    c = dict(BCH, vocab_size=100352)
    h, nh = c["hidden_size"], c["num_attention_heads"]
    t = {
        "model.embed_tokens.weight": _w(rng, c["vocab_size"], h),
        "model.norm.weight": 1 + 0.1 * _w(rng, h),
        "lm_head.weight": _w(rng, c["vocab_size"], h),
    }
    for i in range(c["num_hidden_layers"]):
        p = f"model.layers.{i}"
        t[f"{p}.self_attn.W_pack.weight"] = _w(rng, 3 * h, h)
        t[f"{p}.self_attn.o_proj.weight"] = _w(rng, h, h)
        t[f"{p}.input_layernorm.weight"] = 1 + 0.1 * _w(rng, h)
        t[f"{p}.post_attention_layernorm.weight"] = 1 + 0.1 * _w(rng, h)
        t[f"{p}.mlp.gate_proj.weight"] = _w(rng, c["intermediate_size"], h)
        t[f"{p}.mlp.up_proj.weight"] = _w(rng, c["intermediate_size"], h)
        t[f"{p}.mlp.down_proj.weight"] = _w(rng, h, c["intermediate_size"])
    _save_ckpt(str(tmp_path), c, t)

    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    assert model.cfg.lm_head_normalize

    ids = rng.integers(0, 1000, size=(1, 7)).astype(np.int32)
    ours = np.asarray(model.forward(ids))

    # oracle: baichuan body + row-normalized head
    wh = t["lm_head.weight"].astype(np.float64)
    wh = wh / np.maximum(np.linalg.norm(wh, axis=1, keepdims=True), 1e-12)
    t2 = dict(t, **{"lm_head.weight": wh})

    def oracle(tt, ids):
        saved = {k: BCH[k] for k in ("vocab_size",)}
        try:
            BCH.update(vocab_size=c["vocab_size"])
            return oracle_baichuan(tt, ids)
        finally:
            BCH.update(saved)

    ref = oracle(t2, ids)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)
    assert np.abs(ours - ref).mean() < 2e-3


def test_baichuan_13b_alibi_config():
    from autogptq_tpu.models.registry import get_family

    spec = get_family("baichuan")
    cfg13 = spec.arch_fn(dict(BCH, hidden_size=5120, num_attention_heads=40,
                              num_hidden_layers=40, intermediate_size=13696,
                              model_max_length=4096))
    assert cfg13.pos_embedding == "alibi"
    assert cfg13.max_position_embeddings == 4096
    cfg7 = spec.arch_fn(BCH)
    assert cfg7.pos_embedding == "rope"


def test_baichuan_quantize_roundtrip_wpack(tmp_path, rng):
    make_baichuan(rng, str(tmp_path / "fp"))
    qc = BaseQuantizeConfig(bits=4, group_size=16, desc_act=False)
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    examples = [{"input_ids": rng.integers(0, 128, size=(16,))} for _ in range(2)]
    model.quantize(examples)
    model.save_quantized(str(tmp_path / "q"))
    from safetensors import safe_open

    ckpt = next((tmp_path / "q").glob("gptq_model-*.safetensors"))
    with safe_open(ckpt, framework="np") as f:
        names = set(f.keys())
    # saved under the fused reference name (baichuan.py:8-13)
    assert "model.layers.0.self_attn.W_pack.qweight" in names
    assert not any("q_proj" in n for n in names)
    reloaded = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    ids = rng.integers(0, 128, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(reloaded.forward(ids)), np.asarray(model.forward(ids)),
        rtol=2e-3, atol=2e-3,
    )


# ---------------------------------------------------------------------------
# DeciLM variable GQA (per-layer kv heads)
# ---------------------------------------------------------------------------

DECI = dict(
    model_type="deci", vocab_size=128, hidden_size=32,
    num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads_per_layer=[2, 1], intermediate_size=64,
    rms_norm_eps=1e-6, max_position_embeddings=64,
)


def make_deci(rng, path):
    c = DECI
    h = c["hidden_size"]
    nh = c["num_attention_heads"]
    d = h // nh
    t = {
        "model.embed_tokens.weight": _w(rng, c["vocab_size"], h),
        "model.norm.weight": 1 + 0.1 * _w(rng, h),
        "lm_head.weight": _w(rng, c["vocab_size"], h),
    }
    for i, kvh in enumerate(c["num_key_value_heads_per_layer"]):
        p = f"model.layers.{i}"
        t[f"{p}.self_attn.q_proj.weight"] = _w(rng, nh * d, h)
        t[f"{p}.self_attn.k_proj.weight"] = _w(rng, kvh * d, h)
        t[f"{p}.self_attn.v_proj.weight"] = _w(rng, kvh * d, h)
        t[f"{p}.self_attn.o_proj.weight"] = _w(rng, h, nh * d)
        t[f"{p}.input_layernorm.weight"] = 1 + 0.1 * _w(rng, h)
        t[f"{p}.post_attention_layernorm.weight"] = 1 + 0.1 * _w(rng, h)
        t[f"{p}.mlp.gate_proj.weight"] = _w(rng, c["intermediate_size"], h)
        t[f"{p}.mlp.up_proj.weight"] = _w(rng, c["intermediate_size"], h)
        t[f"{p}.mlp.down_proj.weight"] = _w(rng, h, c["intermediate_size"])
    _save_ckpt(path, c, t)
    return t


def oracle_deci(t, ids):
    c = DECI
    h, nh, L = c["hidden_size"], c["num_attention_heads"], c["num_hidden_layers"]
    d = h // nh
    b, tt = ids.shape
    pos = np.broadcast_to(np.arange(tt, dtype=np.float64)[None], (b, tt))
    x = t["model.embed_tokens.weight"][ids].astype(np.float64)
    for i, kvh in enumerate(c["num_key_value_heads_per_layer"]):
        p = f"model.layers.{i}"
        hh = np_rms(x, t[f"{p}.input_layernorm.weight"])
        q = (hh @ t[f"{p}.self_attn.q_proj.weight"].T).reshape(b, tt, nh, d)
        k = (hh @ t[f"{p}.self_attn.k_proj.weight"].T).reshape(b, tt, kvh, d)
        v = (hh @ t[f"{p}.self_attn.v_proj.weight"].T).reshape(b, tt, kvh, d)
        q = np_rope_halves(q, pos, d)
        k = np_rope_halves(k, pos, d)
        rep = nh // kvh
        k = np.repeat(k, rep, axis=2)
        v = np.repeat(v, rep, axis=2)
        att = _softmax_causal(np.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d))
        o = np.einsum("bhts,bshd->bthd", att, v).reshape(b, tt, h)
        x = x + o @ t[f"{p}.self_attn.o_proj.weight"].T
        h2 = np_rms(x, t[f"{p}.post_attention_layernorm.weight"])
        g = h2 @ t[f"{p}.mlp.gate_proj.weight"].T
        u = h2 @ t[f"{p}.mlp.up_proj.weight"].T
        x = x + ((g / (1 + np.exp(-g)) * u) @ t[f"{p}.mlp.down_proj.weight"].T)
    x = np_rms(x, t["model.norm.weight"])
    return x @ t["lm_head.weight"].T


def test_decilm_variable_gqa_forward(tmp_path, rng):
    t = make_deci(rng, str(tmp_path))
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    assert model.cfg.num_kv_heads_per_layer == (2, 1)
    assert model.cfg.num_kv_heads == 2  # max, sizes the cache
    ids = rng.integers(0, 128, size=(2, 9)).astype(np.int32)
    ref = oracle_deci(t, ids)
    ours = np.asarray(model.forward(ids))
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)
    assert np.abs(ours - ref).mean() < 2e-3
    # cached generation exercises the padded KV-cache slots
    out = model.generate(ids[:1, :5], max_new_tokens=4)
    assert out.shape == (1, 9)

    # regression: the continuous-batching engine's VECTOR-cursor KV write
    # must pad layer-local kv heads up to the max-sized cache (a 1<hkv<max
    # layer previously failed the broadcast at trace time)
    from autogptq_tpu.serving import ContinuousBatchEngine, Request

    eng = ContinuousBatchEngine(model, max_slots=2, max_seq_len=32)
    res = eng.run([Request(0, ids[0, :5].astype(np.int32), max_new_tokens=4)])
    np.testing.assert_array_equal(res[0], out[0, 5:])


# ---------------------------------------------------------------------------
# qwen v1 (fused c_attn with bias, w2=gate / w1=up MLP, doubled intermediate)
# ---------------------------------------------------------------------------

QWEN = dict(
    model_type="qwen", vocab_size=128, hidden_size=32,
    num_hidden_layers=2, num_attention_heads=2, intermediate_size=128,
    layer_norm_epsilon=1e-6, rotary_emb_base=10000.0,
    max_position_embeddings=64,
)


def make_qwen(rng, path):
    c = QWEN
    h = c["hidden_size"]
    inter = c["intermediate_size"] // 2
    t = {
        "transformer.wte.weight": _w(rng, c["vocab_size"], h),
        "transformer.ln_f.weight": 1 + 0.1 * _w(rng, h),
        "lm_head.weight": _w(rng, c["vocab_size"], h),
    }
    for i in range(c["num_hidden_layers"]):
        p = f"transformer.h.{i}"
        t[f"{p}.attn.c_attn.weight"] = _w(rng, 3 * h, h)
        t[f"{p}.attn.c_attn.bias"] = _w(rng, 3 * h)
        t[f"{p}.attn.c_proj.weight"] = _w(rng, h, h)
        t[f"{p}.ln_1.weight"] = 1 + 0.1 * _w(rng, h)
        t[f"{p}.ln_2.weight"] = 1 + 0.1 * _w(rng, h)
        t[f"{p}.mlp.w1.weight"] = _w(rng, inter, h)
        t[f"{p}.mlp.w2.weight"] = _w(rng, inter, h)
        t[f"{p}.mlp.c_proj.weight"] = _w(rng, h, inter)
    _save_ckpt(path, c, t)
    return t


def oracle_qwen(t, ids):
    """Official QWenBlock semantics: RMSNorm, fused c_attn (bias), llama-style
    rotate-half rope on full head_dim, out = c_proj(w1(x) * silu(w2(x)))."""
    c = QWEN
    h, nh, L = c["hidden_size"], c["num_attention_heads"], c["num_hidden_layers"]
    d = h // nh
    b, tt = ids.shape
    pos = np.broadcast_to(np.arange(tt, dtype=np.float64)[None], (b, tt))
    x = t["transformer.wte.weight"][ids].astype(np.float64)
    for i in range(L):
        p = f"transformer.h.{i}"
        hh = np_rms(x, t[f"{p}.ln_1.weight"])
        qkv = hh @ t[f"{p}.attn.c_attn.weight"].T + t[f"{p}.attn.c_attn.bias"]
        q = qkv[..., :h].reshape(b, tt, nh, d)
        k = qkv[..., h:2 * h].reshape(b, tt, nh, d)
        v = qkv[..., 2 * h:].reshape(b, tt, nh, d)
        q = np_rope_halves(q, pos, d)
        k = np_rope_halves(k, pos, d)
        att = _softmax_causal(np.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d))
        o = np.einsum("bhts,bshd->bthd", att, v).reshape(b, tt, h)
        x = x + o @ t[f"{p}.attn.c_proj.weight"].T
        h2 = np_rms(x, t[f"{p}.ln_2.weight"])
        up = h2 @ t[f"{p}.mlp.w1.weight"].T
        gate = h2 @ t[f"{p}.mlp.w2.weight"].T
        act = gate / (1 + np.exp(-gate)) * up
        x = x + act @ t[f"{p}.mlp.c_proj.weight"].T
    x = np_rms(x, t["transformer.ln_f.weight"])
    return x @ t["lm_head.weight"].T


def test_qwen_v1_forward_oracle(tmp_path, rng):
    t = make_qwen(rng, str(tmp_path))
    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    ids = rng.integers(0, 128, size=(2, 9)).astype(np.int32)
    ref = oracle_qwen(t, ids)
    ours = np.asarray(model.forward(ids))
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)
    assert np.abs(ours - ref).mean() < 2e-3


def test_qwen_v1_logn_and_dynamic_ntk(tmp_path, rng):
    """use_logn_attn + use_dynamic_ntk past the training seq_length
    (official modeling_qwen.py long-context extensions): q scaled by
    max(1, log_L(pos+1)), rope base scaled by ntk_alpha^(d/(d-2)) with
    alpha = max(2^ceil(log2(len/L)+1)-1, 1)."""
    seq_len_train = 8
    c = dict(QWEN, use_logn_attn=True, use_dynamic_ntk=True,
             seq_length=seq_len_train)
    h, nh, L = c["hidden_size"], c["num_attention_heads"], c["num_hidden_layers"]
    d = h // nh
    import json as _json
    import os as _os

    t = make_qwen(rng, str(tmp_path))
    with open(_os.path.join(str(tmp_path), "config.json"), "w") as f:
        _json.dump(c, f)

    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    assert model.cfg.logn_attn_seq_len == seq_len_train
    assert model.cfg.rope_ntk_seq_len == seq_len_train

    tt = 14  # > seq_length: both extensions active
    ids = rng.integers(0, 128, size=(1, tt)).astype(np.int32)
    ours = np.asarray(model.forward(ids))

    # NumPy oracle with the official formulas
    import math

    alpha = max(2.0 ** math.ceil(math.log2(tt / seq_len_train) + 1) - 1.0, 1.0)
    base = c["rotary_emb_base"] * alpha ** (d / (d - 2))
    b = 1
    pos = np.broadcast_to(np.arange(tt, dtype=np.float64)[None], (b, tt))
    logn = np.maximum(np.log(pos + 1) / np.log(seq_len_train), 1.0)

    def rope_base(x, theta):
        inv = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        ang = pos[..., None] * inv
        cos, sin = np.cos(ang)[:, :, None, :], np.sin(ang)[:, :, None, :]
        x1, x2 = x[..., : d // 2], x[..., d // 2:]
        return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)

    x = t["transformer.wte.weight"][ids].astype(np.float64)
    for i in range(L):
        p = f"transformer.h.{i}"
        hh = np_rms(x, t[f"{p}.ln_1.weight"])
        qkv = hh @ t[f"{p}.attn.c_attn.weight"].T + t[f"{p}.attn.c_attn.bias"]
        q = qkv[..., :h].reshape(b, tt, nh, d)
        k = qkv[..., h:2 * h].reshape(b, tt, nh, d)
        v = qkv[..., 2 * h:].reshape(b, tt, nh, d)
        q = rope_base(q, base) * logn[..., None, None]
        k = rope_base(k, base)
        att = _softmax_causal(np.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d))
        o = np.einsum("bhts,bshd->bthd", att, v).reshape(b, tt, h)
        x = x + o @ t[f"{p}.attn.c_proj.weight"].T
        h2 = np_rms(x, t[f"{p}.ln_2.weight"])
        up = h2 @ t[f"{p}.mlp.w1.weight"].T
        gate = h2 @ t[f"{p}.mlp.w2.weight"].T
        x = x + (gate / (1 + np.exp(-gate)) * up) @ t[f"{p}.mlp.c_proj.weight"].T
    x = np_rms(x, t["transformer.ln_f.weight"])
    ref = x @ t["lm_head.weight"].T

    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)
    assert np.abs(ours - ref).mean() < 2e-3


def test_qwen_v1_quantize_roundtrip(tmp_path, rng):
    make_qwen(rng, str(tmp_path / "fp"))
    qc = BaseQuantizeConfig(bits=4, group_size=16, desc_act=False)
    m = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    m.quantize([{"input_ids": rng.integers(0, 128, size=(16,))} for _ in range(2)])
    m.save_quantized(str(tmp_path / "q"))
    from safetensors import safe_open

    ckpt = next((tmp_path / "q").glob("gptq_model-*.safetensors"))
    with safe_open(ckpt, framework="np") as f:
        names = set(f.keys())
    # re-fused under the reference's module name (qwen.py:14-18)
    assert "transformer.h.0.attn.c_attn.qweight" in names
    m2 = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    ids = rng.integers(0, 128, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(m2.forward(ids)), np.asarray(m.forward(ids)), rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# moss (codegen architecture under moss model_type / config keys)
# ---------------------------------------------------------------------------


def test_moss_forward_matches_hf_codegen(tmp_path, rng):
    """MOSS IS the codegen architecture (fnlp/moss-moon models reuse codegen
    tensor names); verify the moss spec by saving a real HF CodeGen model,
    relabeling its config to model_type=moss, and comparing logits."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    torch.manual_seed(0)
    cfg = transformers.CodeGenConfig(
        vocab_size=128, n_embd=64, n_layer=2, n_head=4, rotary_dim=8,
        n_positions=64,
    )
    hf = transformers.CodeGenForCausalLM(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    with open(tmp_path / "config.json") as f:
        c = json.load(f)
    c["model_type"] = "moss"
    with open(tmp_path / "config.json", "w") as f:
        json.dump(c, f)

    model = AutoGPTQForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    ids = rng.integers(0, 128, size=(2, 10)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits.float().numpy()
    ours = np.asarray(model.forward(ids))
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)
    assert np.abs(ours - ref).mean() < 2e-3
