"""Model-family registry: declarative specs binding HF checkpoints to the
generic decoder engine (arch.py).

The reference's per-family modules (/root/reference/auto_gptq/modeling/*.py)
declare four name-lists per family; here a :class:`FamilySpec` declares the
HF-config translation, the HF<->tree tensor name maps, and the quantization
ordering (``quant_layers`` == the reference's ``inside_layer_modules``,
e.g. llama.py:21-26). One functional engine executes every family.

Tensor-name conventions on disk follow HF exactly, so quantized checkpoints
written by this framework are loadable by the reference and vice versa
(qweight/qzeros/scales/g_idx live under the HF module prefix, e.g.
``model.layers.0.self_attn.q_proj.qweight``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Callable

from .arch import ArchConfig


@dataclass(frozen=True)
class FusedQKV:
    """HF checkpoints that store q/k/v as ONE fused tensor. ``layout``:

    * "concat":      [q (H) | k (Hkv*d) | v (Hkv*d)] along the output dim
                     (gpt2, gpt_bigcode/falcon MQA, mpt)
    * "per_head":    [(q d | k d | v d) x heads] (gpt_neox, bloom)
    * "codegen_qvk": mp_num chunks, each [q | v | k] (codegen)
    * "grouped":     [(q d*hpg | k d | v d) x kv_groups] (falcon new arch)
    """

    hf_name: str
    layout: str = "concat"
    mp_num: int = 4  # codegen only

    def column_split(self, heads: int, kv_heads: int, d: int):
        """Return (q_cols, k_cols, v_cols) index arrays into the fused N."""
        import numpy as np

        hq, hkv = heads * d, kv_heads * d
        n = hq + 2 * hkv
        if self.layout == "concat":
            return (
                np.arange(0, hq),
                np.arange(hq, hq + hkv),
                np.arange(hq + hkv, n),
            )
        if self.layout == "per_head":
            assert heads == kv_heads
            idx = np.arange(n).reshape(heads, 3, d)
            return idx[:, 0].reshape(-1), idx[:, 1].reshape(-1), idx[:, 2].reshape(-1)
        if self.layout == "codegen_qvk":
            assert heads == kv_heads
            mp = self.mp_num
            idx = np.arange(n).reshape(mp, 3, hq // mp)  # chunk = [q | v | k]
            return (
                idx[:, 0].reshape(-1),
                idx[:, 2].reshape(-1),
                idx[:, 1].reshape(-1),
            )
        if self.layout == "grouped":
            hpg = heads // kv_heads
            idx = np.arange(n).reshape(kv_heads, hpg + 2, d)
            return (
                idx[:, :hpg].reshape(-1),
                idx[:, hpg].reshape(-1),
                idx[:, hpg + 1].reshape(-1),
            )
        raise ValueError(f"unknown fused layout {self.layout}")


@dataclass(frozen=True)
class FamilySpec:
    model_type: str
    arch_fn: Callable[[dict], ArchConfig]
    layers_prefix: str                       # e.g. "model.layers"
    # our block-relative path -> HF block-relative module name (linears) or
    # tensor prefix (norms; ".weight"/".bias" appended automatically)
    block_linears: dict[str, str]
    block_norms: dict[str, str]
    # our top-level key -> HF tensor name (embeddings/norms: full tensor name
    # without ".weight"; lm_head treated as a linear module)
    top_tensors: dict[str, str]
    lm_head: str | None                      # HF module name or None if tied
    quant_layers: list[list[str]] = field(default_factory=list)
    # linears whose HF layout is [K, N] already (Conv1D-style, gpt2)
    conv1d_linears: bool = False
    # q/k/v stored fused in the HF checkpoint (block_linears then omits them)
    fused_qkv: FusedQKV | None = None
    # top-level dense LINEAR modules (transposed on load, never quantized):
    # our key -> HF module name, e.g. OPT's project_in/project_out
    top_linears: dict[str, str] = field(default_factory=dict)


REGISTRY: dict[str, FamilySpec] = {}


def register(spec: FamilySpec) -> FamilySpec:
    REGISTRY[spec.model_type] = spec
    return spec


def get_family(model_type: str, hf_config: dict | None = None) -> FamilySpec:
    if model_type not in REGISTRY:
        raise ValueError(
            f"model_type {model_type!r} isn't supported yet. "
            f"Supported: {sorted(REGISTRY)}"
        )
    entry = REGISTRY[model_type]
    if callable(entry) and not isinstance(entry, FamilySpec):
        return entry(hf_config or {})
    return entry


def _gqa_head_dim(c: dict) -> tuple[int, int, int]:
    heads = c["num_attention_heads"]
    kv = c.get("num_key_value_heads", heads) or heads
    head_dim = c.get("head_dim") or c["hidden_size"] // heads
    return heads, kv, head_dim


# ---------------------------------------------------------------------------
# Llama family (llama / llama2 / llama3 / yi / deci are config-compatible)
# ---------------------------------------------------------------------------


def _llama_arch(c: dict, **overrides) -> ArchConfig:
    heads, kv, head_dim = _gqa_head_dim(c)
    kw = dict(
        model_type=c.get("model_type", "llama"),
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=kv,
        head_dim=head_dim,
        intermediate_size=c["intermediate_size"],
        max_position_embeddings=c.get("max_position_embeddings", 2048),
        norm_type="rmsnorm",
        norm_eps=c.get("rms_norm_eps", 1e-6),
        pos_embedding="rope",
        rope_theta=c.get("rope_theta", 10000.0),
        mlp_act="silu_glu",
        tie_word_embeddings=c.get("tie_word_embeddings", False),
        sliding_window=c.get("sliding_window"),
    )
    kw.update(overrides)
    return ArchConfig(**kw)


_LLAMA_BLOCK_LINEARS = {
    "attn.q_proj": "self_attn.q_proj",
    "attn.k_proj": "self_attn.k_proj",
    "attn.v_proj": "self_attn.v_proj",
    "attn.o_proj": "self_attn.o_proj",
    "mlp.gate_proj": "mlp.gate_proj",
    "mlp.up_proj": "mlp.up_proj",
    "mlp.down_proj": "mlp.down_proj",
}
_LLAMA_BLOCK_NORMS = {
    "input_norm": "input_layernorm",
    "post_norm": "post_attention_layernorm",
}
_LLAMA_TOP = {
    "embed_tokens": "model.embed_tokens.weight",
    "final_norm.weight": "model.norm.weight",
}
# Quantization order mirrors reference llama.py:21-26.
_LLAMA_QUANT = [
    ["attn.k_proj", "attn.v_proj", "attn.q_proj"],
    ["attn.o_proj"],
    ["mlp.up_proj", "mlp.gate_proj"],
    ["mlp.down_proj"],
]

register(
    FamilySpec(
        model_type="llama",
        arch_fn=_llama_arch,
        layers_prefix="model.layers",
        block_linears=_LLAMA_BLOCK_LINEARS,
        block_norms=_LLAMA_BLOCK_NORMS,
        top_tensors=_LLAMA_TOP,
        lm_head="lm_head",
        quant_layers=_LLAMA_QUANT,
    )
)

def _decilm_arch(c: dict) -> ArchConfig:
    """DeciLM 6B/7B: llama-compatible except num_key_value_heads_per_layer
    (variable GQA). The reference handles it via trust_remote_code name
    lists (modeling/decilm.py); here the engine takes the per-layer list."""
    per_layer = c.get("num_key_value_heads_per_layer")
    if per_layer is None:
        return _llama_arch(c, model_type="deci")
    cfg = _llama_arch(
        dict(c, num_key_value_heads=max(per_layer)),
        model_type="deci",
        num_kv_heads_per_layer=tuple(per_layer),
    )
    return cfg


register(
    FamilySpec(
        model_type="deci",
        arch_fn=_decilm_arch,
        layers_prefix="model.layers",
        block_linears=_LLAMA_BLOCK_LINEARS,
        block_norms=_LLAMA_BLOCK_NORMS,
        top_tensors=_LLAMA_TOP,
        lm_head="lm_head",
        quant_layers=_LLAMA_QUANT,
    )
)


for _mt in ("mistral", "yi", "internlm", "xverse"):
    register(
        FamilySpec(
            model_type=_mt,
            arch_fn=lambda c, _mt=_mt: _llama_arch(c),
            layers_prefix="model.layers",
            block_linears=_LLAMA_BLOCK_LINEARS,
            block_norms=_LLAMA_BLOCK_NORMS,
            top_tensors=_LLAMA_TOP,
            lm_head="lm_head",
            quant_layers=_LLAMA_QUANT,
        )
    )


# ---------------------------------------------------------------------------
# Baichuan (reference modeling/baichuan.py): llama-style decoder with a FUSED
# W_pack qkv ([q|k|v] concat). Baichuan-7B (hidden 4096) uses RoPE;
# Baichuan-13B (hidden 5120) uses alibi and no rotary — the HF config carries
# no explicit flag, so we follow the official modeling code's size split.
# The reference quantizes W_pack as one module (baichuan.py:8-13); we
# quantize the split columns (identical math: all three share the same
# input, hence the same Hessian) and re-merge on save for checkpoint parity.
# ---------------------------------------------------------------------------


def _baichuan_arch(c: dict) -> ArchConfig:
    alibi = c["hidden_size"] >= 5120
    # Baichuan2 (vocab 125696 vs v1's 64000) L2-normalizes lm_head rows at
    # inference (NormHead, official modeling_baichuan.py); same size split
    # for rope-vs-alibi as v1.
    return _llama_arch(
        c,
        model_type="baichuan",
        pos_embedding="alibi" if alibi else "rope",
        max_position_embeddings=c.get(
            "model_max_length", c.get("max_position_embeddings", 4096)
        ),
        lm_head_normalize=c.get("vocab_size", 0) >= 100000,
    )


register(
    FamilySpec(
        model_type="baichuan",
        arch_fn=_baichuan_arch,
        layers_prefix="model.layers",
        block_linears={
            "attn.o_proj": "self_attn.o_proj",
            "mlp.gate_proj": "mlp.gate_proj",
            "mlp.up_proj": "mlp.up_proj",
            "mlp.down_proj": "mlp.down_proj",
        },
        block_norms=_LLAMA_BLOCK_NORMS,
        top_tensors=_LLAMA_TOP,
        lm_head="lm_head",
        quant_layers=[
            ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
            ["attn.o_proj"],
            ["mlp.up_proj", "mlp.gate_proj"],
            ["mlp.down_proj"],
        ],
        fused_qkv=FusedQKV("self_attn.W_pack", "concat"),
    )
)


def _qwen2_arch(c: dict) -> ArchConfig:
    # Qwen2 gates windowed attention behind use_sliding_window (default
    # False; HF additionally exempts layers below max_window_layers, which
    # for shipped configs is ALL layers). Applying the window whenever
    # sliding_window is set — as mistral does — would wrongly mask long
    # sequences on stock Qwen2 checkpoints.
    sw = None
    if c.get("use_sliding_window", False):
        mwl = c.get("max_window_layers", 0)
        if mwl <= 0:
            sw = c.get("sliding_window")
        elif mwl < c.get("num_hidden_layers", 0):
            # Mixed full/windowed layers; per-layer windows are not modeled.
            # Every released Qwen2 config has max_window_layers >=
            # num_hidden_layers (no windowed layer), so refuse loudly rather
            # than silently diverge from HF on a non-stock config.
            raise NotImplementedError(
                "qwen2 use_sliding_window with 0 < max_window_layers < "
                "num_hidden_layers (mixed full/windowed layers) is not "
                "supported; set use_sliding_window=False or "
                "max_window_layers >= num_hidden_layers"
            )
        # else: window exempt on all layers — full attention, matching HF.
    return _llama_arch(c, attn_qkv_bias=True, sliding_window=sw)


register(
    FamilySpec(
        model_type="qwen2",
        arch_fn=_qwen2_arch,
        layers_prefix="model.layers",
        block_linears=_LLAMA_BLOCK_LINEARS,
        block_norms=_LLAMA_BLOCK_NORMS,
        top_tensors=_LLAMA_TOP,
        lm_head="lm_head",
        quant_layers=_LLAMA_QUANT,
    )
)


def _gemma_arch(c: dict) -> ArchConfig:
    return _llama_arch(
        c,
        mlp_act="gelu_glu",
        scale_embedding=True,
        tie_word_embeddings=True,
        norm_eps=c.get("rms_norm_eps", 1e-6),
        norm_plus_one=True,  # gemma RMSNorm multiplies by (1 + w)
    )


register(
    FamilySpec(
        model_type="gemma",
        arch_fn=_gemma_arch,
        layers_prefix="model.layers",
        block_linears=_LLAMA_BLOCK_LINEARS,
        block_norms=_LLAMA_BLOCK_NORMS,
        top_tensors=_LLAMA_TOP,
        lm_head=None,
        quant_layers=_LLAMA_QUANT,
    )
)


# ---------------------------------------------------------------------------
# Mixtral (MoE)
# ---------------------------------------------------------------------------


def _mixtral_arch(c: dict) -> ArchConfig:
    return _llama_arch(
        c,
        moe_num_experts=c.get("num_local_experts", 8),
        moe_top_k=c.get("num_experts_per_tok", 2),
    )


def _mixtral_block_linears(num_experts: int) -> dict[str, str]:
    d = {
        "attn.q_proj": "self_attn.q_proj",
        "attn.k_proj": "self_attn.k_proj",
        "attn.v_proj": "self_attn.v_proj",
        "attn.o_proj": "self_attn.o_proj",
        "mlp.router": "block_sparse_moe.gate",
    }
    for e in range(num_experts):
        d[f"mlp.experts.{e}.gate_proj"] = f"block_sparse_moe.experts.{e}.w1"
        d[f"mlp.experts.{e}.down_proj"] = f"block_sparse_moe.experts.{e}.w2"
        d[f"mlp.experts.{e}.up_proj"] = f"block_sparse_moe.experts.{e}.w3"
    return d


# Quantization order mirrors reference mixtral.py:8-40 (router not quantized).
def _mixtral_quant(num_experts: int) -> list[list[str]]:
    return [
        ["attn.k_proj", "attn.v_proj", "attn.q_proj"],
        ["attn.o_proj"],
        [f"mlp.experts.{e}.{p}" for e in range(num_experts) for p in ("gate_proj", "up_proj")],
        [f"mlp.experts.{e}.down_proj" for e in range(num_experts)],
    ]


def _mixtral_family(c: dict) -> FamilySpec:
    """Config-dependent spec: the expert name lists follow num_local_experts
    (the reference hardcodes 8, mixtral.py:8-40)."""
    n = c.get("num_local_experts", 8)
    return FamilySpec(
        model_type="mixtral",
        arch_fn=_mixtral_arch,
        layers_prefix="model.layers",
        block_linears=_mixtral_block_linears(n),
        block_norms=_LLAMA_BLOCK_NORMS,
        top_tensors=_LLAMA_TOP,
        lm_head="lm_head",
        quant_layers=_mixtral_quant(n),
    )


REGISTRY["mixtral"] = _mixtral_family


# ---------------------------------------------------------------------------
# OPT
# ---------------------------------------------------------------------------


def _opt_arch(c: dict) -> ArchConfig:
    heads = c["num_attention_heads"]
    return ArchConfig(
        model_type="opt",
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=c["hidden_size"] // heads,
        intermediate_size=c["ffn_dim"],
        max_position_embeddings=c.get("max_position_embeddings", 2048),
        norm_type="layernorm",
        norm_eps=1e-5,
        pos_embedding="learned",
        pos_offset=2,
        mlp_act="relu",
        attn_qkv_bias=True,
        attn_out_bias=True,
        mlp_bias=True,
        tie_word_embeddings=c.get("tie_word_embeddings", True),
        # opt-350m: do_layer_norm_before=False -> classic post-LN blocks and
        # no final layer norm (HF OPTDecoder only builds final_layer_norm
        # when do_layer_norm_before is set)
        pre_norm=c.get("do_layer_norm_before", True),
        final_norm=c.get("do_layer_norm_before", True),
    )


register(
    FamilySpec(
        model_type="opt",
        arch_fn=_opt_arch,
        layers_prefix="model.decoder.layers",
        block_linears={
            "attn.q_proj": "self_attn.q_proj",
            "attn.k_proj": "self_attn.k_proj",
            "attn.v_proj": "self_attn.v_proj",
            "attn.o_proj": "self_attn.out_proj",
            "mlp.up_proj": "fc1",
            "mlp.down_proj": "fc2",
        },
        block_norms={
            "input_norm": "self_attn_layer_norm",
            "post_norm": "final_layer_norm",
        },
        top_tensors={
            "embed_tokens": "model.decoder.embed_tokens.weight",
            "embed_positions": "model.decoder.embed_positions.weight",
            "final_norm.weight": "model.decoder.final_layer_norm.weight",
            "final_norm.bias": "model.decoder.final_layer_norm.bias",
        },
        lm_head=None,
        # opt-350m word_embed_proj_dim != hidden_size projection pair;
        # absent from the checkpoint for every other OPT size
        top_linears={
            "project_in": "model.decoder.project_in",
            "project_out": "model.decoder.project_out",
        },
        # mirrors reference opt.py:5-22
        quant_layers=[
            ["attn.k_proj", "attn.v_proj", "attn.q_proj"],
            ["attn.o_proj"],
            ["mlp.up_proj"],
            ["mlp.down_proj"],
        ],
    )
)


# ---------------------------------------------------------------------------
# GPT-J
# ---------------------------------------------------------------------------


def _gptj_arch(c: dict) -> ArchConfig:
    heads = c["n_head"]
    return ArchConfig(
        model_type="gptj",
        vocab_size=c["vocab_size"],
        hidden_size=c["n_embd"],
        num_layers=c["n_layer"],
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=c["n_embd"] // heads,
        intermediate_size=c.get("n_inner") or 4 * c["n_embd"],
        max_position_embeddings=c.get("n_positions", 2048),
        norm_type="layernorm",
        norm_eps=c.get("layer_norm_epsilon", 1e-5),
        pos_embedding="rope_gptj",
        rotary_dim=c.get("rotary_dim", 64),
        mlp_act="gelu_new",
        mlp_bias=True,
        parallel_block=True,
        tie_word_embeddings=False,
    )


register(
    FamilySpec(
        model_type="gptj",
        arch_fn=_gptj_arch,
        layers_prefix="transformer.h",
        block_linears={
            "attn.q_proj": "attn.q_proj",
            "attn.k_proj": "attn.k_proj",
            "attn.v_proj": "attn.v_proj",
            "attn.o_proj": "attn.out_proj",
            "mlp.up_proj": "mlp.fc_in",
            "mlp.down_proj": "mlp.fc_out",
        },
        block_norms={"input_norm": "ln_1"},
        top_tensors={
            "embed_tokens": "transformer.wte.weight",
            "final_norm.weight": "transformer.ln_f.weight",
            "final_norm.bias": "transformer.ln_f.bias",
        },
        lm_head="lm_head",
        # mirrors reference gptj.py
        quant_layers=[
            ["attn.k_proj", "attn.v_proj", "attn.q_proj"],
            ["attn.o_proj"],
            ["mlp.up_proj"],
            ["mlp.down_proj"],
        ],
    )
)


# ---------------------------------------------------------------------------
# GPT-2 (Conv1D weights, fused c_attn, learned positions, tied head)
# ---------------------------------------------------------------------------


def _gpt2_arch(c: dict) -> ArchConfig:
    heads = c["n_head"]
    return ArchConfig(
        model_type="gpt2",
        vocab_size=c["vocab_size"],
        hidden_size=c["n_embd"],
        num_layers=c["n_layer"],
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=c["n_embd"] // heads,
        intermediate_size=c.get("n_inner") or 4 * c["n_embd"],
        max_position_embeddings=c.get("n_positions", 1024),
        norm_type="layernorm",
        norm_eps=c.get("layer_norm_epsilon", 1e-5),
        pos_embedding="learned",
        mlp_act="gelu_new",
        attn_qkv_bias=True,
        attn_out_bias=True,
        mlp_bias=True,
        tie_word_embeddings=True,
    )


register(
    FamilySpec(
        model_type="gpt2",
        arch_fn=_gpt2_arch,
        layers_prefix="transformer.h",
        block_linears={
            "attn.o_proj": "attn.c_proj",
            "mlp.up_proj": "mlp.c_fc",
            "mlp.down_proj": "mlp.c_proj",
        },
        block_norms={"input_norm": "ln_1", "post_norm": "ln_2"},
        top_tensors={
            "embed_tokens": "transformer.wte.weight",
            "embed_positions": "transformer.wpe.weight",
            "final_norm.weight": "transformer.ln_f.weight",
            "final_norm.bias": "transformer.ln_f.bias",
        },
        lm_head=None,
        quant_layers=[
            ["attn.q_proj", "attn.k_proj", "attn.v_proj"],  # fused c_attn
            ["attn.o_proj"],
            ["mlp.up_proj"],
            ["mlp.down_proj"],
        ],
        conv1d_linears=True,
        fused_qkv=FusedQKV("attn.c_attn", "concat"),
    )
)


# ---------------------------------------------------------------------------
# GPT-NeoX / Pythia (fused per-head QKV, parallel residual w/ separate norms)
# ---------------------------------------------------------------------------


def _gpt_neox_arch(c: dict) -> ArchConfig:
    heads = c["num_attention_heads"]
    d = c["hidden_size"] // heads
    return ArchConfig(
        model_type="gpt_neox",
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=d,
        intermediate_size=c["intermediate_size"],
        max_position_embeddings=c.get("max_position_embeddings", 2048),
        norm_type="layernorm",
        norm_eps=c.get("layer_norm_eps", 1e-5),
        pos_embedding="rope",
        rope_theta=c.get("rotary_emb_base", 10000.0),
        rotary_dim=int(d * c.get("rotary_pct", 0.25)),
        mlp_act="gelu",
        attn_qkv_bias=True,
        attn_out_bias=True,
        mlp_bias=True,
        parallel_block=c.get("use_parallel_residual", True),
        parallel_norms=True,
        tie_word_embeddings=c.get("tie_word_embeddings", False),
    )


register(
    FamilySpec(
        model_type="gpt_neox",
        arch_fn=_gpt_neox_arch,
        layers_prefix="gpt_neox.layers",
        block_linears={
            "attn.o_proj": "attention.dense",
            "mlp.up_proj": "mlp.dense_h_to_4h",
            "mlp.down_proj": "mlp.dense_4h_to_h",
        },
        block_norms={
            "input_norm": "input_layernorm",
            "post_norm": "post_attention_layernorm",
        },
        top_tensors={
            "embed_tokens": "gpt_neox.embed_in.weight",
            "final_norm.weight": "gpt_neox.final_layer_norm.weight",
            "final_norm.bias": "gpt_neox.final_layer_norm.bias",
        },
        lm_head="embed_out",
        quant_layers=[
            ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
            ["attn.o_proj"],
            ["mlp.up_proj"],
            ["mlp.down_proj"],
        ],
        fused_qkv=FusedQKV("attention.query_key_value", "per_head"),
    )
)


# ---------------------------------------------------------------------------
# BLOOM (alibi, embedding layernorm, fused per-head QKV)
# ---------------------------------------------------------------------------


def _bloom_arch(c: dict) -> ArchConfig:
    heads = c["n_head"]
    return ArchConfig(
        model_type="bloom",
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["n_layer"],
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=c["hidden_size"] // heads,
        intermediate_size=4 * c["hidden_size"],
        max_position_embeddings=4096,
        norm_type="layernorm",
        norm_eps=c.get("layer_norm_epsilon", 1e-5),
        pos_embedding="alibi",
        embed_norm=True,
        mlp_act="gelu_new",
        attn_qkv_bias=True,
        attn_out_bias=True,
        mlp_bias=True,
        tie_word_embeddings=True,
    )


register(
    FamilySpec(
        model_type="bloom",
        arch_fn=_bloom_arch,
        layers_prefix="transformer.h",
        block_linears={
            "attn.o_proj": "self_attention.dense",
            "mlp.up_proj": "mlp.dense_h_to_4h",
            "mlp.down_proj": "mlp.dense_4h_to_h",
        },
        block_norms={
            "input_norm": "input_layernorm",
            "post_norm": "post_attention_layernorm",
        },
        top_tensors={
            "embed_tokens": "transformer.word_embeddings.weight",
            "embed_norm.weight": "transformer.word_embeddings_layernorm.weight",
            "embed_norm.bias": "transformer.word_embeddings_layernorm.bias",
            "final_norm.weight": "transformer.ln_f.weight",
            "final_norm.bias": "transformer.ln_f.bias",
        },
        lm_head=None,
        quant_layers=[
            ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
            ["attn.o_proj"],
            ["mlp.up_proj"],
            ["mlp.down_proj"],
        ],
        fused_qkv=FusedQKV("self_attention.query_key_value", "per_head"),
    )
)


# ---------------------------------------------------------------------------
# GPT-BigCode / santacoder / starcoder (MQA fused c_attn)
# ---------------------------------------------------------------------------


def _gpt_bigcode_arch(c: dict) -> ArchConfig:
    heads = c["n_head"]
    return ArchConfig(
        model_type="gpt_bigcode",
        vocab_size=c["vocab_size"],
        hidden_size=c["n_embd"],
        num_layers=c["n_layer"],
        num_heads=heads,
        num_kv_heads=1 if c.get("multi_query", True) else heads,
        head_dim=c["n_embd"] // heads,
        intermediate_size=c.get("n_inner") or 4 * c["n_embd"],
        max_position_embeddings=c.get("n_positions", 2048),
        norm_type="layernorm",
        norm_eps=c.get("layer_norm_epsilon", 1e-5),
        pos_embedding="learned",
        mlp_act="gelu_new",
        attn_qkv_bias=True,
        attn_out_bias=True,
        mlp_bias=True,
        tie_word_embeddings=True,
    )


register(
    FamilySpec(
        model_type="gpt_bigcode",
        arch_fn=_gpt_bigcode_arch,
        layers_prefix="transformer.h",
        block_linears={
            "attn.o_proj": "attn.c_proj",
            "mlp.up_proj": "mlp.c_fc",
            "mlp.down_proj": "mlp.c_proj",
        },
        block_norms={"input_norm": "ln_1", "post_norm": "ln_2"},
        top_tensors={
            "embed_tokens": "transformer.wte.weight",
            "embed_positions": "transformer.wpe.weight",
            "final_norm.weight": "transformer.ln_f.weight",
            "final_norm.bias": "transformer.ln_f.bias",
        },
        lm_head=None,
        quant_layers=[
            ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
            ["attn.o_proj"],
            ["mlp.up_proj"],
            ["mlp.down_proj"],
        ],
        fused_qkv=FusedQKV("attn.c_attn", "concat"),
    )
)

# starcoder2: separate q/k/v, LayerNorm, gelu MLP (c_fc/c_proj), rope
def _starcoder2_arch(c: dict) -> ArchConfig:
    heads, kv, head_dim = _gqa_head_dim(c)
    return ArchConfig(
        model_type="starcoder2",
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=kv,
        head_dim=head_dim,
        intermediate_size=c["intermediate_size"],
        max_position_embeddings=c.get("max_position_embeddings", 4096),
        norm_type="layernorm",
        norm_eps=c.get("norm_epsilon", 1e-5),
        pos_embedding="rope",
        rope_theta=c.get("rope_theta", 10000.0),
        mlp_act="gelu_new",
        attn_qkv_bias=c.get("use_bias", True),
        attn_out_bias=c.get("use_bias", True),
        mlp_bias=c.get("use_bias", True),
        sliding_window=c.get("sliding_window"),
        tie_word_embeddings=c.get("tie_word_embeddings", True),
    )


register(
    FamilySpec(
        model_type="starcoder2",
        arch_fn=_starcoder2_arch,
        layers_prefix="model.layers",
        block_linears={
            "attn.q_proj": "self_attn.q_proj",
            "attn.k_proj": "self_attn.k_proj",
            "attn.v_proj": "self_attn.v_proj",
            "attn.o_proj": "self_attn.o_proj",
            "mlp.up_proj": "mlp.c_fc",
            "mlp.down_proj": "mlp.c_proj",
        },
        block_norms={
            "input_norm": "input_layernorm",
            "post_norm": "post_attention_layernorm",
        },
        top_tensors={
            "embed_tokens": "model.embed_tokens.weight",
            "final_norm.weight": "model.norm.weight",
            "final_norm.bias": "model.norm.bias",
        },
        lm_head="lm_head",
        quant_layers=[
            ["attn.k_proj", "attn.v_proj", "attn.q_proj"],
            ["attn.o_proj"],
            ["mlp.up_proj"],
            ["mlp.down_proj"],
        ],
    )
)


# ---------------------------------------------------------------------------
# Phi (parallel block sharing one norm, partial rotary, dense/fc names)
# ---------------------------------------------------------------------------


def _phi_arch(c: dict) -> ArchConfig:
    heads, kv, head_dim = _gqa_head_dim(c)
    return ArchConfig(
        model_type="phi",
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=kv,
        head_dim=head_dim,
        intermediate_size=c["intermediate_size"],
        max_position_embeddings=c.get("max_position_embeddings", 2048),
        norm_type="layernorm",
        norm_eps=c.get("layer_norm_eps", 1e-5),
        pos_embedding="rope",
        rope_theta=c.get("rope_theta", 10000.0),
        rotary_dim=int(head_dim * c.get("partial_rotary_factor", 0.5)),
        mlp_act="gelu_new",
        attn_qkv_bias=True,
        attn_out_bias=True,
        mlp_bias=True,
        parallel_block=True,
        tie_word_embeddings=c.get("tie_word_embeddings", False),
    )


register(
    FamilySpec(
        model_type="phi",
        arch_fn=_phi_arch,
        layers_prefix="model.layers",
        block_linears={
            "attn.q_proj": "self_attn.q_proj",
            "attn.k_proj": "self_attn.k_proj",
            "attn.v_proj": "self_attn.v_proj",
            "attn.o_proj": "self_attn.dense",
            "mlp.up_proj": "mlp.fc1",
            "mlp.down_proj": "mlp.fc2",
        },
        block_norms={"input_norm": "input_layernorm"},
        top_tensors={
            "embed_tokens": "model.embed_tokens.weight",
            "final_norm.weight": "model.final_layernorm.weight",
            "final_norm.bias": "model.final_layernorm.bias",
        },
        lm_head="lm_head",
        quant_layers=[
            ["attn.k_proj", "attn.v_proj", "attn.q_proj"],
            ["attn.o_proj"],
            ["mlp.up_proj"],
            ["mlp.down_proj"],
        ],
    )
)


# ---------------------------------------------------------------------------
# StableLM (llama topology with LayerNorm + partial rotary)
# ---------------------------------------------------------------------------


def _stablelm_arch(c: dict) -> ArchConfig:
    heads, kv, head_dim = _gqa_head_dim(c)
    return ArchConfig(
        model_type="stablelm",
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=kv,
        head_dim=head_dim,
        intermediate_size=c["intermediate_size"],
        max_position_embeddings=c.get("max_position_embeddings", 4096),
        norm_type="layernorm",
        norm_eps=c.get("layer_norm_eps", 1e-5),
        pos_embedding="rope",
        rope_theta=c.get("rope_theta", 10000.0),
        rotary_dim=int(head_dim * c.get("partial_rotary_factor", 0.25)),
        mlp_act="silu_glu",
        attn_qkv_bias=c.get("use_qkv_bias", False),
        tie_word_embeddings=c.get("tie_word_embeddings", False),
    )


register(
    FamilySpec(
        model_type="stablelm",
        arch_fn=_stablelm_arch,
        layers_prefix="model.layers",
        block_linears=_LLAMA_BLOCK_LINEARS,
        block_norms=_LLAMA_BLOCK_NORMS,
        top_tensors={
            "embed_tokens": "model.embed_tokens.weight",
            "final_norm.weight": "model.norm.weight",
            "final_norm.bias": "model.norm.bias",
        },
        lm_head="lm_head",
        quant_layers=_LLAMA_QUANT,
    )
)
# reference name for the same family (stablelm_epoch remote code)
register(
    FamilySpec(
        model_type="stablelm_epoch",
        arch_fn=_stablelm_arch,
        layers_prefix="model.layers",
        block_linears=_LLAMA_BLOCK_LINEARS,
        block_norms=_LLAMA_BLOCK_NORMS,
        top_tensors={
            "embed_tokens": "model.embed_tokens.weight",
            "final_norm.weight": "model.norm.weight",
            "final_norm.bias": "model.norm.bias",
        },
        lm_head="lm_head",
        quant_layers=_LLAMA_QUANT,
    )
)


# ---------------------------------------------------------------------------
# CodeGen (GPT-J-like with mp_num-interleaved fused QKV)
# ---------------------------------------------------------------------------


def _codegen_arch(c: dict) -> ArchConfig:
    heads = c["n_head"]
    return ArchConfig(
        model_type="codegen",
        vocab_size=c["vocab_size"],
        hidden_size=c["n_embd"],
        num_layers=c["n_layer"],
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=c["n_embd"] // heads,
        intermediate_size=c.get("n_inner") or 4 * c["n_embd"],
        max_position_embeddings=c.get("n_positions", 2048),
        norm_type="layernorm",
        norm_eps=c.get("layer_norm_epsilon", 1e-5),
        pos_embedding="rope_gptj",
        rotary_dim=c.get("rotary_dim") or c["n_embd"] // heads,
        mlp_act="gelu_new",
        mlp_bias=True,
        parallel_block=True,
        tie_word_embeddings=False,
    )


register(
    FamilySpec(
        model_type="codegen",
        arch_fn=_codegen_arch,
        layers_prefix="transformer.h",
        block_linears={
            "attn.o_proj": "attn.out_proj",
            "mlp.up_proj": "mlp.fc_in",
            "mlp.down_proj": "mlp.fc_out",
        },
        block_norms={"input_norm": "ln_1"},
        top_tensors={
            "embed_tokens": "transformer.wte.weight",
            "final_norm.weight": "transformer.ln_f.weight",
            "final_norm.bias": "transformer.ln_f.bias",
        },
        lm_head="lm_head",
        quant_layers=[
            ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
            ["attn.o_proj"],
            ["mlp.up_proj"],
            ["mlp.down_proj"],
        ],
        fused_qkv=FusedQKV("attn.qkv_proj", "codegen_qvk"),
    )
)


# ---------------------------------------------------------------------------
# MPT (alibi, fused concat Wqkv, bias-free)
# ---------------------------------------------------------------------------


def _mpt_arch(c: dict) -> ArchConfig:
    heads = c["n_heads"]
    return ArchConfig(
        model_type="mpt",
        vocab_size=c["vocab_size"],
        hidden_size=c["d_model"],
        num_layers=c["n_layers"],
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=c["d_model"] // heads,
        intermediate_size=c.get("expansion_ratio", 4) * c["d_model"],
        max_position_embeddings=c.get("max_seq_len", 2048),
        norm_type="layernorm",
        norm_eps=1e-5,
        pos_embedding="alibi",
        mlp_act="gelu_new",
        tie_word_embeddings=True,
    )


register(
    FamilySpec(
        model_type="mpt",
        arch_fn=_mpt_arch,
        layers_prefix="transformer.blocks",
        block_linears={
            "attn.o_proj": "attn.out_proj",
            "mlp.up_proj": "ffn.up_proj",
            "mlp.down_proj": "ffn.down_proj",
        },
        block_norms={"input_norm": "norm_1", "post_norm": "norm_2"},
        top_tensors={
            "embed_tokens": "transformer.wte.weight",
            "final_norm.weight": "transformer.norm_f.weight",
        },
        lm_head=None,
        quant_layers=[
            ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
            ["attn.o_proj"],
            ["mlp.up_proj"],
            ["mlp.down_proj"],
        ],
        fused_qkv=FusedQKV("attn.Wqkv", "concat"),
    )
)


# ---------------------------------------------------------------------------
# Falcon (refinedweb "rw" in the reference): MQA fused, parallel single norm
# ---------------------------------------------------------------------------


def _falcon_arch(c: dict) -> ArchConfig:
    heads = c["num_attention_heads"]
    d = c["hidden_size"] // heads
    # HF FalconAttention: num_kv_heads only applies to the new decoder
    # architecture; otherwise multi_query wins (modeling_falcon semantics).
    if c.get("new_decoder_architecture"):
        kv = c.get("num_kv_heads") or heads
    else:
        kv = 1 if c.get("multi_query", True) else heads
    return ArchConfig(
        model_type="falcon",
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=kv,
        head_dim=d,
        intermediate_size=4 * c["hidden_size"],
        max_position_embeddings=2048,
        norm_type="layernorm",
        norm_eps=c.get("layer_norm_epsilon", 1e-5),
        pos_embedding="alibi" if c.get("alibi") else "rope",
        rope_theta=c.get("rope_theta", 10000.0),
        mlp_act="gelu",
        attn_qkv_bias=c.get("bias", False),
        attn_out_bias=c.get("bias", False),
        mlp_bias=c.get("bias", False),
        parallel_block=c.get("parallel_attn", True),
        tie_word_embeddings=True,
    )


def _falcon_spec(c: dict) -> FamilySpec:
    """Falcon's checkpoint layout depends on the config: the new decoder
    architecture (falcon-40b/180b) uses grouped-GQA fused QKV and TWO
    parallel norms (ln_attn / ln_mlp); the old one (falcon-7b / RefinedWeb)
    uses MQA-concat and a single input_layernorm."""
    new_arch = bool(c.get("new_decoder_architecture"))
    if new_arch:
        norms = {"input_norm": "ln_attn", "post_norm": "ln_mlp"}
        fused = FusedQKV("self_attention.query_key_value", "grouped")
        arch_fn = lambda cc: dataclasses.replace(_falcon_arch(cc), parallel_norms=True)
    else:
        norms = {"input_norm": "input_layernorm"}
        fused = FusedQKV("self_attention.query_key_value", "concat")
        arch_fn = _falcon_arch
    return FamilySpec(
        model_type=c.get("model_type", "falcon"),
        arch_fn=arch_fn,
        layers_prefix="transformer.h",
        block_linears={
            "attn.o_proj": "self_attention.dense",
            "mlp.up_proj": "mlp.dense_h_to_4h",
            "mlp.down_proj": "mlp.dense_4h_to_h",
        },
        block_norms=norms,
        top_tensors={
            "embed_tokens": "transformer.word_embeddings.weight",
            "final_norm.weight": "transformer.ln_f.weight",
            "final_norm.bias": "transformer.ln_f.bias",
        },
        lm_head=None,
        quant_layers=[
            ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
            ["attn.o_proj"],
            ["mlp.up_proj"],
            ["mlp.down_proj"],
        ],
        fused_qkv=fused,
    )


for _ft in ("falcon", "RefinedWeb", "RefinedWebModel"):
    REGISTRY[_ft] = _falcon_spec


# ---------------------------------------------------------------------------
# Gemma2 (sandwich norms, softcaps, alternating sliding window)
# ---------------------------------------------------------------------------


def _gemma2_arch(c: dict) -> ArchConfig:
    return _llama_arch(
        c,
        mlp_act="gelu_glu",
        scale_embedding=True,
        tie_word_embeddings=True,
        norm_eps=c.get("rms_norm_eps", 1e-6),
        norm_plus_one=True,
        post_sublayer_norms=True,
        attn_scale=c.get("query_pre_attn_scalar", 256) ** -0.5,
        attn_softcap=c.get("attn_logit_softcapping"),
        final_softcap=c.get("final_logit_softcapping"),
        sliding_window=c.get("sliding_window"),
        sliding_window_every_other=True,
    )


register(
    FamilySpec(
        model_type="gemma2",
        arch_fn=_gemma2_arch,
        layers_prefix="model.layers",
        block_linears=_LLAMA_BLOCK_LINEARS,
        block_norms={
            "input_norm": "input_layernorm",
            "post_attn_norm": "post_attention_layernorm",
            "post_norm": "pre_feedforward_layernorm",
            "post_ffn_norm": "post_feedforward_layernorm",
        },
        top_tensors=_LLAMA_TOP,
        lm_head=None,
        quant_layers=_LLAMA_QUANT,
    )
)


# ---------------------------------------------------------------------------
# Cohere / Command-R (parallel block, scaled tied logits)
# ---------------------------------------------------------------------------


def _cohere_arch(c: dict) -> ArchConfig:
    return _llama_arch(
        c,
        norm_type="layernorm",
        norm_eps=c.get("layer_norm_eps", 1e-5),
        parallel_block=True,
        tie_word_embeddings=True,
        logit_scale=c.get("logit_scale", 0.0625),
        pos_embedding="rope_gptj",  # cohere rotates even/odd pairs
    )


register(
    FamilySpec(
        model_type="cohere",
        arch_fn=_cohere_arch,
        layers_prefix="model.layers",
        block_linears=_LLAMA_BLOCK_LINEARS,
        block_norms={"input_norm": "input_layernorm"},
        top_tensors=_LLAMA_TOP,
        lm_head=None,
        quant_layers=_LLAMA_QUANT,
    )
)


# ---------------------------------------------------------------------------
# Qwen v1 (fused c_attn with bias, RMSNorm, gated w1/w2 MLP; remote-code HF)
# ---------------------------------------------------------------------------


def _qwen_arch(c: dict) -> ArchConfig:
    heads = c["num_attention_heads"]
    return ArchConfig(
        model_type="qwen",
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=c["hidden_size"] // heads,
        # qwen's ffn_hidden is stored doubled (intermediate covers w1+w2)
        intermediate_size=c["intermediate_size"] // 2,
        max_position_embeddings=c.get("max_position_embeddings", 2048),
        norm_type="rmsnorm",
        norm_eps=c.get("layer_norm_epsilon", 1e-6),
        pos_embedding="rope",
        rope_theta=c.get("rotary_emb_base", 10000.0),
        mlp_act="silu_glu",
        attn_qkv_bias=True,
        tie_word_embeddings=False,
        # long-context extensions (official modeling_qwen.py): both are
        # keyed on the training seq_length and inert below it
        logn_attn_seq_len=(c.get("seq_length") if c.get("use_logn_attn") else None),
        rope_ntk_seq_len=(c.get("seq_length") if c.get("use_dynamic_ntk") else None),
    )


register(
    FamilySpec(
        model_type="qwen",
        arch_fn=_qwen_arch,
        layers_prefix="transformer.h",
        block_linears={
            "attn.o_proj": "attn.c_proj",
            # qwen mlp: out = c_proj(silu(w2(x)) * w1(x)) -> w2 is the gate
            "mlp.gate_proj": "mlp.w2",
            "mlp.up_proj": "mlp.w1",
            "mlp.down_proj": "mlp.c_proj",
        },
        block_norms={"input_norm": "ln_1", "post_norm": "ln_2"},
        top_tensors={
            "embed_tokens": "transformer.wte.weight",
            "final_norm.weight": "transformer.ln_f.weight",
        },
        lm_head="lm_head",
        quant_layers=[
            ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
            ["attn.o_proj"],
            ["mlp.up_proj", "mlp.gate_proj"],
            ["mlp.down_proj"],
        ],
        fused_qkv=FusedQKV("attn.c_attn", "concat"),
    )
)


# ---------------------------------------------------------------------------
# MOSS (codegen architecture, remote-code HF)
# ---------------------------------------------------------------------------

register(
    FamilySpec(
        model_type="moss",
        arch_fn=_codegen_arch,
        layers_prefix="transformer.h",
        block_linears={
            "attn.o_proj": "attn.out_proj",
            "mlp.up_proj": "mlp.fc_in",
            "mlp.down_proj": "mlp.fc_out",
        },
        block_norms={"input_norm": "ln_1"},
        top_tensors={
            "embed_tokens": "transformer.wte.weight",
            "final_norm.weight": "transformer.ln_f.weight",
            "final_norm.bias": "transformer.ln_f.bias",
        },
        lm_head="lm_head",
        quant_layers=[
            ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
            ["attn.o_proj"],
            ["mlp.up_proj"],
            ["mlp.down_proj"],
        ],
        fused_qkv=FusedQKV("attn.qkv_proj", "codegen_qvk"),
    )
)

# longllama checkpoints are llama-compatible for the decoder stack
register(
    FamilySpec(
        model_type="longllama",
        arch_fn=lambda c: _llama_arch(c),
        layers_prefix="model.layers",
        block_linears=_LLAMA_BLOCK_LINEARS,
        block_norms=_LLAMA_BLOCK_NORMS,
        top_tensors=_LLAMA_TOP,
        lm_head="lm_head",
        quant_layers=_LLAMA_QUANT,
    )
)


# ---------------------------------------------------------------------------
# MiniCPM3 (reference modeling/minicpm3.py): MLA attention (low-rank q and
# kv with a shared rope tail), minicpm residual/embedding/logit scalings,
# longrope factors. Five quantization sublists mirror minicpm3.py:8-15.
# ---------------------------------------------------------------------------


def _minicpm3_arch(c: dict) -> ArchConfig:
    import math

    heads = c["num_attention_heads"]
    dn, dr = c["qk_nope_head_dim"], c["qk_rope_head_dim"]
    rope_factors = None
    attn_factor = None
    rs = c.get("rope_scaling") or {}
    if rs.get("type") == "longrope" or "long_factor" in rs:
        # Static factor choice (per full forward, as jit requires): when the
        # config extends contexts past the original pretraining length
        # (max_position_embeddings > original), use long_factor — matching
        # the reference model's dynamic switch for the extended regime;
        # otherwise short_factor. The reference switches per-sequence-length
        # at runtime; a static choice per config is the jit-compatible
        # equivalent (long contexts are exactly why longrope configs exist).
        orig = rs.get("original_max_position_embeddings", c.get("max_position_embeddings", 2048))
        scale = c.get("max_position_embeddings", orig) / orig
        if scale > 1 and rs.get("long_factor") is not None:
            rope_factors = tuple(rs["long_factor"])
        else:
            rope_factors = tuple(rs.get("short_factor") or rs.get("long_factor"))
        if scale > 1:
            attn_factor = math.sqrt(1 + math.log(scale) / math.log(orig))
    return ArchConfig(
        model_type="minicpm3",
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=dn + dr,
        intermediate_size=c["intermediate_size"],
        max_position_embeddings=c.get("max_position_embeddings", 2048),
        norm_type="rmsnorm",
        norm_eps=c.get("rms_norm_eps", 1e-6),
        pos_embedding="rope",
        rope_theta=c.get("rope_theta", 10000.0),
        mlp_act="silu_glu",
        tie_word_embeddings=c.get("tie_word_embeddings", False),
        attn_variant="mla",
        q_lora_rank=c["q_lora_rank"],
        kv_lora_rank=c["kv_lora_rank"],
        qk_nope_head_dim=dn,
        qk_rope_head_dim=dr,
        v_head_dim=c.get("v_head_dim", dn),
        embed_scale=c.get("scale_emb"),
        residual_scale=(
            c["scale_depth"] / math.sqrt(c["num_hidden_layers"])
            if c.get("scale_depth") is not None else None
        ),
        logit_scale=(
            c["dim_model_base"] / c["hidden_size"]
            if c.get("dim_model_base") else None
        ),
        rope_factors=rope_factors,
        rope_attn_factor=attn_factor,
    )


register(
    FamilySpec(
        model_type="minicpm3",
        arch_fn=_minicpm3_arch,
        layers_prefix="model.layers",
        block_linears={
            "attn.q_a_proj": "self_attn.q_a_proj",
            "attn.q_b_proj": "self_attn.q_b_proj",
            "attn.kv_a_proj": "self_attn.kv_a_proj_with_mqa",
            "attn.kv_b_proj": "self_attn.kv_b_proj",
            "attn.o_proj": "self_attn.o_proj",
            "mlp.gate_proj": "mlp.gate_proj",
            "mlp.up_proj": "mlp.up_proj",
            "mlp.down_proj": "mlp.down_proj",
        },
        block_norms={
            "input_norm": "input_layernorm",
            "post_norm": "post_attention_layernorm",
            "attn.q_a_norm": "self_attn.q_a_layernorm",
            "attn.kv_a_norm": "self_attn.kv_a_layernorm",
        },
        top_tensors=_LLAMA_TOP,
        lm_head="lm_head",
        quant_layers=[
            ["attn.q_a_proj", "attn.kv_a_proj"],
            ["attn.q_b_proj", "attn.kv_b_proj"],
            ["attn.o_proj"],
            ["mlp.gate_proj", "mlp.up_proj"],
            ["mlp.down_proj"],
        ],
    )
)


__all__ = ["FamilySpec", "FusedQKV", "REGISTRY", "register", "get_family"]
