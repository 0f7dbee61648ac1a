"""Build/flatten model parameter pytrees from/to HF tensor dicts.

Covers three checkpoint flavours:
  * fp (bf16/fp16/fp32) HF checkpoints -> dense params tree (from_pretrained)
  * GPTQ checkpoints (qweight/qzeros/scales/g_idx under HF module names,
    reference layout) -> quantized params tree (from_quantized)
  * quantized params tree -> GPTQ tensor dict (save_quantized), readable by
    the reference implementation.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..ops import quantlinear as qlin
from .arch import ArchConfig, DenseLinear
from .registry import FamilySpec


def _set_in(tree: dict, path: str, value: Any) -> None:
    keys = path.split(".")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def get_in(tree: dict, path: str) -> Any:
    node = tree
    for k in path.split("."):
        node = node[k] if isinstance(node, dict) else node[int(k)]
    return node


def set_in_block(block: dict, path: str, value: Any) -> None:
    """Set a dotted path inside a block dict, creating intermediate dicts;
    numeric components index lists (MoE experts)."""
    keys = path.split(".")
    node = block
    for i, k in enumerate(keys[:-1]):
        nxt = keys[i + 1]
        if k.isdigit():
            k = int(k)
        if isinstance(node, list):
            while len(node) <= k:
                node.append({})
            if nxt.isdigit() and not isinstance(node[k], list):
                node[k] = node[k] or []
            node = node[k]
        else:
            if k not in node:
                node[k] = [] if nxt.isdigit() else {}
            node = node[k]
    last = keys[-1]
    if isinstance(node, list):
        while len(node) <= int(last):
            node.append(None)
        node[int(last)] = value
    else:
        node[last] = value


def _to_jnp(x: np.ndarray, dtype) -> jnp.ndarray:
    return jnp.asarray(x, dtype=dtype)


def _fused_cols(spec: FamilySpec, cfg: ArchConfig):
    q, k, v = spec.fused_qkv.column_split(cfg.num_heads, cfg.num_kv_heads, cfg.head_dim)
    return {"attn.q_proj": q, "attn.k_proj": k, "attn.v_proj": v}


def build_fp_params(
    tensors: dict[str, np.ndarray],
    spec: FamilySpec,
    cfg: ArchConfig,
    dtype=jnp.bfloat16,
) -> dict:
    """Dense (unquantized) params tree from an HF checkpoint tensor dict."""
    params: dict = {"layers": []}

    for our, hf in spec.top_tensors.items():
        if hf in tensors:
            _set_in(params, our, _to_jnp(tensors[hf], dtype))
    for our, hf in spec.top_linears.items():
        if f"{hf}.weight" in tensors:
            w = tensors[f"{hf}.weight"]
            b = tensors.get(f"{hf}.bias")
            params[our] = DenseLinear(
                kernel=_to_jnp(np.ascontiguousarray(w.T), dtype),
                bias=None if b is None else _to_jnp(b, dtype),
            )

    if spec.lm_head is not None and f"{spec.lm_head}.weight" in tensors:
        w = tensors[f"{spec.lm_head}.weight"]
        b = tensors.get(f"{spec.lm_head}.bias")
        params["lm_head"] = DenseLinear(
            kernel=_to_jnp(np.ascontiguousarray(w.T), dtype),
            bias=None if b is None else _to_jnp(b, dtype),
        )

    fused_cols = _fused_cols(spec, cfg) if spec.fused_qkv else None

    for i in range(cfg.num_layers):
        prefix = f"{spec.layers_prefix}.{i}"
        block: dict = {}
        if fused_cols is not None:
            wname = f"{prefix}.{spec.fused_qkv.hf_name}.weight"
            w = tensors[wname]
            if not spec.conv1d_linears:
                w = np.ascontiguousarray(w.T)          # -> [K, N_fused]
            b = tensors.get(f"{prefix}.{spec.fused_qkv.hf_name}.bias")
            for our, cols in fused_cols.items():
                set_in_block(
                    block,
                    our,
                    DenseLinear(
                        kernel=_to_jnp(np.ascontiguousarray(w[:, cols]), dtype),
                        bias=None if b is None else _to_jnp(b[cols], dtype),
                    ),
                )
        for our, hf in spec.block_linears.items():
            wname = f"{prefix}.{hf}.weight"
            if wname not in tensors:
                raise KeyError(f"missing tensor {wname}")
            w = tensors[wname]
            if not spec.conv1d_linears:
                w = np.ascontiguousarray(w.T)  # HF Linear stores [N, K]
            b = tensors.get(f"{prefix}.{hf}.bias")
            set_in_block(
                block,
                our,
                DenseLinear(
                    kernel=_to_jnp(w, dtype),
                    bias=None if b is None else _to_jnp(b, dtype),
                ),
            )
        for our, hf in spec.block_norms.items():
            nm = {"weight": _to_jnp(tensors[f"{prefix}.{hf}.weight"], dtype)}
            bname = f"{prefix}.{hf}.bias"
            if bname in tensors:
                nm["bias"] = _to_jnp(tensors[bname], dtype)
            set_in_block(block, our, nm)
        params["layers"].append(block)

    return params


def build_quantized_params(
    tensors: dict[str, np.ndarray],
    spec: FamilySpec,
    cfg: ArchConfig,
    bits: int,
    group_size: int,
    dtype=jnp.bfloat16,
) -> dict:
    """Params tree from a GPTQ checkpoint: quantized linears become runtime
    QuantLinear nodes; everything else dense."""
    quant_paths = {p for sub in spec.quant_layers for p in sub}
    params: dict = {"layers": []}

    for our, hf in spec.top_tensors.items():
        if hf in tensors:
            _set_in(params, our, _to_jnp(tensors[hf], dtype))
    for our, hf in spec.top_linears.items():
        if f"{hf}.weight" in tensors:
            w = tensors[f"{hf}.weight"]
            b = tensors.get(f"{hf}.bias")
            params[our] = DenseLinear(
                kernel=_to_jnp(np.ascontiguousarray(w.T), dtype),
                bias=None if b is None else _to_jnp(b, dtype),
            )
    if spec.lm_head is not None and f"{spec.lm_head}.qweight" in tensors:
        pass  # quantized lm_head: built below once make_ql is defined
    elif spec.lm_head is not None and f"{spec.lm_head}.weight" in tensors:
        w = tensors[f"{spec.lm_head}.weight"]
        b = tensors.get(f"{spec.lm_head}.bias")
        params["lm_head"] = DenseLinear(
            kernel=_to_jnp(np.ascontiguousarray(w.T), dtype),
            bias=None if b is None else _to_jnp(b, dtype),
        )

    fused_cols = _fused_cols(spec, cfg) if spec.fused_qkv else None

    def make_ql(t: dict, bias) -> qlin.QuantLinear:
        qweight = np.asarray(t["qweight"])
        k = qweight.shape[0] * 32 // bits
        packed = qlin.PackedQuantLinear(
            qweight=qweight,
            qzeros=np.asarray(t["qzeros"]),
            scales=np.asarray(t["scales"]),
            g_idx=np.asarray(
                t.get(
                    "g_idx",
                    (np.arange(k) // (group_size if group_size != -1 else k)).astype(np.int32),
                )
            ),
            bias=bias,
            bits=bits,
            group_size=group_size,
            in_features=k,
            out_features=qweight.shape[1],
        )
        return qlin.from_packed(packed)

    if spec.lm_head is not None and f"{spec.lm_head}.qweight" in tensors:
        t = {
            key: tensors[f"{spec.lm_head}.{key}"]
            for key in ("qweight", "qzeros", "scales")
        }
        if f"{spec.lm_head}.g_idx" in tensors:
            t["g_idx"] = tensors[f"{spec.lm_head}.g_idx"]
        params["lm_head"] = make_ql(t, tensors.get(f"{spec.lm_head}.bias"))

    for i in range(cfg.num_layers):
        prefix = f"{spec.layers_prefix}.{i}"
        block: dict = {}
        if fused_cols is not None:
            base = f"{prefix}.{spec.fused_qkv.hf_name}"
            if f"{base}.qweight" in tensors:
                from ..ops import packing

                fused = {
                    key: tensors[f"{base}.{key}"]
                    for key in ("qweight", "qzeros", "scales")
                }
                if f"{base}.g_idx" in tensors:
                    fused["g_idx"] = tensors[f"{base}.g_idx"]
                if f"{base}.bias" in tensors:
                    fused["bias"] = tensors[f"{base}.bias"]
                for our, cols in fused_cols.items():
                    part = packing.select_packed_columns(fused, cols, bits)
                    set_in_block(
                        block, our,
                        make_ql(part, part.get("bias")),
                    )
            else:  # fused fp tensor inside an otherwise-quantized checkpoint
                w = tensors[f"{base}.weight"]
                if not spec.conv1d_linears:
                    w = np.ascontiguousarray(w.T)
                b = tensors.get(f"{base}.bias")
                for our, cols in fused_cols.items():
                    set_in_block(
                        block, our,
                        DenseLinear(
                            kernel=_to_jnp(np.ascontiguousarray(w[:, cols]), dtype),
                            bias=None if b is None else _to_jnp(b[cols], dtype),
                        ),
                    )
        for our, hf in spec.block_linears.items():
            base = f"{prefix}.{hf}"
            if our in quant_paths and f"{base}.qweight" in tensors:
                qweight = tensors[f"{base}.qweight"]
                k = qweight.shape[0] * 32 // bits
                n = qweight.shape[1]
                packed = qlin.PackedQuantLinear(
                    qweight=qweight,
                    qzeros=tensors[f"{base}.qzeros"],
                    scales=tensors[f"{base}.scales"],
                    g_idx=tensors.get(
                        f"{base}.g_idx",
                        (np.arange(k) // (group_size if group_size != -1 else k)).astype(np.int32),
                    ),
                    bias=tensors.get(f"{base}.bias"),
                    bits=bits,
                    group_size=group_size,
                    in_features=k,
                    out_features=n,
                )
                set_in_block(block, our, qlin.from_packed(packed))
            else:
                w = tensors[f"{base}.weight"]
                if not spec.conv1d_linears:
                    w = np.ascontiguousarray(w.T)
                b = tensors.get(f"{base}.bias")
                set_in_block(
                    block,
                    our,
                    DenseLinear(
                        kernel=_to_jnp(w, dtype),
                        bias=None if b is None else _to_jnp(b, dtype),
                    ),
                )
        for our, hf in spec.block_norms.items():
            nm = {"weight": _to_jnp(tensors[f"{prefix}.{hf}.weight"], dtype)}
            bname = f"{prefix}.{hf}.bias"
            if bname in tensors:
                nm["bias"] = _to_jnp(tensors[bname], dtype)
            set_in_block(block, our, nm)
        params["layers"].append(block)

    return params


def flatten_quantized_params(
    params: dict,
    packed_layers: dict[str, qlin.PackedQuantLinear],
    spec: FamilySpec,
    cfg: ArchConfig,
    save_dtype=np.float16,
) -> dict[str, np.ndarray]:
    """Tensor dict for save_quantized. ``packed_layers`` maps
    ``"{layer_idx}.{our_path}"`` -> PackedQuantLinear (disk layout)."""
    out: dict[str, np.ndarray] = {}

    def as_np(x, dt=save_dtype):
        return np.asarray(x).astype(dt)

    for our, hf in spec.top_tensors.items():
        try:
            val = get_in(params, our)
        except (KeyError, TypeError):
            continue
        out[hf] = as_np(val)
    for our, hf in spec.top_linears.items():
        if our in params:
            node = params[our]
            out[f"{hf}.weight"] = as_np(np.asarray(node.kernel).T)
            if node.bias is not None:
                out[f"{hf}.bias"] = as_np(node.bias)
    if "lm_head" in packed_layers and spec.lm_head is not None:
        pk = packed_layers["lm_head"]
        out[f"{spec.lm_head}.qweight"] = np.asarray(pk.qweight).astype(np.int32)
        out[f"{spec.lm_head}.qzeros"] = np.asarray(pk.qzeros).astype(np.int32)
        out[f"{spec.lm_head}.scales"] = np.asarray(pk.scales).astype(np.float16)
        out[f"{spec.lm_head}.g_idx"] = np.asarray(pk.g_idx).astype(np.int32)
        if pk.bias is not None:
            out[f"{spec.lm_head}.bias"] = as_np(pk.bias)
    elif "lm_head" in params and spec.lm_head is not None:
        lm = params["lm_head"]
        out[f"{spec.lm_head}.weight"] = np.ascontiguousarray(as_np(lm.kernel).T)
        if lm.bias is not None:
            out[f"{spec.lm_head}.bias"] = as_np(lm.bias)

    fused_cols = _fused_cols(spec, cfg) if spec.fused_qkv else None

    for i, block in enumerate(params["layers"]):
        prefix = f"{spec.layers_prefix}.{i}"
        if fused_cols is not None:
            from ..ops import packing

            base = f"{prefix}.{spec.fused_qkv.hf_name}"
            order = ("attn.q_proj", "attn.k_proj", "attn.v_proj")
            col_dest = np.concatenate([fused_cols[p] for p in order])
            if all(f"{i}.{p}" in packed_layers for p in order):
                parts = []
                bits = None
                for p in order:
                    pk = packed_layers[f"{i}.{p}"]
                    bits = pk.bits
                    d = {
                        "qweight": pk.qweight, "qzeros": pk.qzeros,
                        "scales": pk.scales, "g_idx": pk.g_idx,
                    }
                    if pk.bias is not None:
                        d["bias"] = pk.bias
                    parts.append(d)
                merged = packing.merge_packed_columns(parts, col_dest, bits)
                out[f"{base}.qweight"] = merged["qweight"].astype(np.int32)
                out[f"{base}.qzeros"] = merged["qzeros"].astype(np.int32)
                out[f"{base}.scales"] = merged["scales"].astype(np.float16)
                out[f"{base}.g_idx"] = merged["g_idx"].astype(np.int32)
                if "bias" in merged:
                    out[f"{base}.bias"] = as_np(merged["bias"])
            else:  # dense fused re-merge
                inv = np.argsort(col_dest)
                kernels = np.concatenate(
                    [as_np(get_in(block, p).kernel) for p in order], axis=1
                )[:, inv]
                if not spec.conv1d_linears:
                    kernels = np.ascontiguousarray(kernels.T)
                out[f"{base}.weight"] = kernels
                biases = [get_in(block, p).bias for p in order]
                if all(b is not None for b in biases):
                    out[f"{base}.bias"] = np.concatenate([as_np(b) for b in biases])[inv]
        for our, hf in spec.block_linears.items():
            base = f"{prefix}.{hf}"
            key = f"{i}.{our}"
            if key in packed_layers:
                p = packed_layers[key]
                out[f"{base}.qweight"] = np.asarray(p.qweight).astype(np.int32)
                out[f"{base}.qzeros"] = np.asarray(p.qzeros).astype(np.int32)
                out[f"{base}.scales"] = np.asarray(p.scales).astype(np.float16)
                out[f"{base}.g_idx"] = np.asarray(p.g_idx).astype(np.int32)
                if p.bias is not None:
                    out[f"{base}.bias"] = as_np(p.bias)
            else:
                node = get_in(block, our)
                out[f"{base}.weight"] = np.ascontiguousarray(as_np(node.kernel).T)
                if node.bias is not None:
                    out[f"{base}.bias"] = as_np(node.bias)
        for our, hf in spec.block_norms.items():
            node = get_in(block, our)
            out[f"{prefix}.{hf}.weight"] = as_np(node["weight"])
            if "bias" in node:
                out[f"{prefix}.{hf}.bias"] = as_np(node["bias"])

    return out


def stack_moe_experts(params: dict) -> dict:
    """Convert per-block MoE expert lists into stacked tensors for
    expert-parallel execution (arch.moe_mlp's "experts_stacked" path).
    Requires all experts quantized with trivial g_idx."""
    from ..ops.quantlinear import QuantLinear, stack_experts

    out = dict(params)
    new_layers = []
    for block in params["layers"]:
        if "mlp" in block and "experts" in block.get("mlp", {}):
            experts = block["mlp"]["experts"]
            if all(
                isinstance(e.get(k), QuantLinear)
                for e in experts
                for k in ("gate_proj", "up_proj", "down_proj")
            ):
                block = dict(block)
                mlp = dict(block["mlp"])
                mlp["experts_stacked"] = {
                    k: stack_experts([e[k] for e in experts])
                    for k in ("gate_proj", "up_proj", "down_proj")
                }
                del mlp["experts"]
                block["mlp"] = mlp
        new_layers.append(block)
    out["layers"] = new_layers
    return out


__all__ = [
    "build_fp_params",
    "build_quantized_params",
    "flatten_quantized_params",
    "stack_moe_experts",
    "get_in",
    "set_in_block",
]

def fuse_qkv_gateup(params: dict, attention: bool = True, mlp: bool = True) -> dict:
    """Load-time static fusion: q/k/v -> one "qkv_proj" and gate/up -> one
    "gateup_proj" per block (the reference injects fused modules dynamically,
    fused_llama_attn.py:163-207 / fused_llama_mlp.py; here it is a pure
    params transform). Skips blocks where fusion preconditions fail
    (desc_act kperm, mismatched shapes, dense nodes). Inference-only:
    save_quantized() expects the unfused tree."""
    from ..ops.quantlinear import QuantLinear, concat_qls

    def try_fuse(sec: dict, names: tuple, fused_name: str):
        nodes = [sec.get(n) for n in names]
        if not all(isinstance(n, QuantLinear) for n in nodes):
            return sec
        try:
            fused = concat_qls(nodes)
        except ValueError:
            return sec
        out = {k: v for k, v in sec.items() if k not in names}
        out[fused_name] = fused
        return out

    new_layers = []
    for block in params["layers"]:
        block = dict(block)
        if attention and "attn" in block and all(k in block["attn"] for k in ("q_proj", "k_proj", "v_proj")):
            block["attn"] = try_fuse(dict(block["attn"]), ("q_proj", "k_proj", "v_proj"), "qkv_proj")
        if mlp and "mlp" in block and all(k in block["mlp"] for k in ("gate_proj", "up_proj")):
            block["mlp"] = try_fuse(dict(block["mlp"]), ("gate_proj", "up_proj"), "gateup_proj")
        new_layers.append(block)
    out = dict(params)
    out["layers"] = new_layers
    return out
