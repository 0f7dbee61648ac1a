"""LoRA / AdaLoRA-style adapters on quantized models, TPU-native.

Reference counterpart: utils/peft_utils.py (GPTQLoraLinear wraps QuantLinear,
forward adds B(A(dropout(x)))*scale, backward only through the adapter;
get_gptq_peft_model entry, find_all_linear_names). Here adapters are pytree
nodes, training is plain jax.grad over the adapter leaves (the quantized
base weights are integer buffers that JAX never differentiates), and any
optax optimizer drives the update. No module hijacking needed.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models import params as params_lib
from ..models.arch import DenseLinear
from ..ops.quantlinear import QuantLinear


@struct.dataclass
class LoraLinear:
    """A (frozen) base linear plus a trainable low-rank adapter."""

    base: Any                                # QuantLinear or DenseLinear
    lora_a: jnp.ndarray                      # [K, r]
    lora_b: jnp.ndarray                      # [r, N]
    scaling: float = struct.field(pytree_node=False, default=1.0)


@dataclasses.dataclass
class GPTQLoraConfig:
    r: int = 8
    lora_alpha: int = 16
    lora_dropout: float = 0.0
    target_modules: Sequence[str] = ("attn.q_proj", "attn.v_proj")
    # AdaLoRA-style: start at init_r and allow rank masking (mask is a
    # trainable gate on the r dimension; pruning = zeroing entries)
    adalora: bool = False
    init_r: Optional[int] = None

    @property
    def scaling(self) -> float:
        return self.lora_alpha / self.r


@struct.dataclass
class AdaptionPrompt:
    """LLaMA-Adapter-style adaption prompt for one attention block
    (reference third PEFT mode: peft.AdaptionPromptConfig routed through
    get_gptq_peft_model, peft_utils.py:354-422). ``prompt`` rows are fed
    through the block's frozen k/v projections; the zero-initialized
    ``gate`` makes injection an exact identity at step 0."""

    prompt: jnp.ndarray   # [adapter_len, hidden]
    gate: jnp.ndarray     # scalar, init 0


@dataclasses.dataclass
class AdaptionPromptConfig:
    adapter_len: int = 10
    adapter_layers: int = 30   # top-N layers get prompts


def inject_adaption_prompt(params: dict, pcfg: AdaptionPromptConfig, seed: int = 0) -> dict:
    """Add AdaptionPrompt nodes to the TOP ``adapter_layers`` blocks."""
    key = jax.random.PRNGKey(seed)
    n_layers = len(params["layers"])
    first = max(0, n_layers - pcfg.adapter_layers)
    new_layers = []
    for i, block in enumerate(params["layers"]):
        block = dict(block)
        if i >= first and "attn" in block:
            key, sub = jax.random.split(key)
            # infer hidden width from the q_proj input side
            qp = block["attn"]["q_proj"]
            hidden = qp.in_features if hasattr(qp, "in_features") else qp.kernel.shape[0]
            attn = dict(block["attn"])
            attn["adaption"] = AdaptionPrompt(
                prompt=jax.random.normal(sub, (pcfg.adapter_len, hidden), jnp.float32) * 0.02,
                gate=jnp.zeros((), jnp.float32),
            )
            block["attn"] = attn
        new_layers.append(block)
    out = dict(params)
    out["layers"] = new_layers
    return out


def apply_lora(p: LoraLinear, x: jnp.ndarray, backend: str = "auto",
               dropout_rng=None, dropout_rate: float = 0.0) -> jnp.ndarray:
    from ..models.arch import apply_linear

    y = apply_linear(p.base, x, backend)
    xa = x
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, x.shape)
        xa = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)
    delta = (xa.astype(jnp.float32) @ p.lora_a.astype(jnp.float32)) @ p.lora_b.astype(jnp.float32)
    return y + (delta * p.scaling).astype(y.dtype)


def find_all_linear_names(params: dict, ignore_lm_head: bool = True) -> list[str]:
    """Block-relative paths of every linear (reference find_all_linear_names)."""
    names: set[str] = set()

    def walk(node, prefix):
        if isinstance(node, (QuantLinear, DenseLinear, LoraLinear)):
            names.add(prefix)
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{prefix}.{i}")

    for block in params["layers"][:1]:
        walk(block, "")
    return sorted(names)


def inject_lora(
    params: dict,
    peft_cfg: GPTQLoraConfig,
    seed: int = 0,
) -> dict:
    """Return params with LoraLinear nodes wrapping every target module.

    Init matches standard LoRA: A ~ kaiming-ish normal, B = 0 (adapter
    starts as identity)."""
    key = jax.random.PRNGKey(seed)
    new_layers = []
    for li, block in enumerate(params["layers"]):
        block = jax.tree_util.tree_map(
            lambda x: x, block,
            is_leaf=lambda n: isinstance(
                n, (QuantLinear, DenseLinear, LoraLinear, AdaLoraLinear)
            ),
        )  # structural copy
        for path in peft_cfg.target_modules:
            try:
                node = params_lib.get_in(block, path)
            except (KeyError, TypeError, IndexError):
                continue
            if isinstance(node, (LoraLinear, AdaLoraLinear)):
                continue
            k = node.in_features if isinstance(node, QuantLinear) else node.kernel.shape[0]
            n = node.out_features if isinstance(node, QuantLinear) else node.kernel.shape[1]
            key, sub = jax.random.split(key)
            r = peft_cfg.init_r or peft_cfg.r
            lora = LoraLinear(
                base=node,
                lora_a=(jax.random.normal(sub, (k, r), jnp.float32) * (1.0 / np.sqrt(k))),
                lora_b=jnp.zeros((r, n), jnp.float32),
                scaling=peft_cfg.scaling,
            )
            params_lib.set_in_block(block, path, lora)
        new_layers.append(block)
    out = dict(params)
    out["layers"] = new_layers
    return out


def split_lora_params(params: dict) -> tuple[dict, dict]:
    """Split into (trainable adapter tree, frozen rest). The adapter tree has
    the same topology with only lora_a/lora_b leaves (others None)."""

    def extract(node):
        if isinstance(node, AdaLoraLinear):
            return {"lora_a": node.lora_a, "lora_e": node.lora_e, "lora_b": node.lora_b}
        if isinstance(node, LoraLinear):
            return {"lora_a": node.lora_a, "lora_b": node.lora_b}
        if isinstance(node, AdaptionPrompt):
            return {"prompt": node.prompt, "gate": node.gate}
        if isinstance(node, dict):
            sub = {k: extract(v) for k, v in node.items()}
            return {k: v for k, v in sub.items() if v} or None
        if isinstance(node, list):
            return [extract(v) for v in node]
        return None

    trainable = {"layers": [extract(b) for b in params["layers"]]}
    return trainable, params


def merge_lora_params(params: dict, trainable: dict) -> dict:
    """Write adapter leaves back into the full tree."""

    def merge(node, tnode):
        if isinstance(node, AdaLoraLinear):
            return AdaLoraLinear(
                base=node.base,
                lora_a=tnode["lora_a"],
                lora_e=tnode["lora_e"],
                lora_b=tnode["lora_b"],
                rank_mask=node.rank_mask,
                scaling=node.scaling,
            )
        if isinstance(node, LoraLinear):
            return LoraLinear(
                base=node.base,
                lora_a=tnode["lora_a"],
                lora_b=tnode["lora_b"],
                scaling=node.scaling,
            )
        if isinstance(node, AdaptionPrompt):
            return AdaptionPrompt(prompt=tnode["prompt"], gate=tnode["gate"])
        if isinstance(node, dict):
            return {
                k: merge(v, tnode.get(k)) if isinstance(tnode, dict) and tnode.get(k) is not None else v
                for k, v in node.items()
            }
        if isinstance(node, list):
            return [
                merge(v, tnode[i]) if tnode and tnode[i] is not None else v
                for i, v in enumerate(node)
            ]
        return node

    out = dict(params)
    out["layers"] = [
        merge(b, t) for b, t in zip(params["layers"], trainable["layers"])
    ]
    return out


@struct.dataclass
class AdaLoraLinear:
    """SVD-parameterized adapter (AdaLoRA): delta = B diag(E) A, with a
    non-trainable rank mask for importance-based rank pruning (the reference
    wraps peft's GPTQSVDLinear + RankAllocator; here pruning is explicit via
    :func:`adalora_prune`)."""

    base: Any
    lora_a: jnp.ndarray                      # [K, r]
    lora_e: jnp.ndarray                      # [r]   singular values
    lora_b: jnp.ndarray                      # [r, N]
    rank_mask: jnp.ndarray                   # [r]   0/1 gate
    scaling: float = struct.field(pytree_node=False, default=1.0)


def apply_adalora(p: AdaLoraLinear, x: jnp.ndarray, backend: str = "auto") -> jnp.ndarray:
    from ..models.arch import apply_linear

    y = apply_linear(p.base, x, backend)
    e = (p.lora_e * p.rank_mask).astype(jnp.float32)
    delta = ((x.astype(jnp.float32) @ p.lora_a.astype(jnp.float32)) * e) @ p.lora_b.astype(jnp.float32)
    return y + (delta * p.scaling).astype(y.dtype)


def adalora_importance(p: AdaLoraLinear) -> jnp.ndarray:
    """Per-rank importance |E| * ||A_col|| * ||B_row|| (magnitude proxy)."""
    a_n = jnp.linalg.norm(p.lora_a, axis=0)
    b_n = jnp.linalg.norm(p.lora_b, axis=1)
    return jnp.abs(p.lora_e) * a_n * b_n


def adalora_prune(p: AdaLoraLinear, target_rank: int) -> AdaLoraLinear:
    """Keep the target_rank most important ranks (mask the rest)."""
    imp = adalora_importance(p)
    thresh = jnp.sort(imp)[-target_rank] if target_rank > 0 else jnp.inf
    mask = (imp >= thresh).astype(p.rank_mask.dtype)
    return AdaLoraLinear(
        base=p.base, lora_a=p.lora_a, lora_e=p.lora_e, lora_b=p.lora_b,
        rank_mask=mask, scaling=p.scaling,
    )


def inject_adalora(params: dict, peft_cfg: GPTQLoraConfig, seed: int = 0) -> dict:
    """Wrap target modules with AdaLoRA adapters (E init 0 -> identity)."""
    key = jax.random.PRNGKey(seed)
    new_layers = []
    r = peft_cfg.init_r or peft_cfg.r
    for block in params["layers"]:
        # structural copy down to linear nodes: set_in_block must not write
        # through nested dicts shared with the caller's original tree
        block = jax.tree_util.tree_map(
            lambda x: x, block,
            is_leaf=lambda n: isinstance(
                n, (QuantLinear, DenseLinear, LoraLinear, AdaLoraLinear)
            ),
        )
        for path in peft_cfg.target_modules:
            try:
                node = params_lib.get_in(block, path)
            except (KeyError, TypeError, IndexError):
                continue
            if isinstance(node, (LoraLinear, AdaLoraLinear)):
                continue  # already wrapped — injection is idempotent
            k = node.in_features if isinstance(node, QuantLinear) else node.kernel.shape[0]
            n = node.out_features if isinstance(node, QuantLinear) else node.kernel.shape[1]
            key, s1, s2 = jax.random.split(key, 3)
            params_lib.set_in_block(
                block, path,
                AdaLoraLinear(
                    base=node,
                    lora_a=jax.random.normal(s1, (k, r), jnp.float32) * 0.02,
                    lora_e=jnp.zeros((r,), jnp.float32),
                    lora_b=jax.random.normal(s2, (r, n), jnp.float32) * 0.02,
                    rank_mask=jnp.ones((r,), jnp.float32),
                    scaling=peft_cfg.scaling,
                ),
            )
        new_layers.append(block)
    out = dict(params)
    out["layers"] = new_layers
    return out


def get_gptq_peft_model(model, peft_cfg: GPTQLoraConfig | None = None, seed: int = 0):
    """Public entry (reference: get_gptq_peft_model, peft_utils.py:354-422):
    wraps target modules of a (quantized) GPTQModel with LoRA (or AdaLoRA)
    adapters, in place. Returns the model."""
    peft_cfg = peft_cfg or GPTQLoraConfig()
    inject = inject_adalora if peft_cfg.adalora else inject_lora
    model.params = inject(model.params, peft_cfg, seed)
    model.peft_config = peft_cfg
    model._jit_cache.clear()
    return model


def save_adapter(model, save_dir: str, spec=None) -> None:
    """Save adapter weights in an HF-peft-compatible naming scheme."""
    from . import hf_io

    spec = spec or model.spec
    tensors: dict[str, np.ndarray] = {}
    for li, block in enumerate(model.params["layers"]):
        for path, hf in spec.block_linears.items():
            try:
                node = params_lib.get_in(block, path)
            except (KeyError, TypeError, IndexError):
                continue
            if isinstance(node, LoraLinear):
                base = f"base_model.model.{spec.layers_prefix}.{li}.{hf}"
                # peft stores lora_A as [r, K] and lora_B as [N, r]
                tensors[f"{base}.lora_A.weight"] = np.asarray(node.lora_a).T
                tensors[f"{base}.lora_B.weight"] = np.asarray(node.lora_b).T
            elif isinstance(node, AdaLoraLinear):
                base = f"base_model.model.{spec.layers_prefix}.{li}.{hf}"
                # HF peft AdaLoRA layout: lora_A [r, K], lora_B [N, r],
                # lora_E [r, 1]; the rank mask is folded into E so a plain
                # peft load reproduces the pruned adapter.
                tensors[f"{base}.lora_A.weight"] = np.asarray(node.lora_a).T
                tensors[f"{base}.lora_B.weight"] = np.asarray(node.lora_b).T
                e = np.asarray(node.lora_e) * np.asarray(node.rank_mask)
                tensors[f"{base}.lora_E.weight"] = e[:, None]
    if not tensors:
        raise ValueError(
            "no LoRA/AdaLoRA adapter weights found in the model — "
            "adaption-prompt adapters have no HF-peft file format and must "
            "be saved separately"
        )
    os.makedirs(save_dir, exist_ok=True)
    hf_io.save_safetensors(tensors, os.path.join(save_dir, "adapter_model.safetensors"))


__all__ = [
    "AdaptionPrompt",
    "AdaptionPromptConfig",
    "inject_adaption_prompt",
    "LoraLinear",
    "GPTQLoraConfig",
    "apply_lora",
    "inject_lora",
    "split_lora_params",
    "merge_lora_params",
    "get_gptq_peft_model",
    "find_all_linear_names",
    "save_adapter",
]
