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
            is_leaf=lambda n: isinstance(n, (QuantLinear, DenseLinear, LoraLinear)),
        )  # structural copy
        for path in peft_cfg.target_modules:
            try:
                node = params_lib.get_in(block, path)
            except (KeyError, TypeError, IndexError):
                continue
            if isinstance(node, LoraLinear):
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
        if isinstance(node, LoraLinear):
            return {"lora_a": node.lora_a, "lora_b": node.lora_b}
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
        if isinstance(node, LoraLinear):
            return LoraLinear(
                base=node.base,
                lora_a=tnode["lora_a"],
                lora_b=tnode["lora_b"],
                scaling=node.scaling,
            )
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


def get_gptq_peft_model(model, peft_cfg: GPTQLoraConfig | None = None, seed: int = 0):
    """Public entry (reference: get_gptq_peft_model, peft_utils.py:354-422):
    wraps target modules of a (quantized) GPTQModel with LoRA adapters,
    in place. Returns the model."""
    peft_cfg = peft_cfg or GPTQLoraConfig()
    model.params = inject_lora(model.params, peft_cfg, seed)
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
    os.makedirs(save_dir, exist_ok=True)
    hf_io.save_safetensors(tensors, os.path.join(save_dir, "adapter_model.safetensors"))


__all__ = [
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
