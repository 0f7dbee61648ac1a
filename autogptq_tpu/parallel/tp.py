"""Explicit (shard_map) tensor parallelism for the quantized forward.

Why this exists alongside the GSPMD path (sharding.py): GSPMD cannot
partition a ``pallas_call``, so a jit-with-NamedSharding run routes
quantized matmuls through the XLA dequant+dot fallback on multi-chip
meshes. This module instead runs the WHOLE forward under ``jax.shard_map``
— every device executes the fused Pallas kernel on its local weight shard
and the only collectives are the megatron-pattern psums after o_proj /
down_proj (inserted by arch.* when ``cfg.tp_axis`` is set). This is the
scaling-book recipe written explicitly: column-parallel q/k/v/gate/up,
row-parallel o/down, activations replicated.

Usage::

    mesh = make_mesh(tp=8)
    local_cfg, run = tp.make_tp_forward(model.params, model.cfg, mesh)
    logits = run(model.params, tokens)   # params get sharded by in_specs

Constraints (asserted): heads, kv heads and intermediate width divide tp;
K shards stay group-aligned; row-parallel biases are pre-divided by tp so
the psum restores them exactly once.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import arch
from ..models.arch import ArchConfig
from ..ops.quantlinear import QuantLinear
from .sharding import param_pspecs


def local_cfg(cfg: ArchConfig, tp_size: int, axis: str = "tp") -> ArchConfig:
    """The per-shard architecture: local head/intermediate counts + psums."""
    if cfg.num_heads % tp_size or cfg.num_kv_heads % tp_size:
        raise ValueError(
            f"heads ({cfg.num_heads}/{cfg.num_kv_heads}) must divide tp={tp_size}"
        )
    if cfg.intermediate_size % tp_size:
        raise ValueError(f"intermediate {cfg.intermediate_size} must divide tp={tp_size}")
    if cfg.moe_num_experts:
        raise NotImplementedError("explicit-TP MoE: use the 'ep' GSPMD path")
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp_size,
        num_kv_heads=cfg.num_kv_heads // tp_size,
        intermediate_size=cfg.intermediate_size // tp_size,
        tp_axis=axis,
    )


def _scale_row_parallel_biases(params: dict, tp_size: int) -> dict:
    """Row-parallel layers keep their (replicated) bias on every shard; the
    psum would then add it tp times. Pre-divide so it lands exactly once."""
    if tp_size == 1:
        return params

    def fix_block(block):
        for sec, name in (("attn", "o_proj"), ("mlp", "down_proj")):
            node = block.get(sec, {}).get(name)
            if node is not None and getattr(node, "bias", None) is not None:
                block[sec] = dict(block[sec])
                block[sec][name] = node.replace(bias=node.bias / tp_size)
        return block

    out = dict(params)
    out["layers"] = [fix_block(dict(b)) for b in params["layers"]]
    return out


def make_tp_forward(
    params: dict,
    cfg: ArchConfig,
    mesh: Mesh,
    axis: str = "tp",
    backend: str = "auto",
    dtype=jnp.bfloat16,
):
    """Build a shard_map'd forward. Returns (prepared_params, forward_fn);
    forward_fn(prepared_params, tokens) -> logits [B, T, V] (replicated)."""
    tp_size = mesh.shape[axis]
    lcfg = local_cfg(cfg, tp_size, axis)
    prepared = _scale_row_parallel_biases(params, tp_size)

    specs = param_pspecs(prepared, cfg, mesh, tp_axis=axis)
    # the unconditional psum after row-parallel layers requires their K axis
    # to actually be sharded; param_pspecs falls back to replication when a
    # group-aligned split is impossible (e.g. desc_act kperm)
    for li, bs in enumerate(specs["layers"]):
        for sec, name in (("attn", "o_proj"), ("mlp", "down_proj")):
            node_spec = bs.get(sec, {}).get(name)
            if node_spec is None:
                continue
            wspec = node_spec.wp if isinstance(node_spec, QuantLinear) else node_spec.kernel
            if wspec[0] != axis:
                raise NotImplementedError(
                    f"layer {li} {sec}.{name}: K axis not shardable over "
                    f"tp={tp_size} (desc_act or group alignment) — use the "
                    f"GSPMD path for this model"
                )
    # embed/lm_head replicated in the explicit path (vocab-sharded lookups
    # would need masked gathers + psum; the memory win is minor)
    if "embed_tokens" in specs:
        specs["embed_tokens"] = P()
    if "lm_head" in specs:
        specs["lm_head"] = jax.tree.map(
            lambda _: P(), specs["lm_head"],
            is_leaf=lambda x: isinstance(x, P),
        )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(p, tokens):
        logits, _ = arch.forward(p, tokens, lcfg, backend=backend, dtype=dtype)
        return logits

    return prepared, run


__all__ = ["make_tp_forward", "local_cfg"]
