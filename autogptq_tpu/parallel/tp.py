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


def _unfuse_blocks(params: dict, cfg: ArchConfig) -> dict:
    """Split statically fused qkv_proj / gateup_proj nodes back into their
    parts. A fused node is a column-level concat of the GLOBAL [q|k|v] (or
    [gate|up]); column-sharding it hands each rank a contiguous chunk of that
    global concat, while attention()/mlp() slice the local result at LOCAL
    widths — silently corrupting outputs. Unfusing restores per-projection
    sharding (fusion is perf-neutral on TPU anyway: kernel launches inside a
    jitted graph carry no dispatch cost)."""
    from ..ops.quantlinear import split_qls

    d = cfg.head_dim
    needs = any(
        "qkv_proj" in b.get("attn", {}) or "gateup_proj" in b.get("mlp", {})
        for b in params["layers"]
    )
    if not needs:
        return params

    out = dict(params)
    new_layers = []
    for block in params["layers"]:
        block = dict(block)
        attn = dict(block.get("attn", {}))
        if "qkv_proj" in attn:
            q, k, v = split_qls(
                attn.pop("qkv_proj"),
                [cfg.num_heads * d, cfg.num_kv_heads * d, cfg.num_kv_heads * d],
            )
            attn.update(q_proj=q, k_proj=k, v_proj=v)
            block["attn"] = attn
        mlp = dict(block.get("mlp", {}))
        if "gateup_proj" in mlp:
            gate, up = split_qls(
                mlp.pop("gateup_proj"),
                [cfg.intermediate_size, cfg.intermediate_size],
            )
            mlp.update(gate_proj=gate, up_proj=up)
            block["mlp"] = mlp
        new_layers.append(block)
    out["layers"] = new_layers
    return out


def _validate_column_parallel(params: dict, tp_size: int) -> None:
    """Column-parallel shards must carry only LOGICAL columns: lane padding
    (n_pad > out_features) lands wholly on the last shard and breaks the
    local head/width reshape with an opaque error. Catch it here instead."""
    from .sharding import _COLUMN

    def check(path: str, node) -> None:
        if isinstance(node, QuantLinear):
            if node.n_pad != node.out_features or node.out_features % tp_size:
                raise ValueError(
                    f"{path}: out_features={node.out_features} (lane-padded "
                    f"to {node.n_pad}) cannot column-shard over tp={tp_size}; "
                    f"explicit TP needs out_features % (128*tp) == 0 — use "
                    f"the GSPMD path or a tp that divides the padded width"
                )
        elif hasattr(node, "kernel"):
            if node.kernel.shape[1] % tp_size:
                raise ValueError(
                    f"{path}: width {node.kernel.shape[1]} not divisible by "
                    f"tp={tp_size}"
                )

    for li, block in enumerate(params["layers"]):
        for sec in ("attn", "mlp"):
            for name, node in block.get(sec, {}).items():
                if _COLUMN.get(name):
                    check(f"layer {li} {sec}.{name}", node)


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


def prepare_tp_params(
    params: dict,
    cfg: ArchConfig,
    mesh: Mesh,
    axis: str = "tp",
):
    """Shared TP preparation: unfuse fused projections, validate shardability,
    pre-scale row-parallel biases, and build the PartitionSpec tree.

    Returns (prepared_params, specs, local_cfg)."""
    tp_size = mesh.shape[axis]
    lcfg = local_cfg(cfg, tp_size, axis)
    prepared = _unfuse_blocks(params, cfg)
    _validate_column_parallel(prepared, tp_size)
    prepared = _scale_row_parallel_biases(prepared, tp_size)

    specs = param_pspecs(prepared, cfg, mesh, tp_axis=axis)
    # the unconditional psum after row-parallel layers requires their K axis
    # to actually be sharded; param_pspecs falls back to replication when a
    # group-aligned split is impossible
    for li, bs in enumerate(specs["layers"]):
        for sec, name in (("attn", "o_proj"), ("mlp", "down_proj")):
            node_spec = bs.get(sec, {}).get(name)
            if node_spec is None:
                continue
            wspec = node_spec.wp if isinstance(node_spec, QuantLinear) else node_spec.kernel
            if wspec[0] != axis:
                raise NotImplementedError(
                    f"layer {li} {sec}.{name}: K axis not shardable over "
                    f"tp={tp_size} (group alignment) — use the "
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
    return prepared, specs, lcfg


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
    prepared, specs, lcfg = prepare_tp_params(params, cfg, mesh, axis)

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


class TPModel:
    """Tensor-parallel inference model: quantized params sharded over a mesh,
    the full generate loop (prefill + KV-cached decode scan) executed under
    ``jax.shard_map`` so every device runs the fused Pallas kernel on its
    LOCAL weight shard (GSPMD cannot partition a ``pallas_call``).

    Sharding layout (megatron pattern): q/k/v/gate/up column-parallel,
    o/down row-parallel with a psum, KV cache heads on the tp axis (it is
    created INSIDE the shard_map body with local head counts), activations
    and sampling replicated — so sharded generate() produces exactly the
    single-device tokens. Optionally the batch axis shards over "dp".

    Presents the single-chip model interface (.params/.cfg/.backend/.dtype)
    so ``utils.generation.generate()`` and ``serving.ContinuousBatchEngine``
    work unchanged. This is the multi-chip decode path the reference lacks
    entirely (its 2-GPU accelerate placement is SLOWER than 1 GPU —
    /root/reference/README.md:36-37)."""

    is_tp = True

    def __init__(
        self,
        model_or_params,
        cfg: ArchConfig | None = None,
        *,
        mesh: Mesh,
        axis: str = "tp",
        dp_axis: str | None = None,
        backend: str = "auto",
        dtype=jnp.bfloat16,
    ):
        if cfg is None:  # model object (models/base.py) or anything duck-alike
            params = model_or_params.params
            cfg = model_or_params.cfg
            backend = getattr(model_or_params, "backend", backend)
            dtype = getattr(model_or_params, "dtype", dtype)
        else:
            params = model_or_params
        prepared, specs, lcfg = prepare_tp_params(params, cfg, mesh, axis)
        self.cfg = cfg
        self.lcfg = lcfg
        self.mesh = mesh
        self.axis = axis
        self.backend = backend
        self.dtype = dtype
        if dp_axis is not None and dp_axis not in mesh.shape:
            raise ValueError(f"mesh has no axis {dp_axis!r}")
        self.dp_axis = dp_axis if (dp_axis and mesh.shape[dp_axis] > 1) else None
        # one-time placement (column/row shards + replicated leaves)
        from jax.sharding import NamedSharding

        self.specs = specs
        self.params = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), prepared, specs
        )
        # compiled sharded-generate entry points, keyed by static options
        self._gen_cache: dict = {}

    # -- generation ---------------------------------------------------------

    def data_spec(self, ndim: int = 2) -> P:
        """PartitionSpec for [B, ...] data arrays (batch on dp if enabled)."""
        return P(self.dp_axis, *([None] * (ndim - 1)))

    def shard_generate(self, fn, n_batch_args: int, n_repl_args: int = 0):
        """Wrap a generate-core function (params, *batch_arrays,
        *replicated_arrays) -> [B, ...] in shard_map over this model's mesh.

        ``fn`` must already have all static options bound; inside the body it
        sees LOCAL params (+ local cfg semantics via self.lcfg) and must
        return batch-leading arrays."""
        in_specs = (
            (self.specs,)
            + (self.data_spec(),) * n_batch_args
            + (P(),) * n_repl_args
        )
        return jax.shard_map(
            fn,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=self.data_spec(),
            check_vma=False,
        )


__all__ = ["make_tp_forward", "prepare_tp_params", "local_cfg", "TPModel"]
