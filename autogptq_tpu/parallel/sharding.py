"""GSPMD sharding rules for (quantized) model parameter trees.

Net-new relative to the reference (which has no TP/DP — see SURVEY.md §2.3).
Strategy: megatron-style tensor parallelism declared as PartitionSpecs and
compiled by GSPMD —

  * column-parallel (shard N / output dim): q/k/v, gate/up, lm_head
  * row-parallel (shard K / input dim): o_proj, down_proj — XLA inserts the
    psum/reduce-scatter for the contracted dim automatically
  * packed tensors: ``wp [K, C]`` shards its plane-column axis together with
    ``scales/zeros [G, planes, C]`` (same "tp" axis on the last dim);
    row-parallel shards wp's K axis and the group axis G, which stays
    group-aligned as long as (K / tp_size) % group_size == 0.
  * desc_act ``kperm`` stays replicated — the activation gather then
    resolves locally for column-parallel layers and via GSPMD-inserted
    collectives for row-parallel ones.
  * KV cache: batch on "dp", kv-heads on "tp".
  * MoE experts: column/row rules per expert; with an "ep" axis each
    expert's weights live on an expert-parallel submesh slice (round-1:
    experts TP-sharded like dense; EP stacking is a later optimization).

Weight-sharding happens once at load with jax.device_put; the forward is a
plain jit with matching in_shardings — XLA overlaps collectives with the
quantized GEMMs via the latency-hiding scheduler.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.arch import ArchConfig, DenseLinear
from ..ops.quantlinear import QuantLinear, StackedQuantLinear


def _dense_specs(node: DenseLinear, col: bool, tp: str) -> DenseLinear:
    if col:
        return DenseLinear(
            kernel=P(None, tp),
            bias=None if node.bias is None else P(tp),
        )
    return DenseLinear(
        kernel=P(tp, None),
        bias=None if node.bias is None else P(None),
    )


def _quant_specs(node: QuantLinear, col: bool, tp: str, tp_size: int) -> QuantLinear:
    k = node.in_features
    gs = node.group_size if node.group_size != -1 else k
    if node.layout == "kb32l":
        # tile-contiguous storage (3-D wp): block rows interleave N and K,
        # so neither plain column- nor row-sharding applies — replicate
        # (correct but unsharded; use kb32 for TP deployments)
        return QuantLinear(
            wp=P(None, None, None),
            scales=P(None, None, None),
            zeros=P(None, None, None),
            kperm=None if node.kperm is None else P(None),
            bias=None if node.bias is None else P(None),
            bits=node.bits, group_size=node.group_size,
            in_features=k, out_features=node.out_features, n_pad=node.n_pad,
            layout=node.layout,
        )
    if col:
        return QuantLinear(
            wp=P(None, tp),
            scales=P(None, None, tp),
            zeros=P(None, None, tp),
            kperm=None if node.kperm is None else P(None),
            bias=None if node.bias is None else P(tp),
            bits=node.bits, group_size=node.group_size,
            in_features=k, out_features=node.out_features, n_pad=node.n_pad,
            layout=node.layout,
        )
    # row-parallel: K and the group axis shard together only when every
    # shard boundary lands on a group boundary. desc_act is INCLUDED: after
    # the load-time kperm sort, K rows are group-sequential (the exllama
    # make_sequential idea, q4_matrix.cu:63-150), so whole-group K shards are
    # valid — each shard also takes ITS slice of kperm (global indices into
    # the full activation vector; arch.* all-gathers the row-parallel input
    # first under explicit TP).
    k_store = node.wp.shape[0]              # stored rows (kpair K/2, kquad K/4)
    k_eff = k_store * {"kpair": 2, "kquad": 4, "ki32": 8, "kb32": 8, "k2i32": 16}.get(node.layout, 1)
    g = node.scales.shape[0]
    shard_k = (
        k_store % tp_size == 0
        and (k_eff // tp_size) % gs == 0
        and g % tp_size == 0
        # kb32 packs per 1024-row superblock: shards must keep them whole
        and (node.layout != "kb32" or (k_eff // tp_size) % 1024 == 0)
        # kperm must cover the (possibly load-time-padded) stored K so its
        # shards pair with wp's shards
        and (node.kperm is None or node.kperm.shape[0] == k_eff)
    )
    if not shard_k:
        # replicate (correct but unsharded)
        kspec, gspec = P(None, None), P(None, None, None)
        kperm_spec = None if node.kperm is None else P(None)
    else:
        kspec, gspec = P(tp, None), P(tp, None, None)
        kperm_spec = None if node.kperm is None else P(tp)
    return QuantLinear(
        wp=kspec,
        scales=gspec,
        zeros=gspec,
        kperm=kperm_spec,
        bias=None if node.bias is None else P(None),
        bits=node.bits, group_size=node.group_size,
        in_features=k, out_features=node.out_features, n_pad=node.n_pad,
        layout=node.layout,
    )


def _linear_specs(node: Any, col: bool, tp: str, tp_size: int):
    if isinstance(node, QuantLinear):
        return _quant_specs(node, col, tp, tp_size)
    return _dense_specs(node, col, tp)


def _stacked_specs(node: StackedQuantLinear, col: bool, tp: str, ep: str | None):
    """Expert-parallel sharding: expert axis on "ep"; the within-expert
    column axis additionally on "tp" for column-parallel projections."""
    lane = tp if col else None
    return StackedQuantLinear(
        wp=P(ep, None, lane),
        scales=P(ep, None, None, lane),
        zeros=P(ep, None, None, lane),
        bias=None if node.bias is None else P(ep, lane),
        bits=node.bits, group_size=node.group_size,
        in_features=node.in_features, out_features=node.out_features,
        n_pad=node.n_pad, layout=node.layout,
    )


# Which block paths are column-parallel (True) vs row-parallel (False).
_COLUMN = {
    "qkv_proj": True,
    "gateup_proj": True,
    "q_proj": True,
    "k_proj": True,
    "v_proj": True,
    "o_proj": False,
    "gate_proj": True,
    "up_proj": True,
    "down_proj": False,
    "router": True,
}


def param_pspecs(params: dict, cfg: ArchConfig, mesh: Mesh, tp_axis: str = "tp") -> dict:
    """PartitionSpec tree matching ``params``."""
    tp_size = mesh.shape[tp_axis]

    def norm_spec(node):
        return {k: P(None) for k in node}

    specs: dict = {}
    if "embed_tokens" in params:
        specs["embed_tokens"] = P(tp_axis, None)
    if "embed_positions" in params:
        specs["embed_positions"] = P(None, None)
    if "final_norm" in params:
        specs["final_norm"] = norm_spec(params["final_norm"])
    if "lm_head" in params:
        specs["lm_head"] = _linear_specs(params["lm_head"], True, tp_axis, tp_size)
    for proj in ("project_in", "project_out"):
        if proj in params:  # OPT word_embed_proj_dim pair: tiny, replicate
            node = params[proj]
            specs[proj] = DenseLinear(
                kernel=P(None, None),
                bias=None if node.bias is None else P(None),
            )

    layer_specs = []
    for block in params["layers"]:
        bs: dict = {}
        for section in ("attn", "mlp"):
            if section not in block:
                continue
            sec: dict = {}
            for name, node in block[section].items():
                if name == "experts":
                    sec["experts"] = [
                        {
                            en: _linear_specs(e[en], _COLUMN[en], tp_axis, tp_size)
                            for en in e
                        }
                        for e in node
                    ]
                elif name == "experts_stacked":
                    sec["experts_stacked"] = {
                        en: _stacked_specs(sn, _COLUMN[en], tp_axis, "ep" if "ep" in mesh.shape else None)
                        for en, sn in node.items()
                    }
                elif name == "adaption":  # adaption-prompt PEFT node
                    from ..utils.peft import AdaptionPrompt

                    sec[name] = AdaptionPrompt(prompt=P(None, None), gate=P())
                else:
                    sec[name] = _linear_specs(node, _COLUMN[name], tp_axis, tp_size)
            bs[section] = sec
        for nname in ("input_norm", "post_norm"):
            if nname in block:
                bs[nname] = norm_spec(block[nname])
        layer_specs.append(bs)
    specs["layers"] = layer_specs
    return specs


def cache_pspecs(mesh: Mesh, dp_axis: str = "dp", tp_axis: str = "tp",
                 quantized: bool = False):
    """KVCache PartitionSpecs: [L, B, S, Hkv, D] — batch on dp, heads on tp.
    ``quantized`` adds matching specs for the int8 cache's scale arrays."""
    from ..models.arch import KVCache

    spec = P(None, dp_axis, None, tp_axis, None)
    return KVCache(
        k=spec, v=spec, length=P(),
        k_scale=spec if quantized else None,
        v_scale=spec if quantized else None,
    )


def shard_params(params: dict, cfg: ArchConfig, mesh: Mesh, tp_axis: str = "tp") -> dict:
    """Place params on the mesh according to param_pspecs (one-time at load)."""
    specs = param_pspecs(params, cfg, mesh, tp_axis)

    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params, specs)


__all__ = ["param_pspecs", "cache_pspecs", "shard_params"]
