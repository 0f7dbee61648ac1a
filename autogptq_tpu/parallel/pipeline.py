"""Pipeline parallelism: GPipe-style microbatched stage execution over a
"pp" mesh axis (net-new — the reference's only multi-device story is HF
accelerate's sequential layer placement, which the README's own 2-GPU rows
show is SLOWER than one GPU; modeling/_base.py:929-960, README.md:36-37).

TPU-native design: decoder layers are stacked into per-stage parameter
pytrees whose leading axis is sharded over "pp"; the schedule runs under
``jax.shard_map`` with ``jax.lax.ppermute`` moving activations stage to
stage over ICI/DCN. With M microbatches and S stages the fill/drain bubble
is (S-1)/(M+S-1) — DCN crossings only carry one activation tensor per
microbatch per stage boundary, which is why PP (not TP) is the right axis
to place across hosts (TP collectives would cross DCN every matmul).

Scope: cache-less forward (calibration / perplexity / scoring / training).
Latency-bound single-stream decode gains nothing from PP by construction;
batch decode throughput over DCN composes with the serving engine later.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import arch
from ..models.arch import ArchConfig


def stack_layers(layers: list[dict]) -> dict:
    """Stack a list of per-layer pytrees into one pytree with leading L axis.
    Static fields (QuantLinear bits/layout, ...) must agree across layers."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def stage_params(params: dict, num_stages: int) -> dict:
    """Rearrange ``params["layers"]`` into ``[S, L/S, ...]`` stacked leaves;
    embed/norm/lm_head stay as-is (replicated across stages)."""
    layers = params["layers"]
    n = len(layers)
    if n % num_stages:
        raise ValueError(f"{n} layers do not divide into {num_stages} stages")
    lps = n // num_stages
    stacked = stack_layers(layers)
    staged = jax.tree.map(
        lambda a: a.reshape(num_stages, lps, *a.shape[1:]), stacked
    )
    out = dict(params)
    out["layers"] = staged
    return out


def _stage_apply(stage_tree, x, positions, mask, cfg: ArchConfig, backend: str):
    """Run one stage's layers (leading axis Lps) over x via lax.scan."""

    def body(h, layer_tree):
        y, _ = arch.block_forward(layer_tree, h, 0, None, positions, cfg, backend, mask)
        return y, None

    y, _ = jax.lax.scan(body, x, stage_tree)
    return y


def pipeline_forward(
    params: dict,
    tokens: jnp.ndarray,            # [M, mb, T] microbatched input ids
    cfg: ArchConfig,
    mesh: Mesh,
    attn_mask: Optional[jnp.ndarray] = None,   # [M, mb, T]
    axis: str = "pp",
    backend: str = "auto",
    dtype=jnp.bfloat16,
):
    """Microbatched pipelined forward. ``params`` from :func:`stage_params`.
    Returns logits [M, mb, T, V]."""
    num_stages = mesh.shape[axis]
    m, mb, t = tokens.shape
    if attn_mask is None:
        attn_mask = jnp.ones((m, mb, t), jnp.int32)
    positions = jnp.maximum(jnp.cumsum(attn_mask, axis=-1) - 1, 0)

    # Non-layer params replicated; staged layers sharded on their S axis.
    layer_specs = jax.tree.map(lambda _: P(axis), params["layers"])
    param_specs = {k: (layer_specs if k == "layers" else jax.tree.map(lambda _: P(), v))
                   for k, v in params.items()}
    data_spec = P()  # microbatches replicated; each stage picks by tick

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(param_specs, data_spec, data_spec, data_spec),
        out_specs=P(),
        check_vma=False,
    )
    def run(p, toks, pos, msk):
        stage_tree = jax.tree.map(lambda a: a[0], p["layers"])  # local [Lps,...]
        sid = jax.lax.axis_index(axis)
        is_first = sid == 0
        is_last = sid == num_stages - 1
        ticks = m + num_stages - 1

        h0 = arch.embed({k: v for k, v in p.items() if k != "layers"},
                        toks[0], pos[0], cfg, dtype)
        buf = jnp.zeros_like(h0)                      # inter-stage activation
        out = jnp.zeros((m, mb, t, cfg.vocab_size), jnp.float32)

        def tick_body(tick, carry):
            buf, out = carry
            # stage 0 ingests microbatch `tick` (clamped; masked by validity)
            mb_in = jnp.clip(tick, 0, m - 1)
            x_new = arch.embed({k: v for k, v in p.items() if k != "layers"},
                               toks[mb_in], pos[mb_in], cfg, dtype)
            x = jnp.where(is_first, x_new, buf)
            # every stage processes the microbatch currently at its slot
            my_mb = tick - sid
            pos_i = pos[jnp.clip(my_mb, 0, m - 1)]
            msk_i = msk[jnp.clip(my_mb, 0, m - 1)]
            y = _stage_apply(stage_tree, x, pos_i, msk_i, cfg, backend)
            # last stage: unembed + store when its microbatch is valid
            logits = arch.unembed({k: v for k, v in p.items() if k != "layers"},
                                  y, cfg)
            valid = is_last & (my_mb >= 0) & (my_mb < m)
            out = jax.lax.cond(
                valid,
                lambda o: jax.lax.dynamic_update_slice(
                    o, logits[None].astype(jnp.float32),
                    (jnp.clip(my_mb, 0, m - 1), 0, 0, 0)),
                lambda o: o,
                out,
            )
            # move activations one stage down the ring (last -> first wraps,
            # but the wrapped value is ignored: stage 0 always re-embeds)
            buf = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % num_stages) for i in range(num_stages)]
            )
            return buf, out

        _, out = jax.lax.fori_loop(0, ticks, tick_body, (buf, out))
        # only the last stage holds real logits; share them with every stage
        out = jax.lax.psum(
            jnp.where(is_last, out, jnp.zeros_like(out)), axis
        )
        return out

    return run(params, tokens, positions, attn_mask)


__all__ = ["stack_layers", "stage_params", "pipeline_forward"]
