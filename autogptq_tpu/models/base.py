"""GPTQModel: the user-facing orchestrator (quantize / save / load / generate).

Functional re-design of the reference's ``BaseGPTQForCausalLM``
(/root/reference/auto_gptq/modeling/_base.py:90-1300):

  * ``quantize()`` — layer-by-layer calibration. The reference captures layer
    inputs with forward hooks and an exception-raising "Catcher"
    (_base.py:221-273); here the decoder is already a list of pure block
    functions, so we simply run the embedding once, then fold each block over
    the cached hidden states, capturing linear inputs functionally
    (arch.block_forward(capture=...)), accumulating Hessians, solving GPTQ
    per sublist in ``true_sequential`` order, and re-running the block with
    quantized weights before moving on (matching _base.py:288-377).
  * ``save_quantized()`` / ``from_quantized()`` — reference-compatible
    safetensors + quantize_config.json.
  * ``from_pretrained()`` — loads an fp HF checkpoint into the JAX tree.
  * ``generate()`` — jit-compiled greedy/sampling/beam decode with a
    preallocated KV cache.
"""

from __future__ import annotations

import copy
import json
import logging
import os
import time
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quantlinear as qlin
from ..quantization import (
    BaseQuantizeConfig,
    GPTQConfig,
    gptq_quantize,
    hessian_init,
    hessian_update,
)
from ..quantization.config import QUANTIZE_BLACK_LIST
from ..utils import hf_io
from . import arch, params as params_lib
from .arch import ArchConfig, KVCache
from .registry import FamilySpec, get_family

logger = logging.getLogger(__name__)


def _check_solver_loss(total_loss, where: str) -> float:
    """Surface a non-finite GPTQ solver loss (non-positive-definite Hessian)
    immediately instead of silently packing NaN weights."""
    loss = float(total_loss)
    if not np.isfinite(loss):
        raise ValueError(
            f"GPTQ solver produced a non-finite loss for {where}: the "
            "Hessian is likely not positive definite. Increase damp_percent "
            "or provide more/denser calibration data."
        )
    return loss


def _pad_examples(
    examples: Sequence[dict], pad_token_id: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Left-pad a list of {input_ids} dicts to a common length.

    Mirrors the reference's pad-and-collate prep (_base.py:131-174 +
    utils/data_utils.collate_data) — left padding, attention mask zeros on
    pads.
    """
    ids = [np.asarray(e["input_ids"]).reshape(-1) for e in examples]
    max_len = max(len(x) for x in ids)
    batch = np.full((len(ids), max_len), pad_token_id, dtype=np.int32)
    mask = np.zeros((len(ids), max_len), dtype=np.int32)
    for i, x in enumerate(ids):
        batch[i, max_len - len(x):] = x
        mask[i, max_len - len(x):] = 1
    return batch, mask


class GPTQModel:
    """A causal LM with (potentially) GPTQ-quantized linear layers."""

    def __init__(
        self,
        params: dict,
        cfg: ArchConfig,
        spec: FamilySpec,
        quantize_config: BaseQuantizeConfig,
        quantized: bool = False,
        backend: str = "auto",
        dtype=jnp.bfloat16,
    ):
        self.params = params
        self.cfg = cfg
        self.spec = spec
        self.quantize_config = quantize_config
        self.quantized = quantized
        self.backend = backend
        self.dtype = dtype
        # "{layer}.{path}" -> PackedQuantLinear (disk layout) after quantize()
        self.packed_layers: dict[str, qlin.PackedQuantLinear] = {}
        self._jit_cache: dict[Any, Any] = {}

    # ------------------------------------------------------------------
    # Constructors
    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        model_dir: str,
        quantize_config: Optional[BaseQuantizeConfig] = None,
        dtype=jnp.bfloat16,
        revision: Optional[str] = None,
        **kwargs,
    ) -> "GPTQModel":
        model_dir = hf_io.resolve_model_dir(model_dir, revision)
        hf_cfg = hf_io.load_hf_config(model_dir)
        spec = get_family(hf_cfg["model_type"], hf_cfg)
        cfg = spec.arch_fn(hf_cfg)
        # lazy (mmap-backed) tensor view: peak host memory stays near one
        # tensor at a time — required for 70B-class fp checkpoints on this
        # host (the reference's low_cpu_mem_usage role)
        tensors = hf_io.open_tensors(model_dir)
        params = params_lib.build_fp_params(tensors, spec, cfg, dtype)
        qc = quantize_config or BaseQuantizeConfig()
        qc.model_name_or_path = model_dir
        return cls(params, cfg, spec, qc, quantized=False, dtype=dtype)

    @classmethod
    def from_quantized(
        cls,
        model_dir: str,
        dtype=jnp.bfloat16,
        backend: str = "auto",
        inject_fused_attention: bool = False,
        inject_fused_mlp: bool = False,
        revision: Optional[str] = None,
        **kwargs,
    ) -> "GPTQModel":
        """``inject_fused_attention``/``inject_fused_mlp`` mirror the
        reference kwargs (_base.py:690-715) but fuse STATICALLY at load:
        q/k/v (and gate/up) runtime layouts are concatenated along N into
        one kernel invocation (params.fuse_qkv_gateup). ``model_dir`` may be
        a local directory or an HF Hub repo id (+ ``revision``), resolved
        through the local hub cache (hf_io.resolve_model_dir — the
        reference's get_checkpoints role, modeling/_utils.py:704-770)."""
        # Reference-signature compat (_base.py:690-715): migrating call
        # sites may pass the reference's kwargs. model_basename selects the
        # checkpoint file; torch_dtype maps onto dtype; kernel-selection and
        # accelerate-placement flags have no TPU meaning (one Pallas backend,
        # JAX shardings) and are deliberately ignored.
        model_basename = kwargs.pop("model_basename", None)
        override_qc = kwargs.pop("quantize_config", None)
        torch_dtype = kwargs.pop("torch_dtype", None)
        if torch_dtype is not None:
            # Accept both the repr form ("torch.float16") and the plain HF
            # string form ("float16"); "auto" keeps the default.
            key = str(torch_dtype).removeprefix("torch.")
            mapped = {
                "float16": jnp.float16,
                "bfloat16": jnp.bfloat16,
                "float32": jnp.float32,
                "auto": dtype,
            }.get(key)
            if mapped is not None:
                dtype = mapped
            else:
                logger.warning(
                    "from_quantized: unrecognized torch_dtype=%r ignored "
                    "(keeping %s)", torch_dtype, jnp.dtype(dtype).name
                )
        ignored = [
            f for f in (
                "device", "device_map", "max_memory", "low_cpu_mem_usage",
                "use_triton", "use_tritonv2", "use_qigen", "use_marlin",
                "use_cuda_fp16", "use_safetensors", "trust_remote_code",
                "warmup_triton", "trainable", "disable_exllama",
                "disable_exllamav2",
            ) if kwargs.pop(f, None) is not None
        ]
        if ignored:
            logger.info(
                "from_quantized: ignoring reference-only kwargs with no TPU "
                "equivalent: %s", ", ".join(ignored)
            )
        model_dir = hf_io.resolve_model_dir(model_dir, revision)
        hf_cfg = hf_io.load_hf_config(model_dir)
        spec = get_family(hf_cfg["model_type"], hf_cfg)
        cfg = spec.arch_fn(hf_cfg)
        if override_qc is not None:
            # Reference call sites pass quantize_config= to override a
            # broken/missing on-disk config (_base.py:811-815 only reads the
            # file when the caller gave none) — honor the same precedence.
            qc = override_qc
        else:
            qc = BaseQuantizeConfig.from_pretrained(model_dir, **kwargs)
        if model_basename is not None:
            qc.model_file_base_name = model_basename
        qc.model_name_or_path = model_dir
        if qc.checkpoint_format == "gemm":
            tensors = _convert_awq_tensors(model_dir, spec, cfg, qc)
        elif qc.checkpoint_format == "marlin":
            from ..ops import marlin_compat

            raw = hf_io.load_tensors(model_dir, qc.model_file_base_name)
            tensors = marlin_compat.convert_checkpoint_marlin_to_gptq(raw, qc.group_size)
            qc.checkpoint_format = "gptq"
        else:
            tensors = hf_io.open_tensors(model_dir, qc.model_file_base_name)
        params = params_lib.build_quantized_params(
            tensors, spec, cfg, qc.bits, qc.group_size, dtype
        )
        if inject_fused_attention or inject_fused_mlp:
            params = params_lib.fuse_qkv_gateup(
                params, attention=inject_fused_attention, mlp=inject_fused_mlp
            )
        return cls(params, cfg, spec, qc, quantized=True, backend=backend, dtype=dtype)

    # ------------------------------------------------------------------
    # Quantization (the core calibration loop)
    # ------------------------------------------------------------------

    def quantize(
        self,
        examples: Sequence[dict],
        batch_size: int = 1,
        calib_dtype=jnp.float32,
        checkpoint_dir: Optional[str] = None,
    ) -> None:
        """Run GPTQ calibration over ``examples`` (list of {"input_ids"}).

        ``checkpoint_dir`` makes the run RESUMABLE (net-new vs the reference,
        whose quantize() is one monolithic pass — SURVEY §5): each completed
        decoder layer's packed tensors are written to
        ``{checkpoint_dir}/layer_{i}.safetensors`` plus a ``state.json``
        progress marker. Re-invoking quantize() with the same directory
        restores the completed layers and re-forwards the calibration
        activations through them (activations are recomputed, not stored),
        then continues from the first unfinished layer.

        Follows the reference flow (modeling/_base.py:176-396): capture layer-0
        inputs, then per decoder block accumulate Hessians per
        ``inside_layer_modules`` sublist, solve, swap in quantized weights,
        and re-forward to produce the next block's inputs.
        """
        if self.quantized:
            raise RuntimeError("model is already quantized")
        if self.quantize_config.quant_method in QUANTIZE_BLACK_LIST:
            raise NotImplementedError(
                f"quant method {self.quantize_config.quant_method} is inference-only"
            )
        qc = self.quantize_config
        cfg = self.cfg
        spec = self.spec

        gcfg = GPTQConfig(
            bits=qc.bits,
            group_size=qc.group_size,
            sym=qc.sym,
            desc_act=qc.desc_act,
            static_groups=qc.static_groups,
            percdamp=qc.damp_percent,
            mse=qc.mse,
        )

        # 1. Batch + embed all examples once (the "Catcher" equivalent).
        batches = []
        for i in range(0, len(examples), batch_size):
            batches.append(_pad_examples(examples[i : i + batch_size]))

        embed_fn = jax.jit(
            lambda tokens, positions: arch.embed(self.params, tokens, positions, cfg, calib_dtype)
        )
        hidden, masks, positions = [], [], []
        for tokens, mask in batches:
            pos = np.maximum(np.cumsum(mask, axis=-1) - 1, 0)
            hidden.append(embed_fn(jnp.asarray(tokens), jnp.asarray(pos)))
            masks.append(jnp.asarray(mask))
            positions.append(jnp.asarray(pos))

        quant_sublists = spec.quant_layers
        if not qc.true_sequential:
            quant_sublists = [[p for sub in spec.quant_layers for p in sub]]

        block_caps = {p for sub in quant_sublists for p in sub}

        # jitted per-block capture pass and forward pass
        @jax.jit
        def block_capture(bp, x, pos, mask):
            cap: dict = {}
            arch.block_forward(bp, x, 0, None, pos, cfg, "xla", mask, cap)
            return {k: v for k, v in cap.items() if k in block_caps}

        @jax.jit
        def block_apply(bp, x, pos, mask):
            y, _ = arch.block_forward(bp, x, 0, None, pos, cfg, "xla", mask)
            return y

        from ..utils.profiling import PhaseTimer

        timer = PhaseTimer()
        avg_losses = []
        t_start = time.time()

        # --- resume support -------------------------------------------------
        resume_from = 0
        if checkpoint_dir is not None:
            resume_from, restored_losses = self._restore_quant_checkpoint(checkpoint_dir, qc)
            # restore completed layers' solver losses so the final logged
            # average covers the FULL model, comparable to an unresumed run
            avg_losses.extend(restored_losses)
            if resume_from:
                logger.info(
                    "resuming quantization from layer %d (checkpoint %s)",
                    resume_from, checkpoint_dir,
                )
                with timer.phase("resume_reforward"):
                    for li in range(resume_from):
                        for bi in range(len(batches)):
                            hidden[bi] = block_apply(
                                self.params["layers"][li], hidden[bi],
                                positions[bi], masks[bi],
                            )

        for li, block in enumerate(self.params["layers"]):
            if li < resume_from:
                continue
            block = dict(block)  # shallow copy we mutate as sublists quantize
            for sublist in quant_sublists:
                present = [p for p in sublist if self._has_path(block, p)]
                if not present:
                    continue
                # Hessian accumulation over all batches for every linear in
                # the sublist, from ONE capture pass per batch.
                hs = {}
                with timer.phase("hessian"):
                    for bi in range(len(batches)):
                        caps = block_capture(block, hidden[bi], positions[bi], masks[bi])
                        for p in present:
                            x_in = caps[p]
                            if p not in hs:
                                hs[p] = hessian_init(x_in.shape[-1])
                            hs[p] = hessian_update(hs[p][0], hs[p][1], x_in)

                # Group Hessian-sharing members (q/k/v, gate/up feed the SAME
                # activations, so their Hessians are bit-identical) and solve
                # each group as ONE N-concatenated matrix: the solver is
                # row-independent given H, so results are exactly the
                # per-layer solves while the serial per-column loop runs once
                # instead of len(group) times (the reference solves each
                # nn.Linear separately, gptq.py:121-161).
                groups: list[list[str]] = []
                # One D2H transfer per member (the [K,K] Hessian is large and
                # the tunnel is ~30 ms/transfer); compare cheap diagonal
                # fingerprints first so full-matrix equality only runs on
                # plausible matches.
                h_host = {p: np.asarray(hs[p][0]) for p in present}
                diag = {p: np.ascontiguousarray(np.diagonal(h_host[p]))
                        for p in present}
                for p in present:
                    for grp in groups:
                        g0 = grp[0]
                        if (h_host[p].shape == h_host[g0].shape
                                and np.array_equal(diag[p], diag[g0])
                                and np.array_equal(h_host[p], h_host[g0])):
                            grp.append(p)
                            break
                    else:
                        groups.append([p])

                for grp in groups:
                    nodes = [params_lib.get_in(block, p) for p in grp]
                    ws = [np.asarray(nd.kernel, np.float32).T for nd in nodes]
                    row_ofs = np.cumsum([0] + [w.shape[0] for w in ws])
                    h, _ = hs[grp[0]]
                    with timer.phase("solver"):
                        res = gptq_quantize(
                            jnp.asarray(np.concatenate(ws, axis=0)), h, gcfg)
                        _check_solver_loss(
                            res.total_loss, f"layer {li} {'+'.join(grp)}")
                        row_loss = np.asarray(res.row_loss)
                    qweight = np.asarray(res.qweight)
                    scale = np.asarray(res.scale)
                    zero = np.asarray(res.zero)
                    g_idx = np.asarray(res.g_idx)
                    with timer.phase("pack"):
                        for gi, (p, node) in enumerate(zip(grp, nodes)):
                            r0, r1 = row_ofs[gi], row_ofs[gi + 1]
                            avg_losses.append(float(row_loss[r0:r1].sum()))
                            packed = qlin.pack_from_solver(
                                qweight[r0:r1],
                                scale[:, r0:r1],
                                zero[:, r0:r1],
                                g_idx,
                                bits=qc.bits,
                                group_size=qc.group_size,
                                bias=None if node.bias is None else np.asarray(node.bias),
                            )
                            self.packed_layers[f"{li}.{p}"] = packed
                            params_lib.set_in_block(block, p, qlin.from_packed(packed))
                    for p in grp:
                        del hs[p]
                logger.info(
                    "layer %d/%d sublist %s quantized", li + 1, cfg.num_layers, sublist
                )

            # Re-forward with quantized weights for the next layer's inputs.
            with timer.phase("reforward"):
                for bi in range(len(batches)):
                    hidden[bi] = block_apply(block, hidden[bi], positions[bi], masks[bi])
            self.params["layers"][li] = block
            if checkpoint_dir is not None:
                self._save_quant_checkpoint(checkpoint_dir, li, qc, avg_losses)

        # Optional lm_head quantization (GPTQModel-style extension; the
        # reference never quantizes the head). Hessian comes from the
        # final-normed hidden states that actually feed the head.
        if qc.lm_head and "lm_head" in self.params and not cfg.tie_word_embeddings:
            node = self.params["lm_head"]
            if hasattr(node, "kernel"):
                final_fn = jax.jit(lambda x: arch.apply_norm(self.params["final_norm"], x, cfg)) \
                    if cfg.final_norm and "final_norm" in self.params else (lambda x: x)
                h_acc = None
                with timer.phase("hessian"):
                    for bi in range(len(batches)):
                        x_in = final_fn(hidden[bi])
                        if h_acc is None:
                            h_acc = hessian_init(x_in.shape[-1])
                        h_acc = hessian_update(h_acc[0], h_acc[1], x_in)
                w = np.asarray(node.kernel, dtype=np.float32).T
                with timer.phase("solver"):
                    res = gptq_quantize(jnp.asarray(w), h_acc[0], gcfg)
                    avg_losses.append(
                        _check_solver_loss(res.total_loss, "lm_head")
                    )
                with timer.phase("pack"):
                    packed = qlin.pack_from_solver(
                        np.asarray(res.qweight), np.asarray(res.scale),
                        np.asarray(res.zero), np.asarray(res.g_idx),
                        bits=qc.bits, group_size=qc.group_size,
                        bias=None if node.bias is None else np.asarray(node.bias),
                    )
                    self.packed_layers["lm_head"] = packed
                    self.params["lm_head"] = qlin.from_packed(packed)
                logger.info("lm_head quantized")

        timer.log("quantize")
        logger.info(
            "quantized %d layers in %.1fs (mean solver loss %.4f)",
            cfg.num_layers,
            time.time() - t_start,
            float(np.mean(avg_losses)) if avg_losses else float("nan"),
        )
        self.quantized = True

    def _save_quant_checkpoint(self, checkpoint_dir: str, li: int, qc,
                               losses: Optional[list] = None) -> None:
        """Write layer li's packed tensors + advance the progress marker."""
        os.makedirs(checkpoint_dir, exist_ok=True)
        tensors: dict = {}
        prefix = f"{li}."
        for key, pk in self.packed_layers.items():
            if not key.startswith(prefix):
                continue
            path = key[len(prefix):]
            tensors[f"{path}.qweight"] = np.asarray(pk.qweight).astype(np.int32)
            tensors[f"{path}.qzeros"] = np.asarray(pk.qzeros).astype(np.int32)
            tensors[f"{path}.scales"] = np.asarray(pk.scales).astype(np.float16)
            tensors[f"{path}.g_idx"] = np.asarray(pk.g_idx).astype(np.int32)
            if pk.bias is not None:
                tensors[f"{path}.bias"] = np.asarray(pk.bias)
        hf_io.save_safetensors(
            tensors, os.path.join(checkpoint_dir, f"layer_{li}.safetensors")
        )
        state = {
            "next_layer": li + 1,
            "num_layers": self.cfg.num_layers,
            "quantize_config": qc.to_dict(),
            # per-linear solver losses so a resumed run reports the same
            # full-model average an unresumed run would
            "avg_losses": list(losses or []),
        }
        # cumulative per-layer loss counts so a TRUNCATED-checkpoint resume
        # (missing layer file before next_layer) can slice the restored
        # losses to exactly the layers it keeps, instead of double-counting
        # the re-quantized ones
        prev_counts: list = []
        sp = os.path.join(checkpoint_dir, "state.json")
        if os.path.isfile(sp):
            with open(sp) as f:
                prev_counts = list(json.load(f).get("loss_counts", []))[:li]
        state["loss_counts"] = prev_counts + [len(losses or [])]
        tmp = os.path.join(checkpoint_dir, "state.json.tmp")
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, os.path.join(checkpoint_dir, "state.json"))

    def _restore_quant_checkpoint(self, checkpoint_dir: str, qc) -> tuple[int, list]:
        """Load completed layers from a quantize checkpoint; return (first
        unfinished layer index, per-linear losses recorded so far)."""
        state_path = os.path.join(checkpoint_dir, "state.json")
        if not os.path.isfile(state_path):
            return 0, []
        with open(state_path) as f:
            state = json.load(f)
        saved_qc = state.get("quantize_config", {})
        ours = qc.to_dict()
        for k in ("bits", "group_size", "desc_act", "sym", "static_groups"):
            if saved_qc.get(k) != ours.get(k):
                raise ValueError(
                    f"quantize checkpoint {checkpoint_dir} was produced with "
                    f"{k}={saved_qc.get(k)!r}, current config has {ours.get(k)!r}"
                )
        saved_layers = state.get("num_layers")
        if saved_layers is not None and int(saved_layers) != self.cfg.num_layers:
            raise ValueError(
                f"quantize checkpoint {checkpoint_dir} was produced for a "
                f"{saved_layers}-layer model, current model has "
                f"{self.cfg.num_layers} layers"
            )
        next_layer = int(state["next_layer"])
        from safetensors import safe_open

        losses = [float(x) for x in state.get("avg_losses", [])]
        counts = state.get("loss_counts")

        def upto(nlayers: int) -> list:
            # slice to the losses of the first nlayers COMPLETED layers so a
            # truncated resume doesn't double-count re-quantized layers
            if nlayers <= 0:
                return []
            if counts is not None and nlayers <= len(counts):
                return losses[: counts[nlayers - 1]]
            if nlayers >= next_layer:
                return losses  # full restore: all recorded losses are kept
            # legacy state without loss_counts + truncated checkpoint: the
            # per-layer boundaries are unknown, so drop the restored losses
            # rather than double-count the re-quantized layers
            return []

        for li in range(next_layer):
            fpath = os.path.join(checkpoint_dir, f"layer_{li}.safetensors")
            if not os.path.isfile(fpath):
                return li, upto(li)  # truncated checkpoint: resume from gap
            groups: dict[str, dict] = {}
            with safe_open(fpath, framework="np") as f:
                for name in f.keys():
                    path, field = name.rsplit(".", 1)
                    groups.setdefault(path, {})[field] = f.get_tensor(name)
            block = dict(self.params["layers"][li])
            for path, t in groups.items():
                qweight = t["qweight"]
                k = qweight.shape[0] * 32 // qc.bits
                pk = qlin.PackedQuantLinear(
                    qweight=qweight,
                    qzeros=t["qzeros"],
                    scales=t["scales"],
                    g_idx=t["g_idx"],
                    bias=t.get("bias"),
                    bits=qc.bits,
                    group_size=qc.group_size,
                    in_features=k,
                    out_features=qweight.shape[1],
                )
                self.packed_layers[f"{li}.{path}"] = pk
                params_lib.set_in_block(block, path, qlin.from_packed(pk))
            self.params["layers"][li] = block
        return next_layer, upto(next_layer)

    @staticmethod
    def _has_path(block: dict, path: str) -> bool:
        try:
            node = params_lib.get_in(block, path)
        except (KeyError, IndexError, TypeError):
            return False
        return node is not None

    # ------------------------------------------------------------------
    # Save / load
    # ------------------------------------------------------------------

    def save_quantized(
        self,
        save_dir: str,
        safetensors_metadata: Optional[dict] = None,
        max_shard_size: Optional[int] = None,
        hf_config: Optional[dict] = None,
    ) -> None:
        """Write a reference-compatible quantized checkpoint: sharded (or
        single) safetensors + quantize_config.json + config.json (with
        ``quantization_config`` embedded, like _base.py:502-577)."""
        if not self.quantized:
            raise RuntimeError("save_quantized only saves quantized models")
        os.makedirs(save_dir, exist_ok=True)
        tensors = params_lib.flatten_quantized_params(
            self.params, self.packed_layers, self.spec, self.cfg
        )
        model_base = self.quantize_config.model_file_base_name or (
            f"gptq_model-{self.quantize_config.bits}bit-{self.quantize_config.group_size}g"
        )
        self.quantize_config.model_file_base_name = model_base
        meta = dict(safetensors_metadata or {})
        meta.setdefault("format", "pt")
        meta["gptq_bits"] = str(self.quantize_config.bits)
        meta["gptq_group_size"] = str(self.quantize_config.group_size)
        meta["gptq_desc_act"] = str(self.quantize_config.desc_act)
        meta["gptq_damp_percent"] = str(self.quantize_config.damp_percent)
        meta["quantizer"] = "autogptq_tpu:0.1.0"
        # The file MUST be named after model_file_base_name: the reference's
        # get_checkpoints (modeling/_utils.py:704-770) searches only
        # f"{model_basename}.safetensors", so a mismatched name makes the
        # checkpoint unloadable there.
        hf_io.save_safetensors(
            tensors,
            os.path.join(save_dir, f"{model_base}.safetensors"),
            metadata={k: str(v) for k, v in meta.items()},
            max_shard_size=max_shard_size,
        )
        self.quantize_config.save_pretrained(save_dir)
        # config.json so from_quantized can rebuild the architecture
        if hf_config is None and self.quantize_config.model_name_or_path:
            try:
                hf_config = hf_io.load_hf_config(self.quantize_config.model_name_or_path)
            except FileNotFoundError:
                hf_config = None
        if hf_config is not None:
            hf_config = copy.deepcopy(hf_config)
            hf_config["quantization_config"] = self.quantize_config.to_dict()
            with open(os.path.join(save_dir, "config.json"), "w") as f:
                json.dump(hf_config, f, indent=2)

    def push_to_hub(
        self,
        repo_id: str,
        save_dir: Optional[str] = None,
        commit_message: str = "Upload of autogptq_tpu quantized model",
        private: bool = True,
        token: Optional[str] = None,
    ) -> None:
        """Upload a quantized checkpoint to the HF Hub (reference:
        _base.py:424-500). Requires network access + huggingface_hub."""
        import tempfile

        try:
            from huggingface_hub import HfApi
        except ImportError as e:  # pragma: no cover - hub optional
            raise RuntimeError("push_to_hub requires huggingface_hub") from e

        if save_dir is None:
            save_dir = tempfile.mkdtemp(prefix="autogptq_tpu_push_")
            self.save_quantized(save_dir)
        api = HfApi(token=token)
        api.create_repo(repo_id, private=private, exist_ok=True)
        api.upload_folder(
            repo_id=repo_id, folder_path=save_dir, commit_message=commit_message
        )

    # ------------------------------------------------------------------
    # Inference
    # ------------------------------------------------------------------

    def __call__(self, tokens, attn_mask=None):
        return self.forward(tokens, attn_mask)

    def forward(self, tokens, attn_mask=None):
        """Full-sequence forward -> logits [B, T, V] (fp32)."""
        fn = self._jit_cache.get("fwd")
        if fn is None:
            fn = jax.jit(
                lambda p, t, m: arch.forward(
                    p, t, self.cfg, backend=self.backend, attn_mask=m, dtype=self.dtype
                )[0]
            )
            self._jit_cache["fwd"] = fn
        tokens = jnp.asarray(tokens)
        if tokens.ndim == 1:
            tokens = tokens[None]
        mask = None if attn_mask is None else jnp.asarray(attn_mask)
        if mask is None:
            mask = jnp.ones_like(tokens)
        return fn(self.params, tokens, mask)

    def generate(
        self,
        input_ids,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        num_beams: int = 1,
        eos_token_id: Optional[int] = None,
        min_new_tokens: int = 0,
        seed: int = 0,
        pad_token_id: int = 0,
        kv_quant: bool = False,
        length_penalty: float = 1.0,
        early_stopping: bool = False,
        num_return_sequences: int = 1,
        draft_model: Optional["GPTQModel"] = None,
        speculative_gamma: int = 4,
        phased: bool = True,
    ):
        """Generate tokens. Greedy/temperature sampling (num_beams==1) or beam
        search (HF BeamSearchScorer semantics incl. length_penalty /
        early_stopping). ``num_return_sequences`` R > 1 follows the HF
        protocol: top-R beams under beam search, R independent samples under
        temperature sampling (rejected for plain greedy). Returns np.ndarray
        [B * num_return_sequences, T_in + max_new_tokens].

        ``draft_model`` enables speculative decoding (greedy, batch-1):
        token-identical to plain greedy, faster when the draft agrees."""
        from ..utils import generation

        if draft_model is not None:
            if num_beams > 1 or (temperature and temperature > 0):
                raise ValueError("speculative decoding is greedy-only")
            if min_new_tokens or kv_quant or num_return_sequences > 1:
                raise ValueError(
                    "speculative decoding does not support min_new_tokens, "
                    "kv_quant, or num_return_sequences"
                )
            from ..utils.speculative import generate_speculative

            return generate_speculative(
                self, draft_model, input_ids,
                max_new_tokens=max_new_tokens, gamma=speculative_gamma,
                eos_token_id=eos_token_id,
            )
        return generation.generate(
            self,
            input_ids,
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            num_beams=num_beams,
            eos_token_id=eos_token_id,
            min_new_tokens=min_new_tokens,
            seed=seed,
            pad_token_id=pad_token_id,
            kv_quant=kv_quant,
            length_penalty=length_penalty,
            early_stopping=early_stopping,
            num_return_sequences=num_return_sequences,
            phased=phased,
        )


def _convert_awq_tensors(
    model_dir: str, spec: FamilySpec, cfg: ArchConfig, qc: BaseQuantizeConfig
) -> dict[str, np.ndarray]:
    """Load an AWQ-GEMM checkpoint and repack every quantized layer into GPTQ
    layout on the fly (reference: modeling/_base.py:975-1062), caching the
    converted tensors next to the checkpoint."""
    from ..ops import packing

    cache_path, exists = qc.get_cache_file_path(
        quant_method="gptq", checkpoint_format="gptq"
    )
    if exists:
        logger.info("loading cached AWQ->GPTQ conversion from %s", cache_path)
        tensors = dict(hf_io.iter_tensors([cache_path]))
        qc.quant_method = "gptq"
        qc.checkpoint_format = "gptq"
        return tensors

    raw = hf_io.load_tensors(model_dir, qc.model_file_base_name)
    out: dict[str, np.ndarray] = {}
    for name, t in raw.items():
        if name.endswith(".qweight"):
            base = name[: -len(".qweight")]
            conv = packing.awq_to_gptq(
                t, raw[base + ".qzeros"], raw[base + ".scales"], bits=qc.bits
            )
            out[base + ".qweight"] = conv["qweight"]
            out[base + ".qzeros"] = conv["qzeros"]
            out[base + ".scales"] = conv["scales"]
            out[base + ".g_idx"] = conv["g_idx"]
        elif name.endswith((".qzeros", ".scales")) and any(
            name.startswith(p) for p in (spec.layers_prefix,)
        ):
            continue  # handled with qweight
        else:
            out[name] = t
    qc.quant_method = "gptq"
    qc.checkpoint_format = "gptq"
    try:
        hf_io.save_safetensors(out, cache_path)
    except OSError:
        pass
    return out


__all__ = ["GPTQModel"]
