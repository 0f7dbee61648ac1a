"""Continuous-batching inference engine.

Net-new relative to the reference (which has no serving layer; SURVEY.md
§2.3): a slot-based continuous batcher in the vLLM/Orca style, built on the
static-shape JAX decode path:

  * a fixed pool of ``max_slots`` sequence slots shares one preallocated KV
    cache ``[L, slots, max_seq_len, Hkv, D]`` with **per-slot write cursors**
    (arch.attention's vector-``length`` path);
  * incoming requests are prefilled one at a time into a bucket-padded
    prefill cache (bounded number of compilations) and scatter-copied into a
    free slot;
  * every engine step runs ONE jitted decode for all slots; finished
    sequences (EOS / max tokens) free their slot immediately and a queued
    request takes it over — no head-of-line blocking on long generations.

Works with quantized or dense params, single-chip or GSPMD-sharded (shard
the cache batch axis on "dp" / heads on "tp").
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models import arch
from .models.arch import KVCache


@dataclasses.dataclass
class Request:
    req_id: int
    prompt: np.ndarray
    max_new_tokens: int = 128
    eos_token_id: Optional[int] = None


@dataclasses.dataclass
class _SlotState:
    req: Optional[Request] = None
    generated: list = dataclasses.field(default_factory=list)


def _bucket(n: int, buckets=(32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return -(-n // 2048) * 2048


class ContinuousBatchEngine:
    def __init__(
        self,
        model,
        max_slots: int = 4,
        max_seq_len: int = 1024,
        cache_dtype=None,
        kv_quant: bool = False,
    ):
        self.model = model
        self.cfg = model.cfg
        self.max_slots = max_slots
        self.max_seq_len = max_seq_len
        self.kv_quant = kv_quant
        self.cache_dtype = jnp.int8 if kv_quant else (cache_dtype or model.dtype)
        cfg = self.cfg
        shape = (cfg.num_layers, max_slots, max_seq_len, cfg.num_kv_heads, cfg.head_dim)
        self.cache_k = jnp.zeros(shape, self.cache_dtype)
        self.cache_v = jnp.zeros(shape, self.cache_dtype)
        sshape = shape[:-1] + (1,)
        self.cache_ks = jnp.zeros(sshape, jnp.float32) if kv_quant else None
        self.cache_vs = jnp.zeros(sshape, jnp.float32) if kv_quant else None
        self.lengths = jnp.zeros((max_slots,), jnp.int32)
        self.cur_tokens = jnp.zeros((max_slots,), jnp.int32)
        self.slots = [_SlotState() for _ in range(max_slots)]
        self.queue: deque[Request] = deque()
        self.finished: dict[int, np.ndarray] = {}
        self._prefill_fns: dict[int, object] = {}
        self._decode_fn = None

    # ------------------------------------------------------------------

    def submit(self, req: Request) -> None:
        self.queue.append(req)

    def warmup(self, buckets=(32, 64, 128)) -> None:
        """Pre-compile the decode step and the given prefill buckets (the
        reference's triton ``warmup()`` role, qlinear_triton.py:168-215 —
        there it pre-autotunes over M; here it pre-triggers XLA compiles so
        the first real request pays no compilation latency). Engine state is
        untouched: the jitted functions are pure and results are discarded."""
        for b in buckets:
            if b > self.max_seq_len:
                continue
            fn = self._get_prefill_fn(_bucket(b))
            tokens = jnp.zeros((1, _bucket(b)), jnp.int32)
            mask = tokens.at[0, :2].set(1)
            fn(self.model.params, tokens, mask)
        step = self._decode_step_fn()
        step(self.model.params, self.cache_k, self.cache_v,
             self.cache_ks, self.cache_vs, self.lengths, self.cur_tokens)

    def _get_prefill_fn(self, bucket: int):
        fn = self._prefill_fns.get(bucket)
        if fn is None:
            model = self.model

            @jax.jit
            def prefill(params, tokens, mask):
                cache = KVCache.create(
                    self.cfg, 1, bucket, dtype=self.cache_dtype,
                    quantized=self.kv_quant,
                )
                logits, cache = arch.forward(
                    params, tokens, self.cfg, cache=cache,
                    backend=model.backend, attn_mask=mask, dtype=model.dtype,
                    positions=jnp.maximum(jnp.cumsum(mask, -1) - 1, 0),
                    fresh_prefill=True,
                )
                # next token = argmax at the last valid position
                last = jnp.sum(mask, -1) - 1
                nxt = jnp.argmax(logits[jnp.arange(1), last], axis=-1)
                scales = (
                    (cache.k_scale[:, 0], cache.v_scale[:, 0])
                    if self.kv_quant else ()
                )
                return cache.k[:, 0], cache.v[:, 0], nxt.astype(jnp.int32), scales

            self._prefill_fns[bucket] = fn = prefill
        return fn

    def _prefill(self, slot: int, req: Request) -> None:
        p = len(req.prompt)
        bucket = _bucket(p)
        if bucket > self.max_seq_len:
            raise ValueError(f"prompt of {p} tokens exceeds max_seq_len")
        fn = self._get_prefill_fn(bucket)

        tokens = np.zeros((1, bucket), np.int32)
        mask = np.zeros((1, bucket), np.int32)
        tokens[0, :p] = req.prompt  # RIGHT padding: slot cache is contiguous
        mask[0, :p] = 1
        k, v, nxt, scales = fn(self.model.params, jnp.asarray(tokens), jnp.asarray(mask))
        # copy the valid prefix into the engine cache at this slot
        self.cache_k = jax.lax.dynamic_update_slice(
            self.cache_k, k[:, None, :, :, :].astype(self.cache_dtype), (0, slot, 0, 0, 0)
        )
        self.cache_v = jax.lax.dynamic_update_slice(
            self.cache_v, v[:, None, :, :, :].astype(self.cache_dtype), (0, slot, 0, 0, 0)
        )
        if self.kv_quant:
            ks, vs = scales
            self.cache_ks = jax.lax.dynamic_update_slice(
                self.cache_ks, ks[:, None], (0, slot, 0, 0, 0))
            self.cache_vs = jax.lax.dynamic_update_slice(
                self.cache_vs, vs[:, None], (0, slot, 0, 0, 0))
        self.lengths = self.lengths.at[slot].set(p)
        self.cur_tokens = self.cur_tokens.at[slot].set(int(nxt[0]))
        st = self.slots[slot]
        st.req = req
        st.generated = [int(nxt[0])]

    def _admit(self) -> None:
        for slot, st in enumerate(self.slots):
            if st.req is None and self.queue:
                self._prefill(slot, self.queue.popleft())

    def _decode_step_fn(self):
        if self._decode_fn is None:
            model = self.model

            @jax.jit
            def step(params, cache_k, cache_v, cache_ks, cache_vs, lengths, cur_tokens):
                cache = KVCache(
                    k=cache_k, v=cache_v, length=lengths,
                    k_scale=cache_ks, v_scale=cache_vs,
                )
                logits, cache = arch.forward(
                    params, cur_tokens[:, None], self.cfg, cache=cache,
                    backend=model.backend, dtype=model.dtype,
                    positions=lengths[:, None],
                )
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
                return cache.k, cache.v, cache.k_scale, cache.v_scale, cache.length, nxt

            self._decode_fn = step
        return self._decode_fn

    def step(self) -> list[int]:
        """Admit queued requests, run one decode step for all active slots,
        retire finished sequences. Returns req_ids finished this step."""
        self._admit()
        if not any(st.req is not None for st in self.slots):
            return []
        step = self._decode_step_fn()
        (self.cache_k, self.cache_v, self.cache_ks, self.cache_vs,
         self.lengths, nxt) = step(
            self.model.params, self.cache_k, self.cache_v,
            self.cache_ks, self.cache_vs, self.lengths, self.cur_tokens,
        )
        nxt_np = np.asarray(nxt)
        self.cur_tokens = nxt

        done_ids = []
        for slot, st in enumerate(self.slots):
            if st.req is None:
                continue
            st.generated.append(int(nxt_np[slot]))
            req = st.req
            hit_eos = req.eos_token_id is not None and st.generated[-2] == req.eos_token_id
            # note: generated[-1] is the token JUST sampled from the previous
            # token's logits; stop once we have max_new_tokens outputs.
            if hit_eos or len(st.generated) - 1 >= req.max_new_tokens:
                out = st.generated[: req.max_new_tokens]
                if req.eos_token_id is not None and req.eos_token_id in out:
                    out = out[: out.index(req.eos_token_id) + 1]
                self.finished[req.req_id] = np.asarray(out, np.int32)
                done_ids.append(req.req_id)
                st.req = None
                st.generated = []
                self.lengths = self.lengths.at[slot].set(0)
        return done_ids

    def run(self, requests: list[Request]) -> dict[int, np.ndarray]:
        """Convenience: run all requests to completion; returns
        req_id -> generated token array."""
        for r in requests:
            self.submit(r)
        while self.queue or any(st.req is not None for st in self.slots):
            self.step()
        out, self.finished = self.finished, {}
        return out


__all__ = ["ContinuousBatchEngine", "Request"]
