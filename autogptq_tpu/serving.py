"""Continuous-batching inference engine.

Net-new relative to the reference (which has no serving layer; SURVEY.md
§2.3): a slot-based continuous batcher in the vLLM/Orca style, built on the
static-shape JAX decode path:

  * a fixed pool of ``max_slots`` sequence slots shares one preallocated KV
    cache ``[L, slots, max_seq_len, Hkv, D]`` with **per-slot write cursors**
    (arch.attention's vector-``length`` path);
  * short prompts are prefilled into a bucket-padded prefill cache (bounded
    number of compilations) and scatter-copied into a free slot; prompts
    longer than ``prefill_chunk`` are prefilled as **cache-continuation
    chunks** (the ``fresh_prefill=False`` path) directly into the slot's
    cache, ONE chunk per engine step, interleaved with decode — so running
    generations never stall behind a long prompt;
  * every engine step runs ONE jitted decode for all slots with **per-request
    sampling** (temperature / top-p / top-k, per-request seed, EOS masked
    in-graph until ``min_new_tokens``); finished sequences (EOS / max tokens)
    free their slot immediately and a queued request takes it over — no
    head-of-line blocking on long generations.

Works with quantized or dense params; multi-chip via ``parallel.tp.TPModel``
(weights column/row-sharded, engine cache heads sharded on the tp axis, every
prefill/decode step executed under ``jax.shard_map`` so the fused Pallas
kernel runs on local shards).
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models import arch
from .models.arch import KVCache

NEG_INF = -1e30


@dataclasses.dataclass
class Request:
    req_id: int
    prompt: np.ndarray
    max_new_tokens: int = 128
    eos_token_id: Optional[int] = None
    # sampling (HF generate semantics): temperature 0 => greedy;
    # top_p/top_k filter the proposal distribution when temperature > 0
    temperature: float = 0.0
    top_p: float = 1.0
    top_k: int = 0
    seed: int = 0
    min_new_tokens: int = 0


@dataclasses.dataclass
class EngineStats:
    """Host-side serving counters for production observability (the
    reference has no serving layer — net-new; the vLLM-style role). All
    times are HOST-perceived: through an async dispatch path they measure
    dispatch+sync cost per engine step, which is what a deployment's
    request clock sees."""

    steps: int = 0                 # decode steps dispatched
    step_time_s: float = 0.0       # wall time inside step()
    tokens_generated: int = 0      # decode tokens appended to live slots
    prefills: int = 0              # whole prompts ingested
    prefill_tokens: int = 0        # prompt tokens ingested
    requests_completed: int = 0
    preemptions: int = 0           # paged engine: recompute-preempted reqs
    pages_high_water: int = 0      # paged engine: max pages in use at once
    prefix_hit_tokens: int = 0     # paged engine: prompt tokens served from
                                   # the prefix cache (prefill compute skipped)

    def decode_tok_s(self) -> float:
        """Aggregate decode throughput (tokens per second of step() wall)."""
        return self.tokens_generated / self.step_time_s if self.step_time_s else 0.0

    def snapshot(self) -> dict:
        d = dataclasses.asdict(self)
        d["decode_tok_s"] = round(self.decode_tok_s(), 2)
        return d


@dataclasses.dataclass
class _SlotState:
    req: Optional[Request] = None
    generated: list = dataclasses.field(default_factory=list)
    pf_pos: int = 0          # chunked prefill: prompt tokens consumed so far
    prefilling: bool = False


def _bucket(n: int, buckets=(32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return -(-n // 2048) * 2048


def _sample_tokens(logits, temps, top_ps, top_ks, seeds, steps, eos_ids, min_left):
    """Per-row sampling [B, V] -> [B] int32.

    Greedy rows (temperature == 0) take argmax; sampling rows draw from the
    temperature-scaled distribution restricted to the top-p nucleus and/or
    top-k set (computed in the sorted domain, so no unsort scatter is
    needed). EOS is masked to -inf while the row still owes min_new_tokens.
    Keys derive from (per-request seed, tokens generated so far), so a
    request's stream is reproducible regardless of co-scheduled traffic."""
    b, v = logits.shape
    logits = logits.astype(jnp.float32)
    # EOS suppression until min_new_tokens (reference benchmark protocol:
    # MinNewTokensLengthLogitsProcessor)
    suppress = (min_left > 0)[:, None] & (
        jnp.arange(v)[None, :] == eos_ids[:, None]
    )
    logits = jnp.where(suppress, NEG_INF, logits)

    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
    order = jnp.argsort(-scaled, axis=-1)
    sl = jnp.take_along_axis(scaled, order, axis=-1)
    # HF warper order: top-k first, then top-p over the RENORMALIZED
    # remaining distribution (TopKLogitsWarper -> TopPLogitsWarper)
    k_eff = jnp.where(top_ks > 0, top_ks, v)
    keep = jnp.arange(v)[None, :] < k_eff[:, None]
    sl_k = jnp.where(keep, sl, NEG_INF)
    probs = jax.nn.softmax(sl_k, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # nucleus: keep the smallest prefix whose mass reaches top_p (the first
    # token crossing the threshold stays in)
    keep &= (cum - probs) < top_ps[:, None]
    slf = jnp.where(keep, sl_k, NEG_INF)

    def draw(seed, step, row):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        return jax.random.categorical(key, row)

    sampled_pos = jax.vmap(draw)(seeds, steps, slf)
    sampled = jnp.take_along_axis(
        order, sampled_pos[:, None], axis=-1
    )[:, 0].astype(jnp.int32)
    return jnp.where(temps > 0.0, sampled, greedy)


def _greedy_tokens(logits, eos_ids, min_left):
    v = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    suppress = (min_left > 0)[:, None] & (
        jnp.arange(v)[None, :] == eos_ids[:, None]
    )
    return jnp.argmax(jnp.where(suppress, NEG_INF, logits), axis=-1).astype(jnp.int32)


class ContinuousBatchEngine:
    def __init__(
        self,
        model,
        max_slots: int = 4,
        max_seq_len: int = 1024,
        cache_dtype=None,
        kv_quant: bool = False,
        prefill_chunk: Optional[int] = 512,
        on_token=None,
        draft_model=None,
        spec_gamma: int = 4,
        decode_block: int = 1,
    ):
        # on_token(req_id, token_id): streaming callback, invoked for every
        # generated token as soon as its engine step retires (host-side)
        self.on_token = on_token
        self.model = model
        self.cfg = model.cfg
        # TPModel (parallel/tp.py): run prefill/decode under shard_map with
        # the local cfg; engine cache lives as GLOBAL arrays with kv heads
        # sharded on the tp axis.
        self.is_tp = bool(getattr(model, "is_tp", False))
        if self.is_tp and getattr(model.cfg, "attn_variant", None) == "mla":
            # MLA latent caches have a size-1 head axis; _hspec shards cache
            # axis 3 on tp, which would fail with an opaque
            # sharding-divisibility error. Refuse clearly instead.
            raise NotImplementedError(
                "ContinuousBatchEngine does not support tensor-parallel MLA "
                "models (latent cache has no shardable head axis); use tp=1"
            )
        self._fwd_cfg = model.lcfg if self.is_tp else model.cfg
        self.max_slots = max_slots
        self.max_seq_len = max_seq_len
        self.kv_quant = kv_quant
        self.prefill_chunk = prefill_chunk
        self.cache_dtype = jnp.int8 if kv_quant else (cache_dtype or model.dtype)
        cfg = self.cfg
        kshape, vshape = arch.cache_shapes(cfg, max_slots, max_seq_len)
        self.cache_k = jnp.zeros(kshape, self.cache_dtype)
        self.cache_v = jnp.zeros(vshape, self.cache_dtype)
        self.cache_ks = jnp.zeros(kshape[:-1] + (1,), jnp.float32) if kv_quant else None
        self.cache_vs = jnp.zeros(vshape[:-1] + (1,), jnp.float32) if kv_quant else None
        if self.is_tp:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._hspec = P(None, None, None, model.axis, None)

            def put(arr):
                return (
                    None if arr is None
                    else jax.device_put(arr, NamedSharding(model.mesh, self._hspec))
                )

            self.cache_k, self.cache_v = put(self.cache_k), put(self.cache_v)
            self.cache_ks, self.cache_vs = put(self.cache_ks), put(self.cache_vs)
        # host-side cursor mirrors: positions and current tokens are always
        # host-known (prompt + generated so far), so keeping them in numpy
        # avoids two device->host syncs per decode step — through the axon
        # tunnel each sync costs ~30 ms, and even on a local chip it
        # serializes dispatch
        self.lengths = np.zeros((max_slots,), np.int32)
        self.cur_tokens = np.zeros((max_slots,), np.int32)
        # per-slot sampling state (numpy host-side; shipped to the decode fn)
        self._temps = np.zeros((max_slots,), np.float32)
        self._top_ps = np.ones((max_slots,), np.float32)
        self._top_ks = np.zeros((max_slots,), np.int32)
        self._seeds = np.zeros((max_slots,), np.int32)
        self._eos = np.full((max_slots,), -1, np.int32)
        self._min_new = np.zeros((max_slots,), np.int32)
        self.slots = [_SlotState() for _ in range(max_slots)]
        self.queue: deque[Request] = deque()
        self.finished: dict[int, np.ndarray] = {}
        self.stats = EngineStats()
        # decode_block > 1: run that many decode steps per jitted call when
        # every active slot is in pure decode (multi-step scheduling) — one
        # host sync per block. Token streams are unchanged; a request may
        # retire up to decode_block-1 device steps late (work discarded).
        if not 1 <= decode_block < max_seq_len:
            raise ValueError("decode_block must be in [1, max_seq_len)")
        self.decode_block = decode_block
        self._prefill_fns: dict[int, object] = {}
        self._decode_fns: dict[bool, object] = {}
        self._block_fns: dict = {}
        self._chunk_fns = {}
        self._pf_rr = 0  # round-robin over mid-prefill slots
        # -- speculative decoding (draft model proposes spec_gamma tokens
        # per engine step; ONE target forward verifies them — greedy slots
        # emit the exact target stream, see utils/speculative.py for the
        # single-sequence variant). Engages only when every active slot is
        # greedy with min_new satisfied and nothing is mid-prefill;
        # otherwise the plain one-token step runs.
        self.draft = draft_model
        self.spec_gamma = spec_gamma
        self._spec_fns: dict = {}
        self._draft_prefill_fns: dict[int, object] = {}
        if draft_model is not None:
            if self.is_tp:
                raise NotImplementedError(
                    "speculative serving requires an unsharded target (tp=1)")
            if "mla" in (getattr(model.cfg, "attn_variant", None),
                         getattr(draft_model.cfg, "attn_variant", None)):
                # _mla_attention_cached's vector-cursor path is T == 1 only
                # (the latent write/mask are single-token); the g+1-token
                # verify window would silently corrupt the latent cache
                raise NotImplementedError(
                    "speculative serving does not support MLA models")
            if model.cfg.vocab_size != draft_model.cfg.vocab_size:
                raise ValueError(
                    "draft and target models must share a vocabulary")
            dk, dv = arch.cache_shapes(draft_model.cfg, max_slots, max_seq_len)
            self.d_cache_k = jnp.zeros(dk, draft_model.dtype)
            self.d_cache_v = jnp.zeros(dv, draft_model.dtype)

    # ------------------------------------------------------------------

    def submit(self, req: Request) -> None:
        # prompt + generation must fit the slot cache: out-of-bounds cache
        # scatters are silently DROPPED by JAX, so an oversized request
        # would corrupt its own attention rather than error
        need = len(req.prompt) + req.max_new_tokens
        chunked = (self.prefill_chunk is not None
                   and len(req.prompt) > self.prefill_chunk)
        limit = self.max_seq_len - (1 if chunked else 0)
        if need > limit:
            raise ValueError(
                f"request {req.req_id}: prompt ({len(req.prompt)}) + "
                f"max_new_tokens ({req.max_new_tokens}) exceeds "
                f"max_seq_len {self.max_seq_len}"
            )
        if not chunked and _bucket(len(req.prompt)) > self.max_seq_len:
            # whole-prompt prefill pads to a power-of-two-ish bucket; a
            # bucket beyond the cache would fail at admission mid-run
            raise ValueError(
                f"request {req.req_id}: prompt length {len(req.prompt)} "
                f"rounds to prefill bucket {_bucket(len(req.prompt))} > "
                f"max_seq_len {self.max_seq_len}; use a prefill_chunk <= "
                f"{len(req.prompt) - 1} or a larger max_seq_len"
            )
        self.queue.append(req)

    def cancel(self, req_id: int) -> bool:
        """Cancel a queued or running request. Running requests free their
        slot immediately (partial output is recorded in ``finished``).
        Returns True if the request was found."""
        for i, r in enumerate(self.queue):
            if r.req_id == req_id:
                del self.queue[i]
                self.finished[req_id] = np.zeros((0,), np.int32)
                return True
        for slot, st in enumerate(self.slots):
            if st.req is not None and st.req.req_id == req_id:
                self.finished[req_id] = np.asarray(st.generated, np.int32)
                st.req = None
                st.generated = []
                st.prefilling = False
                self._temps[slot] = 0.0
                self._eos[slot] = -1
                self._min_new[slot] = 0
                self.lengths[slot] = 0
                return True
        return False

    def warmup(self, buckets=None, sampling: bool = True) -> None:
        """Pre-compile the decode steps (greedy + sampling), the chunked-
        prefill fn, and the prefill buckets (the reference's triton
        ``warmup()`` role, qlinear_triton.py:168-215 — there it pre-autotunes
        over M; here it pre-triggers XLA compiles so the first real request
        pays no compilation latency). ``buckets=None`` warms EVERY window
        this engine can request at runtime — all power-of-two-ish buckets
        below ``max_seq_len`` — so no jit compile ever fires mid-serving;
        pass an explicit tuple to warm fewer (sequences growing past the
        largest warmed bucket then compile on first use). Engine state is
        untouched: the jitted functions are pure and results are
        discarded."""
        if buckets is None:
            buckets = sorted({_bucket(n) for n in range(1, self.max_seq_len + 1)
                              if _bucket(n) <= self.max_seq_len})
        for b in buckets:
            if b > self.max_seq_len:
                continue
            fn = self._get_prefill_fn(_bucket(b))
            tokens = jnp.zeros((1, _bucket(b)), jnp.int32)
            mask = tokens.at[0, :2].set(1)
            fn(self.model.params, tokens, mask)
        variants = (False, True) if sampling else (False,)
        # decode windows start at the smallest bucket and grow with the
        # live sequences; precompile each requested bucket plus full-cache
        wins = sorted({
            _bucket(b) for b in buckets if _bucket(b) < self.max_seq_len
        }) + [None]
        if self.prefill_chunk is not None and self.prefill_chunk < self.max_seq_len:
            # _run_chunk requests win=_bucket(start+chunk) as the cursor
            # advances — warm the same window set it can actually hit
            for w in wins:
                if w is not None and w < self.prefill_chunk:
                    continue
                cfn = self._get_chunk_fn(w)
                cfn(self.model.params, self.cache_k, self.cache_v,
                    self.cache_ks, self.cache_vs,
                    jnp.zeros((1, self.prefill_chunk), jnp.int32),
                    jnp.int32(self.prefill_chunk), jnp.int32(0), jnp.int32(0))
        for s in variants:
            for w in wins:
                step = self._decode_step_fn(sampling=s, win=w)
                args = [self.model.params, self.cache_k, self.cache_v,
                        self.cache_ks, self.cache_vs, self.lengths, self.cur_tokens,
                        jnp.asarray(self._eos), jnp.zeros((self.max_slots,), jnp.int32)]
                if s:
                    args += [jnp.asarray(self._temps), jnp.asarray(self._top_ps),
                             jnp.asarray(self._top_ks), jnp.asarray(self._seeds),
                             jnp.zeros((self.max_slots,), jnp.int32)]
                step(*args)
        if self.decode_block > 1:
            # block windows are bucketed over need + decode_block, so the
            # reachable set equals the step set (bucket is monotone) minus
            # windows the headroom guard can never request
            n = self.decode_block
            bwins = sorted({
                _bucket(need + n)
                for need in range(1, self.max_seq_len - n + 1)
                if _bucket(need + n) < self.max_seq_len
            }) + [None]
            for s in variants:
                for w in bwins:
                    fn = self._decode_block_fn(sampling=s, win=w, nsteps=n)
                    args = [self.model.params, self.cache_k, self.cache_v,
                            self.cache_ks, self.cache_vs, self.lengths,
                            self.cur_tokens, jnp.asarray(self._eos),
                            jnp.zeros((self.max_slots,), jnp.int32)]
                    if s:
                        args += [jnp.asarray(self._temps),
                                 jnp.asarray(self._top_ps),
                                 jnp.asarray(self._top_ks),
                                 jnp.asarray(self._seeds),
                                 jnp.zeros((self.max_slots,), jnp.int32)]
                    fn(*args)
        if self.draft is not None:
            # speculative variants: draft prefill buckets + the spec step
            # for every reachable window bucket (the first spec request
            # must not stall for a compile either)
            for b in buckets:
                db = _bucket(b)
                if db > self.max_seq_len:
                    continue
                dfn = self._get_draft_prefill_fn(db)
                tokens = jnp.zeros((1, db), jnp.int32)
                dfn(self.draft.params, tokens, tokens.at[0, :2].set(1))
            g1 = self.spec_gamma + 1
            spec_wins = sorted({
                w for w in (_bucket(n + g1)
                            for n in range(1, self.max_seq_len + 1))
                if w < self.max_seq_len
            }) + [None]
            zeros = jnp.zeros((self.max_slots,), jnp.int32)
            for w in spec_wins:
                sfn = self._get_spec_fn(w)
                sfn(self.model.params, self.draft.params,
                    self.cache_k, self.cache_v, self.cache_ks, self.cache_vs,
                    self.d_cache_k, self.d_cache_v, zeros, zeros)

    # -- whole-prompt (bucketed) prefill --------------------------------

    def _get_prefill_fn(self, bucket: int):
        fn = self._prefill_fns.get(bucket)
        if fn is None:
            model = self.model
            fcfg = self._fwd_cfg

            def prefill(params, tokens, mask):
                cache = KVCache.create(
                    fcfg, 1, bucket, dtype=self.cache_dtype,
                    quantized=self.kv_quant,
                )
                logits, cache = arch.forward(
                    params, tokens, fcfg, cache=cache,
                    backend=model.backend, attn_mask=mask, dtype=model.dtype,
                    positions=jnp.maximum(jnp.cumsum(mask, -1) - 1, 0),
                    fresh_prefill=True,
                )
                # logits at the last valid position (sampling happens host
                # side with the request's own params)
                last = jnp.sum(mask, -1) - 1
                lrow = logits[jnp.arange(1), last]
                scales = (
                    (cache.k_scale[:, 0], cache.v_scale[:, 0])
                    if self.kv_quant else ()
                )
                return cache.k[:, 0], cache.v[:, 0], lrow, scales

            if self.is_tp:
                from jax.sharding import PartitionSpec as P

                m = self.model
                kv_spec = P(None, None, m.axis, None)  # [L, S, Hkv, D]
                fn = jax.jit(jax.shard_map(
                    prefill, mesh=m.mesh,
                    in_specs=(m.specs, P(), P()),
                    out_specs=(
                        kv_spec, kv_spec, P(),
                        (kv_spec, kv_spec) if self.kv_quant else (),
                    ),
                    check_vma=False,
                ))
            else:
                fn = jax.jit(prefill)
            self._prefill_fns[bucket] = fn
        return fn

    def _first_token(self, req: Request, logits_row) -> int:
        """Sample the first generated token from the prefill logits with the
        request's sampling params (token index 0 keys the rng stream)."""
        tok = _sample_tokens(
            jnp.reshape(logits_row, (1, -1)),
            jnp.asarray([req.temperature], jnp.float32),
            jnp.asarray([req.top_p], jnp.float32),
            jnp.asarray([req.top_k], jnp.int32),
            jnp.asarray([req.seed], jnp.int32),
            jnp.asarray([0], jnp.int32),
            jnp.asarray([-1 if req.eos_token_id is None else req.eos_token_id],
                        jnp.int32),
            jnp.asarray([req.min_new_tokens], jnp.int32),
        )
        return int(tok[0])

    def _bind_slot(self, slot: int, req: Request, first_tok: int, length: int) -> None:
        self.lengths[slot] = length
        self.cur_tokens[slot] = first_tok
        self._temps[slot] = req.temperature
        self._top_ps[slot] = req.top_p
        self._top_ks[slot] = req.top_k
        self._seeds[slot] = req.seed
        self._eos[slot] = -1 if req.eos_token_id is None else req.eos_token_id
        self._min_new[slot] = req.min_new_tokens
        st = self.slots[slot]
        st.req = req
        st.generated = [first_tok]
        st.prefilling = False
        if self.draft is not None:
            self._draft_prefill(slot, req.prompt)
        if self.on_token is not None:
            self.on_token(req.req_id, first_tok)

    def _get_draft_prefill_fn(self, bucket: int):
        fn = self._draft_prefill_fns.get(bucket)
        if fn is None:
            dm = self.draft
            dcfg = dm.cfg

            def prefill(params, tokens, mask):
                cache = KVCache.create(dcfg, 1, bucket, dtype=dm.dtype)
                _, cache = arch.forward(
                    params, tokens, dcfg, cache=cache,
                    backend=dm.backend, attn_mask=mask, dtype=dm.dtype,
                    positions=jnp.maximum(jnp.cumsum(mask, -1) - 1, 0),
                    fresh_prefill=True,
                )
                return cache.k[:, 0], cache.v[:, 0]

            self._draft_prefill_fns[bucket] = fn = jax.jit(prefill)
        return fn

    def _draft_prefill(self, slot: int, prompt) -> None:
        """Fill the DRAFT cache with the slot's prompt (whole-prompt bucket
        even when the target prefills chunked — the draft is small). The
        draft cursor is shared with the target (self.lengths)."""
        p = len(prompt)
        bucket = _bucket(p)
        fn = self._get_draft_prefill_fn(bucket)
        tokens = np.zeros((1, bucket), np.int32)
        mask = np.zeros((1, bucket), np.int32)
        tokens[0, :p] = prompt
        mask[0, :p] = 1
        k, v = fn(self.draft.params, jnp.asarray(tokens), jnp.asarray(mask))
        # a chunk-admitted prompt's bucket can EXCEED max_seq_len (e.g.
        # p=1300 -> bucket 2048 at max_seq_len 1536); rows past the cache
        # are bucket padding (p < max_seq_len is guaranteed by admission),
        # so clip instead of letting dynamic_update_slice throw
        rows = min(k.shape[1], self.max_seq_len)
        k, v = k[:, :rows], v[:, :rows]
        self.d_cache_k = jax.lax.dynamic_update_slice(
            self.d_cache_k, k[:, None].astype(self.d_cache_k.dtype),
            (0, slot, 0, 0, 0))
        self.d_cache_v = jax.lax.dynamic_update_slice(
            self.d_cache_v, v[:, None].astype(self.d_cache_v.dtype),
            (0, slot, 0, 0, 0))

    def _prefill(self, slot: int, req: Request) -> None:
        p = len(req.prompt)
        self.stats.prefills += 1
        self.stats.prefill_tokens += p
        bucket = _bucket(p)
        if bucket > self.max_seq_len:
            raise ValueError(f"prompt of {p} tokens exceeds max_seq_len")
        fn = self._get_prefill_fn(bucket)

        tokens = np.zeros((1, bucket), np.int32)
        mask = np.zeros((1, bucket), np.int32)
        tokens[0, :p] = req.prompt  # RIGHT padding: slot cache is contiguous
        mask[0, :p] = 1
        k, v, lrow, scales = fn(self.model.params, jnp.asarray(tokens), jnp.asarray(mask))
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
        self._bind_slot(slot, req, self._first_token(req, lrow), p)

    # -- chunked (cache-continuation) prefill ---------------------------

    def _get_chunk_fn(self, win: int | None = None):
        """One jitted function per attention window, reused for every chunk:
        forwards a [1, C] token chunk against slot ``slot``'s cache
        continuation at offset ``start`` (the ``fresh_prefill=False`` path)
        and writes the new K/V span back into the engine cache. ``win``
        statically bounds the attended/written prefix (the chunk at offset
        ``start`` only needs ``start + C`` positions — attending the whole
        padded S axis wastes KV bandwidth during long-prompt ingest)."""
        fn = self._chunk_fns.get(win)
        if fn is None:
            model = self.model
            fcfg = self._fwd_cfg
            C = self.prefill_chunk

            def chunk(params, cache_k, cache_v, cache_ks, cache_vs,
                      tokens, valid, start, slot):
                full = (cache_k, cache_v, cache_ks, cache_vs)
                if win is not None:
                    wsl = lambda a: None if a is None else jax.lax.slice_in_dim(a, 0, win, axis=2)
                    cache_k, cache_v = wsl(cache_k), wsl(cache_v)
                    cache_ks, cache_vs = wsl(cache_ks), wsl(cache_vs)
                # slice this slot's cache: [L, 1, S(win), Hkv, D]
                def take(a):
                    return None if a is None else jax.lax.dynamic_slice_in_dim(
                        a, slot, 1, axis=1)

                cache = KVCache(
                    k=take(cache_k), v=take(cache_v), length=start,
                    k_scale=take(cache_ks), v_scale=take(cache_vs),
                )
                s_tot = cache_k.shape[2]
                # key-side validity: everything before start+valid is real
                attn_mask = (
                    jnp.arange(s_tot)[None, :] < start + valid
                ).astype(jnp.int32)
                positions = start + jnp.arange(C, dtype=jnp.int32)[None, :]
                logits, cache = arch.forward(
                    params, tokens, fcfg, cache=cache,
                    backend=model.backend, attn_mask=attn_mask,
                    dtype=model.dtype, positions=positions,
                )
                # write the slot's cache back (padded tail rows hold garbage;
                # they sit at positions >= start+valid, which are (a)
                # overwritten by the next chunk / the decode loop before
                # becoming attendable and (b) masked until then)
                def put(dst, src):
                    return jax.lax.dynamic_update_slice(
                        dst, src, (0, slot, 0, 0, 0))

                cache_k = put(full[0] if win is not None else cache_k, cache.k)
                cache_v = put(full[1] if win is not None else cache_v, cache.v)
                if self.kv_quant:
                    cache_ks = put(full[2] if win is not None else cache_ks, cache.k_scale)
                    cache_vs = put(full[3] if win is not None else cache_vs, cache.v_scale)
                else:
                    cache_ks, cache_vs = full[2], full[3]
                lrow = logits[0, valid - 1]
                return cache_k, cache_v, cache_ks, cache_vs, lrow

            if self.is_tp:
                from jax.sharding import PartitionSpec as P

                m = self.model
                h = self._hspec
                sc = h if self.kv_quant else P()
                fn = jax.jit(jax.shard_map(
                    chunk, mesh=m.mesh,
                    in_specs=(m.specs, h, h, sc, sc, P(), P(), P(), P()),
                    out_specs=(h, h, sc, sc, P()),
                    check_vma=False,
                ))
            else:
                fn = jax.jit(chunk)
            self._chunk_fns[win] = fn
        return fn

    def _start_chunked(self, slot: int, req: Request) -> None:
        p = len(req.prompt)
        self.stats.prefills += 1
        self.stats.prefill_tokens += p
        if p + req.max_new_tokens > self.max_seq_len - 1:
            raise ValueError(
                f"chunked request needs prompt+max_new_tokens <= "
                f"max_seq_len-1 ({p}+{req.max_new_tokens} > {self.max_seq_len - 1})"
            )
        st = self.slots[slot]
        st.req = req
        st.prefilling = True
        st.pf_pos = 0
        st.generated = []
        # park the decode write cursor on the reserved scratch cell: decode
        # steps taken while this slot is mid-prefill write their garbage
        # there (masked from attention by every live sequence's causal mask)
        self.lengths[slot] = self.max_seq_len - 1

    def _run_chunk(self, slot: int) -> None:
        st = self.slots[slot]
        req = st.req
        C = self.prefill_chunk
        p = len(req.prompt)
        # Ragged final chunk: REALIGN backward to [p-C, p) instead of
        # zero-padding past p — a padded write span start+C could exceed
        # max_seq_len, and dynamic_update_slice would CLAMP the start,
        # silently shifting the chunk over valid earlier entries. The
        # overlapping region re-computes identical K/V (same tokens, same
        # positions, same cache prefix), so the rewrite is a no-op.
        start = st.pf_pos if p - st.pf_pos >= C else max(p - C, 0)
        valid = min(C, p - start)
        chunk = np.zeros((1, C), np.int32)
        chunk[0, :valid] = req.prompt[start:start + valid]
        win = _bucket(start + C)
        if win >= self.max_seq_len:
            win = None
        fn = self._get_chunk_fn(win)
        (self.cache_k, self.cache_v, ks, vs, lrow) = fn(
            self.model.params, self.cache_k, self.cache_v,
            self.cache_ks, self.cache_vs,
            jnp.asarray(chunk), jnp.int32(valid), jnp.int32(start),
            jnp.int32(slot),
        )
        if self.kv_quant:
            self.cache_ks, self.cache_vs = ks, vs
        st.pf_pos = start + valid
        if st.pf_pos >= p:
            self._bind_slot(slot, req, self._first_token(req, lrow), p)

    def _admit(self) -> None:
        for slot, st in enumerate(self.slots):
            if st.req is None and self.queue:
                req = self.queue.popleft()
                if (
                    self.prefill_chunk is not None
                    and len(req.prompt) > self.prefill_chunk
                ):
                    self._start_chunked(slot, req)
                else:
                    self._prefill(slot, req)

    # -- decode ---------------------------------------------------------

    def _decode_step_fn(self, sampling: bool, win: int | None = None):
        fn = self._decode_fns.get((sampling, win))
        if fn is None:
            model = self.model
            fcfg = self._fwd_cfg

            def step(params, cache_k, cache_v, cache_ks, cache_vs, lengths,
                     cur_tokens, eos_ids, min_left, *samp):
                # Window-bucketed decode: attend over a static prefix of the
                # cache that covers every ACTIVE cursor (win is bucketed so
                # recompiles are rare). The decode attention reads the whole
                # padded S axis each step under jit; at batch 8 that KV
                # traffic rivals the weights — slicing to the live window
                # removes most of it. Parked mid-prefill cursors
                # (max_seq_len - 1) fall outside the window and their
                # writes are DROPPED (arch.attention scatter mode="drop").
                full = (cache_k, cache_v, cache_ks, cache_vs)
                if win is not None:
                    sl = lambda a: None if a is None else jax.lax.slice_in_dim(a, 0, win, axis=2)
                    cache_k, cache_v = sl(cache_k), sl(cache_v)
                    cache_ks, cache_vs = sl(cache_ks), sl(cache_vs)
                cache = KVCache(
                    k=cache_k, v=cache_v, length=lengths,
                    k_scale=cache_ks, v_scale=cache_vs,
                )
                logits, cache = arch.forward(
                    params, cur_tokens[:, None], fcfg, cache=cache,
                    backend=model.backend, dtype=model.dtype,
                    positions=lengths[:, None],
                )
                ck, cv = cache.k, cache.v
                cks, cvs = cache.k_scale, cache.v_scale
                if win is not None:
                    zero = (0,) * 5
                    upd = lambda f, p: None if p is None else jax.lax.dynamic_update_slice(f, p, zero)
                    ck, cv = upd(full[0], ck), upd(full[1], cv)
                    cks, cvs = upd(full[2], cks), upd(full[3], cvs)
                lrow = logits[:, -1, :]
                if sampling:
                    temps, top_ps, top_ks, seeds, steps = samp
                    nxt = _sample_tokens(
                        lrow, temps, top_ps, top_ks, seeds, steps,
                        eos_ids, min_left,
                    )
                else:
                    nxt = _greedy_tokens(lrow, eos_ids, min_left)
                return ck, cv, cks, cvs, cache.length, nxt

            if self.is_tp:
                from jax.sharding import PartitionSpec as P

                m = self.model
                h = self._hspec
                sc = h if self.kv_quant else P()  # None args carry no leaves
                n_extra = 7 if sampling else 2
                fn = jax.jit(jax.shard_map(
                    step, mesh=m.mesh,
                    in_specs=(m.specs, h, h, sc, sc, P(), P()) + (P(),) * n_extra,
                    out_specs=(h, h, sc, sc, P(), P()),
                    check_vma=False,
                ))
            else:
                fn = jax.jit(step)
            self._decode_fns[(sampling, win)] = fn
        return fn

    def _decode_block_fn(self, sampling: bool, win: int | None, nsteps: int):
        """``nsteps`` decode steps in ONE jitted scan (vLLM-style multi-step
        scheduling): the engine syncs sampled tokens to the host once per
        BLOCK instead of once per step, amortizing the per-dispatch latency
        (~30 ms through the axon tunnel; dispatch+sync overhead exists on
        local chips too). Streams are token-identical to the one-step path:
        sampling keys fold (seed, token_index) so they are step-count
        independent, and min_new EOS suppression decrements in-graph exactly
        as the host would. A slot that retires mid-block keeps decoding
        garbage until the block ends; the host discards those tokens at
        emission (same replay contract as the speculative step)."""
        key = (sampling, win, nsteps)
        fn = self._block_fns.get(key)
        if fn is None:
            model = self.model
            fcfg = self._fwd_cfg

            def block(params, cache_k, cache_v, cache_ks, cache_vs, lengths,
                      cur_tokens, eos_ids, min_left, *samp):
                if sampling:
                    temps, top_ps, top_ks, seeds, steps0 = samp
                full = (cache_k, cache_v, cache_ks, cache_vs)
                if win is not None:
                    sl = lambda a: None if a is None else jax.lax.slice_in_dim(a, 0, win, axis=2)
                    cache_k, cache_v = sl(cache_k), sl(cache_v)
                    cache_ks, cache_vs = sl(cache_ks), sl(cache_vs)

                def body(carry, j):
                    ck, cv, cks, cvs, ln, cur, ml = carry
                    cache = KVCache(
                        k=ck, v=cv, length=ln, k_scale=cks, v_scale=cvs)
                    logits, cache = arch.forward(
                        params, cur[:, None], fcfg, cache=cache,
                        backend=model.backend, dtype=model.dtype,
                        positions=ln[:, None],
                    )
                    lrow = logits[:, -1, :]
                    if sampling:
                        nxt = _sample_tokens(
                            lrow, temps, top_ps, top_ks, seeds, steps0 + j,
                            eos_ids, ml,
                        )
                    else:
                        nxt = _greedy_tokens(lrow, eos_ids, ml)
                    return (cache.k, cache.v, cache.k_scale, cache.v_scale,
                            cache.length, nxt, jnp.maximum(ml - 1, 0)), nxt

                carry = (cache_k, cache_v, cache_ks, cache_vs,
                         lengths, cur_tokens, min_left)
                carry, toks = jax.lax.scan(
                    body, carry, jnp.arange(nsteps, dtype=jnp.int32))
                ck, cv, cks, cvs = carry[:4]
                if win is not None:
                    zero = (0,) * 5
                    upd = lambda f, p: None if p is None else jax.lax.dynamic_update_slice(f, p, zero)
                    ck, cv = upd(full[0], ck), upd(full[1], cv)
                    cks, cvs = upd(full[2], cks), upd(full[3], cvs)
                return ck, cv, cks, cvs, toks          # toks [nsteps, B]

            if self.is_tp:
                from jax.sharding import PartitionSpec as P

                m = self.model
                h = self._hspec
                sc = h if self.kv_quant else P()
                n_extra = 7 if sampling else 2
                fn = jax.jit(jax.shard_map(
                    block, mesh=m.mesh,
                    in_specs=(m.specs, h, h, sc, sc, P(), P()) + (P(),) * n_extra,
                    out_specs=(h, h, sc, sc, P()),
                    check_vma=False,
                ))
            else:
                fn = jax.jit(block)
            self._block_fns[key] = fn
        return fn

    def _block_step(self, active, sampling: bool, need: int) -> list[int]:
        """Run one decode BLOCK (decode_block steps, one host sync)."""
        n = self.decode_block
        win = _bucket(need + n)
        if win >= self.max_seq_len:
            win = None
        fn = self._decode_block_fn(sampling, win, n)
        min_left = np.array([
            max(0, self._min_new[i] - len(st.generated))
            for i, st in enumerate(self.slots)
        ], np.int32)
        args = [
            self.model.params, self.cache_k, self.cache_v,
            self.cache_ks, self.cache_vs, self.lengths, self.cur_tokens,
            jnp.asarray(self._eos), jnp.asarray(min_left),
        ]
        if sampling:
            steps = np.array(
                [len(st.generated) for st in self.slots], np.int32)
            args += [
                jnp.asarray(self._temps), jnp.asarray(self._top_ps),
                jnp.asarray(self._top_ks), jnp.asarray(self._seeds),
                jnp.asarray(steps),
            ]
        t0 = time.perf_counter()
        (self.cache_k, self.cache_v, self.cache_ks, self.cache_vs,
         toks) = fn(*args)
        toks_np = np.asarray(toks)               # ONE sync for n steps
        self.stats.steps += n
        self.stats.step_time_s += time.perf_counter() - t0

        # device cursors advanced by n for every row; mirror, then fix up
        self.lengths += n
        done_ids = []
        for slot, st in enumerate(self.slots):
            if not active[slot]:
                continue
            rid = st.req.req_id
            appended = 0
            retired = False
            for j in range(n):
                appended += 1
                if self._append_token(slot, int(toks_np[j, slot])):
                    done_ids.append(rid)
                    self.lengths[slot] = 0
                    retired = True
                    break
            self.stats.tokens_generated += appended
            if not retired:
                self.cur_tokens[slot] = int(toks_np[n - 1, slot])
        self.stats.requests_completed += len(done_ids)
        return done_ids

    def _get_spec_fn(self, win: int | None = None):
        """One jitted speculative step for ALL slots: a spec_gamma-step
        draft scan (vector cursors) proposes tokens, ONE target forward
        over each slot's [cur, d_1..d_g] window verifies them (the
        multi-token vector-cursor write path in arch.attention). Greedy
        acceptance: longest draft prefix matching the target argmax, plus
        the target's correction/bonus token — the emitted stream is
        token-identical to the plain one-token step."""
        fn = self._spec_fns.get(win)
        if fn is None:
            model = self.model
            dm = self.draft
            fcfg = self._fwd_cfg
            dcfg = dm.cfg
            g = self.spec_gamma
            g1 = g + 1

            def spec(t_params, d_params, t_ck, t_cv, t_cks, t_cvs,
                     d_ck, d_cv, lengths, cur):
                # window-bucketed like the plain decode step: attend (and
                # write) only a static cache prefix covering every cursor
                # plus the g+1-token verify span
                full_t = (t_ck, t_cv, t_cks, t_cvs)
                full_d = (d_ck, d_cv)
                if win is not None:
                    sl = lambda a: None if a is None else jax.lax.slice_in_dim(a, 0, win, axis=2)
                    t_ck, t_cv = sl(t_ck), sl(t_cv)
                    t_cks, t_cvs = sl(t_cks), sl(t_cvs)
                    d_ck, d_cv = sl(d_ck), sl(d_cv)
                dcache = KVCache(k=d_ck, v=d_cv, length=lengths,
                                 k_scale=None, v_scale=None)

                def d_step(carry, _):
                    dc, tok = carry
                    lg, dc = arch.forward(
                        d_params, tok[:, None], dcfg, cache=dc,
                        backend=dm.backend, dtype=dm.dtype,
                    )
                    nxt = jnp.argmax(lg[:, -1, :], axis=-1).astype(jnp.int32)
                    return (dc, nxt), nxt

                # g+1 draft steps: the last token is discarded (the target
                # supplies the bonus/correction) but its forward writes the
                # draft K/V row needed after a full acceptance
                (dcache, _), drafts = jax.lax.scan(
                    d_step, (dcache, cur), None, length=g1)
                drafts = drafts[:g]                       # [g, B]
                window = jnp.concatenate(
                    [cur[None, :], drafts], axis=0).T     # [B, g1]
                tcache = KVCache(k=t_ck, v=t_cv, length=lengths,
                                 k_scale=t_cks, v_scale=t_cvs)
                lg, tcache = arch.forward(
                    t_params, window, fcfg, cache=tcache,
                    backend=model.backend, dtype=model.dtype,
                )
                t_next = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # [B, g1]
                match = drafts.T == t_next[:, :g]
                n_acc = jnp.sum(
                    jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
                tk, tv = tcache.k, tcache.v
                tks, tvs = tcache.k_scale, tcache.v_scale
                dk, dv = dcache.k, dcache.v
                if win is not None:
                    zero = (0,) * 5
                    upd = lambda f, p_: None if p_ is None else jax.lax.dynamic_update_slice(f, p_, zero)
                    tk, tv = upd(full_t[0], tk), upd(full_t[1], tv)
                    tks, tvs = upd(full_t[2], tks), upd(full_t[3], tvs)
                    dk, dv = upd(full_d[0], dk), upd(full_d[1], dv)
                return (tk, tv, tks, tvs, dk, dv, t_next, n_acc)

            self._spec_fns[win] = fn = jax.jit(spec)
        return fn

    def _append_token(self, slot: int, tok: int) -> bool:
        """Append ONE generated token to a live slot: stream it (unless the
        previous token was EOS or max_new is already met — the post-EOS /
        overflow token is excluded from the output so it must not be
        streamed either) and retire the slot when EOS was hit or max_new
        reached. Returns True when the slot retired. generated[-1] is the
        token JUST sampled from the previous token's logits. The single
        source of truth for retirement semantics — used by both the plain
        and the speculative step."""
        st = self.slots[slot]
        req = st.req
        st.generated.append(tok)
        hit_eos = (req.eos_token_id is not None
                   and st.generated[-2] == req.eos_token_id)
        if (self.on_token is not None and not hit_eos
                and len(st.generated) - 1 < req.max_new_tokens):
            self.on_token(req.req_id, tok)
        if hit_eos or len(st.generated) - 1 >= req.max_new_tokens:
            out = st.generated[: req.max_new_tokens]
            if req.eos_token_id is not None and req.eos_token_id in out:
                out = out[: out.index(req.eos_token_id) + 1]
            self.finished[req.req_id] = np.asarray(out, np.int32)
            st.req = None
            st.generated = []
            self._temps[slot] = 0.0
            self._eos[slot] = -1
            self._min_new[slot] = 0
            return True
        return False

    def _spec_step(self, active) -> list[int]:
        need = max(
            len(st.req.prompt) + len(st.generated)
            for st, a in zip(self.slots, active) if a
        ) + self.spec_gamma + 1
        win = _bucket(need)
        if win >= self.max_seq_len:
            win = None
        fn = self._get_spec_fn(win)
        t0 = time.perf_counter()
        (self.cache_k, self.cache_v, self.cache_ks, self.cache_vs,
         self.d_cache_k, self.d_cache_v, t_next, n_acc) = fn(
            self.model.params, self.draft.params,
            self.cache_k, self.cache_v, self.cache_ks, self.cache_vs,
            self.d_cache_k, self.d_cache_v,
            self.lengths, self.cur_tokens)
        t_next_np = np.asarray(t_next)
        n_acc_np = np.asarray(n_acc)
        self.stats.steps += 1
        self.stats.step_time_s += time.perf_counter() - t0

        lengths_np = self.lengths        # host mirrors, mutated in place
        cur_np = self.cur_tokens
        done_ids = []
        for slot, st in enumerate(self.slots):
            if not active[slot]:
                continue
            rid = st.req.req_id
            emitted = int(n_acc_np[slot]) + 1
            retired = False
            appended = 0
            # replay the plain step's per-token append/stream/retire logic
            # over the emitted window; tokens past a retirement are exactly
            # the tokens the sequential engine would never have generated
            for j in range(emitted):
                appended += 1
                if self._append_token(slot, int(t_next_np[slot, j])):
                    done_ids.append(rid)
                    lengths_np[slot] = 0
                    retired = True
                    break
            self.stats.tokens_generated += appended
            if not retired:
                lengths_np[slot] += emitted
                cur_np[slot] = int(t_next_np[slot, emitted - 1])
        self.stats.requests_completed += len(done_ids)
        return done_ids

    def step(self) -> list[int]:
        """Admit queued requests, advance at most ONE prefill chunk, run one
        decode step for all active slots, retire finished sequences. Returns
        req_ids finished this step."""
        self._admit()

        # one chunk of one mid-prefill slot per step (round-robin), so
        # decoding slots advance every step even under long-prompt ingest
        pf_slots = [i for i, st in enumerate(self.slots) if st.prefilling]
        if pf_slots:
            slot = pf_slots[self._pf_rr % len(pf_slots)]
            self._pf_rr += 1
            self._run_chunk(slot)

        active = [st.req is not None and not st.prefilling for st in self.slots]
        if not any(active):
            if pf_slots:
                return []  # prefill still in flight
            return []

        # speculative fast path: every active slot greedy with min_new
        # satisfied and nothing mid-prefill (the plain step handles parked
        # cursors, sampling, and EOS suppression; spec would not)
        if (self.draft is not None and not pf_slots and all(
            self._temps[i] == 0.0
            and self._min_new[i] <= len(self.slots[i].generated)
            for i, a in enumerate(active) if a
        )):
            return self._spec_step(active)

        sampling = any(
            self._temps[i] > 0.0 for i, a in enumerate(active) if a
        )
        # Static attention window covering every active cursor (bucketed so
        # recompiles are rare); None = full cache. Positions are host-known
        # (prompt + generated so far), so this costs no device sync.
        need = max(
            len(st.req.prompt) + len(st.generated)
            for st, a in zip(self.slots, active) if a
        )
        # multi-step block: all-decode state and enough cache headroom
        if (self.decode_block > 1 and not pf_slots
                and need + self.decode_block <= self.max_seq_len):
            return self._block_step(active, sampling, need)
        win = _bucket(need)
        if win >= self.max_seq_len:
            win = None
        step = self._decode_step_fn(sampling, win)
        min_left = np.array([
            max(0, self._min_new[i] - len(st.generated))
            for i, st in enumerate(self.slots)
        ], np.int32)
        args = [
            self.model.params, self.cache_k, self.cache_v,
            self.cache_ks, self.cache_vs, self.lengths, self.cur_tokens,
            jnp.asarray(self._eos), jnp.asarray(min_left),
        ]
        if sampling:
            steps = np.array(
                [len(st.generated) for st in self.slots], np.int32
            )
            args += [
                jnp.asarray(self._temps), jnp.asarray(self._top_ps),
                jnp.asarray(self._top_ks), jnp.asarray(self._seeds),
                jnp.asarray(steps),
            ]
        t0 = time.perf_counter()
        (self.cache_k, self.cache_v, self.cache_ks, self.cache_vs,
         _, nxt) = step(*args)
        nxt_np = np.asarray(nxt)
        self.stats.steps += 1
        self.stats.step_time_s += time.perf_counter() - t0
        self.stats.tokens_generated += int(sum(active))

        # host cursor mirror: the device step advanced every row's cache
        # cursor by exactly 1 (arch.forward: length + t) — mirror that here
        # instead of syncing the device lengths back, then re-park
        # mid-prefill slots (their garbage write went to the scratch cell)
        self.lengths += 1
        for i, st in enumerate(self.slots):
            if st.prefilling:
                self.lengths[i] = self.max_seq_len - 1
        for i, a in enumerate(active):
            if a:
                self.cur_tokens[i] = nxt_np[i]

        done_ids = []
        for slot, st in enumerate(self.slots):
            if st.req is None or st.prefilling:
                continue
            rid = st.req.req_id
            if self._append_token(slot, int(nxt_np[slot])):
                done_ids.append(rid)
                self.lengths[slot] = 0
        self.stats.requests_completed += len(done_ids)
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
