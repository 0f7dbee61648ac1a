"""Paged-KV continuous batching (vLLM-style block paging, TPU-native).

The slot engine in serving.py preallocates ``max_slots x max_seq_len`` cache
rows per slot — at 8 slots x 4k context on a 7B model that is ~17 GB of
bf16 cache, more than a v5e's HBM. This engine shares ONE page pool across
all slots: each sequence owns a page table into PAGE-MAJOR
``[L, total_pages, Hkv, page_size, D]`` pools, pages are allocated
on demand as a sequence grows and freed the moment it retires, so cache
memory scales with the TOKENS ACTUALLY RESIDENT rather than
slots x max_seq_len.

Decode attention over the paged pools runs the multi-head-per-DMA kernel
(ops/pallas/paged_attn.py — the TPU analog of vLLM's PagedAttention CUDA
kernel, fetching one whole page per DMA instead of the stock kernel's
per-(page, head) 4 KB copies); everywhere else (CPU tests) an exact jnp
reference gathers the pages. Both paths produce the same tokens as the
contiguous-cache engine.

Scope: standard decoder families (rope/GQA, no alibi/softcap/sliding-window
/MLA); quantized or dense weights; greedy + the same per-request sampling as
serving.py. Prompts are prefilled through the ordinary contiguous path and
scatter-copied into pages.

NOTE on throughput in THIS dev environment: the engine's host-side step
loop pays a tunnel round trip per step (the axon TPU link costs ~30+ ms
per host<->device interaction), so engine tok/s here reflects tunnel
latency, not kernel speed — on a locally attached TPU the per-step host
overhead is microseconds. In-graph loops (generate()) are unaffected.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from collections import OrderedDict, deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models import arch
from .models.arch import KVCache
from .ops.pallas.paged_attn import (
    page_window_bucket,
    write_token_pages,
    write_token_pages_kernel,
)
from .serving import (EngineStats, Request, _bucket, _greedy_tokens,
                      _sample_tokens)


def paged_cfg_ok(cfg) -> bool:
    """True when the paged decode step's simplified layer loop (plain
    rope/GQA pre-norm decoder) reproduces arch.forward exactly."""
    return not (
        cfg.attn_variant != "mha" or cfg.pos_embedding not in ("rope", "rope_gptj")
        or cfg.attn_softcap is not None or cfg.sliding_window is not None
        or cfg.num_kv_heads_per_layer is not None or cfg.parallel_block
        or cfg.residual_scale is not None or cfg.post_sublayer_norms
        or getattr(cfg, "moe_num_experts", None) or not cfg.pre_norm
    )


def _check_cfg(cfg) -> None:
    if not paged_cfg_ok(cfg):
        raise NotImplementedError(
            "paged serving supports standard rope/GQA decoder families"
        )


@dataclasses.dataclass
class _PagedSlot:
    req: Optional[Request] = None
    generated: list = dataclasses.field(default_factory=list)


class PagedContinuousBatchEngine:
    """Continuous batching over a shared page pool (see module docstring).

    ``total_pages`` bounds RESIDENT tokens (total_pages * page_size), not
    per-slot length — admission waits until enough pages are free."""

    def __init__(
        self,
        model,
        max_slots: int = 4,
        total_pages: int = 64,
        page_size: int = 16,
        pages_per_seq: int = 32,
        use_kernel: Optional[bool] = None,
        on_token=None,
        enable_prefix_cache: bool = False,
        decode_block: int = 1,
        write_kernel: Optional[bool] = None,
    ):
        _check_cfg(model.cfg)
        if "q_proj" not in model.params["layers"][0].get("attn", {}):
            raise NotImplementedError(
                "paged serving requires unfused q/k/v projections"
            )
        if any("adaption" in b.get("attn", {}) for b in model.params["layers"]):
            raise NotImplementedError(
                "paged serving does not apply adaption-prompt adapters; "
                "use the contiguous engine"
            )
        self.model = model
        self.cfg = cfg = model.cfg
        self.max_slots = max_slots
        self.page_size = page_size
        self.total_pages = total_pages
        self.pages_per_seq = pages_per_seq
        self.on_token = on_token
        # kernel only on real TPU; jnp reference elsewhere (tests/CPU)
        self.use_kernel = (
            use_kernel if use_kernel is not None
            else jax.default_backend() == "tpu"
        )
        # token writes via the aliased Pallas kernel (default = follow
        # use_kernel); False keeps the dus chain for A/Bs
        self.write_kernel = (
            write_kernel if write_kernel is not None else bool(self.use_kernel)
        )
        # PAGE-MAJOR pools: one page holds every kv head's slab contiguously,
        # so the mh attention kernel fetches a whole page per DMA (the stock
        # kernel's head-major layout forced one 4 KB copy per (page, head))
        shape = (cfg.num_layers, total_pages, cfg.num_kv_heads, page_size,
                 cfg.head_dim)
        self.k_pages = jnp.zeros(shape, model.dtype)
        self.v_pages = jnp.zeros(shape, model.dtype)
        # page 0 is a reserved NULL page: unused table entries point at it
        self._free = list(range(total_pages - 1, 0, -1))
        self.tables = np.zeros((max_slots, pages_per_seq), np.int32)
        # lengths/cur_tokens live HOST-SIDE: lengths evolve deterministically
        # (+1 per active step), and device reads through the tunnel cost
        # ~30 ms each — reading them back per step dominated the step time
        self.lengths = np.zeros((max_slots,), np.int32)
        self.cur_tokens = np.zeros((max_slots,), np.int32)
        self._temps = np.zeros((max_slots,), np.float32)
        self._top_ps = np.ones((max_slots,), np.float32)
        self._top_ks = np.zeros((max_slots,), np.int32)
        self._seeds = np.zeros((max_slots,), np.int32)
        self._eos = np.full((max_slots,), -1, np.int32)
        self._min_new = np.zeros((max_slots,), np.int32)
        self.slots = [_PagedSlot() for _ in range(max_slots)]
        # drain mode: set on preemption, cleared when a request completes
        # (or the pool empties). Without it, cheap re-admissions (e.g. a
        # prefix-cache hit needing one page) defeat the pool back-pressure
        # and two growing sequences can preempt each other forever.
        self._drain = False
        self.queue: deque[Request] = deque()
        self.finished: dict[int, np.ndarray] = {}
        self.stats = EngineStats()
        self._streamed: dict[int, int] = {}   # req_id -> tokens emitted
        # decode_block > 1: run that many decode steps per jitted call (one
        # host sync per block; pages for the whole block are preallocated).
        # Streams are unchanged; a request can retire up to decode_block-1
        # device steps late, its surplus tokens discarded at emission.
        if not 1 <= decode_block < page_size * pages_per_seq:
            raise ValueError("decode_block must be in [1, max context)")
        self.decode_block = decode_block
        self._prefill_fns: dict[int, object] = {}
        self._scatter_fn = None
        self._decode_fns: dict[bool, object] = {}
        self._block_fns: dict[bool, object] = {}
        # -- automatic prefix caching (vLLM-style, opt-in) ----------------
        # Full prompt pages are content-addressed by a chain hash; a new
        # request reuses the K/V pages of the longest cached full-page
        # prefix and prefills ONLY the suffix (one cache-continuation
        # forward over the gathered prefix). Retired sequences' registered
        # pages stay resident with refcount 0 (LRU-evicted under pool
        # pressure), so repeated system prompts skip both the prefill
        # compute and the page memory.
        if enable_prefix_cache and getattr(cfg, "rope_ntk_seq_len", None):
            # dynamic NTK derives the rope base from the encoding call's
            # positions: pages cached by one request would carry a
            # different alpha than a reusing request's queries (same class
            # of inconsistency as the ring-attention guard in arch.py)
            raise NotImplementedError(
                "prefix caching is not supported with dynamic-NTK rope "
                "(rope_ntk_seq_len); per-page rope bases would mix"
            )
        self.enable_prefix_cache = enable_prefix_cache
        self._hash_to_pid: dict = {}          # chain hash -> page id
        self._pid_hash: dict[int, object] = {}  # page id -> chain hash
        self._ref: dict[int, int] = {}        # registered page -> live refs
        self._cached = OrderedDict()          # LRU of refcount-0 pages
        self._gather_fns: dict[int, object] = {}
        self._suffix_fns: dict[tuple, object] = {}
        self._hash_memo: dict[int, list] = {}   # req_id -> chain hashes

    def _emit(self, req_id: int, idx: int, tok: int) -> None:
        """Stream token ``idx`` once per request — preemption replays the
        same deterministic tokens, so already-emitted indices are skipped."""
        if self.on_token is None:
            return
        if idx >= self._streamed.get(req_id, 0):
            self.on_token(req_id, tok)
            self._streamed[req_id] = idx + 1

    # -- page accounting -------------------------------------------------

    def pages_in_use(self) -> int:
        return (self.total_pages - 1) - len(self._free)

    def _alloc(self, n: int) -> list[int]:
        assert len(self._free) >= n
        out = [self._free.pop() for _ in range(n)]
        self.stats.pages_high_water = max(
            self.stats.pages_high_water, self.pages_in_use())
        return out

    def pages_cached(self) -> int:
        """Registered pages resident with no live reference (evictable)."""
        return len(self._cached)

    def _evict_one(self) -> None:
        pid, _ = self._cached.popitem(last=False)   # LRU
        h = self._pid_hash.pop(pid)
        del self._hash_to_pid[h]
        self._ref.pop(pid, None)
        self._free.append(pid)

    def _ensure_free(self, n: int) -> None:
        while len(self._free) < n and self._cached:
            self._evict_one()
        assert len(self._free) >= n

    def _chain_hashes(self, prompt) -> list:
        """sha256 digest chain over full pages: collision-resistant content
        addressing (Python's tuple hash is invertible — in a multi-tenant
        deployment an adversarial prompt could be crafted to collide with a
        victim's cached pages and attend its K/V; vLLM moved to sha256 for
        the same reason)."""
        import hashlib

        pg = self.page_size
        hs, h = [], b""
        arr = np.ascontiguousarray(np.asarray(prompt), dtype=np.int32)
        for i in range(len(arr) // pg):
            h = hashlib.sha256(h + arr[i * pg:(i + 1) * pg].tobytes()).digest()
            hs.append(h)
        return hs

    def _free_slot_pages(self, slot: int) -> None:
        used = self.tables[slot][self.tables[slot] != 0]
        for pid in (int(x) for x in used):
            if pid in self._pid_hash:
                # registered (shared-capable) page: drop this slot's ref;
                # at zero it becomes CACHED (reusable by a later identical
                # prefix) rather than free
                self._ref[pid] -= 1
                if self._ref[pid] <= 0:
                    self._cached[pid] = None
            else:
                self._free.append(pid)
        self.tables[slot] = 0

    # -- admission / prefill --------------------------------------------

    def submit(self, req: Request) -> None:
        need = max(len(req.prompt) + req.max_new_tokens, len(req.prompt) + 1)
        if need > self.pages_per_seq * self.page_size:
            raise ValueError(
                f"request {req.req_id}: {need} tokens exceed pages_per_seq "
                f"* page_size = {self.pages_per_seq * self.page_size}"
            )
        if self._pages_needed(need) > self.total_pages - 1:
            raise ValueError(
                f"request {req.req_id}: prompt + max_new_tokens needs more "
                f"pages than the pool can ever supply "
                f"(total_pages={self.total_pages})"
            )
        if self.enable_prefix_cache and req.req_id not in self._hash_memo:
            # hash once at submit: a blocked head-of-queue request would
            # otherwise rehash its whole prompt on every engine step
            self._hash_memo[req.req_id] = self._chain_hashes(req.prompt)
        self.queue.append(req)

    def _pages_needed(self, tokens: int) -> int:
        return -(-tokens // self.page_size)

    def _get_prefill_fn(self, bucket: int):
        fn = self._prefill_fns.get(bucket)
        if fn is None:
            model = self.model
            cfg = self.cfg

            def prefill(params, tokens, mask):
                cache = KVCache.create(cfg, 1, bucket, dtype=model.dtype)
                logits, cache = arch.forward(
                    params, tokens, cfg, cache=cache,
                    backend=model.backend, attn_mask=mask, dtype=model.dtype,
                    positions=jnp.maximum(jnp.cumsum(mask, -1) - 1, 0),
                    fresh_prefill=True,
                )
                last = jnp.sum(mask, -1) - 1
                return cache.k[:, 0], cache.v[:, 0], logits[jnp.arange(1), last]

            self._prefill_fns[bucket] = fn = jax.jit(prefill)
        return fn

    def _get_prefix_gather_fn(self, ns: int):
        """Gather ``ns`` pages (null-padded pid list) into contiguous
        [L, ns*page_size, Hkv, D] K/V for the suffix continuation forward.
        Keyed by the power-of-two page-count bucket."""
        fn = self._gather_fns.get(ns)
        if fn is None:
            def gather(k_pages, v_pages, pids):
                def g(pool):
                    x = pool[:, pids]                 # [L, ns, Hkv, pg, D]
                    L, n, hkv, pgs, d = x.shape
                    return x.transpose(0, 1, 3, 2, 4).reshape(
                        L, n * pgs, hkv, d)

                return g(k_pages), g(v_pages)

            self._gather_fns[ns] = fn = jax.jit(gather)
        return fn

    def _get_suffix_prefill_fn(self, sb: int, pb: int):
        """Cache-continuation prefill of a [1, sb] suffix against a
        [L, pb, Hkv, D] gathered prefix whose first ``shared_len`` rows are
        real (the rest masked). Returns the suffix K/V rows (page-aligned:
        shared_len is a page multiple) and the last valid position's
        logits. The compute saved vs whole-prompt prefill is exactly the
        shared prefix."""
        key = (sb, pb)
        fn = self._suffix_fns.get(key)
        if fn is None:
            model = self.model
            cfg = self.cfg

            def sfx(params, tokens, mask, pk, pv, shared_len):
                S = pb + sb
                base = KVCache.create(cfg, 1, S, dtype=model.dtype)
                ck = jax.lax.dynamic_update_slice(
                    base.k, pk[:, None].astype(base.k.dtype),
                    (0, 0, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(
                    base.v, pv[:, None].astype(base.v.dtype),
                    (0, 0, 0, 0, 0))
                cache = KVCache(k=ck, v=cv, length=shared_len,
                                k_scale=None, v_scale=None)
                valid = jnp.sum(mask, -1)
                attn_mask = (
                    jnp.arange(S)[None, :] < shared_len + valid[:, None]
                ).astype(jnp.int32)
                positions = shared_len + jnp.arange(sb, dtype=jnp.int32)[None, :]
                logits, cache = arch.forward(
                    params, tokens, cfg, cache=cache,
                    backend=model.backend, attn_mask=attn_mask,
                    dtype=model.dtype, positions=positions,
                )
                sk = jax.lax.dynamic_slice_in_dim(
                    cache.k[:, 0], shared_len, sb, axis=1)
                sv = jax.lax.dynamic_slice_in_dim(
                    cache.v[:, 0], shared_len, sb, axis=1)
                lrow = logits[jnp.arange(1), valid - 1]
                return sk, sv, lrow

            self._suffix_fns[key] = fn = jax.jit(sfx)
        return fn

    def _get_scatter_fn(self):
        """Scatter a WHOLE prefill's K/V ([L, bucket, Hkv, D]) into its
        pages in one dispatch (pids beyond the allocated count point at the
        reserved null page 0, whose content is never attended). One jit
        compilation per prefill bucket; pools are donated."""
        if self._scatter_fn is None:
            pg = self.page_size

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def scatter(pool_k, pool_v, k, v, pids):
                L, bucket, hkv, d = k.shape
                span = -(-bucket // pg) * pg
                if span != bucket:
                    pad = ((0, 0), (0, span - bucket), (0, 0), (0, 0))
                    k = jnp.pad(k, pad)
                    v = jnp.pad(v, pad)
                npages = span // pg

                def segs(a):
                    return a.reshape(L, npages, pg, hkv, d).transpose(0, 1, 3, 2, 4)

                def put(pool, s):
                    # per-page dynamic_update_slice chain: the vector-index
                    # .at[:, pids].set form lowers to a serializing XLA
                    # scatter on TPU (pids are unique fresh pages, so the
                    # sequential writes are exact)
                    s = s.astype(pool.dtype)
                    zero = jnp.int32(0)
                    for i in range(npages):
                        pool = jax.lax.dynamic_update_slice(
                            pool, s[:, i:i + 1],
                            (zero, pids[i], zero, zero, zero))
                    return pool

                pool_k = put(pool_k, segs(k))
                pool_v = put(pool_v, segs(v))
                return pool_k, pool_v

            self._scatter_fn = scatter
        return self._scatter_fn

    def _admit(self) -> None:
        if self._drain and all(st.req is None for st in self.slots):
            self._drain = False          # nothing left to drain
        while self.queue and not self._drain:
            free_slots = [i for i, st in enumerate(self.slots) if st.req is None]
            if not free_slots:
                return
            req = self.queue[0]
            p = len(req.prompt)
            pg = self.page_size

            # -- prefix cache probe: longest cached run of FULL prompt
            # pages (capped at p-1 tokens — the last position must be
            # computed to sample the first token)
            shared, shared_pids, hashes = 0, [], None
            if self.enable_prefix_cache:
                hashes = self._hash_memo.get(req.req_id)
                if hashes is None:
                    hashes = self._chain_hashes(req.prompt)
                    self._hash_memo[req.req_id] = hashes
                for h in hashes[: (p - 1) // pg]:
                    pid = self._hash_to_pid.get(h)
                    if pid is None:
                        break
                    shared_pids.append(pid)
                    shared += 1
            need_new = self._pages_needed(p + 1) - shared
            # availability: free + evictable cached, EXCLUDING the cached
            # pages this request is about to reuse
            avail = (len(self._free) + len(self._cached)
                     - sum(1 for pid in shared_pids if pid in self._cached))
            if need_new > avail:
                return                       # wait for pages to free up
            self.queue.popleft()
            slot = free_slots[0]
            for pid in shared_pids:          # activate shared pages
                self._ref[pid] = self._ref.get(pid, 0) + 1
                self._cached.pop(pid, None)
            self._ensure_free(need_new)

            shared_tok = shared * pg
            self.stats.prefills += 1
            self.stats.prefill_tokens += p - shared_tok
            self.stats.prefix_hit_tokens += shared_tok
            if shared == 0:
                bucket = _bucket(p)
                fn = self._get_prefill_fn(bucket)
                tokens = np.zeros((1, bucket), np.int32)
                mask = np.zeros((1, bucket), np.int32)
                tokens[0, :p] = req.prompt
                mask[0, :p] = 1
                k, v, lrow = fn(self.model.params, jnp.asarray(tokens),
                                jnp.asarray(mask))
            else:
                # gather the shared prefix pages and prefill ONLY the suffix
                sv = p - shared_tok
                sb = _bucket(sv)
                ns = 8
                while ns < shared:
                    ns *= 2
                gpids = np.zeros((ns,), np.int32)
                gpids[:shared] = shared_pids
                gather = self._get_prefix_gather_fn(ns)
                pk, pv = gather(self.k_pages, self.v_pages,
                                jnp.asarray(gpids))
                sfn = self._get_suffix_prefill_fn(sb, ns * pg)
                tokens = np.zeros((1, sb), np.int32)
                mask = np.zeros((1, sb), np.int32)
                tokens[0, :sv] = req.prompt[shared_tok:]
                mask[0, :sv] = 1
                k, v, lrow = sfn(self.model.params, jnp.asarray(tokens),
                                 jnp.asarray(mask), pk, pv,
                                 jnp.int32(shared_tok))

            pages = self._alloc(need_new)
            scatter = self._get_scatter_fn()
            npages = -(-k.shape[1] // pg)
            # page j covers tokens [shared_tok + j*pg, ...); entries beyond
            # the allocated pages (incl. a +1 headroom page fully past the
            # bucket, which the decode-step scatter fills instead) target
            # the reserved null page 0
            pids = np.zeros((npages,), np.int32)
            n_in_bucket = min(len(pages), npages)
            pids[:n_in_bucket] = pages[:n_in_bucket]
            self.k_pages, self.v_pages = scatter(
                self.k_pages, self.v_pages, k, v, jnp.asarray(pids))
            self.tables[slot] = 0
            if shared:
                self.tables[slot, :shared] = shared_pids
            self.tables[slot, shared:shared + len(pages)] = pages
            if self.enable_prefix_cache:
                # register this prompt's remaining FULL pages for reuse
                for i in range(shared, p // pg):
                    h = hashes[i]
                    pid = int(self.tables[slot, i])
                    if pid != 0 and h not in self._hash_to_pid:
                        self._hash_to_pid[h] = pid
                        self._pid_hash[pid] = h
                        self._ref[pid] = self._ref.get(pid, 0) + 1

            tok = int(np.asarray(_sample_tokens(
                jnp.reshape(lrow, (1, -1)),
                jnp.asarray([req.temperature], jnp.float32),
                jnp.asarray([req.top_p], jnp.float32),
                jnp.asarray([req.top_k], jnp.int32),
                jnp.asarray([req.seed], jnp.int32),
                jnp.asarray([0], jnp.int32),
                jnp.asarray([-1 if req.eos_token_id is None else req.eos_token_id], jnp.int32),
                jnp.asarray([req.min_new_tokens], jnp.int32),
            ))[0])
            self.lengths[slot] = p
            self.cur_tokens[slot] = tok
            self._temps[slot] = req.temperature
            self._top_ps[slot] = req.top_p
            self._top_ks[slot] = req.top_k
            self._seeds[slot] = req.seed
            self._eos[slot] = -1 if req.eos_token_id is None else req.eos_token_id
            self._min_new[slot] = req.min_new_tokens
            st = self.slots[slot]
            st.req = req
            st.generated = [tok]
            self._emit(req.req_id, 0, tok)

    # -- decode ----------------------------------------------------------

    def _attend(self, q, kp, vp, lengths, tables, scale, layer):
        """kp/vp are the FULL stacked [L, P, ...] pools; the kernel bakes
        ``layer`` into its index_map (a per-layer [P, ...] slice costs a
        pool-sized copy per layer per step). The jnp reference slices."""
        from .ops.pallas.paged_attn import (
            paged_attention_mh,
            paged_attention_mh_ref,
        )

        if self.use_kernel:  # True on TPU; "interpret" = real kernel on CPU
            return paged_attention_mh(
                q, kp, vp, lengths, tables, sm_scale=float(scale),
                interpret=self.use_kernel == "interpret", layer=layer,
            )
        return paged_attention_mh_ref(
            q, kp[layer], vp[layer], lengths, tables, sm_scale=float(scale))

    def _decode_step_fn(self, sampling: bool):
        fn = self._decode_fns.get(sampling)
        if fn is None:
            model = self.model
            cfg = self.cfg
            pg = self.page_size
            b = self.max_slots
            h, hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
            scale = cfg.attn_scale if cfg.attn_scale is not None else d ** -0.5

            def step(params, k_pages, v_pages, tables, lengths, cur_tokens,
                     eos_ids, min_left, *samp):
                x = arch.embed(params, cur_tokens[:, None], lengths[:, None],
                               cfg, model.dtype)
                rows = jnp.arange(b)
                page_of = tables[rows, lengths // pg]      # [B]
                off = lengths % pg
                for idx, bp in enumerate(params["layers"]):
                    hidden = arch.apply_norm(bp["input_norm"], x, cfg)
                    ap = bp["attn"]
                    q = arch.apply_linear(ap["q_proj"], hidden, model.backend).reshape(b, 1, h, d)
                    kk = arch.apply_linear(ap["k_proj"], hidden, model.backend).reshape(b, 1, hkv, d)
                    vv = arch.apply_linear(ap["v_proj"], hidden, model.backend).reshape(b, 1, hkv, d)
                    q, kk = arch.apply_rope(q, kk, lengths[:, None], cfg)
                    if cfg.logn_attn_seq_len is not None:
                        # qwen-v1 logn scaling (mirrors arch.attention)
                        import math as _math

                        L = float(cfg.logn_attn_seq_len)
                        logn = jnp.maximum(
                            jnp.log(lengths.astype(jnp.float32) + 1.0)
                            / _math.log(L), 1.0)
                        q = (q.astype(jnp.float32)
                             * logn[:, None, None, None]).astype(x.dtype)
                    # write current K/V into each slot's active page. On the
                    # real-kernel path this is an aliased Pallas RMW — any
                    # XLA lowering (scatter/dus) gives the pools a layout
                    # preference that fights the attention custom-call,
                    # inserting two full-pool copies per step.
                    if self.write_kernel:
                        k_pages, v_pages = write_token_pages_kernel(
                            k_pages, v_pages, idx, page_of, off,
                            kk[:, 0], vv[:, 0],
                            interpret=self.use_kernel == "interpret")
                    else:
                        k_pages = write_token_pages(
                            k_pages, idx, page_of, off, kk[:, 0])
                        v_pages = write_token_pages(
                            v_pages, idx, page_of, off, vv[:, 0])
                    of = self._attend(
                        q[:, 0], k_pages, v_pages,
                        lengths + 1, tables, scale, idx,
                    ).reshape(b, 1, h * d).astype(x.dtype)
                    attn_out = arch.apply_linear(ap["o_proj"], of, model.backend)
                    x = x + attn_out
                    h2 = arch.apply_norm(bp["post_norm"], x, cfg)
                    x = x + arch.mlp(bp["mlp"], h2, cfg, model.backend)
                logits = arch.unembed(params, x, cfg)[:, -1, :]
                if sampling:
                    temps, top_ps, top_ks, seeds, steps = samp
                    nxt = _sample_tokens(logits, temps, top_ps, top_ks, seeds,
                                         steps, eos_ids, min_left)
                else:
                    nxt = _greedy_tokens(logits, eos_ids, min_left)
                return k_pages, v_pages, lengths + 1, nxt

            # donate the pools: the step consumes and returns them, so XLA
            # can update in place instead of copying ~0.5 GB per step
            self._decode_fns[sampling] = fn = jax.jit(
                step, donate_argnums=(1, 2))
        return fn

    def _decode_block_fn(self, sampling: bool):
        """``decode_block`` decode steps in ONE jitted scan (multi-step
        scheduling — the contiguous engine's _decode_block_fn counterpart):
        one host sync per block. Pages covering the whole block are
        preallocated by step(), so the in-scan page lookup
        ``tables[rows, lengths // pg]`` stays valid as the carried lengths
        advance; the table window is static for the block. Retired-slot
        surplus tokens are discarded at emission (same replay contract)."""
        fn = self._block_fns.get(sampling)
        if fn is None:
            model = self.model
            cfg = self.cfg
            pg = self.page_size
            b = self.max_slots
            h, hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
            scale = cfg.attn_scale if cfg.attn_scale is not None else d ** -0.5
            nsteps = self.decode_block

            def block(params, k_pages, v_pages, tables, lengths, cur_tokens,
                      eos_ids, min_left, *samp):
                if sampling:
                    temps, top_ps, top_ks, seeds, steps0 = samp
                rows = jnp.arange(b)

                def body(carry, j):
                    k_pages, v_pages, lengths, cur, ml = carry
                    x = arch.embed(params, cur[:, None], lengths[:, None],
                                   cfg, model.dtype)
                    page_of = tables[rows, lengths // pg]
                    off = lengths % pg
                    for idx, bp in enumerate(params["layers"]):
                        hidden = arch.apply_norm(bp["input_norm"], x, cfg)
                        ap = bp["attn"]
                        q = arch.apply_linear(ap["q_proj"], hidden, model.backend).reshape(b, 1, h, d)
                        kk = arch.apply_linear(ap["k_proj"], hidden, model.backend).reshape(b, 1, hkv, d)
                        vv = arch.apply_linear(ap["v_proj"], hidden, model.backend).reshape(b, 1, hkv, d)
                        q, kk = arch.apply_rope(q, kk, lengths[:, None], cfg)
                        if cfg.logn_attn_seq_len is not None:
                            import math as _math

                            L = float(cfg.logn_attn_seq_len)
                            logn = jnp.maximum(
                                jnp.log(lengths.astype(jnp.float32) + 1.0)
                                / _math.log(L), 1.0)
                            q = (q.astype(jnp.float32)
                                 * logn[:, None, None, None]).astype(x.dtype)
                        if self.write_kernel:
                            k_pages, v_pages = write_token_pages_kernel(
                                k_pages, v_pages, idx, page_of, off,
                                kk[:, 0], vv[:, 0],
                                interpret=self.use_kernel == "interpret")
                        else:
                            k_pages = write_token_pages(
                                k_pages, idx, page_of, off, kk[:, 0])
                            v_pages = write_token_pages(
                                v_pages, idx, page_of, off, vv[:, 0])
                        of = self._attend(
                            q[:, 0], k_pages, v_pages,
                            lengths + 1, tables, scale, idx,
                        ).reshape(b, 1, h * d).astype(x.dtype)
                        x = x + arch.apply_linear(ap["o_proj"], of, model.backend)
                        h2 = arch.apply_norm(bp["post_norm"], x, cfg)
                        x = x + arch.mlp(bp["mlp"], h2, cfg, model.backend)
                    logits = arch.unembed(params, x, cfg)[:, -1, :]
                    if sampling:
                        nxt = _sample_tokens(logits, temps, top_ps, top_ks,
                                             seeds, steps0 + j, eos_ids, ml)
                    else:
                        nxt = _greedy_tokens(logits, eos_ids, ml)
                    return (k_pages, v_pages, lengths + 1, nxt,
                            jnp.maximum(ml - 1, 0)), nxt

                carry = (k_pages, v_pages, lengths, cur_tokens, min_left)
                carry, toks = jax.lax.scan(
                    body, carry, jnp.arange(nsteps, dtype=jnp.int32))
                return carry[0], carry[1], toks        # toks [nsteps, B]

            self._block_fns[sampling] = fn = jax.jit(
                block, donate_argnums=(1, 2))
        return fn

    def warmup(self, sampling: bool = True) -> None:
        """Pre-compile every jit variant the engine can hit mid-serving
        (the contiguous engine's warmup() counterpart). The decode step
        re-traces at every page-window bucket crossing (``tables[:, :wb]``
        changes shape as live contexts grow), so without this a live
        deployment stalls for an XLA compile each time the longest sequence
        doubles its window. Warms: prefill buckets, the whole-prefill
        scatter per bucket, and the decode step for every reachable window
        bucket x (greedy[, sampling]). Engine state is untouched — only the
        reserved null page's contents change, and those are never
        attended."""
        max_ctx = self.pages_per_seq * self.page_size
        pg = self.page_size
        scatter = self._get_scatter_fn()
        # NOTE: no "<= max_ctx" filter — submit() admits prompts up to
        # max_ctx-1 tokens whose _bucket() may EXCEED max_ctx (e.g. a
        # 70-token prompt at max_ctx=96 prefills at bucket 128); filtering
        # would leave that compile to fire mid-serving.
        for bkt in sorted({_bucket(n) for n in range(1, max_ctx)}):
            fn = self._get_prefill_fn(bkt)
            tokens = jnp.zeros((1, bkt), jnp.int32)
            mask = jnp.zeros((1, bkt), jnp.int32).at[0, :2].set(1)
            k, v, _ = fn(self.model.params, tokens, mask)
            pids = np.zeros((-(-bkt // pg),), np.int32)  # all → null page
            self.k_pages, self.v_pages = scatter(
                self.k_pages, self.v_pages, k, v, pids)
        if self.enable_prefix_cache:
            # prefix-cache variants: page gathers + suffix continuation
            # prefills — the first cache HIT must not stall for a compile
            shared_max = max(1, (max_ctx - 1) // pg)
            ns_list = [8]
            while ns_list[-1] < shared_max:
                ns_list.append(ns_list[-1] * 2)
            sbs = sorted({_bucket(n) for n in range(1, max_ctx)})
            for ns in ns_list:
                gf = self._get_prefix_gather_fn(ns)
                pk, pv = gf(self.k_pages, self.v_pages,
                            jnp.zeros((ns,), jnp.int32))
                for sb in sbs:
                    sfn = self._get_suffix_prefill_fn(sb, ns * pg)
                    tokens = jnp.zeros((1, sb), jnp.int32)
                    mask = jnp.zeros((1, sb), jnp.int32).at[0, :1].set(1)
                    sfn(self.model.params, tokens, mask, pk, pv,
                        jnp.int32(0))
        wins = sorted({page_window_bucket(n, pg, self.pages_per_seq)
                       for n in range(1, max_ctx + 1)})
        zeros = jnp.zeros((self.max_slots,), jnp.int32)
        for s in (False, True) if sampling else (False,):
            step = self._decode_step_fn(s)
            for wb in wins:
                args = [self.model.params, self.k_pages, self.v_pages,
                        jnp.zeros((self.max_slots, wb), jnp.int32),
                        zeros, zeros,
                        jnp.full((self.max_slots,), -1, jnp.int32), zeros]
                if s:
                    args += [jnp.zeros((self.max_slots,), jnp.float32),
                             jnp.ones((self.max_slots,), jnp.float32),
                             zeros, zeros, zeros]
                self.k_pages, self.v_pages, _, _ = step(*args)
        if self.decode_block > 1:
            # block variants retrace per table width like the one-step fn;
            # the reachable bucket set is the same (page_window_bucket is
            # monotone and the near-cap guard falls back to one-step)
            for s in (False, True) if sampling else (False,):
                bfn = self._decode_block_fn(s)
                for wb in wins:
                    args = [self.model.params, self.k_pages, self.v_pages,
                            jnp.zeros((self.max_slots, wb), jnp.int32),
                            zeros, zeros,
                            jnp.full((self.max_slots,), -1, jnp.int32), zeros]
                    if s:
                        args += [jnp.zeros((self.max_slots,), jnp.float32),
                                 jnp.ones((self.max_slots,), jnp.float32),
                                 zeros, zeros, zeros]
                    self.k_pages, self.v_pages, _ = bfn(*args)

    def _append_paged(self, slot: int, tok: int) -> bool:
        """Append ONE generated token to a live slot: advance the host
        mirrors, stream it (the post-EOS token is excluded from the output
        so it is not streamed either), retire on EOS/max_new. Returns True
        when the slot retired. The single source of truth for retirement
        semantics — used by the one-step and the block path."""
        st = self.slots[slot]
        self.lengths[slot] += 1
        self.cur_tokens[slot] = tok
        st.generated.append(tok)
        req = st.req
        hit_eos = (req.eos_token_id is not None
                   and st.generated[-2] == req.eos_token_id)
        if not hit_eos and len(st.generated) - 1 < req.max_new_tokens:
            self._emit(req.req_id, len(st.generated) - 1, tok)
        if hit_eos or len(st.generated) - 1 >= req.max_new_tokens:
            out = st.generated[: req.max_new_tokens]
            if req.eos_token_id is not None and req.eos_token_id in out:
                out = out[: out.index(req.eos_token_id) + 1]
            self.finished[req.req_id] = np.asarray(out, np.int32)
            self._streamed.pop(req.req_id, None)
            self._hash_memo.pop(req.req_id, None)
            st.req = None
            st.generated = []
            self._temps[slot] = 0.0
            self._eos[slot] = -1
            self._min_new[slot] = 0
            self._free_slot_pages(slot)
            self.lengths[slot] = 0
            return True
        return False

    def step(self) -> list[int]:
        self._admit()
        active = [st.req is not None for st in self.slots]
        if not any(active):
            return []
        nblk = self.decode_block
        if nblk > 1:
            # a block writes nblk positions per slot unconditionally (a
            # mid-block retiree keeps writing garbage into ITS OWN pages);
            # near the per-sequence context cap those positions could not be
            # backed by owned pages — run the tail single-step instead
            mx = max(int(self.lengths[i])
                     for i, a in enumerate(active) if a)
            if mx + nblk > self.pages_per_seq * self.page_size:
                nblk = 1

        # grow page tables to cover the next nblk writes per slot; on pool
        # exhaustion PREEMPT the youngest sequence (vLLM recompute policy):
        # free its pages and re-queue the request — decoding is
        # deterministic per (seed, token index), so the restarted request
        # produces the same final output
        for slot, st in enumerate(self.slots):
            if st.req is None:
                continue
            ln = int(self.lengths[slot])  # host-side, no device sync
            needed = self._pages_needed(ln + nblk)
            have = int(np.count_nonzero(self.tables[slot]))
            while needed > have:
                while not self._free:
                    if self._cached:
                        self._evict_one()
                        continue
                    victims = [
                        i for i, s2 in enumerate(self.slots)
                        if s2.req is not None and i != slot
                    ]
                    if not victims:
                        raise RuntimeError(
                            "page pool exhausted by a single sequence; "
                            "increase total_pages"
                        )
                    v = victims[-1]
                    self.stats.preemptions += 1
                    self._drain = True
                    self.queue.appendleft(self.slots[v].req)
                    self.slots[v].req = None
                    self.slots[v].generated = []
                    self._temps[v] = 0.0
                    self._eos[v] = -1
                    self._min_new[v] = 0
                    self._free_slot_pages(v)
                    self.lengths[v] = 0
                self.tables[slot, have] = self._alloc(1)[0]
                have += 1
        active = [st.req is not None for st in self.slots]
        if not any(active):
            return []

        sampling = any(self._temps[i] > 0 for i, a in enumerate(active) if a)
        fn = (self._decode_block_fn(sampling) if nblk > 1
              else self._decode_step_fn(sampling))
        # Static page window covering every live position through the block
        # (lengths are host-known): the attention kernel walks the table
        # width it is given, so slicing the tables keeps its DMA
        # length-proportional (the page-space analog of serving.py's
        # window-bucketed decode). Bucketed to powers of two so recompiles
        # stay rare; the in-window write ordinal lengths // pg < wb is
        # guaranteed by the preallocation above.
        need = max(
            int(self.lengths[i]) for i, a in enumerate(active) if a
        ) + nblk
        wb = page_window_bucket(need, self.page_size, self.pages_per_seq)
        min_left = np.array([
            max(0, self._min_new[i] - len(st.generated))
            for i, st in enumerate(self.slots)
        ], np.int32)
        args = [self.model.params, self.k_pages, self.v_pages,
                jnp.asarray(self.tables[:, :wb]), jnp.asarray(self.lengths),
                jnp.asarray(self.cur_tokens),
                jnp.asarray(self._eos), jnp.asarray(min_left)]
        if sampling:
            steps = np.array([len(st.generated) for st in self.slots], np.int32)
            args += [jnp.asarray(self._temps), jnp.asarray(self._top_ps),
                     jnp.asarray(self._top_ks), jnp.asarray(self._seeds),
                     jnp.asarray(steps)]
        t0 = time.perf_counter()
        if nblk > 1:
            self.k_pages, self.v_pages, toks = fn(*args)
            toks_np = np.asarray(toks)  # the ONE device sync per BLOCK
        else:
            self.k_pages, self.v_pages, _, nxt = fn(*args)
            toks_np = np.asarray(nxt)[None]   # [1, B]
        self.stats.steps += nblk
        self.stats.step_time_s += time.perf_counter() - t0

        done_ids = []
        for slot, st in enumerate(self.slots):
            if st.req is None:
                self.lengths[slot] = 0
                continue
            rid = st.req.req_id
            for j in range(nblk):
                self.stats.tokens_generated += 1
                if self._append_paged(slot, int(toks_np[j, slot])):
                    done_ids.append(rid)
                    break
        self.stats.requests_completed += len(done_ids)
        if done_ids:
            self._drain = False          # capacity freed; admissions resume
        return done_ids

    def run(self, requests: list[Request]) -> dict[int, np.ndarray]:
        for r in requests:
            self.submit(r)
        while self.queue or any(st.req is not None for st in self.slots):
            self.step()
        out, self.finished = self.finished, {}
        return out


__all__ = ["PagedContinuousBatchEngine"]
