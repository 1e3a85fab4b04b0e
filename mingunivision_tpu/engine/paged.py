"""Block-paged continuous-batching engine (the vLLM PagedAttention analog).

The dense pool (engine/batch_engine.py) reserves `max_len` KV positions per
slot: pool HBM = slots * max_len regardless of actual sequence lengths. This
module stores KV in fixed-size PAGES owned by a host-side block allocator; a
slot addresses its pages through a block table, pages are allocated lazily as
the sequence grows and returned the moment the request finishes. Pool HBM
scales with TOKENS IN FLIGHT, so the same chip serves far more concurrent
sequences at long max_len (reference bar: vLLM's PagedAttention memory model,
which the reference's serving path rides — vllm/ming_lite.patch; SURVEY §2.9).

TPU-first decisions:
  - Pages are a static-shape HEAD-major pool (L, Hkv, P, page, D) — the native
    layout of the library paged-attention kernel; the block table is a small
    int32 array recomputed on the host, kept device-resident, and re-shipped
    only when it mutates. One compiled step serves every allocation pattern:
    no recompiles as pages move between slots.
  - Attention reads pages THROUGH the table: on TPU the JAX library
    paged-attention kernel (multi-page compute blocks, double-buffered page
    DMA) with our single-page scalar-prefetch kernel as fallback
    (ops/kernels/paged_attention.py); elsewhere an XLA gather keeps parity.
  - Page P (the last one) is a reserved SCRATCH page: inactive rows' KV writes
    and unassigned table entries land there, so scatter indices never collide
    with live pages (a `where(active, old, new)` on a shared real page would
    race under XLA scatter).
  - Allocation exhaustion STALLS a slot (its active bit drops; its pages stay)
    until another request frees pages — admission-ordered resume, no eviction.

Parity contract: with enough pages, the paged engine emits BIT-IDENTICAL
tokens to ContinuousBatchingEngine for the same requests/keys (tests).
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mingunivision_tpu.config import BailingMoeConfig
from mingunivision_tpu.engine.batch_engine import PREFILL_BUCKET, Request, SamplingState
from mingunivision_tpu.engine.sampler import sample_token, sample_token_per_slot
from mingunivision_tpu.models.bailing_moe import LLMCache, embed_tokens
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.norms import rms_norm
from mingunivision_tpu.ops.rope import apply_rope, rope_cos_sin


class PagedKVState(NamedTuple):
    k_pages: jax.Array  # (L, Hkv, P+1, page, D) — page P is scratch; head-major
    v_pages: jax.Array  # (the library paged-attention kernel's native layout)
    lengths: jax.Array  # (B,) int32 tokens in cache per slot
    cur: jax.Array  # (B,) int32 next token to feed
    active: jax.Array  # (B,) bool
    sampling: SamplingState

    @classmethod
    def create(cls, cfg: BailingMoeConfig, slots: int, num_pages: int, page_size: int, dtype=jnp.bfloat16):
        shape = (cfg.num_hidden_layers, cfg.num_key_value_heads, num_pages + 1, page_size, cfg.head_dim)
        return cls(
            jnp.zeros(shape, dtype),
            jnp.zeros(shape, dtype),
            jnp.zeros((slots,), jnp.int32),
            jnp.zeros((slots,), jnp.int32),
            jnp.zeros((slots,), bool),
            SamplingState.create(slots),
        )


def _paged_attention(q, kc, vc, tables, lengths):
    D = q.shape[-1]
    if jax.default_backend() == "tpu":
        from mingunivision_tpu.ops.kernels.paged_attention import paged_decode_attention_auto

        return paged_decode_attention_auto(q, kc, vc, tables, lengths, scale=D**-0.5)
    from mingunivision_tpu.ops.kernels.paged_attention import paged_gather_attention

    return paged_gather_attention(q, kc, vc, tables, lengths, scale=D**-0.5)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def paged_decode_step(params, cfg: BailingMoeConfig, state: PagedKVState, tables, key, lora_bank=None, lora_ids=None):
    """One decode step for every active slot over the paged pool.

    tables: (B, maxp) int32 — host-maintained block tables (scratch id for
    unassigned entries). Mirrors engine.batch_engine.batched_decode_step:
    per-slot sampling params, eos/image-start finish detection, inactive rows
    compute but write only the scratch page.
    """
    B = state.cur.shape[0]
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    page = state.k_pages.shape[3]
    scratch_pid = state.k_pages.shape[2] - 1
    rows = jnp.arange(B)

    write_pos = state.lengths  # 0-based index of the token written this step
    page_slot = write_pos // page
    page_idx = tables[rows, page_slot]  # (B,) owned page for the write
    page_idx = jnp.where(state.active, page_idx, scratch_pid)
    off = write_pos % page
    # attention sees the just-written token
    attn_len = jnp.where(state.active, state.lengths + 1, state.lengths)

    positions = write_pos[:, None]
    cos, sin = rope_cos_sin(positions, D, cfg.rope_theta)
    x = embed_tokens(params, state.cur[:, None]).astype(state.k_pages.dtype)

    layers = params["layers"]
    experts_stacked = layers["mlp"]["experts"]
    scanned = {**layers, "mlp": {k: v for k, v in layers["mlp"].items() if k != "experts"}}
    hidx = jnp.arange(Hkv)[None, :]

    from mingunivision_tpu.models.bailing_moe import _dense_lora

    def layer(carry, inp):
        h = carry
        p, layer_idx, kc, vc, lora = inp  # kc/vc: (Hkv, P+1, page, D)
        hn = rms_norm(h, p["input_layernorm"]["w"], eps=cfg.rms_norm_eps)
        qkv = _dense_lora(hn, p["attention"]["query_key_value"], lora, "query_key_value", lora_ids).reshape(B, 1, Hq + 2 * Hkv, D)
        q, kn, vn = jnp.split(qkv, [Hq, Hq + Hkv], axis=2)
        q, kn = apply_rope(q, kn, cos, sin)
        # page-addressed write; inactive rows target the scratch page, so no
        # scatter index ever collides with a live page
        kc = kc.at[hidx, page_idx[:, None], off[:, None]].set(kn[:, 0].astype(kc.dtype))
        vc = vc.at[hidx, page_idx[:, None], off[:, None]].set(vn[:, 0].astype(vc.dtype))
        a = _paged_attention(q, kc, vc, tables, attn_len)
        h = h + _dense_lora(a.reshape(B, 1, Hq * D), p["attention"]["dense"], lora, "dense", lora_ids)
        hn = rms_norm(h, p["post_attention_layernorm"]["w"], eps=cfg.rms_norm_eps)
        from mingunivision_tpu.models.bailing_moe import moe_block_apply

        h = h + moe_block_apply(p["mlp"], cfg, hn, experts_stacked=experts_stacked, layer_idx=layer_idx, lora=lora, lora_ids=lora_ids)
        return h, (kc, vc)

    layer_ids = jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)
    h, (nk, nv) = lax.scan(layer, x, (scanned, layer_ids, state.k_pages, state.v_pages, lora_bank))
    h = rms_norm(h, params["norm"]["w"], eps=cfg.rms_norm_eps)

    from mingunivision_tpu.models.bailing_moe import compute_logits as _logits

    logits = _logits(params, cfg, h)[:, -1]
    sp = state.sampling
    nxt = sample_token_per_slot(
        logits, key, do_sample=sp.do_sample, temperature=sp.temperature, top_k=sp.top_k, top_p=sp.top_p
    )
    done = jnp.logical_or(nxt == cfg.eos_token_id, nxt == cfg.image_start_token)
    new_lengths = jnp.where(state.active, state.lengths + 1, state.lengths)
    new_active = jnp.logical_and(state.active, jnp.logical_not(done))
    out_tokens = jnp.where(state.active, nxt, -1)
    return (
        PagedKVState(nk, nv, new_lengths, jnp.where(state.active, nxt, state.cur), new_active, sp),
        out_tokens,
    )


@functools.partial(jax.jit, donate_argnames=("k_pages", "v_pages"))
def _admit_pages(k_pages, v_pages, cache_k, cache_v, page_ids):
    """Copy a prefilled dense cache row into the assigned pages.

    cache_k/v: (L, 1, Hkv, Smax, D); page_ids: (maxp,) int32 — destination page
    per Smax/page chunk, SCRATCH id for chunks past the prompt (their garbage
    lands on the scratch page and is never read). Pool is (L, Hkv, P+1, page, D).
    """
    L, _, Hkv, Smax, D = cache_k.shape
    page = k_pages.shape[3]
    maxp = page_ids.shape[0]

    def body(i, kv):
        kp, vp = kv
        src_k = lax.dynamic_slice(cache_k, (0, 0, 0, i * page, 0), (L, 1, Hkv, page, D))[:, 0]
        src_v = lax.dynamic_slice(cache_v, (0, 0, 0, i * page, 0), (L, 1, Hkv, page, D))[:, 0]
        pid = page_ids[i]
        return (
            kp.at[:, :, pid].set(src_k.astype(kp.dtype)),
            vp.at[:, :, pid].set(src_v.astype(vp.dtype)),
        )

    return lax.fori_loop(0, maxp, body, (k_pages, v_pages))


@functools.partial(jax.jit, donate_argnames=("cache_k", "cache_v"))
def _gather_pages(cache_k, cache_v, k_pages, v_pages, page_ids, n_pages):
    """Inverse of `_admit_pages`: copy the first `n_pages` table entries into a
    dense cache row (prefix-cache hit — the reused prefix KV seeds the dense
    cache the suffix prefill appends to). `n_pages` is a traced scalar so one
    compiled graph serves every hit length."""
    L, _, Hkv, Smax, D = cache_k.shape
    page = k_pages.shape[3]

    def body(i, kv):
        ck, cv = kv
        pid = page_ids[i]
        src_k = k_pages[:, :, pid][:, None]  # (L, 1, Hkv, page, D)
        src_v = v_pages[:, :, pid][:, None]
        ck = lax.dynamic_update_slice(ck, src_k.astype(ck.dtype), (0, 0, 0, i * page, 0))
        cv = lax.dynamic_update_slice(cv, src_v.astype(cv.dtype), (0, 0, 0, i * page, 0))
        return ck, cv

    return lax.fori_loop(0, n_pages, body, (cache_k, cache_v))


@functools.partial(jax.jit, donate_argnames=("state",))
def _set_slot(state: PagedKVState, slot, length, cur, active):
    return state._replace(
        lengths=state.lengths.at[slot].set(length),
        cur=state.cur.at[slot].set(cur),
        active=state.active.at[slot].set(active),
    )


@functools.partial(jax.jit, donate_argnames=("state",))
def _set_active(state: PagedKVState, slot, active):
    return state._replace(active=state.active.at[slot].set(active))


class PageAllocator:
    """Host free-list over the page pool (page ids 0..P-1; P is scratch)."""

    def __init__(self, num_pages: int):
        self.free: List[int] = list(range(num_pages - 1, -1, -1))

    def alloc(self, n: int) -> Optional[List[int]]:
        if n > len(self.free):
            return None
        return [self.free.pop() for _ in range(n)]

    def release(self, pages: List[int]):
        self.free.extend(pages)

    @property
    def available(self) -> int:
        return len(self.free)


class PrefixPageCache:
    """Content-addressed registry of full-page prompt KV (vLLM automatic
    prefix caching analog; reference bar: vLLM APC over the serving path the
    reference rides, SURVEY §2.9).

    A full page of KV is identified by the CHAIN digest of every token id from
    position 0 through the page's end (K/V at position i depend on the whole
    prefix, so content-addressing must too — same scheme as vLLM's block
    hashes). Keys are sha256 chain digests, not Python `hash()`: a 64-bit
    non-crypto hash collision would silently serve another request's KV
    (vLLM hardened the same scheme the same way). Pages whose refcount drops
    to 0 are RETAINED in LRU order and evicted only when the allocator runs
    dry."""

    def __init__(self):
        from collections import OrderedDict

        self.hash_to_page: Dict[bytes, int] = {}
        self.page_hash: Dict[int, bytes] = {}
        self.ref: Dict[int, int] = {}
        self.lru = OrderedDict()  # refcount-0 registered pages, oldest first

    @staticmethod
    def chain_hashes(ids: np.ndarray, page: int, salt: bytes = b"") -> List[bytes]:
        """One digest per FULL page of the prompt (partial tail pages are not
        content-addressable: their KV would keep growing). `salt` partitions
        the address space — LoRA requests salt with their adapter id, since KV
        computed under different adapters is NOT interchangeable."""
        import hashlib

        hs: List[bytes] = []
        h = salt
        for i in range(len(ids) // page):
            h = hashlib.sha256(h + np.asarray(ids[i * page : (i + 1) * page], np.int64).tobytes()).digest()
            hs.append(h)
        return hs

    def lookup(self, h: bytes) -> Optional[int]:
        return self.hash_to_page.get(h)

    def pin(self, pid: int):
        self.lru.pop(pid, None)
        self.ref[pid] = self.ref.get(pid, 0) + 1

    def unpin(self, pid: int):
        self.ref[pid] -= 1
        if self.ref[pid] == 0:
            self.lru[pid] = None  # reclaimable, retained until pressure

    def register(self, h: bytes, pid: int):
        """Map h -> pid with refcount 1 (the admitting slot owns it). No-op if
        another page already holds this hash (possible after partial eviction
        punched a hole in an earlier chain)."""
        if h in self.hash_to_page:
            return False
        self.hash_to_page[h] = pid
        self.page_hash[pid] = h
        self.ref[pid] = self.ref.get(pid, 0)
        return True

    def evict_one(self) -> Optional[int]:
        """Drop the oldest refcount-0 cached page; returns its id (now free)."""
        if not self.lru:
            return None
        pid, _ = self.lru.popitem(last=False)
        h = self.page_hash.pop(pid)
        del self.hash_to_page[h]
        del self.ref[pid]
        return pid

    @property
    def cached_pages(self) -> int:
        return len(self.page_hash)


class PagedBatchingEngine:
    """ContinuousBatchingEngine with block-paged KV (same host interface).

    `num_pages * page_size` is the pool's TOKEN budget, shared by all slots —
    set it to the expected tokens in flight, not slots * max_len. A slot that
    needs a page when the pool is exhausted STALLS (drops its active bit, keeps
    its pages and sampling state) and resumes automatically when pages free up.

    `prefix_cache=True` enables automatic prefix caching (the vLLM APC analog):
    full prompt pages are content-addressed by token-chain hash; a request
    whose prompt prefix is cached shares those pages (refcounted) and prefills
    only the suffix. Refcount-0 cached pages persist in LRU order and are
    evicted under allocation pressure. Shared pages are never written: decode
    writes land at positions >= T, always past the last shared full page.
    """

    def __init__(
        self,
        params,
        cfg: BailingMoeConfig,
        *,
        slots: int = 4,
        max_len: int = 1024,
        page_size: int = 64,
        num_pages: Optional[int] = None,
        dtype=jnp.bfloat16,
        seed: int = 0,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        prefix_cache: bool = False,
        lora_bank=None,
        lora_names: Optional[List[str]] = None,
    ):
        assert max_len % page_size == 0, "max_len must be a multiple of page_size"
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.max_len = max_len
        self.page = page_size
        self.maxp = max_len // page_size
        # default budget: half the dense pool's reservation
        self.num_pages = int(num_pages) if num_pages is not None else max(self.maxp, slots * self.maxp // 2)
        self.scratch_pid = self.num_pages
        self.state = PagedKVState.create(cfg, slots, self.num_pages, page_size, dtype)
        self.allocator = PageAllocator(self.num_pages)
        self.tables = np.full((slots, self.maxp), self.scratch_pid, np.int32)
        # device-resident mirror of the block table, re-uploaded ONLY when the
        # host table mutates (admission / page growth / finish). Shipping it
        # every step costs a host->device round-trip per decode step — on the
        # axon tunnel that RTT is a real fraction of the 25-44% paged tax
        # (VERDICT r3 weak #3).
        self._tables_dev = None
        self._tables_dirty = True
        self.slot_pages: Dict[int, List[int]] = {}
        self.slot_lengths: Dict[int, int] = {}  # host mirror of lengths
        self.stalled: Dict[int, bool] = {}
        self.key = jax.random.PRNGKey(seed)
        self.sampling = dict(do_sample=do_sample, temperature=temperature, top_k=top_k, top_p=top_p)
        self.slot_req: Dict[int, Request] = {}
        self.slot_budget: Dict[int, int] = {}
        self._next_id = 0
        self.prefix = PrefixPageCache() if prefix_cache else None
        self.prefix_hit_tokens = 0  # prompt tokens whose prefill was SKIPPED
        self.prefix_miss_tokens = 0  # prompt tokens actually prefilled
        self.lora_bank = lora_bank
        from mingunivision_tpu.lora import LoRARegistry

        self.lora_registry = LoRARegistry(lora_names)
        self.slot_lora = np.zeros((slots,), np.int32)
        self._lora_dev = None  # device mirror, refreshed with the block table

    # -- admission ----------------------------------------------------------

    def _alloc(self, n: int) -> Optional[List[int]]:
        """allocator.alloc with prefix-cache eviction under pressure: cached
        refcount-0 pages are reclaimed LRU-first until n pages are free.

        Bails out (evicting NOTHING) when the request cannot succeed even after
        draining the whole LRU — an oversized allocation must not destroy the
        reusable prefix cache just to fail anyway."""
        evictable = len(self.prefix.lru) if self.prefix is not None else 0
        if n > self.allocator.available + evictable:
            return None
        while self.allocator.available < n and self.prefix is not None:
            pid = self.prefix.evict_one()
            if pid is None:
                break
            self.allocator.release([pid])
        return self.allocator.alloc(n)

    def _release_pages(self, pages: List[int]):
        """Return a finished slot's pages: registered (content-addressed) pages
        are unpinned into the prefix cache's LRU; plain pages go straight back
        to the free list."""
        for pid in pages:
            if self.prefix is not None and pid in self.prefix.page_hash:
                self.prefix.unpin(pid)
            else:
                self.allocator.release([pid])

    def _free_slot(self) -> Optional[int]:
        for b in range(self.slots):
            if b not in self.slot_req:
                return b
        return None

    def has_free_slot(self) -> bool:
        return self._free_slot() is not None

    def add_request(
        self,
        input_ids: np.ndarray,
        max_new_tokens: int = 128,
        *,
        do_sample: Optional[bool] = None,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        lora: Optional[str] = None,
    ) -> Optional[Request]:
        """Admit a request. None if no slot is free OR the prompt's pages can't
        be allocated right now (caller retries after other requests finish).
        `lora` names an adapter from the engine's bank (None = base model);
        prefix-cache pages are SALTED by adapter id — KV computed under
        different adapters never cross-hits."""
        slot = self._free_slot()
        if slot is None:
            return None
        lora_id = self.lora_registry.resolve(lora)
        ids = np.asarray(input_ids).reshape(-1)
        T = len(ids)
        assert T + max_new_tokens < self.max_len
        n_pages = (T + 1 + self.page - 1) // self.page  # covers the first decode write

        # Prefix-cache probe: longest run of already-cached full pages, capped
        # so at least one prompt token is always recomputed (the sampler needs
        # the last position's logits — same cap as vLLM's "recompute last block").
        hashes: List[bytes] = []
        hit_pages: List[int] = []
        if self.prefix is not None:
            salt = lora_id.to_bytes(8, "little") if lora_id else b""
            hashes = self.prefix.chain_hashes(ids, self.page, salt=salt)
            for h in hashes[: (T - 1) // self.page]:
                pid = self.prefix.lookup(h)
                if pid is None:
                    break
                hit_pages.append(pid)
        n_hit = len(hit_pages)
        for pid in hit_pages:  # pin BEFORE allocating so eviction can't take them
            self.prefix.pin(pid)
        pages = self._alloc(n_pages - n_hit)
        if pages is None:
            for pid in hit_pages:
                self.prefix.unpin(pid)
            return None
        req = Request(ids, max_new_tokens, self._next_id, do_sample=do_sample,
                      temperature=temperature, top_k=top_k, top_p=top_p, lora_id=lora_id)
        self._next_id += 1
        req_sampling = {
            k: (getattr(req, k) if getattr(req, k) is not None else self.sampling[k])
            for k in ("do_sample", "temperature", "top_k", "top_p")
        }

        # bucketed single-row dense prefill, then page-copy (same prefill graph
        # as the dense engine: parity by construction). On a prefix hit only the
        # SUFFIX is prefilled: hit pages are gathered into the dense cache
        # (cache.length = Tc) and `prefill` appends at positions [Tc, T) —
        # the multi-round append path engine/generate.py:93-117 already honors.
        from mingunivision_tpu.engine.generate import prefill

        Tc = n_hit * self.page  # cached prompt tokens whose prefill is skipped
        Ts = T - Tc
        # The padded suffix must fit in [Tc, max_len): an uncapped bucket pad
        # (Tc + Tb > max_len, possible when page_size < PREFILL_BUCKET leaves Tc
        # bucket-misaligned with T near max_len) would make prefill's
        # dynamic_update_slice CLAMP its start and silently overwrite the
        # gathered prefix KV. Capped at max_len - Tc it always fits: admission
        # asserts T < max_len, so Ts = T - Tc <= max_len - Tc.
        Tb = min(self.max_len - Tc, -(-Ts // PREFILL_BUCKET) * PREFILL_BUCKET)
        assert Ts <= Tb and Tc + Tb <= self.max_len, (Tc, Ts, Tb, self.max_len)
        ids_pad = np.zeros((1, Tb), np.int64)
        ids_pad[0, :Ts] = ids[Tc:]
        cache1 = LLMCache.create(self.cfg, 1, self.max_len, self.state.k_pages.dtype)
        if n_hit:
            gids = np.full((self.maxp,), self.scratch_pid, np.int32)
            gids[:n_hit] = hit_pages
            ck, cv = _gather_pages(
                cache1.k, cache1.v, self.state.k_pages, self.state.v_pages,
                jnp.asarray(gids), jnp.int32(n_hit),
            )
            cache1 = LLMCache(ck, cv, jnp.asarray(Tc, jnp.int32))
        mask1 = jnp.zeros((1, self.max_len), bool).at[:, :T].set(True)
        embeds = embed_tokens(self.params, jnp.asarray(ids_pad)).astype(self.state.k_pages.dtype)
        logits, cache1 = prefill(
            self.params, self.cfg, embeds, cache1, mask1,
            lora_bank=self.lora_bank,
            lora_ids=jnp.full((1,), lora_id, jnp.int32) if self.lora_bank is not None else None,
        )
        self.key, sub = jax.random.split(self.key)
        first = int(sample_token(logits, sub, **req_sampling)[0])
        self.prefix_hit_tokens += Tc
        self.prefix_miss_tokens += Ts

        page_ids = np.full((self.maxp,), self.scratch_pid, np.int32)
        page_ids[:n_hit] = hit_pages
        page_ids[n_hit : n_hit + len(pages)] = pages
        # copy only the NEWLY computed chunks into their pages — shared hit
        # pages already hold identical KV, and rewriting them would race with
        # other slots reading them this step.
        copy_ids = page_ids.copy()
        copy_ids[:n_hit] = self.scratch_pid
        kp, vp = _admit_pages(
            self.state.k_pages, self.state.v_pages, cache1.k, cache1.v, jnp.asarray(copy_ids)
        )
        self.state = self.state._replace(
            k_pages=kp,
            v_pages=vp,
            sampling=self.state.sampling.set_slot(slot, **req_sampling),
        )
        self.state = _set_slot(self.state, slot, jnp.int32(T), jnp.int32(first), True)
        self.slot_lora[slot] = lora_id
        self.tables[slot] = page_ids
        self._tables_dirty = True
        self.slot_pages[slot] = list(hit_pages) + list(pages)
        if self.prefix is not None:
            # content-address the freshly computed full prompt pages so later
            # requests with the same prefix skip their prefill
            for i in range(n_hit, len(hashes)):
                pid = int(page_ids[i])
                if self.prefix.register(hashes[i], pid):
                    self.prefix.pin(pid)
        self.slot_lengths[slot] = T
        self.stalled[slot] = False
        req.tokens.append(first)
        self.slot_req[slot] = req
        self.slot_budget[slot] = max_new_tokens - 1
        if first in (self.cfg.eos_token_id, self.cfg.image_start_token):
            self._finish(slot)
        return req

    def _finish(self, slot: int):
        req = self.slot_req.pop(slot, None)
        if req is not None:
            req.done = True
        self.slot_budget.pop(slot, None)
        self._release_pages(self.slot_pages.pop(slot, []))
        self.slot_lora[slot] = 0
        self.tables[slot] = self.scratch_pid
        self._tables_dirty = True
        self.slot_lengths.pop(slot, None)
        self.stalled.pop(slot, None)
        self.state = _set_active(self.state, jnp.int32(slot), False)

    # -- stepping -------------------------------------------------------------

    def _ensure_pages(self):
        """Lazy growth: every running slot must own the page its next write
        lands in. Exhaustion stalls the slot; freed pages resume it."""
        for slot in list(self.slot_req):
            if slot not in self.slot_lengths:
                continue
            pos = self.slot_lengths[slot]  # next write position
            need = pos // self.page + 1
            owned = len(self.slot_pages[slot])
            if need > owned:
                got = self._alloc(need - owned)
                if got is None:
                    if not self.stalled[slot]:
                        self.stalled[slot] = True
                        self.state = _set_active(self.state, jnp.int32(slot), False)
                    continue
                self.tables[slot, owned : owned + len(got)] = got
                self._tables_dirty = True
                self.slot_pages[slot].extend(got)
            if self.stalled.get(slot):
                self.stalled[slot] = False
                self.state = _set_active(self.state, jnp.int32(slot), True)

    def step(self) -> Dict[int, int]:
        """Advance all runnable slots one token. Returns {request_id: token}."""
        if not self.slot_req:
            return {}
        self._ensure_pages()
        if not any(not self.stalled.get(s, False) for s in self.slot_req):
            return {}  # everything stalled on pages — caller must finish/cancel
        self.key, sub = jax.random.split(self.key)
        if self._tables_dirty or self._tables_dev is None:
            self._tables_dev = jnp.asarray(self.tables)
            self._lora_dev = jnp.asarray(self.slot_lora) if self.lora_bank is not None else None
            self._tables_dirty = False
        self.state, toks = paged_decode_step(
            self.params, self.cfg, self.state, self._tables_dev, sub,
            lora_bank=self.lora_bank, lora_ids=self._lora_dev if self.lora_bank is not None else None,
        )
        toks = np.asarray(toks)
        active = np.asarray(self.state.active)
        out = {}
        for slot, req in list(self.slot_req.items()):
            t = int(toks[slot])
            if t < 0:
                continue
            req.tokens.append(t)
            out[req.request_id] = t
            self.slot_lengths[slot] += 1
            self.slot_budget[slot] -= 1
            if not active[slot] or self.slot_budget[slot] <= 0:
                self._finish(slot)
        return out

    def run_to_completion(self, max_steps: int = 10_000):
        steps = 0
        while self.slot_req and steps < max_steps:
            out = self.step()
            steps += 1
            if not out and all(self.stalled.get(s, False) for s in self.slot_req):
                break  # deadlocked on pages with nothing finishing
        return steps
