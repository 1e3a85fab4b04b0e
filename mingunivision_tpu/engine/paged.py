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
  - Pages are a static-shape pool (L, P, Hkv, page, D); the block table is a
    small int32 array recomputed on the host and shipped per step (a few KB —
    nothing next to the decode step's weight traffic). One compiled step serves
    every allocation pattern: no recompiles as pages move between slots.
  - Attention reads pages THROUGH the table: on TPU a Pallas kernel
    (ops/kernels/paged_attention.py) DMAs exactly the owned pages via scalar
    prefetch; elsewhere an XLA gather fallback keeps parity.
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
    k_pages: jax.Array  # (L, P+1, Hkv, page, D) — page P is scratch
    v_pages: jax.Array
    lengths: jax.Array  # (B,) int32 tokens in cache per slot
    cur: jax.Array  # (B,) int32 next token to feed
    active: jax.Array  # (B,) bool
    sampling: SamplingState

    @classmethod
    def create(cls, cfg: BailingMoeConfig, slots: int, num_pages: int, page_size: int, dtype=jnp.bfloat16):
        shape = (cfg.num_hidden_layers, num_pages + 1, cfg.num_key_value_heads, page_size, cfg.head_dim)
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
        from mingunivision_tpu.ops.kernels.paged_attention import pallas_paged_decode_attention

        return pallas_paged_decode_attention(q, kc, vc, tables, lengths, scale=D**-0.5)
    from mingunivision_tpu.ops.kernels.paged_attention import paged_gather_attention

    return paged_gather_attention(q, kc, vc, tables, lengths, scale=D**-0.5)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def paged_decode_step(params, cfg: BailingMoeConfig, state: PagedKVState, tables, key):
    """One decode step for every active slot over the paged pool.

    tables: (B, maxp) int32 — host-maintained block tables (scratch id for
    unassigned entries). Mirrors engine.batch_engine.batched_decode_step:
    per-slot sampling params, eos/image-start finish detection, inactive rows
    compute but write only the scratch page.
    """
    B = state.cur.shape[0]
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    page = state.k_pages.shape[3]
    scratch_pid = state.k_pages.shape[1] - 1
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

    def layer(carry, inp):
        h = carry
        p, layer_idx, kc, vc = inp  # kc/vc: (P+1, Hkv, page, D)
        hn = rms_norm(h, p["input_layernorm"]["w"], eps=cfg.rms_norm_eps)
        qkv = dense(hn, p["attention"]["query_key_value"]).reshape(B, 1, Hq + 2 * Hkv, D)
        q, kn, vn = jnp.split(qkv, [Hq, Hq + Hkv], axis=2)
        q, kn = apply_rope(q, kn, cos, sin)
        # page-addressed write; inactive rows target the scratch page, so no
        # scatter index ever collides with a live page
        kc = kc.at[page_idx[:, None], hidx, off[:, None]].set(kn[:, 0].astype(kc.dtype))
        vc = vc.at[page_idx[:, None], hidx, off[:, None]].set(vn[:, 0].astype(vc.dtype))
        a = _paged_attention(q, kc, vc, tables, attn_len)
        h = h + dense(a.reshape(B, 1, Hq * D), p["attention"]["dense"])
        hn = rms_norm(h, p["post_attention_layernorm"]["w"], eps=cfg.rms_norm_eps)
        from mingunivision_tpu.models.bailing_moe import moe_block_apply

        h = h + moe_block_apply(p["mlp"], cfg, hn, experts_stacked=experts_stacked, layer_idx=layer_idx)
        return h, (kc, vc)

    layer_ids = jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)
    h, (nk, nv) = lax.scan(layer, x, (scanned, layer_ids, state.k_pages, state.v_pages))
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
    lands on the scratch page and is never read).
    """
    L, _, Hkv, Smax, D = cache_k.shape
    page = k_pages.shape[3]
    maxp = page_ids.shape[0]

    def body(i, kv):
        kp, vp = kv
        src_k = lax.dynamic_slice(cache_k, (0, 0, 0, i * page, 0), (L, 1, Hkv, page, D))[:, 0]
        src_v = lax.dynamic_slice(cache_v, (0, 0, 0, i * page, 0), (L, 1, Hkv, page, D))[:, 0]
        pid = page_ids[i]
        return kp.at[:, pid].set(src_k.astype(kp.dtype)), vp.at[:, pid].set(src_v.astype(vp.dtype))

    return lax.fori_loop(0, maxp, body, (k_pages, v_pages))


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


class PagedBatchingEngine:
    """ContinuousBatchingEngine with block-paged KV (same host interface).

    `num_pages * page_size` is the pool's TOKEN budget, shared by all slots —
    set it to the expected tokens in flight, not slots * max_len. A slot that
    needs a page when the pool is exhausted STALLS (drops its active bit, keeps
    its pages and sampling state) and resumes automatically when pages free up.
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
        self.slot_pages: Dict[int, List[int]] = {}
        self.slot_lengths: Dict[int, int] = {}  # host mirror of lengths
        self.stalled: Dict[int, bool] = {}
        self.key = jax.random.PRNGKey(seed)
        self.sampling = dict(do_sample=do_sample, temperature=temperature, top_k=top_k, top_p=top_p)
        self.slot_req: Dict[int, Request] = {}
        self.slot_budget: Dict[int, int] = {}
        self._next_id = 0

    # -- admission ----------------------------------------------------------

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
    ) -> Optional[Request]:
        """Admit a request. None if no slot is free OR the prompt's pages can't
        be allocated right now (caller retries after other requests finish)."""
        slot = self._free_slot()
        if slot is None:
            return None
        ids = np.asarray(input_ids).reshape(-1)
        T = len(ids)
        assert T + max_new_tokens < self.max_len
        n_pages = (T + 1 + self.page - 1) // self.page  # covers the first decode write
        pages = self.allocator.alloc(n_pages)
        if pages is None:
            return None
        req = Request(ids, max_new_tokens, self._next_id, do_sample=do_sample,
                      temperature=temperature, top_k=top_k, top_p=top_p)
        self._next_id += 1
        req_sampling = {
            k: (getattr(req, k) if getattr(req, k) is not None else self.sampling[k])
            for k in ("do_sample", "temperature", "top_k", "top_p")
        }

        # bucketed single-row dense prefill, then page-copy (same prefill graph
        # as the dense engine: parity by construction)
        from mingunivision_tpu.engine.generate import prefill

        Tb = min(self.max_len, -(-T // PREFILL_BUCKET) * PREFILL_BUCKET)
        ids_pad = np.zeros((1, Tb), np.int64)
        ids_pad[0, :T] = ids
        cache1 = LLMCache.create(self.cfg, 1, self.max_len, self.state.k_pages.dtype)
        mask1 = jnp.zeros((1, self.max_len), bool).at[:, :T].set(True)
        embeds = embed_tokens(self.params, jnp.asarray(ids_pad)).astype(self.state.k_pages.dtype)
        logits, cache1 = prefill(self.params, self.cfg, embeds, cache1, mask1)
        self.key, sub = jax.random.split(self.key)
        first = int(sample_token(logits, sub, **req_sampling)[0])

        page_ids = np.full((self.maxp,), self.scratch_pid, np.int32)
        page_ids[: len(pages)] = pages
        kp, vp = _admit_pages(
            self.state.k_pages, self.state.v_pages, cache1.k, cache1.v, jnp.asarray(page_ids)
        )
        self.state = self.state._replace(
            k_pages=kp,
            v_pages=vp,
            sampling=self.state.sampling.set_slot(slot, **req_sampling),
        )
        self.state = _set_slot(self.state, slot, jnp.int32(T), jnp.int32(first), True)
        self.tables[slot] = page_ids
        self.slot_pages[slot] = list(pages)
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
        self.allocator.release(self.slot_pages.pop(slot, []))
        self.tables[slot] = self.scratch_pid
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
                got = self.allocator.alloc(need - owned)
                if got is None:
                    if not self.stalled[slot]:
                        self.stalled[slot] = True
                        self.state = _set_active(self.state, jnp.int32(slot), False)
                    continue
                self.tables[slot, owned : owned + len(got)] = got
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
        self.state, toks = paged_decode_step(
            self.params, self.cfg, self.state, jnp.asarray(self.tables), sub
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
