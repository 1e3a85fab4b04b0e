"""Continuous-batching text-generation engine (the vLLM-analog scheduler).

The reference serves the LLM through vLLM's continuous batching + paged
attention (S1, vllm/ming_lite.patch). TPU-native equivalent: a fixed pool of
slots over one batched static KV cache with PER-SLOT lengths; every decode step
advances all active slots in a single jitted forward (weights are read once per
step regardless of batch — decode is bandwidth-bound, so batching is nearly
free throughput). Requests are admitted into free slots (prefill writes the
slot's rows), finished slots are freed immediately.

This dense pool reserves `max_len` KV positions per slot — simple and
recompile-free, but pool HBM is slots * max_len regardless of actual lengths.
For long-max_len serving, engine/paged.py provides the block-paged tier
(vLLM PagedAttention analog): same host interface, KV in allocator-owned
pages, HBM ∝ tokens in flight.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mingunivision_tpu.config import BailingMoeConfig
from mingunivision_tpu.engine.sampler import sample_token, sample_token_per_slot
from mingunivision_tpu.models.bailing_moe import LLMCache, embed_tokens
from mingunivision_tpu.ops.attention import mha
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.norms import rms_norm
from mingunivision_tpu.ops.rope import apply_rope, rope_cos_sin


class SamplingState(NamedTuple):
    """PER-SLOT sampling params as device arrays (vLLM SamplingParams analog,
    ming_lite patch :2137-2157): a mixed greedy+sampled pool with different
    temperatures/top-k/top-p shares ONE compiled decode step."""

    do_sample: jax.Array  # (B,) bool
    temperature: jax.Array  # (B,) f32
    top_k: jax.Array  # (B,) int32 (0 = off)
    top_p: jax.Array  # (B,) f32 (1.0 = off)

    @classmethod
    def create(cls, slots: int):
        return cls(
            jnp.zeros((slots,), bool),
            jnp.ones((slots,), jnp.float32),
            jnp.zeros((slots,), jnp.int32),
            jnp.ones((slots,), jnp.float32),
        )

    def set_slot(self, slot: int, *, do_sample=False, temperature=1.0, top_k=0, top_p=1.0):
        return SamplingState(
            self.do_sample.at[slot].set(bool(do_sample)),
            self.temperature.at[slot].set(float(temperature)),
            self.top_k.at[slot].set(int(top_k)),
            self.top_p.at[slot].set(float(top_p)),
        )


class BatchState(NamedTuple):
    k: jax.Array  # (L, B, Hkv, S, D) head-major (matches LLMCache)
    v: jax.Array
    mask: jax.Array  # (B, S) bool — valid positions per slot
    lengths: jax.Array  # (B,) int32 — tokens in cache per slot
    cur: jax.Array  # (B,) int32 — next token to feed
    active: jax.Array  # (B,) bool
    sampling: SamplingState

    @classmethod
    def create(cls, cfg: BailingMoeConfig, slots: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_hidden_layers, slots, cfg.num_key_value_heads, max_len, cfg.head_dim)
        return cls(
            jnp.zeros(shape, dtype),
            jnp.zeros(shape, dtype),
            jnp.zeros((slots, max_len), bool),
            jnp.zeros((slots,), jnp.int32),
            jnp.zeros((slots,), jnp.int32),
            jnp.zeros((slots,), bool),
            SamplingState.create(slots),
        )


def pooled_forward(params, cfg: BailingMoeConfig, x, k, v, mask, write_pos, active, positions=None, lora_bank=None, lora_ids=None):
    """One single-token LLM forward over pool rows with PER-ROW KV positions.

    The counterpart of `bailing_forward` for continuous-batching pools, where
    every row sits at its own sequence offset (text slots: batched_decode_step;
    image CFG rows: engine/image_pool.py). x: (B, 1, h) embeds; k/v:
    (L, B, Hkv, S, D) head-major stacked caches; mask: (B, S) bool — must
    already include the position being fed; write_pos: (B,) int32 per-row KV
    write index; active: (B,) bool — inactive rows compute but keep their old
    KV. positions: (B, 1) RoPE positions (defaults to write_pos — callers with
    padding gaps pass mask-derived positions instead).

    Returns (normed hidden (B, 1, h), new_k, new_v) — same final-rms_norm
    semantics as bailing_forward.
    """
    B = x.shape[0]
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    rows = jnp.arange(B)
    if positions is None:
        positions = write_pos[:, None]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    layers = params["layers"]
    experts_stacked = layers["mlp"]["experts"]
    scanned = {**layers, "mlp": {k: v for k, v in layers["mlp"].items() if k != "experts"}}

    from mingunivision_tpu.models.bailing_moe import _dense_lora

    def layer(carry, inp):
        h = carry
        p, layer_idx, kc, vc, lora = inp
        hn = rms_norm(h, p["input_layernorm"]["w"], eps=cfg.rms_norm_eps)
        qkv = _dense_lora(hn, p["attention"]["query_key_value"], lora, "query_key_value", lora_ids).reshape(B, 1, Hq + 2 * Hkv, D)
        q, kn, vn = jnp.split(qkv, [Hq, Hq + Hkv], axis=2)
        q, kn = apply_rope(q, kn, cos, sin)
        # head-major per-row write: kc (B, Hkv, S, D), new kv kn[:, 0] (B, Hkv, D)
        hidx = jnp.arange(Hkv)[None, :]
        old_k = kc[rows[:, None], hidx, write_pos[:, None]]  # (B, Hkv, D)
        old_v = vc[rows[:, None], hidx, write_pos[:, None]]
        kc = kc.at[rows[:, None], hidx, write_pos[:, None]].set(
            jnp.where(active[:, None, None], kn[:, 0].astype(kc.dtype), old_k)
        )
        vc = vc.at[rows[:, None], hidx, write_pos[:, None]].set(
            jnp.where(active[:, None, None], vn[:, 0].astype(vc.dtype), old_v)
        )
        # pool row masks already encode the causal bound (positions beyond a
        # row's progress were never set), so either kernel takes them directly
        from mingunivision_tpu.models.bailing_moe import _use_pallas_decode

        if _use_pallas_decode(kc.shape[2]):
            from mingunivision_tpu.ops.kernels.decode_attention import pallas_decode_attention

            a = pallas_decode_attention(q, kc, vc, mask, scale=D**-0.5, kv_head_major=True)
        else:
            a = mha(q, kc, vc, mask=mask[:, None, None, :], scale=D**-0.5, kv_head_major=True)
        h = h + _dense_lora(a.reshape(B, 1, Hq * D), p["attention"]["dense"], lora, "dense", lora_ids)
        hn = rms_norm(h, p["post_attention_layernorm"]["w"], eps=cfg.rms_norm_eps)
        from mingunivision_tpu.models.bailing_moe import moe_block_apply

        h = h + moe_block_apply(p["mlp"], cfg, hn, experts_stacked=experts_stacked, layer_idx=layer_idx, lora=lora, lora_ids=lora_ids)
        return h, (kc, vc)

    layer_ids = jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)
    h, (nk, nv) = lax.scan(layer, x, (scanned, layer_ids, k, v, lora_bank))
    return rms_norm(h, params["norm"]["w"], eps=cfg.rms_norm_eps), nk, nv


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def batched_decode_step(
    params,
    cfg: BailingMoeConfig,
    state: BatchState,
    key,
    lora_bank=None,
    lora_ids=None,
):
    """One decode step for every active slot (inactive slots compute but are
    masked from state updates). Each slot samples with ITS OWN params
    (state.sampling). Returns (new_state, sampled (B,) int32).

    lora_bank/lora_ids: optional multi-LoRA bank (lora.py); lora_ids (B,)
    selects each slot's adapter row (0 = null)."""
    B = state.cur.shape[0]
    rows = jnp.arange(B)

    # mark the fed token's position for active slots
    mask = state.mask.at[rows, state.lengths].set(jnp.logical_or(state.mask[rows, state.lengths], state.active))
    x = embed_tokens(params, state.cur[:, None]).astype(state.k.dtype)
    h, nk, nv = pooled_forward(params, cfg, x, state.k, state.v, mask, state.lengths, state.active, lora_bank=lora_bank, lora_ids=lora_ids)
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
        BatchState(nk, nv, mask, new_lengths, jnp.where(state.active, nxt, state.cur), new_active, sp),
        out_tokens,
    )


@dataclasses.dataclass
class Request:
    input_ids: np.ndarray  # (T,)
    max_new_tokens: int = 128
    request_id: int = 0
    tokens: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    # per-request sampling (None -> engine defaults)
    do_sample: Optional[bool] = None
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    lora_id: int = 0  # bank row (0 = null adapter / base model)


PREFILL_BUCKET = 64  # admission prompts right-pad to multiples of this


class ContinuousBatchingEngine:
    """Host scheduler over the batched decode step.

    Sampling params are PER-SLOT device arrays (BatchState.sampling): mixed
    greedy+sampled requests with different temperature/top-k/top-p share one
    compiled decode step — no recompiles per mixture. Engine-level kwargs are
    the defaults for requests that don't specify their own."""

    def __init__(
        self,
        params,
        cfg: BailingMoeConfig,
        *,
        slots: int = 4,
        max_len: int = 1024,
        dtype=jnp.bfloat16,
        seed: int = 0,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        mesh=None,
        lora_bank=None,
        lora_names: Optional[List[str]] = None,
    ):
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.max_len = max_len
        self.state = BatchState.create(cfg, slots, max_len, dtype)
        # multi-LoRA serving: a stacked adapter bank + per-slot adapter rows
        # (0 = null). The bank is a normal jit argument — adapter mixtures
        # never recompile (lora.py).
        self.lora_bank = lora_bank
        from mingunivision_tpu.lora import LoRARegistry

        self.lora_registry = LoRARegistry(lora_names)
        self.slot_lora = np.zeros((slots,), np.int32)
        self._lora_dev = None  # device mirror, re-uploaded only on mutation
        self._lora_dirty = True
        if mesh is not None:
            # sharded serving: KV slots over `data`, kv-heads over `model`;
            # params are expected pre-sharded (parallel.sharding.shard_llm_params)
            # and cfg carries expert_mesh/expert_tables_sharded (api.py does) so
            # the decode-step MoE dispatch takes the shard_map kernel wrappers
            from mingunivision_tpu.parallel.sharding import shard_batch_state

            self.state = shard_batch_state(self.state, mesh)
        self.mesh = mesh
        self.key = jax.random.PRNGKey(seed)
        self.sampling = dict(do_sample=do_sample, temperature=temperature, top_k=top_k, top_p=top_p)
        self.slot_req: Dict[int, Request] = {}
        self.slot_budget: Dict[int, int] = {}
        self._next_id = 0

    # -- admission ------------------------------------------------------------

    def _free_slot(self) -> Optional[int]:
        active = np.asarray(self.state.active)
        for b in range(self.slots):
            if not active[b] and b not in self.slot_req:
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
        """Admit a request: prefill into a free slot. None if pool is full.
        Sampling kwargs override the engine defaults for THIS request only.
        `lora` names an adapter from the engine's bank (None = base model)."""
        slot = self._free_slot()
        if slot is None:
            return None
        lora_id = self.lora_registry.resolve(lora)
        req = Request(
            np.asarray(input_ids).reshape(-1),
            max_new_tokens,
            self._next_id,
            do_sample=do_sample,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            lora_id=lora_id,
        )
        self._next_id += 1
        req_sampling = {
            k: (getattr(req, k) if getattr(req, k) is not None else self.sampling[k])
            for k in ("do_sample", "temperature", "top_k", "top_p")
        }
        T = len(req.input_ids)
        assert T + max_new_tokens < self.max_len

        # jitted single-row prefill (engine.generate.prefill), prompt right-padded
        # to a length bucket: one compile per bucket, not one per prompt length
        from mingunivision_tpu.engine.generate import prefill

        Tb = min(self.max_len, -(-T // PREFILL_BUCKET) * PREFILL_BUCKET)
        ids_pad = np.zeros((1, Tb), np.int64)
        ids_pad[0, :T] = req.input_ids
        cache1 = LLMCache.create(self.cfg, 1, self.max_len, self.state.k.dtype)
        mask1 = jnp.zeros((1, self.max_len), bool).at[:, :T].set(True)
        embeds = embed_tokens(self.params, jnp.asarray(ids_pad)).astype(self.state.k.dtype)
        logits, cache1 = prefill(
            self.params, self.cfg, embeds, cache1, mask1,
            lora_bank=self.lora_bank,
            lora_ids=jnp.full((1,), req.lora_id, jnp.int32) if self.lora_bank is not None else None,
        )
        self.key, sub = jax.random.split(self.key)
        first = int(sample_token(logits, sub, **req_sampling)[0])
        self.slot_lora[slot] = req.lora_id
        self._lora_dirty = True

        st = self.state
        self.state = BatchState(
            st.k.at[:, slot].set(cache1.k[:, 0]),
            st.v.at[:, slot].set(cache1.v[:, 0]),
            st.mask.at[slot].set(mask1[0]),
            st.lengths.at[slot].set(T),
            st.cur.at[slot].set(first),
            st.active.at[slot].set(True),
            st.sampling.set_slot(slot, **req_sampling),
        )
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
        self.slot_lora[slot] = 0
        self._lora_dirty = True
        self.state = self.state._replace(active=self.state.active.at[slot].set(False))

    # -- stepping -------------------------------------------------------------

    def step(self) -> Dict[int, int]:
        """Advance all active slots one token. Returns {request_id: token}."""
        if not self.slot_req:
            return {}
        self.key, sub = jax.random.split(self.key)
        if self.lora_bank is not None and (self._lora_dirty or self._lora_dev is None):
            self._lora_dev = jnp.asarray(self.slot_lora)
            self._lora_dirty = False
        self.state, toks = batched_decode_step(
            self.params, self.cfg, self.state, sub,
            lora_bank=self.lora_bank,
            lora_ids=self._lora_dev if self.lora_bank is not None else None,
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
            self.slot_budget[slot] -= 1
            if not active[slot] or self.slot_budget[slot] <= 0:
                self._finish(slot)
        return out

    def run_to_completion(self, max_steps: int = 10_000):
        steps = 0
        while self.slot_req and steps < max_steps:
            self.step()
            steps += 1
