"""Bailing-MoE decoder-only LLM (16B total / ~3B active), TPU-native.

Parity map against reference mingunivision/modeling_bailing_moe.py:
  - RMSNorm fp32 internals:                  :122-136
  - fused query_key_value split [Hq,Hkv,Hkv]: :680-684, :875-884
  - q / sqrt(head_dim), fp32 softmax:        :798-805
  - RoPE 3D (flat planes == 1D):             :413-425, :463-469
  - router: fp32 softmax -> top-k -> renorm:  :487-520
  - multi-gate modality routing:             :523-589
  - shared experts added unconditionally:    :604-605
  - pre-norm decoder layer:                  :1150-1239
  - norm_head logit path:                    :1604-1620

TPU-first design decisions (not a port):
  - All 28 layers are identical MoE layers (first_k_dense_replace=0) => params are
    depth-stacked and the layer body is ONE `lax.scan` step.
  - KV cache is a preallocated static-shape pytree with a length counter (replaces
    HF DynamicCache). CFG batching is just a batch dim — no cache repeat dance.
  - MoE dispatch: token counts are static under jit, so we pick the dispatch
    strategy at trace time: weight-GATHER for small token counts (decode steps —
    HBM reads = only the active experts' weights, which is the information-
    theoretic minimum) and masked-dense for prefill (every expert runs over all
    tokens, exact, MXU-saturating; replaced by the Pallas grouped-matmul kernel
    for large N — see ops/kernels/gmm.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from mingunivision_tpu.config import BailingMoeConfig
from mingunivision_tpu.ops.attention import mha
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.norms import rms_norm
from mingunivision_tpu.ops.rope import apply_rope, mrope_cos_sin, rope_cos_sin
from mingunivision_tpu.utils.init import linear_init
from mingunivision_tpu.utils.quantize import dequant_weight, take_weight


def _prec(x):
    """HIGHEST precision for fp32 inputs (CPU tests / fp32 paths); default for bf16."""
    return lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def _dense_lora(x, p, lora, name, lora_ids):
    """dense() plus the per-row LoRA delta when an adapter bank is threaded.

    `lora` is the LAYER-SLICED bank ({target: {a: (N, in, r), b: (N, r, out)}})
    and `lora_ids` (B,) selects each batch row's adapter (0 = null adapter =
    exact base output). See lora.py for the serving design."""
    y = dense(x, p)
    if lora is not None and name in lora:
        from mingunivision_tpu.lora import lora_delta

        y = (y + lora_delta(x, lora[name], lora_ids)).astype(y.dtype)
    return y



# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


class LLMCache(NamedTuple):
    """Preallocated KV cache: k/v (num_layers, B, Hkv, max_len, D) + scalar length.

    HEAD-MAJOR sequence layout: the decode-step attention contracts (G, D) x
    (D, S) per kv-head — with S innermost the cache streams without relayout
    (XLA AUTO-layout probe, BENCHMARKS.md round 1)."""

    k: jax.Array
    v: jax.Array
    length: jax.Array

    @classmethod
    def create(cls, cfg: BailingMoeConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32))

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    def repeat_rows(self, n: int) -> "LLMCache":
        """Tile the batch dim (CFG row expansion; replaces the reference's
        per-layer key_cache.repeat dance, modeling_bailing_moe.py:1894-1902).

        Every leaf (incl. `length`) is a FRESH buffer so the result can be
        donated to a jitted loop without invalidating the source cache.
        """
        return LLMCache(jnp.repeat(self.k, n, axis=1), jnp.repeat(self.v, n, axis=1), self.length + 0)

    def first_row(self) -> "LLMCache":
        """Truncate back to the cond row (reference :1954-1962)."""
        return LLMCache(self.k[:, :1], self.v[:, :1], self.length + 0)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _layer_init(key, cfg: BailingMoeConfig, dtype):
    ks = jax.random.split(key, 10)
    h, m = cfg.hidden_size, cfg.moe_intermediate_size
    E = cfg.num_experts
    shared_m = m * cfg.num_shared_experts
    layer = {
        "input_layernorm": {"w": jnp.ones((h,), dtype)},
        "attention": {
            "query_key_value": linear_init(ks[0], h, cfg.qkv_out_dim, bias=cfg.use_qkv_bias, dtype=dtype),
            "dense": linear_init(ks[1], cfg.num_attention_heads * cfg.head_dim, h, bias=cfg.use_bias, dtype=dtype),
        },
        "post_attention_layernorm": {"w": jnp.ones((h,), dtype)},
        "mlp": {
            "gate": {"w": 0.02 * jax.random.normal(ks[2], (h, E), dtype)},
            "experts": {
                "gate_proj": 0.02 * jax.random.normal(ks[3], (E, h, m), dtype),
                "up_proj": 0.02 * jax.random.normal(ks[4], (E, h, m), dtype),
                "down_proj": 0.02 * jax.random.normal(ks[5], (E, m, h), dtype),
            },
            "shared_experts": {
                "gate_proj": linear_init(ks[6], h, shared_m, bias=False, dtype=dtype),
                "up_proj": linear_init(ks[7], h, shared_m, bias=False, dtype=dtype),
                "down_proj": linear_init(ks[8], shared_m, h, bias=False, dtype=dtype),
            },
        },
    }
    if cfg.multi_gate:
        layer["mlp"]["image_gate"] = {"w": 0.02 * jax.random.normal(ks[9], (h, E), dtype)}
        layer["mlp"]["audio_gate"] = {"w": jnp.zeros((h, E), dtype)}
    return layer


def init_bailing_moe_params(key, cfg: BailingMoeConfig, dtype=jnp.bfloat16):
    k_emb, k_layers, k_head = jax.random.split(key, 3)
    layer_keys = jax.random.split(k_layers, cfg.num_hidden_layers)
    # vmap the per-layer init so the depth-stacked arrays are allocated directly
    # (a python-list init + stack doubles peak memory — 16B bf16 would need 2x32GB)
    layers = jax.vmap(lambda k: _layer_init(k, cfg, dtype))(layer_keys)
    return {
        "word_embeddings": {"w": 0.02 * jax.random.normal(k_emb, (cfg.vocab_size, cfg.hidden_size), dtype)},
        "layers": layers,
        "norm": {"w": jnp.ones((cfg.hidden_size,), dtype)},
        "lm_head": linear_init(k_head, cfg.hidden_size, cfg.vocab_size, bias=False, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# Router + MoE
# ---------------------------------------------------------------------------


def moe_route(gate_w, x_flat, top_k: int, norm_topk_prob: bool):
    """fp32-softmax top-k routing (reference BailingMoeGate :487-520).

    x_flat: (N, h). Returns (topk_idx (N, k) int32, topk_w (N, k) fp32,
    logits (N, E) fp32).
    """
    logits = jnp.einsum("nh,he->ne", x_flat, dequant_weight(gate_w, x_flat.dtype), preferred_element_type=jnp.float32, precision=_prec(x_flat))
    scores = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topk_w, topk_idx = lax.top_k(scores, top_k)
    if top_k > 1 and norm_topk_prob:
        topk_w = topk_w / jnp.sum(topk_w, axis=-1, keepdims=True)
    return topk_idx.astype(jnp.int32), topk_w, logits


def _expert_mlp(x, gate_w, up_w, down_w, lora=None, lora_ids=None):
    """SwiGLU expert: down(silu(gate(x)) * up(x)) with fp32 MXU accumulation.

    `lora`/`lora_ids`: optional per-row adapters on the SHARED-expert
    projections (shared_gate_proj/shared_up_proj/shared_down_proj — the
    reference's gate_up_proj/down_proj LoRA coverage on its dense path)."""

    def _d(inp, y, name):
        if lora is not None and name in lora:
            from mingunivision_tpu.lora import lora_delta

            return y + lora_delta(inp, lora[name], lora_ids).astype(jnp.float32)
        return y

    g = _d(x, jnp.einsum("...h,hm->...m", x, dequant_weight(gate_w, x.dtype), preferred_element_type=jnp.float32, precision=_prec(x)), "shared_gate_proj")
    u = _d(x, jnp.einsum("...h,hm->...m", x, dequant_weight(up_w, x.dtype), preferred_element_type=jnp.float32, precision=_prec(x)), "shared_up_proj")
    a = (jax.nn.silu(g) * u).astype(x.dtype)
    return _d(a, jnp.einsum("...m,mh->...h", a, dequant_weight(down_w, x.dtype), preferred_element_type=jnp.float32, precision=_prec(x)), "shared_down_proj")


def moe_experts_gather(experts, x_flat, topk_idx, topk_w):
    """Decode-path dispatch: gather per-assignment expert weights.

    For N*k assignments, HBM traffic = the gathered expert weights only — optimal
    for tiny N (single-token CFG steps). x_flat (N, h) -> (N, h).
    """
    N, k = topk_idx.shape
    flat_idx = topk_idx.reshape(-1)
    gw = take_weight(experts["gate_proj"], flat_idx)  # (N*k, h, m)
    uw = take_weight(experts["up_proj"], flat_idx)
    dw = take_weight(experts["down_proj"], flat_idx)
    xr = jnp.repeat(x_flat, k, axis=0)  # (N*k, h)
    g = jnp.einsum("nh,nhm->nm", xr, dequant_weight(gw, xr.dtype), preferred_element_type=jnp.float32, precision=_prec(xr))
    u = jnp.einsum("nh,nhm->nm", xr, dequant_weight(uw, xr.dtype), preferred_element_type=jnp.float32, precision=_prec(xr))
    a = (jax.nn.silu(g) * u).astype(xr.dtype)
    y = jnp.einsum("nm,nmh->nh", a, dequant_weight(dw, xr.dtype), preferred_element_type=jnp.float32, precision=_prec(xr))
    y = y.reshape(N, k, -1) * topk_w[..., None]
    return jnp.sum(y, axis=1).astype(x_flat.dtype)


def moe_experts_dense(experts, x_flat, topk_idx, topk_w, num_experts: int):
    """Prefill-path dispatch: every expert processes all tokens, masked combine.

    Exact (no capacity drops); (E/k)x FLOP overcompute but fully static and
    MXU-shaped. Superseded by the Pallas grouped matmul for large N.
    """
    # (E, N, m) for all experts at once
    g = jnp.einsum("nh,ehm->enm", x_flat, dequant_weight(experts["gate_proj"], x_flat.dtype), preferred_element_type=jnp.float32, precision=_prec(x_flat))
    u = jnp.einsum("nh,ehm->enm", x_flat, dequant_weight(experts["up_proj"], x_flat.dtype), preferred_element_type=jnp.float32, precision=_prec(x_flat))
    a = (jax.nn.silu(g) * u).astype(x_flat.dtype)
    y = jnp.einsum("enm,emh->enh", a, dequant_weight(experts["down_proj"], x_flat.dtype), preferred_element_type=jnp.float32, precision=_prec(x_flat))
    # combine weights (N, E): sum of topk weights routed to each expert
    comb = jnp.zeros((x_flat.shape[0], num_experts), jnp.float32)
    comb = comb.at[jnp.arange(x_flat.shape[0])[:, None], topk_idx].add(topk_w)
    out = jnp.einsum("enh,ne->nh", y, comb.astype(y.dtype), preferred_element_type=jnp.float32, precision=_prec(y))
    return out.astype(x_flat.dtype)


# Trace-time threshold: at or below this many rows the DECODE-shape dispatch
# (stream kernel with dedup-aggregation / dense / gather) runs; above it the
# prefill dispatch (argsort-gmm / capacity). Round-5 probe
# (benchmarks/bench_t2i_regression.py, 28L int4, 24 CFG rows): the dedup
# stream kernel runs the batched-8 T2I step at 37.83 ms vs the argsort-gmm's
# 62.27 (49.6 vs 30.1 img/min) — duplicate experts across CFG rows collapse to
# one grid slot, so weight traffic is the ~64-expert minimum while the gmm
# pays per-row-tile table sweeps. 48 covers the batched-T2I (24) and serving
# (<=48 slots) regimes near the measured point; stream_supported's effective-
# slot cap still gates unsupported shapes to dense.
MOE_GATHER_MAX_TOKENS = 48
# Capacity-dense dispatch only pays off when the (E, capacity, h) buffer is
# mostly real rows. default_capacity floors at 128, so below ~512 tokens the
# buffer is >2.7x padding and the kernel runs 64 full 128-row tiles for a
# handful of assignments — the round-4 batched-T2I regression (24 CFG rows fell
# into this branch and spent 64x128-row tiles/layer vs ~2 megablox tiles).
MOE_CAPACITY_MIN_TOKENS = 512


def _sharded_stream_ok(mesh, experts, x_flat, topk_idx) -> bool:
    from mingunivision_tpu.parallel.moe_shard import sharded_stream_supported

    return sharded_stream_supported(mesh, experts, x_flat, topk_idx)


def _sharded_swiglu_ok(mesh, experts, x_flat, topk_idx) -> bool:
    from mingunivision_tpu.parallel.moe_shard import sharded_swiglu_gmm_supported

    return sharded_swiglu_gmm_supported(mesh, experts, x_flat, topk_idx)


def moe_block_apply(params, cfg: BailingMoeConfig, x, image_mask=None, audio_mask=None, experts_stacked=None, layer_idx=None, return_router_stats: bool = False, lora=None, lora_ids=None, token_valid=None):
    """Sparse MoE block with multi-gate routing + shared experts.

    return_router_stats=True additionally returns (router_logits (N, E) fp32
    AFTER multi-gate selection, topk_idx (N, k)) for the training-only
    auxiliary balance/z losses (reference modeling_utils.py:395-560).

    x: (B, T, h); image_mask/audio_mask: optional bool (B, T) selecting tokens
    routed by the modality gates (reference :556-605).

    token_valid: optional bool (B, T) marking REAL (non-pad) tokens. Only the
    capacity-dense path consumes it: pad rows are routed out-of-bounds so they
    neither count against the exactness guard nor occupy capacity slots that
    could displace a later sequence's valid rows (right-padded prompts route
    all their pads to the same top-k every layer, which otherwise trips the
    guard on any prompt with pad_count > capacity and silently pins the
    argsort fallback). Pad outputs are garbage-by-construction and discarded
    downstream (prefill picks the last valid position; pad KV is masked).

    `experts_stacked`/`layer_idx`: when the caller is a `lax.scan` layer loop,
    the DEPTH-STACKED (L, E, ...) expert tables are passed whole and this layer
    is selected inside the dispatch — the Pallas stream kernel block-indexes
    (layer, expert) directly, avoiding a per-layer table copy that XLA emits
    when a scan-sliced operand feeds a kernel call (~2 ms/layer on v5e).
    """
    B, T, h = x.shape
    x_flat = x.reshape(-1, h)

    def sliced_experts():
        """Per-layer tables for the XLA dispatch paths (same dynamic_slice a
        scanned xs would produce — XLA fuses reads of these)."""
        if experts_stacked is None:
            return params["experts"]
        return jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, layer_idx, keepdims=False), experts_stacked
        )

    topk_idx, topk_w, router_logits = moe_route(params["gate"]["w"], x_flat, cfg.num_experts_per_tok, cfg.norm_topk_prob)
    if cfg.multi_gate and image_mask is not None:
        i_idx, i_w, i_logits = moe_route(params["image_gate"]["w"], x_flat, cfg.num_experts_per_tok, cfg.norm_topk_prob)
        m = image_mask.reshape(-1, 1)
        topk_idx = jnp.where(m, i_idx, topk_idx)
        topk_w = jnp.where(m, i_w, topk_w)
        router_logits = jnp.where(m, i_logits, router_logits)
    if cfg.multi_gate and audio_mask is not None:
        a_idx, a_w, a_logits = moe_route(params["audio_gate"]["w"], x_flat, cfg.num_experts_per_tok, cfg.norm_topk_prob)
        m = audio_mask.reshape(-1, 1)
        topk_idx = jnp.where(m, a_idx, topk_idx)
        topk_w = jnp.where(m, a_w, topk_w)
        router_logits = jnp.where(m, a_logits, router_logits)

    topk_w = topk_w.astype(x.dtype)
    on_tpu = jax.default_backend() == "tpu"
    probe = params["experts"] if experts_stacked is None else experts_stacked
    if cfg.moe_force_dispatch == "dense":
        # diagnostic override (see config): the conservative masked-dense path
        # the sharded TPU graph falls back to — lets CPU AOT lowering reflect
        # the serving graph's memory behavior
        y = moe_experts_dense(sliced_experts(), x_flat, topk_idx, topk_w, cfg.num_experts)
    elif B * T <= MOE_GATHER_MAX_TOKENS:
        # decode-shape dispatch. Measured on v5e (18 assignments, 64 experts,
        # full-expert blocks, round 2): fused stream kernel bf16 ~1.5-2.1 /
        # int8 1.23 ms/layer vs masked-dense bf16 1.88 / int8-XLA 1.95; the
        # stream kernel reads only the routed experts' weights and, stacked,
        # is immune to the scan-slice copy. XLA row-gather (8.7 ms) and the
        # full-slab scalar-prefetch gather (4.2 ms) are DMA-latency bound.
        from mingunivision_tpu.ops.kernels.moe_stream import moe_experts_stream, stream_supported

        if on_tpu and not cfg.expert_tables_sharded and stream_supported(probe, x_flat, topk_idx):
            if experts_stacked is not None:
                y = moe_experts_stream(experts_stacked, x_flat, topk_idx, topk_w, layer_idx=layer_idx)
            else:
                y = moe_experts_stream(params["experts"], x_flat, topk_idx, topk_w)
        elif on_tpu and cfg.expert_tables_sharded and cfg.expert_mesh is not None and _sharded_stream_ok(
            cfg.expert_mesh, probe, x_flat, topk_idx
        ):
            # manual-SPMD: each device streams its local expert shard + psum
            # (parallel/moe_shard.py) — no table all-gather under GSPMD
            from mingunivision_tpu.parallel.moe_shard import moe_experts_stream_sharded

            y = moe_experts_stream_sharded(
                cfg.expert_mesh,
                probe,
                x_flat,
                topk_idx,
                topk_w,
                layer_idx=layer_idx if experts_stacked is not None else None,
                num_experts=cfg.num_experts,
            )
        elif on_tpu:
            y = moe_experts_dense(sliced_experts(), x_flat, topk_idx, topk_w, cfg.num_experts)
        else:
            y = moe_experts_gather(sliced_experts(), x_flat, topk_idx, topk_w)
    else:
        from mingunivision_tpu.ops.kernels.moe_gmm import GMM_AVAILABLE, moe_experts_gmm
        from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import (
            moe_experts_swiglu_gmm,
            moe_experts_swiglu_gmm_ad,
            swiglu_gmm_supported,
        )
        from mingunivision_tpu.utils.quantize import QuantizedArray

        tabs = sliced_experts()
        # stacked passthrough for the fused prefill kernels: the scan-sliced
        # per-layer copy of the tables (~1.1 GB bf16) costs ~2.5 ms/layer on
        # v5e; the kernels block-index (layer, expert) directly instead
        ktabs = experts_stacked if experts_stacked is not None else params["experts"]
        klidx = layer_idx if experts_stacked is not None else None
        sharded = cfg.expert_tables_sharded  # Pallas opaque to GSPMD: stay dense
        # fused swiglu-gmm: one schedule reads each routed expert's w1/w3/w2
        # once per row-tile. v5e measured per layer vs previous defaults:
        # bf16 5.67/8.88 ms @1024/4096 tok (megablox 6.80/13.47); int8
        # dequant-fused 7.03/8.99 (masked-dense 10.19/30.99); int4
        # plane-aware chunked 5.48/9.45 (masked-dense 11.06/33.96).
        is_quant = isinstance(probe["gate_proj"], QuantizedArray)
        is_int4 = is_quant and probe["gate_proj"].bits == 4
        if on_tpu and not sharded and swiglu_gmm_supported(probe, x_flat):
            if is_quant or not cfg.moe_differentiable:
                # inference tiers. Default: capacity-dense scatter + UNIFORM-
                # groups fused kernel (tm == capacity -> exactly one kernel
                # visit per expert; the argsort-gmm's megablox tiles straddle a
                # group boundary almost every visit at ~96 rows/expert and
                # recompute the full (tm, h) tile per intersecting expert —
                # ~3.6x FLOP amplification at 1024 tok). lax.cond falls back to
                # the exact argsort-gmm when any expert's load > capacity.
                cap_factor = getattr(cfg, "moe_prefill_capacity_factor", 0.0)
                if cap_factor > 0 and B * T >= MOE_CAPACITY_MIN_TOKENS:
                    from mingunivision_tpu.ops.kernels.moe_capacity import (
                        default_capacity,
                        moe_experts_capacity_gmm_exact,
                    )

                    cap = default_capacity(
                        B * T, cfg.num_experts_per_tok, cfg.num_experts, factor=cap_factor
                    )
                    y = moe_experts_capacity_gmm_exact(
                        ktabs, x_flat, topk_idx, topk_w, cfg.num_experts, cap,
                        tm_fallback=getattr(cfg, "moe_prefill_tm", 0) or (128 if is_int4 else 256),
                        token_valid=token_valid.reshape(-1) if token_valid is not None else None,
                        layer_idx=klidx,
                    )
                else:
                    tm = getattr(cfg, "moe_prefill_tm", 0) or (128 if is_int4 else 256)
                    y = moe_experts_swiglu_gmm(
                        ktabs, x_flat, topk_idx, topk_w, cfg.num_experts, tm=tm, layer_idx=klidx
                    )
            else:
                # custom_vjp wrapper: fused kernel fwd, megablox gmm/tgmm bwd —
                # keeps jax.grad working through the TPU training forward
                y = moe_experts_swiglu_gmm_ad(tabs, x_flat, topk_idx, topk_w, cfg.num_experts, 256)
        elif GMM_AVAILABLE and on_tpu and not sharded and not isinstance(tabs["gate_proj"], QuantizedArray):
            y = moe_experts_gmm(tabs, x_flat, topk_idx, topk_w, cfg.num_experts)
        elif on_tpu and sharded and cfg.expert_mesh is not None and _sharded_swiglu_ok(
            cfg.expert_mesh, probe, x_flat, topk_idx
        ):
            # manual-SPMD fused prefill: each device runs the fused SwiGLU-gmm
            # over its local (expert, model) table block + psum — keeps the
            # measured 3.4-3.6x fused-kernel edge over GSPMD masked-dense at
            # 4096 tokens under sharding (parallel/moe_shard.py)
            if cfg.moe_differentiable and not is_quant:
                # sharded TRAINING forward: custom_vjp wrapper (kernel fwd,
                # sharded masked-dense bwd) over per-layer tables — grads flow
                # through dynamic_index's transpose into the stacked tree
                from mingunivision_tpu.parallel.moe_shard import moe_experts_swiglu_gmm_sharded_ad

                y = moe_experts_swiglu_gmm_sharded_ad(
                    cfg.expert_mesh, sliced_experts(), x_flat, topk_idx, topk_w, cfg.num_experts, 256
                )
            else:
                from mingunivision_tpu.parallel.moe_shard import moe_experts_swiglu_gmm_sharded

                y = moe_experts_swiglu_gmm_sharded(
                    cfg.expert_mesh,
                    probe,
                    x_flat,
                    topk_idx,
                    topk_w,
                    layer_idx=layer_idx if experts_stacked is not None else None,
                    num_experts=cfg.num_experts,
                    tm=128 if is_int4 else 256,
                )
        else:
            y = moe_experts_dense(tabs, x_flat, topk_idx, topk_w, cfg.num_experts)

    y = y.reshape(B, T, h)
    # shared experts: dense SwiGLU over the identity input (reference :604-605)
    se = params["shared_experts"]
    y = y + _expert_mlp(x, se["gate_proj"]["w"], se["up_proj"]["w"], se["down_proj"]["w"], lora=lora, lora_ids=lora_ids).astype(x.dtype)
    if return_router_stats:
        return y, (router_logits, topk_idx)
    return y


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


_PALLAS_DECODE_MIN_S = 2048  # below this the XLA path wins (kernel launch overhead)


def _use_pallas_decode(smax: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and smax >= _PALLAS_DECODE_MIN_S
        and smax % 512 == 0
    )


def attention_apply(params, cfg: BailingMoeConfig, x, cos, sin, k_cache, v_cache, length, attn_mask, use_flash: bool = False, lora=None, lora_ids=None):
    """Fused-QKV GQA attention over the static cache.

    x: (B, T, h); cos/sin: (B, T, head_dim); k_cache/v_cache: (B, Hkv, Smax, D)
    head-major; length: scalar int32 positions already in cache (before this
    call); attn_mask: bool (B, Smax) — per-row allowed positions (padding / CFG
    masks); use_flash: first-round prefill fast path — new keys ARE the whole
    context, so the Pallas flash kernel runs over (q, k, v) directly (O(T)
    memory instead of the XLA (B,H,T,S) score materialization).
    Returns (out, new_k_cache, new_v_cache).
    """
    B, T, _ = x.shape
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    qkv = _dense_lora(x, params["query_key_value"], lora, "query_key_value", lora_ids).reshape(B, T, Hq + 2 * Hkv, D)
    q, k, v = jnp.split(qkv, [Hq, Hq + Hkv], axis=2)
    q, k = apply_rope(q, k, cos, sin)

    # head-major write: (B, T, Hkv, D) -> (B, Hkv, T, D) at sequence offset
    k_cache = lax.dynamic_update_slice(k_cache, k.swapaxes(1, 2).astype(k_cache.dtype), (0, 0, length, 0))
    v_cache = lax.dynamic_update_slice(v_cache, v.swapaxes(1, 2).astype(v_cache.dtype), (0, 0, length, 0))

    if use_flash:
        from mingunivision_tpu.ops.kernels.flash import flash_prefill_attention

        valid = lax.dynamic_slice(attn_mask, (0, length), (B, T))
        out = flash_prefill_attention(q, k, v, valid, scale=D**-0.5)
    elif T == 1 and _use_pallas_decode(k_cache.shape[2]):
        from mingunivision_tpu.ops.kernels.decode_attention import pallas_decode_attention

        Smax = k_cache.shape[2]
        pos_ok = jnp.arange(Smax)[None, :] <= length  # causal bound incl. current token
        out = pallas_decode_attention(
            q, k_cache, v_cache, jnp.logical_and(attn_mask, pos_ok), scale=D**-0.5, kv_head_major=True
        )
    else:
        Smax = k_cache.shape[2]
        k_pos = jnp.arange(Smax)[None, :]
        q_pos = length + jnp.arange(T)[:, None]
        causal = k_pos[None] <= q_pos[None, :, :]  # (1, T, Smax): see past + own position
        allowed = jnp.logical_and(causal, attn_mask[:, None, :])  # (B, T, Smax)
        out = mha(q, k_cache, v_cache, mask=allowed[:, None], scale=D**-0.5, kv_head_major=True)
    out = _dense_lora(out.reshape(B, T, Hq * D), params["dense"], lora, "dense", lora_ids)
    return out, k_cache, v_cache


# ---------------------------------------------------------------------------
# Decoder layer + model
# ---------------------------------------------------------------------------


def decoder_layer_apply(
    layer_params, cfg, x, cos, sin, k_cache, v_cache, length, attn_mask, image_mask, audio_mask,
    use_flash: bool = False, experts_stacked=None, layer_idx=None, return_router_stats: bool = False,
    lora=None, lora_ids=None, token_valid=None,
):
    h = rms_norm(x, layer_params["input_layernorm"]["w"], eps=cfg.rms_norm_eps)
    a, nk, nv = attention_apply(layer_params["attention"], cfg, h, cos, sin, k_cache, v_cache, length, attn_mask, use_flash=use_flash, lora=lora, lora_ids=lora_ids)
    x = x + a
    h = rms_norm(x, layer_params["post_attention_layernorm"]["w"], eps=cfg.rms_norm_eps)
    out = moe_block_apply(
        layer_params["mlp"], cfg, h, image_mask, audio_mask, experts_stacked=experts_stacked,
        layer_idx=layer_idx, return_router_stats=return_router_stats, lora=lora, lora_ids=lora_ids,
        token_valid=token_valid,
    )
    if return_router_stats:
        y, stats = out
        return x + y, nk, nv, stats
    return x + out, nk, nv, None


def bailing_forward(
    params,
    cfg: BailingMoeConfig,
    inputs_embeds,
    cache: LLMCache,
    attn_mask,
    positions=None,
    image_mask=None,
    audio_mask=None,
    use_flash: bool = False,
    return_router_stats: bool = False,
    lora_bank=None,
    lora_ids=None,
):
    """Run T tokens through the decoder stack, appending to the cache.

    lora_bank/lora_ids: optional multi-LoRA bank (lora.py) — depth-stacked
    {target: {a: (L, N, in, r), b: (L, N, r, out)}} factors riding the layer
    scan as xs, with lora_ids (B,) choosing each row's adapter (0 = null).

    inputs_embeds: (B, T, h); attn_mask: bool (B, Smax) over the FULL cache
    (positions >= cache.length+T are ignored via the causal bound);
    positions: optional (B, T) or (3, B, T) int positions — default is
    cache.length + arange(T) broadcast (flat 3D-RoPE planes).

    Returns (hidden_states (B, T, h), new_cache); with
    return_router_stats=True, (hidden, new_cache, (logits (L, N, E) fp32,
    topk_idx (L, N, k))) for the training aux losses.
    """
    B, T, h = inputs_embeds.shape
    if positions is None:
        positions = cache.length + jnp.arange(T)[None, :]
        positions = jnp.broadcast_to(positions, (B, T))
    if positions.ndim == 2:
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    else:
        cos, sin = mrope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, cfg.mrope_section)

    attn_mask = attn_mask.astype(bool)

    # Valid (non-pad) flags for the T new tokens: the caller's attn_mask is
    # True exactly at valid positions [cache.length, cache.length+T) (prefill
    # contract). Consumed only by the capacity-dense MoE guard; decode (T=1)
    # steps skip it — their token is always valid.
    token_valid = None
    if T > 1:
        token_valid = lax.dynamic_slice(attn_mask, (0, cache.length), (B, T))

    # The expert tables stay OUT of the scanned xs: the stream kernel indexes
    # the full depth-stacked tables by (layer, expert) via scalar prefetch,
    # avoiding the per-layer copy XLA emits for scan-sliced kernel operands.
    layers = params["layers"]
    experts_stacked = layers["mlp"]["experts"]
    scanned = {**layers, "mlp": {k: v for k, v in layers["mlp"].items() if k != "experts"}}

    def body(carry, inp):
        x = carry
        layer_params, layer_idx, kc, vc, lora = inp
        x, nk, nv, stats = decoder_layer_apply(
            layer_params, cfg, x, cos, sin, kc, vc, cache.length, attn_mask, image_mask, audio_mask,
            use_flash=use_flash, experts_stacked=experts_stacked, layer_idx=layer_idx,
            return_router_stats=return_router_stats, lora=lora, lora_ids=lora_ids,
            token_valid=token_valid,
        )
        ys = (nk, nv, stats) if return_router_stats else (nk, nv)
        return x, ys

    layer_ids = jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)
    # cfg.remat_layers: recompute the layer in the backward pass — activations
    # saved per layer shrink to the scan carry/xs boundary (see config.py)
    body_fn = jax.checkpoint(body) if cfg.remat_layers else body
    # lora_bank=None is an EMPTY pytree: scan slices nothing and the body sees
    # None — the no-LoRA graph is bit-identical to before the feature existed
    x, ys = lax.scan(body_fn, inputs_embeds, (scanned, layer_ids, cache.k, cache.v, lora_bank))
    if return_router_stats:
        nk, nv, stats = ys
    else:
        nk, nv = ys
        stats = None
    x = rms_norm(x, params["norm"]["w"], eps=cfg.rms_norm_eps)
    new_cache = LLMCache(nk, nv, cache.length + T)
    if return_router_stats:
        return x, new_cache, stats
    return x, new_cache


def router_balance_loss(router_probs, topk_idx, num_experts: int):
    """Switch-style load-balancing aux loss.

    TPU-native analog of the reference's training-only balancing losses
    (modeling_utils.py:451-529): where the reference all-reduces counts over
    torch.distributed expert/data groups, GSPMD arrays are logically global —
    the same mean over the token axis IS the cross-device reduction.

    router_probs: (N, E) fp32 softmax scores; topk_idx: (N, k).
    """
    N = router_probs.shape[0]
    counts = jnp.zeros((N, num_experts), jnp.float32)
    counts = counts.at[jnp.arange(N)[:, None], topk_idx].set(1.0)
    fraction_routed = counts.mean(axis=0)  # (E,) fraction of tokens per expert
    mean_prob = router_probs.mean(axis=0)
    return num_experts * jnp.sum(fraction_routed * mean_prob)


def router_z_loss(router_logits):
    """Encourages small router logits (stability; standard z-loss)."""
    return jnp.mean(jnp.square(jax.nn.logsumexp(router_logits.astype(jnp.float32), axis=-1)))


def router_group_balance_loss(router_probs, topk_idx, num_experts: int, num_groups: int):
    """Device-GROUP-level Switch balance loss: experts are chunked into
    `num_groups` contiguous EP shards and the loss balances routed-token mass
    across shards — the quantity EP all-to-all cost actually depends on.

    TPU-native analog of the reference's group_level_device_balancing_loss_func
    (modeling_utils.py:476-529): where the reference all_reduces the expert
    mask over the torch.distributed expert group, GSPMD arrays are logically
    global so the token-axis mean IS the cross-device reduction. SAMPLE-level
    like the reference: means run over the sequence axis per leading batch
    entry, then the per-sample losses average (golden-tested).

    router_probs: (..., S, E) fp32 softmax scores; topk_idx: (..., S, k).
    A flat (N, E)/(N, k) input is treated as one sample.
    """
    assert num_experts % num_groups == 0
    per_group = num_experts // num_groups
    one_hot = jax.nn.one_hot(topk_idx, num_experts, dtype=jnp.float32)  # (..., S, k, E)
    expert_mask = one_hot.max(axis=-2)  # routed-or-not per (token, expert)
    mask_g = expert_mask.reshape(expert_mask.shape[:-1] + (num_groups, per_group)).sum(-1)
    tokens_per_group = mask_g.mean(axis=-2) / num_groups  # (..., G)
    probs_g = router_probs.astype(jnp.float32)
    probs_g = probs_g.reshape(probs_g.shape[:-1] + (num_groups, per_group)).sum(-1)
    prob_per_group = probs_g.mean(axis=-2)
    return jnp.mean(jnp.sum(tokens_per_group * prob_per_group * num_groups, axis=-1))


def compute_logits(params, cfg: BailingMoeConfig, hidden_states):
    """LM head with optional norm_head (column-L2-normalized weight, :1604-1620)."""
    w = params["lm_head"]["w"]  # (h, vocab)
    if cfg.norm_head:
        wf = w.astype(jnp.float32)
        w = wf / (jnp.linalg.norm(wf, axis=1, keepdims=True) + 1e-7)
    y = jnp.einsum("bth,hv->btv", hidden_states, dequant_weight(w, hidden_states.dtype), preferred_element_type=jnp.float32, precision=_prec(hidden_states))
    return y  # fp32 logits (reference casts .float())


def token_classification_logits(params, cfg: BailingMoeConfig, hidden_states, classifier):
    """Per-token classification head (reference BailingMoeForTokenClassification
    surface, registered in the auto_map): hidden -> (B, T, num_labels)."""
    return dense(hidden_states, classifier)


def init_token_classifier(key, cfg: BailingMoeConfig, num_labels: int, dtype=jnp.bfloat16):
    return linear_init(key, cfg.hidden_size, num_labels, bias=True, dtype=dtype)


def embed_tokens(params, input_ids):
    from mingunivision_tpu.utils.quantize import QuantizedArray

    w = params["word_embeddings"]["w"]
    if isinstance(w, QuantizedArray):
        rows = jnp.take(w.q, input_ids, axis=0).astype(jnp.float32)
        return rows * w.s[0]  # s is (1, hidden), row-invariant; caller casts
    return jnp.take(w, input_ids, axis=0)
