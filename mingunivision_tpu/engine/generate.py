"""Decode engine: jitted text-decode and AR image-generation loops.

This replaces the reference's HF-GenerationMixin + Python loops
(modeling_bailing_moe.py:1844-1965, :1968-2080) with a TPU-native design:

  - One preallocated LLM KV cache per phase (1 CFG row for text, 2-3 rows for
    image gen). Row expansion is `LLMCache.repeat_rows`; the reference's
    per-layer cache repeat/truncate dance collapses to two O(1) array ops.
  - Text decode is a `lax.while_loop` fully under jit: embed -> 28-layer scan ->
    logits -> sample, with EOS / image-start exit — zero host round-trips per
    token (each host hop through the TPU tunnel costs more than the step).
  - The triple-loop image-gen step (SURVEY hard-part #1) is a single
    `lax.fori_loop`: LLM step (CFG rows) -> vis_head -> 16-step RF Euler sample
    -> MingTok semantic-decoder step (own static cache) -> linear_proj -> next
    embedding; masks are fixed-size buffers updated in place, positions derived
    from mask sums (parity with attention_mask.cumsum()-1, reference :1905-1907).
  - Prompts are right-padded to length buckets so prefill compiles once per
    bucket, not once per prompt length.

All functions are pure; the host-side session object lives in engine/session.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from mingunivision_tpu.config import BailingMoeConfig, ImageGenConfig, MingTokConfig, RFHeadConfig
from mingunivision_tpu.models.bailing_moe import (
    LLMCache,
    bailing_forward,
    compute_logits,
    embed_tokens,
)
from mingunivision_tpu.models.mingtok import make_semdec_cache, mingtok_feature_decoder, mingtok_pixel_decoder
from mingunivision_tpu.models.rf_head import rf_sample, vis_head_apply
from mingunivision_tpu.engine.sampler import sample_token
from mingunivision_tpu.ops.activations import gelu_exact
from mingunivision_tpu.ops.linear import dense


# ---------------------------------------------------------------------------
# linear_proj (semantic feature -> LLM embedding; modeling_bailingmm.py:111-115)
# ---------------------------------------------------------------------------


def linear_proj_apply(params, x):
    y = dense(x, params["layers"][0])
    for layer in params["layers"][1:]:
        y = dense(gelu_exact(y), layer)
    return y


def init_linear_proj_params(key, in_dim, hidden, depth, dtype=jnp.float32):
    from mingunivision_tpu.utils.init import linear_init

    keys = jax.random.split(key, depth)
    layers = [linear_init(keys[0], in_dim, hidden, dtype=dtype)]
    for d in range(1, depth):
        layers.append(linear_init(keys[d], hidden, hidden, dtype=dtype))
    return {"layers": layers}


# ---------------------------------------------------------------------------
# Vision-feature scatter (prompt_wrap, modeling_bailingmm.py:152-204)
# ---------------------------------------------------------------------------


def scatter_image_embeds(inputs_embeds, input_ids, image_embeds, image_patch_token: int):
    """masked_scatter equivalent: place the i-th image feature at the i-th
    image-patch position. image_embeds: (N_feat, h) flattened in order."""
    B, T, h = inputs_embeds.shape
    ids = input_ids.reshape(-1)
    is_patch = ids == image_patch_token
    order = jnp.cumsum(is_patch) - 1  # index into image_embeds for each position
    order = jnp.clip(order, 0, image_embeds.shape[0] - 1)
    gathered = jnp.take(image_embeds, order, axis=0).astype(inputs_embeds.dtype)
    flat = inputs_embeds.reshape(-1, h)
    out = jnp.where(is_patch[:, None], gathered, flat)
    return out.reshape(B, T, h), is_patch.reshape(B, T)


# ---------------------------------------------------------------------------
# Prefill
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "use_flash"), donate_argnames=("cache",))
def prefill(params, cfg: BailingMoeConfig, inputs_embeds, cache: LLMCache, attn_mask, image_mask=None, *, use_flash: bool = False, lora_bank=None, lora_ids=None):
    """Run the (padded) prompt through the stack. attn_mask: bool (1, Smax) with
    True exactly at valid prompt positions [cache.length, cache.length+T_valid).

    Returns (last_valid_logits (1, V), new_cache). The "last valid" position is
    the highest masked index (right-padding safe).
    """
    B, T, _ = inputs_embeds.shape
    Smax = attn_mask.shape[1]
    # positions: cumsum over mask (multi-round parity: masked history shifts positions)
    pos_full = jnp.cumsum(attn_mask.astype(jnp.int32), axis=1) - 1
    positions = lax.dynamic_slice(pos_full, (0, cache.length), (B, T))
    positions = jnp.maximum(positions, 0)
    hidden, cache = bailing_forward(
        params, cfg, inputs_embeds, cache, attn_mask, positions=positions, image_mask=image_mask,
        use_flash=use_flash, lora_bank=lora_bank, lora_ids=lora_ids,
    )
    # pick the last valid position among the T new tokens
    new_mask = lax.dynamic_slice(attn_mask, (0, cache.length - T), (B, T))
    last_idx = jnp.sum(new_mask.astype(jnp.int32), axis=1) - 1  # (B,)
    last_hidden = jnp.take_along_axis(hidden, last_idx[:, None, None].astype(jnp.int32), axis=1)
    logits = compute_logits(params, cfg, last_hidden)[:, 0]
    # roll the cache length back over padding so the next token writes right
    # after the last VALID prompt token
    cache = LLMCache(cache.k, cache.v, cache.length - T + (last_idx[0] + 1).astype(jnp.int32))
    return logits, cache


# ---------------------------------------------------------------------------
# Text decode loop
# ---------------------------------------------------------------------------


class DecodeResult(NamedTuple):
    tokens: jax.Array  # (max_steps,) int32, entries [0, num) valid
    num: jax.Array  # int32 number of sampled tokens
    last_token: jax.Array  # int32 final sampled token (eos/image_start/max-len cutoff)
    cache: LLMCache
    mask: jax.Array
    key: jax.Array
    hidden: jax.Array  # (max_steps, h) last-layer hidden per sampled token
    #   (the thinker->talker feed: vLLM-patch return_hidden_states analog)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_steps", "do_sample", "temperature", "top_k", "top_p"),
    donate_argnames=("cache", "mask"),
)
def decode_text(
    params,
    cfg: BailingMoeConfig,
    first_token,
    cache: LLMCache,
    mask,
    key,
    *,
    max_steps: int,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> DecodeResult:
    """Feed `first_token` and keep sampling until EOS / image-start / max_steps.

    The returned `tokens` buffer holds the newly SAMPLED tokens (not including
    `first_token`); generation stops after recording a stop token.
    """
    tokens0 = jnp.zeros((max_steps,), jnp.int32)
    hidden0 = jnp.zeros((max_steps, cfg.hidden_size), jnp.float32)

    def cond(state):
        i, cur, done, *_ = state
        return jnp.logical_and(i < max_steps, jnp.logical_not(done))

    def body(state):
        i, cur, done, cache, mask, tokens, hiddens, key = state
        mask = lax.dynamic_update_slice(mask, jnp.ones((1, 1), mask.dtype), (0, cache.length))
        pos = jnp.sum(mask.astype(jnp.int32), axis=1)[:, None] - 1
        embeds = embed_tokens(params, cur.reshape(1, 1)).astype(cache.k.dtype)
        hidden, cache = bailing_forward(params, cfg, embeds, cache, mask, positions=pos)
        logits = compute_logits(params, cfg, hidden)[:, -1]
        key, sub = jax.random.split(key)
        nxt = sample_token(logits, sub, do_sample=do_sample, temperature=temperature, top_k=top_k, top_p=top_p)[0]
        tokens = tokens.at[i].set(nxt)
        hiddens = lax.dynamic_update_slice(hiddens, hidden[0, -1:].astype(jnp.float32), (i, 0))
        done = jnp.logical_or(nxt == cfg.eos_token_id, nxt == cfg.image_start_token)
        return (i + 1, nxt, done, cache, mask, tokens, hiddens, key)

    init = (jnp.int32(0), first_token.astype(jnp.int32), jnp.bool_(False), cache, mask, tokens0, hidden0, key)
    i, cur, done, cache, mask, tokens, hiddens, key = lax.while_loop(cond, body, init)
    return DecodeResult(tokens, i, cur, cache, mask, key, hiddens)


# ---------------------------------------------------------------------------
# AR image generation (the triple loop, reference generate_image :1844-1965)
# ---------------------------------------------------------------------------


class ImageGenResult(NamedTuple):
    sem_tokens: jax.Array  # (1, 256, feature_dim) semantic tokens
    last_hidden: jax.Array  # (1, 1, h) hidden state after the trailing LLM step
    cache: LLMCache  # CFG-row cache (caller truncates to row 0)
    mask: jax.Array  # (R, Smax) grown attention mask


@functools.partial(
    jax.jit,
    static_argnames=("llm_cfg", "mingtok_cfg", "rf_cfg", "gen_cfg", "cfg_rows", "n_images"),
    donate_argnames=("cache",),
)
def generate_image_tokens(
    params,  # {"llm", "vis_head", "rf_head", "linear_proj", "mingtok"}
    llm_cfg: BailingMoeConfig,
    mingtok_cfg: MingTokConfig,
    rf_cfg: RFHeadConfig,
    gen_cfg: ImageGenConfig,
    image_start_embed,  # (1, 1, h) embedding of the <image> token
    cache: LLMCache,  # already expanded to cfg_rows
    row_masks,  # (R*n_images, Smax) bool — BLOCK-major CFG rows (see below)
    key,
    *,
    cfg_rows: int,
    n_images: int = 1,
) -> ImageGenResult:
    """The jitted 256-token AR image loop.

    Per token: LLM step over the CFG rows -> vis_head -> rectified-flow Euler
    sample (16 steps, 2/3-way CFG, shared noise) -> MingTok semantic-decoder
    step -> linear_proj -> next LLM input embedding; attention-mask buffers grow
    by one for every row (reference :1904-1952). A trailing LLM step produces
    the hidden state for the next text token (reference loops 257x, :1904).

    BATCHED serving (n_images > 1): rows are laid out BLOCK-major —
    [conds 0..n, unconds 0..n(, text_unconds 0..n)] — which is exactly the
    thirds/halves split rf_sample's guidance uses, so the per-image CFG combine
    vectorizes for free while the decode weight reads amortize over all rows.
    Each image draws its OWN shared-across-rows RF noise. cache/row_masks must
    be pre-arranged block-major (e.g. concatenate the per-image prefix caches
    per CFG block).
    """
    R = cfg_rows
    n_img = n_images
    Rt = R * n_img  # total LLM rows
    n_tokens = gen_cfg.num_image_tokens
    h = image_start_embed.shape[-1]
    feat_dim = mingtok_cfg.feature_dim
    sem_dtype = image_start_embed.dtype

    sem_cache = make_semdec_cache(
        mingtok_cfg.semantic_decoder, n_img, n_tokens + 1, dtype=sem_dtype
    )
    sem_tokens0 = jnp.zeros((n_img, n_tokens, feat_dim), sem_dtype)
    embeds0 = jnp.broadcast_to(image_start_embed, (Rt, 1, h))

    def cfg_at(i):
        if gen_cfg.cfg_schedule == "constant":
            return jnp.float32(gen_cfg.text_cfg), jnp.float32(gen_cfg.image_cfg)
        i = i.astype(jnp.float32)
        if gen_cfg.cfg_schedule == "linear":
            t = 1.0 + (gen_cfg.text_cfg - 1.0) * (256.0 - i) / 256.0
            g = 1.0 + (gen_cfg.image_cfg - 1.0) * (256.0 - i) / 256.0
        elif gen_cfg.cfg_schedule == "linear-reverse":
            t = 1.0 + (gen_cfg.text_cfg - 1.0) * i / 255.0
            g = 1.0 + (gen_cfg.image_cfg - 1.0) * i / 255.0
        else:
            raise NotImplementedError(gen_cfg.cfg_schedule)
        return t, g

    def llm_step(embeds, cache, masks):
        pos = jnp.sum(masks.astype(jnp.int32), axis=1)[:, None] - 1  # (R, 1) per-row positions
        hidden, cache = bailing_forward(params["llm"], llm_cfg, embeds, cache, masks, positions=pos)
        return hidden, cache

    def body(i, state):
        embeds, cache, masks, sem_cache, sem_tokens, key = state
        # mark the position the current embeds will occupy, for every CFG row
        masks = lax.dynamic_update_slice(masks, jnp.ones((Rt, 1), masks.dtype), (0, cache.length))
        with jax.profiler.TraceAnnotation("imggen/llm_step"):
            hidden, cache = llm_step(embeds, cache, masks)

        z = vis_head_apply(params["vis_head"], hidden[:, -1])  # (Rt, z)
        tcfg, icfg = cfg_at(i)
        key, sub = jax.random.split(key)
        latent = rf_sample(
            params["rf_head"],
            rf_cfg,
            z,
            sub,
            temperature=gen_cfg.temperature,
            text_cfg=tcfg,
            image_cfg=icfg,
            cfg_renorm_type=gen_cfg.cfg_renorm_type,
            time_shifting_factor=gen_cfg.time_shifting_factor,
            cfg_rows=R,  # explicit: block-major B = R*n_img must stay GUIDED
        )  # (Rt, 32) — all rows carry their image's guided sample

        with jax.profiler.TraceAnnotation("imggen/semdec_step"):
            sem_out, sem_cache = mingtok_feature_decoder(
                params["mingtok"], mingtok_cfg, latent[:n_img][:, None, :], sem_cache, compute_dtype=sem_dtype
            )
        sem = sem_out["x_norm_patchtokens"]  # (n_img, 1, feat)
        sem_tokens = lax.dynamic_update_slice(sem_tokens, sem.astype(sem_tokens.dtype), (0, i, 0))

        # (the reference's whole generate runs under bf16 autocast — keep bf16)
        nxt = linear_proj_apply(params["linear_proj"], sem).astype(embeds.dtype)
        embeds = jnp.tile(nxt, (R, 1, 1))  # block-major broadcast to all CFG rows
        return (embeds, cache, masks, sem_cache, sem_tokens, key)

    state = (embeds0, cache, row_masks.astype(bool), sem_cache, sem_tokens0, key)
    embeds, cache, masks, sem_cache, sem_tokens, key = lax.fori_loop(0, n_tokens, body, state)

    # trailing LLM step (reference iterates num_image_tokens+1 times): its hidden
    # state yields the logits for the next text token, and its KV stays in cache.
    masks = lax.dynamic_update_slice(masks, jnp.ones((Rt, 1), masks.dtype), (0, cache.length))
    hidden, cache = llm_step(embeds, cache, masks)
    return ImageGenResult(sem_tokens, hidden[:n_img, -1:], cache, masks)


@functools.partial(jax.jit, static_argnames=("mingtok_cfg",))
def pixel_decode(mingtok_params, mingtok_cfg: MingTokConfig, sem_tokens):
    """Decode the full 256-token semantic sequence to a (1, 3, 512, 512) image."""
    return mingtok_pixel_decoder(mingtok_params, mingtok_cfg, sem_tokens.astype(jnp.float32))
