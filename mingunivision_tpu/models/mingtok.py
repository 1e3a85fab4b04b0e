"""MingTok-Vision: the three-part continuous visual tokenizer, TPU-native.

  low-level encoder (bidirectional ViT, 512px/patch32 -> 32-d latents)
  -> semantic decoder (causal ViT, 32 -> 1024-d features, KV-cached)
  -> pixel decoder   (bidirectional ViT, 1024-d -> RGB patches, fp32)

Parity map against the reference (mingtok/):
  - encode / latent standardization:     modeling_mingtok.py:156-166
  - feature decoder (cached, un-scale):  modeling_mingtok.py:165-177
  - pixel decode (fp32, clamp [-1,1]):   modeling_mingtok.py:179-194
  - CLS appended AFTER patch tokens:     vision_transformer.py:218-223
  - out-layer channel-mean shortcut:     vision_transformer.py:173-178
  - in-proj tile shortcut (x32 repeat):  vision_transformer.py:373-380
  - sem_to_pix 2x2 spatial expand:       modeling_mingtok.py:182-188

Dtype policy (reference maybe_autocast semantics): encoder + semantic decoder
compute in bf16, pixel decoder in fp32; params are stored at master precision and
cast inside matmuls.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mingunivision_tpu.config import MingTokConfig, ViTEncoderConfig
from mingunivision_tpu.models.vit import (
    ViTCache,
    patch_embed_apply,
    patch_embed_init,
    run_blocks,
    run_blocks_cached,
    run_blocks_cached_rows,
    stacked_block_init,
)
from mingunivision_tpu.ops.activations import gelu_exact
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.norms import layer_norm
from mingunivision_tpu.ops.patching import expand_sem_to_pix_tokens, interpolate_pos_embed, unpatchify
from mingunivision_tpu.utils.init import linear_init, trunc_normal


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_mingtok_params(key, cfg: MingTokConfig, dtype=jnp.float32):
    enc, sem, pix = cfg.encoder, cfg.semantic_decoder, cfg.pixel_decoder
    ks = jax.random.split(key, 12)
    ratio = sem.patch_size // pix.patch_size

    params = {
        "encoder": {
            "patch_embed": patch_embed_init(ks[0], enc.patch_size, enc.in_chans, enc.embed_dim, dtype=dtype),
            "cls_token": jnp.zeros((1, 1, enc.embed_dim), dtype),
            "pos_embed": trunc_normal(ks[1], (1, enc.num_patches + 1, enc.embed_dim), std=0.02, dtype=dtype),
            "blocks": stacked_block_init(
                ks[2], enc.depth, enc.embed_dim, enc.num_heads, enc.mlp_ratio, enc.ffn_layer, dtype=dtype
            ),
            "out_norm": {"w": jnp.ones((enc.embed_dim,), dtype), "b": jnp.zeros((enc.embed_dim,), dtype)},
            "out_proj": linear_init(ks[3], enc.embed_dim, enc.out_dim, dtype=dtype),
        },
        "semantic_decoder": {
            "in_proj": linear_init(ks[4], sem.in_dim, sem.embed_dim, dtype=dtype),
            "blocks": stacked_block_init(
                ks[5], sem.depth, sem.embed_dim, sem.num_heads, sem.mlp_ratio, sem.ffn_layer, dtype=dtype
            ),
            "norm": {"w": jnp.ones((sem.embed_dim,), dtype), "b": jnp.zeros((sem.embed_dim,), dtype)},
        },
        "pixel_decoder": {
            "blocks": stacked_block_init(
                ks[6], pix.depth, pix.embed_dim, pix.num_heads, pix.mlp_ratio, pix.ffn_layer, dtype=dtype
            ),
            "norm": {"w": jnp.ones((pix.embed_dim,), dtype), "b": jnp.zeros((pix.embed_dim,), dtype)},
            "head": linear_init(ks[7], pix.embed_dim, pix.patch_size**2 * 3, dtype=dtype),
        },
        "sem_to_pix": linear_init(ks[8], sem.embed_dim, pix.embed_dim * ratio * ratio, dtype=dtype),
    }
    return params


# ---------------------------------------------------------------------------
# Low-level encoder
# ---------------------------------------------------------------------------


def encoder_apply(params, cfg: ViTEncoderConfig, images, *, compute_dtype=jnp.bfloat16, remat: bool = False):
    """images (B, 3, H, W) -> 32-d latents (B, h*w + 1, out_dim), CLS last."""
    B, _, H, W = images.shape
    x = patch_embed_apply(params["patch_embed"], images.astype(compute_dtype), cfg.patch_size)
    cls = jnp.broadcast_to(params["cls_token"].astype(compute_dtype), (B, 1, cfg.embed_dim))
    x = jnp.concatenate([x, cls], axis=1)  # CLS AFTER patches (reference quirk)

    new_grid = H // cfg.patch_size
    pe = interpolate_pos_embed(
        params["pos_embed"].astype(jnp.float32), cfg.grid_size, new_grid, offset=cfg.interpolate_offset
    )
    x = x + pe.astype(compute_dtype)

    x = run_blocks(params["blocks"], x, num_heads=cfg.num_heads, ffn_layer=cfg.ffn_layer, ln_eps=cfg.ln_eps, remat=remat)

    # out layer: channel-mean shortcut + norm -> GELU -> proj (vision_transformer.py:173-178)
    shortcut = x.reshape(*x.shape[:-1], cfg.out_dim, cfg.embed_dim // cfg.out_dim).mean(-1)
    y = layer_norm(x, params["out_norm"]["w"], params["out_norm"]["b"], eps=cfg.ln_eps)
    y = dense(gelu_exact(y), params["out_proj"])
    return shortcut + y


# ---------------------------------------------------------------------------
# Semantic decoder (causal, KV-cached)
# ---------------------------------------------------------------------------


def _sem_in_proj(params, cfg, x):
    """in_proj + tile shortcut: each of the 32 channels repeated 32x contiguously
    (vision_transformer.py:373-380)."""
    shortcut = jnp.repeat(x, cfg.embed_dim // cfg.in_dim, axis=-1)
    return dense(x, params["in_proj"]) + shortcut


def semantic_decoder_apply(params, cfg, latents, *, compute_dtype=jnp.bfloat16, split_cls: bool = True, remat: bool = False):
    """Full-sequence (non-cached) semantic decode.

    latents: (B, N, in_dim). Returns dict with `x_norm_patchtokens` (B, N-1, D)
    and `x_norm_clstoken` when split_cls and N > 1, else the full normed sequence.
    """
    x = _sem_in_proj(params, cfg, latents.astype(compute_dtype))
    x = run_blocks(params["blocks"], x, num_heads=cfg.num_heads, ffn_layer=cfg.ffn_layer, is_causal=True, ln_eps=cfg.ln_eps, remat=remat)
    x_norm = layer_norm(x, params["norm"]["w"], params["norm"]["b"], eps=cfg.ln_eps)
    N = x_norm.shape[1]
    if split_cls and cfg.with_cls_token and N > 1:
        return {"x_norm_patchtokens": x_norm[:, :-1], "x_norm_clstoken": x_norm[:, -1]}
    return {"x_norm_patchtokens": x_norm}


def semantic_decoder_step(params, cfg, latents, cache: ViTCache, *, compute_dtype=jnp.bfloat16):
    """Incremental cached decode of T new latent tokens.

    Parity: TransformerDecoder.forward_features with use_cache=True
    (vision_transformer.py:395-429); returns the normed new tokens + new cache.
    """
    x = _sem_in_proj(params, cfg, latents.astype(compute_dtype))
    x, cache = run_blocks_cached(params["blocks"], x, cache, num_heads=cfg.num_heads, ffn_layer=cfg.ffn_layer, ln_eps=cfg.ln_eps)
    x_norm = layer_norm(x, params["norm"]["w"], params["norm"]["b"], eps=cfg.ln_eps)
    return {"x_norm_patchtokens": x_norm}, cache


def make_semdec_cache(cfg, batch: int, max_len: int, dtype=jnp.bfloat16) -> ViTCache:
    return ViTCache.create(cfg.depth, batch, max_len, cfg.num_heads, cfg.embed_dim // cfg.num_heads, dtype)


def mingtok_feature_decoder_rows(params, cfg: MingTokConfig, latents, k, v, write_pos, *, compute_dtype=jnp.bfloat16):
    """`mingtok_feature_decoder` with PER-ROW cache positions (pool decode).

    latents: (B, 1, z); k/v: stacked semantic-decoder caches
    (depth, B, H, max_len, D); write_pos: (B,) int32 — row b's token index in
    its own sequence (slots of a continuous-batching pool progress
    independently). Returns ({"x_norm_patchtokens"}, new_k, new_v).
    """
    sd = cfg.semantic_decoder
    x = latents * cfg.scaling_factor + cfg.mean
    x = _sem_in_proj(params["semantic_decoder"], sd, x.astype(compute_dtype))
    x, k, v = run_blocks_cached_rows(
        params["semantic_decoder"]["blocks"], x, k, v, write_pos,
        num_heads=sd.num_heads, ffn_layer=sd.ffn_layer, ln_eps=sd.ln_eps,
    )
    x_norm = layer_norm(
        x, params["semantic_decoder"]["norm"]["w"], params["semantic_decoder"]["norm"]["b"], eps=sd.ln_eps
    )
    return {"x_norm_patchtokens": x_norm}, k, v


# ---------------------------------------------------------------------------
# Pixel decoder (fp32)
# ---------------------------------------------------------------------------


def pixel_decoder_apply(params, cfg, tokens, *, remat: bool = False):
    """tokens (B, L, D) fp32 -> patch pixels (B, L, p*p*3), returned fp32.

    matmul_precision tiers (PixelDecoderConfig): "highest"/"high"/"default"
    keep fp32 activations and set the fp32-matmul MXU mode; "bf16" runs the
    whole block stack in bf16 activations (norm internals stay fp32) — the
    measured v5e serving tier (BENCHMARKS "Pixel-decoder precision tiers").
    """
    from mingunivision_tpu.ops.linear import fp32_matmul_precision

    if cfg.matmul_precision == "bf16":
        x = tokens.astype(jnp.bfloat16)
        x = run_blocks(params["blocks"], x, num_heads=cfg.num_heads, ffn_layer=cfg.ffn_layer, ln_eps=cfg.ln_eps, remat=remat)
        x = layer_norm(x, params["norm"]["w"], params["norm"]["b"], eps=cfg.ln_eps)
        return dense(x, params["head"]).astype(jnp.float32)
    with fp32_matmul_precision(cfg.matmul_precision):
        x = tokens.astype(jnp.float32)
        x = run_blocks(params["blocks"], x, num_heads=cfg.num_heads, ffn_layer=cfg.ffn_layer, ln_eps=cfg.ln_eps, remat=remat)
        x = layer_norm(x, params["norm"]["w"], params["norm"]["b"], eps=cfg.ln_eps)
        return dense(x, params["head"])


# ---------------------------------------------------------------------------
# MingTok top-level (functional equivalents of modeling_mingtok.py:150-196)
# ---------------------------------------------------------------------------


def mingtok_encode(params, cfg: MingTokConfig, images, *, compute_dtype=jnp.bfloat16, remat: bool = False):
    """Images -> semantic features + standardized latents.

    Returns {"x_norm_patchtokens": (B, N, 1024), "latent": (B, N+1, 32)} with
    latent standardized as (latent - mean) / scaling_factor (modeling_mingtok.py:162).
    """
    latent = encoder_apply(params["encoder"], cfg.encoder, images, compute_dtype=compute_dtype, remat=remat)
    feats = semantic_decoder_apply(params["semantic_decoder"], cfg.semantic_decoder, latent, compute_dtype=compute_dtype, remat=remat)
    return {
        "x_norm_patchtokens": feats["x_norm_patchtokens"],
        "latent": (latent - cfg.mean) / cfg.scaling_factor,
    }


def mingtok_feature_decoder(params, cfg: MingTokConfig, latents, cache: ViTCache, *, compute_dtype=jnp.bfloat16):
    """Standardized latents -> semantic features, incremental w/ KV cache.

    Un-standardizes by latent * scaling_factor + mean first (modeling_mingtok.py:168).
    """
    x = latents * cfg.scaling_factor + cfg.mean
    return semantic_decoder_step(params["semantic_decoder"], cfg.semantic_decoder, x, cache, compute_dtype=compute_dtype)


def mingtok_pixel_decoder(params, cfg: MingTokConfig, features):
    """Semantic features (B, N, 1024) -> RGB image (B, 3, H, W) in [-1, 1], fp32.

    sem_to_pix linear + 2x2 spatial expand + pixel decode + unpatchify + clamp
    (modeling_mingtok.py:179-194).
    """
    from mingunivision_tpu.ops.linear import fp32_matmul_precision

    ratio = cfg.semantic_decoder.patch_size // cfg.pixel_decoder.patch_size
    if cfg.pixel_decoder.matmul_precision == "bf16":
        x = dense(features.astype(jnp.bfloat16), params["sem_to_pix"]).astype(jnp.float32)
    else:
        with fp32_matmul_precision(cfg.pixel_decoder.matmul_precision):
            x = dense(features.astype(jnp.float32), params["sem_to_pix"])
    x = expand_sem_to_pix_tokens(x, ratio)
    x = pixel_decoder_apply(params["pixel_decoder"], cfg.pixel_decoder, x)
    img = unpatchify(x, cfg.pixel_decoder.patch_size)
    return jnp.clip(img, -1.0, 1.0)


def mingtok_enc_dec(params, cfg: MingTokConfig, images, *, compute_dtype=jnp.bfloat16):
    """Full reconstruction: encode -> pixel decode (modeling_mingtok.py:150-154)."""
    feats = mingtok_encode(params, cfg, images, compute_dtype=compute_dtype)
    return mingtok_pixel_decoder(params, cfg, feats["x_norm_patchtokens"])


def pixel_reconstruction_loss(pred_patches, target_images, cfg: MingTokConfig, mask=None):
    """Pixel-decoder training loss (vision_transformer.py:529-562 semantics).

    pred_patches: (B, L, p*p*3) raw head output; target_images: (B, 3, H, W);
    mask: optional bool (B, hw_mask) of MASKED patches (loss on the complement,
    upsampled to the pixel-decoder grid as in the reference).
    loss_type from cfg.pixel_decoder: L2 (+norm_pix), L1, L1-tanh, L1-plain.
    """
    from mingunivision_tpu.ops.patching import patchify

    p = cfg.pixel_decoder.patch_size
    target = patchify(target_images.astype(jnp.float32), p)
    pred = pred_patches.astype(jnp.float32)
    lt = cfg.pixel_decoder.loss_type
    if lt == "L2":
        if cfg.pixel_decoder.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        loss = jnp.square(pred - target)
    elif lt == "L1":
        pred = 2.0 * (pred - pred.min()) / (pred.max() - pred.min() + 1e-12) - 1.0
        loss = jnp.abs(pred - target)
    elif lt == "L1-tanh":
        loss = jnp.abs(jnp.tanh(pred) - target)
    elif lt == "L1-plain":
        loss = jnp.abs(pred - target)
    else:
        raise NotImplementedError(lt)
    loss = loss.mean(axis=-1)  # (B, L) per-patch
    if mask is None:
        return loss.mean()
    B, hw_mask = mask.shape
    hw_tgt = loss.shape[1]
    rep = int(math.isqrt(hw_tgt // hw_mask))
    side = int(math.isqrt(hw_mask))
    keep = ~mask  # loss on KEPT patches (reference inverts, :539)
    keep = keep.reshape(B, side, 1, side, 1)
    keep = jnp.broadcast_to(keep, (B, side, rep, side, rep)).reshape(B, -1).astype(loss.dtype)
    return (loss * keep).sum() / jnp.maximum(keep.sum(), 1.0)
