"""Token sampling: greedy / temperature / top-k / top-p, all jit-safe.

HF-generate-equivalent semantics (the reference delegates to transformers
GenerationMixin; the shipped generation_config uses greedy decoding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e10)


def sample_token(logits, key, *, do_sample: bool = False, temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0):
    """logits: (B, vocab) fp32 -> (B,) int32."""
    if not do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if temperature != 1.0:
        logits = logits / jnp.float32(temperature)
    if top_k and top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep smallest set with cumulative prob >= top_p (HF semantics: shift right)
        cutoff_mask = cum - probs > top_p
        cutoff = jnp.where(cutoff_mask, NEG_INF, sorted_logits).min(axis=-1, keepdims=True)
        logits = jnp.where(logits < cutoff, NEG_INF, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def sample_token_per_slot(logits, key, *, do_sample, temperature, top_k, top_p):
    """Per-ROW sampling params as device arrays — ONE compiled graph serves a
    mixed pool (greedy + sampled, different temperatures/top-k/top-p per slot),
    the vLLM SamplingParams analog (ming_lite patch :2137-2157).

    logits: (B, vocab) fp32; do_sample (B,) bool; temperature/top_p (B,) f32;
    top_k (B,) int32 (0 = off). Returns (B,) int32.
    """
    B, V = logits.shape
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    t = jnp.maximum(temperature.astype(jnp.float32), 1e-6)[:, None]
    l = logits / t
    sorted_l = jnp.sort(l, axis=-1)[:, ::-1]  # desc
    # per-row top-k: k-th largest value; k<=0 -> keep all
    kidx = jnp.clip(top_k.astype(jnp.int32) - 1, 0, V - 1)[:, None]
    kth = jnp.take_along_axis(sorted_l, kidx, axis=-1)
    kth = jnp.where((top_k > 0)[:, None], kth, NEG_INF)
    l = jnp.where(l < kth, NEG_INF, l)
    # per-row top-p (HF shift-right semantics) on the top-k-FILTERED logits
    # (sequential warper order, matching sample_token)
    sorted_l = jnp.sort(l, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_l, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_mask = cum - probs > top_p.astype(jnp.float32)[:, None]
    cutoff = jnp.where(cutoff_mask, NEG_INF, sorted_l).min(axis=-1, keepdims=True)
    cutoff = jnp.where((top_p < 1.0)[:, None], cutoff, NEG_INF)
    l = jnp.where(l < cutoff, NEG_INF, l)
    sampled = jax.random.categorical(key, l, axis=-1).astype(jnp.int32)
    return jnp.where(do_sample, sampled, greedy)
