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
