"""Attention primitives (XLA path).

Layout convention everywhere: ``(batch, seq, heads, head_dim)`` — the layout both
XLA's fused attention and our Pallas kernels prefer (no transposes on the hot path).

All softmaxes are fp32. GQA is expressed by reshaping queries to
``(B, T, Hkv, G, D)`` and contracting against un-replicated KV — XLA keeps KV
un-materialized (the reference materializes `repeat_kv`, modeling_bailing_moe.py:643).

The Pallas flash/splash kernels in ``ops/kernels`` override these on TPU for long
sequences; these XLA versions are the reference-correct fallback and the CPU path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def mha(
    q,
    k,
    v,
    *,
    scale: Optional[float] = None,
    mask=None,
    is_causal: bool = False,
    q_offset=0,
    kv_head_major: bool = False,
):
    """Multi-head (optionally grouped-query) attention.

    Args:
      q: (B, T, Hq, D)
      k, v: (B, S, Hkv, D) — or (B, Hkv, S, D) with `kv_head_major=True`, the
        native layout of the preallocated KV caches (XLA AUTO-layout probe:
        head-major KV avoids per-step relayout copies in cached attention).
      scale: default D**-0.5
      mask: optional boolean, broadcastable to (B, 1, T, S); True = attend.
      is_causal: apply causal masking with query positions offset by `q_offset`
        (i.e. query i attends keys <= q_offset + i). Composable with `mask`.

    Returns (B, T, Hq, D) in q.dtype.
    """
    B, T, Hq, D = q.shape
    if kv_head_major:
        Hkv, S = k.shape[1], k.shape[2]
    else:
        S, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5

    from mingunivision_tpu.ops.linear import _FP32_PRECISION

    qg = q.reshape(B, T, Hkv, G, D)
    precision = _FP32_PRECISION.get() if q.dtype == jnp.float32 else None
    kv_sub = "bhsd" if kv_head_major else "bshd"
    # scores: (B, Hkv, G, T, S), fp32 accumulation
    scores = jnp.einsum(
        f"bthgd,{kv_sub}->bhgts", qg, k, preferred_element_type=jnp.float32, precision=precision
    )
    scores = scores * jnp.float32(scale)

    if is_causal:
        q_pos = q_offset + jnp.arange(T)[:, None]
        k_pos = jnp.arange(S)[None, :]
        causal = k_pos <= q_pos  # (T, S)
        scores = jnp.where(causal[None, None, None], scores, NEG_INF)
    if mask is not None:
        m = jnp.broadcast_to(mask, (B, 1, T, S))[:, :, None]  # (B, 1, 1, T, S)
        scores = jnp.where(m, scores, NEG_INF)

    probs = jnp.exp(scores - lax.stop_gradient(jnp.max(scores, axis=-1, keepdims=True)))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        f"bhgts,{kv_sub}->bthgd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out.reshape(B, T, Hq, D).astype(q.dtype)


def cached_decode_attention(q, k_cache, v_cache, cache_len, *, scale=None, extra_mask=None, kv_head_major: bool = False):
    """Single-step attention over a preallocated KV cache.

    Args:
      q: (B, 1, Hq, D)
      k_cache, v_cache: (B, Smax, Hkv, D) — or head-major (B, Hkv, Smax, D) with
        `kv_head_major=True` — only the first `cache_len` entries valid.
      cache_len: int32 scalar or (B,) — number of valid cache positions
        (INCLUDING the current step, which must already be written).
      extra_mask: optional boolean (B, Smax) of additionally-allowed positions
        (e.g. the per-CFG-row attention masks); combined with the validity mask.

    Returns (B, 1, Hq, D).
    """
    B, _, Hq, D = q.shape
    Smax = k_cache.shape[2] if kv_head_major else k_cache.shape[1]
    valid = jnp.arange(Smax)[None, :] < jnp.reshape(jnp.asarray(cache_len), (-1, 1))  # (B or 1, Smax)
    valid = jnp.broadcast_to(valid, (B, Smax))
    if extra_mask is not None:
        valid = jnp.logical_and(valid, extra_mask)
    return mha(q, k_cache, v_cache, scale=scale, mask=valid[:, None, None, :], kv_head_major=kv_head_major)
