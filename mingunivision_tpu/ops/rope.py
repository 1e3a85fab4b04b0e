"""Rotary position embeddings: 1-D and 3-D multimodal (MRoPE).

Parity notes (reference mingunivision/modeling_bailing_moe.py):
  - rotate-half convention (:428-433): split head_dim in two halves.
  - cos/sin tables are ``cat(freqs, freqs)`` (:230-233 etc.), fp32.
  - 3-D/MRoPE (:413-425, :463-469): per-plane (t,h,w) tables combined by
    interleaving ``mrope_section*2 = [16,24,24,16,24,24]`` chunks, plane ``i%3``.
    When all three planes carry identical flat positions — which is how the
    Ming-UniVision HF path drives it — MRoPE reduces exactly to 1-D RoPE; we
    exploit that and only compute per-plane tables when planes actually differ.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def rope_cos_sin(positions, dim: int, theta: float):
    """cos/sin tables for 1-D RoPE.

    positions: int array (..., L). Returns (cos, sin) fp32 of shape (..., L, dim).
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., L, dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def mrope_cos_sin(positions, dim: int, theta: float, sections: Sequence[int]):
    """cos/sin for 3-D MRoPE.

    positions: int array (3, B, L) — (t, h, w) position planes.
    Returns (cos, sin) of shape (B, L, dim), with the per-plane tables interleaved
    by `sections` doubled (reference apply_multimodal_rotary_pos_emb :463-469).
    """
    cos3, sin3 = rope_cos_sin(positions, dim, theta)  # (3, B, L, dim)
    secs = list(sections) * 2
    bounds = jnp.cumsum(jnp.array([0] + secs))
    cos_parts = []
    sin_parts = []
    for i, s in enumerate(secs):
        lo = int(bounds[i])
        cos_parts.append(cos3[i % 3, ..., lo : lo + s])
        sin_parts.append(sin3[i % 3, ..., lo : lo + s])
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q, k, cos, sin):
    """Apply rotary embedding.

    q: (B, T, Hq, D), k: (B, T, Hk, D); cos/sin: (B, T, D) fp32.
    Rotation math in fp32, cast back to input dtype.
    """
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        return ((xf * cos) + (rotate_half(xf) * sin)).astype(x.dtype)

    return rot(q), rot(k)
