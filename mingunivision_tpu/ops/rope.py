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


def linear_scaled_cos_sin(positions, dim: int, theta: float, scaling_factor: float):
    """Linear RoPE scaling (reference BailingMoeLinearScalingRotaryEmbedding
    :284-302): positions divided by the factor."""
    return rope_cos_sin(positions.astype(jnp.float32) / scaling_factor, dim, theta)


def dynamic_ntk_theta(seq_len: int, dim: int, theta: float, scaling_factor: float, max_position_embeddings: int) -> float:
    """Dynamic-NTK base adjustment (reference :304-355): when the sequence
    exceeds the trained length, the base grows so the longest wavelength covers
    the new window."""
    if seq_len <= max_position_embeddings:
        return theta
    alpha = scaling_factor * seq_len / max_position_embeddings - (scaling_factor - 1)
    return theta * alpha ** (dim / (dim - 2))


def _yarn_find_correction_dim(num_rotations, dim, base, max_pos):
    import math

    return (dim * math.log(max_pos / (num_rotations * 2 * math.pi))) / (2 * math.log(base))


def yarn_get_mscale(scale: float, mscale: float = 1.0) -> float:
    import math

    if scale <= 1:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def yarn_cos_sin(
    positions,
    dim: int,
    theta: float,
    scaling_factor: float,
    *,
    original_max_position_embeddings: int = 4096,
    beta_fast: float = 32.0,
    beta_slow: float = 1.0,
    mscale: float = 1.0,
    mscale_all_dim: float = 0.0,
):
    """YaRN RoPE scaling (reference BailingMoeYarnRotaryEmbedding :357-411):
    per-dimension interpolation between scaled and unscaled frequencies with a
    linear ramp between the beta_fast/beta_slow correction dims, plus the
    attention-temperature mscale folded into cos/sin."""
    import math

    half = dim // 2
    pos_freqs = theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    inv_freq_extrapolation = 1.0 / pos_freqs
    inv_freq_interpolation = 1.0 / (scaling_factor * pos_freqs)

    low = math.floor(_yarn_find_correction_dim(beta_fast, dim, theta, original_max_position_embeddings))
    high = math.ceil(_yarn_find_correction_dim(beta_slow, dim, theta, original_max_position_embeddings))
    low, high = max(low, 0), min(high, half - 1)
    ramp = jnp.clip((jnp.arange(half, dtype=jnp.float32) - low) / max(high - low, 1e-3), 0.0, 1.0)
    inv_freq_mask = 1.0 - ramp  # 1 -> extrapolate (high freq), 0 -> interpolate
    inv_freq = inv_freq_interpolation * (1 - inv_freq_mask) + inv_freq_extrapolation * inv_freq_mask

    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    _mscale = float(yarn_get_mscale(scaling_factor, mscale) / yarn_get_mscale(scaling_factor, mscale_all_dim))
    return jnp.cos(emb) * _mscale, jnp.sin(emb) * _mscale


def scaled_rope_cos_sin(positions, dim: int, theta: float, *, scaling_type: str = "none", scaling_factor: float = 1.0, seq_len: int = 0, max_position_embeddings: int = 32768, **yarn_kwargs):
    """Dispatch over the reference's RoPE scaling family (config rope_scaling)."""
    if scaling_type in ("none", None) or scaling_factor in (None, 1.0) and scaling_type not in ("yarn",):
        if scaling_type == "dynamic":
            theta = dynamic_ntk_theta(seq_len, dim, theta, scaling_factor or 1.0, max_position_embeddings)
        return rope_cos_sin(positions, dim, theta)
    if scaling_type == "linear":
        return linear_scaled_cos_sin(positions, dim, theta, scaling_factor)
    if scaling_type == "dynamic":
        theta = dynamic_ntk_theta(seq_len, dim, theta, scaling_factor, max_position_embeddings)
        return rope_cos_sin(positions, dim, theta)
    if scaling_type == "yarn":
        return yarn_cos_sin(positions, dim, theta, scaling_factor, **yarn_kwargs)
    raise ValueError(f"unknown rope scaling {scaling_type}")


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
