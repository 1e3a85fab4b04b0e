"""Pallas flash-attention wrapper for prefill (TPU).

XLA's attention materializes the (B, H, T, T) score matrix — at a 4096-token
understanding prompt that's ~1 GB of fp32 HBM traffic per layer. The Pallas
flash kernel (ships with JAX) keeps scores in VMEM tiles. We use it for
first-round prefill, where queries and (valid) keys are the same right-padded
block: padding is expressed through segment ids (pad -> segment 0, valid -> 1),
causal handles the rest. GQA queries are grouped by repeating KV heads (prefill
only — the decode path never materializes repeated KV).

Fallback to the XLA path off-TPU or on assertion failures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention as _flash,
    )

    FLASH_AVAILABLE = True
except Exception:  # pragma: no cover
    FLASH_AVAILABLE = False


def flash_prefill_attention(q, k, v, valid_mask, *, scale: float):
    """q: (B, T, Hq, D); k/v: (B, T, Hkv, D); valid_mask: bool (B, T).

    Returns (B, T, Hq, D). Causal within the valid prefix; padded positions
    produce garbage that callers already ignore (their mask bits stay 0).
    """
    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    if Hq != Hkv:
        rep = Hq // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    seg = valid_mask.astype(jnp.int32)  # pad=0, valid=1 -> cross terms masked
    out = _flash(
        qt,
        kt,
        vt,
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=True,
        sm_scale=scale,
    )
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def flash_usable(T: int) -> bool:
    """Static gate: kernel needs TPU + tile-friendly lengths."""
    return FLASH_AVAILABLE and jax.default_backend() == "tpu" and T >= 512 and T % 128 == 0
