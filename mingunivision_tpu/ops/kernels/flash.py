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
        BlockSizes,
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


def flash_vit_attention(q, k, v, *, scale: float, block: int = 512):
    """Non-causal full-sequence ViT attention, HEAD-MAJOR (B, H, N, D) in/out.

    The XLA path materializes (B, H, N, N) fp32 scores — for the 24-layer
    pixel decoder (N=1024, H=16, b8) that is ~0.5 GB of HBM traffic per
    layer, the dominant cost of the recon primary metric. The caller produces
    q/k/v head-major straight from the projection einsum (a separate
    transpose of (B,N,H,D) costs ~2.7 ms/layer at this shape — more than the
    kernel itself; measured v5e sweep in BENCHMARKS "ViT flash attention").
    N must be a multiple of 128 (pixel decoder N=1024; encoder at 1024px
    understanding N=1025 stays on the XLA path).
    """
    N = q.shape[2]
    n = N
    while N % n:
        n //= 2
    n = max(128, min(n, 1024))
    bs = BlockSizes(
        block_q=n, block_k_major=n, block_k=n, block_b=1,
        block_q_major_dkv=n, block_k_major_dkv=n, block_k_dkv=n, block_q_dkv=n,
        block_k_major_dq=n, block_k_dq=n, block_q_dq=n,
    )
    dt = q.dtype
    if dt == jnp.float32:
        # only reachable under the "default"-precision tier (see gate): the
        # kernel's dots are single-pass bf16 MXU either way
        q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    out = _flash(q, k, v, causal=False, sm_scale=scale, block_sizes=bs)
    return out.astype(dt)


def flash_vit_usable(N: int, dtype) -> bool:
    """ViT full-sequence gate: TPU, tile-aligned N, and a numerics tier the
    kernel's single-pass-bf16 internal dots cannot degrade — bf16 inputs
    always qualify, fp32 only under DEFAULT matmul precision (using it at
    "high"/"highest" would silently break those tiers' fp32-class
    guarantee)."""
    if not (FLASH_AVAILABLE and jax.default_backend() == "tpu" and N >= 512 and N % 128 == 0):
        return False
    if dtype == jnp.bfloat16:
        return True
    if dtype == jnp.float32:
        from jax import lax

        from mingunivision_tpu.ops.linear import _FP32_PRECISION

        return _FP32_PRECISION.get() == lax.Precision.DEFAULT
    return False
