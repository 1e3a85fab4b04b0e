"""Ragged grouped-matmul MoE dispatch (megablox-style) for prefill.

Replaces the reference's argsort + per-expert Python loop `moe_infer`
(modeling_bailing_moe.py:608-639), which is untranslatable to TPU (dynamic
shapes), with a static-shape sort-based dispatch:

  sort assignments by expert -> grouped matmul over expert-contiguous rows
  (Pallas `gmm` kernel: each m-tile multiplies against exactly the experts it
  intersects; HBM reads ~= active expert weights once) -> unsort -> weighted sum.

FLOPs = exact top-k compute (vs the (E/k)x overcompute of the masked-dense
fallback in models/bailing_moe.py). TPU-only; callers fall back to masked-dense
on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:  # the gmm kernel ships with JAX (jax.experimental.pallas.ops.tpu.megablox)
    from jax.experimental.pallas.ops.tpu.megablox import gmm as _gmm

    GMM_AVAILABLE = True
except Exception:  # pragma: no cover
    _gmm = None
    GMM_AVAILABLE = False


def moe_experts_gmm(experts, x_flat, topk_idx, topk_w, num_experts: int, *, tiling=(128, 128, 128)):
    """Exact top-k MoE via grouped matmul.

    experts: dict with gate_proj/up_proj (E, h, m) and down_proj (E, m, h).
    x_flat: (N, h); topk_idx: (N, k) int32; topk_w: (N, k) in x dtype.
    Returns (N, h).
    """
    N, k = topk_idx.shape
    flat_e = topk_idx.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)
    token_idx = order // k
    xs = jnp.take(x_flat, token_idx, axis=0)  # (N*k, h) expert-sorted
    group_sizes = jnp.bincount(flat_e, length=num_experts).astype(jnp.int32)

    g = _gmm(xs, experts["gate_proj"].astype(xs.dtype), group_sizes, tiling=tiling)
    u = _gmm(xs, experts["up_proj"].astype(xs.dtype), group_sizes, tiling=tiling)
    a = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(xs.dtype)
    y = _gmm(a, experts["down_proj"].astype(xs.dtype), group_sizes, tiling=tiling)

    w_sorted = jnp.take(topk_w.reshape(-1), order, axis=0)
    y = y.astype(jnp.float32) * w_sorted.astype(jnp.float32)[:, None]
    out = jnp.zeros((N, x_flat.shape[-1]), jnp.float32).at[token_idx].add(y)
    return out.astype(x_flat.dtype)
