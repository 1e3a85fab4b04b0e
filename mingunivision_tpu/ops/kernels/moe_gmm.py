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


def expert_sort(flat_e, num_experts: int):
    """Stable counting sort of MoE assignments by expert id (rank via
    one-hot cumsum; yields the inverse permutation for free).

    MEASURED DEAD END on v5e (benchmarks/bench_moe_dispatch.py): the glue
    pass costs 5.56 ms vs 3.89 ms for the argsort pair at 1024 tokens
    (equal at 4096) — the (A, E) one-hot cumsum out-costs the two bitonic
    sorts it replaces. Kept for the bench comparison only; dispatch call
    sites use jnp.argsort.

    Returns (order, inv, group_sizes):
      order (A,) int32 — gather indices: sorted[i] = flat[order[i]]
      inv   (A,) int32 — sorted position of flat assignment i
      group_sizes (num_experts,) int32
    """
    A = flat_e.shape[0]
    e = flat_e.reshape(-1).astype(jnp.int32)
    oh = (e[:, None] == jnp.arange(num_experts, dtype=jnp.int32)[None, :]).astype(jnp.int32)
    within = jnp.cumsum(oh, axis=0)  # inclusive count of same-expert rows at <= i
    group_sizes = within[-1]
    rank = jnp.sum(within * oh, axis=1) - 1  # rank of row i within its own expert
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(group_sizes)[:-1]])
    inv = jnp.take(offsets, e) + rank
    order = jnp.zeros((A,), jnp.int32).at[inv].set(
        jnp.arange(A, dtype=jnp.int32), unique_indices=True
    )
    return order, inv, group_sizes


def moe_experts_gmm(
    experts, x_flat, topk_idx, topk_w, num_experts: int, *, tiling=(128, 512, 512), interpret=False
):
    # default tiling measured on v5e: (128,512,512) = 7.0 ms/layer @1024 tok
    # (vs 22.5 ms at (128,128,128) and 10.1 ms masked-dense)
    """Exact top-k MoE via grouped matmul.

    experts: dict with gate_proj/up_proj (E, h, m) and down_proj (E, m, h).
    x_flat: (N, h); topk_idx: (N, k) int32; topk_w: (N, k) in x dtype.
    Returns (N, h).
    """
    N, k = topk_idx.shape
    A = N * k
    tile_m = tiling[0]
    A_pad = ((A + tile_m - 1) // tile_m) * tile_m  # gmm needs row count % tile_m
    flat_e = topk_idx.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)
    token_idx = order // k
    xs = jnp.take(x_flat, token_idx, axis=0)  # (A, h) expert-sorted
    group_sizes = jnp.bincount(flat_e, length=num_experts).astype(jnp.int32)
    if A_pad != A:
        # pad rows into the LAST group (sorted order stays valid); outputs of the
        # padded rows are dropped at combine time
        xs = jnp.concatenate([xs, jnp.zeros((A_pad - A, xs.shape[1]), xs.dtype)], axis=0)
        group_sizes = group_sizes.at[num_experts - 1].add(A_pad - A)

    g = _gmm(xs, experts["gate_proj"].astype(xs.dtype), group_sizes, tiling=tiling, interpret=interpret)
    u = _gmm(xs, experts["up_proj"].astype(xs.dtype), group_sizes, tiling=tiling, interpret=interpret)
    a = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(xs.dtype)
    y = _gmm(a, experts["down_proj"].astype(xs.dtype), group_sizes, tiling=tiling, interpret=interpret)

    # combine via GATHER-unsort (+ reshape-sum) — a scatter-add with duplicate
    # indices serializes on TPU
    inv = jnp.argsort(order, stable=True)  # position of flat (n, j) in sorted order
    y_orig = jnp.take(y[:A], inv, axis=0).reshape(N, k, -1).astype(jnp.float32)
    out = jnp.sum(y_orig * topk_w.astype(jnp.float32)[..., None], axis=1)
    return out.astype(x_flat.dtype)
