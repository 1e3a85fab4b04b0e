"""Capacity-dense MoE prefill dispatch — sort-free, XLA-native.

Round-4 prefill-MFU work (VERDICT weak #2). The gmm-based dispatch pays two
structural taxes at prefill sizes (1024 tok x top-6 = 6144 assignments over 64
experts):

  1. GLUE: two 6144-element argsorts. A TPU sort is a bitonic network of
     ~log^2(A) sequential compare-exchange passes — latency-, not
     bandwidth-bound; the pair measured 3.9 ms/layer on v5e
     (benchmarks/bench_moe_dispatch.py), dwarfing the 1.35 ms weight-DMA
     floor of the kernel it feeds.
  2. KERNEL: megablox-style tiles re-read each expert's (h, m) weight slice
     once per intersecting token tile; with ~96 rows/expert and tm=128 nearly
     every tile straddles a group boundary, so the 1.06 GB bf16 table is
     streamed ~1.7-2x per layer, and the (tile, chunk) grid is
     per-step-overhead bound (measured 5.5-6.0 ms/layer).

This path removes both:

  rank-within-expert via BLOCKED TRIANGULAR MATMULS (one-hot (A, E) blocks
  hit the MXU against a strictly-lower-triangular (block, block) matrix —
  exact fp32 counts, no sort, ~0.1 ms) -> scatter token rows into an
  (E, capacity, h) buffer -> three BATCHED einsums (XLA batched dot: each
  expert's weights read EXACTLY once; FLOPs = capacity/avg_load x exact)
  -> gather each assignment's row back by its scatter address (no unsort —
  addresses were computed in original assignment order).

Capacity semantics: assignments ranked >= capacity within their expert are
dropped by this path, so it is only exact when max(group_size) <= capacity.
`moe_experts_capacity_exact` guards with lax.cond and falls back to the exact
grouped-matmul dispatch on overflow (rare at capacity >= 2x mean load; the
cond makes the fallback a compile-time cost only).

Parity: computes the same top-k SwiGLU mixture as the reference's `moe_infer`
(/root/reference/mingunivision/modeling_bailing_moe.py:608-639); routing
decisions and combine weights are bit-identical, only the schedule differs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def expert_rank(flat_e, num_experts: int, block: int = 512):
    """Rank of each assignment within its expert (stable, original order) and
    per-expert totals — no sort.

    rank[i] = #{j < i : flat_e[j] == flat_e[i]}, computed as a blocked
    exclusive cumsum of one-hot rows: within-block prefix counts come from a
    strictly-lower-triangular (block, block) fp32 matmul (MXU), cross-block
    offsets from a cumsum over the (A/block, E) block totals. fp32 is exact
    for counts < 2^24.

    Returns (rank (A,) int32, group_sizes (E,) int32).
    """
    A = flat_e.shape[0]
    b = min(block, A)
    Ap = ((A + b - 1) // b) * b
    nb = Ap // b
    e = flat_e.astype(jnp.int32)
    if Ap != A:
        # pad with an out-of-range id: one_hot emits all-zero rows for it
        e = jnp.concatenate([e, jnp.full((Ap - A,), num_experts, jnp.int32)])
    oh_full = jax.nn.one_hot(e, num_experts, dtype=jnp.float32)
    oh = oh_full[:A]
    ohb = oh_full.reshape(nb, b, num_experts)
    tri = jnp.tril(jnp.ones((b, b), jnp.float32), -1)  # strictly lower
    within = jnp.einsum("ij,bje->bie", tri, ohb, precision=lax.Precision.HIGHEST)
    totals = jnp.sum(ohb, axis=1)  # (nb, E)
    prev = jnp.cumsum(totals, axis=0) - totals  # exclusive over blocks
    rank_e = within + prev[:, None, :]  # (nb, b, E)
    rank = jnp.sum(rank_e.reshape(Ap, num_experts)[:A] * oh, axis=1)
    group_sizes = jnp.sum(totals, axis=0)
    return rank.astype(jnp.int32), group_sizes.astype(jnp.int32)


def moe_experts_capacity(
    experts, x_flat, topk_idx, topk_w, num_experts: int, capacity: int
):
    """Capacity-dense top-k MoE: exact iff max group size <= capacity
    (overflowed assignments contribute zero — use the _exact wrapper).

    experts: gate_proj/up_proj (E, h, m), down_proj (E, m, h) — bf16/fp32
    (quantized tiers keep the gmm path; dequantizing the full table here
    would materialize the bf16 weights this path exists to stream once).
    """
    N, k = topk_idx.shape
    A = N * k
    E = num_experts
    h = x_flat.shape[1]
    flat_e = topk_idx.reshape(-1).astype(jnp.int32)

    rank, _ = expert_rank(flat_e, E)
    ok = rank < capacity
    dst = jnp.where(ok, flat_e * capacity + rank, E * capacity)  # overflow -> trash row

    # token row for assignment a = a // k, in ORIGINAL order (no sort)
    xs = jnp.repeat(x_flat, k, axis=0)  # (A, h)
    xb = (
        jnp.zeros((E * capacity + 1, h), x_flat.dtype)
        .at[dst]
        .set(xs, mode="drop")[: E * capacity]
        .reshape(E, capacity, h)
    )

    wg = experts["gate_proj"].astype(xb.dtype)
    wu = experts["up_proj"].astype(xb.dtype)
    wd = experts["down_proj"].astype(xb.dtype)
    g = jnp.einsum("ech,ehm->ecm", xb, wg)
    u = jnp.einsum("ech,ehm->ecm", xb, wu)
    a = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(xb.dtype)
    y = jnp.einsum("ecm,emh->ech", a, wd).reshape(E * capacity, h)

    ys = jnp.take(y, jnp.minimum(dst, E * capacity - 1), axis=0)
    ys = jnp.where(ok[:, None], ys, 0)
    per = ys.reshape(N, k, h).astype(jnp.float32)
    out = jnp.sum(per * topk_w.astype(jnp.float32)[..., None], axis=1)
    return out.astype(x_flat.dtype)


def capacity_src_map(flat_e, rank, num_experts: int, capacity: int):
    """Scatter-free inverse map for the capacity buffer: src[e*C + c] = the
    assignment index routed to expert e with within-expert rank c, and an
    occupancy mask for empty slots.

    XLA TPU lowers a row-scatter (`zeros.at[dst].set(rows)`) of A distinct
    rows to a serialized update loop — ~ms-scale at prefill sizes. This builds
    the same buffer with two small fp32 matmuls (exact for indices < 2^24) and
    ONE row-gather, which TPU executes as a fast dynamic-gather:

      src[e, c]  = sum_a one_hot_e[a] * one_hot_rank[a, c] * a   (MXU matmul)
      occ[e, c]  = any assignment with (e, c)                     (same matmul)
      xb         = where(occ, xs[src], 0)

    Overflowed assignments (rank >= capacity) simply never appear in the map.
    Pad assignments routed out-of-bounds (id == num_experts) contribute
    zero one-hot rows and vanish likewise.
    """
    A = flat_e.shape[0]
    oh_e = jax.nn.one_hot(flat_e, num_experts, dtype=jnp.float32)  # (A, E)
    oh_c = jax.nn.one_hot(jnp.minimum(rank, capacity), capacity, dtype=jnp.float32)  # (A, C); overflow -> dropped by one_hot OOB
    src = jnp.einsum(
        "ae,ac->ec", oh_e * jnp.arange(A, dtype=jnp.float32)[:, None], oh_c,
        precision=lax.Precision.HIGHEST,
    )
    occ = jnp.einsum("ae,ac->ec", oh_e, oh_c, precision=lax.Precision.HIGHEST)
    return src.astype(jnp.int32).reshape(-1), (occ > 0.5).reshape(-1)


def moe_experts_capacity_gmm(
    experts,
    x_flat,
    topk_idx,
    topk_w,
    num_experts: int,
    capacity: int,
    *,
    s8=None,
    interpret: bool = False,
    build: str = "gather",
    layer_idx=None,
):
    """Capacity-dense dispatch through the FUSED SwiGLU grouped-matmul kernel
    with UNIFORM groups: scatter assignments into an (E, capacity, h) buffer,
    then run `swiglu_gmm` with group_sizes = [capacity]*E and tm = capacity.

    Why this beats both parents (measured context in BENCHMARKS.md round 4):
      - vs argsort-gmm: with ~96 rows/expert and tm=128/256, nearly every
        megablox m-tile straddles a group boundary, so each boundary tile runs
        the FULL (tm, h) x (h, m) matmuls once PER intersecting expert with a
        masked store — ~3.6x compute amplification at 1024 tok (374 vs 106
        GFLOP/layer at tm=256). Uniform groups = capacity = tm make every tile
        exactly one expert: 64 visits, zero recompute, each expert's w1/w3/w2
        streamed exactly once (the 1.06 GB bf16 floor).
      - vs the XLA einsum capacity path: no (E, C, m) g/u intermediates round-
        tripping through HBM; silu*mul+down run fused in VMEM.

    Exact iff max group load <= capacity (use moe_experts_capacity_gmm_exact).
    Works for bf16 and QuantizedArray tiers (same kernels as the argsort path).
    """
    from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import swiglu_gmm, swiglu_gmm_quant
    from mingunivision_tpu.utils.quantize import QuantizedArray

    N, k = topk_idx.shape
    E = num_experts
    C = capacity
    h = x_flat.shape[1]
    flat_e = topk_idx.reshape(-1).astype(jnp.int32)

    rank, _ = expert_rank(flat_e, E)
    ok = rank < C
    dst = jnp.where(ok, flat_e * C + rank, E * C)  # overflow -> trash row

    xs = jnp.repeat(x_flat, k, axis=0)  # (A, h), original assignment order
    if build == "gather":
        src, occ = capacity_src_map(flat_e, rank, E, C)
        xb = jnp.where(occ[:, None], jnp.take(xs, src, axis=0), 0)
    else:
        xb = (
            jnp.zeros((E * C + 1, h), x_flat.dtype)
            .at[dst]
            .set(xs, mode="drop")[: E * C]
        )

    group_sizes = jnp.full((E,), C, jnp.int32)
    # tm = C keeps every tile inside one group, but the kernel's working set
    # ((tm, h) fp32 accumulator + double-buffered x/out blocks) scales with tm
    # and blows the VMEM budget once default_capacity grows past ~512 (16k+
    # token prefills). Any tm that DIVIDES C preserves the no-straddle
    # property (group boundaries at multiples of C are also tile boundaries),
    # so use the largest divisor of C that is <= 512.
    tm = C
    if tm > 512:
        tm = next(d for d in range(512, 0, -1) if C % d == 0)
    if isinstance(experts["gate_proj"], QuantizedArray):
        y = swiglu_gmm_quant(
            xb,
            experts["gate_proj"],
            experts["up_proj"],
            experts["down_proj"],
            group_sizes,
            tm=tm,
            interpret=interpret,
            s8=s8,
            layer_idx=layer_idx,
        )
    else:
        y = swiglu_gmm(
            xb,
            experts["gate_proj"].astype(xb.dtype),
            experts["up_proj"].astype(xb.dtype),
            experts["down_proj"].astype(xb.dtype),
            group_sizes,
            tm=tm,
            interpret=interpret,
            layer_idx=layer_idx,
        )

    ys = jnp.take(y, jnp.minimum(dst, E * C - 1), axis=0)
    ys = jnp.where(ok[:, None], ys, 0)
    per = ys.reshape(N, k, h).astype(jnp.float32)
    out = jnp.sum(per * topk_w.astype(jnp.float32)[..., None], axis=1)
    return out.astype(x_flat.dtype)


def moe_experts_capacity_gmm_exact(
    experts,
    x_flat,
    topk_idx,
    topk_w,
    num_experts: int,
    capacity: int,
    *,
    tm_fallback: int = 256,
    s8=None,
    interpret: bool = False,
    token_valid=None,
    layer_idx=None,
):
    """Capacity-gmm guarded by an exactness cond: on overflow (any expert load
    > capacity) run the exact argsort-gmm dispatch instead. Both branches trace
    once; only one executes per step, so skew is a perf event, not a wrong
    answer.

    token_valid: optional bool (N,) marking real (non-pad) rows. Right-padded
    prompts route every pad row to the SAME top-k experts each layer (identical
    pad embeddings), so counting them makes any prompt with pad_count >
    capacity trip the guard on every layer and silently pin the fallback. With
    the mask, pad assignments are routed out-of-bounds (expert id = E): they
    don't count against the guard, can't displace a later sequence's valid rows
    from capacity slots, and their combine weight is zeroed (pad outputs are
    discarded downstream anyway). The fallback branch keeps the ORIGINAL
    routing — it is exact for any assignment set."""
    from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import moe_experts_swiglu_gmm

    if token_valid is not None:
        v = token_valid.reshape(-1)[:, None]
        ti_cap = jnp.where(v, topk_idx, num_experts)
        tw_cap = jnp.where(v, topk_w, 0)
    else:
        ti_cap, tw_cap = topk_idx, topk_w
    # drop-mode count: pad assignments (id == E) fall outside the table
    gs = jnp.zeros((num_experts,), jnp.int32).at[ti_cap.reshape(-1)].add(1, mode="drop")
    fits = jnp.max(gs) <= capacity
    return lax.cond(
        fits,
        lambda ex, x, _ti, _tw, ti, tw: moe_experts_capacity_gmm(
            ex, x, ti, tw, num_experts, capacity, s8=s8, interpret=interpret, layer_idx=layer_idx
        ),
        lambda ex, x, ti, tw, _ti, _tw: moe_experts_swiglu_gmm(
            ex, x, ti, tw, num_experts, tm=tm_fallback, s8=s8, interpret=interpret, layer_idx=layer_idx
        ),
        experts,
        x_flat,
        topk_idx,
        topk_w,
        ti_cap,
        tw_cap,
    )


def moe_experts_capacity_exact(
    experts,
    x_flat,
    topk_idx,
    topk_w,
    num_experts: int,
    capacity: int,
    fallback=None,
):
    """Capacity path guarded by an exactness cond: when any expert's load
    exceeds `capacity`, run `fallback` (default: the masked-dense dispatch)
    instead. Both branches are traced once; only one executes per step."""
    if fallback is None:
        from mingunivision_tpu.models.bailing_moe import moe_experts_dense

        def fallback(ex, x, ti, tw):
            return moe_experts_dense(ex, x, ti, tw, num_experts)

    gs = jnp.bincount(topk_idx.reshape(-1), length=num_experts)
    fits = jnp.max(gs) <= capacity
    return lax.cond(
        fits,
        lambda ex, x, ti, tw: moe_experts_capacity(ex, x, ti, tw, num_experts, capacity),
        lambda ex, x, ti, tw: fallback(ex, x, ti, tw),
        experts,
        x_flat,
        topk_idx,
        topk_w,
    )


def default_capacity(num_tokens: int, top_k: int, num_experts: int, factor: float = 2.0) -> int:
    """Capacity for the exact-guarded path: `factor` x the mean expert load,
    rounded up to 64 (sublane-friendly), floored at 128. The production call
    site (models/bailing_moe.py) passes cfg.moe_prefill_capacity_factor=1.33:
    at 1024 tok x top-6 over 64 experts (mean load 96) that lands on the
    128 floor; 2048 tok -> 256, 4096 -> 512 (the guard's lax.cond falls back
    to the exact argsort-gmm whenever any VALID expert load exceeds it, so a
    skew past factor x mean is a perf event, not a wrong answer). Callers
    below MOE_CAPACITY_MIN_TOKENS (512) never take this path — the 128 floor
    would be mostly padding."""
    mean = num_tokens * top_k / num_experts
    return max(128, int(-(-factor * mean // 64)) * 64)
