"""Fused gather-stream MoE kernel for decode shapes.

Decode-step MoE (reference BailingMoeSparseMoeBlock :556-605 run per token)
needs, for N tokens x top-k experts, only the routed experts' weights — but
XLA's row-gather lowering (8.7 ms/layer on v5e) and a full-slab scalar-prefetch
gather (4.2 ms) are DMA-latency bound, so round-1 shipped masked-dense
full-table streaming (1.89 ms, ~62% of the 1.107 GB/layer roofline).

This kernel closes both gaps at once:

  grid = (m_chunks, slots) with slots INNERMOST and sorted by expert id.
  Each slot is one (token, expert) assignment; its expert id arrives via
  scalar prefetch, so the BlockSpec index maps DMA (d, CH) / (CH, d) chunks of
  w1/w3/w2 for exactly that expert. Because consecutive slots with the same
  expert id map to the SAME block, the Pallas pipeline elides the re-fetch —
  duplicate assignments across CFG rows cost zero extra HBM traffic. silu,
  the up-product and the gate-weighted combine happen in-register, so traffic
  is exactly (#unique routed experts) * |expert| bytes — the information-
  theoretic minimum — streamed through double-buffered ~0.5 MB chunks that
  hide DMA latency (the full-slab kernel's failure mode).

Accumulation runs in an fp32 VMEM scratch across the whole grid; the output
block (constant index) is written once at the final step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_TPU = True
except Exception:  # pragma: no cover
    pltpu = None
    PALLAS_TPU = False

# Above this many assignment slots, per-step grid overhead beats the bandwidth
# saved vs masked-dense full-table streaming (measured crossover on v5e).
MAX_STREAM_SLOTS = 36


def _kernel(ids_ref, x_ref, w1_ref, w3_ref, w2_ref, g_ref, o_ref, acc_ref):
    c = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when((c == 0) & (s == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # (Np, d)
    a = jax.lax.dot_general(x, w1_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    b = jax.lax.dot_general(x, w3_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    h = (jax.nn.silu(a) * b).astype(x.dtype)  # (Np, CH)
    po = jax.lax.dot_general(h, w2_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[...] += g_ref[0, 0][:, None] * po  # gate weight per row; 0 for rows not using this expert

    @pl.when((c == pl.num_programs(0) - 1) & (s == pl.num_programs(1) - 1))
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def stream_supported(experts, x_flat, topk_idx) -> bool:
    """Static predicate: dims 128-aligned, plain (non-quantized) bf16/fp32 arrays,
    and few enough assignment slots that chunk streaming beats masked-dense."""
    ws = (experts["gate_proj"], experts["up_proj"], experts["down_proj"])
    if not all(isinstance(w, jnp.ndarray) for w in ws):
        return False
    E, d, m = experts["gate_proj"].shape
    N, k = topk_idx.shape
    return PALLAS_TPU and d % 128 == 0 and m % 128 == 0 and N * k <= MAX_STREAM_SLOTS


def moe_experts_stream(experts, x_flat, topk_idx, topk_w, *, chunk: int = 128, interpret: bool = False):
    """Decode-path MoE dispatch. x_flat (N, d); topk_idx/topk_w (N, k) -> (N, d).

    HBM traffic = unique routed experts' w1/w3/w2 once (duplicates across rows
    dedup via sorted slots + Pallas same-block DMA elision).
    """
    N, k = topk_idx.shape
    d = x_flat.shape[-1]
    w1 = experts["gate_proj"]  # (E, d, m)
    w3 = experts["up_proj"]  # (E, d, m)
    w2 = experts["down_proj"]  # (E, m, d)
    E, _, m = w1.shape
    CH = chunk if m % chunk == 0 else next(t for t in (512, 256, 128) if m % t == 0)
    HC = m // CH

    A = N * k
    flat_idx = topk_idx.reshape(-1)
    order = jnp.argsort(flat_idx)  # sorted slots -> duplicate experts adjacent
    slot_ids = flat_idx[order].astype(jnp.int32)
    slot_row = order // k
    slot_w = topk_w.reshape(-1)[order].astype(jnp.float32)

    Np = max(8, -(-N // 8) * 8)  # sublane-pad token rows
    # singleton middle axis keeps the (1, 1, Np) block TPU-legal (trailing dims
    # equal the full array dims; a (1, Np) block would put 1 in the sublane slot)
    gates = (slot_w[:, None] * jax.nn.one_hot(slot_row, Np, dtype=jnp.float32))[:, None, :]  # (A, 1, Np)
    xp = jnp.zeros((Np, d), x_flat.dtype).at[:N].set(x_flat)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(HC, A),
        in_specs=[
            pl.BlockSpec((Np, d), lambda c, s, ids: (0, 0)),
            pl.BlockSpec((1, d, CH), lambda c, s, ids: (ids[s], 0, c)),
            pl.BlockSpec((1, d, CH), lambda c, s, ids: (ids[s], 0, c)),
            pl.BlockSpec((1, CH, d), lambda c, s, ids: (ids[s], c, 0)),
            pl.BlockSpec((1, 1, Np), lambda c, s, ids: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Np, d), lambda c, s, ids: (0, 0)),
        scratch_shapes=[pltpu.VMEM((Np, d), jnp.float32)],
    )
    kwargs = {}
    if not interpret and PALLAS_TPU:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024,
        )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Np, d), x_flat.dtype),
        interpret=interpret,
        **kwargs,
    )(slot_ids, xp, w1, w3, w2, gates)
    return out[:N]
