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
# Quantized tables have no fast XLA fallback (the dense path pays the nibble/
# byte unpack on the full 64-expert table every step — 28L int4 B=8 measured
# 59.7 ms/step vs 15.1 at B=4); the fused kernel reads at most min(A, E)
# experts with dedup, so it stays ahead far longer.
MAX_STREAM_SLOTS_QUANT = 128


def _kernel(ids_ref, x_ref, w1_ref, w3_ref, w2_ref, g_ref, o_ref, acc_ref):
    c = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when((c == 0) & (s == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # (Np, d)
    w1 = w1_ref[...].reshape(w1_ref.shape[-2], w1_ref.shape[-1])
    w3 = w3_ref[...].reshape(w3_ref.shape[-2], w3_ref.shape[-1])
    w2 = w2_ref[...].reshape(w2_ref.shape[-2], w2_ref.shape[-1])
    a = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    b = jax.lax.dot_general(x, w3, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    h = (jax.nn.silu(a) * b).astype(x.dtype)  # (Np, CH)
    po = jax.lax.dot_general(h, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[...] += g_ref[0, 0][:, None] * po  # gate weight per row; 0 for rows not using this expert

    @pl.when((c == pl.num_programs(0) - 1) & (s == pl.num_programs(1) - 1))
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_q8(ids_ref, x_ref, q1_ref, s1_ref, q3_ref, s3_ref, q2_ref, s2_ref, g_ref, o_ref, acc_ref):
    """int8 dequant-FUSED variant: the tables stream as int8 (half the HBM bytes
    of bf16) in their NATIVE layout — no XLA relayout copies — and the
    per-output-channel scales multiply the small matmul RESULTS, never the
    tables: x @ (q*s) == (x @ q) * s for per-column s."""
    c = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when((c == 0) & (s == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # (Np, d)
    w1 = q1_ref[...].reshape(q1_ref.shape[-2], q1_ref.shape[-1]).astype(x.dtype)  # int8 -> compute dtype, in VMEM
    w3 = q3_ref[...].reshape(q3_ref.shape[-2], q3_ref.shape[-1]).astype(x.dtype)
    a = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    b = jax.lax.dot_general(x, w3, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    a = a * s1_ref[...].reshape(s1_ref.shape[-1])[None, :]
    b = b * s3_ref[...].reshape(s3_ref.shape[-1])[None, :]
    h = (jax.nn.silu(a) * b).astype(x.dtype)  # (Np, CH)
    w2 = q2_ref[...].reshape(q2_ref.shape[-2], q2_ref.shape[-1]).astype(x.dtype)
    po = jax.lax.dot_general(h, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    po = po * s2_ref[...].reshape(s2_ref.shape[-1])[None, :]
    acc_ref[...] += g_ref[0, 0][:, None] * po

    @pl.when((c == pl.num_programs(0) - 1) & (s == pl.num_programs(1) - 1))
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_q4(ids_ref, x_ref, q1_ref, s1_ref, q3_ref, s3_ref, q2_ref, s2_ref, g_ref, o_ref, acc_ref):
    """int4 dequant-fused variant (quarter the HBM bytes of bf16). Tables are
    split-halves packed (quantize_array): the low nibble plane is contraction
    rows [0, n/2), the high plane rows [n/2, n) — so x @ W decomposes into
    x[:, :n/2] @ lo + x[:, n/2:] @ hi with plain contiguous slices, no
    interleave. Blocks are FULL experts (packed tables are small: ~4.3 MB)."""
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # (Np, d)
    d_half = q1_ref.shape[-2]  # d/2 packed rows
    x_lo = x[:, :d_half]
    x_hi = x[:, d_half:]

    def half_mm(xl, xh, q_ref):
        qb = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(jnp.int32)  # (n/2, cols)
        # int32 nibble unpack (VPU-native width; int8 bit-ops don't lower in Mosaic)
        lo = ((qb & 0xF) - 8).astype(x.dtype)
        hi = (((qb >> 4) & 0xF) - 8).astype(x.dtype)
        out = jax.lax.dot_general(xl, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        out += jax.lax.dot_general(xh, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return out

    a = half_mm(x_lo, x_hi, q1_ref) * s1_ref[...].reshape(s1_ref.shape[-1])[None, :]
    b = half_mm(x_lo, x_hi, q3_ref) * s3_ref[...].reshape(s3_ref.shape[-1])[None, :]
    h = (jax.nn.silu(a) * b).astype(x.dtype)  # (Np, m)
    m_half = q2_ref.shape[-2]  # m/2 packed rows
    po = half_mm(h[:, :m_half], h[:, m_half:], q2_ref) * s2_ref[...].reshape(s2_ref.shape[-1])[None, :]
    acc_ref[...] += g_ref[0, 0][:, None] * po

    @pl.when(s == pl.num_programs(0) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_q8_s8(ids_ref, x_ref, q1_ref, s1_ref, q3_ref, s3_ref, q2_ref, s2_ref, g_ref, o_ref, acc_ref, xq_ref, sx_ref):
    """int8 via INTEGER MXU dots (ops/kernels/intdot.py): the activation rows
    quantize to s8 ONCE (they are shared by every slot/chunk), so the weights
    stream through s8 x s8 dots at the HBM floor instead of paying a per-byte
    VPU convert. Per-row activation descale x per-column weight scale applied
    on the tiny fp32 results."""
    from mingunivision_tpu.ops.kernels.intdot import mm8_s8, quant_rows_s8

    c = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when((c == 0) & (s == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        xq, sx = quant_rows_s8(x_ref[...])
        xq_ref[...] = xq
        sx_ref[:, 0:1] = sx

    xq = xq_ref[...]
    sx = sx_ref[:, 0:1]
    w1 = q1_ref[...].reshape(q1_ref.shape[-2], q1_ref.shape[-1])
    w3 = q3_ref[...].reshape(q3_ref.shape[-2], q3_ref.shape[-1])
    a = mm8_s8(w1, xq, sx) * s1_ref[...].reshape(s1_ref.shape[-1])[None, :]
    b = mm8_s8(w3, xq, sx) * s3_ref[...].reshape(s3_ref.shape[-1])[None, :]
    h = jax.nn.silu(a) * b  # (Np, CH) f32
    from mingunivision_tpu.ops.kernels.intdot import quant_rows_s8 as _q

    hq, sh = _q(h)
    w2 = q2_ref[...].reshape(q2_ref.shape[-2], q2_ref.shape[-1])
    po = mm8_s8(w2, hq, sh) * s2_ref[...].reshape(s2_ref.shape[-1])[None, :]
    acc_ref[...] += g_ref[0, 0][:, None] * po

    @pl.when((c == pl.num_programs(0) - 1) & (s == pl.num_programs(1) - 1))
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_q4_s8(ids_ref, x_ref, q1_ref, s1_ref, q3_ref, s3_ref, q2_ref, s2_ref, g_ref, o_ref, acc_ref, a1_ref, a2_ref, st_ref):
    """int4 via INTEGER MXU dots: split-halves operands quantize once (shared
    across slots); each expert costs one u8 XOR + i8 mask + two s8 dots per
    logical matmul (intdot.mm4_s8 — the b^0x80 bitcast handles Mosaic's
    signed-int-dot semantics)."""
    from mingunivision_tpu.ops.kernels.intdot import mm4_s8, quant_rows_s8_pair

    s = pl.program_id(0)
    d_half = q1_ref.shape[-2]

    @pl.when(s == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        x = x_ref[...]
        a1, a2, sa1, sa2, corr = quant_rows_s8_pair(x[:, :d_half], x[:, d_half:])
        a1_ref[...] = a1
        a2_ref[...] = a2
        st_ref[:, 0:1] = sa1
        st_ref[:, 1:2] = sa2
        st_ref[:, 2:3] = corr

    a1 = a1_ref[...]
    a2 = a2_ref[...]
    sa1 = st_ref[:, 0:1]
    sa2 = st_ref[:, 1:2]
    corr = st_ref[:, 2:3]

    def q4mm(q_ref, s_ref):
        qb = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])
        return mm4_s8(qb, a1, a2, sa1, sa2, corr) * s_ref[...].reshape(s_ref.shape[-1])[None, :]

    a = q4mm(q1_ref, s1_ref)
    b = q4mm(q3_ref, s3_ref)
    h = jax.nn.silu(a) * b  # (Np, m) f32
    m_half = q2_ref.shape[-2]
    b1, b2, sb1, sb2, corrh = quant_rows_s8_pair(h[:, :m_half], h[:, m_half:])
    qb2 = q2_ref[...].reshape(q2_ref.shape[-2], q2_ref.shape[-1])
    po = mm4_s8(qb2, b1, b2, sb1, sb2, corrh) * s2_ref[...].reshape(s2_ref.shape[-1])[None, :]
    acc_ref[...] += g_ref[0, 0][:, None] * po

    @pl.when(s == pl.num_programs(0) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


# Integer-dot kernel selection. Round-3 measured a tie at A=18 slots (B=3
# single-image T2I decode: 0.208 vs 0.209 ms/layer) and kept the exact
# dequant kernels. Round-5 re-measured at SERVING batch (B=16, dedup ~64
# slots, paged 28L int4): s8 dots 27.49 ms/step = 582 tok/s vs convert
# kernels 31.93 = 501 (+16%; B=8: 436 vs 362, +21%) — at larger M the VPU
# byte-convert of every weight is the bottleneck the integer MXU removes.
# Default ON since round 5: the tie regime loses nothing, the serving regime
# gains 16-21%. Numerics: per-row-s8 activation quantization, the same
# approximation class as the RF s8 kernel (quality bound in
# tests/test_quality_gates.py); the exact dequant kernels remain one flag
# away for golden/debug runs.
INT_DOT_STREAM = True
INT_DOT_STREAM_INT8 = True


def _is_q(w, bits: int) -> bool:
    from mingunivision_tpu.utils.quantize import QuantizedArray

    # NF4 tables (nonlinear codebook) can't ride the offset-binary dequant
    # in-kernel; they take the XLA dequant paths (utils/quantize.py docstring)
    return (
        isinstance(w, QuantizedArray)
        and w.bits == bits
        and getattr(w, "scheme", "linear") == "linear"
    )


def _is_q8(w) -> bool:
    return _is_q(w, 8)


def stream_supported(experts, x_flat, topk_idx) -> bool:
    """Static predicate: dims 128-aligned, bf16/fp32 arrays OR int8/int4
    QuantizedArray tables (dequant-fused paths), and few enough assignment slots
    that chunk streaming beats masked-dense."""
    ws = (experts["gate_proj"], experts["up_proj"], experts["down_proj"])
    plain = all(isinstance(w, jnp.ndarray) for w in ws)
    quant8 = all(_is_q(w, 8) for w in ws)
    quant4 = all(_is_q(w, 4) for w in ws)
    if not (plain or quant8 or quant4):
        return False
    if quant4 and any(getattr(w, "groups", 1) != 1 for w in ws):
        # shard-locally packed tables (groups == model shards) are only valid
        # inside the shard_map wrappers, which rewrap local blocks as groups=1
        return False
    gp = experts["gate_proj"].q if (quant8 or quant4) else experts["gate_proj"]
    if quant4:
        E, d_half, m = gp.shape[-3:]  # tolerate a leading depth-stack axis
        d = d_half * 2
        # the h split at m/2 must stay a legal (if unaligned) lane slice
        if m % 2:
            return False
    else:
        E, d, m = gp.shape[-3:]
    N, k = topk_idx.shape
    cap = MAX_STREAM_SLOTS_QUANT if (quant8 or quant4) else MAX_STREAM_SLOTS
    # dedup-aggregation collapses A > E assignment slots to E grid steps, so
    # the dense-crossover compares EFFECTIVE slots
    return PALLAS_TPU and d % 128 == 0 and m % 128 == 0 and min(N * k, E) <= cap


def moe_experts_stream(experts, x_flat, topk_idx, topk_w, *, chunk: int = 0, interpret: bool = False, layer_idx=None):
    """Decode-path MoE dispatch. x_flat (N, d); topk_idx/topk_w (N, k) -> (N, d).

    HBM traffic = unique routed experts' w1/w3/w2 once (duplicates across rows
    dedup via sorted slots + Pallas same-block DMA elision). int8/int4
    QuantizedArray tables take the dequant-fused kernels (quantized bytes on the
    wire, scales applied to matmul outputs in-register).

    chunk=0 (default) streams FULL experts per grid step — measured 1.6x faster
    than 128-wide chunks on v5e (fewer, larger DMAs; double-buffered in VMEM).

    With `layer_idx`, `experts` are the FULL depth-stacked (L, E, ...) tables
    and the kernel block-indexes (layer, expert) directly via scalar prefetch —
    inside a `lax.scan` layer loop this avoids XLA materializing a per-layer
    copy of the sliced tables before the kernel call (measured ~2 ms/layer on
    v5e, the round-1 in-loop regression).
    """
    N, k = topk_idx.shape
    d = x_flat.shape[-1]
    stacked = layer_idx is not None
    quant8 = _is_q(experts["gate_proj"], 8)
    quant4 = _is_q(experts["gate_proj"], 4)
    w1 = experts["gate_proj"]  # (E, d, m) — int4: (E, d/2, m) split-halves packed
    w3 = experts["up_proj"]  # (E, d, m)
    w2 = experts["down_proj"]  # (E, m, d) — int4: (E, m/2, d)
    shape = (w1.q if (quant8 or quant4) else w1).shape
    E, m = shape[-3], shape[-1]
    if chunk == 0 or quant4:
        CH = m  # full expert per step (int4 kernel requires it: h splits at m/2)
    else:
        CH = chunk if m % chunk == 0 else next(t for t in (512, 256, 128) if m % t == 0)
    HC = m // CH

    A = N * k
    flat_idx = topk_idx.reshape(-1)
    Np = max(8, -(-N // 8) * 8)  # sublane-pad token rows
    if A > E:
        # Dedup-AGGREGATE (round 4, VERDICT weak #5): at A > E assignment
        # slots, duplicate experts are guaranteed; collapse to ONE slot per
        # present expert (ascending ids) with that expert's gate contributions
        # pre-summed into its (Np,) row. Grid steps drop from A to E (B=16
        # int4: 96 -> 64) and duplicate recompute disappears. Tail slots past
        # the last present expert repeat its id via cummax — their DMA is
        # elided (same block) and their gates row is zero.
        oh = (flat_idx[:, None] == jnp.arange(E, dtype=flat_idx.dtype)[None, :]).astype(jnp.float32)  # (A, E)
        rw = topk_w.reshape(-1).astype(jnp.float32)[:, None] * jax.nn.one_hot(
            jnp.arange(A) // k, Np, dtype=jnp.float32
        )  # (A, Np) — each assignment's gate weight at its token row
        gates_e = oh.T @ rw  # (E, Np) summed gate rows per expert
        present = jnp.sum(oh, axis=0) > 0
        pos = jnp.cumsum(present.astype(jnp.int32)) - 1
        target = jnp.where(present, pos, E)  # absent experts scatter out of bounds
        ids_sc = jnp.zeros((E,), jnp.int32).at[target].set(jnp.arange(E, dtype=jnp.int32), mode="drop")
        slot_ids = jax.lax.cummax(ids_sc)
        gates = jnp.zeros((E, Np), jnp.float32).at[target].set(gates_e, mode="drop")[:, None, :]
        A = E
    else:
        order = jnp.argsort(flat_idx)  # sorted slots -> duplicate experts adjacent
        slot_ids = flat_idx[order].astype(jnp.int32)
        slot_row = order // k
        slot_w = topk_w.reshape(-1)[order].astype(jnp.float32)
        # singleton middle axis keeps the (1, 1, Np) block TPU-legal (trailing
        # dims equal the full array dims; a (1, Np) block would put 1 in the
        # sublane slot)
        gates = (slot_w[:, None] * jax.nn.one_hot(slot_row, Np, dtype=jnp.float32))[:, None, :]  # (A, 1, Np)
    xp = jnp.zeros((Np, d), x_flat.dtype).at[:N].set(x_flat)

    # spec factories: `two_axis` grids are (chunk, slot); q4 uses (slot,) only.
    # With stacked tables a leading layer axis is indexed via the second
    # prefetched scalar (`lay`); block tuples gain a leading (1, lay[0]).
    def wspec(block, index):
        """block: tuple WITHOUT the expert axis; index(c_or_s, ids) -> tuple."""

        def make(two_axis: bool):
            if stacked:
                if two_axis:
                    return pl.BlockSpec((1, 1) + block, lambda c, s, ids, lay: (lay[0], ids[s]) + index(c))
                return pl.BlockSpec((1, 1) + block, lambda s, ids, lay: (lay[0], ids[s]) + index(0))
            if two_axis:
                return pl.BlockSpec((1,) + block, lambda c, s, ids: (ids[s],) + index(c))
            return pl.BlockSpec((1,) + block, lambda s, ids: (ids[s],) + index(0))

        return make

    def fixed(block, index):
        def make(two_axis: bool):
            if two_axis:
                return pl.BlockSpec(block, lambda c, s, *_: index(c, s))
            return pl.BlockSpec(block, lambda s, *_: index(0, s))

        return make

    x_specf = fixed((Np, d), lambda c, s: (0, 0))
    g_specf = fixed((1, 1, Np), lambda c, s: (s, 0, 0))
    out_specf = fixed((Np, d), lambda c, s: (0, 0))

    intdot4 = quant4 and INT_DOT_STREAM
    intdot8 = quant8 and INT_DOT_STREAM_INT8
    if quant4:
        two = False
        grid = (A,)
        kernel = _kernel_q4_s8 if intdot4 else _kernel_q4
        in_specs = [
            x_specf(two),
            wspec((d // 2, m), lambda c: (0, 0))(two),
            wspec((1, m), lambda c: (0, 0))(two),
            wspec((d // 2, m), lambda c: (0, 0))(two),
            wspec((1, m), lambda c: (0, 0))(two),
            wspec((m // 2, d), lambda c: (0, 0))(two),
            wspec((1, d), lambda c: (0, 0))(two),
            g_specf(two),
        ]
        operands = (xp, w1.q, w1.s, w3.q, w3.s, w2.q, w2.s, gates)
    elif quant8:
        two = True
        grid = (HC, A)
        kernel = _kernel_q8_s8 if intdot8 else _kernel_q8
        in_specs = [
            x_specf(two),
            wspec((d, CH), lambda c: (0, c))(two),
            wspec((1, CH), lambda c: (0, c))(two),
            wspec((d, CH), lambda c: (0, c))(two),
            wspec((1, CH), lambda c: (0, c))(two),
            wspec((CH, d), lambda c: (c, 0))(two),
            wspec((1, d), lambda c: (0, 0))(two),
            g_specf(two),
        ]
        operands = (xp, w1.q, w1.s, w3.q, w3.s, w2.q, w2.s, gates)
    else:
        two = True
        grid = (HC, A)
        kernel = _kernel
        in_specs = [
            x_specf(two),
            wspec((d, CH), lambda c: (0, c))(two),
            wspec((d, CH), lambda c: (0, c))(two),
            wspec((CH, d), lambda c: (c, 0))(two),
            g_specf(two),
        ]
        operands = (xp, w1, w3, w2, gates)

    semantics = ("arbitrary",) * len(grid)
    scalars = (slot_ids,)
    if stacked:
        scalars = (slot_ids, jnp.asarray(layer_idx, jnp.int32).reshape(1))

        # the layer scalar exists only for the BlockSpec index maps — the
        # kernel body never reads it
        inner = kernel

        def kernel(ids_ref, _layer_ref, *rest):
            return inner(ids_ref, *rest)
    scratch = [pltpu.VMEM((Np, d), jnp.float32)]
    if intdot4:
        scratch += [
            pltpu.VMEM((Np, d // 2), jnp.int8),
            pltpu.VMEM((Np, d // 2), jnp.int8),
            pltpu.VMEM((Np, 128), jnp.float32),
        ]
    elif intdot8:
        scratch += [pltpu.VMEM((Np, d), jnp.int8), pltpu.VMEM((Np, 128), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specf(two),
        scratch_shapes=scratch,
    )
    kwargs = {}
    if not interpret and PALLAS_TPU:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=100 * 1024 * 1024,  # full-expert blocks double-buffer at ~35 MB bf16
        )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Np, d), x_flat.dtype),
        interpret=interpret,
        **kwargs,
    )(*scalars, *operands)
    return out[:N]
