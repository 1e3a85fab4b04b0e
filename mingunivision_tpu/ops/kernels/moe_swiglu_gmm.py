"""Fused SwiGLU grouped-matmul for MoE prefill (one kernel: gate+up+silu*mul+down).

The 3-call megablox pipeline (ops/kernels/moe_gmm.py) reads the sorted
activations three times, round-trips g/u/h through HBM, and sweeps the expert
tables with three independent schedules. At prefill shapes the op is WEIGHT-
bandwidth bound (64 experts * 17.3 MB = 1.1 GB of tables vs ~0.5 ms of FLOPs
at 1024 tokens), so the win is a single schedule that reads each routed
expert's w1/w3/w2 once per row-tile visit and keeps everything else in VMEM:

  grid = (active_tiles, m_chunks)   # active_tiles from megablox group metadata
  per step: x tile (tm, h) resident across the inner chunk loop;
            g = x @ w1[:, chunk]; u = x @ w3[:, chunk]  (fp32)
            y_acc += (silu(g)*u).bf16 @ w2[chunk, :]    (fp32 accum, (tm, h))
  at last chunk: masked row-store (rows of this tile owned by this expert).

Row sorting/padding and the weighted unsort-combine are shared with moe_gmm.
Reuses megablox's `make_group_metadata` (grid schedule + store masks) — the
compute body is what's new. Reference parity: this implements the same
sort-by-expert dispatch as the reference's `moe_infer`
(modeling_bailing_moe.py:608-639), fused for TPU.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental.pallas.ops.tpu.megablox.gmm import (
        _get_store_mask,
        make_group_metadata,
    )

    SWIGLU_GMM_AVAILABLE = True
except Exception:  # pragma: no cover
    pltpu = None
    SWIGLU_GMM_AVAILABLE = False


# Raised Mosaic VMEM budget for the fused kernels (v5e has 128 MiB of VMEM;
# the compiler's default working-set ceiling is far lower and rejects
# full-expert weight blocks). Full-m blocks matter because an m-CHUNK of an
# (E, h, m) table is h short strided reads (chunk*wbytes each, m*wbytes
# stride — 256 B pieces at chunk=128/bf16) that run at a fraction of HBM
# bandwidth, while the full-m block is one contiguous stream.
VMEM_LIMIT = 100 * 1024 * 1024


def _pick_chunk(m: int, h: int, wbytes: int) -> int:
    """m-chunk width. FULL m for bf16 when the double-buffered gate+up+down
    working set fits the raised VMEM budget (one contiguous weight stream per
    tile instead of h short strided reads — measured 5.54 vs 5.96 ms/layer
    @1024 tok on v5e). For the quantized tiers full-m measured SLOWER (int8:
    7.0 vs 5.6 ms — the per-chunk dequant scratch grows with the block), so
    they keep the legacy 128-multiple chunks."""
    if wbytes >= 2 and 2 * 3 * h * m * wbytes <= VMEM_LIMIT // 2:
        return m
    for cand in (512, 384, 256, 128):
        if m % cand == 0:
            return cand
    return 128


def _kernel(
    group_offsets_ref,
    group_ids_ref,
    m_tile_ids_ref,
    lay_ref,  # (1,) layer index — consumed by the weight index maps only
    x_ref,
    w1_ref,
    w3_ref,
    w2_ref,
    o_ref,
    acc_ref,
    *,
    num_chunks: int,
    tm: int,
    h: int,
):
    t = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # (tm, h), resident across the chunk loop (same index map)
    w1 = w1_ref[...].reshape(w1_ref.shape[-2], w1_ref.shape[-1])  # (h, mc)
    w3 = w3_ref[...].reshape(w3_ref.shape[-2], w3_ref.shape[-1])
    w2 = w2_ref[...].reshape(w2_ref.shape[-2], w2_ref.shape[-1])  # (mc, h)
    g = lax.dot_general(x, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    u = lax.dot_general(x, w3, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    a = (jax.nn.silu(g) * u).astype(x.dtype)  # (tm, mc)
    acc_ref[...] += lax.dot_general(a, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(c == num_chunks - 1)
    def _store():
        mask = _get_store_mask(
            grid_id=t,
            group_metadata=(group_offsets_ref, group_ids_ref, m_tile_ids_ref),
            tm=tm,
            tn=h,
        )
        o_ref[...] = lax.select(mask, acc_ref[...], o_ref[...].astype(jnp.float32)).astype(
            o_ref.dtype
        )


def _kernel_q(
    group_offsets_ref,
    group_ids_ref,
    m_tile_ids_ref,
    x_ref,
    q1_ref,
    s1_ref,
    q3_ref,
    s3_ref,
    q2_ref,
    s2_ref,
    o_ref,
    *,
    tm: int,
    h: int,
    bits: int,
):
    """Dequant-fused grouped SwiGLU, FULL-expert blocks (packed tables are
    small: int8 8.6 MB / int4 4.3 MB per expert at 16B shapes — no m-chunking,
    which also sidesteps the int4 split-halves plane boundary). Scales multiply
    matmul RESULTS per output column: x @ (q*s) == (x @ q) * s."""
    t = pl.program_id(0)
    x = x_ref[...]  # (tm, h)

    if bits == 8:

        def mm(q_ref):
            q = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(x.dtype)
            return lax.dot_general(x, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        g = mm(q1_ref)
        u = mm(q3_ref)
    else:
        d_half = q1_ref.shape[-2]
        x_lo, x_hi = x[:, :d_half], x[:, d_half:]

        def half_mm(xl, xh, q_ref):
            qb = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(jnp.int32)
            lo = ((qb & 0xF) - 8).astype(x.dtype)
            hi = (((qb >> 4) & 0xF) - 8).astype(x.dtype)
            out = lax.dot_general(xl, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            out += lax.dot_general(xh, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            return out

        g = half_mm(x_lo, x_hi, q1_ref)
        u = half_mm(x_lo, x_hi, q3_ref)
    g = g * s1_ref[...].reshape(s1_ref.shape[-1])[None, :]
    u = u * s3_ref[...].reshape(s3_ref.shape[-1])[None, :]
    a = (jax.nn.silu(g) * u).astype(x.dtype)  # (tm, m)
    if bits == 8:
        q2 = q2_ref[...].reshape(q2_ref.shape[-2], q2_ref.shape[-1]).astype(x.dtype)
        y = lax.dot_general(a, q2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    else:
        m_half = q2_ref.shape[-2]
        qb = q2_ref[...].reshape(q2_ref.shape[-2], q2_ref.shape[-1]).astype(jnp.int32)
        lo = ((qb & 0xF) - 8).astype(x.dtype)
        hi = (((qb >> 4) & 0xF) - 8).astype(x.dtype)
        y = lax.dot_general(a[:, :m_half], lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        y += lax.dot_general(a[:, m_half:], hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y = y * s2_ref[...].reshape(s2_ref.shape[-1])[None, :]

    mask = _get_store_mask(
        grid_id=t,
        group_metadata=(group_offsets_ref, group_ids_ref, m_tile_ids_ref),
        tm=tm,
        tn=h,
    )
    o_ref[...] = lax.select(mask, y, o_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _kernel_q8_chunked(
    group_offsets_ref,
    group_ids_ref,
    m_tile_ids_ref,
    lay_ref,
    x_ref,
    q1_ref,
    s1_ref,
    q3_ref,
    s3_ref,
    q2_ref,
    s2_ref,
    o_ref,
    acc_ref,
    *,
    num_chunks: int,
    tm: int,
    h: int,
):
    """int8 variant of the chunked fused kernel (no nibble packing -> the
    m-chunk slices stay plane-free); scales multiply matmul results."""
    t = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w1 = q1_ref[...].reshape(q1_ref.shape[-2], q1_ref.shape[-1]).astype(x.dtype)
    w3 = q3_ref[...].reshape(q3_ref.shape[-2], q3_ref.shape[-1]).astype(x.dtype)
    w2 = q2_ref[...].reshape(q2_ref.shape[-2], q2_ref.shape[-1]).astype(x.dtype)
    g = lax.dot_general(x, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    u = lax.dot_general(x, w3, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    g = g * s1_ref[...].reshape(s1_ref.shape[-1])[None, :]
    u = u * s3_ref[...].reshape(s3_ref.shape[-1])[None, :]
    a = (jax.nn.silu(g) * u).astype(x.dtype)
    acc_ref[...] += lax.dot_general(a, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(c == num_chunks - 1)
    def _store():
        mask = _get_store_mask(
            grid_id=t,
            group_metadata=(group_offsets_ref, group_ids_ref, m_tile_ids_ref),
            tm=tm,
            tn=h,
        )
        y = acc_ref[...] * s2_ref[...].reshape(s2_ref.shape[-1])[None, :]
        o_ref[...] = lax.select(mask, y, o_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _kernel_q8_chunked_s8(
    group_offsets_ref,
    group_ids_ref,
    m_tile_ids_ref,
    lay_ref,
    x_ref,
    q1_ref,
    s1_ref,
    q3_ref,
    s3_ref,
    q2_ref,
    s2_ref,
    o_ref,
    acc_ref,
    xq_ref,  # VMEM s8 (tm, h): per-row quantized x, computed once per tile
    sx_ref,  # VMEM f32 (tm, 1)
    *,
    num_chunks: int,
    tm: int,
    h: int,
):
    """Integer-MXU variant of the int8 chunked kernel (see BENCHMARKS "RF int4
    unpack sweep"): the exact kernel's bf16 x (int8->bf16) dots convert every
    weight byte on the VPU — measured SLOWER than the bf16 kernel despite
    moving half the bytes. Here x quantizes per-row to s8 once per tile and
    gate/up stream through s8 x s8 -> s32 dots; the silu(g)*u activation
    re-quantizes per chunk for the down dot. Adds ~0.4%/matmul activation
    noise on top of the int8 tier's own error (bounded in tests)."""
    from mingunivision_tpu.ops.kernels.intdot import mm8_s8, quant_rows_s8

    t = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        xq, sx = quant_rows_s8(x_ref[...])
        xq_ref[...] = xq
        sx_ref[...] = sx

    xq = xq_ref[...]
    sx = sx_ref[...]
    w1 = q1_ref[...].reshape(q1_ref.shape[-2], q1_ref.shape[-1])  # s8 (h, mc)
    w3 = q3_ref[...].reshape(q3_ref.shape[-2], q3_ref.shape[-1])
    w2 = q2_ref[...].reshape(q2_ref.shape[-2], q2_ref.shape[-1])  # s8 (mc, h)
    g = mm8_s8(w1, xq, sx) * s1_ref[...].reshape(s1_ref.shape[-1])[None, :]
    u = mm8_s8(w3, xq, sx) * s3_ref[...].reshape(s3_ref.shape[-1])[None, :]
    a = jax.nn.silu(g) * u  # (tm, mc) f32
    aq, sa = quant_rows_s8(a)
    acc_ref[...] += mm8_s8(w2, aq, sa)

    @pl.when(c == num_chunks - 1)
    def _store():
        mask = _get_store_mask(
            grid_id=t,
            group_metadata=(group_offsets_ref, group_ids_ref, m_tile_ids_ref),
            tm=tm,
            tn=h,
        )
        y = acc_ref[...] * s2_ref[...].reshape(s2_ref.shape[-1])[None, :]
        o_ref[...] = lax.select(mask, y, o_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _swiglu_gmm_q8(xs, w1, w3, w2, group_sizes, *, tm, chunk, interpret, s8=False, layer_idx=None):
    A, h = xs.shape
    q1, lay = _norm_stack(w1.q, layer_idx)
    s1, _ = _norm_stack(w1.s, layer_idx)
    q3, _ = _norm_stack(w3.q, layer_idx)
    s3, _ = _norm_stack(w3.s, layer_idx)
    q2, _ = _norm_stack(w2.q, layer_idx)
    s2, _ = _norm_stack(w2.s, layer_idx)
    _, E, _, m = q1.shape
    if chunk == 0:
        chunk = _pick_chunk(m, h, 1)
    num_chunks = m // chunk
    group_metadata, num_active_tiles = make_group_metadata(
        group_sizes=group_sizes,
        m=A,
        tm=tm,
        start_group=jnp.zeros((), jnp.int32),
        num_nonzero_groups=E,
        visit_empty_groups=False,
    )
    group_offsets, group_ids, m_tile_ids = group_metadata
    if s8:
        kernel = functools.partial(_kernel_q8_chunked_s8, num_chunks=num_chunks, tm=tm, h=h)
        scratch = [
            pltpu.VMEM((tm, h), jnp.float32),
            pltpu.VMEM((tm, h), jnp.int8),
            pltpu.VMEM((tm, 1), jnp.float32),
        ]
    else:
        kernel = functools.partial(_kernel_q8_chunked, num_chunks=num_chunks, tm=tm, h=h)
        scratch = [pltpu.VMEM((tm, h), jnp.float32)]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((A, h), xs.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            in_specs=[
                pl.BlockSpec((tm, h), lambda t, c, go, gi, mt, la: (mt[t], 0)),
                pl.BlockSpec((1, 1, h, chunk), lambda t, c, go, gi, mt, la: (la[0], gi[t], 0, c)),
                pl.BlockSpec((1, 1, 1, chunk), lambda t, c, go, gi, mt, la: (la[0], gi[t], 0, c)),
                pl.BlockSpec((1, 1, h, chunk), lambda t, c, go, gi, mt, la: (la[0], gi[t], 0, c)),
                pl.BlockSpec((1, 1, 1, chunk), lambda t, c, go, gi, mt, la: (la[0], gi[t], 0, c)),
                pl.BlockSpec((1, 1, chunk, h), lambda t, c, go, gi, mt, la: (la[0], gi[t], c, 0)),
                pl.BlockSpec((1, 1, 1, h), lambda t, c, go, gi, mt, la: (la[0], gi[t], 0, 0)),
            ],
            out_specs=pl.BlockSpec((tm, h), lambda t, c, go, gi, mt, la: (mt[t], 0)),
            grid=(num_active_tiles, num_chunks),
            scratch_shapes=scratch,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(group_offsets, group_ids, m_tile_ids, lay, xs, q1, s1, q3, s3, q2, s2)


def _kernel_q4_chunked(
    group_offsets_ref,
    group_ids_ref,
    m_tile_ids_ref,
    _pa_blk_ref,  # consumed by the q2a index map
    _pb_blk_ref,  # consumed by the q2b index map
    plane_a_ref,
    plane_b_ref,
    lay_ref,
    x_ref,
    q1_ref,
    s1_ref,
    q3_ref,
    s3_ref,
    q2a_ref,
    q2b_ref,
    s2_ref,
    o_ref,
    acc_ref,
    *,
    num_chunks: int,
    tm: int,
    h: int,
    seg: int,
):
    """int4 chunked variant. Gate/up are packed along the contraction dim
    (whole d in every chunk: unpack lo/hi planes, two matmuls). The down
    table's m-chunk straddles the split-halves planes, so each 2*seg-column
    chunk is fetched as TWO seg-row views of the SAME packed array (q2a/q2b,
    per-chunk packed-block offsets in the index maps) with a scalar-prefetched
    nibble-plane flag each."""
    t = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    d_half = q1_ref.shape[-2]
    x_lo, x_hi = x[:, :d_half], x[:, d_half:]

    def half_mm(q_ref):
        qb = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(jnp.int32)
        lo = ((qb & 0xF) - 8).astype(x.dtype)
        hi = (((qb >> 4) & 0xF) - 8).astype(x.dtype)
        out = lax.dot_general(x_lo, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        out += lax.dot_general(x_hi, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return out

    g = half_mm(q1_ref) * s1_ref[...].reshape(s1_ref.shape[-1])[None, :]
    u = half_mm(q3_ref) * s3_ref[...].reshape(s3_ref.shape[-1])[None, :]
    a = (jax.nn.silu(g) * u).astype(x.dtype)  # (tm, 2*seg)

    def down_seg(q_ref, plane, a_seg):
        qb = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(jnp.int32)
        lo = ((qb & 0xF) - 8).astype(x.dtype)
        hi = (((qb >> 4) & 0xF) - 8).astype(x.dtype)
        w = jnp.where(plane == 0, lo, hi)
        return lax.dot_general(a_seg, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    acc_ref[...] += down_seg(q2a_ref, plane_a_ref[c], a[:, :seg])
    acc_ref[...] += down_seg(q2b_ref, plane_b_ref[c], a[:, seg:])

    @pl.when(c == num_chunks - 1)
    def _store():
        mask = _get_store_mask(
            grid_id=t,
            group_metadata=(group_offsets_ref, group_ids_ref, m_tile_ids_ref),
            tm=tm,
            tn=h,
        )
        y = acc_ref[...] * s2_ref[...].reshape(s2_ref.shape[-1])[None, :]
        o_ref[...] = lax.select(mask, y, o_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _kernel_q4_chunked_s8(
    group_offsets_ref,
    group_ids_ref,
    m_tile_ids_ref,
    _pa_blk_ref,
    _pb_blk_ref,
    plane_a_ref,
    plane_b_ref,
    lay_ref,
    x_ref,
    q1_ref,
    s1_ref,
    q3_ref,
    s3_ref,
    q2a_ref,
    q2b_ref,
    s2_ref,
    o_ref,
    acc_ref,
    a1_ref,  # VMEM s8 (tm, d_half): combo operand (x_lo - x_hi/16) quantized
    a2_ref,  # VMEM s8 (tm, d_half): x_hi quantized
    sa1_ref,  # VMEM f32 (tm, 1)
    sa2_ref,  # VMEM f32 (tm, 1)
    corr_ref,  # VMEM f32 (tm, 1): 8*rowsum(x_lo)
    *,
    num_chunks: int,
    tm: int,
    h: int,
    seg: int,
):
    """Integer-MXU variant of the plane-aware int4 chunked kernel: the x
    split-halves quantize ONCE per tile to the two s8 operands of the packed
    2-dot identity (intdot.quant_rows_s8_pair), so each gate/up chunk costs a
    u8 mask + two s8 dots that stream packed bytes at the HBM floor (the bf16
    kernel converts every unpacked nibble on the VPU). Down-proj segs select
    the nibble plane in the fp32 epilogue of the same 2-dot trick:
      lo plane: a @ (m - 8)        = sa*(aq@m - 8*rowsum(aq))
      hi plane: a @ ((bx - m)/16)  = sa*(aq@bx - aq@m)/16,  bx = s8(b ^ 0x80)."""
    from mingunivision_tpu.ops.kernels.intdot import mm4_s8, quant_rows_s8, quant_rows_s8_pair

    t = pl.program_id(0)
    c = pl.program_id(1)
    d_half = q1_ref.shape[-2]

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        x = x_ref[...]
        a1, a2, sa1, sa2, corr = quant_rows_s8_pair(x[:, :d_half], x[:, d_half:])
        a1_ref[...] = a1
        a2_ref[...] = a2
        sa1_ref[...] = sa1
        sa2_ref[...] = sa2
        corr_ref[...] = corr

    a1 = a1_ref[...]
    a2 = a2_ref[...]
    sa1 = sa1_ref[...]
    sa2 = sa2_ref[...]
    corr = corr_ref[...]

    def gate_mm(q_ref):
        qb = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])  # u8 (d_half, chunk)
        return mm4_s8(qb, a1, a2, sa1, sa2, corr)

    g = gate_mm(q1_ref) * s1_ref[...].reshape(s1_ref.shape[-1])[None, :]
    u = gate_mm(q3_ref) * s3_ref[...].reshape(s3_ref.shape[-1])[None, :]
    a = jax.nn.silu(g) * u  # (tm, 2*seg) f32

    def down_seg(q_ref, plane, a_seg):
        qb = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])  # u8 (seg, h)
        bx = lax.bitcast_convert_type(qb ^ jnp.uint8(0x80), jnp.int8)
        mlo = bx & jnp.int8(0xF)
        aq, sa = quant_rows_s8(a_seg)
        d_m = lax.dot_general(aq, mlo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32).astype(
            jnp.float32
        )
        d_bx = lax.dot_general(aq, bx, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32).astype(
            jnp.float32
        )
        rs = jnp.sum(aq.astype(jnp.float32), axis=-1, keepdims=True)
        return jnp.where(plane == 0, (d_m - 8.0 * rs) * sa, (d_bx - d_m) * (sa * (1.0 / 16.0)))

    acc_ref[...] += down_seg(q2a_ref, plane_a_ref[c], a[:, :seg])
    acc_ref[...] += down_seg(q2b_ref, plane_b_ref[c], a[:, seg:])

    @pl.when(c == num_chunks - 1)
    def _store():
        mask = _get_store_mask(
            grid_id=t,
            group_metadata=(group_offsets_ref, group_ids_ref, m_tile_ids_ref),
            tm=tm,
            tn=h,
        )
        y = acc_ref[...] * s2_ref[...].reshape(s2_ref.shape[-1])[None, :]
        o_ref[...] = lax.select(mask, y, o_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _swiglu_gmm_q4_chunked(xs, w1, w3, w2, group_sizes, *, tm, interpret, s8=False, layer_idx=None):
    A, h = xs.shape
    q1, lay = _norm_stack(w1.q, layer_idx)
    s1, _ = _norm_stack(w1.s, layer_idx)
    q3, _ = _norm_stack(w3.q, layer_idx)
    s3, _ = _norm_stack(w3.s, layer_idx)
    q2, _ = _norm_stack(w2.q, layer_idx)
    s2, _ = _norm_stack(w2.s, layer_idx)
    _, E, d_half, m = q1.shape
    m_half = m // 2
    chunk = 128  # gate/up column chunk (lane-aligned)
    seg = chunk // 2  # down-proj rows fetched per view
    # every seg-row segment must lie inside one nibble plane
    assert m % chunk == 0 and m_half % seg == 0, (m, chunk)
    num_chunks = m // chunk

    # per-chunk down-proj segment addressing: logical rows [c*chunk, c*chunk+seg)
    # and [c*chunk+seg, (c+1)*chunk); packed row = logical % m_half,
    # plane = logical // m_half; offsets in units of seg-row blocks
    seg_starts_a = np.arange(num_chunks) * chunk
    seg_starts_b = seg_starts_a + seg
    pa_blk = ((seg_starts_a % m_half) // seg).astype(np.int32)
    pb_blk = ((seg_starts_b % m_half) // seg).astype(np.int32)
    plane_a = (seg_starts_a // m_half).astype(np.int32)
    plane_b = (seg_starts_b // m_half).astype(np.int32)

    group_metadata, num_active_tiles = make_group_metadata(
        group_sizes=group_sizes,
        m=A,
        tm=tm,
        start_group=jnp.zeros((), jnp.int32),
        num_nonzero_groups=E,
        visit_empty_groups=False,
    )
    group_offsets, group_ids, m_tile_ids = group_metadata
    pa_blk_j = jnp.asarray(pa_blk)
    pb_blk_j = jnp.asarray(pb_blk)

    if s8:
        kernel = functools.partial(_kernel_q4_chunked_s8, num_chunks=num_chunks, tm=tm, h=h, seg=seg)
        scratch = [
            pltpu.VMEM((tm, h), jnp.float32),
            pltpu.VMEM((tm, d_half), jnp.int8),
            pltpu.VMEM((tm, d_half), jnp.int8),
            pltpu.VMEM((tm, 1), jnp.float32),
            pltpu.VMEM((tm, 1), jnp.float32),
            pltpu.VMEM((tm, 1), jnp.float32),
        ]
    else:
        kernel = functools.partial(_kernel_q4_chunked, num_chunks=num_chunks, tm=tm, h=h, seg=seg)
        scratch = [pltpu.VMEM((tm, h), jnp.float32)]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((A, h), xs.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,
            in_specs=[
                pl.BlockSpec((tm, h), lambda t, c, go, gi, mt, pa, pb, fa, fb, la: (mt[t], 0)),
                pl.BlockSpec((1, 1, d_half, chunk), lambda t, c, go, gi, mt, pa, pb, fa, fb, la: (la[0], gi[t], 0, c)),
                pl.BlockSpec((1, 1, 1, chunk), lambda t, c, go, gi, mt, pa, pb, fa, fb, la: (la[0], gi[t], 0, c)),
                pl.BlockSpec((1, 1, d_half, chunk), lambda t, c, go, gi, mt, pa, pb, fa, fb, la: (la[0], gi[t], 0, c)),
                pl.BlockSpec((1, 1, 1, chunk), lambda t, c, go, gi, mt, pa, pb, fa, fb, la: (la[0], gi[t], 0, c)),
                pl.BlockSpec((1, 1, seg, h), lambda t, c, go, gi, mt, pa, pb, fa, fb, la: (la[0], gi[t], pa[c], 0)),
                pl.BlockSpec((1, 1, seg, h), lambda t, c, go, gi, mt, pa, pb, fa, fb, la: (la[0], gi[t], pb[c], 0)),
                pl.BlockSpec((1, 1, 1, h), lambda t, c, go, gi, mt, pa, pb, fa, fb, la: (la[0], gi[t], 0, 0)),
            ],
            out_specs=pl.BlockSpec((tm, h), lambda t, c, go, gi, mt, pa, pb, fa, fb, la: (mt[t], 0)),
            grid=(num_active_tiles, num_chunks),
            scratch_shapes=scratch,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(
        group_offsets,
        group_ids,
        m_tile_ids,
        pa_blk_j,
        pb_blk_j,
        jnp.asarray(plane_a),
        jnp.asarray(plane_b),
        lay,
        xs,
        q1,
        s1,
        q3,
        s3,
        q2,
        q2,
        s2,
    )


# Opt-in integer-MXU (s8 x s8 dot) variants of the quantized prefill kernels,
# same convention as moe_stream.INT_DOT_STREAM / rf_mlp.INT8_INT_DOTS: the
# default kernels stay exact-dequant (bf16-grade); flipping these trades
# ~0.4%/matmul activation-quant noise for streaming packed bytes at the HBM
# floor instead of converting every weight byte on the VPU.
INT_DOT_PREFILL_INT8 = False
INT_DOT_PREFILL_INT4 = False


def swiglu_gmm_quant(
    xs,
    w1,
    w3,
    w2,
    group_sizes,
    *,
    tm: int = 256,
    chunk: int = 0,
    interpret: bool = False,
    int4_chunked: bool = True,
    s8: bool | None = None,
    layer_idx=None,
):
    """Quantized fused grouped SwiGLU. w1/w3/w2: QuantizedArray tables in the
    decode-kernel layout (int8: q (E, h, m)/(E, m, h); int4 split-halves packed
    along the contraction dim). int8 streams m-chunks (scales on results, down
    scale applied once at store); int4 defaults to the plane-aware chunked
    kernel (two seg-row views of the packed down table per chunk) with the
    full-expert-block kernel as fallback. s8=True (or the INT_DOT_PREFILL_*
    flags) switches the chunked kernels to integer-MXU dots. Returns (A, h) in
    xs.dtype."""
    if w1.bits == 8:
        use_s8 = INT_DOT_PREFILL_INT8 if s8 is None else s8
        return _swiglu_gmm_q8(
            xs, w1, w3, w2, group_sizes, tm=tm, chunk=chunk, interpret=interpret, s8=use_s8,
            layer_idx=layer_idx,
        )
    if w1.bits == 4 and int4_chunked:
        use_s8 = INT_DOT_PREFILL_INT4 if s8 is None else s8
        return _swiglu_gmm_q4_chunked(
            xs, w1, w3, w2, group_sizes, tm=tm, interpret=interpret, s8=use_s8,
            layer_idx=layer_idx,
        )
    if layer_idx is not None and w1.q.ndim == 4:
        # rare full-expert-block fallback: take the per-layer slice (pays the
        # copy; the chunked defaults above stream the stacked table directly)
        from mingunivision_tpu.utils.quantize import QuantizedArray

        w1, w3, w2 = (
            jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, layer_idx, keepdims=False), w
            )
            for w in (w1, w3, w2)
        )
    A, h = xs.shape
    bits = w1.bits
    E = w1.q.shape[0]
    assert A % tm == 0, (A, tm)

    group_metadata, num_active_tiles = make_group_metadata(
        group_sizes=group_sizes,
        m=A,
        tm=tm,
        start_group=jnp.zeros((), jnp.int32),
        num_nonzero_groups=E,
        visit_empty_groups=False,
    )
    group_offsets, group_ids, m_tile_ids = group_metadata

    def wspec(q):
        shape = (1,) + q.shape[1:]
        return pl.BlockSpec(shape, lambda t, go, gi, mt: (gi[t],) + (0,) * (len(shape) - 1))

    kernel = functools.partial(_kernel_q, tm=tm, h=h, bits=bits)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((A, h), xs.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            in_specs=[
                pl.BlockSpec((tm, h), lambda t, go, gi, mt: (mt[t], 0)),
                wspec(w1.q),
                wspec(w1.s),
                wspec(w3.q),
                wspec(w3.s),
                wspec(w2.q),
                wspec(w2.s),
            ],
            out_specs=pl.BlockSpec((tm, h), lambda t, go, gi, mt: (mt[t], 0)),
            grid=(num_active_tiles,),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(group_offsets, group_ids, m_tile_ids, xs, w1.q, w1.s, w3.q, w3.s, w2.q, w2.s)
    return out


def _norm_stack(q, layer_idx):
    """Normalize a weight table to depth-stacked (L, ...) + a (1,) layer scalar.

    Rank-3 tables get a FREE leading-1 reshape; rank-4 (depth-stacked) tables
    pass through with lay = [layer_idx]. Passing the stacked table + layer
    scalar into the BlockSpec index maps (lay[0], gi[t], ...) is what avoids
    the ~2-2.5 ms/layer copy XLA emits when a scan-sliced (dynamic_index)
    operand feeds a pallas_call — the same trick moe_stream.py uses for decode
    (measured round 5: 6.0 -> ~3.5 ms/layer e2e bf16 prefill)."""
    if q.ndim == 3:
        return q[None], jnp.zeros((1,), jnp.int32)
    assert layer_idx is not None, "stacked (L, E, ...) table needs layer_idx"
    return q, jnp.asarray(layer_idx, jnp.int32).reshape(1)


def swiglu_gmm(
    xs,
    w1,
    w3,
    w2,
    group_sizes,
    *,
    tm: int = 512,
    chunk: int = 0,
    interpret: bool = False,
    layer_idx=None,
):
    """Fused grouped SwiGLU: per group i over expert-sorted rows,
    (silu(x@w1[i]) * (x@w3[i])) @ w2[i].

    xs: (A, h) expert-sorted rows, A % tm == 0; w1/w3: (E, h, m) or depth-
    stacked (L, E, h, m) with `layer_idx`; w2: (E, m, h) / (L, E, m, h);
    group_sizes: (E,) int32 summing to A. chunk: m-chunk width (0 = pick the
    largest 128-multiple divisor of m <= 512). Returns (A, h) in xs.dtype.
    """
    A, h = xs.shape
    w1, lay = _norm_stack(w1, layer_idx)
    w3, _ = _norm_stack(w3, layer_idx)
    w2, _ = _norm_stack(w2, layer_idx)
    _, E, _, m = w1.shape
    assert A % tm == 0, (A, tm)
    if chunk == 0:
        chunk = _pick_chunk(m, h, xs.dtype.itemsize)
    assert m % chunk == 0 and (chunk % 128 == 0 or chunk == m), (m, chunk)
    num_chunks = m // chunk

    group_metadata, num_active_tiles = make_group_metadata(
        group_sizes=group_sizes,
        m=A,
        tm=tm,
        start_group=jnp.zeros((), jnp.int32),
        num_nonzero_groups=E,
        visit_empty_groups=False,
    )
    group_offsets, group_ids, m_tile_ids = group_metadata

    kernel = functools.partial(_kernel, num_chunks=num_chunks, tm=tm, h=h)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((A, h), xs.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            in_specs=[
                pl.BlockSpec((tm, h), lambda t, c, go, gi, mt, la: (mt[t], 0)),
                pl.BlockSpec((1, 1, h, chunk), lambda t, c, go, gi, mt, la: (la[0], gi[t], 0, c)),
                pl.BlockSpec((1, 1, h, chunk), lambda t, c, go, gi, mt, la: (la[0], gi[t], 0, c)),
                pl.BlockSpec((1, 1, chunk, h), lambda t, c, go, gi, mt, la: (la[0], gi[t], c, 0)),
            ],
            out_specs=pl.BlockSpec((tm, h), lambda t, c, go, gi, mt, la: (mt[t], 0)),
            grid=(num_active_tiles, num_chunks),
            scratch_shapes=[pltpu.VMEM((tm, h), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(group_offsets, group_ids, m_tile_ids, lay, xs, w1, w3, w2)
    return out


def swiglu_gmm_supported(experts, x_flat) -> bool:
    from mingunivision_tpu.utils.quantize import QuantizedArray

    if not SWIGLU_GMM_AVAILABLE:
        return False
    ws = (experts.get("gate_proj"), experts.get("up_proj"), experts.get("down_proj"))
    if all(isinstance(w, jnp.ndarray) for w in ws):
        h, m = ws[0].shape[-2], ws[0].shape[-1]  # (E, h, m) or stacked (L, E, h, m)
        return h % 128 == 0 and m % 128 == 0
    if any(isinstance(w, QuantizedArray) and getattr(w, "scheme", "linear") != "linear" for w in ws):
        return False  # NF4 codebook tables ride the XLA dequant paths
    for bits in (8, 4):
        if all(isinstance(w, QuantizedArray) and w.bits == bits for w in ws):
            if bits == 4 and any(getattr(w, "groups", 1) != 1 for w in ws):
                return False  # shard-locally packed: only valid inside shard_map
            q1 = ws[0].q
            dq, m = q1.shape[-2], q1.shape[-1]  # leading dims: (E,) or (L, E)
            h = dq * (2 if bits == 4 else 1)
            # int4 half planes slice the sublane dim: d/2 and m/2 need 8-alignment
            ok4 = bits != 4 or (dq % 8 == 0 and (m // 2) % 8 == 0 and m % 2 == 0)
            return h % 128 == 0 and m % 128 == 0 and ok4
    return False


def moe_experts_swiglu_gmm(
    experts,
    x_flat,
    topk_idx,
    topk_w,
    num_experts: int,
    *,
    tm: int = 256,
    interpret: bool = False,
    s8: bool | None = None,
    layer_idx=None,
):
    """Drop-in MoE prefill dispatch (same contract as moe_gmm.moe_experts_gmm)
    using the fused SwiGLU grouped matmul."""
    N, k = topk_idx.shape
    A = N * k
    A_pad = ((A + tm - 1) // tm) * tm
    flat_e = topk_idx.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)
    token_idx = order // k
    xs = jnp.take(x_flat, token_idx, axis=0)
    group_sizes = jnp.bincount(flat_e, length=num_experts).astype(jnp.int32)
    if A_pad != A:
        xs = jnp.concatenate([xs, jnp.zeros((A_pad - A, xs.shape[1]), xs.dtype)], axis=0)
        group_sizes = group_sizes.at[num_experts - 1].add(A_pad - A)

    from mingunivision_tpu.utils.quantize import QuantizedArray

    if isinstance(experts["gate_proj"], QuantizedArray):
        ys = swiglu_gmm_quant(
            xs,
            experts["gate_proj"],
            experts["up_proj"],
            experts["down_proj"],
            group_sizes,
            tm=tm,
            interpret=interpret,
            s8=s8,
            layer_idx=layer_idx,
        )[:A]
    else:
        ys = swiglu_gmm(
            xs,
            experts["gate_proj"].astype(xs.dtype),
            experts["up_proj"].astype(xs.dtype),
            experts["down_proj"].astype(xs.dtype),
            group_sizes,
            tm=tm,
            interpret=interpret,
            layer_idx=layer_idx,
        )[:A]

    # gather-unsort + weighted sum (scatter-add with duplicates serializes)
    inv = jnp.argsort(order, stable=True)
    per_assignment = jnp.take(ys, inv, axis=0).reshape(N, k, -1)
    return jnp.einsum("nkh,nk->nh", per_assignment.astype(jnp.float32), topk_w.astype(jnp.float32)).astype(
        x_flat.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def moe_experts_swiglu_gmm_ad(
    experts, x_flat, topk_idx, topk_w, num_experts: int, tm: int, interpret: bool = False
):
    """Differentiable fused-prefill entry (bf16 tables).

    The raw fused pallas_call has no JVP rule (dynamic grid from the megablox
    group metadata), so `jax.grad` through the TPU training forward would
    crash. Forward = the fused single-pass kernel; backward recomputes through
    the 3-call megablox composition (ops/kernels/moe_gmm.py), whose gmm/tgmm
    kernels carry their own VJP — same math, exact gradients of the grouped
    matmul, no (E, N, m) dense residuals.
    """
    return moe_experts_swiglu_gmm(experts, x_flat, topk_idx, topk_w, num_experts, tm=tm, interpret=interpret)


def _swiglu_ad_fwd(experts, x_flat, topk_idx, topk_w, num_experts: int, tm: int, interpret: bool = False):
    y = moe_experts_swiglu_gmm(experts, x_flat, topk_idx, topk_w, num_experts, tm=tm, interpret=interpret)
    return y, (experts, x_flat, topk_idx, topk_w)


def _swiglu_ad_bwd(num_experts: int, tm: int, interpret: bool, res, g):
    from mingunivision_tpu.ops.kernels.moe_gmm import moe_experts_gmm

    experts, x_flat, topk_idx, topk_w = res
    _, vjp = jax.vjp(
        lambda e, x, w: moe_experts_gmm(e, x, topk_idx, w, num_experts, interpret=interpret),
        experts,
        x_flat,
        topk_w,
    )
    ge, gx, gw = vjp(g)
    gidx = np.zeros(topk_idx.shape, dtype=jax.dtypes.float0)
    return ge, gx, gidx, gw


moe_experts_swiglu_gmm_ad.defvjp(_swiglu_ad_fwd, _swiglu_ad_bwd)
