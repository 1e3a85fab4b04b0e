"""Fused rectified-flow MLP-stack kernel (int8, dequant-fused).

The RF head dominates single-chip T2I: 16 Euler steps each stream ~1 GB of
int8 MLP weights (12 AdaLN-SwiGLU ResBlocks at width 3072 / hidden 8192 —
reference SimpleMLPAdaLN, diff_loss_rf_swiglu.py:295-385). The XLA premod path
measured 25.7 ms/token (~1.5x the HBM roofline); this kernel runs ONE pallas
call per Euler step covering all 12 blocks:

  grid = (block, hidden-chunk). Per block: at chunk 0 the running activation
  (VMEM scratch, carried across the whole grid) is layer-normed and
  AdaLN-modulated with the PRECOMPUTED (shift, scale, gate) rows
  (rf_head.precompute_modulations); each chunk streams the int8 w12 gate/up
  column tiles + the w3 row tile, computes silu(x@w1+b1)*(x@w2+b2) @ w3 with
  the per-output-channel scales applied to the matmul RESULTS, and accumulates
  into an fp32 scratch; at the last chunk the gated residual updates the
  running activation. Weights cross HBM exactly once per step at int8 width.

The same array is passed twice with different index maps to read the gate and
up halves of the fused w12 table — no repacking of the checkpoint layout.
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


def _kernel(
    x_ref,  # (Np, w) input activations
    lnw_ref,  # (1, 1, w)
    lnb_ref,  # (1, 1, w)
    q1_ref,  # (1, w, CH) int8 — w12 gate columns
    s1_ref,  # (1, 1, CH)
    b1_ref,  # (1, 1, CH)
    q2_ref,  # (1, w, CH) int8 — w12 up columns
    s2_ref,
    b2_ref,
    q3_ref,  # (1, CH, w) int8 — w3 rows
    s3_ref,  # (1, 1, w)
    b3_ref,  # (1, 1, w)
    mods_ref,  # (1, Np, 3w) f32 premod rows
    o_ref,  # (Np, w)
    xcur_ref,  # VMEM f32 scratch: running activation
    xs_ref,  # VMEM scratch: modulated input (compute dtype)
    acc_ref,  # VMEM f32 scratch: block output accumulator
    *,
    ln_eps: float,
    compute_dtype,
):
    l = pl.program_id(0)
    c = pl.program_id(1)
    w = x_ref.shape[-1]

    @pl.when((l == 0) & (c == 0))
    def _load_x():
        xcur_ref[...] = x_ref[...].astype(jnp.float32)

    @pl.when(c == 0)
    def _modulate():
        x = xcur_ref[...]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        ln = (x - mu) * jax.lax.rsqrt(var + ln_eps)
        ln = ln * lnw_ref[...].reshape(-1)[None, :] + lnb_ref[...].reshape(-1)[None, :]
        mods = mods_ref[0]  # (Np, 3w)
        shift = mods[:, :w]
        scale = mods[:, w : 2 * w]
        xs_ref[...] = (ln * (1.0 + scale) + shift).astype(xs_ref.dtype)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xs = xs_ref[...]
    w1 = q1_ref[...].reshape(q1_ref.shape[-2], q1_ref.shape[-1]).astype(compute_dtype)
    w2 = q2_ref[...].reshape(q2_ref.shape[-2], q2_ref.shape[-1]).astype(compute_dtype)
    g = jax.lax.dot_general(xs, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    u = jax.lax.dot_general(xs, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    g = g * s1_ref[...].reshape(-1)[None, :] + b1_ref[...].reshape(-1)[None, :]
    u = u * s2_ref[...].reshape(-1)[None, :] + b2_ref[...].reshape(-1)[None, :]
    h = (jax.nn.silu(g) * u).astype(compute_dtype)  # (Np, CH)
    w3 = q3_ref[...].reshape(q3_ref.shape[-2], q3_ref.shape[-1]).astype(compute_dtype)
    po = jax.lax.dot_general(h, w3, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[...] += po * s3_ref[...].reshape(-1)[None, :]

    @pl.when(c == pl.num_programs(1) - 1)
    def _residual():
        mods = mods_ref[0]
        gate = mods[:, 2 * w :]
        # w3 bias is added ONCE per block (not per chunk)
        xcur_ref[...] += gate * (acc_ref[...] + b3_ref[...].reshape(-1)[None, :])

        @pl.when(l == pl.num_programs(0) - 1)
        def _flush():
            o_ref[...] = xcur_ref[...].astype(o_ref.dtype)


def _unpack_mm4(q2d_u8, a_lo, a_hi, compute_dtype, mode: str):
    """x_lo @ lo + x_hi @ hi over a split-halves packed int4 byte matrix.

    mode selects HOW the nibbles reach the MXU (the VPU unpack is the exposed
    cost at the RF head's tiny batch — BENCHMARKS "RF kernel chunk sweep"):
      i32: widen to int32, mask+shift (round-2 default)
      i16: widen to int16 only (half the VPU register traffic of i32)
      i8:  mask/shift in the 8-bit domain, offset folded into fp
      alg: NO shift at all — one masked convert L=f(b&15), one raw convert
           f(b)=lo'+16*hi', then x_hi@hi' = (x_hi@f(b) - x_hi@L)/16; the
           offset-binary -8 folds into rank-1 row-sum corrections. Trades a
           third (tiny-M) matmul for most of the VPU unpack work.
    """
    if mode == "mxu":
        # ZERO-cast path: the v5e MXU consumes bf16 x u8 mixed dots natively
        # (probed on-device), so the only VPU work is ONE 8-bit mask per byte;
        # hi' recovers via (x@b - x@(b&15))/16 and the offset-binary -8 folds
        # into rank-1 row-sum corrections.
        Lm = q2d_u8 & jnp.uint8(0xF)  # lo' in [0,15], stays u8
        m_lo = jax.lax.dot_general(a_lo, Lm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_all = jax.lax.dot_general(a_hi, q2d_u8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_hi_l = jax.lax.dot_general(a_hi, Lm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        out = m_lo + (m_all - m_hi_l) * (1.0 / 16.0)
        corr = 8.0 * (
            jnp.sum(a_lo.astype(jnp.float32), axis=-1) + jnp.sum(a_hi.astype(jnp.float32), axis=-1)
        )
        return out - corr[:, None]
    if mode == "alg":
        # Mosaic only widens u8 via i32; one shared widen, NO shift, no -8 subs
        qi = q2d_u8.astype(jnp.int32)
        Lm = (qi & 0xF).astype(compute_dtype)  # lo' in [0,15]
        Bf = qi.astype(compute_dtype)  # lo' + 16*hi'
        m_lo = jax.lax.dot_general(a_lo, Lm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_all = jax.lax.dot_general(a_hi, Bf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_hi_l = jax.lax.dot_general(a_hi, Lm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        out = m_lo + (m_all - m_hi_l) * (1.0 / 16.0)
        corr = 8.0 * (
            jnp.sum(a_lo.astype(jnp.float32), axis=-1) + jnp.sum(a_hi.astype(jnp.float32), axis=-1)
        )
        return out - corr[:, None]
    if mode == "i16":
        qb = q2d_u8.astype(jnp.int16)
        lo = ((qb & 0xF) - 8).astype(compute_dtype)
        hi = ((qb >> 4) - 8).astype(compute_dtype)
    elif mode == "i8":
        lo = (q2d_u8 & jnp.uint8(0xF)).astype(jnp.float32).astype(compute_dtype) - 8.0
        hi = (q2d_u8 >> jnp.uint8(4)).astype(jnp.float32).astype(compute_dtype) - 8.0
    else:  # i32
        qb = q2d_u8.astype(jnp.int32)
        lo = ((qb & 0xF) - 8).astype(compute_dtype)
        hi = (((qb >> 4) & 0xF) - 8).astype(compute_dtype)
    out = jax.lax.dot_general(a_lo, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out += jax.lax.dot_general(a_hi, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return out


from mingunivision_tpu.ops.kernels.intdot import (  # noqa: E402
    mm4_s8 as _mm4_s8,
    quant_rows_s8_pair as _quant_rows_s8,
)


def _kernel_q8_s8(
    x_ref,
    lnw_ref,
    lnb_ref,
    q1_ref,  # (1, w, CH) int8 — w12 gate columns
    s1_ref,
    b1_ref,
    q2_ref,  # (1, w, CH) int8 — w12 up columns
    s2_ref,
    b2_ref,
    q3_ref,  # (1, CH, w) int8 — w3 rows
    s3_ref,
    b3_ref,
    mods_ref,
    o_ref,
    xcur_ref,  # VMEM f32 (Np, w)
    xq_ref,  # VMEM s8 (Np, w) quantized modulated activation
    st_ref,  # VMEM f32 (Np, 128): [sx]
    acc_ref,  # VMEM f32 (Np, w) block output accumulator
    *,
    ln_eps: float,
    compute_dtype,
):
    """int8 OPT-IN integer-dot variant (rf_mlp_stack(unpack_mode='s8') on int8
    blocks): the exact kernel converts every int8 weight byte to bf16 on the
    VPU before its dots; here the modulated activation quantizes per-row to s8
    once per block and the weights stream through s8 x s8 -> s32 dots at the
    HBM floor. Adds ~0.4%/matmul activation noise — int8 stays the QUALITY
    tier by default (INT8_INT_DOTS=False)."""
    from mingunivision_tpu.ops.kernels.intdot import mm8_s8, quant_rows_s8

    l = pl.program_id(0)
    c = pl.program_id(1)
    w = x_ref.shape[-1]

    @pl.when((l == 0) & (c == 0))
    def _load_x():
        xcur_ref[...] = x_ref[...].astype(jnp.float32)

    @pl.when(c == 0)
    def _modulate():
        x = xcur_ref[...]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        ln = (x - mu) * jax.lax.rsqrt(var + ln_eps)
        ln = ln * lnw_ref[...].reshape(-1)[None, :] + lnb_ref[...].reshape(-1)[None, :]
        mods = mods_ref[0]
        xs = ln * (1.0 + mods[:, w : 2 * w]) + mods[:, :w]
        xq, sx = quant_rows_s8(xs)
        xq_ref[...] = xq
        st_ref[:, 0:1] = sx
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xq = xq_ref[...]
    sx = st_ref[:, 0:1]
    w1 = q1_ref[...].reshape(q1_ref.shape[-2], q1_ref.shape[-1])
    w2 = q2_ref[...].reshape(q2_ref.shape[-2], q2_ref.shape[-1])
    g = mm8_s8(w1, xq, sx) * s1_ref[...].reshape(-1)[None, :] + b1_ref[...].reshape(-1)[None, :]
    u = mm8_s8(w2, xq, sx) * s2_ref[...].reshape(-1)[None, :] + b2_ref[...].reshape(-1)[None, :]
    h = jax.nn.silu(g) * u  # (Np, CH) f32
    hq, sh = quant_rows_s8(h)
    w3 = q3_ref[...].reshape(q3_ref.shape[-2], q3_ref.shape[-1])
    po = mm8_s8(w3, hq, sh)
    acc_ref[...] += po * s3_ref[...].reshape(-1)[None, :]

    @pl.when(c == pl.num_programs(1) - 1)
    def _residual():
        mods = mods_ref[0]
        xcur_ref[...] += mods[:, 2 * w :] * (acc_ref[...] + b3_ref[...].reshape(-1)[None, :])

        @pl.when(l == pl.num_programs(0) - 1)
        def _flush():
            o_ref[...] = xcur_ref[...].astype(o_ref.dtype)


def _kernel_q4(
    x_ref,
    lnw_ref,
    lnb_ref,
    q1_ref,  # (1, w/2, CH) uint8 split-halves packed (gate cols)
    s1_ref,
    b1_ref,
    q2_ref,  # (1, w/2, CH) (up cols)
    s2_ref,
    b2_ref,
    q3_ref,  # (1, H/2, w) uint8 packed on the hidden axis — FULL per block
    s3_ref,  # (1, 1, w)
    b3_ref,  # (1, 1, w)
    mods_ref,
    o_ref,
    xcur_ref,
    xs_ref,
    h_ref,  # VMEM scratch (Np, H): hidden activations accumulate per chunk
    *,
    ln_eps: float,
    compute_dtype,
    unpack_mode: str = "i32",
):
    """int4 variant: w12 split-halves packed on the w axis (xs splits into
    contiguous halves), w3 packed on the hidden axis and consumed as ONE full
    block per ResBlock after the hidden scratch is complete."""
    l = pl.program_id(0)
    c = pl.program_id(1)
    w = x_ref.shape[-1]
    CH = q1_ref.shape[-1]

    @pl.when((l == 0) & (c == 0))
    def _load_x():
        xcur_ref[...] = x_ref[...].astype(jnp.float32)

    @pl.when(c == 0)
    def _modulate():
        x = xcur_ref[...]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        ln = (x - mu) * jax.lax.rsqrt(var + ln_eps)
        ln = ln * lnw_ref[...].reshape(-1)[None, :] + lnb_ref[...].reshape(-1)[None, :]
        mods = mods_ref[0]
        xs_ref[...] = (ln * (1.0 + mods[:, w : 2 * w]) + mods[:, :w]).astype(xs_ref.dtype)

    xs = xs_ref[...]
    half = xs.shape[-1] // 2
    xl, xh = xs[:, :half], xs[:, half:]

    def unpack_mm(q_ref, a_lo, a_hi):
        qb = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])
        return _unpack_mm4(qb, a_lo, a_hi, compute_dtype, unpack_mode)

    g = unpack_mm(q1_ref, xl, xh) * s1_ref[...].reshape(-1)[None, :] + b1_ref[...].reshape(-1)[None, :]
    u = unpack_mm(q2_ref, xl, xh) * s2_ref[...].reshape(-1)[None, :] + b2_ref[...].reshape(-1)[None, :]
    h_ref[:, pl.ds(c * CH, CH)] = (jax.nn.silu(g) * u).astype(h_ref.dtype)

    @pl.when(c == pl.num_programs(1) - 1)
    def _down_and_residual():
        Hh = h_ref.shape[-1] // 2  # packed rows of q3
        # chunk the unpack over packed rows: a full-block int32 unpack would
        # materialize ~50 MB of VMEM temporaries at the real (4096, 3072) size
        KC = min(512, Hh)
        n_k = Hh // KC

        def body(k, po):
            qb = q3_ref[0, pl.ds(k * KC, KC), :]
            h_lo = h_ref[:, pl.ds(k * KC, KC)]
            h_hi = h_ref[:, pl.ds(Hh + k * KC, KC)]
            po += _unpack_mm4(qb, h_lo, h_hi, compute_dtype, unpack_mode)
            return po

        po0 = jnp.zeros((h_ref.shape[0], w), jnp.float32)
        po = jax.lax.fori_loop(0, n_k, body, po0)
        po = po * s3_ref[...].reshape(-1)[None, :] + b3_ref[...].reshape(-1)[None, :]
        mods = mods_ref[0]
        xcur_ref[...] += mods[:, 2 * w :] * po

        @pl.when(l == pl.num_programs(0) - 1)
        def _flush():
            o_ref[...] = xcur_ref[...].astype(o_ref.dtype)


def _kernel_q4_s8(
    x_ref,
    lnw_ref,
    lnb_ref,
    q1_ref,  # (1, w/2, CH) uint8 packed gate cols
    s1_ref,
    b1_ref,
    q2_ref,  # (1, w/2, CH) packed up cols
    s2_ref,
    b2_ref,
    q3_ref,  # (1, H/2, w) packed down rows
    s3_ref,
    b3_ref,
    mods_ref,
    o_ref,
    xcur_ref,  # VMEM f32 (Np, w) running activation
    a1_ref,  # VMEM s8 (Np, w/2) quantized combo operand
    a2_ref,  # VMEM s8 (Np, w/2) quantized hi operand
    b1_sref,  # VMEM s8 (Np, H/2) down-proj combo operand
    b2_sref,  # VMEM s8 (Np, H/2) down-proj hi operand
    st_ref,  # VMEM f32 (Np, 128) per-row stats: [sa1, sa2, corr]
    h_ref,  # VMEM (Np, H) hidden activations (compute dtype)
    *,
    ln_eps: float,
    compute_dtype,
):
    """int4 stack via INTEGER MXU dots (the v5e-measured fast path): per block
    the modulated activation quantizes ONCE to two s8 operands; each chunk then
    costs only a u8 mask + two s8 x u8 -> s32 dots, which stream the packed
    weights at the HBM floor (no per-byte float converts). Activation
    quantization adds ~0.4% per-row error — negligible against the int4 weight
    tier's own error (BENCHMARKS 'int4/int8 RF quality bound')."""
    l = pl.program_id(0)
    c = pl.program_id(1)
    w = x_ref.shape[-1]
    CH = q1_ref.shape[-1]
    half = w // 2

    @pl.when((l == 0) & (c == 0))
    def _load_x():
        xcur_ref[...] = x_ref[...].astype(jnp.float32)

    @pl.when(c == 0)
    def _modulate_and_quant():
        x = xcur_ref[...]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        ln = (x - mu) * jax.lax.rsqrt(var + ln_eps)
        ln = ln * lnw_ref[...].reshape(-1)[None, :] + lnb_ref[...].reshape(-1)[None, :]
        mods = mods_ref[0]
        xs = ln * (1.0 + mods[:, w : 2 * w]) + mods[:, :w]
        a1, a2, sa1, sa2, corr = _quant_rows_s8(xs[:, :half], xs[:, half:])
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

    def mm(q_ref):
        qb = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])
        return _mm4_s8(qb, a1, a2, sa1, sa2, corr)

    g = mm(q1_ref) * s1_ref[...].reshape(-1)[None, :] + b1_ref[...].reshape(-1)[None, :]
    u = mm(q2_ref) * s2_ref[...].reshape(-1)[None, :] + b2_ref[...].reshape(-1)[None, :]
    h_ref[:, pl.ds(c * CH, CH)] = (jax.nn.silu(g) * u).astype(h_ref.dtype)

    @pl.when(c == pl.num_programs(1) - 1)
    def _down_and_residual():
        H = h_ref.shape[-1]
        Hh = H // 2
        hf = h_ref[...].astype(jnp.float32)
        b1q, b2q, sb1, sb2, corrh = _quant_rows_s8(hf[:, :Hh], hf[:, Hh:])
        b1_sref[...] = b1q
        b2_sref[...] = b2q
        KC = min(1024, Hh)
        n_k = Hh // KC

        def body(k, po):
            qb = q3_ref[0, pl.ds(k * KC, KC), :]
            bx = jax.lax.bitcast_convert_type(qb ^ jnp.uint8(0x80), jnp.int8)
            m = bx & jnp.int8(0xF)
            b1k = b1_sref[:, pl.ds(k * KC, KC)]
            b2k = b2_sref[:, pl.ds(k * KC, KC)]
            d1 = jax.lax.dot_general(b1k, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            d2 = jax.lax.dot_general(b2k, bx, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            return po + d1.astype(jnp.float32) * sb1 + d2.astype(jnp.float32) * (sb2 * (1.0 / 16.0))

        po0 = jnp.zeros((h_ref.shape[0], w), jnp.float32)
        po = jax.lax.fori_loop(0, n_k, body, po0) - corrh
        po = po * s3_ref[...].reshape(-1)[None, :] + b3_ref[...].reshape(-1)[None, :]
        mods = mods_ref[0]
        xcur_ref[...] += mods[:, 2 * w :] * po

        @pl.when(l == pl.num_programs(0) - 1)
        def _flush():
            o_ref[...] = xcur_ref[...].astype(o_ref.dtype)


def rf_mlp_supported(blocks) -> bool:
    """int8/int4-quantized w12/w3 with 128-aligned dims."""
    from mingunivision_tpu.utils.quantize import QuantizedArray

    w12 = blocks["mlp"]["w12"]["w"]
    w3 = blocks["mlp"]["w3"]["w"]
    if not (isinstance(w12, QuantizedArray) and isinstance(w3, QuantizedArray)):
        return False
    if w12.bits != w3.bits or w12.bits not in (8, 4):
        return False
    if getattr(w12, "scheme", "linear") != "linear" or getattr(w3, "scheme", "linear") != "linear":
        return False  # NF4 codebook tables ride the XLA dequant paths
    L, wq, h2 = w12.q.shape
    w = wq * 2 if w12.bits == 4 else wq
    H = h2 // 2
    if w12.bits == 4:
        # xs splits at w/2 and h at H/2 — both must stay lane-aligned
        return PALLAS_TPU and (w // 2) % 128 == 0 and (H // 2) % 128 == 0
    return PALLAS_TPU and w % 128 == 0 and H % 128 == 0


INT4_UNPACK_MODE = "s8"  # v5e-measured best (1.02 ms/step vs i32 1.17 at the
# real shape; see BENCHMARKS "RF int4 unpack sweep"). "s8" = integer-MXU dots
# with per-row dynamically-quantized activations.
# int8 is the QUALITY tier: exact convert kernel by default; set True (or pass
# unpack_mode='s8') for integer-dot int8 (~0.4%/matmul activation noise).
INT8_INT_DOTS = False


def rf_mlp_stack(
    blocks, x, mods, *, ln_eps: float = 1e-6, chunk: int = 2048, interpret: bool = False, unpack_mode: str = None
):
    """Run the full ResBlock stack for one Euler step.

    blocks: depth-stacked res_blocks params (in_ln{w,b}, mlp{w12,w3} int8);
    x: (B, w); mods: (L, B, 3w) precomputed AdaLN rows. Returns (B, w).
    unpack_mode (int4 only): nibble-unpack strategy, see _unpack_mm4.
    """
    w12 = blocks["mlp"]["w12"]["w"]
    w3 = blocks["mlp"]["w3"]["w"]
    b12 = blocks["mlp"]["w12"]["b"]  # (L, 2H)
    b3 = blocks["mlp"]["w3"]["b"]  # (L, w)
    bits = w12.bits
    if unpack_mode is None:
        # int4: measured-best integer-dot path. int8: exact convert kernel by
        # default (s8 is a measured TIE there — BENCHMARKS "RF int4 unpack
        # sweep"); INT8_INT_DOTS / unpack_mode="s8" opts in.
        unpack_mode = INT4_UNPACK_MODE if bits == 4 else ("s8" if INT8_INT_DOTS else "exact")
    L, wq, h2 = w12.q.shape
    w = wq * 2 if bits == 4 else wq
    H = h2 // 2
    if bits == 4:
        chunk = min(chunk, 2048)  # bound the in-kernel int32 unpack temporaries
    CH = min(chunk, H)
    while H % CH:
        CH //= 2
    HC = H // CH

    B = x.shape[0]
    Np = max(8, -(-B // 8) * 8)
    xp = jnp.zeros((Np, w), x.dtype).at[:B].set(x)
    mods_p = jnp.zeros((L, Np, 3 * w), jnp.float32).at[:, :B].set(mods.astype(jnp.float32))
    s12 = w12.s.astype(jnp.float32)  # (L, 1, 2H)
    s3 = w3.s.astype(jnp.float32)  # (L, 1, w)
    b12r = b12.astype(jnp.float32).reshape(L, 1, h2)
    b3r = b3.astype(jnp.float32).reshape(L, 1, w)

    def ws(spec_cols_up: bool):
        off = HC if spec_cols_up else 0
        return pl.BlockSpec((1, wq, CH), lambda l, c: (l, 0, off + c))

    def srow(spec_cols_up: bool, width=CH):
        off = HC if spec_cols_up else 0
        return pl.BlockSpec((1, 1, width), lambda l, c: (l, 0, off + c))

    extra_scratch = []
    if bits == 4 and unpack_mode == "s8":
        kernel = functools.partial(_kernel_q4_s8, ln_eps=ln_eps, compute_dtype=x.dtype)
        w3_spec = pl.BlockSpec((1, H // 2, w), lambda l, c: (l, 0, 0))  # full, once per block
        third_scratch = pltpu.VMEM((Np, H), x.dtype)
        extra_scratch = [
            pltpu.VMEM((Np, w // 2), jnp.int8),
            pltpu.VMEM((Np, w // 2), jnp.int8),
            pltpu.VMEM((Np, H // 2), jnp.int8),
            pltpu.VMEM((Np, H // 2), jnp.int8),
            pltpu.VMEM((Np, 128), jnp.float32),
        ]
    elif bits == 4:
        kernel = functools.partial(_kernel_q4, ln_eps=ln_eps, compute_dtype=x.dtype, unpack_mode=unpack_mode)
        w3_spec = pl.BlockSpec((1, H // 2, w), lambda l, c: (l, 0, 0))  # full, once per block
        third_scratch = pltpu.VMEM((Np, H), x.dtype)
    elif bits == 8 and unpack_mode == "s8":
        kernel = functools.partial(_kernel_q8_s8, ln_eps=ln_eps, compute_dtype=x.dtype)
        w3_spec = pl.BlockSpec((1, CH, w), lambda l, c: (l, c, 0))
        third_scratch = pltpu.VMEM((Np, w), jnp.float32)
        extra_scratch = [pltpu.VMEM((Np, w), jnp.int8), pltpu.VMEM((Np, 128), jnp.float32)]
    else:
        kernel = functools.partial(_kernel, ln_eps=ln_eps, compute_dtype=x.dtype)
        w3_spec = pl.BlockSpec((1, CH, w), lambda l, c: (l, c, 0))
        third_scratch = pltpu.VMEM((Np, w), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(L, HC),
        in_specs=[
            pl.BlockSpec((Np, w), lambda l, c: (0, 0)),
            # (L, 1, w) with a singleton middle axis: a (1, w) block of an
            # (L, w) array is TPU-illegal (sublane dim 1 != full L)
            pl.BlockSpec((1, 1, w), lambda l, c: (l, 0, 0)),
            pl.BlockSpec((1, 1, w), lambda l, c: (l, 0, 0)),
            ws(False),
            srow(False),
            srow(False),
            ws(True),
            srow(True),
            srow(True),
            w3_spec,
            pl.BlockSpec((1, 1, w), lambda l, c: (l, 0, 0)),
            pl.BlockSpec((1, 1, w), lambda l, c: (l, 0, 0)),
            pl.BlockSpec((1, Np, 3 * w), lambda l, c: (l, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Np, w), lambda l, c: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, w), x.dtype),
        scratch_shapes=(
            (
                [pltpu.VMEM((Np, w), jnp.float32)] + extra_scratch + [third_scratch]
                if extra_scratch
                else [pltpu.VMEM((Np, w), jnp.float32), pltpu.VMEM((Np, w), x.dtype), third_scratch]
            )
            if PALLAS_TPU
            else []
        ),
        interpret=interpret,
        **(
            {
                "compiler_params": pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                    vmem_limit_bytes=110 * 1024 * 1024,
                )
            }
            if (PALLAS_TPU and not interpret)
            else {}
        ),
    )(
        xp,
        blocks["in_ln"]["w"].astype(jnp.float32).reshape(L, 1, w),
        blocks["in_ln"]["b"].astype(jnp.float32).reshape(L, 1, w),
        w12.q,
        s12,
        b12r,
        w12.q,
        s12,
        b12r,
        w3.q,
        s3,
        b3r,
        mods_p,
    )
    return out[:B]
