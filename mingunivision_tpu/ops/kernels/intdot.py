"""Integer-MXU dot helpers for quantized Pallas kernels.

v5e-measured facts these encode (see CLAUDE.md and BENCHMARKS "RF int4 unpack
sweep"):
  - ANY bf16-operand mixed dot (bf16 x u8/s8) internally converts every weight
    byte on the VPU — 2-3x slower than HBM streaming at decode-size M.
  - s8 x s8 -> s32 dots stream weights at the HBM floor.
  - Compiled Mosaic integer dots treat ALL operands as SIGNED: a u8 byte >= 128
    silently contributes its two's-complement value. Packed int4 bytes are
    therefore consumed via bitcast(b ^ 0x80, int8) == b - 128 exactly.

So: dynamically quantize ACTIVATIONS per-row to s8, use integer dots, descale
the (tiny) fp32 results. Activation quantization adds ~0.4%/matmul — far below
the int4/int8 weight tiers' own error.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quant_rows_s8_pair(lo, hi):
    """Per-row s8 quantization of the split-halves 2-dot operands.

    For packed bytes b = lo' | (hi' << 4) (offset-binary nibbles, lo/hi
    weights = nibble - 8):
        x_lo@W_lo + x_hi@W_hi
      = (x_lo - x_hi/16) @ (b & 15) + (x_hi @ s8(b ^ 0x80))/16 - 8*rowsum(x_lo)
    Returns (a1 s8, a2 s8, sa1 (N,1) f32, sa2 (N,1) f32, corr (N,1) f32).
    """
    lo32 = lo.astype(jnp.float32)
    hi32 = hi.astype(jnp.float32)
    c1 = lo32 - hi32 * (1.0 / 16.0)
    sa1 = jnp.max(jnp.abs(c1), axis=-1, keepdims=True) / 127.0 + 1e-12
    sa2 = jnp.max(jnp.abs(hi32), axis=-1, keepdims=True) / 127.0 + 1e-12
    a1r = jnp.round(c1 / sa1)
    a2r = jnp.round(hi32 / sa2)
    a1 = a1r.astype(jnp.int32).astype(jnp.int8)
    a2 = a2r.astype(jnp.int32).astype(jnp.int8)
    # corr from the QUANTIZED operands, not raw x_lo: the identity is then
    # exact in the quantized activations (x̃_lo = a1*sa1 + a2*sa2/16), which
    # cancels the per-row bias the +8 nibble offset would otherwise amplify
    # out of the a1 rounding noise (~1.6x lower rel-L2, measured).
    corr = 8.0 * (
        jnp.sum(a1r, axis=-1, keepdims=True) * sa1
        + jnp.sum(a2r, axis=-1, keepdims=True) * (sa2 * (1.0 / 16.0))
    )
    return a1, a2, sa1, sa2, corr


def mm4_s8(q2d_u8, a1, a2, sa1, sa2, corr):
    """The two integer dots + fp32 epilogue for quant_rows_s8_pair operands."""
    bx = jax.lax.bitcast_convert_type(q2d_u8 ^ jnp.uint8(0x80), jnp.int8)  # s8 == b - 128
    m = bx & jnp.int8(0xF)  # low nibble of b, in [0, 15]
    d1 = jax.lax.dot_general(a1, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    d2 = jax.lax.dot_general(a2, bx, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return d1.astype(jnp.float32) * sa1 + d2.astype(jnp.float32) * (sa2 * (1.0 / 16.0)) - corr


def quant_rows_s8(x):
    """Per-row s8 quantization for plain int8-weight dots.
    Returns (x_s8, sx (N,1) f32)."""
    x32 = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0 + 1e-12
    return jnp.round(x32 / sx).astype(jnp.int32).astype(jnp.int8), sx


def mm8_s8(q2d_s8, x_s8, sx):
    """x @ W for int8 weights via one s8 x s8 -> s32 dot (per-row descale;
    callers apply the per-output-channel weight scale)."""
    d = jax.lax.dot_general(x_s8, q2d_s8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return d.astype(jnp.float32) * sx
