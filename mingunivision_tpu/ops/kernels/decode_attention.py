"""Fused single-token GQA decode attention over the static KV cache (Pallas).

The decode step's attention reads the whole KV cache once; the XLA path
materializes (B, H, 1, S) fp32 scores in HBM and re-reads them for the softmax
and the PV matmul. This kernel keeps everything in VMEM with an online-softmax
accumulator (flash-decoding style):

  grid = (B, Hkv); each program owns one (batch row, kv head): its G = Hq/Hkv
  query heads attend S cache positions in TILE_S chunks — score tile -> running
  (max, sum, acc) update — with the per-row boolean mask (padding + CFG-row
  masks) fused in. KV is never repeated across query groups (GQA stays grouped),
  and nothing but the final (G, D) output leaves VMEM.

Used by the decode loops when S is large enough to matter; the XLA path in
ops/attention.py remains the CPU/shape-fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_TPU = True
except Exception:  # pragma: no cover
    pltpu = None
    PALLAS_TPU = False

NEG_INF = -1e30


def _decode_attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float, tile_s: int):
    """One (batch, kv-head) program.

    Block shapes: q_ref (1, 1, G, D); k_ref/v_ref (1, 1, S, D);
    mask_ref (1, 1, S); o_ref (1, 1, G, D).
    """
    G, D = q_ref.shape[2], q_ref.shape[3]
    S = k_ref.shape[2]
    n_tiles = S // tile_s

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (G, D)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, 0, pl.ds(i * tile_s, tile_s), :].astype(jnp.float32)  # (T, D)
        v = v_ref[0, 0, pl.ds(i * tile_s, tile_s), :].astype(jnp.float32)
        mask = mask_ref[0, 0, pl.ds(i * tile_s, tile_s)]  # (T,) int32
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (G, T)
        s = jnp.where(mask[None, :] != 0, s, NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))  # (G, 1)
        p = jnp.exp(s - m_new)  # (G, T)
        correction = jnp.exp(m_prev - m_new)  # (G, 1)
        l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * correction + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((G, 1), jnp.float32)
    acc0 = jnp.zeros((G, D), jnp.float32)
    m, l, acc = lax.fori_loop(0, n_tiles, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def pallas_decode_attention(q, k_cache, v_cache, mask, *, scale=None, tile_s: int = 512, interpret: bool = False, kv_head_major: bool = False):
    """q: (B, 1, Hq, D); k/v_cache: (B, S, Hkv, D) — or the caches' native
    head-major (B, Hkv, S, D) with `kv_head_major=True` (zero-copy); mask:
    bool (B, S).

    Returns (B, 1, Hq, D). S must be a multiple of tile_s.
    """
    B, _, Hq, D = q.shape
    if kv_head_major:
        Hkv, S = k_cache.shape[1], k_cache.shape[2]
    else:
        S, Hkv = k_cache.shape[1], k_cache.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = D**-0.5
    assert S % tile_s == 0, f"S={S} not a multiple of tile_s={tile_s}"

    qg = q.reshape(B, Hkv, G, D)  # group query heads by kv head
    kt = k_cache if kv_head_major else k_cache.transpose(0, 2, 1, 3)  # (B, Hkv, S, D)
    vt = v_cache if kv_head_major else v_cache.transpose(0, 2, 1, 3)
    mask_i = mask.astype(jnp.int32)[:, None, :]  # (B, 1, S)

    kernel = functools.partial(_decode_attn_kernel, scale=float(scale), tile_s=tile_s)
    out = pl.pallas_call(
        kernel,
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec((1, 1, G, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, h: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=interpret,
    )(qg, kt, vt, mask_i)
    return out.reshape(B, 1, Hq, D)
