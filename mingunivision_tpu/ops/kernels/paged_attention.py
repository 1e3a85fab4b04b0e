"""Paged decode attention over a block-paged KV pool (Pallas + XLA fallback).

The reference serves through vLLM, whose core memory model is PagedAttention:
KV lives in fixed-size pages owned by a block allocator, and each sequence
addresses its pages through a block table (vllm/ming_lite.patch relies on this
via the vLLM runtime; SURVEY §2.9 lists paged attention among the CUDA kernels
the TPU build must counter). Dense per-slot caches reserve `max_len` positions
per slot; pages cut pool HBM to ~actual tokens, so the same chip holds more
concurrent sequences.

TPU-first shape of the kernel: grid = (B, Hkv, n_pages); the BLOCK TABLE rides
as scalar prefetch and the k/v BlockSpec index maps use it, so each program DMAs
exactly the page it needs — the table indirection costs nothing on the compute
path (flash-decoding online softmax across the page grid axis, accumulators in
VMEM scratch). The XLA fallback gathers pages into a dense view and reuses the
standard masked attention (CPU/parity path).

Layouts (head-major, matching the rest of the stack):
  q:        (B, 1, Hq, D)
  k_pages:  (P, Hkv, page_size, D)  — page-major pool, one extra SCRATCH page
  tables:   (B, max_pages) int32    — page ids per slot (scratch id when unused)
  lengths:  (B,) int32              — valid tokens per row INCLUDING the token
                                      written this step
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


def paged_gather_attention(q, k_pages, v_pages, tables, lengths, *, scale=None):
    """XLA fallback: gather each row's pages into a dense (B, Hkv, S', D) view
    and run the standard masked attention. Bit-comparable to the Pallas kernel
    (same fp32 accumulation order per tile on CPU within tolerance)."""
    from mingunivision_tpu.ops.attention import mha

    B, _, Hq, D = q.shape
    page = k_pages.shape[2]
    maxp = tables.shape[1]
    if scale is None:
        scale = D**-0.5
    kg = jnp.take(k_pages, tables, axis=0)  # (B, maxp, Hkv, page, D)
    vg = jnp.take(v_pages, tables, axis=0)
    kg = kg.transpose(0, 2, 1, 3, 4).reshape(B, k_pages.shape[1], maxp * page, D)
    vg = vg.transpose(0, 2, 1, 3, 4).reshape(B, v_pages.shape[1], maxp * page, D)
    pos = jnp.arange(maxp * page, dtype=jnp.int32)[None, :]
    mask = pos < lengths[:, None]
    return mha(q, kg, vg, mask=mask[:, None, None, :], scale=scale, kv_head_major=True)


def _paged_decode_kernel(
    tables_ref,  # scalar prefetch (B, maxp)
    lengths_ref,  # scalar prefetch (B,)
    q_ref,  # (1, 1, G, D)
    k_ref,  # (1, 1, page, D) — the page picked by the index map
    v_ref,
    o_ref,  # (1, 1, G, D)
    m_scr,  # VMEM (G, 1) f32
    l_scr,  # VMEM (G, 1) f32
    acc_scr,  # VMEM (G, D) f32
    *,
    scale: float,
    page: int,
    n_pages: int,
):
    b = pl.program_id(0)
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (G, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (page, D)
    v = v_ref[0, 0].astype(jnp.float32)

    valid = lengths_ref[b]
    ids = p * page + lax.broadcasted_iota(jnp.int32, (1, page), 1)  # (1, page)
    s = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = jnp.where(ids < valid, s, NEG_INF)  # (G, page)

    m_prev, l_prev, acc = m_scr[...], l_scr[...], acc_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    pexp = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    m_scr[...] = m_new
    l_scr[...] = l_prev * corr + jnp.sum(pexp, axis=1, keepdims=True)
    acc_scr[...] = acc * corr + lax.dot_general(
        pexp, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(p == n_pages - 1)
    def _emit():
        o_ref[0, 0] = (acc_scr[...] / jnp.maximum(l_scr[...], 1e-30)).astype(o_ref.dtype)


def pallas_paged_decode_attention(q, k_pages, v_pages, tables, lengths, *, scale=None, interpret: bool = False):
    """q (B, 1, Hq, D); k/v_pages (P, Hkv, page, D); tables (B, maxp) int32;
    lengths (B,) int32 (incl. the just-written token). Returns (B, 1, Hq, D).

    Every program DMAs one page selected by the prefetched table; positions
    past `lengths` (incl. whole scratch/unassigned pages) are masked in the
    online softmax, so table entries only need to be VALID page indices.
    """
    B, _, Hq, D = q.shape
    P, Hkv, page, _ = k_pages.shape
    maxp = tables.shape[1]
    G = Hq // Hkv
    if scale is None:
        scale = D**-0.5

    qg = q.reshape(B, Hkv, G, D)
    kernel = functools.partial(
        _paged_decode_kernel, scale=float(scale), page=page, n_pages=maxp
    )

    def _page_ix(b, h, p, tbl, ln):
        # Clamp past-the-end pages to the row's LAST valid page: the pipeline
        # elides the DMA when consecutive index-map results are equal, so the
        # tail of a short row costs zero HBM traffic (its positions are masked
        # in the online softmax regardless of which page sits in the block).
        last = jnp.maximum((ln[b] - 1) // page, 0)
        return (tbl[b, jnp.minimum(p, last)], h, 0, 0)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, Hkv, maxp),
            in_specs=[
                pl.BlockSpec((1, 1, G, D), lambda b, h, p, tbl, ln: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, page, D), _page_ix),
                pl.BlockSpec((1, 1, page, D), _page_ix),
            ],
            out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h, p, tbl, ln: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((G, 1), jnp.float32),
                pltpu.VMEM((G, 1), jnp.float32),
                pltpu.VMEM((G, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(tables.astype(jnp.int32), lengths.astype(jnp.int32), qg, k_pages, v_pages)
    return out.reshape(B, 1, Hq, D)
