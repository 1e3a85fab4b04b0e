"""Gathered-expert matmul Pallas kernel (decode-path MoE dispatch).

XLA's row-gather of expert weight slabs (jnp.take of (E, h, m) by assignment)
measured ~20x off roofline on v5e — it materializes the gathered copies through
an inefficient lowering. This kernel removes the materialization entirely:

  grid = (num_assignments, n_tiles); the assignment's expert id arrives via
  scalar prefetch, so the BlockSpec index_map DMAs (h, TILE_N) weight tiles of
  exactly the chosen expert HBM->VMEM (double-buffered by the Pallas pipeline),
  and the kernel does the (rows_per_assignment, h) x (h, TILE_N) matmul.

HBM traffic = active expert weights once per assignment — the information-
theoretic minimum for per-token expert choice (dedup across CFG rows can halve
it again; future work).
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


def _kernel(ids_ref, x_ref, w_ref, o_ref):
    # x_ref: (1, 1, h); w_ref: (1, h, TILE_N); o_ref: (1, 1, TILE_N)
    x = x_ref[0]
    w = w_ref[0]
    o_ref[0] = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def gathered_expert_matmul(x_rows, expert_w, ids, *, tile_n: int = 512, interpret: bool = False):
    """x_rows: (A, h); expert_w: (E, h, N); ids: (A,) int32 -> (A, N).

    Row a is multiplied by expert_w[ids[a]] without materializing the gather.
    Rows travel as (A, 1, h) so every block keeps TPU-legal (8/128-aligned or
    full-dimension) trailing dims.
    """
    A, h = x_rows.shape
    E, h2, N = expert_w.shape
    assert h == h2
    # Grid-step overhead dominates tiny DMAs (measured ~6us/step on v5e): take
    # the FULL weight slab per step when the double-buffered block fits VMEM,
    # else the largest 128-aligned divisor.
    full_bytes = h * N * jnp.dtype(expert_w.dtype).itemsize
    if 2 * full_bytes <= 13 * 1024 * 1024:
        tile_n = N
    elif N % tile_n:
        tile_n = next((t for t in (1024, 512, 256, 128) if N % t == 0), N)
    tile_n = min(tile_n, N)
    assert N % tile_n == 0, f"N={N} has no 128-aligned tile"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A, N // tile_n),
        in_specs=[
            pl.BlockSpec((1, 1, h), lambda a, n, ids: (a, 0, 0)),
            pl.BlockSpec((1, h, tile_n), lambda a, n, ids: (ids[a], 0, n)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_n), lambda a, n, ids: (a, 0, n)),
    )
    kwargs = {}
    if not interpret and PALLAS_TPU:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=15 * 1024 * 1024)
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, 1, N), x_rows.dtype),
        interpret=interpret,
        **kwargs,
    )(ids.astype(jnp.int32), x_rows[:, None, :], expert_w)
    return out[:, 0, :]


def moe_experts_gather_pallas(experts, x_flat, topk_idx, topk_w, *, interpret: bool = False):
    """Drop-in replacement for moe_experts_gather using the Pallas kernel.

    x_flat: (Ntok, h); topk_idx: (Ntok, k). Returns (Ntok, h).
    """
    Ntok, k = topk_idx.shape
    h = x_flat.shape[-1]
    flat_idx = topk_idx.reshape(-1)
    xr = jnp.repeat(x_flat, k, axis=0)  # (A, h)

    g = gathered_expert_matmul(xr, experts["gate_proj"], flat_idx, interpret=interpret)
    u = gathered_expert_matmul(xr, experts["up_proj"], flat_idx, interpret=interpret)
    a = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(x_flat.dtype)
    y = gathered_expert_matmul(a, experts["down_proj"], flat_idx, interpret=interpret)
    y = y.reshape(Ntok, k, h).astype(jnp.float32) * topk_w.astype(jnp.float32)[..., None]
    return jnp.sum(y, axis=1).astype(x_flat.dtype)
