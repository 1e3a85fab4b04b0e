"""shard_map MoE decode dispatch over expert/model-sharded tables.

Under GSPMD, feeding expert-sharded tables into the Pallas stream kernel forces
an all-gather of the full tables (the kernel is opaque to the partitioner).
This wrapper goes manual-SPMD instead: `shard_map` over the mesh gives each
device its LOCAL expert shard, expert ids are localized (assignments owned by
other shards get gate weight 0), the existing stream kernel runs per-device,
and a psum over the expert+model axes combines:

  - expert axis: every (token, expert) assignment is computed on exactly one
    shard (the one owning that expert) — psum merges disjoint contributions.
  - model axis: gate/up are column-sharded and down is row-sharded over the
    SAME contiguous block of the expert hidden dim (the megatron column x row
    split), so per-device partial outputs sum exactly. The SwiGLU nonlinearity
    is elementwise per hidden unit and each unit lives wholly on one shard.

Sharding layout is parallel/sharding.py's canonical expert spec:
gate/up P(..., "expert", None, "model"), down P(..., "expert", "model", None).

int4 tables are NOT eligible: the split-halves nibble packing pairs row i with
row i + m/2 across the FULL contraction dim, which doesn't commute with a
contiguous model-axis shard of the packed rows (gate/up columns and down rows
would land on different devices). int4 sharded decode stays on the
GSPMD-partitioned masked-dense path. bf16/fp32 and int8 are supported.

On non-TPU backends the same wrapper runs with the masked-dense compute inside
(the Pallas kernel is TPU-only) — that's how tests/dryrun validate the index
localization + psum arithmetic on a virtual CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from mingunivision_tpu.parallel.sharding import fit_spec
from mingunivision_tpu.utils.quantize import QuantizedArray, take_weight

try:  # jax>=0.8
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)

except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_legacy(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)


def _base_spec(name: str, ndim: int) -> P:
    lead = (None,) * (ndim - 3)
    if name == "down_proj":
        return P(*lead, "expert", "model", None)
    return P(*lead, "expert", None, "model")


def _table_specs(experts, mesh: Mesh):
    out = {}
    for name, w in experts.items():
        out[name] = jax.tree_util.tree_map(
            lambda leaf, n=name: fit_spec(_base_spec(n, leaf.ndim), leaf.shape, mesh), w
        )
    return out


def _gate_array(experts):
    g = experts["gate_proj"]
    return g.q if isinstance(g, QuantizedArray) else g


def sharded_stream_supported(mesh: Mesh, experts, x_flat, topk_idx) -> bool:
    """Static predicate for the shard_map stream path: int4 excluded (packing
    vs model-shard mismatch, see module docstring), and the LOCAL shard shapes
    must satisfy the stream kernel's alignment (d % 128, local m % 128)."""
    ws = (experts["gate_proj"], experts["up_proj"], experts["down_proj"])
    if any(isinstance(w, QuantizedArray) and w.bits == 4 for w in ws):
        return False
    ep = mesh.shape.get("expert", 1)
    mp = mesh.shape.get("model", 1)
    E, d, m = _gate_array(experts).shape[-3:]
    if E % ep or m % mp:
        return False
    # fake a local-shaped probe for the kernel predicate (dtype-preserving)
    def local(leaf, name):
        shape = list(leaf.shape)
        spec = fit_spec(_base_spec(name, leaf.ndim), leaf.shape, mesh)
        for dim, ax in enumerate(spec):
            if ax is not None:
                shape[dim] //= mesh.shape[ax]
        return jax.ShapeDtypeStruct(tuple(shape), leaf.dtype)

    probe = {
        n: (
            QuantizedArray(local(w.q, n), local(w.s, n), w.bits)
            if isinstance(w, QuantizedArray)
            else local(w, n)
        )
        for n, w in experts.items()
    }
    # stream_supported only reads shapes/dtypes/types — ShapeDtypeStructs are
    # fine except isinstance(jnp.ndarray); re-check plainness ourselves
    plain = all(not isinstance(w, QuantizedArray) for w in ws)
    quant8 = all(isinstance(w, QuantizedArray) and w.bits == 8 for w in ws)
    if not (plain or quant8):
        return False
    from mingunivision_tpu.ops.kernels.moe_stream import (
        MAX_STREAM_SLOTS,
        MAX_STREAM_SLOTS_QUANT,
        PALLAS_TPU,
    )

    E_l, d_l, m_l = _gate_array(probe).shape[-3:]
    N, k = topk_idx.shape
    cap = MAX_STREAM_SLOTS_QUANT if quant8 else MAX_STREAM_SLOTS
    return PALLAS_TPU and d_l % 128 == 0 and m_l % 128 == 0 and N * k <= cap


def moe_experts_stream_sharded(
    mesh: Mesh,
    experts,
    x_flat,
    topk_idx,
    topk_w,
    *,
    layer_idx=None,
    num_experts: int = None,
    axis_expert: str = "expert",
    axis_model: str = "model",
    axis_data: str = "data",
    interpret: bool = False,
):
    """Sharded decode MoE dispatch. experts: (stacked or per-layer) table dict
    laid out per parallel/sharding.py; x_flat (N, d); topk_idx/topk_w (N, k).
    Returns (N, d) with the same sharding as x_flat (data axis preserved)."""
    E = _gate_array(experts).shape[-3]
    num_experts = num_experts or E
    ep = mesh.shape.get(axis_expert, 1)
    E_local = E // ep
    stacked = layer_idx is not None
    lay = jnp.asarray(layer_idx if stacked else 0, jnp.int32)

    row_spec = fit_spec(P(axis_data, None), x_flat.shape, mesh)
    idx_spec = fit_spec(P(axis_data, None), topk_idx.shape, mesh)
    tab_specs = _table_specs(experts, mesh)

    def local_fn(tabs, x, idx, w, lay):
        lo = lax.axis_index(axis_expert) * E_local if ep > 1 else 0
        li = idx - lo
        ok = (li >= 0) & (li < E_local)
        li = jnp.where(ok, li, 0)
        wl = jnp.where(ok, w, jnp.zeros((), w.dtype))
        from mingunivision_tpu.ops.kernels.moe_stream import moe_experts_stream, stream_supported

        if interpret or (jax.default_backend() == "tpu" and stream_supported(tabs, x, li)):
            # interpret=True forces the Pallas stream path in interpreter mode
            # (CPU tests of the kernel-inside-shard_map composition)
            y = moe_experts_stream(
                tabs, x, li, wl, layer_idx=lay if stacked else None, interpret=interpret
            )
        else:
            from mingunivision_tpu.models.bailing_moe import moe_experts_dense

            t = tabs if not stacked else {k: take_weight(v, lay) for k, v in tabs.items()}
            y = moe_experts_dense(t, x, li, wl, E_local)
        return lax.psum(y, (axis_expert, axis_model))

    return shard_map(
        local_fn,
        mesh,
        in_specs=(tab_specs, row_spec, idx_spec, idx_spec, P()),
        out_specs=row_spec,
    )(experts, x_flat, topk_idx, topk_w, lay)
