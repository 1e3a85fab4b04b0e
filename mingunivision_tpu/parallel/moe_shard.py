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

import functools

import jax
import jax.numpy as jnp
import numpy as np
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
    """Static predicate for the shard_map stream path. int4 requires SHARD-
    LOCAL split-halves packing of down_proj (groups == model shards, see
    utils/quantize.quantize_tree(model_shards=)); globally-packed int4 is
    excluded (the pack pairs rows across the model-shard boundary). The LOCAL
    shard shapes must satisfy the stream kernel's alignment (d % 128,
    local m % 128)."""
    ws = (experts["gate_proj"], experts["up_proj"], experts["down_proj"])
    ep = mesh.shape.get("expert", 1)
    mp = mesh.shape.get("model", 1)
    if any(isinstance(w, QuantizedArray) and getattr(w, "scheme", "linear") != "linear" for w in ws):
        return False  # NF4 codebook tables ride the XLA dequant paths
    if any(isinstance(w, QuantizedArray) and w.bits == 4 for w in ws):
        if not all(isinstance(w, QuantizedArray) and w.bits == 4 for w in ws):
            return False
        dp = experts["down_proj"]
        if dp.groups != mp or any(
            experts[n].groups != 1 for n in ("gate_proj", "up_proj")
        ):
            return False
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
    quant4 = all(isinstance(w, QuantizedArray) and w.bits == 4 for w in ws)
    if not (plain or quant8 or quant4):
        return False
    from mingunivision_tpu.ops.kernels.moe_stream import (
        MAX_STREAM_SLOTS,
        MAX_STREAM_SLOTS_QUANT,
        PALLAS_TPU,
    )

    E_l, d_l, m_l = _gate_array(probe).shape[-3:]
    if quant4:
        d_l *= 2  # gate q packs along h; local m from the unpacked gate cols
        if m_l % 2:
            return False
    N, k = topk_idx.shape
    cap = MAX_STREAM_SLOTS_QUANT if (quant8 or quant4) else MAX_STREAM_SLOTS
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
        # each device's local block of a shard-packed (groups == mp) int4 table
        # is a plain single-group packed table — rewrap so the kernel (and the
        # dense fallback's dequant) read it with groups=1 semantics
        tabs = {
            k: (QuantizedArray(v.q, v.s, v.bits) if isinstance(v, QuantizedArray) else v)
            for k, v in tabs.items()
        }
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


# ---------------------------------------------------------------------------
# Sharded fused SwiGLU-gmm PREFILL (VERDICT r2 #3)
# ---------------------------------------------------------------------------


def sharded_swiglu_gmm_supported(mesh: Mesh, experts, x_flat, topk_idx) -> bool:
    """Static predicate for the shard_map fused-prefill path. Same layout rules
    as the decode stream wrapper; additionally the LOCAL shard must satisfy the
    fused kernel's alignment (h % 128, local m % 128, and for int4 the local
    half-planes 8-aligned)."""
    from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import (
        SWIGLU_GMM_AVAILABLE,
        swiglu_gmm_supported,
    )

    if not SWIGLU_GMM_AVAILABLE:
        return False
    ws = (experts["gate_proj"], experts["up_proj"], experts["down_proj"])
    ep = mesh.shape.get("expert", 1)
    mp = mesh.shape.get("model", 1)
    ga = _gate_array(experts)
    E, m = ga.shape[-3], ga.shape[-1]
    if E % ep or m % mp:
        return False
    if any(isinstance(w, QuantizedArray) and getattr(w, "scheme", "linear") != "linear" for w in ws):
        return False  # NF4 codebook tables ride the XLA dequant paths
    if any(isinstance(w, QuantizedArray) and w.bits == 4 for w in ws):
        if not all(isinstance(w, QuantizedArray) and w.bits == 4 for w in ws):
            return False
        # int4 down_proj needs SHARD-LOCAL split-halves packing (groups ==
        # model shards): globally-packed rows don't slice along the model axis.
        # gate/up pack along the UNSHARDED h contraction dim -> groups == 1.
        if experts["down_proj"].groups != mp or any(
            experts[n].groups != 1 for n in ("gate_proj", "up_proj")
        ):
            return False

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
    # swiglu_gmm_supported reads isinstance(jnp.ndarray) on dense leaves; probe
    # leaves are ShapeDtypeStructs, so re-derive the dense check ourselves
    if all(not isinstance(w, QuantizedArray) for w in ws):
        E_l, h_l, m_l = probe["gate_proj"].shape[-3:]
        return h_l % 128 == 0 and m_l % 128 == 0
    return swiglu_gmm_supported(probe, x_flat)


def moe_experts_swiglu_gmm_sharded(
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
    tm: int = 256,
    interpret: bool = False,
    force_dense: bool = False,
):
    """Sharded PREFILL MoE dispatch through the fused SwiGLU grouped-matmul.

    Same manual-SPMD scheme as the decode stream wrapper: shard_map gives each
    device its local (expert, model) table block; expert ids are LOCALIZED —
    assignments owned by other expert shards map to a dummy group past the last
    local expert (they sort to the tail and their kernel output rows, which the
    grouped schedule never visits/stores, are zeroed before the combine); the
    fused kernel runs per device over its local experts' columns/rows of the
    expert FFN, and a psum over (expert, model) combines (column x row split —
    partial down-proj outputs sum exactly).

    vs the GSPMD masked-dense fallback this keeps the 3.4-3.6x fused-kernel
    advantage measured at 4096 tokens (BENCHMARKS "Fused swiglu-gmm") under
    sharding. Reference bar: vLLM runs its FusedMoE kernel under TP
    (vllm/ming_lite.patch:595-661)."""
    E = _gate_array(experts).shape[-3]
    num_experts = num_experts or E
    ep = mesh.shape.get(axis_expert, 1)
    mp = mesh.shape.get(axis_model, 1)
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
        # out-of-shard assignments -> dummy group E_local: they sort to the TAIL
        # of the expert-sorted rows, the grouped schedule (num_nonzero_groups ==
        # E_local) never stores them, and we zero them post-kernel
        li = jnp.where(ok, li, E_local)
        wl = jnp.where(ok, w, jnp.zeros((), w.dtype))

        t = tabs if not stacked else {k: take_weight(v, lay) for k, v in tabs.items()}
        # shard-local int4 tables are a plain single-group packing
        t = {
            k: (QuantizedArray(v.q, v.s, v.bits) if isinstance(v, QuantizedArray) else v)
            for k, v in t.items()
        }

        N, k_ = idx.shape
        A = N * k_
        A_pad = ((A + tm - 1) // tm) * tm
        flat_e = li.reshape(-1)
        order = jnp.argsort(flat_e, stable=True)
        token_idx = order // k_
        xs = jnp.take(x, token_idx, axis=0)
        # only the E_local REAL groups; dummy rows fall past sum(group_sizes)
        group_sizes = jnp.bincount(flat_e, length=E_local + 1)[:E_local].astype(jnp.int32)
        if A_pad != A:
            xs = jnp.concatenate([xs, jnp.zeros((A_pad - A, xs.shape[1]), xs.dtype)], axis=0)

        from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import swiglu_gmm, swiglu_gmm_quant

        use_kernel = (not force_dense) and (interpret or jax.default_backend() == "tpu")
        if use_kernel and isinstance(t["gate_proj"], QuantizedArray):
            ys = swiglu_gmm_quant(
                xs, t["gate_proj"], t["up_proj"], t["down_proj"], group_sizes,
                tm=tm, interpret=interpret,
            )
        elif use_kernel:
            ys = swiglu_gmm(
                xs,
                t["gate_proj"].astype(xs.dtype),
                t["up_proj"].astype(xs.dtype),
                t["down_proj"].astype(xs.dtype),
                group_sizes,
                tm=tm, interpret=interpret,
            )
        else:  # non-TPU parity path (virtual-mesh tests without interpret)
            from mingunivision_tpu.models.bailing_moe import moe_experts_dense

            y = moe_experts_dense(t, x, jnp.where(ok, li, 0), wl, E_local)
            return lax.psum(y, (axis_expert, axis_model))

        # rows past sum(group_sizes) (dummy + pad) were never stored: zero them
        sorted_ok = jnp.take(ok.reshape(-1), order)
        if A_pad != A:
            sorted_ok = jnp.concatenate([sorted_ok, jnp.zeros((A_pad - A,), bool)])
        ys = jnp.where(sorted_ok[:, None], ys, 0)[:A]
        inv = jnp.argsort(order, stable=True)
        per = jnp.take(ys, inv, axis=0).reshape(N, k_, -1)
        y = jnp.einsum("nkh,nk->nh", per.astype(jnp.float32), wl.astype(jnp.float32)).astype(x.dtype)
        return lax.psum(y, (axis_expert, axis_model))

    return shard_map(
        local_fn,
        mesh,
        in_specs=(tab_specs, row_spec, idx_spec, idx_spec, P()),
        out_specs=row_spec,
    )(experts, x_flat, topk_idx, topk_w, lay)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 5, 6, 7))
def moe_experts_swiglu_gmm_sharded_ad(
    mesh, experts, x_flat, topk_idx, topk_w, num_experts: int, tm: int, interpret: bool = False
):
    """Differentiable sharded fused-prefill entry (bf16 per-layer tables).

    The shard_map'd Pallas kernel has no JVP rule, so a sharded TPU TRAINING
    forward through `moe_experts_swiglu_gmm_sharded` would crash under
    jax.grad. Forward = the fused sharded kernel; backward differentiates the
    SAME wrapper with `force_dense=True` — the masked-dense local compute +
    psum path (virtual-mesh validated), whose autodiff transposes the expert/
    model psums correctly, so gradients stay sharded (local table cotangents +
    collectives) rather than forcing a global all-gather. Mirrors the
    unsharded `moe_experts_swiglu_gmm_ad` (ops/kernels/moe_swiglu_gmm.py)."""
    return moe_experts_swiglu_gmm_sharded(
        mesh, experts, x_flat, topk_idx, topk_w, num_experts=num_experts, tm=tm, interpret=interpret
    )


def _sharded_ad_fwd(mesh, experts, x_flat, topk_idx, topk_w, num_experts: int, tm: int, interpret: bool = False):
    y = moe_experts_swiglu_gmm_sharded(
        mesh, experts, x_flat, topk_idx, topk_w, num_experts=num_experts, tm=tm, interpret=interpret
    )
    return y, (experts, x_flat, topk_idx, topk_w)


def _sharded_ad_bwd(mesh, num_experts: int, tm: int, interpret: bool, res, g):
    experts, x_flat, topk_idx, topk_w = res

    def ref(e, x, w):
        return moe_experts_swiglu_gmm_sharded(
            mesh, e, x, topk_idx, w, num_experts=num_experts, tm=tm, force_dense=True
        )

    _, vjp = jax.vjp(ref, experts, x_flat, topk_w)
    ge, gx, gw = vjp(g)
    gidx = np.zeros(topk_idx.shape, dtype=jax.dtypes.float0)
    return ge, gx, gidx, gw


moe_experts_swiglu_gmm_sharded_ad.defvjp(_sharded_ad_fwd, _sharded_ad_bwd)
