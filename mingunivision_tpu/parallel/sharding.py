"""Sharding rules: how each param / cache / activation maps onto the mesh.

Replaces the reference's vLLM parallel-linear classes (QKVParallelLinear,
RowParallelLinear, MergedColumnParallelLinear, VocabParallelEmbedding — vllm
patch :468-661, :901-1067) with GSPMD annotations: we state WHERE tensors live,
XLA inserts the psum/all-gather over ICI.

Layout (mesh axes data/expert/model):
  - attention: fused QKV column-sharded over `model` (heads split),
    output projection row-sharded over `model` (psum on exit)
  - MoE experts: expert dim over `expert`, per-expert hidden dim over `model`
    (so v5e-8 = (1, 2, 4) holds 16B bf16: 32 experts/shard, each half-width)
  - shared experts + dense FFN: column/row over `model`
  - embeddings / lm_head: vocab over `model`
  - KV cache: kv-heads over `model` (4 kv heads -> up to 4-way), batch over `data`
  - router gates + norms: replicated
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return ".".join(parts)


# (substring of dotted path) -> PartitionSpec for LLM params. Layer params have a
# leading depth axis from the lax.scan stack -> every spec starts with None.
_LLM_RULES = [
    ("attention.query_key_value.w", P(None, None, "model")),
    ("attention.dense.w", P(None, "model", None)),
    ("mlp.experts.gate_proj", P(None, "expert", None, "model")),
    ("mlp.experts.up_proj", P(None, "expert", None, "model")),
    ("mlp.experts.down_proj", P(None, "expert", "model", None)),
    ("mlp.shared_experts.gate_proj.w", P(None, None, "model")),
    ("mlp.shared_experts.up_proj.w", P(None, None, "model")),
    ("mlp.shared_experts.down_proj.w", P(None, "model", None)),
    ("word_embeddings.w", P("model", None)),
    ("lm_head.w", P(None, "model")),
]


def llm_param_spec(path) -> P:
    s = _path_str(path)
    for frag, spec in _LLM_RULES:
        if frag in s:
            return spec
    return P()  # replicate (norms, gates, biases)


def fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Adapt a rule PartitionSpec to a concrete leaf shape: drop sharded axes
    that don't divide the dim (quantized-scale leaves have size-1 contraction
    dims; int4 packs halve the contraction dim). Rank mismatch -> replicate."""
    if len(spec) > len(shape):
        return P()
    out = []
    for d, name in enumerate(spec):
        if name is None:
            out.append(None)
            continue
        names = name if isinstance(name, tuple) else (name,)
        size = 1
        for n in names:
            size *= mesh.shape[n]
        out.append(name if shape[d] % size == 0 else None)
    return P(*out)


def llm_param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, fit_spec(llm_param_spec(path), x.shape, mesh)), params
    )


def shard_llm_params(params, mesh: Mesh):
    """Place LLM params onto the mesh with the layout above."""
    shardings = llm_param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def cache_sharding(mesh: Mesh, cache=None):
    """KV cache (L, B, Hkv, S, D) head-major: kv-heads over `model`, batch over
    `data`.

    With a concrete `cache`, the spec is fitted to its shapes (batch 1 or
    odd kv-head counts fall back to replication on that axis)."""
    from mingunivision_tpu.models.bailing_moe import LLMCache

    spec = P(None, "data", "model", None, None)
    if cache is not None:
        spec = fit_spec(spec, cache.k.shape, mesh)
    kv = NamedSharding(mesh, spec)
    return LLMCache(kv, kv, NamedSharding(mesh, P()))


def shard_cache(cache, mesh: Mesh):
    return jax.device_put(cache, cache_sharding(mesh, cache))


def batch_state_sharding(mesh: Mesh, state):
    """Shardings for engine.batch_engine.BatchState: KV like the LLM cache
    (slots over `data`, kv-heads over `model`), per-slot vectors over `data`.
    Axes that don't divide fall back to replication (fit_spec)."""
    kv = NamedSharding(mesh, fit_spec(P(None, "data", "model", None, None), state.k.shape, mesh))
    row = NamedSharding(mesh, fit_spec(P("data", None), state.mask.shape, mesh))
    vec = NamedSharding(mesh, fit_spec(P("data"), state.lengths.shape, mesh))
    samp = type(state.sampling)(*(vec for _ in state.sampling))
    # keyword construction: immune to BatchState field reordering
    return type(state)(k=kv, v=kv, mask=row, lengths=vec, cur=vec, active=vec, sampling=samp)


def shard_batch_state(state, mesh: Mesh):
    return jax.device_put(state, batch_state_sharding(mesh, state))


def image_pool_state_sharding(mesh: Mesh, state):
    """Shardings for engine.image_pool.ImagePoolState: CFG rows over `data`,
    kv-heads over `model` (LLM cache layout), per-slot vectors over `data`.
    rf_sample's block-slice/concat over rows compiles to GSPMD collectives;
    non-dividing axes fall back to replication (fit_spec)."""
    kv = NamedSharding(mesh, fit_spec(P(None, "data", "model", None, None), state.k.shape, mesh))
    row = NamedSharding(mesh, fit_spec(P("data", None), state.masks.shape, mesh))
    vec = NamedSharding(mesh, fit_spec(P("data"), state.lengths.shape, mesh))
    emb = NamedSharding(mesh, fit_spec(P("data", None, None), state.embeds.shape, mesh))
    sem = NamedSharding(mesh, fit_spec(P("data", None, None), state.sem_tokens.shape, mesh))
    sem_kv = NamedSharding(mesh, fit_spec(P(None, "data", "model", None, None), state.sem_k.shape, mesh))
    slot_mat = NamedSharding(mesh, fit_spec(P("data", None), state.last_hidden.shape, mesh))
    keys = NamedSharding(mesh, fit_spec(P("data", None), state.rf_keys.shape, mesh))
    return type(state)(
        k=kv, v=kv, masks=row, lengths=vec, iters=vec, active=vec, embeds=emb,
        sem_tokens=sem, sem_k=sem_kv, sem_v=sem_kv, last_hidden=slot_mat,
        rf_keys=keys, text_cfg=vec, image_cfg=vec, temperature=vec,
    )


def shard_image_pool_state(state, mesh: Mesh):
    return jax.device_put(state, image_pool_state_sharding(mesh, state))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def mingtok_param_shardings(params, mesh: Mesh):
    """MingTok ViTs: model-parallel over FFN hidden + attention heads.

    At 700M params MingTok usually stays replicated; these specs matter when
    serving it colocated with the sharded LLM.
    """
    def spec(path, x):
        s = _path_str(path)
        if "attn.qkv.w" in s or "mlp.w12.w" in s or "mlp.fc1.w" in s:
            raw = P(None, None, "model") if x.ndim == 3 else P(None, "model")
        elif "attn.proj.w" in s or "mlp.w3.w" in s or "mlp.fc2.w" in s:
            raw = P(None, "model", None) if x.ndim == 3 else P("model", None)
        else:
            raw = P()
        return NamedSharding(mesh, fit_spec(raw, x.shape, mesh))

    return jax.tree_util.tree_map_with_path(spec, params)


def mm_param_shardings(params, mesh: Mesh):
    """Shardings for the FULL MingUniVision param tree
    {llm, mingtok, rf_head, vis_head, linear_proj}: the 16B LLM carries the
    memory (TP/EP per _LLM_RULES); MingTok gets its ViT TP specs; the small
    heads (rf_head ~100M, vis_head, linear_proj) replicate.

    This is the TPU answer to the reference's vLLM TP serving path
    (vllm/ming_lite.patch:468-661): one placement call instead of parallel
    linear classes."""
    repl = NamedSharding(mesh, P())
    out = {}
    for key, sub in params.items():
        if key == "llm":
            out[key] = llm_param_shardings(sub, mesh)
        elif key == "mingtok":
            out[key] = mingtok_param_shardings(sub, mesh)
        else:
            out[key] = jax.tree_util.tree_map(lambda x: repl, sub)
    return out


def shard_mm_params(params, mesh: Mesh):
    """Place the full composed param tree onto the mesh."""
    shardings = mm_param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
