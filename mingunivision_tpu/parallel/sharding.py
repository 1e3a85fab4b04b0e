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


def llm_param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, llm_param_spec(path)), params
    )


def shard_llm_params(params, mesh: Mesh):
    """Place LLM params onto the mesh with the layout above."""
    shardings = llm_param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def cache_sharding(mesh: Mesh):
    """KV cache (L, B, S, Hkv, D): kv-heads over `model`, batch over `data`."""
    from mingunivision_tpu.models.bailing_moe import LLMCache

    kv = NamedSharding(mesh, P(None, "data", None, "model", None))
    return LLMCache(kv, kv, NamedSharding(mesh, P()))


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
            return NamedSharding(mesh, P(None, None, "model") if x.ndim == 3 else P(None, "model"))
        if "attn.proj.w" in s or "mlp.w3.w" in s or "mlp.fc2.w" in s:
            return NamedSharding(mesh, P(None, "model", None) if x.ndim == 3 else P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)
