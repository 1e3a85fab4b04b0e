"""Dense Qwen2-style decoder — the talker's LM core (reference wraps HF
Qwen2ForCausalLM, modeling_bailing_talker.py:58-62).

Architecture: pre-norm RMSNorm, separate q/k/v projections WITH bias, o-proj
without, GQA, 1-D RoPE, SwiGLU MLP without bias. Layers are depth-stacked and
scanned; the static `LLMCache` is shared with the Bailing-MoE engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from mingunivision_tpu.models.bailing_moe import LLMCache
from mingunivision_tpu.ops.attention import mha
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.norms import rms_norm
from mingunivision_tpu.ops.rope import apply_rope, rope_cos_sin
from mingunivision_tpu.utils.init import linear_init


@dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 184445  # 151677 text + 32768 audio codec (config.json:122-192)
    hidden_size: int = 896
    num_hidden_layers: int = 24
    num_attention_heads: int = 14
    num_key_value_heads: int = 2
    head_dim: int = 64
    intermediate_size: int = 4864
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = False
    eos_token_id: int = 151645


class TalkerCache(NamedTuple):
    llm: LLMCache


def _layer_init(key, cfg: Qwen2Config, dtype):
    ks = jax.random.split(key, 8)
    h, hd = cfg.hidden_size, cfg.head_dim
    return {
        "input_layernorm": {"w": jnp.ones((h,), dtype)},
        "attn": {
            "q_proj": linear_init(ks[0], h, cfg.num_attention_heads * hd, bias=True, dtype=dtype),
            "k_proj": linear_init(ks[1], h, cfg.num_key_value_heads * hd, bias=True, dtype=dtype),
            "v_proj": linear_init(ks[2], h, cfg.num_key_value_heads * hd, bias=True, dtype=dtype),
            "o_proj": linear_init(ks[3], cfg.num_attention_heads * hd, h, bias=False, dtype=dtype),
        },
        "post_attention_layernorm": {"w": jnp.ones((h,), dtype)},
        "mlp": {
            "gate_proj": linear_init(ks[4], h, cfg.intermediate_size, bias=False, dtype=dtype),
            "up_proj": linear_init(ks[5], h, cfg.intermediate_size, bias=False, dtype=dtype),
            "down_proj": linear_init(ks[6], cfg.intermediate_size, h, bias=False, dtype=dtype),
        },
    }


def init_qwen2_params(key, cfg: Qwen2Config, dtype=jnp.bfloat16):
    k_emb, k_layers, k_head = jax.random.split(key, 3)
    layers = jax.vmap(lambda k: _layer_init(k, cfg, dtype))(jax.random.split(k_layers, cfg.num_hidden_layers))
    p = {
        "embed_tokens": {"w": 0.02 * jax.random.normal(k_emb, (cfg.vocab_size, cfg.hidden_size), dtype)},
        "layers": layers,
        "norm": {"w": jnp.ones((cfg.hidden_size,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = linear_init(k_head, cfg.hidden_size, cfg.vocab_size, bias=False, dtype=dtype)
    return p


def qwen2_embed(params, ids):
    return jnp.take(params["embed_tokens"]["w"], ids, axis=0)


def make_qwen2_cache(cfg: Qwen2Config, batch: int, max_len: int, dtype=jnp.bfloat16) -> LLMCache:
    # head-major (L, B, Hkv, S, D), matching LLMCache
    shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
    return LLMCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32))


def qwen2_forward(params, cfg: Qwen2Config, inputs_embeds, cache: LLMCache, attn_mask, positions=None):
    """T new tokens through the stack, appending to the cache. Returns (h, cache)."""
    B, T, h = inputs_embeds.shape
    if positions is None:
        positions = jnp.broadcast_to(cache.length + jnp.arange(T)[None, :], (B, T))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    attn_mask = attn_mask.astype(bool)
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def layer(x, inp):
        p, kc, vc = inp
        hnorm = rms_norm(x, p["input_layernorm"]["w"], eps=cfg.rms_norm_eps)
        q = dense(hnorm, p["attn"]["q_proj"]).reshape(B, T, Hq, D)
        k = dense(hnorm, p["attn"]["k_proj"]).reshape(B, T, Hkv, D)
        v = dense(hnorm, p["attn"]["v_proj"]).reshape(B, T, Hkv, D)
        q, k = apply_rope(q, k, cos, sin)
        kc = lax.dynamic_update_slice(kc, k.swapaxes(1, 2).astype(kc.dtype), (0, 0, cache.length, 0))
        vc = lax.dynamic_update_slice(vc, v.swapaxes(1, 2).astype(vc.dtype), (0, 0, cache.length, 0))
        Smax = kc.shape[2]
        k_pos = jnp.arange(Smax)[None, :]
        q_pos = cache.length + jnp.arange(T)[:, None]
        allowed = jnp.logical_and((k_pos[None] <= q_pos[None, :, :]), attn_mask[:, None, :])
        a = mha(q, kc, vc, mask=allowed[:, None], scale=D**-0.5, kv_head_major=True)
        x = x + dense(a.reshape(B, T, Hq * D), p["attn"]["o_proj"])
        hnorm = rms_norm(x, p["post_attention_layernorm"]["w"], eps=cfg.rms_norm_eps)
        g = dense(hnorm, p["mlp"]["gate_proj"])
        u = dense(hnorm, p["mlp"]["up_proj"])
        x = x + dense((jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u), p["mlp"]["down_proj"])
        return x, (kc, vc)

    x, (nk, nv) = lax.scan(layer, inputs_embeds, (params["layers"], cache.k, cache.v))
    x = rms_norm(x, params["norm"]["w"], eps=cfg.rms_norm_eps)
    return x, LLMCache(nk, nv, cache.length + T)


def qwen2_logits(params, cfg: Qwen2Config, hidden):
    w = params["lm_head"]["w"] if "lm_head" in params else params["embed_tokens"]["w"].T
    return jnp.einsum("bth,hv->btv", hidden, w.astype(hidden.dtype), preferred_element_type=jnp.float32)
