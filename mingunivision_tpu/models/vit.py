"""ViT substrate: patch embedding, (causal) transformer blocks, FFN variants.

Pure functions over stacked param pytrees; the depth dimension is the leading axis
of every block parameter and the stack is traversed with `lax.scan` — one compiled
block body regardless of depth (compile-time and code-size win over the reference's
Python ModuleList loops, vision_transformer.py:225-233).

Behavior parity with mingtok/vision_transformer/layers/:
  - Block / CausalBlock (block.py:32-105, :253-327): pre-norm, no LayerScale
    (init_values=None in all builders), no drop-path at inference.
  - Attention (attention.py:33-74): fused qkv Linear(dim, 3*dim), q scaled by
    d**-0.5, softmax, proj.
  - CausalAttention (attention.py:110-176): same + KV cache append.
  - Mlp (mlp.py): fc1 -> GELU(exact) -> fc2.
  - SwiGLUFFNFused (swiglu_ffn.py:54-72): w12 fused, hidden = round8(2/3*4d).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from mingunivision_tpu.ops.activations import gelu_exact, swiglu, swiglu_hidden_dim
from mingunivision_tpu.ops.attention import mha, cached_decode_attention
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.norms import layer_norm
from mingunivision_tpu.utils.init import linear_init, trunc_normal


# ---------------------------------------------------------------------------
# Patch embedding
# ---------------------------------------------------------------------------


def extract_patches(imgs, patch_size: int):
    """(B, C, H, W) -> (B, h*w, C*p*p) in conv-weight order (c, p, q).

    Equivalent to torch Conv2d(k=p, stride=p) im2col; matches PatchEmbed
    (layers/patch_embed.py:26-69) followed by flatten(2).transpose(1, 2).
    """
    B, C, H, W = imgs.shape
    p = patch_size
    h, w = H // p, W // p
    x = imgs.reshape(B, C, h, p, w, p)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))  # B h w c p q
    return x.reshape(B, h * w, C * p * p)


def patch_embed_init(key, patch_size, in_chans, embed_dim, dtype=jnp.float32):
    return linear_init(key, in_chans * patch_size * patch_size, embed_dim, bias=True, dtype=dtype)


def patch_embed_apply(params, imgs, patch_size: int):
    return dense(extract_patches(imgs, patch_size), params)


# ---------------------------------------------------------------------------
# FFN variants
# ---------------------------------------------------------------------------


def mlp_init(key, dim, hidden, bias=True, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, dim, hidden, bias=bias, dtype=dtype),
        "fc2": linear_init(k2, hidden, dim, bias=bias, dtype=dtype),
    }


def mlp_apply(params, x):
    return dense(gelu_exact(dense(x, params["fc1"])), params["fc2"])


def swiglu_init(key, dim, hidden, bias=True, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "w12": linear_init(k1, dim, 2 * hidden, bias=bias, dtype=dtype),
        "w3": linear_init(k2, hidden, dim, bias=bias, dtype=dtype),
    }


def swiglu_apply(params, x):
    return dense(swiglu(dense(x, params["w12"])), params["w3"])


def ffn_apply(params, x, ffn_layer: str):
    if ffn_layer in ("swiglufused", "swiglu"):
        return swiglu_apply(params, x)
    return mlp_apply(params, x)


def ffn_init(key, dim, mlp_ratio: float, ffn_layer: str, bias=True, dtype=jnp.float32):
    hidden = int(dim * mlp_ratio)
    if ffn_layer in ("swiglufused", "swiglu"):
        return swiglu_init(key, dim, swiglu_hidden_dim(hidden), bias=bias, dtype=dtype)
    return mlp_init(key, dim, hidden, bias=bias, dtype=dtype)


# ---------------------------------------------------------------------------
# Block (bidirectional / causal, with optional static KV cache)
# ---------------------------------------------------------------------------


class ViTCache(NamedTuple):
    """Static-shape KV cache for the causal semantic decoder.

    k, v: (depth, B, num_heads, max_len, head_dim) HEAD-MAJOR (matches LLMCache;
    sequence innermost streams without relayout); length: int32 scalar = number
    of positions already written. Replaces HF DynamicCache
    (vision_transformer.py:395-429) with a functional fixed-shape design.
    """

    k: jax.Array
    v: jax.Array
    length: jax.Array

    @classmethod
    def create(cls, depth, batch, max_len, num_heads, head_dim, dtype=jnp.bfloat16):
        shape = (depth, batch, num_heads, max_len, head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32))


def block_init(key, dim, num_heads, mlp_ratio, ffn_layer, *, qkv_bias=True, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "attn": {
            "qkv": linear_init(ks[0], dim, 3 * dim, bias=qkv_bias, dtype=dtype),
            "proj": linear_init(ks[1], dim, dim, bias=True, dtype=dtype),
        },
        "norm2": {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "mlp": ffn_init(ks[2], dim, mlp_ratio, ffn_layer, dtype=dtype),
    }
    return p


def stacked_block_init(key, depth, dim, num_heads, mlp_ratio, ffn_layer, *, qkv_bias=True, dtype=jnp.float32):
    keys = jax.random.split(key, depth)
    # vmapped init allocates the depth-stacked arrays directly (no 2x peak)
    return jax.vmap(lambda k: block_init(k, dim, num_heads, mlp_ratio, ffn_layer, qkv_bias=qkv_bias, dtype=dtype))(keys)


def _qkv(params, x, num_heads: int):
    B, N, C = x.shape
    D = C // num_heads
    qkv = dense(x, params["attn"]["qkv"]).reshape(B, N, 3, num_heads, D)
    return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]


def _maybe_scale(params, name, y):
    """LayerScale (layers/layer_scale.py) — present only when a checkpoint was
    trained with init_values (none of the shipped MingTok towers are)."""
    if name in params:
        return y * params[name]["gamma"].astype(y.dtype)
    return y


def _attn_flash_headmajor(params, h, num_heads: int):
    """qkv -> flash -> out-proj with NO token/head transpose passes: the
    projections are einsummed straight to/from the kernel's (B, H, N, D)
    layout (a separate (B,N,H,D)->(B,H,N,D) relayout costs more than the
    kernel itself at the pixel-decoder shape; BENCHMARKS "ViT flash
    attention")."""
    from mingunivision_tpu.ops.kernels.flash import flash_vit_attention

    B, N, C = h.shape
    H = num_heads
    D = C // H
    ap = params["attn"]
    wq = ap["qkv"]["w"].reshape(C, 3, H, D)
    qkv = jnp.einsum("bnc,cshd->sbhnd", h, wq.astype(h.dtype), preferred_element_type=jnp.float32)
    if "b" in ap["qkv"]:
        qkv = qkv + ap["qkv"]["b"].astype(jnp.float32).reshape(3, 1, H, 1, D)
    qkv = qkv.astype(h.dtype)
    out = flash_vit_attention(qkv[0], qkv[1], qkv[2], scale=D**-0.5)  # (B, H, N, D)
    wo = ap["proj"]["w"].reshape(H, D, C)
    y = jnp.einsum("bhnd,hdc->bnc", out, wo.astype(h.dtype), preferred_element_type=jnp.float32)
    if "b" in ap["proj"]:
        y = y + ap["proj"]["b"].astype(jnp.float32)
    return y.astype(h.dtype)


def block_apply(params, x, *, num_heads: int, ffn_layer: str, is_causal: bool = False, ln_eps: float = 1e-6):
    """One full-sequence transformer block (no cache)."""
    from mingunivision_tpu.ops.kernels.flash import flash_vit_usable

    h = layer_norm(x, params["norm1"]["w"], params["norm1"]["b"], eps=ln_eps)
    if not is_causal and flash_vit_usable(x.shape[1], x.dtype):
        a = _attn_flash_headmajor(params, h, num_heads)
    else:
        q, k, v = _qkv(params, h, num_heads)
        a = mha(q, k, v, is_causal=is_causal)
        a = dense(a.reshape(x.shape), params["attn"]["proj"])
    x = x + _maybe_scale(params, "ls1", a)
    h = layer_norm(x, params["norm2"]["w"], params["norm2"]["b"], eps=ln_eps)
    return x + _maybe_scale(params, "ls2", ffn_apply(params["mlp"], h, ffn_layer))


def run_blocks(stacked_params, x, *, num_heads: int, ffn_layer: str, is_causal: bool = False, ln_eps: float = 1e-6, remat: bool = False):
    """Scan the stacked block params over the sequence. remat=True
    rematerializes each block in the backward pass (training memory knob —
    same trick as BailingMoeConfig.remat_layers)."""

    def body(carry, p):
        return block_apply(p, carry, num_heads=num_heads, ffn_layer=ffn_layer, is_causal=is_causal, ln_eps=ln_eps), None

    out, _ = lax.scan(jax.checkpoint(body) if remat else body, x, stacked_params)
    return out


def run_blocks_with_intermediates(stacked_params, x, *, num_heads: int, ffn_layer: str, is_causal: bool = False, ln_eps: float = 1e-6):
    """Like run_blocks, also returning every block's output stacked on a leading
    depth axis (BlockChunk.forward_with_mid_feats / get_intermediate_layers
    surface, vision_transformer.py:41-48, :453-477)."""

    def body(carry, p):
        y = block_apply(p, carry, num_heads=num_heads, ffn_layer=ffn_layer, is_causal=is_causal, ln_eps=ln_eps)
        return y, y

    out, mids = lax.scan(body, x, stacked_params)
    return out, mids


def block_apply_cached(params, x, k_cache, v_cache, length, *, num_heads: int, ffn_layer: str, ln_eps: float = 1e-6):
    """Causal block with static KV cache; writes T new positions at `length`.

    k_cache/v_cache: (B, H, max_len, D) head-major for THIS layer.
    Returns (y, new_k, new_v).
    """
    B, T, C = x.shape
    h = layer_norm(x, params["norm1"]["w"], params["norm1"]["b"], eps=ln_eps)
    q, k, v = _qkv(params, h, num_heads)
    k_cache = lax.dynamic_update_slice(k_cache, k.swapaxes(1, 2).astype(k_cache.dtype), (0, 0, length, 0))
    v_cache = lax.dynamic_update_slice(v_cache, v.swapaxes(1, 2).astype(v_cache.dtype), (0, 0, length, 0))
    if T == 1:
        a = cached_decode_attention(q, k_cache, v_cache, length + 1, kv_head_major=True)
    else:
        Smax = k_cache.shape[2]
        q_pos = length + jnp.arange(T)[:, None]
        k_pos = jnp.arange(Smax)[None, :]
        mask = (k_pos <= q_pos)[None, None]  # causal within valid region
        a = mha(q, k_cache, v_cache, mask=mask, kv_head_major=True)
    a = dense(a.reshape(B, T, C), params["attn"]["proj"])
    x = x + a
    h = layer_norm(x, params["norm2"]["w"], params["norm2"]["b"], eps=ln_eps)
    return x + ffn_apply(params["mlp"], h, ffn_layer), k_cache, v_cache


def block_apply_cached_rows(params, x, k_cache, v_cache, write_pos, *, num_heads: int, ffn_layer: str, ln_eps: float = 1e-6):
    """`block_apply_cached` for T=1 with PER-ROW write positions.

    Rows of a continuous-batching pool sit at different sequence offsets
    (engine/image_pool.py); `write_pos` (B,) int32 is each row's own KV write
    index. k_cache/v_cache: (B, H, max_len, D) head-major for THIS layer.
    """
    B, T, C = x.shape
    assert T == 1, "row-position cached step is single-token"
    h = layer_norm(x, params["norm1"]["w"], params["norm1"]["b"], eps=ln_eps)
    q, k, v = _qkv(params, h, num_heads)  # (B, 1, H, D)
    rows = jnp.arange(B)[:, None]
    hidx = jnp.arange(k_cache.shape[1])[None, :]
    k_cache = k_cache.at[rows, hidx, write_pos[:, None]].set(k[:, 0].astype(k_cache.dtype))
    v_cache = v_cache.at[rows, hidx, write_pos[:, None]].set(v[:, 0].astype(v_cache.dtype))
    a = cached_decode_attention(q, k_cache, v_cache, write_pos + 1, kv_head_major=True)
    x = x + dense(a.reshape(B, T, C), params["attn"]["proj"])
    h = layer_norm(x, params["norm2"]["w"], params["norm2"]["b"], eps=ln_eps)
    return x + ffn_apply(params["mlp"], h, ffn_layer), k_cache, v_cache


def run_blocks_cached_rows(stacked_params, x, k, v, write_pos, *, num_heads: int, ffn_layer: str, ln_eps: float = 1e-6):
    """Scan causal blocks with per-row write positions (pool decode).

    k/v: (depth, B, H, max_len, D) stacked caches; write_pos: (B,) int32.
    Returns (y, new_k, new_v) — the caller owns the per-row length bookkeeping
    (a scalar ViTCache.length cannot represent rows at different offsets).
    """

    def body(carry, inp):
        p, kc, vc = inp
        y, nk, nv = block_apply_cached_rows(
            p, carry, kc, vc, write_pos, num_heads=num_heads, ffn_layer=ffn_layer, ln_eps=ln_eps
        )
        return y, (nk, nv)

    out, (nk, nv) = lax.scan(body, x, (stacked_params, k, v))
    return out, nk, nv


def run_blocks_cached(stacked_params, x, cache: ViTCache, *, num_heads: int, ffn_layer: str, ln_eps: float = 1e-6):
    """Scan causal blocks with the stacked cache; returns (y, new_cache)."""

    def body(carry, inp):
        p, kc, vc = inp
        y, nk, nv = block_apply_cached(
            p, carry, kc, vc, cache.length, num_heads=num_heads, ffn_layer=ffn_layer, ln_eps=ln_eps
        )
        return y, (nk, nv)

    out, (nk, nv) = lax.scan(body, x, (stacked_params, cache.k, cache.v))
    new_cache = ViTCache(nk, nv, cache.length + x.shape[1])
    return out, new_cache
