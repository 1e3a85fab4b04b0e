"""Checkpoint-exact UpsampleConformerEncoder (the flow's text encoder).

The reference's audio detokenizer (external `audio_detokenizer` wheel driven by
modeling_bailing_talker.py:553-568) uses the public CosyVoice2 flow: its
encoder is an UpsampleConformerEncoder — linear embed with ESPnet relative
positional encoding, a PreLookaheadLayer (right-context conv), 6 conformer
blocks (rel-pos self-attention + ReLU FFN, no conv module / no macaron), a 2x
nearest-upsample conv (token_mel_ratio), then 4 more blocks and a final
LayerNorm. This is a from-scratch JAX implementation of that exact layout;
`utils.convert.flow_params_from_torch` maps real state dicts onto it.

TPU-first: both block stacks are depth-stacked and `lax.scan`ned; the rel-shift
is the standard Transformer-XL pad/reshape (static shapes, fuses under jit).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from mingunivision_tpu.ops.conv import conv1d, conv1d_init
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.norms import layer_norm
from mingunivision_tpu.utils.init import linear_init


@dataclass(frozen=True)
class UpsampleConformerConfig:
    input_size: int = 512
    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    num_up_blocks: int = 4
    pre_lookahead_len: int = 3
    up_stride: int = 2  # token_mel_ratio
    static_chunk_size: int = 25  # streaming attention chunk (tokens)
    ln_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.output_size // self.attention_heads


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _block_init(key, cfg: UpsampleConformerConfig, dtype):
    ks = jax.random.split(key, 7)
    d, hd, H = cfg.output_size, cfg.head_dim, cfg.attention_heads
    return {
        "self_attn": {
            "linear_q": linear_init(ks[0], d, d, bias=True, dtype=dtype),
            "linear_k": linear_init(ks[1], d, d, bias=True, dtype=dtype),
            "linear_v": linear_init(ks[2], d, d, bias=True, dtype=dtype),
            "linear_out": linear_init(ks[3], d, d, bias=True, dtype=dtype),
            "linear_pos": linear_init(ks[4], d, d, bias=False, dtype=dtype),
            "pos_bias_u": jnp.zeros((H, hd), dtype),
            "pos_bias_v": jnp.zeros((H, hd), dtype),
        },
        "feed_forward": {
            "w_1": linear_init(ks[5], d, cfg.linear_units, bias=True, dtype=dtype),
            "w_2": linear_init(ks[6], cfg.linear_units, d, bias=True, dtype=dtype),
        },
        "norm_mha": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        "norm_ff": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
    }


def _embed_init(key, cfg: UpsampleConformerConfig, dtype):
    d = cfg.output_size
    return {
        "linear": linear_init(key, cfg.input_size, d, bias=True, dtype=dtype),
        "norm": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
    }


def init_upsample_conformer_params(key, cfg: UpsampleConformerConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    d = cfg.output_size
    blocks = [_block_init(k, cfg, dtype) for k in jax.random.split(ks[0], cfg.num_blocks)]
    up_blocks = [_block_init(k, cfg, dtype) for k in jax.random.split(ks[1], cfg.num_up_blocks)]
    stack = lambda ts: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ts)
    return {
        "embed": _embed_init(ks[2], cfg, dtype),
        "pre_lookahead": {
            "conv1": conv1d_init(ks[3], d, d, cfg.pre_lookahead_len + 1, dtype),
            "conv2": conv1d_init(ks[4], d, d, 3, dtype),
        },
        "encoders": stack(blocks),
        "up_layer": {"conv": conv1d_init(ks[5], d, d, cfg.up_stride * 2 + 1, dtype)},
        "up_embed": _embed_init(ks[6], cfg, dtype),
        "up_encoders": stack(up_blocks),
        "after_norm": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
    }


# ---------------------------------------------------------------------------
# ESPnet relative positional encoding + attention
# ---------------------------------------------------------------------------


def espnet_rel_pos_emb(T: int, d: int, dtype=jnp.float32):
    """(2T-1, d) embedding for relative positions T-1 .. -(T-1) (descending)."""
    pos = jnp.arange(T - 1, -T, -1, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d, 2, dtype=jnp.float32) * -(math.log(10000.0) / d))
    pe = jnp.zeros((2 * T - 1, d), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe.astype(dtype)


def _rel_shift(x):
    """Transformer-XL shift: (B, H, T, 2T-1) scores over relative positions ->
    (B, H, T, T) absolute-position scores."""
    B, H, T, P = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(B, H, P + 1, T)
    x = x[:, :, 1:].reshape(B, H, T, P)
    return x[..., : (P + 1) // 2]


def rel_pos_attention(p, x, pos_emb, attn_mask, num_heads: int):
    """wenet RelPositionMultiHeadedAttention. x: (B, T, D), pos_emb: (2T-1, D),
    attn_mask: (T, T) bool or None (full)."""
    B, T, D = x.shape
    H = num_heads
    dk = D // H
    q = dense(x, p["linear_q"]).reshape(B, T, H, dk)
    k = dense(x, p["linear_k"]).reshape(B, T, H, dk)
    v = dense(x, p["linear_v"]).reshape(B, T, H, dk)
    pos = dense(pos_emb, p["linear_pos"]).reshape(-1, H, dk)
    qu = q + p["pos_bias_u"][None, None]
    qv = q + p["pos_bias_v"][None, None]
    ac = jnp.einsum("bthd,bshd->bhts", qu, k)
    bd = _rel_shift(jnp.einsum("bthd,phd->bhtp", qv, pos))
    scores = (ac + bd).astype(jnp.float32) / math.sqrt(dk)
    if attn_mask is not None:
        scores = jnp.where(attn_mask[None, None], scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, D)
    return dense(out, p["linear_out"])


def _conformer_block(x, p, pos_emb, attn_mask, cfg: UpsampleConformerConfig):
    """Pre-norm MHA + ReLU FFN (use_cnn_module=False, macaron_style=False)."""
    y = layer_norm(x, p["norm_mha"]["w"], p["norm_mha"]["b"], eps=cfg.ln_eps)
    x = x + rel_pos_attention(p["self_attn"], y, pos_emb, attn_mask, cfg.attention_heads)
    y = layer_norm(x, p["norm_ff"]["w"], p["norm_ff"]["b"], eps=cfg.ln_eps)
    h = jax.nn.relu(dense(y, p["feed_forward"]["w_1"]).astype(jnp.float32)).astype(x.dtype)
    return x + dense(h, p["feed_forward"]["w_2"])


def chunk_causal_mask(T: int, chunk: int):
    """(T, T) bool: position t attends to s < (t//chunk + 1)*chunk."""
    t = jnp.arange(T)
    limit = (t // chunk + 1) * chunk
    return jnp.arange(T)[None, :] < limit[:, None]


# ---------------------------------------------------------------------------
# sub-layers
# ---------------------------------------------------------------------------


def pre_lookahead_apply(p, cfg: UpsampleConformerConfig, x, context=None):
    """Right-context conv residual block. x: (B, T, D); context: (B, La, D)
    future tokens in streaming mode (instead of zero padding)."""
    y = x.transpose(0, 2, 1)
    if context is None:
        y = jnp.pad(y, ((0, 0), (0, 0), (0, cfg.pre_lookahead_len)))
    else:
        y = jnp.concatenate([y, context.transpose(0, 2, 1)], axis=-1)
    y = jax.nn.leaky_relu(conv1d(y, p["conv1"], padding=[(0, 0)]), 0.01)
    y = conv1d(jnp.pad(y, ((0, 0), (0, 0), (2, 0))), p["conv2"], padding=[(0, 0)])
    return x + y.transpose(0, 2, 1)


def upsample1d_apply(p, cfg: UpsampleConformerConfig, x):
    """Nearest 2x upsample + left-padded conv. x: (B, T, D) -> (B, T*stride, D)."""
    s = cfg.up_stride
    y = jnp.repeat(x.transpose(0, 2, 1), s, axis=-1)
    y = jnp.pad(y, ((0, 0), (0, 0), (s * 2, 0)))
    return conv1d(y, p["conv"], padding=[(0, 0)]).transpose(0, 2, 1)


def _embed_apply(p, cfg: UpsampleConformerConfig, x):
    y = dense(x, p["linear"])
    y = layer_norm(y, p["norm"]["w"], p["norm"]["b"], eps=cfg.ln_eps)
    return y * math.sqrt(cfg.output_size)


# ---------------------------------------------------------------------------
# full encoder
# ---------------------------------------------------------------------------


def upsample_conformer_forward(params, cfg: UpsampleConformerConfig, x, context=None, streaming: bool = False):
    """x: (B, T, input_size) token embeddings -> (B, T*up_stride, output_size).

    context: optional (B, pre_lookahead_len, input_size) future-token
    embeddings (streaming chunk mode; reference flow.inference splits off the
    lookahead tokens when finalize=False). streaming=True applies the
    chunk-causal attention masks the torch encoder uses for chunked synthesis.
    """
    B, T, _ = x.shape
    h = _embed_apply(params["embed"], cfg, x)
    pos = espnet_rel_pos_emb(T, cfg.output_size, h.dtype)
    ctx = None
    if context is not None:
        ctx = dense(context, params["embed"]["linear"])
        ctx = layer_norm(ctx, params["embed"]["norm"]["w"], params["embed"]["norm"]["b"], eps=cfg.ln_eps)
        ctx = ctx * math.sqrt(cfg.output_size)
    h = pre_lookahead_apply(params["pre_lookahead"], cfg, h, ctx)
    mask = chunk_causal_mask(T, cfg.static_chunk_size) if streaming else None

    def block(carry, p):
        return _conformer_block(carry, p, pos, mask, cfg), None

    h, _ = lax.scan(block, h, params["encoders"])

    h = upsample1d_apply(params["up_layer"], cfg, h)
    T2 = T * cfg.up_stride
    h = _embed_apply(params["up_embed"], cfg, h)
    pos2 = espnet_rel_pos_emb(T2, cfg.output_size, h.dtype)
    mask2 = chunk_causal_mask(T2, cfg.static_chunk_size * cfg.up_stride) if streaming else None

    def up_block(carry, p):
        return _conformer_block(carry, p, pos2, mask2, cfg), None

    h, _ = lax.scan(up_block, h, params["up_encoders"])
    return layer_norm(h, params["after_norm"]["w"], params["after_norm"]["b"], eps=cfg.ln_eps)
