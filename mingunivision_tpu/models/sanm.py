"""SAN-M (self-attention + FSMN memory) audio encoder — the funasr
`SANMEncoder` analog the UniVision wrapper hooks import.

The reference wrapper imports `funasr.models.sanm.encoder.SANMEncoder`
(/root/reference/mingunivision/modeling_bailingmm.py:22) for its
`extract_audio_feature` hook (:140-150), but the UniVision checkpoint never
constructs the tower (config.json carries no audio_config) — the hook is
dormant parity surface. This module provides the TPU-native tower so the hook
is LIVE here: the SAN-M architecture (arXiv:2006.01713, as shipped by funasr)
is multi-head self-attention whose value stream additionally feeds a
depthwise-convolution FSMN "memory" block, the two summed per layer:

    q, k, v = split(linear_q_k_v(x))            # fused qkv
    memory  = v + depthwise_conv1d(v * mask)    # FSMN, kernel k, residual
    out     = linear_out(softmax(q kᵀ / √d) v) + memory

Layer body is pre-norm: the first layer (`encoders0`) may change width
in_size→size and then carries NO residual around the attention; all later
layers are width-preserving with the residual. FFN is linear→relu→linear.
Positions are additive [sin | cos]-halves sinusoids indexed from 1 (funasr's
SinusoidalPositionEncoder), applied to the INPUT scaled by √size.

TPU-first shape discipline: layers 2..N are depth-stacked and `lax.scan`ned;
the FSMN depthwise conv is one grouped `conv_general_dilated` (feature-major
lanes, no per-channel Python loop); masks are static-shape booleans.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.norms import layer_norm
from mingunivision_tpu.utils.init import linear_init


@dataclass(frozen=True)
class SANMConfig:
    """funasr SANMEncoder geometry (paraformer-zh defaults)."""

    input_size: int = 560  # 80 fbank x 7 LFR frames
    output_size: int = 512
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 50
    kernel_size: int = 11
    sanm_shift: int = 0
    ln_eps: float = 1e-12  # funasr LayerNorm default

    # optional projection into the LLM (reference linear_proj_audio shape:
    # encode_audio_segments applies proj before wrap, modeling_utils.py:915)
    llm_hidden: int = 2048
    norm_query_embeds: bool = True


def _layer_init(key, in_size: int, size: int, units: int, kernel: int, dtype):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "norm1": {"w": jnp.ones((in_size,), dtype), "b": jnp.zeros((in_size,), dtype)},
        "qkv": linear_init(k1, in_size, 3 * size, dtype=dtype),
        "out": linear_init(k2, size, size, dtype=dtype),
        # depthwise FSMN kernel, (kernel, size) feature-major
        "fsmn": {"w": 0.02 * jax.random.normal(k3, (kernel, size), dtype)},
        "norm2": {"w": jnp.ones((size,), dtype), "b": jnp.zeros((size,), dtype)},
        "ffn_in": linear_init(k4, size, units, dtype=dtype),
        "ffn_out": linear_init(k5, units, size, dtype=dtype),
    }


def init_sanm_params(key, cfg: SANMConfig, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.num_blocks + 2)
    first = _layer_init(ks[0], cfg.input_size, cfg.output_size, cfg.linear_units, cfg.kernel_size, dtype)
    rest = [
        _layer_init(k, cfg.output_size, cfg.output_size, cfg.linear_units, cfg.kernel_size, dtype)
        for k in ks[1 : cfg.num_blocks]
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rest) if rest else None
    params = {
        "encoders0": first,
        "encoders": stacked,
        "after_norm": {"w": jnp.ones((cfg.output_size,), dtype), "b": jnp.zeros((cfg.output_size,), dtype)},
        "proj": linear_init(ks[-1], cfg.output_size, cfg.llm_hidden, dtype=dtype),
    }
    return params


def _sinusoid_positions(T: int, d: int) -> np.ndarray:
    """funasr SinusoidalPositionEncoder: positions 1..T, [sin | cos] halves."""
    pos = np.arange(1, T + 1, dtype=np.float32)[:, None]
    inv = np.exp(-np.log(10000.0) / (d // 2 - 1) * np.arange(d // 2, dtype=np.float32))
    scaled = pos * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)


def _fsmn(v, kern, mask, shift: int):
    """FSMN memory: depthwise conv over time with asymmetric padding + residual.

    v: (B, T, D); kern: (K, D); mask: (B, T) bool. Padding (K-1)//2 + shift on
    the left, (K-1)//2 - shift on the right (funasr's sanm_shift semantics)."""
    K = kern.shape[0]
    vm = jnp.where(mask[..., None], v, 0.0)
    left = (K - 1) // 2 + shift
    right = K - 1 - left
    out = lax.conv_general_dilated(
        vm,
        kern[:, None, :],  # (K, 1, D) — depthwise via feature_group_count
        window_strides=(1,),
        padding=[(left, right)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=v.shape[-1],
    )
    return jnp.where(mask[..., None], vm + out, 0.0)


def _sanm_attention(x, p, mask, heads: int, shift: int):
    """One SAN-M attention: masked softmax attention + FSMN memory on v."""
    B, T, _ = x.shape
    qkv = dense(x, p["qkv"])
    size = qkv.shape[-1] // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    memory = _fsmn(v, p["fsmn"]["w"], mask, shift)
    D = size // heads
    qh = q.reshape(B, T, heads, D).transpose(0, 2, 1, 3) * (D**-0.5)
    kh = k.reshape(B, T, heads, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, T, heads, D).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    scores = jnp.where(mask[:, None, None, :], scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    att = jnp.einsum("bhqk,bhkd->bhqd", w, vh).transpose(0, 2, 1, 3).reshape(B, T, size)
    return dense(att, p["out"]) + memory


def _sanm_layer(x, p, mask, cfg: SANMConfig, residual_attn: bool):
    h = layer_norm(x, p["norm1"]["w"], p["norm1"]["b"], eps=cfg.ln_eps)
    h = _sanm_attention(h, p, mask, cfg.attention_heads, cfg.sanm_shift)
    x = x + h if residual_attn else h  # encoders0 changes width: no residual
    h = layer_norm(x, p["norm2"]["w"], p["norm2"]["b"], eps=cfg.ln_eps)
    h = dense(jax.nn.relu(dense(h, p["ffn_in"])), p["ffn_out"])
    return x + h


def sanm_encode(params, cfg: SANMConfig, feats, lengths=None):
    """feats: (B, T, input_size) fbank/LFR features; lengths: (B,) valid frames.

    Returns (B, T, output_size) encodings (invalid frames zeroed)."""
    B, T, _ = feats.shape
    mask = (
        jnp.arange(T)[None, :] < lengths[:, None]
        if lengths is not None
        else jnp.ones((B, T), bool)
    )
    x = feats * (cfg.output_size**0.5)
    x = x + jnp.asarray(_sinusoid_positions(T, cfg.input_size), feats.dtype)[None]
    x = _sanm_layer(x, params["encoders0"], mask, cfg, residual_attn=False)
    if params["encoders"] is not None:
        def body(carry, p):
            return _sanm_layer(carry, p, mask, cfg, residual_attn=True), None

        x, _ = lax.scan(body, x, params["encoders"])
    x = layer_norm(x, params["after_norm"]["w"], params["after_norm"]["b"], eps=cfg.ln_eps)
    return jnp.where(mask[..., None], x, 0.0)


def extract_audio_feature(params, cfg: SANMConfig, feats, lengths):
    """The UniVision wrapper hook (modeling_bailingmm.py:140-150 analog):
    encode → project into the LLM width → optional L2 normalize
    (`norm_query_embeds`). Returns ((B, T, llm_hidden), lengths)."""
    enc = sanm_encode(params, cfg, feats, lengths)
    emb = dense(enc, params["proj"])
    if cfg.norm_query_embeds:
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6)
    mask = jnp.arange(feats.shape[1])[None, :] < lengths[:, None]
    return jnp.where(mask[..., None], emb, 0.0), lengths
