"""Checkpoint-exact flow-matching mel decoder (CausalMaskedDiffWithXvec).

The reference's audio detokenizer calls `flow.inference(token, prompt_token,
prompt_feat, embedding, streaming, finalize)` -> mel
(modeling_bailing_talker.py:553-568). The flow is the public CosyVoice2 layout:

  - input_embedding (codec vocab) + speaker-xvector affine (192 -> 80)
  - UpsampleConformerEncoder (talker/flow_encoder.py) + encoder_proj (512 -> 80)
  - CausalConditionalCFM: Euler ODE over a cosine t-schedule with
    classifier-free guidance (uncond entry zeroes mu/spk/cond), estimator =
    CausalConditionalDecoder — a matcha-style 1-D U-Net: one down stage
    (ResnetBlock1D + n_blocks transformer blocks + causal conv), num_mid_blocks
    mid stages, one up stage with skip concat, final Block1D + 1x1 proj.
    channels=(256,) means no actual stride — "down/up" are causal convs.

From-scratch JAX: mid stages are depth-stacked and `lax.scan`ned (outer scan
over 12 stages, inner scan over each stage's 4 transformer blocks); the ODE is
a `lax.fori_loop`. `utils.convert.flow_params_from_torch` maps real CosyVoice2
state dicts onto this tree (tests/test_flow_golden.py checks parity against a
torch oracle of the same public layout, tools/cosyvoice_oracle.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax import lax

from mingunivision_tpu.ops.conv import conv1d, conv1d_init
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.norms import layer_norm
from mingunivision_tpu.talker.flow_encoder import (
    UpsampleConformerConfig,
    chunk_causal_mask,
    init_upsample_conformer_params,
    upsample_conformer_forward,
)
from mingunivision_tpu.utils.init import linear_init


@dataclass(frozen=True)
class CFMDecoderConfig:
    in_channels: int = 320  # x(80) + mu(80) + spks(80) + cond(80)
    out_channels: int = 80
    channels: tuple = (256,)
    attention_head_dim: int = 64
    n_blocks: int = 4
    num_mid_blocks: int = 12
    num_heads: int = 8
    groups: int = 8  # GroupNorm groups in Block1D
    static_chunk_size: int = 50  # streaming attention chunk (mel frames)

    @property
    def time_embed_dim(self) -> int:
        return self.channels[0] * 4


@dataclass(frozen=True)
class FlowConfig:
    vocab_size: int = 6561
    input_size: int = 512
    output_size: int = 80
    spk_embed_dim: int = 192
    encoder: UpsampleConformerConfig = field(default_factory=UpsampleConformerConfig)
    decoder: CFMDecoderConfig = field(default_factory=CFMDecoderConfig)
    n_timesteps: int = 10
    inference_cfg_rate: float = 0.7

    @property
    def token_mel_ratio(self) -> int:
        return self.encoder.up_stride

    @property
    def pre_lookahead_len(self) -> int:
        return self.encoder.pre_lookahead_len


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _resnet_init(key, dim, dim_out, temb_dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "mlp": linear_init(ks[0], temb_dim, dim_out, bias=True, dtype=dtype),
        "block1": {
            "conv": conv1d_init(ks[1], dim, dim_out, 3, dtype),
            "norm": {"w": jnp.ones((dim_out,), dtype), "b": jnp.zeros((dim_out,), dtype)},
        },
        "block2": {
            "conv": conv1d_init(ks[2], dim_out, dim_out, 3, dtype),
            "norm": {"w": jnp.ones((dim_out,), dtype), "b": jnp.zeros((dim_out,), dtype)},
        },
        "res_conv": conv1d_init(ks[3], dim, dim_out, 1, dtype),
    }


def _transformer_init(key, cfg: CFMDecoderConfig, dim, dtype):
    ks = jax.random.split(key, 6)
    inner = cfg.num_heads * cfg.attention_head_dim
    ff_inner = dim * 4
    return {
        "norm1": {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "attn": {
            "to_q": linear_init(ks[0], dim, inner, bias=False, dtype=dtype),
            "to_k": linear_init(ks[1], dim, inner, bias=False, dtype=dtype),
            "to_v": linear_init(ks[2], dim, inner, bias=False, dtype=dtype),
            "to_out": linear_init(ks[3], inner, dim, bias=True, dtype=dtype),
        },
        "norm3": {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "ff": {
            "proj": linear_init(ks[4], dim, ff_inner, bias=True, dtype=dtype),
            "out": linear_init(ks[5], ff_inner, dim, bias=True, dtype=dtype),
        },
    }


def _stage_init(key, cfg: CFMDecoderConfig, dim_in, dim_out, dtype):
    k1, k2 = jax.random.split(key)
    stack = lambda ts: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ts)
    return {
        "resnet": _resnet_init(k1, dim_in, dim_out, cfg.time_embed_dim, dtype),
        "transformers": stack(
            [_transformer_init(k, cfg, dim_out, dtype) for k in jax.random.split(k2, cfg.n_blocks)]
        ),
    }


def init_cfm_decoder_params(key, cfg: CFMDecoderConfig, dtype=jnp.float32):
    assert len(cfg.channels) == 1, "CosyVoice2 layout uses a single channel stage"
    ch = cfg.channels[0]
    ks = jax.random.split(key, 10)
    stack = lambda ts: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ts)
    mid = [
        _stage_init(k, cfg, ch, ch, dtype) for k in jax.random.split(ks[0], cfg.num_mid_blocks)
    ]
    return {
        "time_mlp": {
            "linear_1": linear_init(ks[1], cfg.in_channels, cfg.time_embed_dim, bias=True, dtype=dtype),
            "linear_2": linear_init(ks[2], cfg.time_embed_dim, cfg.time_embed_dim, bias=True, dtype=dtype),
        },
        "down": {
            **_stage_init(ks[3], cfg, cfg.in_channels, ch, dtype),
            "downsample": conv1d_init(ks[4], ch, ch, 3, dtype),
        },
        "mid": stack(mid),
        "up": {
            **_stage_init(ks[5], cfg, ch * 2, ch, dtype),
            "upsample": conv1d_init(ks[6], ch, ch, 3, dtype),
        },
        "final_block": {
            "conv": conv1d_init(ks[7], ch, ch, 3, dtype),
            "norm": {"w": jnp.ones((ch,), dtype), "b": jnp.zeros((ch,), dtype)},
        },
        "final_proj": conv1d_init(ks[8], ch, cfg.out_channels, 1, dtype),
    }


def init_flow_params(key, cfg: FlowConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    return {
        "input_embedding": {
            "w": 0.02 * jax.random.normal(ks[0], (cfg.vocab_size, cfg.input_size), jnp.float32).astype(dtype)
        },
        "spk_embed_affine_layer": linear_init(ks[1], cfg.spk_embed_dim, cfg.output_size, bias=True, dtype=dtype),
        "encoder": init_upsample_conformer_params(ks[2], cfg.encoder, dtype),
        "encoder_proj": linear_init(ks[3], cfg.encoder.output_size, cfg.output_size, bias=True, dtype=dtype),
        "decoder": init_cfm_decoder_params(ks[4], cfg.decoder, dtype),
    }


# ---------------------------------------------------------------------------
# estimator (CausalConditionalDecoder)
# ---------------------------------------------------------------------------


def _mish(x):
    xf = x.astype(jnp.float32)
    return (xf * jnp.tanh(jax.nn.softplus(xf))).astype(x.dtype)


def _group_norm(x, norm, groups: int, eps: float = 1e-5):
    """GroupNorm over NCW. x: (B, C, T)."""
    B, C, T = x.shape
    xf = x.astype(jnp.float32).reshape(B, groups, C // groups, T)
    mean = jnp.mean(xf, axis=(2, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(2, 3), keepdims=True)
    y = ((xf - mean) * lax.rsqrt(var + eps)).reshape(B, C, T)
    y = y * norm["w"].astype(jnp.float32)[None, :, None] + norm["b"].astype(jnp.float32)[None, :, None]
    return y.astype(x.dtype)


def _causal_conv(x, p, kernel: int):
    """CausalConv1d: left-pad (kernel-1), VALID conv."""
    return conv1d(jnp.pad(x, ((0, 0), (0, 0), (kernel - 1, 0))), p, padding=[(0, 0)])


def _block1d(x, p, mask, groups: int):
    """CausalBlock1D: causal conv3 -> GroupNorm -> Mish, masked in/out."""
    y = _causal_conv(x * mask, p["conv"], 3)
    return _mish(_group_norm(y, p["norm"], groups)) * mask


def _resnet_apply(p, cfg: CFMDecoderConfig, x, mask, temb):
    h = _block1d(x, p["block1"], mask, cfg.groups)
    h = h + dense(_mish(temb), p["mlp"])[:, :, None]
    h = _block1d(h, p["block2"], mask, cfg.groups)
    return h + conv1d(x * mask, p["res_conv"])


def _transformer_apply(p, cfg: CFMDecoderConfig, x, attn_mask):
    """diffusers BasicTransformerBlock: LN -> attention -> LN -> GELU FF."""
    B, T, C = x.shape
    H, dk = cfg.num_heads, cfg.attention_head_dim
    y = layer_norm(x, p["norm1"]["w"], p["norm1"]["b"], eps=1e-5)
    q = dense(y, p["attn"]["to_q"]).reshape(B, T, H, dk)
    k = dense(y, p["attn"]["to_k"]).reshape(B, T, H, dk)
    v = dense(y, p["attn"]["to_v"]).reshape(B, T, H, dk)
    scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) / math.sqrt(dk)
    if attn_mask is not None:
        scores = jnp.where(attn_mask[None, None], scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, H * dk)
    x = x + dense(o, p["attn"]["to_out"])
    y = layer_norm(x, p["norm3"]["w"], p["norm3"]["b"], eps=1e-5)
    y = dense(jax.nn.gelu(dense(y, p["ff"]["proj"]).astype(jnp.float32), approximate=False).astype(x.dtype), p["ff"]["out"])
    return x + y


def _stage_apply(p, cfg: CFMDecoderConfig, x, mask, temb, attn_mask):
    """ResnetBlock1D + scanned transformer blocks. x: (B, C, T)."""
    h = _resnet_apply(p["resnet"], cfg, x, mask, temb)
    h = h.transpose(0, 2, 1)

    def tblock(carry, tp):
        return _transformer_apply(tp, cfg, carry, attn_mask), None

    h, _ = lax.scan(tblock, h, p["transformers"])
    return h.transpose(0, 2, 1)


def estimator_apply(params, cfg: CFMDecoderConfig, x, mask, mu, t, spks, cond, streaming: bool = False):
    """Velocity field. x/mu/cond: (B, 80, T); spks: (B, 80); t: (B,) in [0,1].
    mask: (B, 1, T)."""
    B, _, T = x.shape
    # matcha SinusoidalPosEmb(in_channels) with scale=1000
    half = cfg.in_channels // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1)))
    ang = 1000.0 * t.astype(jnp.float32)[:, None] * freq[None, :]
    temb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1).astype(x.dtype)
    temb = dense(temb, params["time_mlp"]["linear_1"])
    temb = dense(jax.nn.silu(temb.astype(jnp.float32)).astype(x.dtype), params["time_mlp"]["linear_2"])

    h = jnp.concatenate([x, mu, jnp.broadcast_to(spks[:, :, None], (B, spks.shape[1], T)), cond], axis=1)
    attn_mask = chunk_causal_mask(T, cfg.static_chunk_size) if streaming else None

    h = _stage_apply(params["down"], cfg, h, mask, temb, attn_mask)
    skip = h
    h = _causal_conv(h * mask, params["down"]["downsample"], 3)

    def mid(carry, p):
        return _stage_apply(p, cfg, carry, mask, temb, attn_mask), None

    h, _ = lax.scan(mid, h, params["mid"])

    h = jnp.concatenate([h, skip], axis=1)
    h = _stage_apply(params["up"], cfg, h, mask, temb, attn_mask)
    h = _causal_conv(h * mask, params["up"]["upsample"], 3)

    h = _block1d(h, params["final_block"], mask, cfg.groups)
    return conv1d(h * mask, params["final_proj"]) * mask


# ---------------------------------------------------------------------------
# CFM Euler solver with classifier-free guidance (CausalConditionalCFM)
# ---------------------------------------------------------------------------


def cfm_inference(
    params,
    cfg: CFMDecoderConfig,
    mu,
    spks,
    cond,
    noise,
    n_timesteps: int = 10,
    inference_cfg_rate: float = 0.7,
    streaming: bool = False,
):
    """Euler ODE from noise -> mel over a cosine t-schedule with CFG.

    mu/cond: (B, 80, T); spks: (B, 80); noise: (B, 80, T) (the torch model uses
    a fixed rand_noise buffer — pass it here for parity, or fresh normals)."""
    B, C, T = mu.shape
    t_span = 1.0 - jnp.cos(jnp.linspace(0.0, 1.0, n_timesteps + 1) * 0.5 * jnp.pi)
    mask = jnp.ones((2 * B, 1, T), mu.dtype)
    mu_in = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond_in = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)

    def step(i, x):
        t = t_span[i]
        dt = t_span[i + 1] - t_span[i]
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.full((2 * B,), t, mu.dtype)
        v = estimator_apply(params, cfg, x_in, mask, mu_in, t_in, spks_in, cond_in, streaming)
        v = (1.0 + inference_cfg_rate) * v[:B] - inference_cfg_rate * v[B:]
        return x + (dt * v).astype(x.dtype)  # keep the carry dtype under bf16 params

    return lax.fori_loop(0, n_timesteps, step, noise.astype(mu.dtype))


# ---------------------------------------------------------------------------
# CausalMaskedDiffWithXvec.inference
# ---------------------------------------------------------------------------


def flow_inference(
    params,
    cfg: FlowConfig,
    token,
    prompt_token,
    prompt_feat,
    embedding,
    noise,
    streaming: bool = False,
    finalize: bool = True,
):
    """codec tokens -> mel, CosyVoice2 semantics (reference token2wav,
    modeling_bailing_talker.py:553-572).

    token: (B, N) new codec ids; prompt_token: (B, Np) prompt ids;
    prompt_feat: (B, Np*ratio, 80) prompt mel; embedding: (B, spk_embed_dim)
    x-vector; noise: (B, 80, (Np+N)*ratio) ODE initial noise. When
    finalize=False the trailing pre_lookahead_len tokens are split off as
    encoder lookahead context. Returns mel (B, 80, N*ratio) past the prompt.
    """
    emb = embedding / jnp.maximum(jnp.linalg.norm(embedding, axis=1, keepdims=True), 1e-12)
    emb = dense(emb.astype(prompt_feat.dtype), params["spk_embed_affine_layer"])

    tok = jnp.concatenate([prompt_token, token], axis=1)
    tok_emb = jnp.take(params["input_embedding"]["w"], jnp.maximum(tok, 0), axis=0)
    if finalize:
        h = upsample_conformer_forward(params["encoder"], cfg.encoder, tok_emb, streaming=streaming)
    else:
        La = cfg.pre_lookahead_len
        h = upsample_conformer_forward(
            params["encoder"], cfg.encoder, tok_emb[:, :-La], context=tok_emb[:, -La:], streaming=streaming
        )
    h = dense(h, params["encoder_proj"])  # (B, Tm, 80)

    mel_len1 = prompt_feat.shape[1]
    Tm = h.shape[1]
    conds = jnp.zeros((h.shape[0], Tm, cfg.output_size), h.dtype)
    if mel_len1 > 0:
        conds = lax.dynamic_update_slice(conds, prompt_feat.astype(h.dtype), (0, 0, 0))
    feat = cfm_inference(
        params["decoder"],
        cfg.decoder,
        mu=h.transpose(0, 2, 1),
        spks=emb,
        cond=conds.transpose(0, 2, 1),
        noise=noise[:, :, :Tm],
        n_timesteps=cfg.n_timesteps,
        inference_cfg_rate=cfg.inference_cfg_rate,
        streaming=streaming,
    )
    return feat[:, :, mel_len1:].astype(jnp.float32)
