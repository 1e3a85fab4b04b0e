"""Audio detokenizer: speech-codec tokens -> mel (flow matching) -> waveform
(HiFiGAN), with streaming caches and hamming-window crossfade.

Capability analog of the reference `AudioDetokenizerModel` (matcha-tts binary
wheel + hyperpyyaml config; used via flow.inference + hift.inference with
mel/source caches and fade-in-out, modeling_bailing_talker.py:534-614,
:1153-1160). TPU-native: everything is pure-functional and jitted; the ODE is a
`lax.fori_loop`; streaming state is an explicit NamedTuple.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mingunivision_tpu.models.rf_head import timestep_embedding
from mingunivision_tpu.ops.conv import conv1d, conv1d_init, conv1d_transpose, conv1d_transpose_init
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.norms import layer_norm
from mingunivision_tpu.utils.init import linear_init


@dataclass(frozen=True)
class FlowConfig:
    codec_vocab: int = 4096  # S3 speech-codec ids (after s3bpe decode)
    token_dim: int = 512
    mel_dim: int = 80
    channels: int = 256
    depth: int = 6
    kernel: int = 5
    num_ode_steps: int = 10
    token_rate_to_mel: int = 2  # mel frames per speech token


@dataclass(frozen=True)
class HiFTConfig:
    mel_dim: int = 80
    base_channels: int = 512
    upsample_rates: tuple = (8, 8)  # x64 total; istft-style tail adds x4
    upsample_kernels: tuple = (16, 16)
    resblock_kernels: tuple = (3, 7, 11)
    resblock_dilations: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    sampling_rate: int = 22050
    hop_length: int = 256


# ---------------------------------------------------------------------------
# Flow-matching mel decoder
# ---------------------------------------------------------------------------


def init_flow_params(key, cfg: FlowConfig, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.depth * 3 + 6)
    blocks = []
    for i in range(cfg.depth):
        blocks.append(
            {
                "conv1": conv1d_init(ks[3 * i], cfg.channels, cfg.channels, cfg.kernel, dtype),
                "conv2": conv1d_init(ks[3 * i + 1], cfg.channels, cfg.channels, cfg.kernel, dtype),
                "t_proj": linear_init(ks[3 * i + 2], cfg.channels, cfg.channels, dtype=dtype),
            }
        )
    blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "token_embed": {"w": 0.02 * jax.random.normal(ks[-6], (cfg.codec_vocab, cfg.token_dim), jnp.float32).astype(dtype)},
        "cond_proj": conv1d_init(ks[-5], cfg.token_dim, cfg.channels, 3, dtype),
        "in_proj": conv1d_init(ks[-4], cfg.mel_dim + cfg.channels, cfg.channels, 3, dtype),
        "time_mlp": {
            "fc1": linear_init(ks[-3], 256, cfg.channels, dtype=dtype),
            "fc2": linear_init(ks[-2], cfg.channels, cfg.channels, dtype=dtype),
        },
        "blocks": blocks,
        "out_proj": conv1d_init(ks[-1], cfg.channels, cfg.mel_dim, 3, dtype),
    }


def _flow_estimator(params, cfg: FlowConfig, x_mel, cond, temb):
    """Velocity field. x_mel: (B, mel, T), cond: (B, C, T), temb: (B, C)."""
    h = conv1d(jnp.concatenate([x_mel, cond], axis=1), params["in_proj"])

    def block(carry, p):
        hb = carry
        t = dense(jax.nn.silu(temb.astype(jnp.float32)).astype(hb.dtype), p["t_proj"])
        y = conv1d(jax.nn.silu(hb + t[:, :, None]), p["conv1"])
        y = conv1d(jax.nn.silu(y), p["conv2"])
        return hb + y, None

    h, _ = lax.scan(block, h, params["blocks"])
    return conv1d(h, params["out_proj"])


def flow_inference(params, cfg: FlowConfig, codec_tokens, key, *, temperature: float = 1.0):
    """Speech-codec ids (B, N) -> mel (B, mel_dim, N*r) via Euler ODE from noise."""
    B, N = codec_tokens.shape
    T = N * cfg.token_rate_to_mel
    emb = jnp.take(params["token_embed"]["w"], codec_tokens, axis=0)  # (B, N, D)
    emb = jnp.repeat(emb, cfg.token_rate_to_mel, axis=1)  # (B, T, D)
    cond = conv1d(emb.transpose(0, 2, 1), params["cond_proj"])  # (B, C, T)

    x = temperature * jax.random.normal(key, (B, cfg.mel_dim, T), jnp.float32)
    dt = 1.0 / cfg.num_ode_steps

    def step(i, x):
        t = i.astype(jnp.float32) * dt
        temb = timestep_embedding(jnp.full((B,), t * 1000.0), 256)
        temb = dense(
            jax.nn.silu(dense(temb.astype(cond.dtype), params["time_mlp"]["fc1"]).astype(jnp.float32)).astype(cond.dtype),
            params["time_mlp"]["fc2"],
        )
        v = _flow_estimator(params, cfg, x.astype(cond.dtype), cond, temb)
        return x + v.astype(jnp.float32) * dt

    return lax.fori_loop(0, cfg.num_ode_steps, step, x)


# ---------------------------------------------------------------------------
# HiFiGAN vocoder (hift)
# ---------------------------------------------------------------------------


def init_hift_params(key, cfg: HiFTConfig, dtype=jnp.float32):
    ks = list(jax.random.split(key, 64))
    p = {"pre": conv1d_init(ks.pop(), cfg.mel_dim, cfg.base_channels, 7, dtype)}
    ch = cfg.base_channels
    ups = []
    mrfs = []
    for r, k in zip(cfg.upsample_rates, cfg.upsample_kernels):
        ups.append(conv1d_transpose_init(ks.pop(), ch, ch // 2, k, dtype))
        ch //= 2
        stage = []
        for rk, dils in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            stage.append(
                {
                    "convs1": jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs),
                        *[conv1d_init(ks.pop(), ch, ch, rk, dtype) for _ in dils],
                    ),
                    "convs2": jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs),
                        *[conv1d_init(ks.pop(), ch, ch, rk, dtype) for _ in dils],
                    ),
                }
            )
        mrfs.append(stage)
    p["ups"] = ups
    p["mrfs"] = mrfs
    p["post"] = conv1d_init(ks.pop(), ch, 1, 7, dtype)
    return p


def _resblock(x, blk, kernel: int, dilations):
    for i, d in enumerate(dilations):
        p1 = jax.tree_util.tree_map(lambda a: a[i], blk["convs1"])
        p2 = jax.tree_util.tree_map(lambda a: a[i], blk["convs2"])
        y = conv1d(jax.nn.leaky_relu(x, 0.1), p1, dilation=d)
        y = conv1d(jax.nn.leaky_relu(y, 0.1), p2)
        x = x + y
    return x


def hift_inference(params, cfg: HiFTConfig, mel):
    """mel (B, mel_dim, T) -> waveform (B, T * prod(rates))."""
    x = conv1d(mel, params["pre"])
    for stage, (up, mrf, r, k) in enumerate(
        zip(params["ups"], params["mrfs"], cfg.upsample_rates, cfg.upsample_kernels)
    ):
        x = conv1d_transpose(jax.nn.leaky_relu(x, 0.1), up, stride=r, padding=(k - r) // 2)
        acc = None
        for blk, rk, dils in zip(mrf, cfg.resblock_kernels, cfg.resblock_dilations):
            y = _resblock(x, blk, rk, dils)
            acc = y if acc is None else acc + y
        x = acc / len(mrf)
    x = conv1d(jax.nn.leaky_relu(x, 0.1), params["post"])
    return jnp.tanh(x)[:, 0, :]


# ---------------------------------------------------------------------------
# Streaming wrapper with caches + crossfade (token2wav, reference :534-614)
# ---------------------------------------------------------------------------


class StreamState(NamedTuple):
    tail: jax.Array  # (overlap,) previous chunk's trailing samples
    has_tail: jax.Array  # bool scalar


@dataclass
class AudioDetokenizer:
    """flow + hift + streaming crossfade state."""

    flow_cfg: FlowConfig
    hift_cfg: HiFTConfig
    flow_params: dict
    hift_params: dict
    overlap: int = 879  # reference overlap for the hamming window (:97)

    @classmethod
    def random_init(cls, key, flow_cfg: Optional[FlowConfig] = None, hift_cfg: Optional[HiFTConfig] = None):
        flow_cfg = flow_cfg or FlowConfig()
        hift_cfg = hift_cfg or HiFTConfig()
        k1, k2 = jax.random.split(key)
        return cls(flow_cfg, hift_cfg, init_flow_params(k1, flow_cfg), init_hift_params(k2, hift_cfg))

    def token2wav(self, codec_tokens, key, state: Optional[StreamState] = None):
        """codec ids (1, N) -> (wav chunk np.float32, new state) with hamming
        fade-in/out stitching across streamed chunks."""
        mel = flow_inference(self.flow_params, self.flow_cfg, jnp.asarray(codec_tokens), key)
        wav = np.array(hift_inference(self.hift_params, self.hift_cfg, mel)[0], np.float32)
        ov = min(self.overlap, len(wav) // 2)
        if state is not None and bool(state.has_tail):
            tail = np.asarray(state.tail)
            ov = min(ov, len(tail))
            window = np.hamming(2 * ov) if ov else np.zeros(0)
            wav[:ov] = wav[:ov] * window[:ov] + tail[:ov] * window[ov:]
        new_tail = wav[-ov:].copy() if ov else np.zeros(0, np.float32)
        out = wav[:-ov] if ov else wav
        return out, StreamState(jnp.asarray(new_tail), jnp.asarray(True))

    def flush(self, state: Optional[StreamState]):
        if state is not None and bool(state.has_tail):
            return np.asarray(state.tail, np.float32)
        return np.zeros(0, np.float32)
