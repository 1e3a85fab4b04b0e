"""Whisper audio encoder for the omni path: log-mel features -> audio embeddings.

CHECKPOINT-EXACT against the omni family's audio tower: the vLLM patch builds
`WhisperAudioEncoder(**whisper_config.whisper_encoder_config)` (ming_lite.patch
:1457-1485; config.json whisper_config: n_mels 128, n_state 1280, n_head 20,
n_layer 32, n_ctx 15000) — the standard OpenAI/HF Whisper encoder geometry:

  conv1 (k3, s1, p1) -> gelu -> conv2 (k3, s2, p1) -> gelu
  + sinusoidal positions (stored; the patch loads `audio.positional_embedding`
  from the checkpoint shard, :1480-1485)
  -> n_layer pre-LN blocks (attn q/v/out biased, k unbiased; gelu MLP)
  -> final layer norm

plus the omni projection into the LLM (`linear_proj_audio`, patch :1496-1510):
Conv1d(n_state -> hidden, k=ds_kernel_size 3, s=ds_stride 2, p=1) then
(GELU + Linear(hidden, hidden)) x (mlp_depth-1).

Golden-tested against transformers' WhisperEncoder (same architecture) in
tests/test_omni_golden.py; weight converter in utils/convert.py
(`whisper_encoder_params_from_torch`).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from mingunivision_tpu.models.vit import run_blocks, stacked_block_init
from mingunivision_tpu.ops.activations import gelu_exact
from mingunivision_tpu.ops.conv import conv1d, conv1d_init
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.norms import layer_norm
from mingunivision_tpu.utils.init import linear_init


@dataclass(frozen=True)
class AudioEncoderConfig:
    """Whisper encoder geometry (config.json whisper_encoder_config names)."""

    n_mels: int = 128
    n_state: int = 1280
    n_head: int = 20
    n_layer: int = 32
    n_ctx: int = 1500  # post-conv frames (omni checkpoint: 15000)
    ln_eps: float = 1e-5  # torch LayerNorm default (whisper uses it)

    # omni projection into the LLM (patch :1496-1510)
    out_dim: int = 2048
    ds_kernel_size: int = 3
    ds_stride: int = 2
    mlp_depth: int = 2


def sinusoid_positions(n_ctx: int, d: int) -> np.ndarray:
    """Whisper's fixed sinusoidal table ([sin | cos] halves)."""
    log_timescale = np.log(10000.0) / (d // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(d // 2))
    t = np.arange(n_ctx)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def init_audio_encoder_params(key, cfg: AudioEncoderConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "conv1": conv1d_init(ks[0], cfg.n_mels, cfg.n_state, 3, dtype),
        "conv2": conv1d_init(ks[1], cfg.n_state, cfg.n_state, 3, dtype),
        "pos_embed": jnp.asarray(sinusoid_positions(cfg.n_ctx, cfg.n_state), dtype),
        "blocks": stacked_block_init(ks[2], cfg.n_layer, cfg.n_state, cfg.n_head, 4.0, "mlp", dtype=dtype),
        "norm": {"w": jnp.ones((cfg.n_state,), dtype), "b": jnp.zeros((cfg.n_state,), dtype)},
        "proj": init_audio_proj_params(ks[3], cfg, dtype),
    }


def init_audio_proj_params(key, cfg: AudioEncoderConfig, dtype=jnp.float32):
    ks = jax.random.split(key, max(cfg.mlp_depth, 2))
    p = {"ds_conv": conv1d_init(ks[0], cfg.n_state, cfg.out_dim, cfg.ds_kernel_size, dtype)}
    for i in range(1, cfg.mlp_depth):
        p[f"fc{i}"] = linear_init(ks[i], cfg.out_dim, cfg.out_dim, dtype=dtype)
    return p


def whisper_encode(params, cfg: AudioEncoderConfig, mel):
    """Whisper encoder trunk. mel: (B, n_mels, T) -> (B, T//2, n_state)."""
    # explicit symmetric padding=1 (torch Conv1d parity; XLA "SAME" pads
    # asymmetrically at stride 2)
    x = gelu_exact(conv1d(mel, params["conv1"], stride=1, padding=1))
    x = gelu_exact(conv1d(x, params["conv2"], stride=2, padding=1))
    x = x.transpose(0, 2, 1)  # (B, T', n_state)
    Tp = x.shape[1]
    x = x + params["pos_embed"][:Tp][None].astype(x.dtype)
    x = run_blocks(params["blocks"], x, num_heads=cfg.n_head, ffn_layer="mlp", ln_eps=cfg.ln_eps)
    return layer_norm(x, params["norm"]["w"], params["norm"]["b"], eps=cfg.ln_eps)


def audio_proj_apply(params, cfg: AudioEncoderConfig, x):
    """linear_proj_audio (patch :1496-1510): ds conv (stride 2) + GELU/Linear MLP.

    x: (B, T', n_state) -> (B, ceil(T'/2), out_dim)."""
    y = conv1d(
        x.transpose(0, 2, 1), params["ds_conv"], stride=cfg.ds_stride, padding=cfg.ds_kernel_size // 2
    )  # (B, out, T'')
    y = y.transpose(0, 2, 1)
    for i in range(1, cfg.mlp_depth):
        y = dense(gelu_exact(y), params[f"fc{i}"])
    return y


def audio_encoder_apply(params, cfg: AudioEncoderConfig, mel, lengths=None):
    """Full omni audio tower: mel (B, n_mels, T) -> (embeddings
    (B, ceil(T/2/ds_stride), out_dim), out_lengths (B,))."""
    feats = whisper_encode(params, cfg, mel)
    x = audio_proj_apply(params["proj"], cfg, feats)
    Tp = x.shape[1]
    if lengths is None:
        out_lengths = jnp.full((mel.shape[0],), Tp, jnp.int32)
    else:
        # conv2 stride 2 (p=1, k=3): floor((T-1)/2)+1; ds conv stride 2 again
        t1 = (lengths - 1) // 2 + 1
        out_lengths = ((t1 - 1) // cfg.ds_stride + 1).astype(jnp.int32)
    return x, out_lengths


def log_mel_spectrogram(wav: np.ndarray, sr: int = 16000, n_mels: int = 128, n_fft: int = 400, hop: int = 160) -> np.ndarray:
    """Whisper-style log-mel features. wav: (T,) float in [-1, 1] -> (n_mels, frames)."""
    if len(wav) < n_fft:
        wav = np.pad(wav, (0, n_fft - len(wav)))
    window = np.hanning(n_fft + 1)[:-1]
    n_frames = 1 + (len(wav) - n_fft) // hop
    frames = np.stack([wav[i * hop : i * hop + n_fft] * window for i in range(n_frames)])
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    mel = _mel_filterbank(sr, n_fft, n_mels) @ spec.T
    log_mel = np.log10(np.maximum(mel, 1e-10))
    log_mel = np.maximum(log_mel, log_mel.max() - 8.0)
    return ((log_mel + 4.0) / 4.0).astype(np.float32)


def _mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2), n_mels + 2))
    fb = np.zeros((n_mels, len(freqs)))
    for i in range(n_mels):
        lo, c, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (freqs - lo) / max(c - lo, 1e-9)
        down = (hi - freqs) / max(hi - c, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
    return fb


def patch_audio_features(inputs_embeds, input_ids, audio_embeds, audio_lengths, audio_patch_token: int):
    """prompt_wrap_audio equivalent (modeling_bailingmm.py:184-190 /
    patch_continuous_features): place audio embeddings at audioPatch positions.

    With `audio_lengths`, only each clip's first `length` frames are scattered
    (right-padding from the batched encoder is dropped).
    Returns (embeds, audio_router_mask (B, T) bool)."""
    from mingunivision_tpu.engine.generate import scatter_image_embeds

    h = audio_embeds.shape[-1]
    flat = audio_embeds.reshape(-1, h)
    if audio_lengths is not None:
        Bf, Tf, _ = audio_embeds.shape
        valid = (jnp.arange(Tf)[None, :] < audio_lengths[:, None]).reshape(-1)
        order = jnp.cumsum(valid) - 1
        # compact the valid frames to the front; invalid writes are dropped
        flat = jnp.zeros_like(flat).at[jnp.where(valid, order, Bf * Tf)].set(flat, mode="drop")
    out, mask = scatter_image_embeds(inputs_embeds, input_ids, flat, audio_patch_token)
    return out, mask
