"""Audio encoder for the omni path: log-mel features -> audio embeddings.

Capability analog of the reference's audio hooks (modeling_bailingmm.py:140-150
wrapping a funasr SANM encoder; the vLLM omni model uses whisper —
config.json whisper_config): conv subsampling (x4) + bidirectional transformer
over mel frames + projection into the LLM embedding space, with sequence
lengths carried through the subsampling. Feeds `prompt_wrap_audio` /
`audio_mask` multi-gate routing in the engine.
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
    n_mels: int = 128
    d_model: int = 512
    depth: int = 8
    num_heads: int = 8
    mlp_ratio: float = 4.0
    out_dim: int = 2048  # LLM hidden
    max_frames: int = 3000
    ln_eps: float = 1e-6


def init_audio_encoder_params(key, cfg: AudioEncoderConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    return {
        "conv1": conv1d_init(ks[0], cfg.n_mels, cfg.d_model, 3, dtype),
        "conv2": conv1d_init(ks[1], cfg.d_model, cfg.d_model, 3, dtype),
        "pos_embed": 0.02 * jax.random.normal(ks[2], (1, cfg.max_frames // 4, cfg.d_model), jnp.float32).astype(dtype),
        "blocks": stacked_block_init(ks[3], cfg.depth, cfg.d_model, cfg.num_heads, cfg.mlp_ratio, "mlp", dtype=dtype),
        "norm": {"w": jnp.ones((cfg.d_model,), dtype), "b": jnp.zeros((cfg.d_model,), dtype)},
        "proj": linear_init(ks[4], cfg.d_model, cfg.out_dim, dtype=dtype),
    }


def audio_encoder_apply(params, cfg: AudioEncoderConfig, mel, lengths=None):
    """mel: (B, n_mels, T) -> (embeddings (B, T//4, out_dim), out_lengths (B,)).

    Two stride-2 convs subsample x4 (whisper-style geometry)."""
    x = gelu_exact(conv1d(mel, params["conv1"], stride=2))
    x = gelu_exact(conv1d(x, params["conv2"], stride=2))
    x = x.transpose(0, 2, 1)  # (B, T', D)
    Tp = x.shape[1]
    x = x + params["pos_embed"][:, :Tp].astype(x.dtype)
    x = run_blocks(params["blocks"], x, num_heads=cfg.num_heads, ffn_layer="mlp", ln_eps=cfg.ln_eps)
    x = layer_norm(x, params["norm"]["w"], params["norm"]["b"], eps=cfg.ln_eps)
    x = dense(x, params["proj"])
    if lengths is None:
        out_lengths = jnp.full((mel.shape[0],), Tp, jnp.int32)
    else:
        out_lengths = ((lengths + 3) // 4).astype(jnp.int32)
    return x, out_lengths


def log_mel_spectrogram(wav: np.ndarray, sr: int = 16000, n_mels: int = 128, n_fft: int = 400, hop: int = 160) -> np.ndarray:
    """Host-side log-mel features (whisper conventions: 25ms window / 10ms hop)."""
    wav = np.asarray(wav, np.float32)
    n_frames = 1 + max(0, (len(wav) - n_fft)) // hop
    if n_frames <= 0:
        return np.zeros((n_mels, 0), np.float32)
    window = np.hanning(n_fft).astype(np.float32)
    frames = np.stack([wav[i * hop : i * hop + n_fft] * window for i in range(n_frames)])
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # (T, n_fft//2+1)
    mel_fb = _mel_filterbank(sr, n_fft, n_mels)
    mel = spec @ mel_fb.T
    log_mel = np.log10(np.maximum(mel, 1e-10))
    log_mel = np.maximum(log_mel, log_mel.max() - 8.0)
    return ((log_mel + 4.0) / 4.0).T.astype(np.float32)  # (n_mels, T)


def _mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    fmax = sr / 2
    mels = np.linspace(hz_to_mel(0), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for i in range(n_mels):
        lo, ce, hi = bins[i], bins[i + 1], bins[i + 2]
        if ce > lo:
            fb[i, lo:ce] = (np.arange(lo, ce) - lo) / (ce - lo)
        if hi > ce:
            fb[i, ce:hi] = (hi - np.arange(ce, hi)) / (hi - ce)
    return fb


def patch_audio_features(inputs_embeds, input_ids, audio_embeds, audio_lengths, audio_patch_token: int):
    """prompt_wrap_audio equivalent (modeling_bailingmm.py:184-190 /
    patch_continuous_features): place audio embeddings at audioPatch positions.

    Returns (embeds, audio_router_mask (B, T) bool)."""
    from mingunivision_tpu.engine.generate import scatter_image_embeds

    flat = audio_embeds.reshape(-1, audio_embeds.shape[-1])
    out, mask = scatter_image_embeds(inputs_embeds, input_ids, flat, audio_patch_token)
    return out, mask
