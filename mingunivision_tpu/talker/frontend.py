"""Zero-shot voice-cloning frontend: raw prompt audio -> talker conditioning.

Capability analog of the reference SDK's ``TTSFrontEnd`` (ming_sdk/ming.py:
407-411), which wraps two EXTERNAL ONNX assets shipped next to the checkpoint:

  - ``campplus.onnx`` — a CAM++ speaker-verification net producing the 192-d
    x-vector used both as the talker's voice-print (``vp_head`` input,
    modeling_bailing_talker.py:63-72) and the flow decoder's speaker embedding
    (spk_embed_affine_layer, talker/flow.py).
  - ``speech_tokenizer_v1.onnx`` — a whisper-encoder + vector-quantizer that
    turns the prompt waveform into 25 Hz speech-codec tokens used as the
    flow's ``prompt_token`` (with the prompt mel as ``prompt_feat``).

Neither net's weights exist in the reference repo (they are downloads), so
this module provides TPU-native architectures of the same *shape contracts*,
initialized from synthetic weights (``TTSFrontend.random_init``) or a
converted checkpoint tree (``TTSFrontend(params=...)``):

  - ``campplus_apply``: kaldi-style 80-mel fbank -> TDNN x-vector (the classic
    Snyder et al. recipe CAM++ descends from): five dilated conv1d+ReLU+
    affine-norm stages, stats pooling (mean ‖ std), linear -> 192.
  - ``speech_tokenize``: whisper trunk (reuses models/audio_encoder.py,
    CosyVoice's tokenizer is literally a whisper encoder) -> linear to code
    space -> nearest-codebook id in the flow's 6561-entry vocab, average-pooled
    to 25 Hz (= flow token rate; mel runs at 50 Hz, token_mel_ratio == 2).

All compute paths are jitted pure functions over param pytrees; the host-side
fbank/mel extraction is numpy (one-shot preprocessing, same stance as
``models/audio_encoder.log_mel_spectrogram``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from mingunivision_tpu.models.audio_encoder import (
    AudioEncoderConfig,
    _mel_filterbank,
    init_audio_encoder_params,
    whisper_encode,
)
from mingunivision_tpu.ops.conv import conv1d, conv1d_init
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.utils.init import linear_init


# ---------------------------------------------------------------------------
# host-side feature extraction
# ---------------------------------------------------------------------------


def kaldi_fbank(
    wav: np.ndarray,
    sr: int = 16000,
    n_mels: int = 80,
    frame_len: int = 400,
    frame_shift: int = 160,
    n_fft: int = 512,
) -> np.ndarray:
    """25 ms / 10 ms log-mel fbank with per-utterance mean subtraction — the
    campplus input convention (CAM++ consumes kaldi fbank80 with CMN).

    wav: float mono (T,); returns (frames, n_mels) float32."""
    wav = np.asarray(wav, np.float32).reshape(-1)
    if len(wav) < frame_len:
        wav = np.pad(wav, (0, frame_len - len(wav)))
    n_frames = 1 + (len(wav) - frame_len) // frame_shift
    idx = np.arange(frame_len)[None, :] + frame_shift * np.arange(n_frames)[:, None]
    frames = wav[idx] * np.hanning(frame_len)[None, :]
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=1)) ** 2  # (frames, n_fft//2+1)
    mel = spec @ _mel_filterbank(sr, n_fft, n_mels).T  # (frames, n_mels)
    feat = np.log(np.maximum(mel, 1e-10)).astype(np.float32)
    return feat - feat.mean(axis=0, keepdims=True)  # CMN


def flow_prompt_mel(
    wav: np.ndarray,
    sr: int = 16000,
    n_mels: int = 80,
    n_fft: int = 1024,
) -> np.ndarray:
    """Prompt mel for the flow decoder's ``prompt_feat``: 80 mels at 50 Hz
    (hop = sr/50), matching token_mel_ratio == 2 against 25 Hz prompt tokens.

    Returns (frames, 80) float32 log-mel."""
    hop = sr // 50
    wav = np.asarray(wav, np.float32).reshape(-1)
    if len(wav) < n_fft:
        wav = np.pad(wav, (0, n_fft - len(wav)))
    n_frames = 1 + (len(wav) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = wav[idx] * np.hanning(n_fft)[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    mel = spec @ _mel_filterbank(sr, n_fft, n_mels).T
    return np.log(np.maximum(mel, 1e-5)).astype(np.float32)


# ---------------------------------------------------------------------------
# campplus-style speaker embedding (fbank -> 192-d x-vector)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CampPlusConfig:
    feat_dim: int = 80
    embed_dim: int = 192  # == TalkerConfig.vp_feature_size == FlowConfig.spk_embed_dim
    # (channels, kernel, dilation) per TDNN stage — the x-vector frame stack
    stages: tuple = ((512, 5, 1), (512, 3, 2), (512, 3, 3), (512, 1, 1), (1500, 1, 1))


def init_campplus_params(key, cfg: CampPlusConfig, dtype=jnp.float32):
    ks = list(jax.random.split(key, len(cfg.stages) + 1))
    p = {"stages": []}
    ch = cfg.feat_dim
    for (out_ch, kernel, _dil), k in zip(cfg.stages, ks[:-1]):
        p["stages"].append(
            {
                "conv": conv1d_init(k, ch, out_ch, kernel, dtype),
                # inference-folded batch norm: per-channel affine
                "norm_scale": jnp.ones((out_ch, 1), dtype),
                "norm_shift": jnp.zeros((out_ch, 1), dtype),
            }
        )
        ch = out_ch
    p["embed"] = linear_init(ks[-1], 2 * ch, cfg.embed_dim, bias=True, dtype=dtype)
    return p


def campplus_apply(params, cfg: CampPlusConfig, feats):
    """feats (B, frames, feat_dim) -> x-vector (B, embed_dim).

    TDNN stages run channel-major ((B, C, T), conv1d SAME), stats pooling
    concatenates the temporal mean and std (the x-vector segment pooling)."""
    x = feats.transpose(0, 2, 1)  # (B, feat, T)
    for (out_ch, kernel, dil), sp in zip(cfg.stages, params["stages"]):
        x = conv1d(x, sp["conv"], dilation=dil)
        x = jax.nn.relu(x) * sp["norm_scale"] + sp["norm_shift"]
    mean = jnp.mean(x, axis=2)
    var = jnp.maximum(jnp.mean(x * x, axis=2) - mean * mean, 1e-10)
    stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=1)  # (B, 2C)
    return dense(stats, params["embed"])


# ---------------------------------------------------------------------------
# speech tokenizer (prompt wav -> 25 Hz codec ids in the flow vocab)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SpeechTokenizerConfig:
    # small whisper trunk (the v1 tokenizer wraps a whisper encoder)
    encoder: AudioEncoderConfig = field(
        default_factory=lambda: AudioEncoderConfig(n_mels=128, n_state=256, n_head=4, n_layer=4, n_ctx=3000)
    )
    codebook_size: int = 6561  # == FlowConfig.vocab_size (FSQ vocab)
    code_dim: int = 128
    pool: int = 2  # 50 Hz whisper frames -> 25 Hz tokens


def init_speech_tokenizer_params(key, cfg: SpeechTokenizerConfig, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder": init_audio_encoder_params(k1, cfg.encoder, dtype),
        "code_proj": linear_init(k2, cfg.encoder.n_state, cfg.code_dim, bias=True, dtype=dtype),
        "codebook": 0.02 * jax.random.normal(k3, (cfg.codebook_size, cfg.code_dim), jnp.float32).astype(dtype),
    }


def speech_tokenize(params, cfg: SpeechTokenizerConfig, mel):
    """mel (B, n_mels, T at 100 Hz) -> token ids (B, T//(2*pool)) int32.

    whisper trunk halves the rate to 50 Hz; mean-pooling `pool` frames lands
    on the flow's 25 Hz token rate. Quantization = nearest codebook row by
    squared L2 (ties to the lower id, argmin semantics)."""
    h = whisper_encode(params["encoder"], cfg.encoder, mel)  # (B, T/2, n_state)
    Tp = (h.shape[1] // cfg.pool) * cfg.pool
    h = h[:, :Tp].reshape(h.shape[0], Tp // cfg.pool, cfg.pool, -1).mean(axis=2)
    z = dense(h, params["code_proj"])  # (B, T', code_dim)
    cb = params["codebook"].astype(z.dtype)
    # ||z - c||^2 = ||z||^2 - 2 z.c + ||c||^2 ; ||z||^2 constant per row
    scores = 2.0 * jnp.einsum("btd,vd->btv", z, cb) - jnp.sum(cb * cb, axis=1)[None, None, :]
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# frontend bundle
# ---------------------------------------------------------------------------


class VoiceProfile(NamedTuple):
    """Everything the talker + flow need to clone a voice from prompt audio."""

    embedding: np.ndarray  # (1, 192) pooled x-vector -> flow spk embedding
    vp_emb: np.ndarray  # (1, K, 192) voice-print frames -> talker vp_head
    prompt_token: np.ndarray  # (1, T_tok) int32 speech-codec ids @ 25 Hz
    prompt_feat: np.ndarray  # (1, 2*T_tok, 80) prompt mel @ 50 Hz


@dataclass
class TTSFrontend:
    """Raw prompt audio -> VoiceProfile (the reference TTSFrontEnd analog).

    Construct with converted weights or ``random_init`` (synthetic weights:
    structurally exact, acoustically meaningless — used by tests and as a
    stand-in until real campplus/tokenizer checkpoints are converted)."""

    campplus_cfg: CampPlusConfig
    campplus_params: dict
    tokenizer_cfg: SpeechTokenizerConfig
    tokenizer_params: dict
    vp_frames: int = 4  # voice-print sequence length fed to vp_head

    def __post_init__(self):
        self._embed_jit = jax.jit(lambda p, f: campplus_apply(p, self.campplus_cfg, f))
        self._tok_jit = jax.jit(lambda p, m: speech_tokenize(p, self.tokenizer_cfg, m))

    @classmethod
    def random_init(cls, key, campplus_cfg: Optional[CampPlusConfig] = None, tokenizer_cfg: Optional[SpeechTokenizerConfig] = None, **kw):
        campplus_cfg = campplus_cfg or CampPlusConfig()
        tokenizer_cfg = tokenizer_cfg or SpeechTokenizerConfig()
        k1, k2 = jax.random.split(key)
        return cls(
            campplus_cfg,
            init_campplus_params(k1, campplus_cfg),
            tokenizer_cfg,
            init_speech_tokenizer_params(k2, tokenizer_cfg),
            **kw,
        )

    def speaker_embedding(self, wav: np.ndarray, sr: int = 16000) -> np.ndarray:
        """wav (T,) -> L2-normalized (1, 192) x-vector."""
        feats = kaldi_fbank(wav, sr=sr, n_mels=self.campplus_cfg.feat_dim)
        emb = np.asarray(self._embed_jit(self.campplus_params, jnp.asarray(feats[None])), np.float32)
        return emb / max(float(np.linalg.norm(emb)), 1e-10)

    def prompt_tokens(self, wav: np.ndarray, sr: int = 16000) -> np.ndarray:
        """wav (T,) -> (1, T_tok) int32 codec ids at 25 Hz."""
        from mingunivision_tpu.models.audio_encoder import log_mel_spectrogram

        mel = log_mel_spectrogram(wav, sr=sr, n_mels=self.tokenizer_cfg.encoder.n_mels)
        return np.asarray(self._tok_jit(self.tokenizer_params, jnp.asarray(mel[None])), np.int32)

    def voice_profile(self, wav: np.ndarray, sr: int = 16000) -> VoiceProfile:
        """Full zero-shot conditioning set from one prompt utterance.

        prompt_feat/prompt_token lengths are cropped to the flow invariant
        len(prompt_feat) == token_mel_ratio * len(prompt_token) (== 2x)."""
        emb = self.speaker_embedding(wav, sr)
        tokens = self.prompt_tokens(wav, sr)
        feat = flow_prompt_mel(wav, sr=sr)[None]  # (1, T50, 80)
        t_tok = min(tokens.shape[1], feat.shape[1] // 2)
        tokens = tokens[:, :t_tok]
        feat = feat[:, : 2 * t_tok]
        vp = np.repeat(emb[:, None, :], self.vp_frames, axis=1)  # (1, K, 192)
        return VoiceProfile(emb, vp.astype(np.float32), tokens, feat.astype(np.float32))
