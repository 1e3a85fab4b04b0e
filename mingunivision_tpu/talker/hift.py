"""Checkpoint-exact HiFT vocoder (NSF-HiFiGAN with iSTFT head).

The reference's audio detokenizer drives `model.hift.inference(speech_feat,
cache_source) -> (speech, source)` (modeling_bailing_talker.py:585-608) from the
external `audio_detokenizer` wheel, whose hift is the public CosyVoice
`HiFTGenerator`. This module is a from-scratch JAX implementation of that exact
architecture so real checkpoints convert weight-for-weight
(`utils.convert.hift_generator_params_from_torch`):

  - ConvRNNF0Predictor: 5 weight-normed convs (ELU) + linear classifier -> |f0|
  - SourceModuleHnNSF: SineGen harmonics -> linear mix -> tanh source signal
  - conv_pre -> [leaky_relu -> ConvTranspose up -> source-STFT fusion ->
    mean-of-ResBlocks] x2 -> conv_post -> exp-magnitude / sin-phase -> iSTFT
  - ResBlocks use Snake activations (learned per-channel alpha)
  - the NSF source is STFT'd (n_fft 16, hop 4) and fused into each scale via
    source_downs / source_resblocks; final waveform clamps to +-audio_limit

`talker/detokenizer.py` keeps the lightweight capability-analog tier; this is
the weight-compatible tier. tests/test_hift_golden.py verifies numerics against
a torch oracle built from the same public layout (tools/cosyvoice_oracle.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mingunivision_tpu.ops.conv import conv1d, conv1d_init, conv1d_transpose, conv1d_transpose_init
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.utils.init import linear_init


@dataclass(frozen=True)
class HiFTGeneratorConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 22050
    nsf_alpha: float = 0.1  # sine amplitude
    nsf_sigma: float = 0.003  # additive noise std on voiced frames
    nsf_voiced_threshold: float = 10.0
    upsample_rates: tuple = (8, 8)
    upsample_kernel_sizes: tuple = (16, 16)
    istft_n_fft: int = 16
    istft_hop_len: int = 4
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    source_resblock_kernel_sizes: tuple = (7, 11)
    source_resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5))
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99
    f0_cond_channels: int = 512

    @property
    def upsample_scale(self) -> int:
        s = self.istft_hop_len
        for r in self.upsample_rates:
            s *= r
        return s  # samples per mel frame (256 at defaults)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _resblock_init(key, ch, kernel, dilations, dtype):
    ks = jax.random.split(key, 2 * len(dilations))
    return {
        "convs1": [conv1d_init(ks[2 * i], ch, ch, kernel, dtype) for i in range(len(dilations))],
        "convs2": [conv1d_init(ks[2 * i + 1], ch, ch, kernel, dtype) for i in range(len(dilations))],
        "alpha1": [jnp.ones((ch,), dtype) for _ in dilations],
        "alpha2": [jnp.ones((ch,), dtype) for _ in dilations],
    }


def init_hift_generator_params(key, cfg: HiFTGeneratorConfig, dtype=jnp.float32):
    ks = list(jax.random.split(key, 128))
    cc = cfg.f0_cond_channels
    p = {
        "f0_predictor": {
            "condnet": [
                conv1d_init(ks.pop(), cfg.in_channels if i == 0 else cc, cc, 3, dtype) for i in range(5)
            ],
            "classifier": linear_init(ks.pop(), cc, 1, bias=True, dtype=dtype),
        },
        "m_source": {"l_linear": linear_init(ks.pop(), cfg.nb_harmonics + 1, 1, bias=True, dtype=dtype)},
        "conv_pre": conv1d_init(ks.pop(), cfg.in_channels, cfg.base_channels, 7, dtype),
    }
    nfft2 = cfg.istft_n_fft + 2
    ch = cfg.base_channels
    ups, source_downs, source_resblocks, resblocks = [], [], [], []
    # downsample_cum_rates[::-1] over [1] + rates[::-1][:-1] -> (8, 1) at defaults
    down_cum = [1]
    for r in cfg.upsample_rates[::-1][:-1]:
        down_cum.append(down_cum[-1] * r)
    down_cum = down_cum[::-1]
    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ups.append(conv1d_transpose_init(ks.pop(), ch, ch // 2, k, dtype))
        ch //= 2
        u = down_cum[i]
        sk = cfg.source_resblock_kernel_sizes[i]
        sd = cfg.source_resblock_dilation_sizes[i]
        if u == 1:
            source_downs.append(conv1d_init(ks.pop(), nfft2, ch, 1, dtype))
        else:
            source_downs.append(conv1d_init(ks.pop(), nfft2, ch, u * 2, dtype))
        source_resblocks.append(_resblock_init(ks.pop(), ch, sk, sd, dtype))
        for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            resblocks.append(_resblock_init(ks.pop(), ch, rk, rd, dtype))
    p["ups"] = ups
    p["source_downs"] = source_downs
    p["source_resblocks"] = source_resblocks
    p["resblocks"] = resblocks
    p["conv_post"] = conv1d_init(ks.pop(), ch, nfft2, 7, dtype)
    return p


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------


def _snake(x, alpha):
    """Snake activation x + sin^2(alpha x)/alpha (per-channel alpha, BigVGAN)."""
    a = alpha[None, :, None].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(a * xf))).astype(x.dtype)


def _resblock_apply(x, p, dilations):
    for i, d in enumerate(dilations):
        y = _snake(x, p["alpha1"][i])
        y = conv1d(y, p["convs1"][i], dilation=d)
        y = _snake(y, p["alpha2"][i])
        y = conv1d(y, p["convs2"][i])
        x = x + y
    return x


def f0_predictor_apply(params, mel):
    """ConvRNNF0Predictor: mel (B, in_ch, T) -> f0 (B, T) (non-negative)."""
    x = mel
    for conv in params["condnet"]:
        x = jax.nn.elu(conv1d(x, conv).astype(jnp.float32)).astype(mel.dtype)
    x = dense(x.transpose(0, 2, 1), params["classifier"])  # (B, T, 1)
    return jnp.abs(x[..., 0])


def sine_gen(cfg: HiFTGeneratorConfig, f0_up, key, rand_ini=None):
    """SineGen: upsampled f0 (B, T) -> harmonic sines (B, T, nb_harmonics+1).

    Voiced frames (f0 > threshold) carry amplitude-nsf_alpha sines plus
    nsf_sigma noise; unvoiced frames are pure noise at nsf_alpha/3. rand_ini is
    the random initial phase per harmonic (harmonic 0 pinned to phase 0)."""
    B, T = f0_up.shape
    H = cfg.nb_harmonics + 1
    mult = jnp.arange(1, H + 1, dtype=jnp.float32)
    rad = (f0_up[..., None].astype(jnp.float32) * mult / cfg.sampling_rate) % 1.0
    k_ini, k_noise = jax.random.split(key)
    if rand_ini is None:
        rand_ini = jax.random.uniform(k_ini, (B, H)).at[:, 0].set(0.0)
    rad = rad.at[:, 0, :].add(rand_ini)
    # bounded-phase cumsum: subtract 1 at every wrap so partial sums stay O(1)
    # (a naive fp32 cumsum of T*f0/sr drifts ~N*eps*sum and scrambles the phase)
    tmp = jnp.cumsum(rad, axis=1) % 1.0
    wrap = (tmp[:, 1:, :] - tmp[:, :-1, :]) < 0
    shift = jnp.pad(jnp.where(wrap, -1.0, 0.0), ((0, 0), (1, 0), (0, 0)))
    sines = jnp.sin(2.0 * jnp.pi * jnp.cumsum(rad + shift, axis=1)) * cfg.nsf_alpha
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)[..., None]
    noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * (cfg.nsf_alpha / 3.0)
    noise = noise_amp * jax.random.normal(k_noise, sines.shape)
    return sines * uv + noise


def source_module_apply(params, cfg: HiFTGeneratorConfig, f0_up, key, rand_ini=None):
    """SourceModuleHnNSF: f0 (B, T) at sample rate -> source (B, 1, T)."""
    sines = sine_gen(cfg, f0_up, key, rand_ini)
    merged = jnp.tanh(dense(sines, params["m_source"]["l_linear"]))  # (B, T, 1)
    return merged.transpose(0, 2, 1)


def _hann_periodic(n):
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n)


def stft_ri(x, n_fft: int, hop: int):
    """torch.stft(center=True, hann) equivalence: x (B, T) -> (real, imag),
    each (B, n_fft//2+1, 1 + T//hop)."""
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + x.shape[1] // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = xp[:, idx] * _hann_periodic(n_fft)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    return spec.real.transpose(0, 2, 1), spec.imag.transpose(0, 2, 1)


def istft(magnitude, phase, n_fft: int, hop: int):
    """torch.istft(center=True, hann) equivalence. magnitude/phase:
    (B, n_fft//2+1, F) -> (B, (F-1)*hop)."""
    magnitude = jnp.minimum(magnitude, 1e2)
    spec = (magnitude * jnp.cos(phase) + 1j * magnitude * jnp.sin(phase)).transpose(0, 2, 1)
    win = _hann_periodic(n_fft)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * win  # (B, F, n_fft)
    B, F, _ = frames.shape
    total = (F - 1) * hop + n_fft
    idx = (jnp.arange(F)[:, None] * hop + jnp.arange(n_fft)[None, :]).reshape(-1)
    out = jnp.zeros((B, total), jnp.float32).at[:, idx].add(frames.reshape(B, -1))
    env = jnp.zeros((total,), jnp.float32).at[idx].add(jnp.tile(win * win, F))
    out = out / jnp.maximum(env, 1e-11)
    pad = n_fft // 2
    return out[:, pad : pad + (F - 1) * hop]


def hift_decode(params, cfg: HiFTGeneratorConfig, mel, source):
    """mel (B, in_ch, T), source (B, 1, T*upsample_scale) -> wav (B, T*scale)."""
    sr, si_ = stft_ri(source[:, 0, :], cfg.istft_n_fft, cfg.istft_hop_len)
    s_stft = jnp.concatenate([sr, si_], axis=1).astype(mel.dtype)

    down_cum = [1]
    for r in cfg.upsample_rates[::-1][:-1]:
        down_cum.append(down_cum[-1] * r)
    down_cum = down_cum[::-1]

    x = conv1d(mel, params["conv_pre"])
    nk = len(cfg.resblock_kernel_sizes)
    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, cfg.lrelu_slope)
        x = conv1d_transpose(x, params["ups"][i], stride=r, padding=(k - r) // 2)
        if i == len(cfg.upsample_rates) - 1:
            x = jnp.pad(x, ((0, 0), (0, 0), (1, 0)), mode="reflect")
        u = down_cum[i]
        if u == 1:
            si = conv1d(s_stft, params["source_downs"][i])
        else:
            si = conv1d(s_stft, params["source_downs"][i], stride=u, padding=u // 2)
        si = _resblock_apply(
            si, params["source_resblocks"][i], cfg.source_resblock_dilation_sizes[i]
        )
        x = x + si
        acc = None
        for j in range(nk):
            y = _resblock_apply(x, params["resblocks"][i * nk + j], cfg.resblock_dilation_sizes[j])
            acc = y if acc is None else acc + y
        x = acc / nk
    x = jax.nn.leaky_relu(x)  # final activation uses default slope (reference quirk)
    x = conv1d(x, params["conv_post"]).astype(jnp.float32)
    nb = cfg.istft_n_fft // 2 + 1
    magnitude = jnp.exp(x[:, :nb, :])
    phase = jnp.sin(x[:, nb:, :])
    wav = istft(magnitude, phase, cfg.istft_n_fft, cfg.istft_hop_len)
    return jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)


def hift_inference(params, cfg: HiFTGeneratorConfig, speech_feat, key, cache_source=None, rand_ini=None):
    """HiFTGenerator.inference(speech_feat, cache_source) -> (speech, source).

    speech_feat: mel (B, in_ch, T). cache_source, when given, overwrites the
    head of the freshly generated NSF source for streaming continuity
    (reference hift cache, modeling_bailing_talker.py:574-599)."""
    f0 = f0_predictor_apply(params["f0_predictor"], speech_feat)  # (B, T)
    f0_up = jnp.repeat(f0, cfg.upsample_scale, axis=1)  # nearest upsample
    source = source_module_apply(params, cfg, f0_up, key, rand_ini)  # (B, 1, S)
    if cache_source is not None and cache_source.shape[2] > 0:
        source = jax.lax.dynamic_update_slice(source, cache_source.astype(source.dtype), (0, 0, 0))
    speech = hift_decode(params, cfg, speech_feat, source)
    return speech, source
