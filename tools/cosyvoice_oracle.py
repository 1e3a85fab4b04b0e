"""Torch oracle for the checkpoint-exact audio-detokenizer tier.

The reference's hift/flow live in the external `audio_detokenizer` wheel (not in
this image), whose architecture is the public CosyVoice HiFTGenerator /
CausalMaskedDiffWithXvec. This file re-creates those modules in torch FROM THE
PUBLIC LAYOUT (no reference code involved) so that:

  - golden tests can verify the JAX implementations' numerics against torch ops
    (torch.istft, ConvTranspose1d, weight_norm folding, ELU/Snake, ...);
  - state-dict naming matches what `utils.convert.hift_generator_params_from_torch`
    expects from real checkpoints (old-style weight_g/weight_v keys).

CPU only; tests construct tiny configs. Deterministic hooks: SineGen takes an
explicit rand_ini and noise can be disabled via noise_std=0.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class Snake(nn.Module):
    def __init__(self, channels: int):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(channels))

    def forward(self, x):
        a = self.alpha.view(1, -1, 1)
        return x + (1.0 / (a + 1e-9)) * torch.sin(a * x) ** 2


class ResBlock(nn.Module):
    def __init__(self, channels, kernel_size=3, dilations=(1, 3, 5)):
        super().__init__()
        self.convs1 = nn.ModuleList(
            [
                weight_norm(nn.Conv1d(channels, channels, kernel_size, 1, dilation=d, padding=get_padding(kernel_size, d)))
                for d in dilations
            ]
        )
        self.convs2 = nn.ModuleList(
            [
                weight_norm(nn.Conv1d(channels, channels, kernel_size, 1, dilation=1, padding=get_padding(kernel_size, 1)))
                for _ in dilations
            ]
        )
        self.activations1 = nn.ModuleList([Snake(channels) for _ in dilations])
        self.activations2 = nn.ModuleList([Snake(channels) for _ in dilations])

    def forward(self, x):
        for c1, c2, a1, a2 in zip(self.convs1, self.convs2, self.activations1, self.activations2):
            xt = a1(x)
            xt = c1(xt)
            xt = a2(xt)
            xt = c2(xt)
            x = xt + x
        return x


class ConvRNNF0Predictor(nn.Module):
    def __init__(self, num_class=1, in_channels=80, cond_channels=512):
        super().__init__()
        self.condnet = nn.Sequential(
            weight_norm(nn.Conv1d(in_channels, cond_channels, 3, padding=1)),
            nn.ELU(),
            weight_norm(nn.Conv1d(cond_channels, cond_channels, 3, padding=1)),
            nn.ELU(),
            weight_norm(nn.Conv1d(cond_channels, cond_channels, 3, padding=1)),
            nn.ELU(),
            weight_norm(nn.Conv1d(cond_channels, cond_channels, 3, padding=1)),
            nn.ELU(),
            weight_norm(nn.Conv1d(cond_channels, cond_channels, 3, padding=1)),
            nn.ELU(),
        )
        self.classifier = nn.Linear(cond_channels, num_class)

    def forward(self, x):
        x = self.condnet(x)
        x = x.transpose(1, 2)
        return torch.abs(self.classifier(x).squeeze(-1))


class SineGen(nn.Module):
    def __init__(self, samp_rate, harmonic_num=0, sine_amp=0.1, noise_std=0.003, voiced_threshold=0.0):
        super().__init__()
        self.sine_amp = sine_amp
        self.noise_std = noise_std
        self.harmonic_num = harmonic_num
        self.sampling_rate = samp_rate
        self.voiced_threshold = voiced_threshold

    def _f02uv(self, f0):
        return torch.ones_like(f0) * (f0 > self.voiced_threshold)

    def forward(self, f0, rand_ini=None):
        """f0: (B, T, 1) at sample rate -> sine (B, T, harmonic_num+1), uv, noise."""
        with torch.no_grad():
            B, T, _ = f0.shape
            f0_buf = f0 * torch.arange(1, self.harmonic_num + 2, dtype=f0.dtype).view(1, 1, -1)
            rad_values = (f0_buf / self.sampling_rate) % 1
            if rand_ini is None:
                rand_ini = torch.rand(B, self.harmonic_num + 1, device=f0.device)
                rand_ini[:, 0] = 0
            rad_values[:, 0, :] = rad_values[:, 0, :] + rand_ini
            tmp_over_one = torch.cumsum(rad_values, 1) % 1
            tmp_over_one_idx = (tmp_over_one[:, 1:, :] - tmp_over_one[:, :-1, :]) < 0
            cumsum_shift = torch.zeros_like(rad_values)
            cumsum_shift[:, 1:, :] = tmp_over_one_idx * -1.0
            sines = torch.sin(torch.cumsum(rad_values + cumsum_shift, dim=1) * 2 * math.pi)
            sine_waves = sines * self.sine_amp
            uv = self._f02uv(f0)
            noise_amp = uv * self.noise_std + (1 - uv) * self.sine_amp / 3
            noise = noise_amp * torch.randn_like(sine_waves)
            sine_waves = sine_waves * uv + noise
        return sine_waves, uv, noise


class SourceModuleHnNSF(nn.Module):
    def __init__(self, sampling_rate, harmonic_num=0, sine_amp=0.1, add_noise_std=0.003, voiced_threshod=0.0):
        super().__init__()
        self.sine_amp = sine_amp
        self.l_sin_gen = SineGen(sampling_rate, harmonic_num, sine_amp, add_noise_std, voiced_threshod)
        self.l_linear = nn.Linear(harmonic_num + 1, 1)
        self.l_tanh = nn.Tanh()

    def forward(self, x, rand_ini=None):
        sine_wavs, uv, _ = self.l_sin_gen(x, rand_ini)
        sine_merge = self.l_tanh(self.l_linear(sine_wavs))
        noise = torch.randn_like(uv) * self.sine_amp / 3
        return sine_merge, noise, uv


class HiFTGenerator(nn.Module):
    """NSF-HiFiGAN with iSTFT head (public CosyVoice layout)."""

    def __init__(
        self,
        in_channels=80,
        base_channels=512,
        nb_harmonics=8,
        sampling_rate=22050,
        nsf_alpha=0.1,
        nsf_sigma=0.003,
        nsf_voiced_threshold=10.0,
        upsample_rates=(8, 8),
        upsample_kernel_sizes=(16, 16),
        istft_params=None,
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        source_resblock_kernel_sizes=(7, 11),
        source_resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        lrelu_slope=0.1,
        audio_limit=0.99,
        f0_cond_channels=512,
    ):
        super().__init__()
        self.istft_params = istft_params or {"n_fft": 16, "hop_len": 4}
        self.lrelu_slope = lrelu_slope
        self.audio_limit = audio_limit
        self.num_kernels = len(resblock_kernel_sizes)
        self.num_upsamples = len(upsample_rates)
        self.upsample_rates = upsample_rates
        up_scale = 1
        for r in upsample_rates:
            up_scale *= r
        self.m_source = SourceModuleHnNSF(
            sampling_rate, nb_harmonics, nsf_alpha, nsf_sigma, nsf_voiced_threshold
        )
        self.f0_upsamp = nn.Upsample(scale_factor=up_scale * self.istft_params["hop_len"])
        self.conv_pre = weight_norm(nn.Conv1d(in_channels, base_channels, 7, 1, padding=3))
        self.ups = nn.ModuleList()
        ch = base_channels
        for r, k in zip(upsample_rates, upsample_kernel_sizes):
            self.ups.append(weight_norm(nn.ConvTranspose1d(ch, ch // 2, k, r, padding=(k - r) // 2)))
            ch //= 2
        self.source_downs = nn.ModuleList()
        self.source_resblocks = nn.ModuleList()
        downsample_rates = [1] + list(upsample_rates[::-1][:-1])
        down_cum = []
        c = 1
        for r in downsample_rates:
            c *= r
            down_cum.append(c)
        nfft2 = self.istft_params["n_fft"] + 2
        ch = base_channels
        for i, (u, k, d) in enumerate(
            zip(down_cum[::-1], source_resblock_kernel_sizes, source_resblock_dilation_sizes)
        ):
            ch //= 2
            if u == 1:
                self.source_downs.append(nn.Conv1d(nfft2, ch, 1, 1))
            else:
                self.source_downs.append(nn.Conv1d(nfft2, ch, u * 2, u, padding=u // 2))
            self.source_resblocks.append(ResBlock(ch, k, d))
        self.resblocks = nn.ModuleList()
        ch = base_channels
        for i in range(len(self.ups)):
            ch //= 2
            for k, d in zip(resblock_kernel_sizes, resblock_dilation_sizes):
                self.resblocks.append(ResBlock(ch, k, d))
        self.conv_post = weight_norm(nn.Conv1d(ch, nfft2, 7, 1, padding=3))
        self.reflection_pad = nn.ReflectionPad1d((1, 0))
        self.register_buffer("stft_window", torch.hann_window(self.istft_params["n_fft"]))
        self.f0_predictor = ConvRNNF0Predictor(1, in_channels, f0_cond_channels)

    def _stft(self, x):
        spec = torch.stft(
            x,
            self.istft_params["n_fft"],
            self.istft_params["hop_len"],
            self.istft_params["n_fft"],
            window=self.stft_window,
            return_complex=True,
        )
        return spec.real, spec.imag

    def _istft(self, magnitude, phase):
        magnitude = torch.clip(magnitude, max=1e2)
        real = magnitude * torch.cos(phase)
        img = magnitude * torch.sin(phase)
        return torch.istft(
            torch.complex(real, img),
            self.istft_params["n_fft"],
            self.istft_params["hop_len"],
            self.istft_params["n_fft"],
            window=self.stft_window,
        )

    def _f02source(self, f0, rand_ini=None):
        f0 = self.f0_upsamp(f0[:, None]).transpose(1, 2)  # (B, T_s, 1)
        s, _, _ = self.m_source(f0, rand_ini)
        return s.transpose(1, 2)

    def decode(self, x, s):
        s_r, s_i = self._stft(s.squeeze(1))
        s_stft = torch.cat([s_r, s_i], dim=1)
        x = self.conv_pre(x)
        for i in range(self.num_upsamples):
            x = F.leaky_relu(x, self.lrelu_slope)
            x = self.ups[i](x)
            if i == self.num_upsamples - 1:
                x = self.reflection_pad(x)
            si = self.source_downs[i](s_stft)
            si = self.source_resblocks[i](si)
            x = x + si
            xs = None
            for j in range(self.num_kernels):
                y = self.resblocks[i * self.num_kernels + j](x)
                xs = y if xs is None else xs + y
            x = xs / self.num_kernels
        x = F.leaky_relu(x)
        x = self.conv_post(x)
        nb = self.istft_params["n_fft"] // 2 + 1
        magnitude = torch.exp(x[:, :nb, :])
        phase = torch.sin(x[:, nb:, :])
        x = self._istft(magnitude, phase)
        return torch.clamp(x, -self.audio_limit, self.audio_limit)

    @torch.inference_mode()
    def inference(self, speech_feat, cache_source=None, rand_ini=None):
        f0 = self.f0_predictor(speech_feat)
        s = self._f02source(f0, rand_ini)
        if cache_source is not None and cache_source.shape[2] != 0:
            s[:, :, : cache_source.shape[2]] = cache_source
        return self.decode(speech_feat, s), s
