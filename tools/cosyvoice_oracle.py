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


# ===========================================================================
# Flow: UpsampleConformerEncoder + CausalConditionalCFM (public CosyVoice2
# layout; reference drives flow.inference via modeling_bailing_talker.py:553)
# ===========================================================================


class EspnetRelPositionalEncoding(nn.Module):
    """Scales x by sqrt(d) and returns the (1, 2T-1, d) rel-pos embedding
    (positions T-1 .. -(T-1)). No learnable parameters."""

    def __init__(self, d_model):
        super().__init__()
        self.d_model = d_model
        self.xscale = math.sqrt(d_model)

    def forward(self, x):
        T = x.size(1)
        pos = torch.arange(T - 1, -T, -1, dtype=torch.float32).unsqueeze(1)
        div = torch.exp(torch.arange(0, self.d_model, 2).float() * -(math.log(10000.0) / self.d_model))
        pe = torch.zeros(2 * T - 1, self.d_model)
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        return x * self.xscale, pe.unsqueeze(0)


class LinearNoSubsampling(nn.Module):
    def __init__(self, idim, odim):
        super().__init__()
        self.out = nn.Sequential(nn.Linear(idim, odim), nn.LayerNorm(odim, eps=1e-5), nn.Dropout(0.0))
        self.pos_enc = EspnetRelPositionalEncoding(odim)

    def forward(self, x):
        x = self.out(x)
        return self.pos_enc(x)


class RelPositionMultiHeadedAttention(nn.Module):
    def __init__(self, n_head, n_feat, key_bias=True):
        super().__init__()
        self.d_k = n_feat // n_head
        self.h = n_head
        self.linear_q = nn.Linear(n_feat, n_feat)
        self.linear_k = nn.Linear(n_feat, n_feat, bias=key_bias)
        self.linear_v = nn.Linear(n_feat, n_feat)
        self.linear_out = nn.Linear(n_feat, n_feat)
        self.linear_pos = nn.Linear(n_feat, n_feat, bias=False)
        self.pos_bias_u = nn.Parameter(torch.zeros(self.h, self.d_k))
        self.pos_bias_v = nn.Parameter(torch.zeros(self.h, self.d_k))

    def rel_shift(self, x):
        zero_pad = torch.zeros((x.size(0), x.size(1), x.size(2), 1), dtype=x.dtype)
        x_padded = torch.cat([zero_pad, x], dim=-1)
        x_padded = x_padded.view(x.size(0), x.size(1), x.size(3) + 1, x.size(2))
        x = x_padded[:, :, 1:].view_as(x)[:, :, :, : x.size(-1) // 2 + 1]
        return x

    def forward(self, x, pos_emb, mask=None):
        B, T, _ = x.shape
        q = self.linear_q(x).view(B, T, self.h, self.d_k)
        k = self.linear_k(x).view(B, T, self.h, self.d_k).transpose(1, 2)
        v = self.linear_v(x).view(B, T, self.h, self.d_k).transpose(1, 2)
        p = self.linear_pos(pos_emb).view(pos_emb.size(0), -1, self.h, self.d_k).transpose(1, 2)
        q_u = (q + self.pos_bias_u).transpose(1, 2)
        q_v = (q + self.pos_bias_v).transpose(1, 2)
        matrix_ac = torch.matmul(q_u, k.transpose(-2, -1))
        matrix_bd = self.rel_shift(torch.matmul(q_v, p.transpose(-2, -1)))
        scores = (matrix_ac + matrix_bd) / math.sqrt(self.d_k)
        if mask is not None:
            scores = scores.masked_fill(~mask.unsqueeze(0).unsqueeze(0), float("-inf"))
        attn = torch.softmax(scores, dim=-1)
        out = torch.matmul(attn, v).transpose(1, 2).reshape(B, T, -1)
        return self.linear_out(out)


class PositionwiseFeedForward(nn.Module):
    def __init__(self, idim, hidden_units):
        super().__init__()
        self.w_1 = nn.Linear(idim, hidden_units)
        self.activation = nn.ReLU()
        self.dropout = nn.Dropout(0.0)
        self.w_2 = nn.Linear(hidden_units, idim)

    def forward(self, x):
        return self.w_2(self.dropout(self.activation(self.w_1(x))))


class ConformerEncoderLayer(nn.Module):
    """use_cnn_module=False, macaron_style=False, normalize_before=True."""

    def __init__(self, size, self_attn, feed_forward):
        super().__init__()
        self.self_attn = self_attn
        self.feed_forward = feed_forward
        self.norm_mha = nn.LayerNorm(size, eps=1e-5)
        self.norm_ff = nn.LayerNorm(size, eps=1e-5)

    def forward(self, x, pos_emb, mask=None):
        x = x + self.self_attn(self.norm_mha(x), pos_emb, mask)
        x = x + self.feed_forward(self.norm_ff(x))
        return x


class PreLookaheadLayer(nn.Module):
    def __init__(self, channels, pre_lookahead_len=1):
        super().__init__()
        self.pre_lookahead_len = pre_lookahead_len
        self.conv1 = nn.Conv1d(channels, channels, pre_lookahead_len + 1, stride=1, padding=0)
        self.conv2 = nn.Conv1d(channels, channels, 3, stride=1, padding=0)

    def forward(self, inputs, context=None):
        outputs = inputs.transpose(1, 2).contiguous()
        if context is None:
            outputs = F.pad(outputs, (0, self.pre_lookahead_len))
        else:
            outputs = torch.cat([outputs, context.transpose(1, 2).contiguous()], dim=2)
        outputs = F.leaky_relu(self.conv1(outputs))
        outputs = self.conv2(F.pad(outputs, (2, 0)))
        return inputs + outputs.transpose(1, 2).contiguous()


class Upsample1D(nn.Module):
    def __init__(self, channels, out_channels, stride=2):
        super().__init__()
        self.stride = stride
        self.conv = nn.Conv1d(channels, out_channels, stride * 2 + 1, stride=1, padding=0)

    def forward(self, inputs):
        outputs = F.interpolate(inputs, scale_factor=float(self.stride), mode="nearest")
        outputs = F.pad(outputs, (self.stride * 2, 0))
        return self.conv(outputs)


def _chunk_mask(T, chunk):
    t = torch.arange(T)
    limit = (t // chunk + 1) * chunk
    return torch.arange(T)[None, :] < limit[:, None]


class UpsampleConformerEncoder(nn.Module):
    def __init__(
        self,
        input_size=512,
        output_size=512,
        attention_heads=8,
        linear_units=2048,
        num_blocks=6,
        num_up_blocks=4,
        pre_lookahead_len=3,
        up_stride=2,
        static_chunk_size=25,
    ):
        super().__init__()
        self.static_chunk_size = static_chunk_size
        self.embed = LinearNoSubsampling(input_size, output_size)
        self.pre_lookahead_layer = PreLookaheadLayer(output_size, pre_lookahead_len)
        self.encoders = nn.ModuleList(
            [
                ConformerEncoderLayer(
                    output_size,
                    RelPositionMultiHeadedAttention(attention_heads, output_size),
                    PositionwiseFeedForward(output_size, linear_units),
                )
                for _ in range(num_blocks)
            ]
        )
        self.up_layer = Upsample1D(output_size, output_size, up_stride)
        self.up_embed = LinearNoSubsampling(input_size, output_size)
        self.up_encoders = nn.ModuleList(
            [
                ConformerEncoderLayer(
                    output_size,
                    RelPositionMultiHeadedAttention(attention_heads, output_size),
                    PositionwiseFeedForward(output_size, linear_units),
                )
                for _ in range(num_up_blocks)
            ]
        )
        self.after_norm = nn.LayerNorm(output_size, eps=1e-5)

    def forward(self, xs, context=None, streaming=False):
        xs, pos_emb = self.embed(xs)
        if context is not None:
            context = self.embed.out(context) * self.embed.pos_enc.xscale
        xs = self.pre_lookahead_layer(xs, context=context)
        mask = _chunk_mask(xs.size(1), self.static_chunk_size) if streaming else None
        for layer in self.encoders:
            xs = layer(xs, pos_emb, mask)
        xs = self.up_layer(xs.transpose(1, 2).contiguous()).transpose(1, 2).contiguous()
        xs, pos_emb = self.up_embed(xs)
        mask = (
            _chunk_mask(xs.size(1), self.static_chunk_size * self.up_layer.stride)
            if streaming
            else None
        )
        for layer in self.up_encoders:
            xs = layer(xs, pos_emb, mask)
        return self.after_norm(xs)


# ---------------------------------------------------------------------------
# matcha-style causal U-Net estimator
# ---------------------------------------------------------------------------


class SinusoidalPosEmb(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, x, scale=1000):
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = torch.exp(torch.arange(half_dim).float() * -emb)
        emb = scale * x.unsqueeze(1) * emb.unsqueeze(0)
        return torch.cat((emb.sin(), emb.cos()), dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.act = nn.SiLU()
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, x):
        return self.linear_2(self.act(self.linear_1(x)))


class CausalConv1d(nn.Conv1d):
    def __init__(self, in_ch, out_ch, kernel):
        super().__init__(in_ch, out_ch, kernel, padding=0)
        self._left_pad = kernel - 1

    def forward(self, x):
        return super().forward(F.pad(x, (self._left_pad, 0)))


class Mish(nn.Module):
    def forward(self, x):
        return x * torch.tanh(F.softplus(x))


class CausalBlock1D(nn.Module):
    def __init__(self, dim, dim_out, groups=8):
        super().__init__()
        self.block = nn.Sequential(CausalConv1d(dim, dim_out, 3), nn.GroupNorm(groups, dim_out), Mish())

    def forward(self, x, mask):
        return self.block(x * mask) * mask


class CausalResnetBlock1D(nn.Module):
    def __init__(self, dim, dim_out, time_emb_dim, groups=8):
        super().__init__()
        self.mlp = nn.Sequential(Mish(), nn.Linear(time_emb_dim, dim_out))
        self.block1 = CausalBlock1D(dim, dim_out, groups)
        self.block2 = CausalBlock1D(dim_out, dim_out, groups)
        self.res_conv = nn.Conv1d(dim, dim_out, 1)

    def forward(self, x, mask, time_emb):
        h = self.block1(x, mask)
        h = h + self.mlp(time_emb).unsqueeze(-1)
        h = self.block2(h, mask)
        return h + self.res_conv(x * mask)


class _Attention(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.dim_head = dim_head
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(dim, inner, bias=False)
        self.to_v = nn.Linear(dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim), nn.Dropout(0.0)])

    def forward(self, x, attn_mask=None):
        B, T, _ = x.shape
        q = self.to_q(x).view(B, T, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(x).view(B, T, self.heads, self.dim_head).transpose(1, 2)
        v = self.to_v(x).view(B, T, self.heads, self.dim_head).transpose(1, 2)
        scores = q @ k.transpose(-2, -1) / math.sqrt(self.dim_head)
        if attn_mask is not None:
            scores = scores.masked_fill(~attn_mask.unsqueeze(0).unsqueeze(0), float("-inf"))
        out = torch.softmax(scores, dim=-1) @ v
        out = out.transpose(1, 2).reshape(B, T, -1)
        return self.to_out[1](self.to_out[0](out))


class _GELUProj(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)

    def forward(self, x):
        return F.gelu(self.proj(x))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, num_heads, head_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = _Attention(dim, num_heads, head_dim)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = nn.Sequential()
        self.ff.net = nn.ModuleList([_GELUProj(dim, dim * 4), nn.Dropout(0.0), nn.Linear(dim * 4, dim)])

    def forward(self, x, attn_mask=None):
        x = x + self.attn1(self.norm1(x), attn_mask)
        y = self.norm3(x)
        y = self.ff.net[2](self.ff.net[1](self.ff.net[0](y)))
        return x + y


class CausalConditionalDecoder(nn.Module):
    def __init__(
        self,
        in_channels=320,
        out_channels=80,
        channels=(256,),
        attention_head_dim=64,
        n_blocks=4,
        num_mid_blocks=12,
        num_heads=8,
        static_chunk_size=50,
    ):
        super().__init__()
        assert len(channels) == 1
        ch = channels[0]
        time_embed_dim = ch * 4
        self.static_chunk_size = static_chunk_size
        self.time_embeddings = SinusoidalPosEmb(in_channels)
        self.time_mlp = TimestepEmbedding(in_channels, time_embed_dim)

        def tblocks():
            return nn.ModuleList(
                [BasicTransformerBlock(ch, num_heads, attention_head_dim) for _ in range(n_blocks)]
            )

        self.down_blocks = nn.ModuleList(
            [
                nn.ModuleList(
                    [
                        CausalResnetBlock1D(in_channels, ch, time_embed_dim),
                        tblocks(),
                        CausalConv1d(ch, ch, 3),
                    ]
                )
            ]
        )
        self.mid_blocks = nn.ModuleList(
            [
                nn.ModuleList([CausalResnetBlock1D(ch, ch, time_embed_dim), tblocks()])
                for _ in range(num_mid_blocks)
            ]
        )
        self.up_blocks = nn.ModuleList(
            [
                nn.ModuleList(
                    [
                        CausalResnetBlock1D(ch * 2, ch, time_embed_dim),
                        tblocks(),
                        CausalConv1d(ch, ch, 3),
                    ]
                )
            ]
        )
        self.final_block = CausalBlock1D(ch, ch)
        self.final_proj = nn.Conv1d(ch, out_channels, 1)

    def forward(self, x, mask, mu, t, spks, cond, streaming=False):
        t = self.time_mlp(self.time_embeddings(t).to(x.dtype))
        spks_t = spks.unsqueeze(-1).expand(-1, -1, x.shape[-1])
        x = torch.cat([x, mu, spks_t, cond], dim=1)
        attn_mask = _chunk_mask(x.size(2), self.static_chunk_size) if streaming else None

        def run_stage(resnet, tblocks, h):
            h = resnet(h, mask, t)
            h = h.transpose(1, 2).contiguous()
            for tb in tblocks:
                h = tb(h, attn_mask)
            return h.transpose(1, 2).contiguous()

        resnet, tbs, down = self.down_blocks[0]
        x = run_stage(resnet, tbs, x)
        skip = x
        x = down(x * mask)
        for resnet, tbs in self.mid_blocks:
            x = run_stage(resnet, tbs, x)
        resnet, tbs, up = self.up_blocks[0]
        x = torch.cat([x, skip], dim=1)
        x = run_stage(resnet, tbs, x)
        x = up(x * mask)
        x = self.final_block(x, mask)
        return self.final_proj(x * mask) * mask


class CausalConditionalCFM(nn.Module):
    def __init__(self, estimator, inference_cfg_rate=0.7):
        super().__init__()
        self.estimator = estimator
        self.inference_cfg_rate = inference_cfg_rate

    @torch.inference_mode()
    def forward(self, mu, mask, n_timesteps, spks, cond, noise, streaming=False):
        z = noise
        t_span = torch.linspace(0, 1, n_timesteps + 1)
        t_span = 1 - torch.cos(t_span * 0.5 * torch.pi)
        x = z * mask
        B = mu.size(0)
        for step in range(1, len(t_span)):
            t = t_span[step - 1]
            dt = t_span[step] - t_span[step - 1]
            x_in = torch.cat([x, x], dim=0)
            mask_in = torch.cat([mask, mask], dim=0)
            mu_in = torch.cat([mu, torch.zeros_like(mu)], dim=0)
            t_in = t.repeat(2 * B)
            spks_in = torch.cat([spks, torch.zeros_like(spks)], dim=0)
            cond_in = torch.cat([cond, torch.zeros_like(cond)], dim=0)
            dphi = self.estimator(x_in, mask_in, mu_in, t_in, spks_in, cond_in, streaming)
            dphi, cfg_dphi = dphi[:B], dphi[B:]
            dphi = (1.0 + self.inference_cfg_rate) * dphi - self.inference_cfg_rate * cfg_dphi
            x = x + dt * dphi
        return x.float()


class CausalMaskedDiffWithXvec(nn.Module):
    def __init__(
        self,
        input_size=512,
        output_size=80,
        spk_embed_dim=192,
        vocab_size=6561,
        encoder=None,
        decoder=None,
        pre_lookahead_len=3,
        n_timesteps=10,
    ):
        super().__init__()
        self.output_size = output_size
        self.pre_lookahead_len = pre_lookahead_len
        self.n_timesteps = n_timesteps
        self.input_embedding = nn.Embedding(vocab_size, input_size)
        self.spk_embed_affine_layer = nn.Linear(spk_embed_dim, output_size)
        self.encoder = encoder
        self.encoder_proj = nn.Linear(encoder.after_norm.normalized_shape[0], output_size)
        self.decoder = decoder

    @torch.inference_mode()
    def inference(self, token, prompt_token, prompt_feat, embedding, noise, streaming=False, finalize=True):
        embedding = F.normalize(embedding, dim=1)
        embedding = self.spk_embed_affine_layer(embedding)
        token = torch.cat([prompt_token, token], dim=1)
        token = self.input_embedding(torch.clamp(token, min=0))
        if finalize:
            h = self.encoder(token, streaming=streaming)
        else:
            h = self.encoder(
                token[:, : -self.pre_lookahead_len],
                context=token[:, -self.pre_lookahead_len :],
                streaming=streaming,
            )
        h = self.encoder_proj(h)
        mel_len1 = prompt_feat.shape[1]
        conds = torch.zeros([h.size(0), h.size(1), self.output_size], dtype=h.dtype)
        conds[:, :mel_len1] = prompt_feat
        mask = torch.ones(h.size(0), 1, h.size(1), dtype=h.dtype)
        feat = self.decoder(
            mu=h.transpose(1, 2).contiguous(),
            mask=mask,
            n_timesteps=self.n_timesteps,
            spks=embedding,
            cond=conds.transpose(1, 2),
            noise=noise[:, :, : h.size(1)],
            streaming=streaming,
        )
        return feat[:, :, mel_len1:].float()
