"""Golden tests: JAX HiFTGenerator (talker/hift.py) vs torch oracle.

The oracle (tools/cosyvoice_oracle.py) recreates the public CosyVoice
HiFTGenerator layout the reference's audio_detokenizer wheel serializes
(modeling_bailing_talker.py:585-608 drives hift.inference). These tests verify
conversion (weight-norm folding, ConvTranspose layout) and numerics (Snake,
ELU condnet, NSF source, STFT fusion, torch.istft equivalence) end to end.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")

torch = pytest.importorskip("torch")

from mingunivision_tpu.talker.hift import (  # noqa: E402
    HiFTGeneratorConfig,
    hift_inference,
    init_hift_generator_params,
    istft,
    stft_ri,
)
from mingunivision_tpu.utils.convert import hift_generator_params_from_torch  # noqa: E402


def _tiny_cfg():
    # Real geometry (8x8 upsample, 16/4 iSTFT) at toy widths; noise disabled and
    # every frame voiced so both sides are deterministic.
    return HiFTGeneratorConfig(
        in_channels=8,
        base_channels=32,
        nb_harmonics=2,
        nsf_sigma=0.0,
        nsf_voiced_threshold=-1.0,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 2)),
        source_resblock_kernel_sizes=(3, 3),
        source_resblock_dilation_sizes=((1, 2), (1, 2)),
        f0_cond_channels=16,
    )


def _oracle(cfg):
    from cosyvoice_oracle import HiFTGenerator

    torch.manual_seed(0)
    return HiFTGenerator(
        in_channels=cfg.in_channels,
        base_channels=cfg.base_channels,
        nb_harmonics=cfg.nb_harmonics,
        sampling_rate=cfg.sampling_rate,
        nsf_alpha=cfg.nsf_alpha,
        nsf_sigma=cfg.nsf_sigma,
        nsf_voiced_threshold=cfg.nsf_voiced_threshold,
        upsample_rates=cfg.upsample_rates,
        upsample_kernel_sizes=cfg.upsample_kernel_sizes,
        istft_params={"n_fft": cfg.istft_n_fft, "hop_len": cfg.istft_hop_len},
        resblock_kernel_sizes=cfg.resblock_kernel_sizes,
        resblock_dilation_sizes=cfg.resblock_dilation_sizes,
        source_resblock_kernel_sizes=cfg.source_resblock_kernel_sizes,
        source_resblock_dilation_sizes=cfg.source_resblock_dilation_sizes,
        lrelu_slope=cfg.lrelu_slope,
        audio_limit=cfg.audio_limit,
        f0_cond_channels=cfg.f0_cond_channels,
    ).eval()


def test_stft_istft_match_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 256)).astype(np.float32)
    n_fft, hop = 16, 4
    win = torch.hann_window(n_fft)
    spec = torch.stft(torch.from_numpy(x), n_fft, hop, n_fft, window=win, return_complex=True)
    r, i = stft_ri(jnp.asarray(x), n_fft, hop)
    np.testing.assert_allclose(np.asarray(r), spec.real.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(i), spec.imag.numpy(), atol=1e-4)

    mag = rng.uniform(0.1, 2.0, (2, n_fft // 2 + 1, 40)).astype(np.float32)
    ph = rng.uniform(-1.0, 1.0, (2, n_fft // 2 + 1, 40)).astype(np.float32)
    ref = torch.istft(
        torch.complex(torch.from_numpy(mag * np.cos(ph)), torch.from_numpy(mag * np.sin(ph))),
        n_fft,
        hop,
        n_fft,
        window=win,
    )
    got = istft(jnp.asarray(mag), jnp.asarray(ph), n_fft, hop)
    assert got.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-4)


def test_hift_inference_matches_oracle():
    cfg = _tiny_cfg()
    oracle = _oracle(cfg)
    params = hift_generator_params_from_torch(oracle.state_dict(), cfg)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, cfg.in_channels, 12)).astype(np.float32)
    rand_ini = rng.uniform(0, 1, (1, cfg.nb_harmonics + 1)).astype(np.float32)
    rand_ini[:, 0] = 0.0

    ref_speech, ref_source = oracle.inference(
        torch.from_numpy(mel), rand_ini=torch.from_numpy(rand_ini)
    )
    speech, source = hift_inference(
        params, cfg, jnp.asarray(mel), jax.random.PRNGKey(0), rand_ini=jnp.asarray(rand_ini)
    )
    assert speech.shape == tuple(ref_speech.shape) == (1, 12 * cfg.upsample_scale)
    np.testing.assert_allclose(np.asarray(source), ref_source.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(speech), ref_speech.numpy(), atol=2e-3)


def test_hift_cache_source_streaming():
    cfg = _tiny_cfg()
    oracle = _oracle(cfg)
    params = hift_generator_params_from_torch(oracle.state_dict(), cfg)

    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, cfg.in_channels, 10)).astype(np.float32)
    cache = rng.standard_normal((1, 1, 64)).astype(np.float32) * 0.05
    rand_ini = np.zeros((1, cfg.nb_harmonics + 1), np.float32)

    ref_speech, ref_source = oracle.inference(
        torch.from_numpy(mel),
        cache_source=torch.from_numpy(cache.copy()),
        rand_ini=torch.from_numpy(rand_ini),
    )
    speech, source = hift_inference(
        params,
        cfg,
        jnp.asarray(mel),
        jax.random.PRNGKey(0),
        cache_source=jnp.asarray(cache),
        rand_ini=jnp.asarray(rand_ini),
    )
    # cached head replaced the generated source
    np.testing.assert_allclose(np.asarray(source)[:, :, :64], cache, atol=1e-6)
    np.testing.assert_allclose(np.asarray(source), ref_source.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(speech), ref_speech.numpy(), atol=2e-3)


def test_random_init_runs_and_shapes():
    cfg = _tiny_cfg()
    params = init_hift_generator_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.zeros((2, cfg.in_channels, 6), jnp.float32)
    speech, source = hift_inference(params, cfg, mel, jax.random.PRNGKey(1))
    assert speech.shape == (2, 6 * cfg.upsample_scale)
    assert source.shape == (2, 1, 6 * cfg.upsample_scale)
    assert bool(jnp.all(jnp.abs(speech) <= cfg.audio_limit + 1e-6))
