"""Audio encoder + long-context util tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.models.audio_encoder import (
    AudioEncoderConfig,
    audio_encoder_apply,
    init_audio_encoder_params,
    log_mel_spectrogram,
    patch_audio_features,
)
from mingunivision_tpu.utils.longcontext import SlidingMemCache, generate_passkey_prompt


class TestAudioEncoder:
    def test_shapes_and_subsampling(self):
        cfg = AudioEncoderConfig(n_mels=16, n_state=32, n_layer=1, n_head=2, n_ctx=128, out_dim=64)
        params = init_audio_encoder_params(jax.random.PRNGKey(0), cfg)
        mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 64)), jnp.float32)
        emb, lengths = audio_encoder_apply(params, cfg, mel, lengths=jnp.asarray([64, 40]))
        # whisper conv2 (s2, p1): (64-1)//2+1 = 32; ds conv (s2, p1): (32-1)//2+1 = 16
        assert emb.shape == (2, 16, 64)
        np.testing.assert_array_equal(np.asarray(lengths), [16, 10])

    def test_log_mel_shape(self):
        sr = 16000
        wav = np.sin(np.linspace(0, 100, sr)).astype(np.float32)
        mel = log_mel_spectrogram(wav, sr=sr, n_mels=32)
        assert mel.shape[0] == 32
        assert mel.shape[1] > 90  # ~100 frames/sec
        assert np.isfinite(mel).all()

    def test_patch_audio_features(self):
        AUDIO_PATCH = 7
        ids = np.array([[1, AUDIO_PATCH, AUDIO_PATCH, 2]])
        embeds = jnp.zeros((1, 4, 8))
        audio = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 2, 8))
        out, mask = patch_audio_features(embeds, jnp.asarray(ids), audio, None, AUDIO_PATCH)
        np.testing.assert_allclose(np.asarray(out[0, 1]), np.arange(8))
        assert np.asarray(mask).tolist() == [[False, True, True, False]]


class TestLongContext:
    def test_passkey_prompt(self):
        prompt, answer = generate_passkey_prompt("42817", context_tokens=1000)
        assert "42817" in prompt and answer == "42817"
        assert prompt.endswith("The pass key is")
        assert len(prompt.split()) > 800

    def test_sliding_mem_cache_mask(self):
        mc = SlidingMemCache(budget=8, keep_first=2)
        m = np.asarray(mc.retention_mask(jnp.int32(12), 16))
        # first 2 kept, last 6 of the 12 kept, middle dropped, tail invalid
        assert m[:2].all()
        assert not m[2:6].any()
        assert m[6:12].all()
        assert not m[12:].any()
        # under budget: everything valid kept
        m2 = np.asarray(mc.retention_mask(jnp.int32(5), 16))
        assert m2[:5].all() and not m2[5:].any()
