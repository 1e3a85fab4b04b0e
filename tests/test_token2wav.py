"""Exact-tier token2wav streaming semantics (talker/token2wav.py).

Mirrors the reference cache/fade protocol (modeling_bailing_talker.py:533-614):
chunked emission after token_hop + lookahead tokens, mel/source/speech caches,
hamming crossfade, finalize flush. Uses random weights (shape/protocol tests —
weight-level parity is covered by test_flow_golden / test_hift_golden).
"""

import numpy as np

import jax
import jax.numpy as jnp

from mingunivision_tpu.talker.flow import CFMDecoderConfig, FlowConfig
from mingunivision_tpu.talker.flow_encoder import UpsampleConformerConfig
from mingunivision_tpu.talker.hift import HiFTGeneratorConfig
from mingunivision_tpu.talker.token2wav import CosyVoiceDetokenizer, T2WState, fade_in_out


def _tiny_detok(**kw):
    flow_cfg = FlowConfig(
        vocab_size=32,
        input_size=16,
        output_size=8,
        spk_embed_dim=4,
        encoder=UpsampleConformerConfig(
            input_size=16, output_size=16, attention_heads=2, linear_units=24,
            num_blocks=1, num_up_blocks=1, pre_lookahead_len=3, up_stride=2,
            static_chunk_size=4,
        ),
        decoder=CFMDecoderConfig(
            in_channels=32, out_channels=8, channels=(16,), attention_head_dim=8,
            n_blocks=1, num_mid_blocks=1, num_heads=2, static_chunk_size=4,
        ),
        n_timesteps=2,
    )
    hift_cfg = HiFTGeneratorConfig(
        in_channels=8, base_channels=16, nb_harmonics=1,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
        source_resblock_kernel_sizes=(3, 3), source_resblock_dilation_sizes=((1,), (1,)),
        f0_cond_channels=8,
    )
    return CosyVoiceDetokenizer.random_init(
        jax.random.PRNGKey(0), flow_cfg, hift_cfg, mel_cache_len=2, token_hop_len=4,
        max_mel_frames=256, **kw
    )


def test_one_shot_synthesize_shape():
    d = _tiny_detok()
    wav = d.synthesize(np.arange(8, dtype=np.int32)[None], jax.random.PRNGKey(1))
    # 8 tokens * ratio 2 mel frames * 256 samples/frame
    assert wav.shape == (1, 8 * 2 * 256)
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= d.hift_cfg.audio_limit + 1e-6


def test_streaming_protocol_and_flush():
    d = _tiny_detok()
    key = jax.random.PRNGKey(2)
    La = d.flow_cfg.pre_lookahead_len  # 3

    # fewer than hop+La pending -> nothing emitted yet
    wav, state = d.stream_chunk(None, np.arange(6, dtype=np.int32)[None], key)
    assert wav.shape[1] == 0
    assert state.tokens.shape == (1, 6) and state.token_offset == 0

    # reach hop+La=7 -> one chunk emitted, offset advances by hop only
    wav1, state = d.stream_chunk(state, np.asarray([[6]], np.int32), key)
    assert state.token_offset == d.token_hop_len == 4
    # hop tokens * 2 frames * 256 samples minus the cached source tail
    assert wav1.shape[1] == 4 * 2 * 256 - d.source_cache_len
    assert state.mel.shape == (1, 8, d.mel_cache_len)
    assert state.source.shape == (1, 1, d.source_cache_len)
    assert state.speech.shape == (1, d.source_cache_len)

    # finalize flushes the remaining 3 tokens (+ cached tail)
    wav2, state = d.stream_chunk(state, np.zeros((1, 0), np.int32), key, finalize=True)
    assert state.token_offset == 7
    total = wav1.shape[1] + wav2.shape[1]
    # the re-synthesized cache-mel tail exactly replaces the trimmed samples:
    # every token contributes ratio*upsample_scale samples overall
    assert total == 7 * 2 * 256
    assert np.isfinite(wav2).all()


def test_pipeline_surface_token2wav_flush():
    d = _tiny_detok()
    key = jax.random.PRNGKey(3)
    wav, state = d.token2wav(np.arange(9, dtype=np.int32)[None], key, None)
    assert wav.ndim == 1 and wav.shape[0] > 0
    tail = d.flush(state)
    assert tail.ndim == 1 and tail.shape[0] > 0


def test_fade_in_out_blends():
    win = np.hamming(8)
    a = np.ones((1, 16), np.float32)
    b = np.zeros((1, 16), np.float32)
    out = fade_in_out(a, b, win)
    np.testing.assert_allclose(out[0, :4], win[:4], atol=1e-6)  # pure fade-in of ones
    np.testing.assert_allclose(out[0, 4:], 1.0)


def test_speed_change_resamples():
    d = _tiny_detok()
    tok = np.arange(8, dtype=np.int32)[None]
    normal = d.synthesize(tok, jax.random.PRNGKey(4))
    fast = d.synthesize(tok, jax.random.PRNGKey(4), speed=2.0)
    assert fast.shape[1] == normal.shape[1] // 2  # half the mel frames -> half the samples
    slow = d.synthesize(tok, jax.random.PRNGKey(4), speed=0.5)
    assert slow.shape[1] == normal.shape[1] * 2
