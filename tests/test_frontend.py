"""Zero-shot voice-cloning frontend (talker/frontend.py): fbank/mel
extraction invariants, campplus-style x-vector vs a numpy oracle, the VQ
speech tokenizer vs a numpy argmin oracle, and the SDK/pipeline wiring
(reference surface: ming_sdk/ming.py:407-411 TTSFrontEnd)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.talker.frontend import (
    CampPlusConfig,
    SpeechTokenizerConfig,
    TTSFrontend,
    campplus_apply,
    flow_prompt_mel,
    init_campplus_params,
    init_speech_tokenizer_params,
    kaldi_fbank,
    speech_tokenize,
)


def _wav(seconds=0.6, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    return (0.4 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.standard_normal(len(t))).astype(np.float32)


class TestFeatures:
    def test_fbank_shape_and_cmn(self):
        wav = _wav()
        feat = kaldi_fbank(wav)
        want_frames = 1 + (len(wav) - 400) // 160
        assert feat.shape == (want_frames, 80)
        np.testing.assert_allclose(feat.mean(axis=0), 0.0, atol=1e-4)  # CMN

    def test_flow_mel_rate(self):
        wav = _wav(seconds=1.0)
        mel = flow_prompt_mel(wav)  # 50 Hz
        assert mel.shape[1] == 80
        assert abs(mel.shape[0] - 50) <= 3  # ~50 frames per second


class TestCampPlus:
    def test_matches_numpy_oracle(self):
        cfg = CampPlusConfig(feat_dim=12, embed_dim=16, stages=((24, 3, 1), (24, 3, 2), (48, 1, 1)))
        params = init_campplus_params(jax.random.PRNGKey(0), cfg)
        # give the folded norms non-trivial values
        params["stages"][1]["norm_scale"] = params["stages"][1]["norm_scale"] * 1.5
        params["stages"][1]["norm_shift"] = params["stages"][1]["norm_shift"] + 0.25
        rng = np.random.default_rng(1)
        feats = rng.standard_normal((2, 37, 12)).astype(np.float32)

        def np_conv1d(x, w, b, dil):
            # x (C_in, T), w (out, in, k) torch layout from conv1d_init
            out_ch, in_ch, k = w.shape
            pad = dil * (k - 1) // 2
            xp = np.pad(x, ((0, 0), (pad, pad)))
            T = x.shape[1]
            y = np.zeros((out_ch, T), np.float32)
            for o in range(out_ch):
                for i in range(in_ch):
                    for j in range(k):
                        y[o] += w[o, i, j] * xp[i, j * dil : j * dil + T]
                y[o] += b[o]
            return y

        want = []
        for bidx in range(2):
            x = feats[bidx].T
            for (out_ch, kernel, dil), sp in zip(cfg.stages, params["stages"]):
                w = np.asarray(sp["conv"]["w"], np.float32)
                b = np.asarray(sp["conv"]["b"], np.float32)
                x = np_conv1d(x, w, b, dil)
                x = np.maximum(x, 0) * np.asarray(sp["norm_scale"]) + np.asarray(sp["norm_shift"])
            mean = x.mean(axis=1)
            std = np.sqrt(np.maximum((x * x).mean(axis=1) - mean * mean, 1e-10))
            stats = np.concatenate([mean, std])
            want.append(stats @ np.asarray(params["embed"]["w"]) + np.asarray(params["embed"]["b"]))
        got = np.asarray(campplus_apply(params, cfg, jnp.asarray(feats)))
        np.testing.assert_allclose(got, np.stack(want), rtol=2e-4, atol=2e-4)

    def test_embedding_time_pooling_invariance(self):
        """Stats pooling: repeating the utterance changes the embedding only
        marginally (same mean/std statistics up to boundary frames)."""
        cfg = CampPlusConfig(feat_dim=8, embed_dim=8, stages=((16, 1, 1),))
        params = init_campplus_params(jax.random.PRNGKey(2), cfg)
        rng = np.random.default_rng(3)
        f = rng.standard_normal((1, 50, 8)).astype(np.float32)
        e1 = np.asarray(campplus_apply(params, cfg, jnp.asarray(f)))
        e2 = np.asarray(campplus_apply(params, cfg, jnp.asarray(np.concatenate([f, f], axis=1))))
        np.testing.assert_allclose(e1, e2, rtol=1e-3, atol=1e-3)


class TestSpeechTokenizer:
    @pytest.fixture(scope="class")
    def tiny(self):
        from mingunivision_tpu.models.audio_encoder import AudioEncoderConfig

        cfg = SpeechTokenizerConfig(
            encoder=AudioEncoderConfig(n_mels=16, n_state=32, n_head=2, n_layer=1, n_ctx=64),
            codebook_size=37,
            code_dim=8,
        )
        params = init_speech_tokenizer_params(jax.random.PRNGKey(4), cfg)
        return cfg, params

    def test_vq_matches_argmin_oracle(self, tiny):
        from mingunivision_tpu.models.audio_encoder import whisper_encode
        from mingunivision_tpu.ops.linear import dense

        cfg, params = tiny
        rng = np.random.default_rng(5)
        mel = rng.standard_normal((1, 16, 40)).astype(np.float32)
        ids = np.asarray(speech_tokenize(params, cfg, jnp.asarray(mel)))
        h = whisper_encode(params["encoder"], cfg.encoder, jnp.asarray(mel))
        Tp = (h.shape[1] // cfg.pool) * cfg.pool
        h = h[:, :Tp].reshape(1, Tp // cfg.pool, cfg.pool, -1).mean(axis=2)
        z = np.asarray(dense(h, params["code_proj"]))
        cb = np.asarray(params["codebook"])
        want = np.argmin(((z[:, :, None, :] - cb[None, None]) ** 2).sum(-1), axis=-1)
        np.testing.assert_array_equal(ids, want)
        assert ids.max() < cfg.codebook_size

    def test_rate_is_quarter_of_mel_frames(self, tiny):
        cfg, params = tiny
        mel = np.zeros((1, 16, 64), np.float32)
        ids = np.asarray(speech_tokenize(params, cfg, jnp.asarray(mel)))
        assert ids.shape == (1, 16)  # 64 mel frames @100Hz -> /2 conv -> /2 pool


class TestVoiceProfile:
    def test_profile_invariants(self):
        fe = TTSFrontend.random_init(
            jax.random.PRNGKey(6),
            campplus_cfg=CampPlusConfig(stages=((32, 3, 1), (64, 1, 1))),
            tokenizer_cfg=SpeechTokenizerConfig(
                encoder=__import__(
                    "mingunivision_tpu.models.audio_encoder", fromlist=["AudioEncoderConfig"]
                ).AudioEncoderConfig(n_mels=128, n_state=32, n_head=2, n_layer=1, n_ctx=256),
                codebook_size=101,
                code_dim=8,
            ),
        )
        prof = fe.voice_profile(_wav(seconds=0.8))
        assert prof.embedding.shape == (1, 192)
        np.testing.assert_allclose(np.linalg.norm(prof.embedding), 1.0, rtol=1e-4)
        assert prof.vp_emb.shape == (1, fe.vp_frames, 192)
        # flow invariant: mel frames == token_mel_ratio (2) x tokens
        assert prof.prompt_feat.shape[1] == 2 * prof.prompt_token.shape[1]
        assert prof.prompt_feat.shape[2] == 80
        assert prof.prompt_token.dtype == np.int32
        assert prof.prompt_token.max() < 101

    def test_deterministic(self):
        fe = TTSFrontend.random_init(
            jax.random.PRNGKey(7),
            campplus_cfg=CampPlusConfig(stages=((16, 1, 1),)),
            tokenizer_cfg=SpeechTokenizerConfig(
                encoder=__import__(
                    "mingunivision_tpu.models.audio_encoder", fromlist=["AudioEncoderConfig"]
                ).AudioEncoderConfig(n_mels=128, n_state=16, n_head=2, n_layer=1, n_ctx=256),
                codebook_size=11,
                code_dim=4,
            ),
        )
        a = fe.voice_profile(_wav())
        b = fe.voice_profile(_wav())
        np.testing.assert_array_equal(a.prompt_token, b.prompt_token)
        np.testing.assert_allclose(a.embedding, b.embedding)


class TestPipelineWiring:
    def test_set_voice_and_tts_with_prompt_audio(self):
        """SDK e2e: Ming.tts(text, prompt_audio=...) runs the frontend and
        conditions the talker (vp_emb) — raw-audio zero-shot path exists."""
        from mingunivision_tpu.talker.detokenizer import AudioDetokenizer, FlowConfig, HiFTConfig
        from mingunivision_tpu.talker.model import BailingTalker
        from mingunivision_tpu.talker.sentence_manager import SentenceManagerConfig
        from mingunivision_tpu.talker.streaming import OmniAudioPipeline
        from tests.test_talker import tiny_talker_cfg

        cfg = tiny_talker_cfg()  # vp_feature_size=8
        talker = BailingTalker.random_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        detok = AudioDetokenizer.random_init(
            jax.random.PRNGKey(1),
            FlowConfig(codec_vocab=64, token_dim=32, mel_dim=16, channels=32, depth=2, num_ode_steps=2),
            HiFTConfig(mel_dim=16, base_channels=32, upsample_rates=(4, 4), upsample_kernels=(8, 8)),
        )
        pipe = OmniAudioPipeline(
            talker, detok, tokenize=lambda s: [ord(c) % 128 for c in s][:8],
            sm_config=SentenceManagerConfig(min_sentence_len=1, normalize=False),
        )
        fe = TTSFrontend.random_init(
            jax.random.PRNGKey(2),
            campplus_cfg=CampPlusConfig(embed_dim=cfg.vp_feature_size, stages=((16, 3, 1), (32, 1, 1))),
            tokenizer_cfg=SpeechTokenizerConfig(
                encoder=__import__(
                    "mingunivision_tpu.models.audio_encoder", fromlist=["AudioEncoderConfig"]
                ).AudioEncoderConfig(n_mels=128, n_state=16, n_head=2, n_layer=1, n_ctx=256),
                codebook_size=64,
                code_dim=4,
            ),
        )
        from mingunivision_tpu.sdk.ming import Ming

        ming = Ming(infer=object(), talker_pipeline=pipe, audio_frontend=fe)
        wav = ming.tts("你好。", prompt_audio=_wav(seconds=0.5))
        assert isinstance(wav, np.ndarray) and wav.dtype == np.float32 and wav.size > 0
        # voice applied: pipeline carries the vp_emb with the talker's vp dim
        assert pipe.vp_emb is not None and pipe.vp_emb.shape[2] == cfg.vp_feature_size

    def test_set_voice_updates_prompt_capable_detok(self):
        """CosyVoiceDetokenizer exposes prompt fields; set_voice must install
        the profile's prompt_token/prompt_feat/embedding."""
        from mingunivision_tpu.talker.frontend import VoiceProfile
        from mingunivision_tpu.talker.streaming import OmniAudioPipeline

        class _Detok:
            prompt_token = None
            prompt_feat = None
            embedding = None

        pipe = OmniAudioPipeline(talker=None, detokenizer=_Detok(), tokenize=lambda s: [])
        prof = VoiceProfile(
            embedding=np.zeros((1, 192), np.float32),
            vp_emb=np.zeros((1, 4, 192), np.float32),
            prompt_token=np.arange(10, dtype=np.int32)[None],
            prompt_feat=np.zeros((1, 20, 80), np.float32),
        )
        pipe.set_voice(prof)
        d = pipe.detok
        assert d.prompt_token.shape == (1, 10)
        assert d.prompt_feat.shape == (1, 20, 80)
        assert d.embedding.shape == (1, 192)
