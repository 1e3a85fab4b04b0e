"""SDK orchestration tests (tiny models, CPU)."""

import numpy as np
import pytest

import jax

from mingunivision_tpu.sdk.ming import Ming, MingUtils, wait_for_ready


@pytest.fixture(scope="module")
def tiny_stack():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from examples.test_infer_unified import build_tiny_infer
    from mingunivision_tpu.talker.detokenizer import AudioDetokenizer, FlowConfig, HiFTConfig
    from mingunivision_tpu.talker.model import BailingTalker
    from mingunivision_tpu.talker.streaming import OmniAudioPipeline
    from mingunivision_tpu.talker.sentence_manager import SentenceManagerConfig
    from tests.test_talker import tiny_talker_cfg

    infer = build_tiny_infer()
    talker = BailingTalker.random_init(jax.random.PRNGKey(0), tiny_talker_cfg(), dtype=jax.numpy.float32)
    detok = AudioDetokenizer.random_init(
        jax.random.PRNGKey(1),
        FlowConfig(codec_vocab=64, token_dim=32, mel_dim=16, channels=32, depth=2, num_ode_steps=2),
        HiFTConfig(mel_dim=16, base_channels=32, upsample_rates=(4, 4), upsample_kernels=(8, 8)),
    )
    pipe = OmniAudioPipeline(
        talker,
        detok,
        lambda s: [hash(c) % 128 for c in s][:8] or [1],
        sm_config=SentenceManagerConfig(min_sentence_len=2),
    )
    return Ming(infer=infer, talker_pipeline=pipe)


class TestMingSdk:
    def test_text_route(self, tiny_stack):
        out = tiny_stack.generate("hello", output_type="text", max_new_tokens=4)
        assert isinstance(out["text"], str)

    def test_image_route(self, tiny_stack):
        tiny_stack.infer.reset_inner_state()
        out = tiny_stack.generate("draw a cat", output_type="image", max_new_tokens=4)
        assert "images" in out

    def test_speech_route(self, tiny_stack):
        tiny_stack.infer.reset_inner_state()
        out = tiny_stack.generate("说点什么。", output_type="speech", max_new_tokens=4)
        assert out["audio"] is None or out["audio"].dtype == np.float32

    def test_tts_direct(self, tiny_stack):
        wav = tiny_stack.tts("你好。")
        assert wav.dtype == np.float32 and wav.ndim == 1

    def test_prompt_builders(self):
        msgs = MingUtils.build_image_gen_prompt("a dog", scale=16)
        assert "<gen_image16>" in msgs[0]["content"][0]["text"]

    def test_wait_for_ready_timeout(self):
        assert not wait_for_ready("http://127.0.0.1:1/health", timeout=1.0, interval=0.2)


class TestStreaming:
    def test_generate_stream_chunks(self, tiny_stack):
        tiny_stack.infer.reset_inner_state()
        pieces = list(tiny_stack.generate_stream("tell me a story", chunk_tokens=3, max_new_tokens=9))
        assert len(pieces) >= 1
        assert all(isinstance(p, str) for p in pieces)
