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


class TestPromptBuilders:
    """MingUtils.build_prompt / filter_message (reference ming.py:46-221)."""

    def test_build_prompt_content_order(self):
        from mingunivision_tpu.sdk.ming import MingUtils

        msgs = MingUtils.build_prompt(
            "describe", image=["a.png", "b.png"], audio=b"\x00", sys_prompt="be brief"
        )
        assert len(msgs) == 1
        kinds = [c["type"] for c in msgs[0]["content"]]
        assert kinds == ["text", "image", "image", "audio", "text"]
        assert msgs[0]["content"][0]["text"].startswith("SYSTEM: ")
        assert msgs[0]["content"][-1]["text"] == "describe"

    def test_video_clears_history(self):
        from mingunivision_tpu.sdk.ming import MingUtils

        hist = [
            {"role": "HUMAN", "content": [{"type": "text", "text": "hi"}]},
            {"role": "ASSISTANT", "content": [{"type": "text", "text": "hello"}]},
        ]
        msgs = MingUtils.build_prompt("what happens", video=["f1", "f2"], history=hist)
        assert len(msgs) == 1  # history dropped when video present
        assert msgs[0]["content"][0]["type"] == "video"
        assert msgs[0]["content"][0]["max_frames"] == 2

    def test_filter_message_budgets(self):
        from mingunivision_tpu.sdk.ming import MingUtils

        def human(n_img=0, audio=False, text="q"):
            c = [{"type": "image", "image": f"i{i}"} for i in range(n_img)]
            if audio:
                c.append({"type": "audio", "audio": b""})
            c.append({"type": "text", "text": text})
            return {"role": "HUMAN", "content": c}

        def assistant(text="a"):
            return {"role": "ASSISTANT", "content": [{"type": "text", "text": text}]}

        # budget of 2 images: newest pair (1 img) fits, older pair (2 img) doesn't
        data = [human(2, text="old"), assistant("oa"), human(1, text="new"), assistant("na"), human(1, text="cur")]
        out = MingUtils.filter_message(data, limit_images=2, limit_videos=2)
        texts = [c["text"] for m in out for c in m["content"] if c["type"] == "text"]
        assert "cur" in texts and "new" in texts and "old" not in texts
        # pairs with audio in history always drop
        data2 = [human(0, audio=True, text="oldaudio"), assistant("oa"), human(0, text="cur")]
        out2 = MingUtils.filter_message(data2)
        texts2 = [c["text"] for m in out2 for c in m["content"] if c["type"] == "text"]
        assert texts2 == ["cur"]

    def test_img_prompt_order(self):
        from mingunivision_tpu.sdk.ming import MingUtils

        t2i = MingUtils.build_img_prompt("a cat")
        kinds = [c["type"] for c in t2i[0]["content"]]
        assert kinds[0] == "text"  # text first for T2I
        edit = MingUtils.build_img_prompt("add a hat", image="src.png")
        kinds_e = [c["type"] for c in edit[0]["content"]]
        assert kinds_e == ["image", "text"]  # image first for editing
