"""Processor / chat-format / image-preprocessing tests (checkpoint-free)."""

import numpy as np
import pytest

from mingunivision_tpu.processing.chat_format import Chat
from mingunivision_tpu.processing.image_ops import (
    preprocess_generation,
    preprocess_understanding,
    smart_resize,
    tensor_to_image,
)
from mingunivision_tpu.processing.processor import (
    ASSISTANT_PREFIX,
    USER_PREFIX,
    BailingMMProcessor,
    build_cfg_masks,
)


@pytest.fixture(scope="module")
def tokenizer():
    from mingunivision_tpu.processing.tokenizer import build_test_tokenizer

    return build_test_tokenizer()


@pytest.fixture(scope="module")
def processor(tokenizer):
    return BailingMMProcessor(tokenizer, und_image_size=64, gen_image_size=64)


class TestChatTemplate:
    def test_single_turn(self, processor):
        msgs = [{"role": "HUMAN", "content": [{"type": "text", "text": "hello"}]}]
        # reference: the leading HUMAN prefix comes from the system template
        # (processing_bailingmm.py:371-372, :434-436) — human turns add no prefix
        text = processor.apply_chat_template(msgs)
        assert text == f"{USER_PREFIX}hello{ASSISTANT_PREFIX}"

    def test_image_placeholder(self, processor):
        msgs = [
            {
                "role": "HUMAN",
                "content": [{"type": "image", "image": "x.png"}, {"type": "text", "text": "what is it"}],
            }
        ]
        text = processor.apply_chat_template(msgs)
        assert "<IMAGE>" in text
        assert text.endswith(ASSISTANT_PREFIX)

    def test_multi_turn_terminator(self, processor):
        msgs = [
            {"role": "HUMAN", "content": [{"type": "text", "text": "a"}]},
            {"role": "ASSISTANT", "content": [{"type": "text", "text": "b"}]},
            {"role": "HUMAN", "content": [{"type": "text", "text": "c"}]},
        ]
        text = processor.apply_chat_template(msgs)
        assert f"{ASSISTANT_PREFIX}b<|endoftext|>{USER_PREFIX}" in text

    def test_chat_object_render(self):
        chat = Chat.from_json(
            {"messages": [{"role": "HUMAN", "content": "hi"}, {"role": "ASSISTANT", "content": "yo"}]}
        )
        s = chat.prompt_str
        assert s == "<role>HUMAN</role>hi<role>ASSISTANT</role>yo"
        io = chat.prompt_inout
        assert io["input"].endswith("<role>ASSISTANT</role>") and io["output"] == "yo"


class TestCfgMasks:
    def test_mask_spans(self):
        # ids: [U U] 5 6 7 [A A] 9  (prefix ids chosen artificially)
        user, assistant = [1, 2], [3, 4]
        seq = [1, 2, 5, 6, 7, 3, 4, 9]
        uncond, text_uncond = build_cfg_masks(seq, user, assistant, image_token_ids={6})
        assert uncond == [1, 1, 0, 0, 0, 1, 1, 1]
        # text-uncond zeros only non-image tokens of the last human turn
        assert text_uncond == [1, 1, 0, 1, 0, 1, 1, 1]

    def test_no_assistant_keeps_uncond_ones(self):
        user, assistant = [1, 2], [3, 4]
        seq = [1, 2, 5, 6, 7]
        uncond, text_uncond = build_cfg_masks(seq, user, assistant, image_token_ids=set())
        assert uncond == [1] * 5  # incomplete dialogue: uncond untouched
        assert text_uncond == [1, 1, 0, 0, 0]

    def test_processor_end_to_end_masks(self, processor):
        msgs = [{"role": "HUMAN", "content": [{"type": "text", "text": "draw a cat"}]}]
        text = processor.apply_chat_template(msgs)
        out = processor(text=text)
        T = out.input_ids.shape[1]
        assert out.attention_mask.shape == (1, T)
        assert out.uncond_attention_mask.sum() < T  # last human turn zeroed
        assert out.text_uncond_attention_mask.sum() < T


class TestImagePipeline:
    def _img(self, w=100, h=80):
        from PIL import Image

        rng = np.random.default_rng(0)
        return Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))

    def test_understanding_square_resize(self):
        x = preprocess_understanding(self._img(), image_size=64)
        assert x.shape == (3, 64, 64)
        assert -1.01 <= x.min() and x.max() <= 1.01

    def test_generation_center_crop_matches_torchvision_geometry(self):
        x = preprocess_generation(self._img(100, 80), image_size=64)
        assert x.shape == (3, 64, 64)

    def test_expand_image_tokens_count(self, processor):
        from PIL import Image

        img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
        msgs = [
            {"role": "HUMAN", "content": [{"type": "image", "image": img}, {"type": "text", "text": "hi"}]}
        ]
        text = processor.apply_chat_template(msgs)
        out = processor(text=text, images=[img], image_patch_size=32)
        n_patches = (64 // 32) ** 2
        patch_count = int(np.sum(out.input_ids == processor.image_patch_id))
        assert patch_count == n_patches
        assert out.image_grid_thw.tolist() == [[1, 2, 2]]
        assert out.pixel_values.shape == (1, 3, 64, 64)

    def test_tensor_to_image_range(self):
        img = tensor_to_image(np.linspace(-1, 1, 3 * 4 * 4).reshape(3, 4, 4).astype(np.float32))
        assert img.dtype == np.uint8 and img.shape == (4, 4, 3)
        assert img.min() == 0 and img.max() == 255

    def test_smart_resize(self):
        h, w = smart_resize(100, 200, factor=28)
        assert h % 28 == 0 and w % 28 == 0
        with pytest.raises(ValueError):
            smart_resize(10, 2500, factor=28)
