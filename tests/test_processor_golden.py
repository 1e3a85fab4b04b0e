"""Golden parity: our BailingMMProcessor vs the reference processor's pure-Python
tokenize / _expand_image_tokens / apply_chat_template run with the SAME shared
test tokenizer (reference mingunivision/processing_bailingmm.py:282-464).

The three CFG masks drive image-generation guidance — a silent off-by-one here
poisons every generated image, so ids and all three masks are compared exactly,
including multi-turn and multi-image conversations.
"""

import os
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference snapshot not mounted"
)

from mingunivision_tpu.processing.processor import BailingMMProcessor  # noqa: E402
from mingunivision_tpu.processing.tokenizer import build_test_tokenizer  # noqa: E402


@pytest.fixture(scope="module")
def both_processors():
    import refutil

    ref_mod = refutil.import_reference_processor()
    tok = build_test_tokenizer()

    class RefShim:
        """The reference BailingMMProcessor's text-path methods bound to the
        shared test tokenizer — skips ProcessorMixin/__init__ (which wires the
        image/audio tensor stacks irrelevant to mask parity)."""

        tokenize = ref_mod.BailingMMProcessor.tokenize
        _find_all_subsequences = ref_mod.BailingMMProcessor._find_all_subsequences
        apply_chat_template = ref_mod.BailingMMProcessor.apply_chat_template
        apply_system_template = ref_mod.BailingMMProcessor.apply_system_template
        _expand_image_tokens = ref_mod.BailingMMProcessor._expand_image_tokens

        def __init__(self, tokenizer):
            self.tokenizer = tokenizer

    return BailingMMProcessor(tok), RefShim(tok), tok


CONVERSATIONS = {
    "t2i_prompt": [
        {"role": "HUMAN", "content": [{"type": "text", "text": "generate an image of a cat on a table"}]},
    ],
    "multi_turn": [
        {"role": "HUMAN", "content": [{"type": "text", "text": "hello"}]},
        {"role": "ASSISTANT", "content": [{"type": "text", "text": "hi, what can I do?"}]},
        {"role": "HUMAN", "content": [{"type": "text", "text": "describe the picture"}]},
    ],
    "image_then_text": [
        {
            "role": "HUMAN",
            "content": [
                {"type": "image", "image": "placeholder.jpg"},
                {"type": "text", "text": "what is this?"},
            ],
        },
    ],
    "edit_multi_round": [
        {
            "role": "HUMAN",
            "content": [
                {"type": "image", "image": "a.jpg"},
                {"type": "text", "text": "make the sky red"},
            ],
        },
        {"role": "ASSISTANT", "content": [{"type": "text", "text": "done"}]},
        {"role": "HUMAN", "content": [{"type": "text", "text": "now add a bird"}]},
    ],
}


class TestTemplateParity:
    @pytest.mark.parametrize("name", sorted(CONVERSATIONS))
    def test_apply_chat_template(self, both_processors, name):
        ours, ref, _ = both_processors
        conv = [dict(m) for m in CONVERSATIONS[name]]
        want = ref.apply_chat_template([dict(m) for m in conv], add_generation_prompt=True)
        got = ours.apply_chat_template(conv, add_generation_prompt=True)
        assert got == want


class TestExpandParity:
    @pytest.mark.parametrize("grids", [[[1, 4, 4]], [[1, 2, 3], [1, 8, 8]]])
    def test_expand_image_tokens(self, both_processors, grids):
        ours, ref, _ = both_processors
        n = len(grids)
        text = ["before " + " mid ".join(["<IMAGE>"] * n) + " after"]
        want = ref._expand_image_tokens(list(text), torch.tensor(grids))
        got = ours._expand_image_tokens(list(text), np.asarray(grids))
        assert got == want


class TestMaskParity:
    @pytest.mark.parametrize("name", sorted(CONVERSATIONS))
    def test_three_masks_and_ids(self, both_processors, name):
        ours, ref, tok = both_processors
        conv = [dict(m) for m in CONVERSATIONS[name]]
        text = ref.apply_chat_template([dict(m) for m in conv], add_generation_prompt=True)
        # expand a 2x2 grid for each <IMAGE> the template produced
        n_images = text.count("<IMAGE>")
        if n_images:
            text = ref._expand_image_tokens([text], torch.tensor([[1, 2, 2]] * n_images))[0]

        want = ref.tokenize([text])
        got = ours(text=text, images=None)

        np.testing.assert_array_equal(got.input_ids, want["input_ids"].numpy())
        np.testing.assert_array_equal(got.attention_mask, want["attention_mask"].numpy())
        np.testing.assert_array_equal(
            got.uncond_attention_mask, want["uncond_attention_mask"].numpy(), err_msg="uncond mask"
        )
        np.testing.assert_array_equal(
            got.text_uncond_attention_mask,
            want["text_uncond_attention_mask"].numpy(),
            err_msg="text-uncond mask",
        )
        # sanity: image-bearing last turns keep image tokens visible in text-uncond
        if n_images and name == "image_then_text":
            patch_id = tok.convert_tokens_to_ids("<imagePatch>")
            ids = got.input_ids[0]
            tm = got.text_uncond_attention_mask[0]
            assert tm[ids == patch_id].all()
            assert (tm == 0).any()
