"""Golden parity: GLM-legacy generation-input builders vs the reference
BailingTokenizer methods (tokenization_bailing.py:279-407), run unbound with a
duck-typed shim carrying the special-token ids."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference snapshot not mounted"
)

from mingunivision_tpu.processing.glm_legacy import (  # noqa: E402
    build_glm_position_ids,
    build_inputs_for_generation,
)


@pytest.fixture(scope="module")
def ref_cls():
    p = "/root/reference/mingunivision"
    if p not in sys.path:
        sys.path.insert(0, p)
    import tokenization_bailing

    return tokenization_bailing.BailingTokenizer


class Shim:
    eos_token_id = 9
    bos_token_id = 8
    cls_token_id = 7
    gmask_token_id = 6
    add_bos_token = False

    def _build_position_ids(self, *a, **k):
        import tokenization_bailing

        return tokenization_bailing.BailingTokenizer._build_position_ids(self, *a, **k)


IDS = {"eos_token_id": 9, "bos_token_id": 8, "cls_token_id": 7, "gmask_token_id": 6}


class TestPositionIds:
    @pytest.mark.parametrize("rotary", ["1d", "2d", "none"])
    def test_matches_reference(self, ref_cls, rotary):
        shim = Shim()
        want = ref_cls._build_position_ids(shim, mask_pos=5, bos_pos=8, max_output_length=11, rotary_type=rotary, window_size=6)
        got = build_glm_position_ids(mask_pos=5, bos_pos=8, max_output_length=11, rotary_type=rotary, window_size=6)
        assert got == [list(w) for w in want]


class TestGenerationInputs:
    def _compare(self, ref_cls, ids, *, add_bos=False, unidirectional=True, rotary="2d", max_out=6):
        shim = Shim()
        shim.add_bos_token = add_bos
        want = ref_cls._build_inputs_for_generation(
            shim,
            list(ids),
            max_output_length=max_out,
            rotary_type=rotary,
            unidirectional_attention=unidirectional,
        )
        got = build_inputs_for_generation(
            list(ids),
            **IDS,
            add_bos_token=add_bos,
            max_output_length=max_out,
            rotary_type=rotary,
            unidirectional_attention=unidirectional,
        )
        np.testing.assert_array_equal(np.asarray(got["input_ids"]), want["input_ids"][0].numpy())
        np.testing.assert_array_equal(np.asarray(got["position_ids"]), want["position_ids"][0].numpy())
        np.testing.assert_array_equal(np.asarray(got["attention_mask"]), want["attention_mask"][0, 0].numpy())

    def test_unidirectional_plain(self, ref_cls):
        self._compare(ref_cls, [3, 4, 5, 2, 1])

    def test_unidirectional_with_eos(self, ref_cls):
        self._compare(ref_cls, [3, 4, 9, 5, 2])

    def test_left_padded(self, ref_cls):
        self._compare(ref_cls, [9, 9, 3, 4, 5])

    def test_with_bos(self, ref_cls):
        self._compare(ref_cls, [3, 4, 5], add_bos=True)

    def test_bidirectional_gmask(self, ref_cls):
        self._compare(ref_cls, [3, 4, 5], unidirectional=False)

    def test_bidirectional_existing_cls_gmask(self, ref_cls):
        self._compare(ref_cls, [7, 3, 4, 6, 5], unidirectional=False)

    def test_truncation(self, ref_cls):
        shim = Shim()
        want = ref_cls._build_inputs_for_generation(shim, [1, 2, 3, 4, 5], max_input_length=3, max_output_length=4, rotary_type="2d")
        got = build_inputs_for_generation([1, 2, 3, 4, 5], **IDS, max_input_length=3, max_output_length=4, rotary_type="2d")
        np.testing.assert_array_equal(np.asarray(got["input_ids"]), want["input_ids"][0].numpy())


class TrainShim(Shim):
    pad_token_id = 5
    sop_token_id = 4

    def __init__(self):
        # deterministic toy "tokenizer": char codes mod 50 + 10
        pass

    def __call__(self, text):
        return {"input_ids": [10 + (ord(c) % 50) for c in text]}

    def _build_inputs_for_train(self, *a, **k):
        import tokenization_bailing

        return tokenization_bailing.BailingTokenizer._build_inputs_for_train(self, *a, **k)


class TestTrainBuilder:
    IDS_TRAIN = dict(
        eos_token_id=9, pad_token_id=5, sop_token_id=4, cls_token_id=7, gmask_token_id=6
    )

    def _compare(self, ref_cls, inputs, outputs, **kw):
        import numpy as np

        from mingunivision_tpu.processing.glm_legacy import build_inputs_for_train

        shim = TrainShim()
        shim.add_bos_token = kw.pop("add_bos", False)
        want = shim._build_inputs_for_train(inputs, outputs, **kw)
        got = build_inputs_for_train(
            lambda t: shim(t)["input_ids"], inputs, outputs,
            add_bos_token=shim.add_bos_token, **self.IDS_TRAIN, **kw,
        )
        np.testing.assert_array_equal(np.asarray(got["input_ids"]), want["input_ids"].numpy())
        np.testing.assert_array_equal(np.asarray(got["labels"]), want["labels"].numpy())
        np.testing.assert_array_equal(np.asarray(got["position_ids"]), want["position_ids"].numpy())
        w_attn = want["attention_mask"]
        g_attn = got["attention_mask"]
        if hasattr(w_attn, "numpy"):
            w = w_attn.numpy()
            np.testing.assert_array_equal(np.asarray(g_attn).reshape(w.squeeze().shape), w.squeeze())
        else:
            assert g_attn == w_attn

    def test_packed_fa2(self, ref_cls):
        self._compare(ref_cls, ["hello", "second input"], ["world", "answer two"], max_length=64)

    def test_packed_full_mask(self, ref_cls):
        self._compare(ref_cls, ["abc", "defgh"], ["xy", "z"], max_length=40, use_fa2=False)

    def test_packed_with_bos(self, ref_cls):
        self._compare(ref_cls, ["abc"], ["defg"], max_length=32, add_bos=True)

    def test_truncation_policy(self, ref_cls):
        self._compare(ref_cls, ["a" * 30, "b" * 30], ["c" * 30, "d" * 30], max_length=40)

    def test_unpacked_single(self, ref_cls):
        self._compare(ref_cls, "single prompt", "response", max_length=48, use_packed=False)
