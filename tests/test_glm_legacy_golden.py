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
