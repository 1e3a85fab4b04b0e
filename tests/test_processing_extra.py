"""Tests: MRoPE position builder, dynamic-res processor, media utils, metrics."""

import os

import numpy as np
import pytest

from mingunivision_tpu.processing.dynamic_image import (
    ASPECT_RATIO_512,
    DynamicImageProcessor,
    process_ratio,
)
from mingunivision_tpu.processing.media import (
    fetch_audio,
    fetch_image,
    process_vision_info,
    sample_fps_indices,
    sample_frame_indices,
    save_wav,
)
from mingunivision_tpu.processing.mrope import build_mrope_positions, mrope_position_delta
from mingunivision_tpu.utils.metrics import FeatureStats, frechet_distance, psnr, ssim

IMG_PATCH = 99


class TestMrope:
    def test_text_only_is_flat(self):
        pos = build_mrope_positions([1, 2, 3, 4], image_patch_token=IMG_PATCH)
        np.testing.assert_array_equal(pos, np.tile(np.arange(4), (3, 1)))

    def test_image_grid_planes(self):
        # 2 text, 2x2 image, 1 text
        ids = [5, 6] + [IMG_PATCH] * 4 + [7]
        pos = build_mrope_positions(ids, image_patch_token=IMG_PATCH, image_grids=[(1, 2, 2)])
        # t-plane constant over the image; h/w enumerate the grid
        np.testing.assert_array_equal(pos[0], [0, 1, 2, 2, 2, 2, 4])
        np.testing.assert_array_equal(pos[1], [0, 1, 2, 2, 3, 3, 4])
        np.testing.assert_array_equal(pos[2], [0, 1, 2, 3, 2, 3, 4])
        # text resumes after max+1
        assert mrope_position_delta(pos, len(ids)) == 5 - len(ids)

    def test_video_grid_advances_t(self):
        ids = [IMG_PATCH] * 8
        pos = build_mrope_positions(ids, image_patch_token=IMG_PATCH, image_grids=[(2, 2, 2)])
        assert pos[0].max() == 1 and pos[1].max() == 1 and pos[2].max() == 1


class TestDynamicProcessor:
    def test_image_patchify_shapes(self):
        from PIL import Image

        proc = DynamicImageProcessor()
        img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (100, 150, 3), np.uint8))
        out = proc(images=[img])
        rows, grid = out["pixel_values"], out["image_grid_thw"]
        t, h, w = grid[0]
        assert t == 1
        assert rows.shape == (t * h * w, 3 * 2 * 14 * 14)
        assert h % 2 == 0 and w % 2 == 0  # merge-size aligned

    def test_process_ratio_buckets(self):
        assert process_ratio(512, 512) == (512, 512)
        assert process_ratio(300, 600) == ASPECT_RATIO_512["0.5"]


class TestMedia:
    def test_fetch_image_base64_and_file(self, tmp_path):
        from PIL import Image

        img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
        p = tmp_path / "a.png"
        img.save(p)
        assert fetch_image(str(p)).size == (8, 8)
        import base64, io

        buf = io.BytesIO()
        img.save(buf, format="PNG")
        b64 = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
        assert fetch_image(b64).size == (8, 8)

    def test_frame_samplers(self):
        np.testing.assert_array_equal(sample_frame_indices(5, 8), np.arange(5))
        idx = sample_frame_indices(100, 8)
        assert len(idx) == 8 and idx[0] == 0 and idx[-1] == 99
        idx = sample_fps_indices(100, native_fps=25, target_fps=2, max_frames=6)
        assert len(idx) == 6

    def test_audio_roundtrip(self, tmp_path):
        sr = 16000
        t = np.linspace(0, 1, sr, endpoint=False)
        wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        p = tmp_path / "t.wav"
        save_wav(str(p), wav, sr)
        back, sr2 = fetch_audio(str(p), target_sr=sr)
        assert sr2 == sr
        assert np.abs(back[:100] - wav[:100]).max() < 1e-3
        # resample path
        back8k, sr3 = fetch_audio(str(p), target_sr=8000)
        assert sr3 == 8000 and abs(len(back8k) - 8000) <= 2

    def test_process_vision_info(self, tmp_path):
        from PIL import Image

        img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
        p = tmp_path / "b.png"
        img.save(p)
        msgs = [{"role": "HUMAN", "content": [{"type": "image", "image": str(p)}, {"type": "text", "text": "hi"}]}]
        images, videos = process_vision_info(msgs)
        assert len(images) == 1 and videos is None


class TestMetrics:
    def test_psnr_identity_and_noise(self):
        a = np.random.default_rng(0).uniform(-1, 1, (3, 32, 32)).astype(np.float32)
        assert psnr(a, a) > 100
        noisy = a + 0.1 * np.random.default_rng(1).standard_normal(a.shape).astype(np.float32)
        v = psnr(a, noisy)
        assert 15 < v < 30

    def test_ssim_bounds(self):
        a = np.random.default_rng(0).uniform(-1, 1, (3, 32, 32)).astype(np.float32)
        assert ssim(a, a) > 0.999
        b = np.random.default_rng(1).uniform(-1, 1, (3, 32, 32)).astype(np.float32)
        assert ssim(a, b) < 0.3

    def test_frechet_distance(self):
        rng = np.random.default_rng(0)
        s1, s2 = FeatureStats(4), FeatureStats(4)
        x = rng.standard_normal((500, 4))
        s1.update(x)
        s2.update(x + 0.0)
        assert frechet_distance(s1, s2) < 1e-6
        s3 = FeatureStats(4)
        s3.update(rng.standard_normal((500, 4)) + 3.0)
        assert frechet_distance(s1, s3) > 5


class TestGlmLegacy:
    def test_2d_positions(self):
        from mingunivision_tpu.processing.glm_legacy import build_glm_position_ids

        pos, block = build_glm_position_ids(mask_pos=3, bos_pos=5, max_output_length=3, rotary_type="2d")
        assert pos == [0, 1, 2, 3, 4, 3, 3, 3, 3]
        assert block == [0, 0, 0, 0, 0, 1, 2, 3, 4]

    def test_1d_positions(self):
        from mingunivision_tpu.processing.glm_legacy import build_glm_position_ids

        pos, block = build_glm_position_ids(mask_pos=3, bos_pos=5, max_output_length=2, rotary_type="1d")
        assert pos == [0, 1, 2, 3, 4, 4, 5, 6]
        assert len(block) == len(pos)

    def test_windowed_matches_reference_shape(self):
        from mingunivision_tpu.processing.glm_legacy import build_glm_position_ids

        pos, block = build_glm_position_ids(mask_pos=0, bos_pos=10, max_output_length=4, window_size=5)
        assert len(pos) == len(block) == 15
        assert max(pos[:10]) < 4  # wrapped at window_size-1

    def test_prefix_lm_mask(self):
        from mingunivision_tpu.processing.glm_legacy import build_glm_attention_mask

        m = build_glm_attention_mask(5, sep=3)
        assert m[0][:3] == [1, 1, 1] and m[0][3:] == [0, 0]  # prefix bidirectional
        assert m[4] == [1, 1, 1, 1, 1]


class TestAdaptiveFrameSelection:
    def test_content_change_fallback(self):
        import numpy as np

        from mingunivision_tpu.processing.media import select_frames_by_relevance

        T, H, W = 10, 8, 8
        frames = np.zeros((T, H, W, 3), np.uint8)
        frames[5:] = 200  # one big scene cut at frame 5
        keep = select_frames_by_relevance(frames, num_keep=3)
        assert len(keep) == 3 and keep[0] == 0
        assert 5 in keep  # the cut frame is the most relevant

    def test_custom_scorer_and_passthrough(self):
        import numpy as np

        from mingunivision_tpu.processing.media import select_frames_by_relevance

        frames = np.zeros((6, 4, 4, 3), np.uint8)
        keep = select_frames_by_relevance(frames, num_keep=2, query="q", scorer=lambda f, q: [0, 0, 9, 0, 8, 0])
        assert list(keep) == [0, 2]
        # num_keep >= T passes everything through
        assert list(select_frames_by_relevance(frames, num_keep=10)) == list(range(6))


class TestBailingTokenizerFacade:
    def test_chat_template_and_builders(self):
        from mingunivision_tpu.processing.tokenizer import BailingTokenizer, build_test_tokenizer

        tok = BailingTokenizer(build_test_tokenizer())
        convo = {
            "messages": [
                {"role": "SYSTEM", "content": "be brief"},
                {"role": "HUMAN", "content": "hello"},
                {"role": "ASSISTANT", "content": "hi"},
                {"role": "HUMAN", "content": "bye"},
            ]
        }
        text = tok.apply_chat_template(convo, add_generation_prompt=True)
        assert text.startswith("<role>SYSTEM</role>be brief")
        assert text.endswith("<role>ASSISTANT</role>")
        ids = tok.apply_chat_template(convo, add_generation_prompt=True, tokenize=True)
        assert isinstance(ids, list) and len(ids) > 4

        gen = tok.build_inputs_for_generation([5, 6, 7], max_output_length=4, rotary_type="2d")
        assert len(gen["position_ids"][0]) == 3 + 4 + 1

        train = tok.build_inputs_for_train("a question", "an answer", max_length=32)
        assert len(train["input_ids"]) == 32
        assert len(train["labels"]) == 32
        assert any(l != -100 for l in train["labels"])

    def test_jinja_template_preferred_when_shipped(self):
        """Reference tokenization_bailing.py:208-241: when the checkpoint ships
        an HF jinja chat_template, apply_chat_template must render THROUGH it —
        the Chat-object fallback only serves template-less tokenizers."""
        from mingunivision_tpu.processing.tokenizer import BailingTokenizer, build_test_tokenizer

        inner = build_test_tokenizer()
        inner.chat_template = (
            "{% for m in messages %}[{{ m.role }}]{{ m.content }}{% endfor %}"
            "{% if add_generation_prompt %}[GEN]{% endif %}"
        )
        tok = BailingTokenizer(inner)
        msgs = [{"role": "user", "content": "hello"}]
        out = tok.apply_chat_template(msgs, add_generation_prompt=True)
        assert out == "[user]hello[GEN]"  # jinja rendering, not <role> tags
        # explicit chat_template kwarg forces jinja even if none is shipped
        tok2 = BailingTokenizer(build_test_tokenizer())
        out2 = tok2.apply_chat_template(
            msgs, chat_template="{% for m in messages %}<{{ m.content }}>{% endfor %}"
        )
        assert out2 == "<hello>"
        # and without either, the antglm Chat fallback still renders
        out3 = tok2.apply_chat_template({"messages": [{"role": "HUMAN", "content": "hi"}]})
        assert "<role>HUMAN</role>" in out3

    def test_batched_template(self):
        from mingunivision_tpu.processing.tokenizer import BailingTokenizer, build_test_tokenizer

        tok = BailingTokenizer(build_test_tokenizer())
        convos = [
            {"messages": [{"role": "HUMAN", "content": "one"}]},
            {"messages": [{"role": "HUMAN", "content": "two"}]},
        ]
        out = tok.apply_chat_template(convos)
        assert isinstance(out, list) and len(out) == 2


class TestVideoProcessing:
    def test_video_expansion_and_grids(self):
        import numpy as np

        from mingunivision_tpu.processing.processor import BailingMMProcessor
        from mingunivision_tpu.processing.tokenizer import build_test_tokenizer

        proc = BailingMMProcessor(build_test_tokenizer(), und_image_size=64)
        frames = np.random.default_rng(0).integers(0, 255, (2, 48, 80, 3), np.uint8)
        out = proc(text="look <VIDEO> now", videos=[frames], image_patch_size=32)
        # 64px square resize -> 2x2 patches per frame, 2 frames -> 8 tokens
        np.testing.assert_array_equal(out.video_grid_thw, [[2, 2, 2]])
        assert out.pixel_values_videos.shape == (1, 2, 3, 64, 64)
        fp = proc.tokenizer.convert_tokens_to_ids("<imagePatch>")
        vs = proc.tokenizer.convert_tokens_to_ids("<video>")
        ids = out.input_ids[0].tolist()
        assert ids.count(fp) == 8 and vs in ids


class TestAdaptiveFrameMerge:
    """LongVU-style adaptive merge (reference bailingmm_utils.py:290-299):
    half uniform grid + relevance-ranked fill, sorted union."""

    def test_merge_half_uniform_plus_relevant(self):
        from mingunivision_tpu.processing.media import adaptive_frame_rows

        T, num = 100, 80
        frames = np.zeros((T, 4, 4, 3), np.uint8)
        # scorer ranks the last frames most relevant
        rows = adaptive_frame_rows(frames, num, scorer=lambda f, q: np.arange(T))
        assert len(rows) == num
        assert (np.diff(rows) > 0).all()  # sorted, unique
        half = np.linspace(0, T - 1, T // 2, dtype=int)
        assert set(half.tolist()) <= set(rows.tolist())  # uniform backbone kept
        # the fill came from the TOP of the ranking (highest indices)
        fill = sorted(set(rows.tolist()) - set(half.tolist()), reverse=True)
        assert fill[0] == T - 2 or fill[0] == T - 1

    def test_default_scorer_prefers_changing_frames(self):
        from mingunivision_tpu.processing.media import adaptive_frame_rows

        rng = np.random.default_rng(0)
        T = 100
        frames = np.zeros((T, 8, 8, 3), np.uint8)
        frames[70] = rng.integers(0, 255, (8, 8, 3))  # one visually distinct moment
        rows = adaptive_frame_rows(frames, 60)
        assert 70 in rows or 71 in rows


class TestCrossmodalFrameScorer:
    """api.MingUniVisionInfer.make_frame_scorer — the in-checkpoint LongVU slot
    (reference bailingmm_utils.py:307-360 delegates to an external VLM)."""

    @pytest.fixture(scope="class")
    def infer(self):
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from examples.test_infer_unified import build_tiny_infer

        return build_tiny_infer()

    def test_no_query_distinctiveness(self, infer):
        scorer = infer.make_frame_scorer(batch_size=3)
        frames = np.zeros((4, 32, 48, 3), np.uint8)
        frames[..., 1] = 80  # identical green-ish frames...
        frames[2] = np.random.default_rng(0).integers(0, 255, (32, 48, 3))  # ...one outlier
        s = scorer(frames, None)
        assert s.shape == (4,)
        assert np.isfinite(s).all()
        # mean-distance math: the outlier scores 3x the duplicates, regardless of weights
        assert s[2] > s[0] and s[2] > s[1] and s[2] > s[3]

    def test_query_scores_deterministic_and_pluggable(self, infer):
        from mingunivision_tpu.processing.media import select_frames_by_relevance

        scorer = infer.make_frame_scorer(batch_size=2)
        frames = np.random.default_rng(1).integers(0, 255, (5, 40, 40, 3), np.uint8)
        s1 = scorer(frames, "a red panda climbing a tree")
        s2 = scorer(frames, "a red panda climbing a tree")
        assert s1.shape == (5,)
        np.testing.assert_allclose(s1, s2)  # deterministic
        assert (np.abs(s1) <= 1.0 + 1e-5).all()  # cosine range
        keep = select_frames_by_relevance(frames, num_keep=3, query="q", scorer=scorer)
        assert len(keep) == 3 and (np.diff(keep) > 0).all()
        # query changes the ranking input (different text -> different scores)
        s3 = scorer(frames, "completely different query about the ocean")
        assert not np.allclose(s1, s3)
