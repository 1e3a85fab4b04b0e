"""Quality-gate machinery tests: LPIPS net, rFID pipeline, T2I eval harness."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.utils.feature_net import (
    LPIPSConfig,
    TinyConvFeatures,
    lpips_distance,
    lpips_params_from_torch,
    random_lpips_params,
)
from mingunivision_tpu.utils.metrics import recon_metrics, rfid


class TestLPIPS:
    @pytest.fixture(scope="class")
    def params(self):
        return random_lpips_params(jax.random.PRNGKey(0))

    def test_zero_on_identical_positive_otherwise(self, params):
        rng = np.random.default_rng(0)
        a = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
        b = np.clip(a + 0.3 * rng.standard_normal(a.shape).astype(np.float32), -1, 1)
        d_same = np.asarray(lpips_distance(params, a, a))
        d_diff = np.asarray(lpips_distance(params, a, b))
        np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
        assert (d_diff > 0).all()

    def test_monotone_in_noise(self, params):
        rng = np.random.default_rng(1)
        a = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
        noise = rng.standard_normal(a.shape).astype(np.float32)
        d1 = float(lpips_distance(params, a, np.clip(a + 0.05 * noise, -1, 1))[0])
        d2 = float(lpips_distance(params, a, np.clip(a + 0.4 * noise, -1, 1))[0])
        assert d2 > d1

    def test_torch_statedict_converter_shape_contract(self, params):
        """Round-trip: a state dict in the lpips package's naming converts into
        the same tree structure as random init (weights drop in unchanged)."""
        sd = {}
        # build a fake lpips-vgg state dict from the random params
        torch_like = lambda x: np.asarray(x)
        # torchvision VGG16 feature indices for each slice's convs
        slice_indices = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]
        offsets = [0, 5, 10, 17, 24]
        for si, stage in enumerate(params["vgg"]):
            for ci, conv in enumerate(stage):
                idx = slice_indices[si][ci] - offsets[si]
                sd[f"net.slice{si + 1}.{slice_indices[si][ci]}.weight"] = torch_like(conv["w"])
                sd[f"net.slice{si + 1}.{slice_indices[si][ci]}.bias"] = torch_like(conv["b"])
            sd[f"lin{si}.model.1.weight"] = torch_like(params["lin"][si]["w"])
        conv = lpips_params_from_torch(sd)
        a = np.random.default_rng(2).uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
        b = -a
        d_ref = np.asarray(lpips_distance(params, a, b))
        d_conv = np.asarray(lpips_distance(conv, a, b))
        np.testing.assert_allclose(d_conv, d_ref, rtol=1e-5)

    def test_recon_metrics_includes_lpips(self, params):
        rng = np.random.default_rng(3)
        a = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
        m = recon_metrics(a, np.clip(a + 0.1, -1, 1), lpips_params=params)
        assert set(m) == {"psnr", "ssim", "lpips"} and m["lpips"] > 0


class TestRFID:
    def test_zero_for_same_distribution_positive_for_shifted(self):
        feat = TinyConvFeatures(dim=48)
        rng = np.random.default_rng(0)
        real = rng.uniform(-1, 1, (64, 3, 32, 32)).astype(np.float32)
        same = real + 1e-6
        shifted = np.clip(real * 0.3 + 0.5, -1, 1)
        assert rfid(feat, real, same) < 1e-3
        assert rfid(feat, real, shifted) > rfid(feat, real, same)


class TestT2IEvalHarness:
    def test_prompt_suites_and_scoring(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))
        from eval_t2i import dpg_prompts, geneval_prompts, score_manifest

        gp = geneval_prompts(per_category=2)
        tags = {p["tag"] for p in gp}
        assert tags == {"single_object", "two_object", "counting", "colors", "position", "color_attr"}
        assert all("prompt" in p and "include" in p for p in gp)
        assert len(dpg_prompts(5)) == 5

        # scoring hook aggregates per-tag + overall
        manifest = tmp_path / "manifest.jsonl"
        with open(manifest, "w") as f:
            for i, p in enumerate(gp):
                f.write(json.dumps({**p, "image": f"/nonexistent/{i}.png"}) + "\n")
        summary = score_manifest(str(manifest), scorer=lambda img, meta: {"correct": meta["tag"] == "colors"})
        assert summary["colors"] == 1.0 and summary["single_object"] == 0.0
        assert 0 < summary["overall"] < 1

    def test_generation_layout_with_tiny_model(self, tmp_path):
        """End-to-end: the tiny model writes the official GenEval directory
        layout (idx/samples/000k.png + metadata.jsonl + manifest)."""
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))
        from examples.test_infer_unified import build_tiny_infer
        from eval_t2i import generate_suite

        infer = build_tiny_infer()
        prompts = [{"tag": "single_object", "prompt": "a photo of a cat", "include": []}]
        manifest = generate_suite(infer, prompts, str(tmp_path / "out"), images_per_prompt=1, max_new_tokens=8)
        assert os.path.exists(manifest)
        meta = tmp_path / "out" / "00000" / "metadata.jsonl"
        assert meta.exists()
        lines = [json.loads(l) for l in open(manifest)]
        assert lines[0]["prompt_idx"] == 0
