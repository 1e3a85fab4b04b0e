"""Qwen-VL-style vision tower tests (omni family)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.models.qwen_vit import (
    QwenViTConfig,
    init_query_tokens,
    init_qwen_vit_params,
    qwen_vit_apply,
    rot_pos_2d,
)
from mingunivision_tpu.processing.dynamic_image import DynamicImageProcessor, DynamicImageProcessorConfig


def tiny_cfg():
    return QwenViTConfig(patch_size=14, embed_dim=64, depth=2, num_heads=2, out_dim=48)


class TestQwenViT:
    def test_end_to_end_with_dynamic_processor(self):
        from PIL import Image

        cfg = tiny_cfg()
        params = init_qwen_vit_params(jax.random.PRNGKey(0), cfg)
        proc = DynamicImageProcessor(DynamicImageProcessorConfig(min_pixels=56 * 56, max_pixels=112 * 112))
        img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (90, 120, 3), np.uint8))
        out = proc(images=[img])
        rows, grid = out["pixel_values"], tuple(int(v) for v in out["image_grid_thw"][0])
        emb = qwen_vit_apply(params, cfg, jnp.asarray(rows, jnp.float32), grid)
        t, h, w = grid
        assert emb.shape == (t * (h // 2) * (w // 2), cfg.out_dim)
        assert np.isfinite(np.asarray(emb)).all()

    def test_rot_pos_2d_splits_row_col(self):
        cos, sin = rot_pos_2d((2, 3), 8, 1e4)
        assert cos.shape == (6, 8)
        # first token (0,0) has zero phase -> cos 1, sin 0
        np.testing.assert_allclose(np.asarray(cos[0]), np.ones(8), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sin[0]), np.zeros(8), atol=1e-6)
        # row plane differs from col plane for (1, 0) vs (0, 1)
        assert not np.allclose(np.asarray(cos[3]), np.asarray(cos[1]))

    def test_video_grid(self):
        cfg = tiny_cfg()
        params = init_qwen_vit_params(jax.random.PRNGKey(1), cfg)
        t, h, w = 2, 4, 6
        rows = jnp.asarray(np.random.default_rng(1).standard_normal((t * h * w, cfg.patch_input_dim)), jnp.float32)
        emb = qwen_vit_apply(params, cfg, rows, (t, h, w))
        assert emb.shape == (t * (h // 2) * (w // 2), cfg.out_dim)

    def test_query_tokens(self):
        q = init_query_tokens(jax.random.PRNGKey(0), hidden=32)
        assert set(q.keys()) == {"scale_4", "scale_8", "scale_16"}
        assert q["scale_16"].shape == (256, 32)
