"""Qwen2.5-VL vision tower tests (omni family). Checkpoint-exactness is proven
in tests/test_omni_golden.py; these cover the dynamic-resolution plumbing and
the host-side geometry helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.models.qwen_vit import (
    QwenViTConfig,
    init_query_tokens,
    init_qwen_vit_params,
    qwen_vit_apply,
    rot_pos_ids,
    window_partition,
)
from mingunivision_tpu.processing.dynamic_image import DynamicImageProcessor, DynamicImageProcessorConfig


def tiny_cfg():
    return QwenViTConfig(
        patch_size=14,
        embed_dim=64,
        depth=2,
        num_heads=2,
        intermediate_size=96,
        out_dim=48,
        window_size=56,  # merger window = 56/2/14 = 2 groups per side
        fullatt_block_indexes=(1,),
    )


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

    def test_rot_pos_ids_merge_order(self):
        # merge-window order: the first 4 tokens are the 2x2 block at (0,0)
        pos = rot_pos_ids(np.array([[1, 4, 4]]), merge_size=2)
        np.testing.assert_array_equal(pos[:4], [[0, 0], [0, 1], [1, 0], [1, 1]])
        assert pos.shape == (16, 2)

    def test_window_partition_covers_all_groups(self):
        cfg = tiny_cfg()
        idx, win_ids, img_ids = window_partition(np.array([[1, 8, 6]]), cfg)
        # 8x6 patches -> 4x3 merger groups; permutation covers each exactly once
        assert sorted(idx.tolist()) == list(range(12))
        assert len(win_ids) == 12 and (img_ids == 0).all()

    def test_video_grid(self):
        cfg = tiny_cfg()
        params = init_qwen_vit_params(jax.random.PRNGKey(1), cfg)
        t, h, w = 2, 4, 6
        rows = jnp.asarray(np.random.default_rng(1).standard_normal((t * h * w, cfg.patch_input_dim)), jnp.float32)
        emb = qwen_vit_apply(params, cfg, rows, (t, h, w))
        assert emb.shape == (t * (h // 2) * (w // 2), cfg.out_dim)

    def test_query_tokens(self):
        q = init_query_tokens(jax.random.PRNGKey(0), hidden=32)
        assert set(q.keys()) == {"4x4", "8x8", "16x16"}
        assert q["16x16"].shape == (256, 32)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(q["8x8"]), axis=-1), 1.0, atol=1e-5)
