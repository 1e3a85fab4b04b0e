"""Cross-request batched T2I (serving/image_batch.py): N different prompts of
DIFFERENT lengths through one AR loop — shared-bucket cache offsets, block-major
CFG rows, per-image noise."""

import numpy as np

import jax
import jax.numpy as jnp

from mingunivision_tpu.config import (
    BailingMoeConfig,
    ImageGenConfig,
    MingTokConfig,
    MingUniVisionConfig,
    PixelDecoderConfig,
    RFHeadConfig,
    RuntimeConfig,
    SemanticDecoderConfig,
    ViTEncoderConfig,
)
from mingunivision_tpu.engine.generate import init_linear_proj_params
from mingunivision_tpu.models.bailing_moe import init_bailing_moe_params
from mingunivision_tpu.models.mingtok import init_mingtok_params
from mingunivision_tpu.models.rf_head import init_rf_head_params, init_vis_head_params
from mingunivision_tpu.serving.image_batch import batched_image_generation

EOS, IMG_START = 501, 500


def _tiny_cfg() -> MingUniVisionConfig:
    llm = BailingMoeConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        moe_intermediate_size=32,
        num_experts=8,
        num_experts_per_tok=2,
        num_shared_experts=2,
        max_position_embeddings=256,
        mrope_section=(2, 3, 3),
        eos_token_id=EOS,
        pad_token_id=EOS,
        image_start_token=IMG_START,
        num_image_tokens_for_gen=4,
    )
    mingtok = MingTokConfig(
        encoder=ViTEncoderConfig(img_size=32, patch_size=16, embed_dim=64, depth=1, num_heads=1, out_dim=8),
        semantic_decoder=SemanticDecoderConfig(in_dim=8, embed_dim=64, depth=1, num_heads=1, patch_size=16),
        pixel_decoder=PixelDecoderConfig(embed_dim=64, depth=1, num_heads=1, patch_size=8, ffn_layer="mlp"),
        scaling_factor=2.0,
        mean=0.5,
    )
    rf = RFHeadConfig(target_channels=8, z_channels=32, width=32, depth=1, mlp_mult=4, num_sampling_steps=2)
    return MingUniVisionConfig(
        llm=llm, mingtok=mingtok, rf_head=rf, mlp_depth=2,
        image_gen=ImageGenConfig(num_image_tokens=4, text_cfg=3.0, image_cfg=1.1),
    )


def _params(cfg):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    return {
        "llm": init_bailing_moe_params(ks[0], cfg.llm, dtype=jnp.float32),
        "mingtok": init_mingtok_params(ks[1], cfg.mingtok, dtype=jnp.float32),
        "rf_head": init_rf_head_params(ks[2], cfg.rf_head, dtype=jnp.float32),
        "vis_head": init_vis_head_params(ks[3], cfg.llm.hidden_size, cfg.rf_head.z_channels, dtype=jnp.float32),
        "linear_proj": init_linear_proj_params(ks[4], cfg.mingtok.feature_dim, cfg.llm.hidden_size, cfg.mlp_depth, dtype=jnp.float32),
    }


def test_different_length_prompts_batched():
    cfg = _tiny_cfg()
    params = _params(cfg)
    rt = RuntimeConfig(max_seq_len=192, compute_dtype="float32")
    rng = np.random.default_rng(0)

    def req(T):
        ids = rng.integers(0, 400, (1, T))
        am = np.ones((1, T), np.int64)
        um = am.copy()
        um[:, T // 2 :] = 0
        return {"input_ids": ids, "attention_mask": am, "uncond_attention_mask": um}

    reqs = [req(5), req(9)]  # different lengths -> shared bucket
    imgs = batched_image_generation(params, cfg, rt, reqs, jax.random.PRNGKey(1))
    assert imgs.shape[0] == 2 and imgs.shape[1] == 3
    assert np.isfinite(imgs).all()
    assert not np.allclose(imgs[0], imgs[1])  # different prompts + noise

    # deterministic given the same key
    imgs2 = batched_image_generation(params, cfg, rt, reqs, jax.random.PRNGKey(1))
    np.testing.assert_allclose(imgs, imgs2, rtol=1e-5)
