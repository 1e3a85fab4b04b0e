"""Session semantics tests: PAST_MODE KEEP/DROP, multi-round positions, image
features through the session, uncond-row extension at image time."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.config import GenerationConfig, RuntimeConfig
from mingunivision_tpu.engine.session import MingUniVisionSession
from tests.test_engine import IMG_PATCH, IMG_START, tiny_mm


@pytest.fixture(scope="module")
def tiny_params():
    from tests.test_engine import tiny_params as tp

    # reuse the fixture logic without pytest indirection
    cfg = tiny_mm()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    from mingunivision_tpu.engine.generate import init_linear_proj_params
    from mingunivision_tpu.models.bailing_moe import init_bailing_moe_params
    from mingunivision_tpu.models.mingtok import init_mingtok_params
    from mingunivision_tpu.models.rf_head import init_rf_head_params, init_vis_head_params

    return cfg, {
        "llm": init_bailing_moe_params(ks[0], cfg.llm, dtype=jnp.float32),
        "mingtok": init_mingtok_params(ks[1], cfg.mingtok, dtype=jnp.float32),
        "rf_head": init_rf_head_params(ks[2], cfg.rf_head, dtype=jnp.float32),
        "vis_head": init_vis_head_params(ks[3], cfg.llm.hidden_size, cfg.rf_head.z_channels, dtype=jnp.float32),
        "linear_proj": init_linear_proj_params(ks[4], cfg.mingtok.feature_dim, cfg.llm.hidden_size, cfg.mlp_depth, dtype=jnp.float32),
    }


def make_session(cfg, params, past_mode="DROP"):
    rt = RuntimeConfig(max_seq_len=192, compute_dtype="float32", past_mode=past_mode)
    return MingUniVisionSession(params, cfg, rt, seed=0)


class TestPastModes:
    def _round(self, sess, n_tokens=4, um_zero_span=(1, 3)):
        ids = np.random.default_rng(0).integers(0, 400, (1, n_tokens))
        am = np.ones((1, n_tokens), np.int64)
        um = am.copy()
        um[:, um_zero_span[0] : um_zero_span[1]] = 0
        tm = am.copy()
        tm[:, um_zero_span[0]] = 0
        return sess.generate(
            ids, am, uncond_attention_mask=um, text_uncond_attention_mask=tm,
            generation=GenerationConfig(max_new_tokens=2),
        )

    def test_drop_resets_uncond_to_cond_prompt(self, tiny_params):
        cfg, params = tiny_params
        sess = make_session(cfg, params, "DROP")
        self._round(sess)
        # DROP: uncond == the round's cond prompt mask (ones over prompt), i.e.
        # the per-round uncond zeros are discarded (modeling_bailingmm.py:290-297)
        prompt_um = np.asarray(sess.uncond_mask[0, :4])
        assert prompt_um.all()
        # text-uncond == full cond mask incl. generated positions
        assert np.asarray(sess.text_uncond_mask[0, : sess.seq_len]).all()

    def test_keep_preserves_uncond_zeros(self, tiny_params):
        cfg, params = tiny_params
        sess = make_session(cfg, params, "KEEP")
        self._round(sess)
        um = np.asarray(sess.uncond_mask[0, :4])
        assert um[0] and not um[1] and not um[2] and um[3]
        # beyond the prompt, uncond stays ZERO (pad_uncond is zeros, :282)
        assert not np.asarray(sess.uncond_mask[0, 4 : sess.seq_len]).any()

    def test_multi_round_positions_continue(self, tiny_params):
        cfg, params = tiny_params
        sess = make_session(cfg, params, "DROP")
        self._round(sess)
        len1 = sess.seq_len
        self._round(sess)
        assert sess.seq_len > len1
        # the cond mask is contiguous ones over everything so far
        assert np.asarray(sess.mask[0, : sess.seq_len]).all()


class TestSessionVision:
    def test_image_features_change_prefill(self, tiny_params):
        cfg, params = tiny_params
        n_patch = (32 // 16) ** 2  # tiny encoder: 32px, patch 16 -> 4 patches
        ids = np.array([[1, 2] + [IMG_PATCH] * n_patch + [3]])
        am = np.ones_like(ids)
        img = np.random.default_rng(0).standard_normal((1, 3, 32, 32)).astype(np.float32)

        s1 = make_session(cfg, params)
        out1 = s1.generate(ids, am, pixel_values=img, generation=GenerationConfig(max_new_tokens=2))
        s2 = make_session(cfg, params)
        out2 = s2.generate(ids, am, pixel_values=img * -1.0, generation=GenerationConfig(max_new_tokens=2))
        s3 = make_session(cfg, params)
        out3 = s3.generate(ids, am, pixel_values=img, generation=GenerationConfig(max_new_tokens=2))
        assert out1.token_ids == out3.token_ids  # deterministic
        # different image content must be able to change the rollout OR at least
        # the cache contents; compare first-layer cache rows
        k1 = np.asarray(s1.cache.k[0, 0, :, :8])
        k2 = np.asarray(s2.cache.k[0, 0, :, :8])
        assert not np.allclose(k1, k2, atol=1e-5)
