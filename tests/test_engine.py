"""Engine integration tests on tiny configs (CPU): decode loops, image phase,
multi-round session state. Reference-parity of the underlying modules is covered
by the golden tests; these validate the jitted orchestration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.config import (
    BailingMoeConfig,
    GenerationConfig,
    ImageGenConfig,
    MingTokConfig,
    MingUniVisionConfig,
    PixelDecoderConfig,
    RFHeadConfig,
    RuntimeConfig,
    SemanticDecoderConfig,
    ViTEncoderConfig,
)
from mingunivision_tpu.engine.generate import decode_text, generate_image_tokens, prefill, scatter_image_embeds
from mingunivision_tpu.engine.session import MingUniVisionSession
from mingunivision_tpu.engine.generate import init_linear_proj_params
from mingunivision_tpu.models.bailing_moe import (
    LLMCache,
    bailing_forward,
    compute_logits,
    embed_tokens,
    init_bailing_moe_params,
)
from mingunivision_tpu.models.mingtok import init_mingtok_params
from mingunivision_tpu.models.rf_head import init_rf_head_params, init_vis_head_params

EOS, IMG_START, IMG_PATCH = 501, 500, 499


def tiny_llm() -> BailingMoeConfig:
    return BailingMoeConfig(
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
        image_patch_token=IMG_PATCH,
        image_start_token=IMG_START,
        num_image_tokens_for_gen=4,
    )


def tiny_mm() -> MingUniVisionConfig:
    return MingUniVisionConfig(
        mingtok=MingTokConfig(
            encoder=ViTEncoderConfig(img_size=32, patch_size=16, embed_dim=64, depth=1, num_heads=1, out_dim=8),
            semantic_decoder=SemanticDecoderConfig(in_dim=8, embed_dim=64, depth=1, num_heads=1, patch_size=16),
            pixel_decoder=PixelDecoderConfig(embed_dim=64, depth=1, num_heads=1, patch_size=8, ffn_layer="mlp"),
            scaling_factor=2.0,
            mean=0.5,
        ),
        llm=tiny_llm(),
        rf_head=RFHeadConfig(target_channels=8, z_channels=32, width=32, depth=1, mlp_mult=4, num_sampling_steps=2),
        image_gen=ImageGenConfig(num_image_tokens=4),
        mlp_depth=2,
    )


@pytest.fixture(scope="module")
def tiny_params():
    cfg = tiny_mm()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    return cfg, {
        "llm": init_bailing_moe_params(ks[0], cfg.llm, dtype=jnp.float32),
        "mingtok": init_mingtok_params(ks[1], cfg.mingtok, dtype=jnp.float32),
        "rf_head": init_rf_head_params(ks[2], cfg.rf_head, dtype=jnp.float32),
        "vis_head": init_vis_head_params(ks[3], cfg.llm.hidden_size, cfg.rf_head.z_channels, dtype=jnp.float32),
        "linear_proj": init_linear_proj_params(ks[4], cfg.mingtok.feature_dim, cfg.llm.hidden_size, cfg.mlp_depth, dtype=jnp.float32),
    }


class TestDecodeLoop:
    def test_while_loop_matches_stepwise(self, tiny_params):
        cfg, params = tiny_params
        llm = params["llm"]
        c = cfg.llm
        Smax = 64
        ids = np.random.default_rng(0).integers(0, 400, (1, 5))

        # prefill
        cache = LLMCache.create(c, 1, Smax, jnp.float32)
        mask = jnp.zeros((1, Smax), bool).at[:, :5].set(True)
        embeds = embed_tokens(llm, jnp.asarray(ids))
        hidden, cache = bailing_forward(llm, c, embeds, cache, mask)
        t0 = jnp.argmax(compute_logits(llm, c, hidden)[:, -1], -1)[0].astype(jnp.int32)

        # stepwise host loop
        cache_a, mask_a, cur = cache, mask, t0
        toks_host = []
        for i in range(6):
            mask_a = mask_a.at[:, cache_a.length].set(True)
            pos = jnp.sum(mask_a.astype(jnp.int32), 1)[:, None] - 1
            e = embed_tokens(llm, cur.reshape(1, 1))
            h, cache_a = bailing_forward(llm, c, e, cache_a, mask_a, positions=pos)
            cur = jnp.argmax(compute_logits(llm, c, h)[:, -1], -1)[0].astype(jnp.int32)
            toks_host.append(int(cur))
            if int(cur) in (c.eos_token_id, c.image_start_token):
                break

        # jitted while_loop
        res = decode_text(llm, c, t0, cache, mask, jax.random.PRNGKey(0), max_steps=6)
        n = int(res.num)
        assert np.asarray(res.tokens[: len(toks_host)]).tolist() == toks_host
        assert n >= len(toks_host)

    def test_prefill_right_padding_invariant(self, tiny_params):
        cfg, params = tiny_params
        c = cfg.llm
        ids = np.random.default_rng(1).integers(0, 400, (1, 7))
        outs = []
        for Tpad in (7, 12):
            cache = LLMCache.create(c, 1, 64, jnp.float32)
            mask = jnp.zeros((1, 64), bool).at[:, :7].set(True)
            idp = np.zeros((1, Tpad), np.int64)
            idp[:, :7] = ids
            embeds = embed_tokens(params["llm"], jnp.asarray(idp))
            logits, cache2 = prefill(params["llm"], c, embeds, cache, mask)
            outs.append((np.asarray(logits), int(cache2.length)))
        np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-4, atol=1e-4)
        assert outs[0][1] == outs[1][1] == 7


class TestScatter:
    def test_scatter_image_embeds(self, tiny_params):
        cfg, params = tiny_params
        ids = np.array([[1, IMG_PATCH, 2, IMG_PATCH, 3]])
        embeds = jnp.zeros((1, 5, 8))
        feats = jnp.asarray(np.arange(16, dtype=np.float32).reshape(2, 8))
        out, im_mask = scatter_image_embeds(embeds, jnp.asarray(ids), feats, IMG_PATCH)
        np.testing.assert_allclose(np.asarray(out[0, 1]), np.arange(8))
        np.testing.assert_allclose(np.asarray(out[0, 3]), np.arange(8, 16))
        np.testing.assert_allclose(np.asarray(out[0, 0]), np.zeros(8))
        assert np.asarray(im_mask).tolist() == [[False, True, False, True, False]]


class TestImagePhase:
    def test_generate_image_tokens_shapes_and_cache(self, tiny_params):
        cfg, params = tiny_params
        c = cfg.llm
        Smax = 64
        cache = LLMCache.create(c, 1, Smax, jnp.float32)
        mask = jnp.zeros((1, Smax), bool).at[:, :5].set(True)
        ids = np.random.default_rng(2).integers(0, 400, (1, 5))
        embeds = embed_tokens(params["llm"], jnp.asarray(ids))
        _, cache = bailing_forward(params["llm"], c, embeds, cache, mask)

        uncond = jnp.zeros((1, Smax), bool).at[:, :2].set(True)
        rows = jnp.concatenate([mask, uncond, mask | uncond], 0)
        cache3 = cache.repeat_rows(3)
        start_embed = embed_tokens(params["llm"], jnp.asarray([[IMG_START]]))
        res = generate_image_tokens(
            params,
            c,
            cfg.mingtok,
            cfg.rf_head,
            cfg.image_gen,
            start_embed,
            cache3,
            rows,
            jax.random.PRNGKey(3),
            cfg_rows=3,
        )
        n = cfg.image_gen.num_image_tokens
        assert res.sem_tokens.shape == (1, n, cfg.mingtok.feature_dim)
        assert res.last_hidden.shape == (1, 1, c.hidden_size)
        # cache grew by n+1 writes (<image> + n-1 sem embeds in-loop + trailing)
        assert int(res.cache.length) == 5 + n + 1
        # masks grew identically for every CFG row beyond the prompt
        grown = np.asarray(res.mask[:, 5 : 5 + n + 1])
        assert grown.all()
        # deterministic given the same key
        res2 = generate_image_tokens(
            params, c, cfg.mingtok, cfg.rf_head, cfg.image_gen, start_embed,
            cache.repeat_rows(3), rows, jax.random.PRNGKey(3), cfg_rows=3,
        )
        np.testing.assert_allclose(np.asarray(res.sem_tokens), np.asarray(res2.sem_tokens), rtol=1e-5)


class TestSession:
    def test_full_round_with_forced_image(self, tiny_params):
        cfg, params = tiny_params
        # force argmax == IMG_START by biasing the lm_head column
        llm = dict(params["llm"])
        w = np.asarray(llm["lm_head"]["w"]).copy()
        w[:, IMG_START] = 10.0
        llm = {**params["llm"], "lm_head": {"w": jnp.asarray(w)}}
        p = {**params, "llm": llm}

        rt = RuntimeConfig(max_seq_len=192, compute_dtype="float32")
        sess = MingUniVisionSession(p, cfg, rt, seed=0)
        ids = np.random.default_rng(3).integers(0, 400, (1, 6))
        am = np.ones((1, 6), np.int64)
        um = am.copy()
        um[:, 3:] = 0  # pretend last human turn masked
        out = sess.generate(
            ids, am, uncond_attention_mask=um, text_uncond_attention_mask=am,
            generation=GenerationConfig(max_new_tokens=1),
        )
        assert out.token_ids[0] == IMG_START
        assert len(out.images) == 1
        img = out.images[0]
        assert img.shape == (3, 32, 32)
        assert img.min() >= -1.0 and img.max() <= 1.0
        # cache advanced: 6 prompt + (4+1) image writes
        assert sess.seq_len == 6 + cfg.image_gen.num_image_tokens + 1

    def test_multi_round_editing_state(self, tiny_params):
        cfg, params = tiny_params
        rt = RuntimeConfig(max_seq_len=192, compute_dtype="float32")
        sess = MingUniVisionSession(params, cfg, rt, seed=0)
        ids = np.random.default_rng(4).integers(0, 400, (1, 4))
        am = np.ones((1, 4), np.int64)
        out1 = sess.generate(ids, am, generation=GenerationConfig(max_new_tokens=3))
        len1 = sess.seq_len
        assert len1 >= 4
        # round 2: only the new turn's tokens are fed; cache persists
        out2 = sess.generate(ids, am, generation=GenerationConfig(max_new_tokens=3))
        assert sess.seq_len > len1
        sess.reset_inner_state()
        assert sess.seq_len == 0 and sess.cache is None


class TestCfgSchedules:
    @pytest.mark.parametrize("schedule", ["linear", "linear-reverse"])
    def test_non_constant_cfg_schedules_trace(self, tiny_params, schedule):
        cfg, params = tiny_params
        c = cfg.llm
        Smax = 64
        cache = LLMCache.create(c, 1, Smax, jnp.float32)
        mask = jnp.zeros((1, Smax), bool).at[:, :4].set(True)
        ids = np.random.default_rng(5).integers(0, 400, (1, 4))
        _, cache = bailing_forward(params["llm"], c, embed_tokens(params["llm"], jnp.asarray(ids)), cache, mask)
        igen = ImageGenConfig(num_image_tokens=2, cfg_schedule=schedule)
        res = generate_image_tokens(
            params, c, cfg.mingtok, cfg.rf_head, igen,
            embed_tokens(params["llm"], jnp.asarray([[IMG_START]])),
            cache.repeat_rows(3),
            jnp.concatenate([mask, mask, mask], 0),
            jax.random.PRNGKey(0), cfg_rows=3,
        )
        assert np.isfinite(np.asarray(res.sem_tokens, np.float32)).all()


class TestBatchedImageGen:
    def test_batched_matches_layout_and_distinguishes_images(self, tiny_params):
        """n_images=2 block-major rows: per-image sem tokens, per-image noise,
        shared weight reads. Different prompts -> different images; same
        prompt in both slots -> identical sem tokens (same in-batch noise? no —
        noise differs per image, so only shapes/determinism are asserted there)."""
        cfg, params = tiny_params
        c = cfg.llm
        Smax = 64
        n_img, R = 2, 3

        def prefix(ids):
            cache = LLMCache.create(c, 1, Smax, jnp.float32)
            mask = jnp.zeros((1, Smax), bool).at[:, : ids.shape[1]].set(True)
            _, cache = bailing_forward(params["llm"], c, embed_tokens(params["llm"], ids), cache, mask)
            return cache, mask

        ids_a = jnp.asarray(np.random.default_rng(2).integers(0, 400, (1, 5)))
        ids_b = jnp.asarray(np.random.default_rng(7).integers(0, 400, (1, 5)))
        cache_a, mask_a = prefix(ids_a)
        cache_b, mask_b = prefix(ids_b)
        uncond = jnp.zeros((1, Smax), bool).at[:, :2].set(True)

        # BLOCK-major rows: [cond_a, cond_b, unc_a, unc_b, tu_a, tu_b]
        rows = jnp.concatenate([mask_a, mask_b, uncond, uncond, mask_a | uncond, mask_b | uncond], 0)
        cache = LLMCache(
            jnp.concatenate([cache_a.k, cache_b.k] * R, axis=1),
            jnp.concatenate([cache_a.v, cache_b.v] * R, axis=1),
            cache_a.length + 0,
        )
        start_embed = embed_tokens(params["llm"], jnp.asarray([[IMG_START]]))
        res = generate_image_tokens(
            params, c, cfg.mingtok, cfg.rf_head, cfg.image_gen, start_embed,
            cache, rows, jax.random.PRNGKey(3), cfg_rows=R, n_images=n_img,
        )
        n = cfg.image_gen.num_image_tokens
        assert res.sem_tokens.shape == (n_img, n, cfg.mingtok.feature_dim)
        assert res.last_hidden.shape == (n_img, 1, c.hidden_size)
        assert int(res.cache.length) == 5 + n + 1
        # the two images must differ (different conditioning AND noise)
        a, b = np.asarray(res.sem_tokens[0]), np.asarray(res.sem_tokens[1])
        assert not np.allclose(a, b)
        # deterministic
        cache2 = LLMCache(
            jnp.concatenate([cache_a.k, cache_b.k] * R, axis=1),
            jnp.concatenate([cache_a.v, cache_b.v] * R, axis=1),
            cache_a.length + 0,
        )
        res2 = generate_image_tokens(
            params, c, cfg.mingtok, cfg.rf_head, cfg.image_gen, start_embed,
            cache2, rows, jax.random.PRNGKey(3), cfg_rows=R, n_images=n_img,
        )
        np.testing.assert_allclose(np.asarray(res.sem_tokens), np.asarray(res2.sem_tokens), rtol=1e-5)


class TestImageVariants:
    def test_n_images_variants_one_prompt(self, tiny_params):
        """n_images=2 yields two DIFFERENT variant images in one batched loop;
        the conversation continues from variant 0."""
        cfg, params = tiny_params
        llm = dict(params["llm"])
        w = np.asarray(llm["lm_head"]["w"]).copy()
        w[:, IMG_START] = 10.0
        p = {**params, "llm": {**params["llm"], "lm_head": {"w": jnp.asarray(w)}}}

        rt = RuntimeConfig(max_seq_len=192, compute_dtype="float32")
        sess = MingUniVisionSession(p, cfg, rt, seed=0)
        ids = np.random.default_rng(3).integers(0, 400, (1, 6))
        am = np.ones((1, 6), np.int64)
        um = am.copy()
        um[:, 3:] = 0
        out = sess.generate(
            ids, am, uncond_attention_mask=um, text_uncond_attention_mask=am,
            generation=GenerationConfig(max_new_tokens=1), n_images=2,
        )
        assert len(out.images) == 2
        a, b = out.images
        assert a.shape == b.shape == (3, 32, 32)
        assert not np.allclose(a, b)  # per-image noise -> distinct variants
        # conversation state is single-row again
        assert sess.cache.batch == 1
        assert sess.seq_len == 6 + cfg.image_gen.num_image_tokens + 1
