"""Golden parity tests: our MingTok vs the PyTorch reference (CPU, tiny config).

The reference model is built with random weights, its state_dict converted through
our weight converter, and activations compared at fp32 (autocast is a no-op on CPU
in the reference, modeling_mingtok.py:198-206 — so fp32-vs-fp32 is exact parity).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference snapshot not mounted"
)

from mingunivision_tpu.config import (  # noqa: E402
    MingTokConfig,
    PixelDecoderConfig,
    SemanticDecoderConfig,
    ViTEncoderConfig,
)
from mingunivision_tpu.models.mingtok import (  # noqa: E402
    make_semdec_cache,
    mingtok_enc_dec,
    mingtok_encode,
    mingtok_feature_decoder,
    mingtok_pixel_decoder,
    semantic_decoder_apply,
)
from mingunivision_tpu.utils.convert import mingtok_params_from_torch  # noqa: E402

D = 128  # embed dim -> 2 heads (reference hardcodes num_heads = dim // 64)


def tiny_cfg() -> MingTokConfig:
    return MingTokConfig(
        encoder=ViTEncoderConfig(img_size=64, patch_size=16, embed_dim=D, depth=2, num_heads=2, out_dim=8),
        semantic_decoder=SemanticDecoderConfig(in_dim=8, embed_dim=D, depth=2, num_heads=2, patch_size=16),
        pixel_decoder=PixelDecoderConfig(embed_dim=D, depth=2, num_heads=2, patch_size=8, ffn_layer="mlp"),
        scaling_factor=2.0,
        mean=0.5,
    )


@pytest.fixture(scope="module")
def ref_and_params():
    import refutil

    mm = refutil.import_reference_mingtok()
    torch.manual_seed(0)
    cfg = tiny_cfg()
    ref_cfg = mm.MingTokConfig(
        low_level_encoder={
            "img_size": 64,
            "patch_size": 16,
            "depth": 2,
            "embed_dim": D,
            "ffn_layer": "swiglufused",
            "out_dim": 8,
        },
        semantic_decoder={
            "in_dim": 8,
            "patch_size": 16,
            "embed_dim": D,
            "decoder_depth": 2,
            "ffn_layer": "swiglufused",
            # fa_enable=True would select MemEffCausalAttention, whose CPU fallback
            # silently DROPS the KV cache (attention.py:206-210) — use the eager
            # CausalAttention so the reference's incremental path is actually cached.
            "fa_enable": False,
        },
        pixel_decoder={
            "patch_size": 8,
            "decoder_depth": 2,
            "embed_dim": D,
            "norm_pix_loss": True,
            "loss_type": "L1-plain",
        },
        scaling_factor=2.0,
        mean=0.5,
        model_dtype="fp32",
    )
    ref = mm.MingTok(ref_cfg).eval()
    params = mingtok_params_from_torch(ref.state_dict(), cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return ref, params, cfg


def rnd_img(b=2, seed=0):
    return np.random.default_rng(seed).standard_normal((b, 3, 64, 64)).astype(np.float32)


class TestEncoderParity:
    def test_encode_features_and_latent(self, ref_and_params):
        ref, params, cfg = ref_and_params
        x = rnd_img()
        with torch.no_grad():
            want = ref.forward(torch.tensor(x))
        got = mingtok_encode(params, cfg, jnp.asarray(x), compute_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got["latent"]), want["latent"].numpy(), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["x_norm_patchtokens"]),
            want["x_norm_patchtokens"].numpy(),
            rtol=2e-3,
            atol=2e-3,
        )


class TestReconParity:
    def test_enc_dec_recon(self, ref_and_params):
        ref, params, cfg = ref_and_params
        x = rnd_img(b=1, seed=3)
        with torch.no_grad():
            want = ref.forward_enc_dec(torch.tensor(x)).numpy()
        got = np.asarray(mingtok_enc_dec(params, cfg, jnp.asarray(x), compute_dtype=jnp.float32))
        assert got.shape == want.shape == (1, 3, 64, 64)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    def test_pixel_decoder_fp32(self, ref_and_params):
        ref, params, cfg = ref_and_params
        feats = np.random.default_rng(1).standard_normal((1, 16, D)).astype(np.float32)
        with torch.no_grad():
            want = ref.forward_pixel_decoder(torch.tensor(feats)).numpy()
        got = np.asarray(mingtok_pixel_decoder(params, cfg, jnp.asarray(feats)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestFeatureDecoderParity:
    def test_cached_incremental_matches_reference(self, ref_and_params):
        ref, params, cfg = ref_and_params
        T = 5
        lat = np.random.default_rng(2).standard_normal((1, T, 8)).astype(np.float32)

        # reference: token-by-token with DynamicCache (modeling_mingtok.py:165-177)
        ref_out, past = [], None
        with torch.no_grad():
            for t in range(T):
                o = ref.forward_feature_decoder(torch.tensor(lat[:, t : t + 1]), past_key_values=past)
                past = o["past_key_values"]
                ref_out.append(o["x_norm_patchtokens"].numpy())
        want = np.concatenate(ref_out, axis=1)

        cache = make_semdec_cache(cfg.semantic_decoder, 1, 16, dtype=jnp.float32)
        outs = []
        for t in range(T):
            o, cache = mingtok_feature_decoder(
                params, cfg, jnp.asarray(lat[:, t : t + 1]), cache, compute_dtype=jnp.float32
            )
            outs.append(np.asarray(o["x_norm_patchtokens"]))
        got = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_cached_matches_full_sequence(self, ref_and_params):
        _, params, cfg = ref_and_params
        T = 6
        lat = jnp.asarray(np.random.default_rng(4).standard_normal((1, T, 8)).astype(np.float32))
        full = semantic_decoder_apply(
            params["semantic_decoder"], cfg.semantic_decoder, lat, compute_dtype=jnp.float32, split_cls=False
        )["x_norm_patchtokens"]
        cache = make_semdec_cache(cfg.semantic_decoder, 1, 16, dtype=jnp.float32)
        outs = []
        for t in range(T):
            o, cache = mingtok_feature_decoder(
                params, cfg, (lat[:, t : t + 1] - cfg.mean) / cfg.scaling_factor, cache, compute_dtype=jnp.float32
            )
            outs.append(np.asarray(o["x_norm_patchtokens"]))
        got = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(got, np.asarray(full), rtol=1e-4, atol=1e-4)


class TestNonNativeResolution:
    def test_encode_at_2x_grid_matches_reference(self, ref_and_params):
        """The understanding path feeds 1024px into a 512px-trained encoder —
        pos-embed bicubic interpolation (with the DINO offset kludge) must match
        the reference bit-for-bit at fp32 (vision_transformer.py:183-215)."""
        ref, params, cfg = ref_and_params
        x = np.random.default_rng(7).standard_normal((1, 3, 128, 128)).astype(np.float32)
        with torch.no_grad():
            want = ref.forward(torch.tensor(x))
        got = mingtok_encode(params, cfg, jnp.asarray(x), compute_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got["latent"]), want["latent"].numpy(), rtol=2e-3, atol=2e-3
        )
        assert got["latent"].shape == (1, 8 * 8 + 1, 8)  # 2x grid + cls
