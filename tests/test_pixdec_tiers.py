"""Pixel-decoder precision tiers (BENCHMARKS "Pixel-decoder precision tiers").

The serving tiers ("default" = 1-pass bf16 MXU with fp32 activations, "bf16" =
whole stack in bf16 activations) must track the quality tier closely; the
reference pins the pixel decoder to fp32 (mingtok/modeling_mingtok.py:157,180),
which our "high"/"highest" tiers preserve for golden parity.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mingunivision_tpu.config import (
    MingTokConfig,
    MingUniVisionConfig,
    PixelDecoderConfig,
    RuntimeConfig,
    SemanticDecoderConfig,
    ViTEncoderConfig,
    with_pixdec_precision,
)
from mingunivision_tpu.models.mingtok import init_mingtok_params, mingtok_enc_dec


def tiny_cfg(prec: str) -> MingTokConfig:
    return MingTokConfig(
        encoder=ViTEncoderConfig(img_size=64, patch_size=16, embed_dim=128, depth=2, num_heads=2, out_dim=8),
        semantic_decoder=SemanticDecoderConfig(in_dim=8, embed_dim=128, depth=2, num_heads=2, patch_size=16),
        pixel_decoder=PixelDecoderConfig(
            embed_dim=128, depth=2, num_heads=2, patch_size=8, ffn_layer="mlp", matmul_precision=prec
        ),
        scaling_factor=2.0,
        mean=0.5,
    )


class TestPixdecTiers:
    def test_tiers_track_fp32(self):
        """Every tier reconstructs within a tier-appropriate bound of the
        true-fp32 oracle and returns fp32 output."""
        params = init_mingtok_params(jax.random.PRNGKey(0), tiny_cfg("highest"), dtype=jnp.float32)
        x = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(np.float32)
        ref = np.asarray(mingtok_enc_dec(params, tiny_cfg("highest"), x))
        assert np.isfinite(ref).all()
        # CPU matmuls are fp32 regardless of Precision, so "high"/"default"
        # are near-exact here; "bf16" actually casts activations and exercises
        # the real reduced-precision path.
        for prec, bound in (("high", 1e-5), ("default", 1e-5), ("bf16", 6e-2)):
            got = np.asarray(mingtok_enc_dec(params, tiny_cfg(prec), x))
            assert got.dtype == np.float32, prec
            rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
            assert rel < bound, (prec, rel)

    def test_runtime_knob_replaces_tier(self):
        cfg = MingUniVisionConfig(mingtok=tiny_cfg("high"))
        rt = RuntimeConfig(pixdec_matmul_precision="default")
        out = with_pixdec_precision(cfg, rt.pixdec_matmul_precision)
        assert out.mingtok.pixel_decoder.matmul_precision == "default"
        # everything else untouched
        assert out.mingtok.encoder == cfg.mingtok.encoder
        assert dataclasses.replace(out, mingtok=cfg.mingtok) == cfg
