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

    def test_headmajor_flash_algebra_matches_block(self, monkeypatch):
        """The head-major qkv/out-proj einsums around the flash kernel
        (models/vit.py:_attn_flash_headmajor) must reproduce the token-major
        _qkv+mha+proj path exactly. The TPU kernel is replaced by a head-major
        XLA oracle so the surrounding algebra (weight reshape order, biases)
        is pinned on CPU; on-device kernel numerics live in BENCHMARKS."""
        import mingunivision_tpu.ops.kernels.flash as fl
        from mingunivision_tpu.models.vit import _attn_flash_headmajor, _qkv, block_init
        from mingunivision_tpu.ops.attention import mha
        from mingunivision_tpu.ops.linear import dense

        def fake_flash(q, k, v, *, scale, block=512):
            return mha(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), scale=scale
            ).transpose(0, 2, 1, 3)

        monkeypatch.setattr(fl, "flash_vit_attention", fake_flash)
        H, C = 4, 64
        params = block_init(jax.random.PRNGKey(3), C, H, 4.0, "mlp", dtype=jnp.float32)
        h = jnp.asarray(np.random.default_rng(4).standard_normal((2, 24, C)), jnp.float32)
        got = np.asarray(_attn_flash_headmajor(params, h, H))
        q, k, v = _qkv(params, h, H)
        want = np.asarray(dense(mha(q, k, v).reshape(h.shape), params["attn"]["proj"]))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_flash_gate_off_on_cpu(self):
        from mingunivision_tpu.ops.kernels.flash import flash_vit_usable

        assert not flash_vit_usable(1024, jnp.bfloat16)  # CPU backend in tests

    def test_runtime_knob_replaces_tier(self):
        cfg = MingUniVisionConfig(mingtok=tiny_cfg("high"))
        rt = RuntimeConfig(pixdec_matmul_precision="default")
        out = with_pixdec_precision(cfg, rt.pixdec_matmul_precision)
        assert out.mingtok.pixel_decoder.matmul_precision == "default"
        # everything else untouched
        assert out.mingtok.encoder == cfg.mingtok.encoder
        assert dataclasses.replace(out, mingtok=cfg.mingtok) == cfg
