"""End-to-end checkpoint conversion test: build a tiny composed checkpoint with
REFERENCE torch modules (real names/layouts), save as safetensors, convert with
tools/convert_checkpoint.py, and verify the restored pytree drives our engine to
the same logits as the torch model."""

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


@pytest.fixture(scope="module")
def synthetic_ckpt(tmp_path_factory):
    """Compose reference-module weights under the real checkpoint prefixes."""
    import refutil

    mbm = refutil.import_reference_llm()
    rf = refutil.import_reference_rf()
    mm = refutil.import_reference_mingtok()
    from tests.test_llm_golden import tiny_cfg as llm_tiny

    torch.manual_seed(0)
    cfg = llm_tiny()
    ref_cfg = mbm.BailingMoeConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        intermediate_size=cfg.intermediate_size,
        moe_intermediate_size=cfg.moe_intermediate_size,
        num_experts=cfg.num_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        num_shared_experts=cfg.num_shared_experts,
        first_k_dense_replace=0,
        norm_topk_prob=True,
        multi_gate=True,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta,
        rope_scaling={"type": "3D", "factor": None},
        use_qkv_bias=False,
        use_bias=False,
        embedding_dropout=0.0,
        attention_dropout=0.0,
        output_dropout=0.0,
        _attn_implementation="eager",
        pad_token_id=0,
        eos_token_id=0,
        image_patch_token=499,
        image_start_token=510,
        num_image_tokens_for_gen=4,
    )
    llm = mbm.BailingMoeForCausalLM(ref_cfg).eval()
    llm.setup_vishead_diffloss(
        diffloss_w=48, diffloss_d=2, num_sampling_steps="4", hidden_size=cfg.hidden_size, image_emb_dim_for_gen=8
    )

    mingtok_cfg = mm.MingTokConfig(
        low_level_encoder={"img_size": 64, "patch_size": 16, "depth": 2, "embed_dim": 128, "ffn_layer": "swiglufused", "out_dim": 8},
        semantic_decoder={"in_dim": 8, "patch_size": 16, "embed_dim": 128, "decoder_depth": 2, "ffn_layer": "swiglufused", "fa_enable": False},
        pixel_decoder={"patch_size": 8, "decoder_depth": 2, "embed_dim": 128, "norm_pix_loss": True, "loss_type": "L1-plain"},
        scaling_factor=2.0,
        mean=0.5,
        model_dtype="fp32",
    )
    vision = mm.MingTok(mingtok_cfg).eval()

    import torch.nn as nn

    linear_proj = nn.Sequential(nn.Linear(128, cfg.hidden_size), nn.GELU(), nn.Linear(cfg.hidden_size, cfg.hidden_size))

    sd = {}
    sd.update({f"model.{k}": v for k, v in llm.state_dict().items()})
    sd.update({f"vision.{k}": v for k, v in vision.state_dict().items()})
    sd.update({f"linear_proj.{k}": v for k, v in linear_proj.state_dict().items()})

    from safetensors.torch import save_file

    d = tmp_path_factory.mktemp("ckpt")
    save_file({k: v.contiguous() for k, v in sd.items()}, str(d / "model.safetensors"))
    return str(d), llm, cfg


class TestConvertE2E:
    def test_convert_and_logit_parity(self, synthetic_ckpt, tmp_path):
        src, ref_llm, llm_cfg = synthetic_ckpt
        import convert_checkpoint

        from mingunivision_tpu.config import (
            BailingMoeConfig,
            MingTokConfig,
            MingUniVisionConfig,
            PixelDecoderConfig,
            RFHeadConfig,
            SemanticDecoderConfig,
            ViTEncoderConfig,
        )

        # monkeypatch the default config used by the converter to the tiny shapes
        tiny_mm = MingUniVisionConfig(
            mingtok=MingTokConfig(
                encoder=ViTEncoderConfig(img_size=64, patch_size=16, embed_dim=128, depth=2, num_heads=2, out_dim=8),
                semantic_decoder=SemanticDecoderConfig(in_dim=8, embed_dim=128, depth=2, num_heads=2, patch_size=16),
                pixel_decoder=PixelDecoderConfig(embed_dim=128, depth=2, num_heads=2, patch_size=8, ffn_layer="mlp"),
                scaling_factor=2.0,
                mean=0.5,
            ),
            llm=llm_cfg,
            rf_head=RFHeadConfig(target_channels=8, z_channels=48, width=48, depth=2, mlp_mult=4, num_sampling_steps=4),
        )
        import mingunivision_tpu.config as cfgmod

        orig = cfgmod.MingUniVisionConfig
        try:
            cfgmod.MingUniVisionConfig = lambda: tiny_mm  # type: ignore
            out = str(tmp_path / "native")
            params = convert_checkpoint.convert(src, out, dtype="fp32")
        finally:
            cfgmod.MingUniVisionConfig = orig

        # logit parity through the converted weights
        from mingunivision_tpu.models.bailing_moe import LLMCache, bailing_forward, compute_logits, embed_tokens

        ids = np.random.default_rng(0).integers(0, llm_cfg.vocab_size, (1, 7))
        with torch.no_grad():
            want = ref_llm(
                input_ids=torch.tensor(ids),
                attention_mask=torch.ones(1, 7, dtype=torch.long),
                position_ids=torch.arange(7).view(1, 1, 7).expand(3, 1, 7),
                use_cache=False,
                return_dict=True,
            ).logits.numpy()
        cache = LLMCache.create(llm_cfg, 1, 16, jnp.float32)
        mask = jnp.zeros((1, 16), bool).at[:, :7].set(True)
        hidden, _ = bailing_forward(params["llm"], llm_cfg, embed_tokens(params["llm"], jnp.asarray(ids)), cache, mask)
        got = np.asarray(compute_logits(params["llm"], llm_cfg, hidden))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

        # restored orbax checkpoint round-trips
        from mingunivision_tpu.utils.checkpoint import restore_pytree

        restored = restore_pytree(out, template=jax.tree_util.tree_map(np.asarray, params))
        a = jax.tree_util.tree_leaves(params)
        b = jax.tree_util.tree_leaves(restored)
        assert len(a) == len(b)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    def test_sharded_checkpoint_load(self, synthetic_ckpt):
        """MingUniVisionInfer(model_path, mesh=...): the host-side loader places
        every leaf shard-wise (the 16B path); logits match the unsharded load."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        src, ref_llm, llm_cfg = synthetic_ckpt
        from mingunivision_tpu.api import MingUniVisionInfer
        from mingunivision_tpu.config import (
            MeshConfig,
            MingTokConfig,
            MingUniVisionConfig,
            PixelDecoderConfig,
            RFHeadConfig,
            RuntimeConfig,
            SemanticDecoderConfig,
            ViTEncoderConfig,
        )
        from mingunivision_tpu.models.bailing_moe import LLMCache, bailing_forward, compute_logits, embed_tokens
        from mingunivision_tpu.parallel.mesh import make_mesh

        tiny_mm = MingUniVisionConfig(
            mingtok=MingTokConfig(
                encoder=ViTEncoderConfig(img_size=64, patch_size=16, embed_dim=128, depth=2, num_heads=2, out_dim=8),
                semantic_decoder=SemanticDecoderConfig(in_dim=8, embed_dim=128, depth=2, num_heads=2, patch_size=16),
                pixel_decoder=PixelDecoderConfig(embed_dim=128, depth=2, num_heads=2, patch_size=8, ffn_layer="mlp"),
                scaling_factor=2.0,
                mean=0.5,
            ),
            llm=llm_cfg,
            rf_head=RFHeadConfig(target_channels=8, z_channels=48, width=48, depth=2, mlp_mult=4, num_sampling_steps=4),
        )
        runtime = RuntimeConfig(max_seq_len=64, compute_dtype="float32", param_dtype="float32")
        from mingunivision_tpu.processing.tokenizer import build_test_tokenizer

        tok = build_test_tokenizer()
        plain = MingUniVisionInfer(src, config=tiny_mm, runtime=runtime, tokenizer=tok)
        mesh = make_mesh(MeshConfig(data=1, expert=2, model=4))
        sharded = MingUniVisionInfer(src, config=tiny_mm, runtime=runtime, tokenizer=tok, mesh=mesh)
        # sharded loader actually placed leaves on the mesh
        qkv = sharded.params["llm"]["layers"]["attention"]["query_key_value"]["w"]
        assert len(qkv.sharding.device_set) == 8

        ids = np.random.default_rng(1).integers(0, llm_cfg.vocab_size, (1, 6))

        def logits_of(p):
            cache = LLMCache.create(llm_cfg, 1, 16, jnp.float32)
            mask = jnp.zeros((1, 16), bool).at[:, :6].set(True)
            h, _ = bailing_forward(p["llm"], llm_cfg, embed_tokens(p["llm"], jnp.asarray(ids)), cache, mask)
            return np.asarray(compute_logits(p["llm"], llm_cfg, h))

        np.testing.assert_allclose(logits_of(sharded.params), logits_of(plain.params), rtol=2e-3, atol=2e-3)

    def test_quantized_tier_load(self, synthetic_ckpt):
        """int4 tier with the int8 RF override loads through _load_checkpoint
        and still produces logits (tiny weights mostly stay fp under the
        min-size guard — this exercises the tier plumbing end-to-end)."""
        src, ref_llm, llm_cfg = synthetic_ckpt
        from mingunivision_tpu.api import MingUniVisionInfer
        from mingunivision_tpu.config import (
            MingTokConfig,
            MingUniVisionConfig,
            PixelDecoderConfig,
            RFHeadConfig,
            RuntimeConfig,
            SemanticDecoderConfig,
            ViTEncoderConfig,
        )
        from mingunivision_tpu.processing.tokenizer import build_test_tokenizer

        tiny_mm = MingUniVisionConfig(
            mingtok=MingTokConfig(
                encoder=ViTEncoderConfig(img_size=64, patch_size=16, embed_dim=128, depth=2, num_heads=2, out_dim=8),
                semantic_decoder=SemanticDecoderConfig(in_dim=8, embed_dim=128, depth=2, num_heads=2, patch_size=16),
                pixel_decoder=PixelDecoderConfig(embed_dim=128, depth=2, num_heads=2, patch_size=8, ffn_layer="mlp"),
                scaling_factor=2.0,
                mean=0.5,
            ),
            llm=llm_cfg,
            rf_head=RFHeadConfig(target_channels=8, z_channels=48, width=48, depth=2, mlp_mult=4, num_sampling_steps=4),
        )
        from mingunivision_tpu.config import ImageGenConfig

        tiny_mm = __import__("dataclasses").replace(tiny_mm, image_gen=ImageGenConfig(num_image_tokens=4))
        runtime = RuntimeConfig(max_seq_len=256, compute_dtype="float32", param_dtype="int4", rf_param_dtype="int8")
        infer = MingUniVisionInfer(src, config=tiny_mm, runtime=runtime, tokenizer=build_test_tokenizer())
        # tiny leaves stay fp under the min-size guard; generation still works
        # through whatever mixture quantize_tree produced
        from mingunivision_tpu.config import GenerationConfig

        out = infer.session.generate(
            np.asarray([[3, 4, 5]]), np.ones((1, 3), np.int64), generation=GenerationConfig(max_new_tokens=4)
        )
        assert isinstance(out.token_ids, list)
