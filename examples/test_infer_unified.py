"""Unified demo: the four workloads in sequence — T2I, understanding, 3-round
edit, text chat (the analog of mingunivision/test_infer_unified.py).

Usage:
  python examples/test_infer_unified.py --ckpt DIR            # real checkpoint
  python examples/test_infer_unified.py --tiny                # random tiny model smoke
"""

import argparse
import sys

sys.path.insert(0, ".")


def build_tiny_infer():
    import jax
    import jax.numpy as jnp

    from mingunivision_tpu.api import MingUniVisionInfer
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
    from mingunivision_tpu.processing.processor import BailingMMProcessor
    from mingunivision_tpu.processing.tokenizer import build_test_tokenizer

    tokenizer = build_test_tokenizer()
    img_patch = tokenizer.convert_tokens_to_ids("<imagePatch>")
    img_start = tokenizer.convert_tokens_to_ids("<image>")
    eos = tokenizer.convert_tokens_to_ids("<|endoftext|>")
    vocab = len(tokenizer)

    cfg = MingUniVisionConfig(
        mingtok=MingTokConfig(
            encoder=ViTEncoderConfig(img_size=64, patch_size=16, embed_dim=128, depth=2, num_heads=2, out_dim=8),
            semantic_decoder=SemanticDecoderConfig(in_dim=8, embed_dim=128, depth=2, num_heads=2, patch_size=16),
            pixel_decoder=PixelDecoderConfig(embed_dim=128, depth=2, num_heads=2, patch_size=8, ffn_layer="mlp"),
            scaling_factor=2.0,
            mean=0.5,
        ),
        llm=BailingMoeConfig(
            vocab_size=vocab,
            hidden_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=32,
            moe_intermediate_size=64,
            num_experts=8,
            num_experts_per_tok=2,
            num_shared_experts=2,
            max_position_embeddings=2048,
            mrope_section=(4, 6, 6),
            eos_token_id=eos,
            pad_token_id=eos,
            image_patch_token=img_patch,
            image_start_token=img_start,
            num_image_tokens_for_gen=16,
        ),
        rf_head=RFHeadConfig(target_channels=8, z_channels=64, width=64, depth=2, mlp_mult=4, num_sampling_steps=4),
        image_gen=ImageGenConfig(num_image_tokens=16),
    )
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    params = {
        "llm": init_bailing_moe_params(ks[0], cfg.llm, dtype=jnp.float32),
        "mingtok": init_mingtok_params(ks[1], cfg.mingtok, dtype=jnp.float32),
        "rf_head": init_rf_head_params(ks[2], cfg.rf_head, dtype=jnp.float32),
        "vis_head": init_vis_head_params(ks[3], cfg.llm.hidden_size, cfg.rf_head.z_channels, dtype=jnp.float32),
        "linear_proj": init_linear_proj_params(ks[4], cfg.mingtok.feature_dim, cfg.llm.hidden_size, cfg.mlp_depth, dtype=jnp.float32),
    }
    rt = RuntimeConfig(max_seq_len=1024, compute_dtype="float32")
    proc = BailingMMProcessor(tokenizer, und_image_size=64, gen_image_size=64)
    return MingUniVisionInfer(params=params, config=cfg, runtime=rt, processor=proc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--max-new-tokens", type=int, default=64)
    args = ap.parse_args()

    if args.tiny or not args.ckpt:
        infer = build_tiny_infer()
    else:
        from mingunivision_tpu.api import MingUniVisionInfer

        infer = MingUniVisionInfer(args.ckpt)

    import numpy as np
    from PIL import Image

    demo_img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (96, 96, 3), np.uint8))

    # 1. text-to-image
    msgs = [{"role": "HUMAN", "content": [{"type": "text", "text": "a red panda on a tree"}]}]
    out = infer.generate(msgs, max_new_tokens=args.max_new_tokens, output_image_prefix="t2i_demo")
    print("[T2I]", out[:120])
    infer.reset_inner_state()

    # 2. understanding
    msgs = [
        {"role": "HUMAN", "content": [{"type": "image", "image": demo_img}, {"type": "text", "text": "describe this image"}]}
    ]
    out = infer.generate(msgs, max_new_tokens=args.max_new_tokens)
    print("[UNDERSTAND]", out[:120])
    infer.reset_inner_state()

    # 3. multi-round edit (3 chained for_edit rounds; context stays in latent space)
    msgs = [
        {"role": "HUMAN", "content": [{"type": "image", "image": demo_img}, {"type": "text", "text": "add a hat"}]}
    ]
    out = infer.generate(msgs, max_new_tokens=args.max_new_tokens, for_edit=True, output_image_prefix="edit_r0")
    print("[EDIT r0]", out[:80])
    for r in (1, 2):
        msgs = [{"role": "HUMAN", "content": [{"type": "text", "text": "make it blue"}]}]
        out = infer.generate(msgs, max_new_tokens=args.max_new_tokens, for_edit=True, output_image_prefix=f"edit_r{r}")
        print(f"[EDIT r{r}]", out[:80])
    infer.reset_inner_state()

    # 4. text chat
    msgs = [{"role": "HUMAN", "content": [{"type": "text", "text": "hello, who are you?"}]}]
    out = infer.generate(msgs, max_new_tokens=args.max_new_tokens)
    print("[CHAT]", out[:120])
    infer.reset_inner_state()
    print("unified demo complete")


if __name__ == "__main__":
    main()
