"""Text-to-image generation benchmark: per-token cost of the full AR image loop
(LLM CFG step + 16-step RF sample + semantic-decoder step + proj).

One v5e chip (16 GB) cannot hold the 16B bf16 LLM, so the LLM depth is reduced
(--layers, default 8) and the 28-layer per-image time is extrapolated from the
LLM share; MingTok, the RF head (1.3B params — the single largest per-token
cost) and the projection run at FULL size. On a v5e-8 pod the full model runs
sharded and this proxy disappears.

Usage: python benchmarks/bench_t2i.py [--layers 8] [--tokens 16] [--int8]
Prints JSON lines.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=16, help="loop length to time (full image = 256)")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--int4", action="store_true", help="int4 LLM: the FULL 28-layer model fits one v5e chip")
    ap.add_argument("--rf-bits", type=int, default=8, choices=[4, 8], help="RF head tier (4 = fused int4 kernel, fastest)")
    ap.add_argument("--seq", type=int, default=1024)
    args = ap.parse_args()

    from mingunivision_tpu.config import (
        BailingMoeConfig,
        ImageGenConfig,
        MingUniVisionConfig,
        RFHeadConfig,
    )
    from mingunivision_tpu.engine.generate import generate_image_tokens, init_linear_proj_params
    from mingunivision_tpu.models.bailing_moe import LLMCache, embed_tokens, init_bailing_moe_params
    from mingunivision_tpu.models.mingtok import init_mingtok_params
    from mingunivision_tpu.models.rf_head import init_rf_head_params, init_vis_head_params
    from mingunivision_tpu.utils.profiling import force_sync

    llm_cfg = BailingMoeConfig(num_hidden_layers=args.layers)
    mm = MingUniVisionConfig(llm=llm_cfg)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    dtype = jnp.bfloat16

    params = {
        "mingtok": init_mingtok_params(ks[1], mm.mingtok, dtype=dtype),
        "vis_head": init_vis_head_params(ks[3], llm_cfg.hidden_size, mm.rf_head.z_channels, dtype=dtype),
        "linear_proj": init_linear_proj_params(ks[4], mm.mingtok.feature_dim, llm_cfg.hidden_size, mm.mlp_depth, dtype=dtype),
    }
    if args.int8 or args.int4:
        # random quantized weights created DIRECTLY on device (a 28-layer bf16
        # intermediate would not fit single-chip HBM, and host init would push
        # gigabytes through the tunnel)
        from mingunivision_tpu.utils.quantize import random_quantized_like

        bits = 4 if args.int4 else 8
        llm_shapes = jax.eval_shape(lambda k: init_bailing_moe_params(k, llm_cfg, dtype=dtype), ks[0])
        params["llm"] = random_quantized_like(ks[0], llm_shapes, bits=bits)
        rf_shapes = jax.eval_shape(lambda k: init_rf_head_params(k, mm.rf_head, dtype=dtype), ks[2])
        params["rf_head"] = random_quantized_like(ks[2], rf_shapes, bits=args.rf_bits)
    else:
        params["llm"] = init_bailing_moe_params(ks[0], llm_cfg, dtype=dtype)
        params["rf_head"] = init_rf_head_params(ks[2], mm.rf_head, dtype=dtype)

    Smax = args.seq
    cache = LLMCache.create(llm_cfg, 3, Smax, dtype)
    cache = LLMCache(cache.k, cache.v, jnp.int32(64))
    masks = jnp.zeros((3, Smax), bool).at[:, :64].set(True)
    start_embed = embed_tokens(params["llm"], jnp.asarray([[1]])).astype(dtype)
    igen = ImageGenConfig(num_image_tokens=args.tokens)

    def run(cache_in, k):
        return generate_image_tokens(
            params, llm_cfg, mm.mingtok, mm.rf_head, igen, start_embed, cache_in, masks, k, cfg_rows=3
        ).sem_tokens

    def fresh():
        # generate_image_tokens donates its cache: always hand it a copy
        return LLMCache(cache.k + 0, cache.v + 0, cache.length + 0)

    out = run(fresh(), jax.random.PRNGKey(1))
    force_sync(out)
    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        out = run(fresh(), jax.random.PRNGKey(i))
    force_sync(out)
    dt = (time.perf_counter() - t0) / iters
    per_token_ms = dt / args.tokens * 1e3
    print(
        json.dumps(
            {
                "bench": "t2i_ar_loop",
                "layers": args.layers,
                "int8": args.int8,
                "per_token_ms": round(per_token_ms, 2),
                "tokens_per_s": round(1e3 / per_token_ms, 2),
                "est_seconds_per_image_256tok": round(per_token_ms * 256 / 1e3, 2),
                "note": f"LLM at {args.layers}/28 layers; RF head + MingTok full size",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
