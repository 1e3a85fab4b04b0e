"""Same-process A/B for the round-4 batched-T2I regression (VERDICT r5 task 1).

BENCH_r03 t2i_batched_n8_images_per_min = 27.68; BENCH_r04 = 20.12. Suspect:
the capacity-dense MoE dispatch became the default prefill-branch path in
round 4 (cfg.moe_prefill_capacity_factor=1.33, commit 47cd91d) and batched-8
T2I decode steps (24 CFG rows > MOE_GATHER_MAX_TOKENS=16) fall into that
branch — default_capacity(24,6,64) floors at 128, so every MoE layer runs 64
experts x 128-row tiles for 144 assignments (~2 megablox tiles of real work).

Modes (ONE process, same params, jax.clear_caches() between modes so the
trace-time dispatch flags re-evaluate):
  gmm      — round-5 default: capacity gated to >= MOE_CAPACITY_MIN_TOKENS
             (512), so 24 rows take moe_experts_swiglu_gmm (the r3 path)
  capacity — round-4 behavior forced (MOE_CAPACITY_MIN_TOKENS=0)
  stream   — decode-style dedup stream kernel forced (MOE_GATHER_MAX_TOKENS=24)
Plus a single-image control (n=1, 3 rows -> stream path, unchanged by all
three flags).

Usage: timeout 2400 python benchmarks/bench_t2i_regression.py --mode gmm
(one mode per process: the full int4 tree + 24-row caches run close to the
16 GB HBM ceiling; Smax=512 and per-mode process isolation keep it safe)
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


def build(layers=28, bits=4, rf_bits=4):
    from mingunivision_tpu.config import BailingMoeConfig, MingUniVisionConfig
    from mingunivision_tpu.engine.generate import init_linear_proj_params
    from mingunivision_tpu.models.bailing_moe import init_bailing_moe_params
    from mingunivision_tpu.models.mingtok import init_mingtok_params
    from mingunivision_tpu.models.rf_head import init_rf_head_params, init_vis_head_params
    from mingunivision_tpu.utils.quantize import random_quantized_like

    llm_cfg = BailingMoeConfig(num_hidden_layers=layers)
    mm = MingUniVisionConfig(llm=llm_cfg)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    dtype = jnp.bfloat16
    llm_shapes = jax.eval_shape(lambda k: init_bailing_moe_params(k, llm_cfg, dtype=dtype), ks[0])
    rf_shapes = jax.eval_shape(lambda k: init_rf_head_params(k, mm.rf_head, dtype=dtype), ks[2])
    params = {
        "llm": random_quantized_like(ks[0], llm_shapes, bits=bits),
        "rf_head": random_quantized_like(ks[2], rf_shapes, bits=rf_bits),
        "mingtok": init_mingtok_params(ks[1], mm.mingtok, dtype=dtype),
        "vis_head": init_vis_head_params(ks[3], llm_cfg.hidden_size, mm.rf_head.z_channels, dtype=dtype),
        "linear_proj": init_linear_proj_params(ks[4], mm.mingtok.feature_dim, llm_cfg.hidden_size, mm.mlp_depth, dtype=dtype),
    }
    return params, llm_cfg, mm


def run_t2i(params, llm_cfg, mm, n_images, tokens=256, iters=1, rf_steps=None):
    import dataclasses

    from mingunivision_tpu.config import ImageGenConfig
    from mingunivision_tpu.engine.generate import generate_image_tokens
    from mingunivision_tpu.models.bailing_moe import LLMCache, embed_tokens
    from mingunivision_tpu.utils.profiling import force_sync

    if rf_steps is not None:
        mm = dataclasses.replace(mm, rf_head=dataclasses.replace(mm.rf_head, num_sampling_steps=rf_steps))
    dtype = jnp.bfloat16
    Smax = 512  # 64 ctx + 256 AR tokens; 1024 put the n8 config over the HBM line
    R = 3 * n_images
    cache = LLMCache.create(llm_cfg, R, Smax, dtype)
    cache = LLMCache(cache.k, cache.v, jnp.int32(64))
    masks = jnp.zeros((R, Smax), bool).at[:, :64].set(True)
    start_embed = embed_tokens(params["llm"], jnp.asarray([[1]])).astype(dtype)
    igen = ImageGenConfig(num_image_tokens=tokens)

    def run(cache_in, k):
        return generate_image_tokens(
            params, llm_cfg, mm.mingtok, mm.rf_head, igen, start_embed, cache_in, masks, k,
            cfg_rows=3, n_images=n_images,
        ).sem_tokens

    def fresh():
        return LLMCache(cache.k + 0, cache.v + 0, cache.length + 0)

    t0 = time.perf_counter()
    out = run(fresh(), jax.random.PRNGKey(1))
    force_sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(fresh(), jax.random.PRNGKey(i))
    force_sync(out)
    dt = (time.perf_counter() - t0) / iters
    ms_tok = dt / tokens * 1e3
    return ms_tok, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["gmm", "capacity", "stream", "control"], required=True)
    ap.add_argument("--rf-steps", type=int, default=None, help="override Euler steps (in-loop RF cost slope probe)")
    ap.add_argument("--fused-rf", choices=["on", "off"], default=None, help="override FUSED_SAMPLER")
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", jax.default_backend()
    import mingunivision_tpu.models.bailing_moe as bm

    if args.mode == "capacity":
        bm.MOE_GATHER_MAX_TOKENS = 16  # keep 24 rows in the prefill branch
        bm.MOE_CAPACITY_MIN_TOKENS = 0  # round-4 behavior: 24 rows take capacity
    elif args.mode == "stream":
        bm.MOE_GATHER_MAX_TOKENS = 24  # 24 rows take the dedup stream kernel
    elif args.mode == "gmm":
        bm.MOE_GATHER_MAX_TOKENS = 16  # round-3 behavior (now-default stream gated out)

    if args.fused_rf is not None:
        from mingunivision_tpu.models import rf_head as _rf

        _rf.FUSED_SAMPLER = args.fused_rf == "on"

    params, llm_cfg, mm = build()
    n = 1 if args.mode == "control" else 8
    ms, compile_s = run_t2i(params, llm_cfg, mm, n_images=n, rf_steps=args.rf_steps)
    print(json.dumps({
        "mode": args.mode, "n_images": n, "rf_steps": args.rf_steps, "fused_rf": args.fused_rf,
        "ms_per_batch_step": round(ms, 2),
        "images_per_min": round(n * 60.0 / (ms * 256 / 1e3), 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
