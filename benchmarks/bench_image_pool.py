"""Continuous-batching T2I pool benchmark (one v5e chip, full-size model).

Measures what the barrier batcher cannot: steady-state throughput with
STAGGERED completions (slots at different iterations) and admission latency
(chunk-bounded). The per-token compute equals the block-major batched loop
(bench.py t2i_batched), so throughput should match it; the pool's win is that
finished slots free immediately instead of waiting for the whole batch.

Usage:  python benchmarks/bench_image_pool.py [--slots 8] [--chunk 32]
        [--layers 28] [--bits 4] [--tokens 64] [--requests 12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--rf-bits", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=64, help="AR tokens per image (256 = full)")
    ap.add_argument("--requests", type=int, default=12)
    ap.add_argument("--allow-cpu", action="store_true")
    args = ap.parse_args()

    if not args.allow_cpu:
        assert jax.default_backend() == "tpu", f"backend={jax.default_backend()} (JAX_PLATFORMS='' can fall back to CPU silently)"

    import dataclasses

    from mingunivision_tpu.config import BailingMoeConfig, ImageGenConfig, MingUniVisionConfig, RuntimeConfig
    from mingunivision_tpu.engine.generate import init_linear_proj_params
    from mingunivision_tpu.engine.image_pool import ImagePoolEngine
    from mingunivision_tpu.models.bailing_moe import init_bailing_moe_params
    from mingunivision_tpu.models.mingtok import init_mingtok_params
    from mingunivision_tpu.models.rf_head import init_rf_head_params, init_vis_head_params
    from mingunivision_tpu.utils.quantize import random_quantized_like

    llm_cfg = BailingMoeConfig(num_hidden_layers=args.layers)
    cfg = MingUniVisionConfig(llm=llm_cfg, image_gen=ImageGenConfig(num_image_tokens=args.tokens))
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    dtype = jnp.bfloat16
    llm_shapes = jax.eval_shape(lambda k: init_bailing_moe_params(k, llm_cfg, dtype=dtype), ks[0])
    rf_shapes = jax.eval_shape(lambda k: init_rf_head_params(k, cfg.rf_head, dtype=dtype), ks[2])
    params = {
        "llm": random_quantized_like(ks[0], llm_shapes, bits=args.bits) if args.bits < 16 else init_bailing_moe_params(ks[0], llm_cfg, dtype=dtype),
        "rf_head": random_quantized_like(ks[2], rf_shapes, bits=args.rf_bits) if args.rf_bits < 16 else init_rf_head_params(ks[2], cfg.rf_head, dtype=dtype),
        "mingtok": init_mingtok_params(ks[1], cfg.mingtok, dtype=dtype),
        "vis_head": init_vis_head_params(ks[3], llm_cfg.hidden_size, cfg.rf_head.z_channels, dtype=dtype),
        "linear_proj": init_linear_proj_params(ks[4], cfg.mingtok.feature_dim, llm_cfg.hidden_size, cfg.mlp_depth, dtype=dtype),
    }
    rt = RuntimeConfig(max_seq_len=1024, compute_dtype="bfloat16")
    eng = ImagePoolEngine(params, cfg, rt, slots=args.slots, chunk=args.chunk, decode_pixels=False)

    rng = np.random.default_rng(0)

    def req(T):
        ids = rng.integers(0, 1000, (1, T))
        am = np.ones((1, T), np.int64)
        return {"input_ids": ids, "attention_mask": am}

    # warm compile: BOTH prefill buckets the measured prompts (16..120) hit,
    # plus a full chunk cycle — otherwise bucket-128 prefill compiles through
    # the slow axon tunnel INSIDE the timed loop and dominates wall_s
    eng.add_request(req(37), jax.random.PRNGKey(0))
    eng.add_request(req(100), jax.random.PRNGKey(0))
    eng.step()
    eng.run_until_idle()

    # staggered load: keep the pool saturated, admit as slots free
    pending = [req(int(rng.integers(16, 120))) for _ in range(args.requests)]
    t0 = time.perf_counter()
    admitted = 0
    done = 0
    lat = []
    start = {}
    while done < args.requests:
        while pending and eng.has_free_slot():
            r = eng.add_request(pending.pop(), jax.random.PRNGKey(admitted + 1))
            start[r.request_id] = time.perf_counter()
            admitted += 1
        for fin in eng.step():
            lat.append(time.perf_counter() - start[fin.request_id])
            done += 1
    dt = time.perf_counter() - t0
    per_image_s = dt / args.requests
    scale = 256 / args.tokens  # extrapolate to full 256-token images
    print(
        {
            "slots": args.slots,
            "chunk": args.chunk,
            "layers": args.layers,
            "bits": args.bits,
            "tokens": args.tokens,
            "requests": args.requests,
            "wall_s": round(dt, 2),
            "images_per_min_at_tokens": round(60.0 / per_image_s, 2),
            "images_per_min_256tok_extrap": round(60.0 / (per_image_s * scale), 2),
            "latency_s_mean": round(float(np.mean(lat)), 2),
            "latency_s_p90": round(float(np.quantile(lat, 0.9)), 2),
        }
    )


if __name__ == "__main__":
    main()
