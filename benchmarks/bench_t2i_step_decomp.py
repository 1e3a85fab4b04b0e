"""T2I per-token step decomposition with differenced chained timing (round 5b).

The single-image T2I loop prices at 17.48 ms/token: ~9.9 ms RF (16 x 0.616,
by the rf-steps slope) + ~7.6 ms rest. Every earlier component attribution
(semdec "0.8 ms in-loop", LLM step estimates) used RTT-floored timings.
This measures, all differenced ((t(2R)-t(R))/R):

  - LLM decode step: 3 CFG rows, 28L int4, Smax=512 cache append
  - ... at Smax=384 (the tightest bucket for 64 ctx + 256 AR tokens)
  - semantic-decoder cached 1-token step
  - vis_head + linear_proj glue

Usage: timeout 3000 python benchmarks/bench_t2i_step_decomp.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def say(*a):
    print(*a, flush=True)


def diff_chain(build, args, reps=8, iters=3):
    from mingunivision_tpu.utils.profiling import force_sync

    r1, r2 = build(reps), build(2 * reps)
    force_sync(r1(*args))
    force_sync(r2(*args))
    b1 = b2 = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        force_sync(r1(*args))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        force_sync(r2(*args))
        b2 = min(b2, time.perf_counter() - t0)
    return max(b2 - b1, 1e-9) / reps


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    say("tpu up")
    from mingunivision_tpu.config import BailingMoeConfig, MingUniVisionConfig
    from mingunivision_tpu.models.bailing_moe import (
        LLMCache,
        bailing_forward,
        init_bailing_moe_params,
    )
    from mingunivision_tpu.models.mingtok import (
        init_mingtok_params,
        make_semdec_cache,
        mingtok_feature_decoder,
    )
    from mingunivision_tpu.utils.quantize import random_quantized_like

    key = jax.random.PRNGKey(0)
    llm_cfg = BailingMoeConfig(num_hidden_layers=28)
    mm = MingUniVisionConfig(llm=llm_cfg)
    dtype = jnp.bfloat16
    shapes = jax.eval_shape(lambda k: init_bailing_moe_params(k, llm_cfg, dtype=dtype), key)
    params = random_quantized_like(key, shapes, bits=4)
    results = {}

    for Smax in (512, 384):
        cache0 = LLMCache.create(llm_cfg, 3, Smax, dtype)
        cache0 = LLMCache(cache0.k, cache0.v, jnp.int32(64))
        mask = jnp.zeros((3, Smax), bool).at[:, :65].set(True)
        x0 = jax.random.normal(key, (3, 1, llm_cfg.hidden_size), dtype)

        def build(n, Smax=Smax, cache0=cache0, mask=mask):
            @jax.jit
            def run(p, x):
                acc = jnp.float32(0)
                cache = LLMCache(cache0.k + 0, cache0.v + 0, cache0.length)
                for _ in range(n):
                    h, cache = bailing_forward(p, llm_cfg, x, cache, mask)
                    # keep cache length fixed (steady-state step cost)
                    cache = LLMCache(cache.k, cache.v, cache0.length)
                    acc = acc + jnp.sum(h[:, -1]).astype(jnp.float32)
                    x = x + (acc * 1e-20).astype(x.dtype)
                return acc

            return run

        t = diff_chain(build, (params, x0))
        results[f"llm_step3row_S{Smax}_ms"] = round(t * 1e3, 3)
        say(f"LLM decode step (3 rows, 28L int4, Smax={Smax}): {t*1e3:.3f} ms")
        del cache0

    # semantic decoder cached step (the generate-loop call: latents -> features)
    mt_params = init_mingtok_params(jax.random.fold_in(key, 1), mm.mingtok, dtype=dtype)
    z = jax.random.normal(key, (1, 1, mm.mingtok.semantic_decoder.in_dim), jnp.float32)
    cache_sd = make_semdec_cache(mm.mingtok.semantic_decoder, 1, 257, dtype=dtype)
    cache_sd = cache_sd._replace(length=jnp.int32(64))

    def build_sd(n):
        @jax.jit
        def run(p, f, st):
            acc = jnp.float32(0)
            state = st
            for i in range(n):
                out, state = mingtok_feature_decoder(p, mm.mingtok, f, state)
                state = state._replace(length=st.length)  # steady-state
                acc = acc + jnp.sum(out["x_norm_patchtokens"]).astype(jnp.float32)
                f = f + (acc * 1e-20).astype(f.dtype)
            return acc

        return run

    try:
        t = diff_chain(build_sd, (mt_params, z, cache_sd))
        results["semdec_step_ms"] = round(t * 1e3, 3)
        say(f"semantic-decoder cached step: {t*1e3:.3f} ms")
    except Exception as e:  # noqa: BLE001
        say(f"semdec probe failed: {str(e)[:200]}")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
