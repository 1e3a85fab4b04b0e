"""e2e bf16 prefill decomposition with overhead-cancelling differenced timing.

Round-5 discovery: the axon per-call overhead on the current host is ~26 ms
and PIPELINES with device work, so every chained timing with small reps was
floor-limited — the fused swiglu_gmm at uniform C=192 is really ~1.8 ms/layer
(≈600 GB/s weight streaming), not the 7.5-10 ms previously recorded, and the
4096^3 matmul rate is 152 TF/s, not 91. This bench re-measures the e2e 8L
bf16 prefill and decomposes one layer:

  - e2e 8L bailing_forward @1024 tok (argsort dispatch default)
  - moe_experts_swiglu_gmm (kernel + sort glue) at real routing
  - swiglu_gmm kernel alone (presorted uniform groups)
  - attention_apply prefill @1024
  - shared-expert MLP + router alone

Usage: timeout 3000 python benchmarks/bench_prefill_e2e_decomp.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

E, H, M, TOP_K = 64, 2048, 1408, 6
T = 1024


def say(*a):
    print(*a, flush=True)


def chained(f, args, reps=8, iters=3):
    """(t(2R) - t(R)) / R: cancels the constant per-call overhead."""
    from mingunivision_tpu.utils.profiling import force_sync

    def build(n):
        @jax.jit
        def run(*args):
            acc = jnp.float32(0)
            x = args[0]
            for _ in range(n):
                y = f(x, *args[1:])
                acc = acc + jnp.sum(y).astype(jnp.float32)
                x = x + (acc * 1e-20).astype(x.dtype)
            return acc

        return run

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
    from mingunivision_tpu.config import BailingMoeConfig
    from mingunivision_tpu.models.bailing_moe import (
        LLMCache,
        bailing_forward,
        init_bailing_moe_params,
        moe_route,
        _expert_mlp,
    )
    from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import (
        moe_experts_swiglu_gmm,
        swiglu_gmm,
    )

    key = jax.random.PRNGKey(0)
    results = {}

    # ---- components at one-layer scale
    mk = jax.jit(
        lambda k: (
            jax.random.normal(jax.random.fold_in(k, 1), (E, H, M), jnp.bfloat16) * 0.02,
            jax.random.normal(jax.random.fold_in(k, 2), (E, H, M), jnp.bfloat16) * 0.02,
            jax.random.normal(jax.random.fold_in(k, 3), (E, M, H), jnp.bfloat16) * 0.02,
        )
    )
    wg, wu, wd = mk(key)
    experts = {"gate_proj": wg, "up_proj": wu, "down_proj": wd}
    xf = jax.jit(lambda k: jax.random.normal(k, (T, H), jnp.bfloat16))(key)
    gate_w = jax.jit(lambda k: jax.random.normal(k, (H, E), jnp.bfloat16) * 0.02)(jax.random.fold_in(key, 9))

    # kernel alone, uniform presorted groups C=192
    C = 192
    xb = jax.jit(lambda k: jax.random.normal(k, (E * C, H), jnp.bfloat16))(key)
    t = chained(lambda x, g, u, d: swiglu_gmm(x, g, u, d, jnp.full((E,), C, jnp.int32), tm=C), (xb, wg, wu, wd))
    results["kernel_uniformC192_ms"] = round(t * 1e3, 3)
    say(f"kernel alone (uniform C=192): {t*1e3:.3f} ms")

    # kernel + routing + sort glue at real (random-ish) routing
    def disp(x, g, u, d, gw):
        ex = {"gate_proj": g, "up_proj": u, "down_proj": d}
        ti, tw, _ = moe_route(gw, x, TOP_K, True)
        return moe_experts_swiglu_gmm(ex, x, ti, tw, E, tm=256)

    t = chained(disp, (xf, wg, wu, wd, gate_w))
    results["dispatch_full_ms"] = round(t * 1e3, 3)
    say(f"route+sort+kernel+unsort @1024: {t*1e3:.3f} ms")

    # shared-expert MLP (one expert shape m=1408) on all 1024 rows
    t = chained(lambda x, g, u, d: _expert_mlp(x, g[0], u[0], d[0]), (xf, wg, wu, wd))
    results["shared_mlp_ms"] = round(t * 1e3, 3)
    say(f"shared-expert MLP @1024: {t*1e3:.3f} ms")

    del xb, xf, wg, wu, wd, experts
    jax.clear_caches()

    # ---- e2e 8L prefill, differenced
    from mingunivision_tpu.utils.profiling import force_sync

    for cap_factor, tag in ((2.0, "cap200"), (0.0, "argsort")):
        cfg8 = dataclasses.replace(
            BailingMoeConfig(num_hidden_layers=8), moe_prefill_capacity_factor=cap_factor
        )
        params8 = init_bailing_moe_params(jax.random.PRNGKey(1), cfg8, dtype=jnp.bfloat16)
        xt = jax.jit(lambda k: jax.random.normal(k, (1, T, cfg8.hidden_size), jnp.bfloat16))(key)
        mask = jnp.ones((1, T), bool)

        def build(n, cfg8=cfg8):
            @jax.jit
            def pf(p, xx):
                acc = jnp.float32(0)
                for _ in range(n):
                    cache = LLMCache.create(cfg8, 1, T, jnp.bfloat16)
                    h, _ = bailing_forward(p, cfg8, xx, cache, mask)
                    acc = acc + jnp.sum(h[:, -1]).astype(jnp.float32)
                    xx = xx + (acc * 1e-20).astype(xx.dtype)
                return acc

            return pf

        r1, r2 = build(3), build(6)
        force_sync(r1(params8, xt))
        force_sync(r2(params8, xt))
        b1 = b2 = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            force_sync(r1(params8, xt))
            b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            force_sync(r2(params8, xt))
            b2 = min(b2, time.perf_counter() - t0)
        per = (b2 - b1) / 3
        tok_s_28 = round(T / (per * 28 / 8))
        results[f"e2e_prefill8L_{tag}_ms"] = round(per * 1e3, 2)
        results[f"e2e_prefill28L_{tag}_tok_s"] = tok_s_28
        results[f"e2e_per_layer_{tag}_ms"] = round(per / 8 * 1e3, 3)
        say(f"e2e 8L bf16 prefill [{tag}]: {per*1e3:.2f} ms ({per/8*1e3:.3f} ms/layer) -> {tok_s_28} tok/s @28L-extrap")
        del params8, xt
        jax.clear_caches()

    # ---- e2e 8L int4 prefill (serving tier), stacked tables
    from mingunivision_tpu.utils.quantize import quantize_tree

    cfg8 = BailingMoeConfig(num_hidden_layers=8)
    params8 = init_bailing_moe_params(jax.random.PRNGKey(1), cfg8, dtype=jnp.bfloat16)
    params8 = jax.jit(lambda p: quantize_tree(p, bits=4))(params8)
    xt = jax.jit(lambda k: jax.random.normal(k, (1, T, cfg8.hidden_size), jnp.bfloat16))(key)
    mask = jnp.ones((1, T), bool)

    def build_q(n):
        @jax.jit
        def pf(p, xx):
            acc = jnp.float32(0)
            for _ in range(n):
                cache = LLMCache.create(cfg8, 1, T, jnp.bfloat16)
                h, _ = bailing_forward(p, cfg8, xx, cache, mask)
                acc = acc + jnp.sum(h[:, -1]).astype(jnp.float32)
                xx = xx + (acc * 1e-20).astype(xx.dtype)
            return acc

        return pf

    r1, r2 = build_q(3), build_q(6)
    force_sync(r1(params8, xt))
    force_sync(r2(params8, xt))
    b1 = b2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        force_sync(r1(params8, xt))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        force_sync(r2(params8, xt))
        b2 = min(b2, time.perf_counter() - t0)
    per = (b2 - b1) / 3
    results["e2e_prefill8L_int4_ms"] = round(per * 1e3, 2)
    results["e2e_prefill28L_int4_tok_s"] = round(T / (per * 28 / 8))
    say(f"e2e 8L int4 prefill: {per*1e3:.2f} ms -> {results['e2e_prefill28L_int4_tok_s']} tok/s @28L-extrap")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
