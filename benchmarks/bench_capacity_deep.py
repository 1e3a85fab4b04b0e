"""Decompose the capacity-dense MoE dispatch cost (VERDICT r5 task 3).

Round-4 finding: capacity-gmm C=192 bf16 @1024tok measured 4.886 ms/layer,
perf-neutral vs argsort-gmm's 4.767 — yet its FLOP count (one uniform
(C, h) x (h, m) visit per expert, no boundary recompute) prices at ~2.4 ms
compute-bound / 1.15 ms DMA-bound. ~2.5 ms is unexplained. This probe times
each stage of moe_experts_capacity_gmm separately, chained-in-jit:

  rank     expert_rank (blocked-triangular counts)
  scatter  xb build: zeros.at[dst].set(repeat(x, k))   <- suspect: XLA TPU
           row-scatter without unique_indices lowers to a serial loop
  kernel   swiglu_gmm over a PRE-BUILT xb with uniform groups (tm = C)
  gather   take-by-dst + mask + weighted combine
  full     the production moe_experts_capacity_gmm
  full_u   variant with unique_indices=True scatter (pads get distinct
           trash slots so indices stay unique under the no-overflow guard)

Usage: timeout 1800 python benchmarks/bench_capacity_deep.py
"""

import functools
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


def say(*a):
    print(*a, flush=True)


def chained(f, args, reps=4, iters=4, warmup=2):
    from mingunivision_tpu.utils.profiling import force_sync

    @jax.jit
    def run(*args):
        acc = jnp.float32(0)
        x = args[0]
        for _ in range(reps):
            y = f(x, *args[1:])
            acc = acc + jnp.sum(y).astype(jnp.float32)
            x = x + (acc * 1e-20).astype(x.dtype)
        return acc

    force_sync(run(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        force_sync(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    say("tpu up")
    from mingunivision_tpu.ops.kernels.moe_capacity import expert_rank, moe_experts_capacity_gmm
    from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import moe_experts_swiglu_gmm, swiglu_gmm

    tokens = 1024
    A = tokens * TOP_K
    key = jax.random.PRNGKey(0)
    mk = jax.jit(
        lambda k: (
            jax.random.normal(jax.random.fold_in(k, 1), (E, H, M), jnp.bfloat16) * 0.02,
            jax.random.normal(jax.random.fold_in(k, 2), (E, H, M), jnp.bfloat16) * 0.02,
            jax.random.normal(jax.random.fold_in(k, 3), (E, M, H), jnp.bfloat16) * 0.02,
            jax.random.normal(jax.random.fold_in(k, 4), (tokens, H), jnp.bfloat16),
            jax.random.randint(jax.random.fold_in(k, 5), (tokens, TOP_K), 0, E, jnp.int32),
            jax.nn.softmax(jax.random.normal(jax.random.fold_in(k, 6), (tokens, TOP_K), jnp.float32)),
        )
    )
    wg, wu, wd, x, idx, w = mk(key)
    experts = {"gate_proj": wg, "up_proj": wu, "down_proj": wd}
    results = {}

    for C in (192, 256):
        # ---- stage: rank only
        def rank_only(x, idx):
            r, gs = expert_rank(idx.reshape(-1), E)
            return (r.sum() + gs.sum()).astype(jnp.float32).reshape(1, 1) + x[:1, :1] * 0
        t = chained(rank_only, (x, idx))
        results[f"rank_C{C}"] = round(t * 1e3, 3)
        say(f"rank: {t*1e3:.3f} ms")

        # ---- stage: rank + scatter
        def scatter_only(x, idx, C=C):
            flat_e = idx.reshape(-1)
            rank, _ = expert_rank(flat_e, E)
            ok = rank < C
            dst = jnp.where(ok, flat_e * C + rank, E * C)
            xs = jnp.repeat(x, TOP_K, axis=0)
            xb = jnp.zeros((E * C + 1, H), x.dtype).at[dst].set(xs, mode="drop")[: E * C]
            return xb[:8, :8]
        t = chained(scatter_only, (x, idx))
        results[f"rank_scatter_C{C}"] = round(t * 1e3, 3)
        say(f"rank+scatter C={C}: {t*1e3:.3f} ms")

        # ---- stage: scatter-free gather build (matmul index map + row gather)
        def gather_build(x, idx, C=C):
            from mingunivision_tpu.ops.kernels.moe_capacity import capacity_src_map

            flat_e = idx.reshape(-1)
            rank, _ = expert_rank(flat_e, E)
            src, occ = capacity_src_map(flat_e, rank, E, C)
            xs = jnp.repeat(x, TOP_K, axis=0)
            xb = jnp.where(occ[:, None], jnp.take(xs, src, axis=0), 0)
            return xb[:8, :8]
        t = chained(gather_build, (x, idx))
        results[f"rank_gatherbuild_C{C}"] = round(t * 1e3, 3)
        say(f"rank+gather-build C={C}: {t*1e3:.3f} ms")

        # ---- stage: rank + scatter with UNIQUE indices (pads -> distinct trash)
        def scatter_unique(x, idx, C=C):
            flat_e = idx.reshape(-1)
            rank, _ = expert_rank(flat_e, E)
            ok = rank < C
            trash = E * C + jnp.arange(A, dtype=jnp.int32)
            dst = jnp.where(ok, flat_e * C + rank, trash)
            xs = jnp.repeat(x, TOP_K, axis=0)
            xb = (
                jnp.zeros((E * C + A, H), x.dtype)
                .at[dst]
                .set(xs, mode="drop", unique_indices=True)[: E * C]
            )
            return xb[:8, :8]
        t = chained(scatter_unique, (x, idx))
        results[f"rank_scatter_unique_C{C}"] = round(t * 1e3, 3)
        say(f"rank+scatter-unique C={C}: {t*1e3:.3f} ms")

        # ---- stage: kernel only (pre-built uniform xb)
        xb0 = jax.jit(lambda k: jax.random.normal(k, (E * C, H), jnp.bfloat16))(key)
        gs_u = jnp.full((E,), C, jnp.int32)
        def kernel_only(xb, wg, wu, wd, C=C):
            return swiglu_gmm(xb, wg, wu, wd, jnp.full((E,), C, jnp.int32), tm=C)
        t = chained(kernel_only, (xb0, wg, wu, wd))
        results[f"kernel_C{C}_tm{C}"] = round(t * 1e3, 3)
        say(f"kernel-only C={C} tm={C}: {t*1e3:.3f} ms")

        if C == 256:
            for tm in (64, 128):
                def kernel_tm(xb, wg, wu, wd, C=C, tm=tm):
                    return swiglu_gmm(xb, wg, wu, wd, jnp.full((E,), C, jnp.int32), tm=tm)
                t = chained(kernel_tm, (xb0, wg, wu, wd))
                results[f"kernel_C{C}_tm{tm}"] = round(t * 1e3, 3)
                say(f"kernel-only C={C} tm={tm}: {t*1e3:.3f} ms")

        # ---- full production path, both builds
        for build in ("scatter", "gather"):
            def full(x, idx, w, C=C, build=build):
                return moe_experts_capacity_gmm(experts, x, idx, w, E, C, build=build)
            t = chained(full, (x, idx, w))
            results[f"full_C{C}_{build}"] = round(t * 1e3, 3)
            say(f"full capacity-gmm C={C} build={build}: {t*1e3:.3f} ms")

    # baseline
    def base(x, idx, w):
        return moe_experts_swiglu_gmm(experts, x, idx, w, E, tm=256)
    t = chained(base, (x, idx, w))
    results["argsort_tm256"] = round(t * 1e3, 3)
    say(f"argsort-gmm tm=256: {t*1e3:.3f} ms")

    # ---- e2e 8L bf16 prefill (the BENCHMARKS 'End-to-end prefill' form:
    # measured at 8 layers, tok/s extrapolated x28/8), chained, for both
    # dispatch defaults — the number VERDICT task 3 gates on
    del experts, wg, wu, wd  # free ~3.2 GB of bf16 tables before the 8L model
    jax.clear_caches()

    import dataclasses

    from mingunivision_tpu.config import BailingMoeConfig
    from mingunivision_tpu.models.bailing_moe import LLMCache, bailing_forward, init_bailing_moe_params
    from mingunivision_tpu.utils.profiling import force_sync

    for cap_factor, tag in ((0.0, "argsort"), (1.33, "cap133"), (2.0, "cap200")):
        cfg8 = dataclasses.replace(BailingMoeConfig(num_hidden_layers=8), moe_prefill_capacity_factor=cap_factor)
        params8 = init_bailing_moe_params(jax.random.PRNGKey(1), cfg8, dtype=jnp.bfloat16)
        T = 1024
        xt = jax.jit(lambda k: jax.random.normal(k, (1, T, cfg8.hidden_size), jnp.bfloat16))(key)
        mask = jnp.ones((1, T), bool)

        @jax.jit
        def pf(p, xx):
            acc = jnp.float32(0)
            for _ in range(3):
                cache = LLMCache.create(cfg8, 1, T, jnp.bfloat16)
                h, _ = bailing_forward(p, cfg8, xx, cache, mask)
                acc = acc + jnp.sum(h[:, -1]).astype(jnp.float32)
                xx = xx + (acc * 1e-20).astype(xx.dtype)
            return acc

        force_sync(pf(params8, xt))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            force_sync(pf(params8, xt))
            best = min(best, time.perf_counter() - t0)
        per = best / 3
        tok_s_28 = round(T / (per * 28 / 8))
        results[f"e2e_prefill8L_{tag}_ms"] = round(per * 1e3, 1)
        results[f"e2e_prefill28L_{tag}_tok_s"] = tok_s_28
        say(f"e2e 8L bf16 prefill [{tag}]: {per*1e3:.1f} ms -> {tok_s_28} tok/s @28L-extrap")
        del params8

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
