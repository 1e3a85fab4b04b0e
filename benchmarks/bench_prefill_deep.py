"""Prefill kernel per-visit cost decomposition (VERDICT r5 task 3, part 2).

bench_capacity_deep measured kernel-only uniform-groups C=192 tm=192 at
7.49 ms — 117 us per expert visit where FLOPs price 36 us and DMA 18 us.
Hypothesis: each visit's 17.3 MB weight fetch is NOT overlapped with compute
(and/or runs at low single-stream bandwidth), making the kernel per-visit
DMA-latency bound. Discriminating experiments, all chained-in-jit with
UNIQUE routing per rep (the earlier probe's identical-idx chain let XLA CSE
idx-only stages — those numbers were void):

  kernel C=192 tm=192, m-chunk in (full, 704, 352, 128)
      chunked m -> smaller blocks pipelined across chunk steps; if DMA
      overlap is the problem, chunking should speed it up.
  kernel C=256 tm in (256, 128, 64)
      tm below C doubles/quadruples expert visits AND total DMA; if
      DMA-bound, time scales with visits.
  e2e 8L bf16 prefill, argsort vs capacity-1.33 vs capacity-2.0
      the production-level answer for the >= 8k tok/s bar.

Usage: timeout 3000 python benchmarks/bench_prefill_deep.py
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

E, H, M, TOP_K = 64, 2048, 1408, 6


def say(*a):
    print(*a, flush=True)


def chained(f, args, reps=3, iters=3):
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
    from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import swiglu_gmm

    key = jax.random.PRNGKey(0)
    mk = jax.jit(
        lambda k: (
            jax.random.normal(jax.random.fold_in(k, 1), (E, H, M), jnp.bfloat16) * 0.02,
            jax.random.normal(jax.random.fold_in(k, 2), (E, H, M), jnp.bfloat16) * 0.02,
            jax.random.normal(jax.random.fold_in(k, 3), (E, M, H), jnp.bfloat16) * 0.02,
        )
    )
    wg, wu, wd = mk(key)
    results = {}

    # ---- kernel-only m-chunk sweep at C=192 (uniform groups, tm=C)
    C = 192
    xb0 = jax.jit(lambda k: jax.random.normal(k, (E * C, H), jnp.bfloat16))(key)
    for chunk in (None, 704, 352, 128):
        def kfn(xb, wg, wu, wd, chunk=chunk):
            kw = {} if chunk is None else {"chunk": chunk}
            return swiglu_gmm(xb, wg, wu, wd, jnp.full((E,), C, jnp.int32), tm=C, **kw)
        try:
            t = chained(kfn, (xb0, wg, wu, wd))
            results[f"kernel_C192_chunk{chunk or 'full'}"] = round(t * 1e3, 3)
            say(f"kernel C=192 tm=192 chunk={chunk or 'full'}: {t*1e3:.3f} ms")
        except Exception as e:  # noqa: BLE001
            say(f"kernel C=192 chunk={chunk}: ERROR {str(e)[:120]}")

    # ---- tm sweep at C=256 (visits x2/x4 -> DMA x2/x4 if re-read per visit)
    C = 256
    xb1 = jax.jit(lambda k: jax.random.normal(k, (E * C, H), jnp.bfloat16))(key)
    for tm in (256, 128, 64):
        def kfn2(xb, wg, wu, wd, tm=tm):
            return swiglu_gmm(xb, wg, wu, wd, jnp.full((E,), C, jnp.int32), tm=tm)
        try:
            t = chained(kfn2, (xb1, wg, wu, wd))
            results[f"kernel_C256_tm{tm}"] = round(t * 1e3, 3)
            say(f"kernel C=256 tm={tm}: {t*1e3:.3f} ms")
        except Exception as e:  # noqa: BLE001
            say(f"kernel C=256 tm={tm}: ERROR {str(e)[:120]}")

    del xb0, xb1, wg, wu, wd
    jax.clear_caches()

    # ---- e2e 8L bf16 prefill (BENCHMARKS 'End-to-end prefill' form)
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
        jax.clear_caches()

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
