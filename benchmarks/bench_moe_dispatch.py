"""MoE prefill dispatch + fused-kernel breakdown (round-4 prefill-MFU work).

Round-3 numbers put the fused swiglu-gmm FULL-dispatch at 5.67 (bf16) /
7.03 (int8) ms/layer @1024 tokens while the raw kernel alone measured 3.63 ms
(int8, balanced groups) — so ~3.4 ms/layer was glue (two 6144-element argsorts,
gathers, bincount, combine), and the kernel itself sat ~4x over the ~1.35 ms
weight-DMA floor because m-chunked weight blocks of an (E, h, m) table are
256 B-strided reads. This probe measures both fixes:

  1. counting-sort dispatch (moe_gmm.expert_sort) vs the old argsort pair;
  2. full-m contiguous weight blocks (chunk=m, raised VMEM budget) vs chunk=128;

across bf16/int8/int4 tiers and tm in {128, 256, 512}, RANDOM (unbalanced)
routing at 1024 and 4096 tokens. Run alone on the chip (one TPU process,
>=10-min timeout).
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from mingunivision_tpu.ops.kernels.moe_gmm import expert_sort
from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import (
    moe_experts_swiglu_gmm,
    swiglu_gmm,
    swiglu_gmm_quant,
)
from mingunivision_tpu.utils.profiling import bench_fn, force_sync
from mingunivision_tpu.utils.quantize import quantize_array

E, H, M = 64, 2048, 1408  # Ming-Lite 16B-A3B layer dims
TOP_K = 6


def say(*a):
    print(*a, flush=True)


def make_tables(bits):
    @jax.jit
    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        g = jax.random.normal(k1, (E, H, M), jnp.float32) * 0.02
        u = jax.random.normal(k2, (E, H, M), jnp.float32) * 0.02
        d = jax.random.normal(k3, (E, M, H), jnp.float32) * 0.02
        if bits == 16:
            return g.astype(jnp.bfloat16), u.astype(jnp.bfloat16), d.astype(jnp.bfloat16)
        return quantize_array(g, bits), quantize_array(u, bits), quantize_array(d, bits)

    out = init(jax.random.PRNGKey(0))
    force_sync(out[0].s if bits != 16 else out[0])
    return out


def glue_bench(N):
    """Dispatch glue alone: route-sorted gather + unsort-combine, old vs new."""
    x = jax.jit(lambda k: jax.random.normal(k, (N, H), jnp.bfloat16))(jax.random.PRNGKey(1))
    idx = jax.jit(lambda k: jax.random.randint(k, (N, TOP_K), 0, E))(jax.random.PRNGKey(2))
    w = jax.jit(lambda k: jax.nn.softmax(jax.random.normal(k, (N, TOP_K))))(jax.random.PRNGKey(3))
    A = N * TOP_K

    @jax.jit
    def old(x, idx, w):
        flat_e = idx.reshape(-1)
        order = jnp.argsort(flat_e, stable=True)
        xs = jnp.take(x, order // TOP_K, axis=0)
        gs = jnp.bincount(flat_e, length=E).astype(jnp.int32)
        inv = jnp.argsort(order, stable=True)
        per = jnp.take(xs, inv, axis=0).reshape(N, TOP_K, -1)  # stand-in for ys
        return jnp.einsum("nkh,nk->nh", per.astype(jnp.float32), w.astype(jnp.float32)), gs

    @jax.jit
    def new(x, idx, w):
        flat_e = idx.reshape(-1)
        order, inv, gs = expert_sort(flat_e, E)
        xs = jnp.take(x, order // TOP_K, axis=0)
        per = jnp.take(xs, inv, axis=0).reshape(N, TOP_K, -1)
        return jnp.einsum("nkh,nk->nh", per.astype(jnp.float32), w.astype(jnp.float32)), gs

    t_old = bench_fn(lambda: old(x, idx, w), iters=8, warmup=2)
    t_new = bench_fn(lambda: new(x, idx, w), iters=8, warmup=2)
    say(f"glue N={N}: argsort-pair {t_old*1e3:.3f} ms -> counting-sort {t_new*1e3:.3f} ms")
    return t_old, t_new


def kernel_bench(bits, tokens, tm, chunk):
    tabs = make_tables(bits)
    A = tokens * TOP_K
    xs = jax.jit(lambda k: jax.random.normal(k, (A, H), jnp.bfloat16))(jax.random.PRNGKey(4))
    gs = jnp.full((E,), A // E, jnp.int32)
    if bits == 16:
        f = jax.jit(functools.partial(swiglu_gmm, tm=tm, chunk=chunk))
    else:
        f = jax.jit(functools.partial(swiglu_gmm_quant, tm=tm, chunk=chunk))
    t = bench_fn(lambda: f(xs, *tabs, gs), iters=6, warmup=2)
    say(f"raw kernel int{bits} @{tokens}tok tm={tm} chunk={chunk}: {t*1e3:.3f} ms/layer")
    return t


def full_bench(bits, tokens, tm):
    tabs = make_tables(bits)
    experts = {"gate_proj": tabs[0], "up_proj": tabs[1], "down_proj": tabs[2]}
    x = jax.jit(lambda k: jax.random.normal(k, (tokens, H), jnp.bfloat16))(jax.random.PRNGKey(5))
    idx = jax.jit(lambda k: jax.random.randint(k, (tokens, TOP_K), 0, E, jnp.int32))(jax.random.PRNGKey(6))
    w = jax.jit(lambda k: jax.nn.softmax(jax.random.normal(k, (tokens, TOP_K), jnp.bfloat16)))(jax.random.PRNGKey(7))
    f = jax.jit(functools.partial(moe_experts_swiglu_gmm, num_experts=E, tm=tm))
    t = bench_fn(lambda: f(experts, x, idx, w), iters=6, warmup=2)
    say(f"FULL dispatch int{bits} @{tokens}tok tm={tm}: {t*1e3:.3f} ms/layer")
    return t


def chained_bench(fn_name, dispatch, bits, tokens, reps=4, **kw):
    """Chain `reps` dispatch calls inside ONE jit (each consumes the previous
    output) and divide — the only axon-trustworthy timing for per-layer cost
    (per-call overhead pipelines and under-reports otherwise; CLAUDE.md)."""
    tabs = make_tables(bits)
    experts = {"gate_proj": tabs[0], "up_proj": tabs[1], "down_proj": tabs[2]}
    x = jax.jit(lambda k: jax.random.normal(k, (tokens, H), jnp.bfloat16))(jax.random.PRNGKey(5))
    idx = jax.jit(lambda k: jax.random.randint(k, (tokens, TOP_K), 0, E, jnp.int32))(jax.random.PRNGKey(6))
    w = jax.jit(lambda k: jax.nn.softmax(jax.random.normal(k, (tokens, TOP_K), jnp.bfloat16)))(jax.random.PRNGKey(7))

    @jax.jit
    def f(experts, x, idx, w):
        for _ in range(reps):
            y = dispatch(experts, x, idx, w, E, **kw)
            x = (x + y.astype(jnp.float32)).astype(x.dtype)  # dependency chain
        return x

    t = bench_fn(lambda: f(experts, x, idx, w), iters=4, warmup=2) / reps
    say(f"chained {fn_name} int{bits} @{tokens}tok: {t*1e3:.3f} ms/layer")
    return t


def capacity_probe():
    """Round-4 second pass: capacity-dense scatter + UNIFORM-groups fused
    kernel (tm == capacity -> one visit per expert, no boundary recompute)
    vs the argsort-gmm default, chained-in-jit."""
    from mingunivision_tpu.ops.kernels.moe_capacity import (
        moe_experts_capacity_gmm,
        moe_experts_capacity_gmm_exact,
    )

    results = {}
    for bits in (16, 8):
        t = chained_bench("argsort-gmm tm=256", moe_experts_swiglu_gmm, bits, 1024, tm=256)
        results[f"argsort_int{bits}_tm256"] = round(t * 1e3, 3)
        for C in (128, 192):
            t = chained_bench(
                f"capacity-gmm C={C}", moe_experts_capacity_gmm, bits, 1024, capacity=C
            )
            results[f"capgmm_int{bits}_C{C}"] = round(t * 1e3, 3)
        t = chained_bench(
            "capacity-gmm-exact C=128", moe_experts_capacity_gmm_exact, bits, 1024, capacity=128
        )
        results[f"capgmm_exact_int{bits}_C128"] = round(t * 1e3, 3)
    # 4096-token prefill leg (mean load 384; C=512)
    t = chained_bench("argsort-gmm tm=256 @4096", moe_experts_swiglu_gmm, 16, 4096, tm=256)
    results["argsort_int16_4096"] = round(t * 1e3, 3)
    t = chained_bench(
        "capacity-gmm C=512 @4096", moe_experts_capacity_gmm, 16, 4096, capacity=512
    )
    results["capgmm_int16_4096_C512"] = round(t * 1e3, 3)
    print(json.dumps(results))


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    say("tpu up")
    if "--capacity" in sys.argv:
        return capacity_probe()
    results = {}
    for N in (1024, 4096):
        to, tn = glue_bench(N)
        results[f"glue_{N}"] = {"argsort_ms": round(to * 1e3, 3), "csort_ms": round(tn * 1e3, 3)}
    for bits in (16, 8):
        for chunk in (128, M):
            for tm in (128, 256):
                t = kernel_bench(bits, 1024, tm, chunk)
                results[f"k_int{bits}_c{chunk}_tm{tm}"] = round(t * 1e3, 3)
    # int4: chunked plane-aware (current default) vs full-expert-block variant
    t = kernel_bench(4, 1024, 128, 0)
    results["k_int4_default"] = round(t * 1e3, 3)
    for bits in (16, 8, 4):
        for tm in (128, 256):
            t = full_bench(bits, 1024, tm)
            results[f"full_int{bits}_tm{tm}"] = round(t * 1e3, 3)
    t = full_bench(16, 4096, 256)
    results["full_int16_4096_tm256"] = round(t * 1e3, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
