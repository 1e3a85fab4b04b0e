"""Roofline re-check after a host migration (same chained-in-jit method as
bench_mxu_skinny): 4096^3 matmul TF/s, HBM read GB/s, empty-jit overhead,
and the fused swiglu_gmm uniform-C=192 baseline — all in ONE process so the
skinny-M probe numbers have an in-process control.

Usage: timeout 1800 python benchmarks/bench_roofline_recheck.py
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


def chained(f, args, reps=16, iters=3):
    """Per-rep DEVICE time by differencing: the axon per-call overhead on this
    host is ~25 ms and pipelines with device work (measured time is roughly
    max(overhead, reps*work)), so a single-reps reading is floor-limited.
    Run the chain at reps and 2*reps; work = (t2 - t1) / reps cancels any
    constant per-call cost."""
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
    force_sync(r1(*args)); force_sync(r2(*args))
    b1 = b2 = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter(); force_sync(r1(*args)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); force_sync(r2(*args)); b2 = min(b2, time.perf_counter() - t0)
    return max(b2 - b1, 1e-9) / reps


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    say("tpu up")
    from mingunivision_tpu.utils.profiling import force_sync

    key = jax.random.PRNGKey(0)
    results = {}

    # empty-jit overhead
    z = jnp.float32(1.0)
    f0 = jax.jit(lambda x: x + 1)
    force_sync(f0(z))
    t0 = time.perf_counter()
    for _ in range(10):
        force_sync(f0(z))
    results["empty_jit_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 2)
    say(f"empty jit: {results['empty_jit_ms']} ms")

    # 4096^3 bf16 matmul
    a = jax.jit(lambda k: jax.random.normal(k, (4096, 4096), jnp.bfloat16))(key)
    b = jax.jit(lambda k: jax.random.normal(k, (4096, 4096), jnp.bfloat16))(jax.random.fold_in(key, 1))
    t = chained(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16), (a, b))
    fl = 2 * 4096**3 / 1e12
    results["matmul4096_ms"] = round(t * 1e3, 3)
    results["matmul4096_tf_s"] = round(fl / t, 1)
    say(f"4096^3: {t*1e3:.3f} ms = {fl/t:.1f} TF/s")
    del a, b

    # HBM read: sum of a 1 GB bf16 array
    big = jax.jit(lambda k: jax.random.normal(k, (512 * 1024 * 1024,), jnp.bfloat16))(key)
    t = chained(lambda x: jnp.sum(x.astype(jnp.float32))[None], (big,))
    gb = big.size * 2 / 1e9
    results["hbm_read_gb_s"] = round(gb / t, 0)
    say(f"HBM read: {gb/t:.0f} GB/s")
    del big

    # fused swiglu_gmm uniform C=192 (round-5 probe baseline: 10.11 ms)
    from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import swiglu_gmm

    E, H, M, C = 64, 2048, 1408, 192
    mk = jax.jit(
        lambda k: (
            jax.random.normal(jax.random.fold_in(k, 1), (E, H, M), jnp.bfloat16) * 0.02,
            jax.random.normal(jax.random.fold_in(k, 2), (E, H, M), jnp.bfloat16) * 0.02,
            jax.random.normal(jax.random.fold_in(k, 3), (E, M, H), jnp.bfloat16) * 0.02,
        )
    )
    wg, wu, wd = mk(key)
    xb = jax.jit(lambda k: jax.random.normal(k, (E * C, H), jnp.bfloat16))(key)
    t = chained(
        lambda x, g, u, d: swiglu_gmm(x, g, u, d, jnp.full((E,), C, jnp.int32), tm=C),
        (xb, wg, wu, wd),
    )
    results["swiglu_gmm_C192_ms"] = round(t * 1e3, 3)
    say(f"swiglu_gmm uniform C=192: {t*1e3:.3f} ms")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
