"""Discriminating probe for the bf16 prefill MoE floor (VERDICT r4 task 3).

Model under test: every grouped/batched dispatch measured so far (Pallas fused
gmm, XLA capacity einsum, ragged_dot) lands at ~4.8 ms/layer @1024 tok, which
is almost exactly the SINGLE-MXU weight-pass floor for the expert tables:
  64 experts x 528 (128x128) weight tiles x 128 cycles / 0.94 GHz = 4.6 ms
while XLA's dense 4096^3 runs 3x faster than a single-MXU model (91 TF/s) —
so the chip CAN parallelize weight-tile streaming, and the question is which
SHAPES engage it. Chained-in-jit, unique data per rep:

  A. dense skinny-M:   (M, 2048) @ (2048, 90112)  [all-expert w1 concat],
     M in {128, 256, 512, 1024}. If fast (>2x single-MXU model), skinny M is
     fine and the batched STRUCTURE is what serializes.
  B. batched einsum:   (64, C, 2048) @ (64, 2048, 1408), C in {128, 192, 256}.
  C. block-diagonal grouping: (64/G, G*C, 2048) @ (64/G, 2048, G*1408) for
     G in {2, 4} at C=128 — trades G x FLOPs for dense-friendly shapes.
  D. fat dense control: (12288, 2048) @ (2048, 1408) — the same total rows as
     1024-tok top-6 against ONE expert table (FLOP ceiling at these K/N).

Usage: timeout 1800 python benchmarks/bench_mxu_skinny.py
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

E, H, M = 64, 2048, 1408


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
    key = jax.random.PRNGKey(0)
    results = {}

    # ---- A: dense skinny-M vs all-expert-concat N (w1-equivalent bytes)
    wN = jax.jit(lambda k: jax.random.normal(k, (H, E * M), jnp.bfloat16) * 0.02)(key)
    for Mrows in (128, 256, 512, 1024):
        x = jax.jit(lambda k: jax.random.normal(k, (Mrows, H), jnp.bfloat16))(key)
        t = chained(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16), (x, wN))
        gb = (H * E * M * 2) / 1e9
        fl = 2 * Mrows * H * E * M / 1e12
        results[f"A_dense_M{Mrows}_ms"] = round(t * 1e3, 3)
        say(f"A dense ({Mrows},{H})@({H},{E*M}): {t*1e3:.3f} ms = {gb/t:.0f} GB/s wt, {fl/t:.1f} TF/s")
    del wN

    # ---- D: fat dense control (single expert table, all rows)
    w1 = jax.jit(lambda k: jax.random.normal(k, (H, M), jnp.bfloat16) * 0.02)(key)
    xf = jax.jit(lambda k: jax.random.normal(k, (12288, H), jnp.bfloat16))(key)
    t = chained(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16), (xf, w1))
    fl = 2 * 12288 * H * M / 1e12
    results["D_fat_dense_ms"] = round(t * 1e3, 3)
    say(f"D dense (12288,{H})@({H},{M}): {t*1e3:.3f} ms = {fl/t:.1f} TF/s")
    del w1, xf

    # ---- B: batched einsum at capacity shapes
    wB = jax.jit(lambda k: jax.random.normal(k, (E, H, M), jnp.bfloat16) * 0.02)(key)
    for C in (128, 192, 256):
        xb = jax.jit(lambda k: jax.random.normal(k, (E, C, H), jnp.bfloat16))(key)
        t = chained(
            lambda x, w: jnp.einsum("ech,ehm->ecm", x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            (xb, wB),
        )
        gb = (E * H * M * 2) / 1e9
        fl = 2 * E * C * H * M / 1e12
        results[f"B_batched_C{C}_ms"] = round(t * 1e3, 3)
        say(f"B batched ({E},{C},{H})@({E},{H},{M}): {t*1e3:.3f} ms = {gb/t:.0f} GB/s wt, {fl/t:.1f} TF/s")
    del wB

    # ---- C: block-diagonal grouping at C=128
    C = 128
    for G in (2, 4):
        nb = E // G
        wG = jax.jit(lambda k, G=G, nb=nb: jax.random.normal(k, (nb, H, G * M), jnp.bfloat16) * 0.02)(key)
        xG = jax.jit(lambda k, G=G, nb=nb: jax.random.normal(k, (nb, G * C, H), jnp.bfloat16))(key)
        t = chained(
            lambda x, w: jnp.einsum("bch,bhm->bcm", x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            (xG, wG),
        )
        useful = 2 * E * C * H * M / 1e12
        results[f"C_blockdiag_G{G}_ms"] = round(t * 1e3, 3)
        say(f"C blockdiag G={G} ({nb},{G*C},{H})@({nb},{H},{G*M}): {t*1e3:.3f} ms ({useful/t:.1f} useful-TF/s incl {G}x waste)")
        del wG, xG

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
