"""Measure the quantized fused swiglu-gmm prefill kernels: exact-dequant vs
opt-in integer-MXU (s8 x s8) variants, real Ming-Lite-MoE shapes.

Context (BENCHMARKS.md "Quantized fused prefill"): the exact kernels dequantize
every weight byte on the VPU; the s8 kernels quantize activations per-row and
stream packed weights straight into integer MXU dots (same trick that took the
RF int4 kernel 1.17 -> 1.02 ms/step). This probe records whether that win
transfers to the prefill gmm shapes (reference bar: vLLM FusedMoE w8a8 path).

Run alone on the chip (CLAUDE.md: one TPU process at a time, >=10 min timeout).
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import swiglu_gmm_quant
from mingunivision_tpu.utils.profiling import bench_fn
from mingunivision_tpu.utils.quantize import quantize_array

E, H, M = 64, 2048, 1408  # experts / hidden / moe_intermediate (16B-A3B)
TOP_K = 6


def make_tables(bits: int):
    @jax.jit
    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        g = jax.random.normal(k1, (E, H, M), jnp.float32) * 0.02
        u = jax.random.normal(k2, (E, H, M), jnp.float32) * 0.02
        d = jax.random.normal(k3, (E, M, H), jnp.float32) * 0.02
        return quantize_array(g, bits), quantize_array(u, bits), quantize_array(d, bits)

    return jax.block_until_ready(init(jax.random.PRNGKey(0)))


def run(xs, w1, w3, w2, gs, *, tm, s8):
    return swiglu_gmm_quant(xs, w1, w3, w2, gs, tm=tm, s8=s8)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    results = {}
    for bits, tm in ((8, 256), (4, 128)):
        w1, w3, w2 = make_tables(bits)
        for tokens in (1024, 4096):
            A = tokens * TOP_K
            xs = jax.jit(lambda k: jax.random.normal(k, (A, H), jnp.bfloat16))(
                jax.random.PRNGKey(1)
            )
            gs = jnp.full((E,), A // E, jnp.int32)
            for s8 in (False, True):
                f = jax.jit(functools.partial(run, tm=tm, s8=s8))
                try:
                    t = bench_fn(f, xs, w1, w3, w2, gs, iters=20, warmup=3)
                except Exception as e:  # compile failures -> record, keep going
                    results[f"int{bits}_{tokens}tok_s8={s8}"] = f"ERROR {type(e).__name__}: {e}"[:200]
                    continue
                key = f"int{bits}_{tokens}tok_s8={s8}"
                results[key] = round(t * 1e3, 3)
                print(f"{key}: {t * 1e3:.3f} ms/layer", flush=True)
        del w1, w3, w2
    print(json.dumps(results))


if __name__ == "__main__":
    main()
