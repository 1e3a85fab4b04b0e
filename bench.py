"""Benchmark driver: MingTok 512px encode->decode reconstruction throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
North-star config #1/#2 (BASELINE.json): batched MingTok tokenizer throughput.
No published reference latency exists (BASELINE.md) — vs_baseline is measured
against our recorded PyTorch-reference CPU/GPU-free proxy of 1.0 (i.e. the value
itself is the record; the driver archives BENCH_r{N}.json per round).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: first compiles through the TPU tunnel are slow
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def bench_mingtok_recon(batch: int = 8, iters: int = 10, warmup: int = 2):
    from mingunivision_tpu.config import MingTokConfig
    from mingunivision_tpu.models.mingtok import init_mingtok_params, mingtok_enc_dec

    from mingunivision_tpu.utils.profiling import bench_fn

    cfg = MingTokConfig()
    params = init_mingtok_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    f = jax.jit(lambda p, x: mingtok_enc_dec(p, cfg, x))
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, 512, 512), jnp.float32)
    dt = bench_fn(f, params, x, iters=iters, warmup=warmup)
    return batch / dt


if __name__ == "__main__":
    ips = bench_mingtok_recon()
    print(
        json.dumps(
            {
                "metric": "mingtok_512px_encode_decode_throughput",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips, 2),
            }
        )
    )
