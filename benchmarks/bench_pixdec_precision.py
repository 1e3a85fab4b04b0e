"""Pixel-decoder matmul-precision tier study (primary-metric lever).

The 512px encode->decode throughput (bench.py primary metric) is compute-bound
in the 24-layer d=1024 pixel decoder, whose reference runs fp32
(mingtok/modeling_mingtok.py:157,180 maybe_autocast disabled). JAX offers three
fp32 MXU modes: HIGHEST (true fp32, 6-pass), HIGH (bf16x3), DEFAULT (single
bf16 pass, ~3x HIGH's rate). This measures, on one v5e chip:

  - enc_dec throughput at each tier (batch 8, 512px), and
  - on-device PSNR of each tier's reconstruction vs the HIGHEST oracle
    (scalar fetch only; the axon tunnel makes full-array fetches crawl).

Decision rule (documented in BENCHMARKS.md): 8-bit image quantization noise
sits at 48.1 dB PSNR; a tier whose divergence from fp32 stays well above that
is invisible in the uint8 output and in the recon-vs-GT gate (~30.8 dB PSNR,
BASELINE.md) — error power adds <1.2% at >=50 dB.
"""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main(batch: int = 8, iters: int = 10, warmup: int = 2):
    import dataclasses

    from mingunivision_tpu.config import MingTokConfig
    from mingunivision_tpu.models.mingtok import init_mingtok_params, mingtok_enc_dec
    from mingunivision_tpu.utils.profiling import bench_fn

    assert jax.default_backend() == "tpu", f"need TPU, got {jax.default_backend()}"

    base = MingTokConfig()
    params = init_mingtok_params(jax.random.PRNGKey(0), base, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, 512, 512), jnp.float32)

    def cfg_for(prec: str) -> MingTokConfig:
        return dataclasses.replace(base, pixel_decoder=dataclasses.replace(base.pixel_decoder, matmul_precision=prec))

    outs = {}
    for prec in ("highest", "high", "default", "bf16"):
        cfg = cfg_for(prec)
        f = jax.jit(lambda p, x, cfg=cfg: mingtok_enc_dec(p, cfg, x))
        dt = bench_fn(f, params, x, iters=iters, warmup=warmup)
        outs[prec] = f(params, x)
        print(f"{prec:8s}: {batch / dt:7.2f} img/s/chip  ({dt * 1e3 / batch:.2f} ms/img)", flush=True)

    @jax.jit
    def psnr(a, b):
        # images are clamped to [-1, 1] -> peak-to-peak 2.0
        mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))
        return 10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-30))

    for prec in ("high", "default", "bf16"):
        print(f"PSNR {prec} vs highest: {float(psnr(outs[prec], outs['highest'])):.1f} dB", flush=True)


if __name__ == "__main__":
    main()
