"""Component benchmarks on the real chip: where does the time go?

Run: python benchmarks/bench_components.py [--quick]
Prints one JSON line per component (machine-parsable log, not the driver metric).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


from mingunivision_tpu.utils.profiling import bench_fn as timeit  # scalar-fetch sync (axon-safe)


def report(name, seconds, **extra):
    print(json.dumps({"bench": name, "ms": round(seconds * 1e3, 3), **extra}), flush=True)


def bench_mingtok(quick=False):
    from mingunivision_tpu.config import MingTokConfig
    from mingunivision_tpu.models.mingtok import (
        init_mingtok_params,
        mingtok_encode,
        mingtok_enc_dec,
        mingtok_pixel_decoder,
    )

    cfg = MingTokConfig()
    params = init_mingtok_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    B = 4 if quick else 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 512, 512), jnp.float32)

    enc = jax.jit(lambda p, x: mingtok_encode(p, cfg, x)["x_norm_patchtokens"])
    t = timeit(enc, params, x)
    report("mingtok_encode_512", t, batch=B, ips=round(B / t, 1))

    feats = enc(params, x)
    pix = jax.jit(lambda p, f: mingtok_pixel_decoder(p, cfg, f))
    t = timeit(pix, params, feats)
    report("mingtok_pixel_decode_fp32", t, batch=B, ips=round(B / t, 1))

    full = jax.jit(lambda p, x: mingtok_enc_dec(p, cfg, x))
    t = timeit(full, params, x)
    report("mingtok_enc_dec_512", t, batch=B, ips=round(B / t, 1))


def bench_llm_decode(quick=False, layers=8):
    from mingunivision_tpu.config import BailingMoeConfig
    from mingunivision_tpu.models.bailing_moe import (
        LLMCache,
        bailing_forward,
        init_bailing_moe_params,
    )

    cfg = BailingMoeConfig(num_hidden_layers=layers)
    params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    Smax = 1024

    for B, tag in ((1, "b1"), (3, "cfg3")):
        cache = LLMCache.create(cfg, B, Smax, jnp.bfloat16)
        cache = LLMCache(cache.k, cache.v, jnp.int32(128))
        mask = jnp.zeros((B, Smax), bool).at[:, :129].set(True)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, cfg.hidden_size), jnp.bfloat16)

        @jax.jit
        def step(p, x, cache, mask):
            h, c = bailing_forward(p, cfg, x, cache, mask)
            return h

        t = timeit(step, params, x, cache, mask)
        scale = 28 / layers
        report(f"llm_decode_step_{tag}", t, layers=layers, extrapolated_28l_ms=round(t * scale * 1e3, 2))

    # prefill
    T = 512 if quick else 1024
    cache = LLMCache.create(cfg, 1, T, jnp.bfloat16)
    mask = jnp.ones((1, T), bool)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, T, cfg.hidden_size), jnp.bfloat16)

    @jax.jit
    def prefill(p, x, cache, mask):
        h, c = bailing_forward(p, cfg, x, cache, mask)
        return h

    t = timeit(prefill, params, x, cache, mask, iters=4)
    report("llm_prefill", t, tokens=T, layers=layers, tok_per_s=round(T / t / (28 / layers)))


def bench_rf(quick=False):
    from mingunivision_tpu.config import RFHeadConfig
    from mingunivision_tpu.models.rf_head import init_rf_head_params, rf_sample

    cfg = RFHeadConfig()  # full size: 3072 wide, depth 12, 16 steps
    params = init_rf_head_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(1), (3, cfg.z_channels), jnp.bfloat16)

    @jax.jit
    def sample(p, z, key):
        return rf_sample(p, cfg, z, key, text_cfg=3.0, image_cfg=1.1)

    t = timeit(sample, params, z, jax.random.PRNGKey(2))
    report("rf_sample_16steps_cfg3", t, per_image_s=round(t * 256, 2))


def bench_semdec_step():
    from mingunivision_tpu.config import MingTokConfig
    from mingunivision_tpu.models.mingtok import init_mingtok_params, make_semdec_cache, mingtok_feature_decoder

    cfg = MingTokConfig()
    params = init_mingtok_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    cache = make_semdec_cache(cfg.semantic_decoder, 1, 257, jnp.bfloat16)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 32), jnp.bfloat16)

    @jax.jit
    def step(p, lat, cache):
        out, c = mingtok_feature_decoder(p, cfg, lat, cache)
        return out["x_norm_patchtokens"]

    t = timeit(step, params, lat, cache)
    report("semdec_step", t, per_image_s=round(t * 256, 3))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None)
    ap.add_argument("--allow-cpu", action="store_true")
    args = ap.parse_args()
    if jax.default_backend() != "tpu" and not args.allow_cpu:
        # JAX_PLATFORMS='' silently falls back to host CPU when the axon claim
        # is not ready — a full-width "bench" then grinds for an hour on host.
        sys.exit(f"refusing to bench on backend={jax.default_backend()!r}; pass --allow-cpu to override")
    benches = {
        "mingtok": lambda: bench_mingtok(args.quick),
        "llm": lambda: bench_llm_decode(args.quick),
        "rf": lambda: bench_rf(args.quick),
        "semdec": bench_semdec_step,
    }
    for name, fn in benches.items():
        if args.only and name != args.only:
            continue
        fn()
