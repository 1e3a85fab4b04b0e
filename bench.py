"""Benchmark driver. Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric = MingTok 512px encode->decode reconstruction throughput
(north-star config #1/#2, BASELINE.json). The `extra` field carries the T2I
AR-loop per-token cost (north-star config #4: T2I images/min) so the driver
records it every round. No published reference latency exists (BASELINE.md) —
vs_baseline is the round-1 recorded value of this same metric (BENCH_r01.json:
50.72 images/sec/chip), so >1.0 means faster than round 1.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: first compiles through the TPU tunnel are slow
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

ROUND1_BASELINE_IPS = 50.72  # BENCH_r01.json


def bench_mingtok_recon(batch: int = 8, iters: int = 3, warmup: int = 1, pixdec_precision: str = None, chain: int = 4):
    """512px encode->decode throughput. pixdec_precision=None runs the
    model-default "high" tier (fp32-class, = the BENCH_r01/r02 configuration);
    "default" is the serving tier (BENCHMARKS "Pixel-decoder precision
    tiers": 60.3 dB PSNR vs fp32, ViT flash attention active).

    DEPENDENCY-CHAINED timing (VERDICT r4 weak #8): `chain` enc_dec passes run
    inside ONE jit, each batch perturbed by a scalar of the previous output, so
    no queued work can escape the final scalar-fetch sync the way bench_fn's
    identical-args loop can on axon."""
    import dataclasses

    from mingunivision_tpu.config import MingTokConfig
    from mingunivision_tpu.models.mingtok import init_mingtok_params, mingtok_enc_dec
    from mingunivision_tpu.utils.profiling import force_sync

    cfg = MingTokConfig()
    if pixdec_precision is not None:
        cfg = dataclasses.replace(cfg, pixel_decoder=dataclasses.replace(cfg.pixel_decoder, matmul_precision=pixdec_precision))
    params = init_mingtok_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    @jax.jit
    def chained(p, x):
        acc = jnp.float32(0)
        for _ in range(chain):
            out = mingtok_enc_dec(p, cfg, x)
            acc = acc + jnp.sum(out).astype(jnp.float32)
            x = x + (acc * 1e-20).astype(x.dtype)  # serialize the chain
        return acc

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, 512, 512), jnp.float32)
    force_sync(chained(params, x))  # compile
    best = float("inf")
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        force_sync(chained(params, x))
        best = min(best, time.perf_counter() - t0)
    return batch * chain / best


def bench_prefill_int4(T: int = 2048) -> float:
    """Full 28-layer int4 prefill tok/s (fused grouped-SwiGLU dispatch,
    ops/kernels/moe_swiglu_gmm.py) — serving admission / T2I context seeding.

    DIFFERENCED chained timing (round 5b): per-call RTT on the current host is
    ~26 ms and pipelines with device work, so (t(2R)-t(R))/R is the only
    per-call-cost-free estimator; bench_fn's identical-args loop both includes
    RTT and can let queued work escape its final sync."""
    from mingunivision_tpu.config import BailingMoeConfig
    from mingunivision_tpu.models.bailing_moe import LLMCache, bailing_forward, init_bailing_moe_params
    from mingunivision_tpu.utils.profiling import force_sync
    from mingunivision_tpu.utils.quantize import random_quantized_like

    cfg = BailingMoeConfig(num_hidden_layers=28)
    shapes = jax.eval_shape(lambda k: init_bailing_moe_params(k, cfg, dtype=jnp.bfloat16), jax.random.PRNGKey(0))
    params = random_quantized_like(jax.random.PRNGKey(3), shapes, bits=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, T, cfg.hidden_size), jnp.bfloat16)
    mask = jnp.ones((1, T), bool)

    def build(n):
        @jax.jit
        def pf(p, xx):
            acc = jnp.float32(0)
            for _ in range(n):
                cache = LLMCache.create(cfg, 1, T, jnp.bfloat16)
                h, _ = bailing_forward(p, cfg, xx, cache, mask)
                acc = acc + jnp.sum(h[:, -1]).astype(jnp.float32)
                xx = xx + (acc * 1e-20).astype(xx.dtype)
            return acc

        return pf

    r1, r2 = build(2), build(4)
    force_sync(r1(params, x))
    force_sync(r2(params, x))
    b1 = b2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        force_sync(r1(params, x))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        force_sync(r2(params, x))
        b2 = min(b2, time.perf_counter() - t0)
    t = max(b2 - b1, 1e-9) / 2
    return round(T / t)


def bench_understanding(layers: int = 28, bits: int = 4, decode_tokens: int = 128, iters: int = 2):
    """End-to-end image UNDERSTANDING latency (BASELINE config #3, the
    test_infer_unified image->answer path): MingTok-encode one 512px image
    (1024 patches), project into the LLM, prefill the [text + 1024 image
    tokens] prompt, then greedy-decode `decode_tokens` answer tokens.

    Returns (total_ms, prefill_ms_chained, decode_tok_s, prefill_ms_unchained)."""
    from mingunivision_tpu.config import BailingMoeConfig, MingUniVisionConfig
    from mingunivision_tpu.engine.generate import decode_text, init_linear_proj_params, linear_proj_apply, prefill
    from mingunivision_tpu.models.bailing_moe import LLMCache, embed_tokens, init_bailing_moe_params
    from mingunivision_tpu.models.mingtok import init_mingtok_params, mingtok_encode
    from mingunivision_tpu.utils.profiling import force_sync
    from mingunivision_tpu.utils.quantize import random_quantized_like

    llm_cfg = BailingMoeConfig(num_hidden_layers=layers)
    mm = MingUniVisionConfig(llm=llm_cfg)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    dtype = jnp.bfloat16
    llm_shapes = jax.eval_shape(lambda k: init_bailing_moe_params(k, llm_cfg, dtype=dtype), ks[0])
    params = {
        "llm": random_quantized_like(ks[0], llm_shapes, bits=bits) if bits < 16 else init_bailing_moe_params(ks[0], llm_cfg, dtype=dtype),
        "mingtok": init_mingtok_params(ks[1], mm.mingtok, dtype=dtype),
        "linear_proj": init_linear_proj_params(ks[2], mm.mingtok.feature_dim, llm_cfg.hidden_size, mm.mlp_depth, dtype=dtype),
    }
    img = jax.random.normal(ks[3], (1, 3, 512, 512), jnp.float32)
    n_text = 32  # prompt text around the image (chat scaffold + question)
    text_ids = jnp.arange(n_text, dtype=jnp.int32)[None, :] % 1000
    Smax = 1280  # 32 text + 1024 image + margin, rounded to a bucket
    T = n_text + 1024

    @jax.jit
    def encode_and_prefill(p, img, text_ids, cache, mask):
        feats = mingtok_encode(p["mingtok"], mm.mingtok, img)["x_norm_patchtokens"]  # (1, 1024, f)
        img_emb = linear_proj_apply(p["linear_proj"], feats.astype(jnp.float32)).astype(dtype)
        txt_emb = embed_tokens(p["llm"], text_ids).astype(dtype)
        embeds = jnp.concatenate([txt_emb, img_emb], axis=1)
        return prefill(p["llm"], llm_cfg, embeds, cache, mask)

    def fresh():
        c = LLMCache.create(llm_cfg, 1, Smax, dtype)
        m = jnp.zeros((1, Smax), bool).at[:, :T].set(True)
        return c, m

    def run(seed):
        cache, mask = fresh()
        logits, cache = encode_and_prefill(params, img, text_ids, cache, mask)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[0]
        res = decode_text(
            params["llm"], llm_cfg, tok, cache, mask, jax.random.PRNGKey(seed),
            max_steps=decode_tokens, do_sample=False,
        )
        return logits, res

    # prefill-only timing, CHAINED INSIDE ONE JIT (the repo's x4-in-jit rule,
    # CLAUDE.md: per-call dispatch overhead on axon scales with the param-tree
    # leaf count and a single un-chained call of a jit holding the full 28-layer
    # int4 tree reads 100s of ms of marshaling, not compute — the BENCH_r04
    # understanding_prefill_ms=540.6 artifact, VERDICT r5 task 6)
    K = 4

    @jax.jit
    def prefill_chain(p, img, text_ids):
        acc = jnp.float32(0)
        im = img
        for _ in range(K):
            cache = LLMCache.create(llm_cfg, 1, Smax, dtype)
            mask = jnp.zeros((1, Smax), bool).at[:, :T].set(True)
            logits, _ = encode_and_prefill(p, im, text_ids, cache, mask)
            acc = acc + jnp.sum(logits).astype(jnp.float32)
            im = img + (acc * 1e-20).astype(img.dtype)  # serialize the chain
        return acc

    logits, res = run(0)  # compile the e2e path
    force_sync(res.tokens)
    force_sync(prefill_chain(params, img, text_ids))  # compile the chain
    t0 = time.perf_counter()
    force_sync(prefill_chain(params, img, text_ids))
    prefill_ms = (time.perf_counter() - t0) / K * 1e3
    # unchained single call kept as a dispatch-artifact diagnostic: the gap to
    # prefill_ms is per-call marshaling, not compute
    cache, mask = fresh()
    force_sync(cache.k)
    t0 = time.perf_counter()
    out = encode_and_prefill(params, img, text_ids, cache, mask)
    force_sync(out[0])
    prefill_unchained_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    for i in range(iters):
        logits, res = run(i)
    force_sync(res.tokens)
    total_ms = (time.perf_counter() - t0) / iters * 1e3
    # decode throughput: e2e loop minus the measured UNCHAINED prefill share
    # (the e2e's own prefill call pays the same per-call marshaling)
    decode_tok_s = decode_tokens / max(total_ms - prefill_unchained_ms, 1e-6) * 1e3
    return round(total_ms, 1), round(prefill_ms, 1), round(decode_tok_s, 1), round(prefill_unchained_ms, 1)


def _maybe_quant_semdec(mt, semdec_bits: int):
    """Optional quantized semantic decoder for the full-quantized T2I tier
    (round 5b: int8 semdec saves ~0.3 ms/token of the ~1.0 ms in-loop semdec
    weight stream; recorded as an extra tier until the quality bench bounds
    its feature error)."""
    if semdec_bits >= 16:
        return mt
    from mingunivision_tpu.utils.quantize import quantize_tree

    mt = dict(mt)
    mt["semantic_decoder"] = jax.jit(lambda p: quantize_tree(p, bits=semdec_bits))(
        mt["semantic_decoder"]
    )
    return mt


def bench_t2i_per_token(layers: int = 28, tokens: int = 8, iters: int = 2, bits: int = 8, rf_bits: int = 8, n_images: int = 1, semdec_bits: int = 16):
    """Full-size T2I AR loop per-token cost (fits 28 layers on one v5e chip);
    n_images > 1 measures the BLOCK-major batched loop (3*n CFG rows, guided —
    tests/test_cfg_parity.py pins parity with the single-image path). Returns
    ms per AR token (per batch step, not per image). See benchmarks/bench_t2i.py
    for the full sweep."""
    from mingunivision_tpu.config import BailingMoeConfig, ImageGenConfig, MingUniVisionConfig
    from mingunivision_tpu.engine.generate import generate_image_tokens, init_linear_proj_params
    from mingunivision_tpu.models.bailing_moe import LLMCache, embed_tokens, init_bailing_moe_params
    from mingunivision_tpu.models.mingtok import init_mingtok_params
    from mingunivision_tpu.models.rf_head import init_rf_head_params, init_vis_head_params
    from mingunivision_tpu.utils.profiling import force_sync
    from mingunivision_tpu.utils.quantize import random_quantized_like

    llm_cfg = BailingMoeConfig(num_hidden_layers=layers)
    mm = MingUniVisionConfig(llm=llm_cfg)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    dtype = jnp.bfloat16
    llm_shapes = jax.eval_shape(lambda k: init_bailing_moe_params(k, llm_cfg, dtype=dtype), ks[0])
    rf_shapes = jax.eval_shape(lambda k: init_rf_head_params(k, mm.rf_head, dtype=dtype), ks[2])
    params = {
        "llm": (
            random_quantized_like(ks[0], llm_shapes, bits=bits)
            if bits < 16
            else init_bailing_moe_params(ks[0], llm_cfg, dtype=dtype)
        ),
        "rf_head": random_quantized_like(ks[2], rf_shapes, bits=rf_bits) if bits < 16 else init_rf_head_params(ks[2], mm.rf_head, dtype=dtype),
        "mingtok": _maybe_quant_semdec(init_mingtok_params(ks[1], mm.mingtok, dtype=dtype), semdec_bits),
        "vis_head": init_vis_head_params(ks[3], llm_cfg.hidden_size, mm.rf_head.z_channels, dtype=dtype),
        "linear_proj": init_linear_proj_params(ks[4], mm.mingtok.feature_dim, llm_cfg.hidden_size, mm.mlp_depth, dtype=dtype),
    }
    # cache sized to the T2I workload: 64 ctx + 256 AR tokens = 320 positions
    # -> the 384 bucket (r5b: the 512 bucket cost ~0.8 ms/token of KV-cache
    # attention traffic; prompt contexts longer than ~128 tokens spill into a
    # larger bucket — that's a different serving config, not this metric's
    # workload).
    Smax = 384
    R = 3 * n_images
    cache = LLMCache.create(llm_cfg, R, Smax, dtype)
    cache = LLMCache(cache.k, cache.v, jnp.int32(64))
    masks = jnp.zeros((R, Smax), bool).at[:, :64].set(True)
    start_embed = embed_tokens(params["llm"], jnp.asarray([[1]])).astype(dtype)
    igen = ImageGenConfig(num_image_tokens=tokens)

    def run(cache_in, k):
        return generate_image_tokens(
            params, llm_cfg, mm.mingtok, mm.rf_head, igen, start_embed, cache_in, masks, k,
            cfg_rows=3, n_images=n_images,
        ).sem_tokens

    def fresh():
        return LLMCache(cache.k + 0, cache.v + 0, cache.length + 0)

    out = run(fresh(), jax.random.PRNGKey(1))
    force_sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(fresh(), jax.random.PRNGKey(i))
    force_sync(out)
    dt = (time.perf_counter() - t0) / iters
    return dt / tokens * 1e3  # ms/token


if __name__ == "__main__":
    # JAX_PLATFORMS='' auto-pick silently falls back to host CPU when the axon
    # claim is not ready — a CPU number would be recorded as a TPU result.
    # If the TPU is unreachable, still honor the one-JSON-line contract with a
    # zero value + explicit error rather than dying lineless. The claim can
    # also HANG indefinitely (observed when the remote grant is wedged), so a
    # watchdog emits the line and exits if discovery doesn't finish in 15 min
    # (fresh claims after a lease release legitimately take ~8 min).
    import threading

    _claim_timeout = float(os.environ.get("BENCH_CLAIM_TIMEOUT_S", "900"))

    def _claim_watchdog():
        print(
            json.dumps(
                {
                    "metric": "mingtok_512px_encode_decode_throughput",
                    "value": 0.0,
                    "unit": "images/sec/chip",
                    "vs_baseline": 0.0,
                    "extra": {"error": f"TPU claim hung >{_claim_timeout:.0f}s (axon grant wedged); refusing to block the driver"},
                }
            ),
            flush=True,
        )
        os._exit(2)

    _wd = threading.Timer(_claim_timeout, _claim_watchdog)
    _wd.daemon = True
    _wd.start()
    try:
        _backend = jax.default_backend()
    except Exception as e:  # noqa: BLE001 — axon init can raise UNAVAILABLE
        _backend = f"init-error: {e}"
    _wd.cancel()
    if _backend != "tpu":
        import sys

        print(
            json.dumps(
                {
                    "metric": "mingtok_512px_encode_decode_throughput",
                    "value": 0.0,
                    "unit": "images/sec/chip",
                    "vs_baseline": 0.0,
                    "extra": {"error": f"TPU backend unavailable ({str(_backend)[:200]}); refusing to record CPU numbers"},
                }
            )
        )
        sys.exit(1)
    # Headline = SERVING tier (pixdec "default": 1-pass bf16 MXU + ViT flash
    # attention; 60.3 dB PSNR vs true fp32 — invisible under the 48.1 dB uint8
    # quantizer; BENCHMARKS "Pixel-decoder precision tiers"). The fp32-class
    # quality tier ("high", = rounds 1-2 configuration) is recorded alongside.
    ips = bench_mingtok_recon(pixdec_precision="default")
    extra = {"pixdec_tier": "default (60.3dB PSNR vs fp32)"}
    try:
        extra["recon_quality_tier_img_s"] = round(bench_mingtok_recon(), 2)
    except Exception as e:  # noqa: BLE001
        extra["recon_quality_tier_error"] = str(e)[:160]
    # T2I tiers, best first: full-depth full-int4 single chip, then the
    # int8-RF quality-margin tier, then the 8-layer bf16 proxy.
    # DIRECT full-length runs (VERDICT r2 #9): 256 AR tokens measured
    # end-to-end, no per-token extrapolation.
    for layers, bits, rf_bits, tag in (
        (28, 4, 4, "int4llm_int4rf_28layer"),
        (28, 4, 8, "int4llm_int8rf_28layer"),
        (8, 16, 16, "bf16_8layer_proxy"),
    ):
        try:
            ms = bench_t2i_per_token(layers=layers, bits=bits, rf_bits=rf_bits, tokens=256, iters=1)
            extra.update(
                t2i_config=tag,
                t2i_measurement="direct_256tok",
                t2i_per_token_ms=round(ms, 2),
                t2i_seconds_per_image_256tok=round(ms * 256 / 1e3, 2),
                t2i_images_per_min=round(60.0 / (ms * 256 / 1e3), 2),
            )
            # batched serving tier: n guided images through ONE block-major
            # loop (re-measured post CFG fix — the round-2 numbers ran the
            # unguided branch and are void)
            try:
                msb = bench_t2i_per_token(layers=layers, bits=bits, rf_bits=rf_bits, tokens=256, iters=1, n_images=8)
                extra["t2i_batched_n8_images_per_min"] = round(8 * 60.0 / (msb * 256 / 1e3), 2)
            except Exception as e:  # noqa: BLE001
                extra["t2i_batched_error"] = str(e)[:160]
            # 16 concurrent = the one-chip HBM ceiling (24 OOMs); weight-read
            # amortization scales 13.5 -> 60 -> 92.5 img/min at 1/8/16
            try:
                msb16 = bench_t2i_per_token(layers=layers, bits=bits, rf_bits=rf_bits, tokens=256, iters=1, n_images=16)
                extra["t2i_batched_n16_images_per_min"] = round(16 * 60.0 / (msb16 * 256 / 1e3), 2)
            except Exception as e:  # noqa: BLE001
                extra["t2i_batched_n16_error"] = str(e)[:160]
            # full-quantized extra tier: + int8 semantic decoder (feature-error
            # bound pending in the quality bench; headline tier stays bf16-semdec)
            try:
                ms8 = bench_t2i_per_token(layers=layers, bits=bits, rf_bits=rf_bits, tokens=256, iters=1, semdec_bits=8)
                extra["t2i_int8semdec_images_per_min"] = round(60.0 / (ms8 * 256 / 1e3), 2)
            except Exception as e:  # noqa: BLE001
                extra["t2i_int8semdec_error"] = str(e)[:160]
            break
        except Exception as e:  # noqa: BLE001 — secondary metric must not kill the primary
            extra["t2i_error"] = str(e)[:160]
    try:
        extra["prefill_int4_28l_tok_s"] = bench_prefill_int4()
    except Exception as e:  # noqa: BLE001
        extra["prefill_error"] = str(e)[:160]
    # e2e image understanding (BASELINE config #3): encode + 1056-token
    # prefill + 128-token greedy decode, one number (VERDICT r3 weak #9)
    try:
        u_total, u_prefill, u_tok_s, u_prefill_unchained = bench_understanding()
        extra["understanding_ms"] = u_total
        extra["understanding_prefill_ms"] = u_prefill  # chained-in-jit (x4 rule)
        extra["understanding_prefill_unchained_ms"] = u_prefill_unchained
        extra["understanding_decode_tok_s"] = u_tok_s
    except Exception as e:  # noqa: BLE001
        extra["understanding_error"] = str(e)[:160]
    print(
        json.dumps(
            {
                "metric": "mingtok_512px_encode_decode_throughput",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / ROUND1_BASELINE_IPS, 2),
                "extra": extra,
            }
        )
    )
