"""RF sampler: per-step rf_mlp_stack path vs fused whole-sampler kernel.

Chained-in-jit timing ONLY (CLAUDE.md: per-call dispatch overhead on axon
scales with param-tree leaf count and pipelines with execution — standalone
jit timings of anything holding the RF table are artifacts). K full samples
are chained inside ONE jit; reported ms/sample = total / K.

Params are built ON-DEVICE (random_quantized_like) — device_put of a
host-built int4 table does not stick on axon and re-ships ~432 MB per call.

Usage: python benchmarks/bench_rf_sampler.py [--bits 4] [--chain 4]
Prints JSON lines; results table in BENCHMARKS.md "fused RF sampler".
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4, choices=[4, 8])
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cfg-rows", type=int, default=3)
    ap.add_argument("--sweep-chunk", action="store_true", help="sweep fused-kernel hidden chunk widths")
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", jax.default_backend()

    from mingunivision_tpu.config import RFHeadConfig
    from mingunivision_tpu.models import rf_head
    from mingunivision_tpu.models.rf_head import init_rf_head_params, rf_sample
    from mingunivision_tpu.utils.profiling import force_sync
    from mingunivision_tpu.utils.quantize import random_quantized_like

    cfg = RFHeadConfig()  # real shape: w=3072 d=12 mult=4 steps=16
    B = args.cfg_rows
    key = jax.random.PRNGKey(0)

    shapes = jax.eval_shape(lambda k: init_rf_head_params(k, cfg, dtype=jnp.bfloat16), key)
    build = jax.jit(lambda k: random_quantized_like(k, shapes, bits=args.bits))
    params = build(key)
    force_sync(params)  # sync the on-device build so compile_s below is pure compile

    z = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.z_channels), jnp.bfloat16)

    def one_sample(p, zz, k):
        return rf_sample(
            p, cfg, zz, k, text_cfg=3.0, image_cfg=1.1,
            cfg_renorm_type="channel", time_shifting_factor=1.0, cfg_rows=args.cfg_rows,
        )

    def make_chained(_mode):
        # A FRESH function object per mode: JAX's global jaxpr-trace cache is
        # keyed on the function identity + abstract args and does NOT see the
        # FUSED_SAMPLER module global — reusing one `chained` across modes
        # silently re-serves the first mode's trace (measured: identical
        # timings, rel_l2 0.0, fused_traces 0).
        def chained(p, zz, k):
            acc = jnp.float32(0)
            for i in range(args.chain):
                out = one_sample(p, zz, jax.random.fold_in(k, i))
                acc = acc + jnp.sum(out).astype(jnp.float32)
                zz = zz + (acc * 1e-12).astype(zz.dtype)  # serialize the chain
            return acc

        return chained

    if args.sweep_chunk:
        from mingunivision_tpu.models.rf_head import _time_grid, precompute_modulations
        from mingunivision_tpu.ops.kernels.rf_sampler import rf_sample_fused

        ts, dts = _time_grid(cfg, 1.0)
        C = cfg.target_channels
        noise = jnp.tile(
            jax.random.normal(jax.random.PRNGKey(7), (1, C), jnp.float32), (args.cfg_rows, 1)
        )

        def make_fused(chunk, schedule="block", down_chunk=1024):
            def one(p, zz):
                bm, fm = precompute_modulations(p, cfg, ts, zz)
                return rf_sample_fused(
                    p, cfg, noise, bm, fm, dts, 3.0, 1.1,
                    cfg_rows=args.cfg_rows, renorm_channel=True, chunk=chunk,
                    schedule=schedule, down_chunk=down_chunk,
                )

            def chained(p, zz):
                acc = jnp.float32(0)
                for _ in range(args.chain):
                    out = one(p, zz)
                    acc = acc + jnp.sum(out).astype(jnp.float32)
                    zz = zz + (acc * 1e-12).astype(zz.dtype)
                return acc

            return chained

        configs = [("block", chunk, 0) for chunk in (1024, 2048, 4096, 8192)]
        if args.bits == 4:
            configs += [
                ("pipelined", 2048, 1024),
                ("pipelined", 2048, 512),
                ("pipelined", 4096, 1024),
                ("pipelined", 8192, 2048),
            ]
        for schedule, chunk, dchunk in configs:
            try:
                fn = jax.jit(make_fused(chunk, schedule, dchunk or 1024))
                t0 = time.perf_counter()
                force_sync(fn(params, z))
                compile_s = time.perf_counter() - t0
                best = float("inf")
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    force_sync(fn(params, z))
                    best = min(best, time.perf_counter() - t0)
                ms = 1e3 * best / args.chain
                print(json.dumps({
                    "schedule": schedule, "fused_chunk": chunk, "down_chunk": dchunk,
                    "compile_s": round(compile_s, 1),
                    "ms_per_sample": round(ms, 3),
                    "ms_per_step": round(ms / cfg.num_sampling_steps, 4),
                }), flush=True)
            except Exception as e:  # noqa: BLE001 — e.g. VMEM over budget at chunk 8192
                print(json.dumps({
                    "schedule": schedule, "fused_chunk": chunk, "down_chunk": dchunk,
                    "error": str(e)[:200],
                }), flush=True)
        return

    results = {}
    for mode in ("per_step", "fused"):
        rf_head.FUSED_SAMPLER = mode == "fused"
        traces0 = rf_head._FUSED_TRACES
        fn = jax.jit(make_chained(mode))
        t0 = time.perf_counter()
        force_sync(fn(params, z, jax.random.PRNGKey(2)))
        print(json.dumps({"mode": mode, "compile_s": round(time.perf_counter() - t0, 1)}), flush=True)
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            force_sync(fn(params, z, jax.random.PRNGKey(2)))
            best = min(best, time.perf_counter() - t0)
        ms_sample = 1e3 * best / args.chain
        results[mode] = ms_sample
        fused_traces = rf_head._FUSED_TRACES - traces0
        if mode == "fused" and fused_traces == 0:
            raise SystemExit(
                "fused mode never traced the fused kernel (rf_sampler_supported "
                "gate refused this config) — the comparison would be bogus"
            )
        print(json.dumps({
            "mode": mode, "bits": args.bits, "chain": args.chain,
            "ms_per_sample": round(ms_sample, 3),
            "ms_per_step": round(ms_sample / cfg.num_sampling_steps, 4),
            "fused_traces": fused_traces,
        }), flush=True)

    # numerics: one sample each path, on-device rel-L2 (scalar fetch only)
    rf_head.FUSED_SAMPLER = False
    ref = jax.jit(lambda p, zz, k: one_sample(p, zz, k))(params, z, jax.random.PRNGKey(3))
    rf_head.FUSED_SAMPLER = True
    got = jax.jit(lambda p, zz, k: one_sample(p, zz, k))(params, z, jax.random.PRNGKey(3))
    rel = jnp.linalg.norm((got - ref).astype(jnp.float32)) / (
        jnp.linalg.norm(ref.astype(jnp.float32)) + 1e-30
    )
    print(json.dumps({
        "numerics_rel_l2": float(rel),
        "speedup_fused": round(results["per_step"] / results["fused"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
