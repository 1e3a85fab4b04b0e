"""Serving-tier benchmark: continuous-batching decode throughput at B slots.

The point of continuous batching (reference: vLLM, ming_lite.patch :2054-2073):
decode is HBM-bandwidth-bound, so co-scheduled requests share each step's
weight reads — tokens/s should scale nearly linearly in batch until compute or
KV-cache reads dominate. Measures `batched_decode_step` at B=1/4/8/16 on the
8-layer on-chip proxy (full model divides weight reads across a v5e-8 mesh).

Usage: python benchmarks/bench_serving.py [--layers 8] [--slots 1 4 8 16]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--slots", type=int, nargs="+", default=[1, 4, 8, 16])
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--bits", type=int, default=16, choices=[4, 8, 16], help="weight tier (4 fits the full 28-layer model on one chip)")
    ap.add_argument("--paged", action="store_true", help="bench the block-paged KV tier (engine/paged.py) instead of the dense pool")
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument(
        "--int-dots",
        action="store_true",
        help="flip moe_stream INT_DOT_STREAM/_INT8: integer-MXU s8 dots in the "
        "decode stream kernel (int8 MXU runs 2x bf16 rate on v5e; the decode "
        "MoE is MXU weight-pass bound at tiny M, so this is the lever for the "
        "560 tok/s bar — same-process A/B vs the convert kernels)",
    )
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", jax.default_backend()
    if args.int_dots:
        import mingunivision_tpu.ops.kernels.moe_stream as _ms

        _ms.INT_DOT_STREAM = True
        _ms.INT_DOT_STREAM_INT8 = True

    from mingunivision_tpu.config import BailingMoeConfig
    from mingunivision_tpu.engine.batch_engine import BatchState, batched_decode_step
    from mingunivision_tpu.models.bailing_moe import init_bailing_moe_params
    from mingunivision_tpu.utils.profiling import bench_fn

    cfg = BailingMoeConfig(num_hidden_layers=args.layers)
    if args.bits == 16:
        params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    else:
        from mingunivision_tpu.utils.quantize import random_quantized_like

        shapes = jax.eval_shape(lambda k: init_bailing_moe_params(k, cfg, dtype=jnp.bfloat16), jax.random.PRNGKey(0))
        params = random_quantized_like(jax.random.PRNGKey(0), shapes, bits=args.bits)
    rng = np.random.default_rng(0)

    if args.paged:
        import time

        from mingunivision_tpu.engine.paged import PagedKVState, paged_decode_step
        from mingunivision_tpu.utils.profiling import force_sync

        page = args.page_size
        maxp = (args.max_len + page - 1) // page
        for B in args.slots:
            num_pages = B * maxp  # every slot fully backed (steady-state upper bound)
            state = PagedKVState.create(cfg, B, num_pages, page, jnp.bfloat16)
            state = state._replace(
                lengths=jnp.full((B,), 128, jnp.int32),
                cur=jnp.asarray(rng.integers(0, cfg.vocab_size, (B,)), jnp.int32),
                active=jnp.ones((B,), bool),
            )
            tables = jnp.asarray(
                np.arange(B * maxp, dtype=np.int32).reshape(B, maxp)
            )  # slot b owns pages [b*maxp, (b+1)*maxp)
            key = jax.random.PRNGKey(1)
            s, toks = paged_decode_step(params, cfg, state, tables, key)  # compile
            force_sync(toks)
            iters = 20
            t0 = time.perf_counter()
            for i in range(iters):
                s, toks = paged_decode_step(params, cfg, s, tables, jax.random.fold_in(key, i))
            force_sync(toks)
            dt = (time.perf_counter() - t0) / iters
            print(
                json.dumps(
                    {
                        "bench": "paged_decode",
                        "slots": B,
                        "layers": args.layers,
                        "bits": args.bits,
                        "page_size": page,
                        "num_pages": num_pages,
                        "step_ms": round(dt * 1e3, 2),
                        "tokens_per_s": round(B / dt, 1),
                    }
                ),
                flush=True,
            )
            del s, state
        return

    for B in args.slots:
        state = BatchState.create(cfg, B, args.max_len, jnp.bfloat16)
        # all slots active mid-sequence
        state = state._replace(
            mask=jnp.zeros((B, args.max_len), bool).at[:, :128].set(True),
            lengths=jnp.full((B,), 128, jnp.int32),
            cur=jnp.asarray(rng.integers(0, cfg.vocab_size, (B,)), jnp.int32),
            active=jnp.ones((B,), bool),
        )

        def run(params, state, key):
            ns, toks = batched_decode_step(params, cfg, state, key)
            return ns, toks

        def fresh():
            return BatchState(state.k + 0, state.v + 0, state.mask, state.lengths, state.cur, state.active)

        # measure steady-state step time (donated state: rebuild per call)
        import time

        from mingunivision_tpu.utils.profiling import force_sync

        s = fresh()
        key = jax.random.PRNGKey(1)
        s, toks = run(params, s, key)  # compile
        force_sync(toks)
        iters = 20
        t0 = time.perf_counter()
        for i in range(iters):
            s, toks = run(params, s, jax.random.fold_in(key, i))
        force_sync(toks)
        dt = (time.perf_counter() - t0) / iters
        print(
            json.dumps(
                {
                    "bench": "batched_decode",
                    "slots": B,
                    "layers": args.layers,
                    "bits": args.bits,
                    "step_ms": round(dt * 1e3, 2),
                    "tokens_per_s": round(B / dt, 1),
                    "tokens_per_s_per_slot": round(1 / dt, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
