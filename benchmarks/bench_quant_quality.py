"""End-to-end quantization QUALITY bound for the headline int4 T2I tier
(VERDICT r3 weak #6): the same synthetic bf16 weights are quantized to
int4-linear (the integer-MXU serving tier) and int4-NF4 (the reference's exact
bnb numerics, mingunivisioninfer.py:47-56), and all three engines run the SAME
image generation (same start embeds, same RNG keys, greedy semantic rollout).

Measured per engine pair:
  - sem cosine / rel-L2 between the generated semantic-token trajectories
    (the AR loop's own outputs — LLM + vis_head + 16-step RF sampler)
  - pixel PSNR between the decoded images (both decoded through the SAME bf16
    MingTok pixel decoder, so the delta isolates the quantized LLM+RF stack)

No released checkpoint exists in this image, so weights are synthetic
(N(0, 0.02) — the regime NF4's codebook is optimized for); the resulting bound
is a property of the ARCHITECTURE + quantizer, not of one checkpoint.

Usage: python benchmarks/bench_quant_quality.py [--layers 28] [--tokens 64]
Prints JSON lines; the summary table lives in BENCHMARKS.md "int4 quality".
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

# Platform selection must beat the axon sitecustomize: set the env BEFORE
# importing jax (conftest.py pattern) — a post-import config update alone
# left a --cpu run on the TPU backend once (it claimed the chip and wedged a
# concurrent TPU client).
if "--cpu" in sys.argv or "--cpu-tiny" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv or "--cpu-tiny" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    from __graft_entry__ import _setup_compile_cache

    _setup_compile_cache()  # host-fingerprinted CPU cache dir (CLAUDE.md)
else:
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu-tiny", action="store_true", help="tiny CPU smoke config")
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend at REAL width (all engines share one "
        "backend; used for the NF4 tier, whose XLA-dequant decode graph "
        "reproducibly crashes the axon TPU worker)",
    )
    ap.add_argument(
        "--tiers",
        nargs="+",
        default=["bf16", "int4_linear", "int4_nf4"],
        choices=["bf16", "int4_linear", "int4_nf4"],
        help="which engines to run (28L bf16 does not fit one v5e's HBM — "
        "run the int4 pair at 28L and all three at --layers 6)",
    )
    ap.add_argument(
        "--save-dir",
        default=None,
        help="npz cache per tier: lets each tier run in its OWN process (the "
        "bf16 base + quantize temps together overflow one chip's HBM even at "
        "4 layers); tiers with an existing npz are loaded, not re-run, and "
        "pairs compare across processes",
    )
    ap.add_argument(
        "--materialize-dequant",
        action="store_true",
        help="after quantizing, replace each QuantizedArray leaf with its "
        "dequantized fp array and run the BASE engine on those weights. "
        "Numerically this is the same function the (CPU/XLA) quantized engine "
        "computes — x @ dequant(W) with dequant(quantize(W)) weights — so the "
        "quality pairs are unchanged, but the NF4 leg drops its per-use "
        "16-entry-codebook gather (5x runtime on the 1-core host)",
    )
    ap.add_argument("--min-size", type=int, default=None,
                    help="quantize_tree min leaf size (default: library default; "
                         "--cpu-tiny forces 128 so tiny weights actually quantize)")
    args = ap.parse_args()

    # Force the platform BEFORE importing the package: the import chain can
    # initialize the backend (observed: a --cpu run claimed the axon TPU and
    # wedged a concurrent TPU client), after which jax_platforms is ignored.
    if args.cpu or args.cpu_tiny:
        jax.config.update("jax_platforms", "cpu")

    from mingunivision_tpu.config import (
        BailingMoeConfig,
        ImageGenConfig,
        MingUniVisionConfig,
        tiny_llm_config,
        tiny_mingtok_config,
        tiny_rf_config,
    )
    from mingunivision_tpu.engine.generate import generate_image_tokens, init_linear_proj_params
    from mingunivision_tpu.models.bailing_moe import LLMCache, embed_tokens, init_bailing_moe_params
    from mingunivision_tpu.models.mingtok import init_mingtok_params, mingtok_pixel_decoder
    from mingunivision_tpu.models.rf_head import init_rf_head_params, init_vis_head_params
    from mingunivision_tpu.utils.quantize import quantize_tree

    if args.cpu or args.cpu_tiny:
        assert jax.default_backend() == "cpu", jax.default_backend()
    if args.cpu_tiny:
        llm_cfg = tiny_llm_config()
        mm = MingUniVisionConfig(mingtok=tiny_mingtok_config(), llm=llm_cfg, rf_head=tiny_rf_config(), mlp_depth=2)
        if args.min_size is None:
            args.min_size = 128  # tiny weights are all < default 64K threshold
    else:
        llm_cfg = BailingMoeConfig(num_hidden_layers=args.layers)
        mm = MingUniVisionConfig(llm=llm_cfg)
    # CPU legs run fp32: this host's XLA:CPU DotThunk rejects bf16 x bf16 -> f32
    # dots outright, and the table isolates QUANTIZATION error (quantized tiers
    # are compared against the same-process base tier either way).
    dtype = jnp.float32 if (args.cpu or args.cpu_tiny) else jnp.bfloat16

    def build_base():
        ks = jax.random.split(jax.random.PRNGKey(args.seed), 5)
        b = {
            "llm": init_bailing_moe_params(ks[0], llm_cfg, dtype=dtype),
            "mingtok": init_mingtok_params(ks[1], mm.mingtok, dtype=dtype),
            "rf_head": init_rf_head_params(ks[2], mm.rf_head, dtype=dtype),
            "vis_head": init_vis_head_params(ks[3], llm_cfg.hidden_size, mm.rf_head.z_channels, dtype=dtype),
            "linear_proj": init_linear_proj_params(ks[4], mm.mingtok.feature_dim, llm_cfg.hidden_size, mm.mlp_depth, dtype=dtype),
        }
        b["rf_head"] = _denoise_zero_init(b["rf_head"], jax.random.PRNGKey(args.seed + 7))
        return b

    # CRITICAL: init_rf_head_params is reference-faithful DiT ZERO-INIT
    # (AdaLN-zero gates + zero final layer), so a fresh RF head outputs an
    # EXACTLY-ZERO velocity field for any input — latents degenerate to pure
    # noise, identical across tiers, and the whole bench reads vacuously
    # bit-identical (the round-4 "126 dB for every pair" artifact). Perturb
    # every RF-head leaf so the sampler integrates a real field.
    def _denoise_zero_init(tree, key):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        keys = jax.random.split(key, len(leaves))
        out = [
            l + (0.02 * jax.random.normal(k, l.shape, jnp.float32)).astype(l.dtype)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
            else l
            for l, k in zip(leaves, keys)
        ]
        return jax.tree_util.tree_unflatten(treedef, out)

    state = {"base": build_base(), "consumed": False}
    base = state["base"]

    qkw = {} if args.min_size is None else {"min_size": args.min_size}

    def materialize(tree):
        from mingunivision_tpu.utils.quantize import QuantizedArray, dequant_weight

        def leaf(x):
            if isinstance(x, QuantizedArray):
                return dequant_weight(x, jnp.float32 if args.cpu or args.cpu_tiny else jnp.bfloat16)
            return x

        return jax.tree_util.tree_map(leaf, tree, is_leaf=lambda x: isinstance(x, QuantizedArray))

    def tier(scheme):
        if args.save_dir:
            # destructive leaf-streaming quantize (the non-destructive path's
            # peak — bf16 base + full int4 copy + fp32 temps — OOMs one chip
            # even at 4 layers). base is seed-reproducible: rebuild it when a
            # previous tier consumed it.
            from mingunivision_tpu.utils.quantize import quantize_tree_inplace

            if state["consumed"]:
                state["base"] = build_base()
            b = state["base"]
            state["consumed"] = True
            p = dict(b)
            p["llm"] = quantize_tree_inplace(b["llm"], bits=4, scheme=scheme, **qkw)
            p["rf_head"] = quantize_tree_inplace(b["rf_head"], bits=4, scheme=scheme, **qkw)
            if args.materialize_dequant:
                p["llm"] = materialize(p["llm"])
                p["rf_head"] = materialize(p["rf_head"])
            return p
        p = dict(base)
        p["llm"] = quantize_tree(base["llm"], bits=4, scheme=scheme, **qkw)
        p["rf_head"] = quantize_tree(base["rf_head"], bits=4, scheme=scheme, **qkw)
        if args.materialize_dequant:
            p["llm"] = materialize(p["llm"])
            p["rf_head"] = materialize(p["rf_head"])
        return p

    igen = ImageGenConfig(num_image_tokens=args.tokens)
    Smax = 512
    start = embed_tokens(base["llm"], jnp.asarray([[1]])).astype(dtype)

    def run(p):
        cache = LLMCache.create(llm_cfg, 3, Smax, dtype)
        cache = LLMCache(cache.k, cache.v, jnp.int32(16))
        masks = jnp.zeros((3, Smax), bool).at[:, :16].set(True)
        res = generate_image_tokens(
            p, llm_cfg, mm.mingtok, mm.rf_head, igen, start, cache, masks,
            jax.random.PRNGKey(args.seed + 1), cfg_rows=3,
        )
        sem = np.asarray(res.sem_tokens, np.float32)  # (n_img, N, feat)
        img = np.asarray(
            mingtok_pixel_decoder(base["mingtok"], mm.mingtok, jnp.asarray(sem, jnp.float32)),
            np.float32,
        )
        return sem, img

    t0 = time.time()
    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "base_dtype": jnp.dtype(dtype).name,
                "layers": llm_cfg.num_hidden_layers,
                "tokens": args.tokens,
            }
        ),
        flush=True,
    )
    results = {}
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        for name in ("bf16", "int4_linear", "int4_nf4"):
            f = os.path.join(args.save_dir, f"{name}.npz")
            if os.path.exists(f):
                z = np.load(f)
                results[name] = (z["sem"], z["img"])
                print(json.dumps({"tier": name, "loaded": True}), flush=True)
    # Tiers are built LAZILY and freed after each run: full-width bf16 + two
    # int4 copies do not coexist in one v5e's 16 GB HBM (bf16 16B alone does
    # not fit at 28L — run with --layers <= 6 for the bf16 leg on one chip).
    for name, mk in (("bf16", lambda: base), ("int4_linear", lambda: tier("linear")), ("int4_nf4", lambda: tier("nf4"))):
        if name not in args.tiers or name in results:
            continue
        p = mk()
        results[name] = run(p)
        del p
        if args.save_dir:
            np.savez(os.path.join(args.save_dir, f"{name}.npz"), sem=results[name][0], img=results[name][1])
        print(json.dumps({"tier": name, "elapsed_s": round(time.time() - t0, 1)}), flush=True)

    def compare(a, b):
        sa, ia = results[a]
        sb, ib = results[b]
        cos = float(np.sum(sa * sb) / (np.linalg.norm(sa) * np.linalg.norm(sb) + 1e-9))
        rel = float(np.linalg.norm(sb - sa) / (np.linalg.norm(sa) + 1e-9))
        mse = float(((ia - ib) ** 2).mean())
        psnr = float(10 * np.log10(4.0 / max(mse, 1e-12)))  # [-1,1] range -> peak 2
        return {"pair": f"{a}_vs_{b}", "sem_cosine": round(cos, 4), "sem_rel_l2": round(rel, 4), "pixel_psnr_db": round(psnr, 2)}

    for pair in (("bf16", "int4_linear"), ("bf16", "int4_nf4"), ("int4_nf4", "int4_linear")):
        if pair[0] in results and pair[1] in results:
            print(json.dumps(compare(*pair)), flush=True)


if __name__ == "__main__":
    main()
