"""Training-step throughput on one v5e chip (the reference repo is
inference-only — these numbers cover the training surface we added:
engine/train.py lm/mingtok/image-gen steps; the sharded variants run in
__graft_entry__.dryrun_multichip).

Run: python benchmarks/bench_train.py [--quick]
Prints one JSON line per step kind (log format, not the driver metric).
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import os

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

if "--allow-cpu" in sys.argv:
    # force the host backend BEFORE any device use — under axon the env-var
    # route (JAX_PLATFORMS=cpu) is overridden by sitecustomize (CLAUDE.md),
    # and "allow cpu" would otherwise silently claim the TPU tunnel
    jax.config.update("jax_platforms", "cpu")

from mingunivision_tpu.utils.profiling import bench_carry_fn  # noqa: E402


def report(name, seconds, **extra):
    print(json.dumps({"bench": name, "ms": round(seconds * 1e3, 2), **extra}), flush=True)


def bench_lm_train(layers=1, B=2, T=1024, quick=False):
    """LM train step (fwd+bwd+adamw) at an on-chip proxy depth; tokens/s
    extrapolated to 28 layers scales the LAYER cost only (embed/norm_head are
    depth-independent, so the extrapolation is an upper bound on full cost).
    Depth/batch are HBM-bound on one v5e: 2 layers @ B=2 already exceeds 16 GB
    (bf16 params+adamw moments+grads ~6.6 GB/layer-group + ~2 GB f32 logits)."""
    from mingunivision_tpu.config import BailingMoeConfig
    from mingunivision_tpu.engine.train import TrainState, make_optimizer, make_train_step
    from mingunivision_tpu.models.bailing_moe import init_bailing_moe_params

    if quick:
        from mingunivision_tpu.config import tiny_llm_config

        B, T = 2, 64
        cfg = tiny_llm_config()
        layers = cfg.num_hidden_layers
    else:
        cfg = BailingMoeConfig(num_hidden_layers=layers)
    params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    opt = make_optimizer()
    state = TrainState(params, opt.init(params), jnp.int32(0))
    step = make_train_step(cfg, opt)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.vocab_size)
    mask = jnp.ones((B, T), jnp.int32)

    # the step donates its input state — thread the carry through iterations
    t, _ = bench_carry_fn(step, state, ids, mask, iters=3, warmup=1)
    report(
        "lm_train_step",
        t,
        layers=layers,
        batch=B,
        seq=T,
        tok_per_s=round(B * T / t),
        extrapolated_28l_tok_per_s=round(B * T / (t * 28 / layers)),
    )


def bench_mingtok_train(B=2, quick=False):
    """MingTok joint pretraining step (pixel recon + feature distill),
    fwd+bwd+adamw over the full 3-net tokenizer at 512px."""
    import optax

    from mingunivision_tpu.config import MingTokConfig
    from mingunivision_tpu.engine.train import mingtok_train_loss
    from mingunivision_tpu.models.mingtok import init_mingtok_params

    if quick:
        from mingunivision_tpu.config import tiny_mingtok_config

        B = 1
        cfg = tiny_mingtok_config()
    else:
        cfg = MingTokConfig()
    params = init_mingtok_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)
    S = cfg.encoder.img_size
    n_tok = (S // cfg.encoder.patch_size) ** 2
    imgs = jax.random.normal(jax.random.PRNGKey(1), (B, 3, S, S), jnp.float32)
    teacher = jax.random.normal(jax.random.PRNGKey(2), (B, n_tok, cfg.semantic_decoder.embed_dim), jnp.bfloat16)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(carry, imgs, teacher):
        params, opt_state = carry
        (loss, _), grads = jax.value_and_grad(mingtok_train_loss, has_aux=True)(params, cfg, imgs, teacher)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    t, _ = bench_carry_fn(step, (params, opt_state), imgs, teacher, iters=3, warmup=1)
    report("mingtok_train_step", t, batch=B, img_per_s=round(B / t, 2))


def bench_image_gen_train(layers=2, B=2, T_text=64, quick=False):
    """Teacher-forced image-gen train step (LLM fwd over text+image positions,
    RF velocity loss on every image position, bwd+adamw over all four modules)."""
    from mingunivision_tpu.config import BailingMoeConfig, MingUniVisionConfig
    from mingunivision_tpu.engine.generate import init_linear_proj_params
    from mingunivision_tpu.engine.train import TrainState, make_image_gen_train_step, make_optimizer
    from mingunivision_tpu.models.bailing_moe import init_bailing_moe_params
    from mingunivision_tpu.models.rf_head import init_rf_head_params, init_vis_head_params

    if quick:
        from mingunivision_tpu.config import (
            ImageGenConfig,
            tiny_llm_config,
            tiny_mingtok_config,
            tiny_rf_config,
        )

        B, T_text = 1, 8
        llm_cfg = tiny_llm_config()
        layers = llm_cfg.num_hidden_layers
        mm = MingUniVisionConfig(
            llm=llm_cfg,
            mingtok=tiny_mingtok_config(),
            rf_head=tiny_rf_config(),
            image_gen=ImageGenConfig(num_image_tokens=4),
        )
    else:
        llm_cfg = BailingMoeConfig(num_hidden_layers=layers)
        mm = MingUniVisionConfig(llm=llm_cfg)
    n_img = mm.image_gen.num_image_tokens
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    params = {
        "llm": init_bailing_moe_params(ks[0], llm_cfg, dtype=jnp.bfloat16),
        "rf_head": init_rf_head_params(ks[1], mm.rf_head, dtype=jnp.bfloat16),
        "vis_head": init_vis_head_params(ks[2], llm_cfg.hidden_size, mm.rf_head.z_channels, dtype=jnp.bfloat16),
        "linear_proj": init_linear_proj_params(ks[3], mm.mingtok.feature_dim, llm_cfg.hidden_size, mm.mlp_depth, dtype=jnp.bfloat16),
    }
    opt = make_optimizer()
    state = TrainState(params, opt.init(params), jnp.int32(0))
    step = make_image_gen_train_step(llm_cfg, mm.rf_head, opt)
    text_ids = jax.random.randint(ks[4], (B, T_text), 0, llm_cfg.vocab_size)
    text_mask = jnp.ones((B, T_text), jnp.int32)
    sem = jax.random.normal(jax.random.PRNGKey(5), (B, n_img, mm.mingtok.feature_dim), jnp.bfloat16)
    lat = jax.random.normal(jax.random.PRNGKey(6), (B, n_img, mm.rf_head.target_channels), jnp.float32)

    t, _ = bench_carry_fn(step, state, text_ids, text_mask, sem, lat, jax.random.PRNGKey(7), iters=3, warmup=1)
    report("image_gen_train_step", t, layers=layers, batch=B, images_per_s=round(B / t, 2))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None)
    ap.add_argument("--allow-cpu", action="store_true")
    args = ap.parse_args()
    if jax.default_backend() != "tpu" and not args.allow_cpu:
        sys.exit(f"refusing to bench on backend={jax.default_backend()!r}; pass --allow-cpu to override")
    benches = {
        "lm": lambda: bench_lm_train(quick=args.quick),
        "mingtok": lambda: bench_mingtok_train(quick=args.quick),
        "imggen": lambda: bench_image_gen_train(quick=args.quick),
    }
    for name, fn in benches.items():
        if args.only and name != args.only:
            continue
        fn()
