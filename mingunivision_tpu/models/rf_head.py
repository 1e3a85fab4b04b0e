"""Rectified-flow head: AdaLN SwiGLU-MLP velocity field + Euler ODE sampler.

Parity map against reference mingunivision/diff_loss_rf_swiglu.py:
  - SimpleMLPAdaLN: input_proj, cond = time_embed(t*1000) + cond_embed(z),
    12 x ResBlock(AdaLN shift/scale/gate over SwiGLUFFNFused), FinalLayer
    AdaLN-zero (:295-385).
  - TimestepEmbedder: sinusoidal [cos, sin] table + 2-layer SiLU MLP (:188-239).
  - sample(): Euler from shared noise (same noise row tiled across the CFG batch
    when text_cfg != 1, :117-121), 16 steps, per-step 3-way guidance
    v = v_u + icfg*(v_tu - v_u) + tcfg*(v_c - v_tu) (:148-149), optional channel
    cfg-renorm (:151-156) and time-shifted schedule (:127-134), x += v*dt (:175-179).

TPU-first: the whole sampler is a `lax.fori_loop` over steps inside jit; the CFG
batch is one batched net eval (the reference evaluates the net on a 3-row batch
too, but through Python-loop scheduling).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from mingunivision_tpu.config import RFHeadConfig
from mingunivision_tpu.ops.activations import swiglu, swiglu_hidden_dim
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.norms import layer_norm
from mingunivision_tpu.utils.init import linear_init, zeros_linear_init


def init_rf_head_params(key, cfg: RFHeadConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    w = cfg.width
    hidden = swiglu_hidden_dim(w * cfg.mlp_mult)

    def block_init(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "in_ln": {"w": jnp.ones((w,), dtype), "b": jnp.zeros((w,), dtype)},
            "mlp": {
                "w12": linear_init(k1, w, 2 * hidden, dtype=dtype),
                "w3": linear_init(k2, hidden, w, dtype=dtype),
            },
            # AdaLN-zero init (reference :352-355)
            "adaLN": zeros_linear_init(w, 3 * w, dtype=dtype),
        }

    blocks = jax.vmap(block_init)(jax.random.split(ks[0], cfg.depth))
    return {
        "time_embed": {
            "fc1": linear_init(ks[1], cfg.freq_embed_size, w, dtype=dtype),
            "fc2": linear_init(ks[2], w, w, dtype=dtype),
        },
        "cond_embed": linear_init(ks[3], cfg.z_channels, w, dtype=dtype),
        "input_proj": linear_init(ks[4], cfg.target_channels, w, dtype=dtype),
        "res_blocks": blocks,
        "final_layer": {
            "adaLN": zeros_linear_init(w, 2 * w, dtype=dtype),
            "linear": zeros_linear_init(w, cfg.target_channels, dtype=dtype),
        },
    }


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, [cos, sin] order (reference :216-234). t: (B,)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _modulate(x, shift, scale):
    return x * (1 + scale) + shift


def _cond_embedding(params, cfg: RFHeadConfig, t, z):
    """y = time_embed(t*1000) + cond_embed(z); t: (..., B), z: (B, z)."""
    temb = timestep_embedding(t * 1000.0, cfg.freq_embed_size).astype(z.dtype)
    temb = dense(
        jax.nn.silu(dense(temb, params["time_embed"]["fc1"]).astype(jnp.float32)).astype(z.dtype),
        params["time_embed"]["fc2"],
    )
    return temb + dense(z, params["cond_embed"])


def precompute_modulations(params, cfg: RFHeadConfig, ts, z):
    """AdaLN modulations for EVERY ODE step in one pass.

    The modulations depend only on (t, z) — not on x — so the adaLN weight
    matrices (~27% of the net's per-eval HBM traffic) can be read ONCE per token
    instead of once per Euler step.

    ts: (S,); z: (B, z). Returns (block_mods (depth, S, B, 3w), final_mods (S, B, 2w)).
    """
    S = ts.shape[0]
    B = z.shape[0]
    y = jax.vmap(lambda t: _cond_embedding(params, cfg, jnp.full((B,), t, jnp.float32), z))(ts)  # (S, B, w)
    sy = jax.nn.silu(y.astype(jnp.float32)).astype(z.dtype).reshape(S * B, -1)

    def per_block(blk):
        return dense(sy, blk["adaLN"]).reshape(S, B, -1)

    block_mods = jax.vmap(per_block)(params["res_blocks"])  # (depth, S, B, 3w)
    final_mods = dense(sy, params["final_layer"]["adaLN"]).reshape(S, B, -1)
    return block_mods, final_mods


def rf_net_apply_premod(params, cfg: RFHeadConfig, x, block_mods_i, final_mods_i):
    """Velocity field with precomputed per-step modulations.

    x: (B, C); block_mods_i: (depth, B, 3w); final_mods_i: (B, 2w).

    int8-quantized res_blocks on TPU take the fused Pallas MLP-stack kernel
    (one call per Euler step; int8 weights cross HBM once, scales/biases and
    the AdaLN modulate/residual applied in-register)."""
    h = dense(x, params["input_proj"])

    from mingunivision_tpu.ops.kernels.rf_mlp import rf_mlp_stack, rf_mlp_supported

    if _params_on_tpu(params) and rf_mlp_supported(params["res_blocks"]):
        h = rf_mlp_stack(params["res_blocks"], h, block_mods_i, ln_eps=cfg.ln_eps)
    else:
        def body(carry, inp):
            hx = carry
            blk, mod = inp
            shift, scale, gate = jnp.split(mod.astype(hx.dtype), 3, axis=-1)
            hh = _modulate(layer_norm(hx, blk["in_ln"]["w"], blk["in_ln"]["b"], eps=cfg.ln_eps), shift, scale)
            hh = dense(swiglu(dense(hh, blk["mlp"]["w12"])), blk["mlp"]["w3"])
            return hx + gate * hh, None

        h, _ = lax.scan(body, h, (params["res_blocks"], block_mods_i))
    shift, scale = jnp.split(final_mods_i.astype(h.dtype), 2, axis=-1)
    h = _modulate(layer_norm(h, eps=cfg.ln_eps), shift, scale)
    return dense(h, params["final_layer"]["linear"])


def rf_net_apply(params, cfg: RFHeadConfig, x, t, z):
    """Velocity field. x: (B, C_target), t: (B,), z: (B, z_channels)."""
    y = _cond_embedding(params, cfg, t, z)
    h = dense(x, params["input_proj"])

    def body(carry, blk):
        hx = carry
        mod = dense(jax.nn.silu(y.astype(jnp.float32)).astype(hx.dtype), blk["adaLN"])
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        hh = _modulate(layer_norm(hx, blk["in_ln"]["w"], blk["in_ln"]["b"], eps=cfg.ln_eps), shift, scale)
        hh = dense(swiglu(dense(hh, blk["mlp"]["w12"])), blk["mlp"]["w3"])
        return hx + gate * hh, None

    h, _ = lax.scan(body, h, params["res_blocks"])

    fl = params["final_layer"]
    mod = dense(jax.nn.silu(y.astype(jnp.float32)).astype(h.dtype), fl["adaLN"])
    shift, scale = jnp.split(mod, 2, axis=-1)
    h = _modulate(layer_norm(h, eps=cfg.ln_eps), shift, scale)
    return dense(h, fl["linear"])


def _time_grid(cfg: RFHeadConfig, time_shifting_factor: Optional[float]):
    steps = cfg.num_sampling_steps
    if time_shifting_factor:
        a = float(time_shifting_factor)
        ts = jnp.linspace(0.0, 1.0, steps + 1)
        ts = ts / (ts + a - a * ts)
        ts = 1.0 - ts
        dt = ts[:-1] - ts[1:]
        return ts[:-1], dt
    ts = jnp.linspace(1.0, 0.0, steps + 1)[:-1]
    dt = jnp.full((steps,), 1.0 / steps)
    return ts, dt


# Whole-sample fused kernel (see rf_sample). DEFAULT ON since round 5: the
# fixed chained bench (bench_rf_sampler, ADVICE r4 #4 — the round-4 "far
# slower" reading was its broken measurement) shows fused 17.51 ms/sample vs
# per-step 18.46 at the real int4 shape (block schedule, chunk 4096;
# pipelined down-proj streaming measured SLOWER — the kernel is MXU-bound at
# M=8 rows, not DMA-schedule-bound).
FUSED_SAMPLER = True
_FUSED_TRACES = 0  # incremented at trace time when the fused branch is taken


def _params_on_tpu(params) -> bool:
    """True when the sampler will EXECUTE on TPU — gates the Pallas fused path.

    `jax.default_backend()` alone is wrong: a TPU-backend process holding
    CPU-resident params (e.g. under `jax.default_device(cpu)` for an oracle
    run) would lower the pallas_call for CPU and fail. Committed arrays carry
    their placement; traced values (inside jit) fall back to the backend the
    trace is being staged for, which default_backend approximates."""
    for leaf in jax.tree_util.tree_leaves(params):
        if isinstance(leaf, jax.Array) and not isinstance(leaf, jax.core.Tracer):
            try:
                return next(iter(leaf.devices())).platform == "tpu"
            except Exception:  # noqa: BLE001 — fall through to backend probe
                break
    return jax.default_backend() == "tpu"


def rf_sample(
    params,
    cfg: RFHeadConfig,
    z,
    key,
    *,
    temperature: float = 1.0,
    text_cfg: float = 1.0,
    image_cfg: float = 1.0,
    cfg_renorm_type: Optional[str] = None,
    time_shifting_factor: Optional[float] = None,
    noise=None,
    cfg_rows: Optional[int] = None,
):
    """Euler-ODE sampling of a continuous latent conditioned on z.

    z: (B, z_channels). For the CFG path, B = cfg_rows * n_images laid out
    BLOCK-major — [conds 0..n, unconds 0..n(, text_unconds 0..n)] — matching the
    reference's [cond, uncond(, text_uncond)] rows at n=1 (reference :144-171
    branches on b_num). Each image's shared noise row is tiled across its CFG
    rows (:117-121). `cfg_rows` is the guidance structure (1, 2, or 3); when
    None it is inferred from B for backward compat (B in (2, 3) -> that many
    rows, else unguided) — batched callers MUST pass it explicitly, since
    B = 3*n_images > 3 is indistinguishable from an unguided batch.
    text_cfg/image_cfg may be python floats OR traced scalars (cfg schedules) —
    the branch structure is static, the values aren't.

    Returns (B, target_channels) — every row holds its image's guided sample.
    """
    B = z.shape[0]
    dtype = z.dtype
    if cfg_rows is None:
        cfg_rows = B if B in (2, 3) else 1
    if B % cfg_rows != 0:
        raise ValueError(f"batch {B} not divisible by cfg_rows {cfg_rows}")
    n_img = B // cfg_rows
    if noise is None:
        # One noise row per IMAGE, tiled block-major across that image's CFG
        # rows. Keys are fold_in(key, image_index) so image i's noise does not
        # depend on n_img: batched image 0 is bit-identical to a single-image
        # run with the same key (the batched<->single parity tests rely on it).
        img_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_img))
        noise = jax.vmap(lambda k: jax.random.normal(k, (cfg.target_channels,), jnp.float32))(img_keys)
        noise = jnp.tile(noise, (cfg_rows, 1)) * temperature
    else:
        noise = jnp.asarray(noise, jnp.float32)
        if noise.shape[0] != B:
            if B % noise.shape[0] != 0:
                raise ValueError(f"noise rows {noise.shape[0]} don't tile batch {B}")
            noise = jnp.tile(noise, (B // noise.shape[0], 1))
        noise = noise * temperature

    ts, dts = _time_grid(cfg, time_shifting_factor)
    # all Euler steps' AdaLN modulations in one pass (adaLN weights read once)
    block_mods, final_mods = precompute_modulations(params, cfg, ts, z)

    # Fused whole-sampler kernel (ops/kernels/rf_sampler.py): every Euler step
    # in ONE pallas_call — no per-step pipeline ramp or XLA glue between weight
    # sweeps. Quantized-linear res_blocks on TPU only; the fori_loop below is
    # the exact-math oracle and the bf16/NF4/CPU path. Default since round 5
    # (1.054x over per-step, same-process chained A/B — BENCHMARKS "Round 5").
    if FUSED_SAMPLER and _params_on_tpu(params) and cfg_renorm_type in (None, "channel"):
        from mingunivision_tpu.ops.kernels.rf_sampler import (
            rf_sample_fused,
            rf_sampler_supported,
        )

        if rf_sampler_supported(params, B, cfg_rows):
            global _FUSED_TRACES
            _FUSED_TRACES += 1  # trace-time telemetry: benches assert the gate fired
            out = rf_sample_fused(
                params, cfg, noise, block_mods, final_mods, dts, text_cfg, image_cfg,
                cfg_rows=cfg_rows,
                renorm_channel=cfg_renorm_type == "channel",
                compute_dtype=dtype if dtype != jnp.float32 else jnp.bfloat16,
            )
            return out.astype(dtype)

    def net(x_in, i):
        with jax.profiler.TraceAnnotation("imggen/rf_net"):
            return rf_net_apply_premod(params, cfg, x_in, block_mods[:, i], final_mods[i])

    def step(i, x):
        if cfg_rows == 3:
            third = B // 3
            half = x[:third]
            combined = jnp.concatenate([half, half, half], axis=0)
            v_all = net(combined.astype(dtype), i).astype(jnp.float32)
            v_c, v_u, v_tu = jnp.split(v_all, 3, axis=0)
            v = v_u + image_cfg * (v_tu - v_u) + text_cfg * (v_c - v_tu)
            if cfg_renorm_type == "channel":
                scale = jnp.clip(
                    jnp.linalg.norm(v_c, axis=-1, keepdims=True)
                    / jnp.linalg.norm(v, axis=-1, keepdims=True)
                    + 1e-8,
                    0.0,
                    1.0,
                )
                v = v * scale
            v = jnp.concatenate([v, v, v], axis=0)
        elif cfg_rows == 2:
            halfn = B // 2
            half = x[:halfn]
            combined = jnp.concatenate([half, half], axis=0)
            v_all = net(combined.astype(dtype), i).astype(jnp.float32)
            v_c, v_u = jnp.split(v_all, 2, axis=0)
            v = v_u + text_cfg * (v_c - v_u)
            if cfg_renorm_type == "channel":
                scale = jnp.clip(
                    jnp.linalg.norm(v_c, axis=-1, keepdims=True)
                    / jnp.linalg.norm(v, axis=-1, keepdims=True)
                    + 1e-8,
                    0.0,
                    1.0,
                )
                v = v * scale
            v = jnp.concatenate([v, v], axis=0)
        else:
            v = net(x.astype(dtype), i).astype(jnp.float32)
        return x + v * dts[i]

    x = lax.fori_loop(0, cfg.num_sampling_steps, step, noise)
    return x.astype(dtype)


# ---------------------------------------------------------------------------
# vis_head (Linear + LayerNorm, "linear2-norm" — modeling_bailing_moe.py:1570-1573)
# ---------------------------------------------------------------------------


def init_vis_head_params(key, hidden_size: int, z_channels: int, dtype=jnp.float32):
    return {
        "linear": linear_init(key, hidden_size, z_channels, dtype=dtype),
        "norm": {"w": jnp.ones((z_channels,), dtype), "b": jnp.zeros((z_channels,), dtype)},
    }


def vis_head_apply(params, x, eps: float = 1e-6):
    y = dense(x, params["linear"])
    return layer_norm(y, params["norm"]["w"], params["norm"]["b"], eps=eps)
