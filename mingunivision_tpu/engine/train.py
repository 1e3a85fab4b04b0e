"""Training steps: LLM next-token CE, rectified-flow velocity loss, and the
composed image-generation step (RF loss on MingTok latents, MingTok frozen).

The reference repo is inference-only (SURVEY: no training loop in-repo; its
RectifiedFlowLoss ships only `sample`, diff_loss_rf_swiglu.py:103-181, and the
balance-loss utilities in modeling_utils.py:451-529 are vestigial). We provide
TPU-native training so the full dp/ep/tp sharding path is exercisable and the
framework can fine-tune: pure `value_and_grad` over the scanned decoder, optax
optimizers/schedules, switch-style router aux losses, microbatch gradient
accumulation via `lax.scan`.

RF loss convention — derived from the reference sampler's ODE direction
(diff_loss_rf_swiglu.py:125-180: x starts at noise at t=1 and Euler-steps
x += v*dt toward data at t=0): the linear path is x_t = t*noise + (1-t)*data,
so the velocity target the net must regress is v* = data - noise.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from mingunivision_tpu.config import BailingMoeConfig, RFHeadConfig
from mingunivision_tpu.models.bailing_moe import (
    LLMCache,
    bailing_forward,
    compute_logits,
    embed_tokens,
    router_balance_loss,
    router_group_balance_loss,
    router_z_loss,
)


def moe_aux_losses(router_stats, num_experts: int, ep_groups: int = 1):
    """Training-only router auxiliary losses from bailing_forward's
    return_router_stats output (reference auxiliary_loss,
    modeling_utils.py:563-600). router_stats: (logits (L, N, E) fp32,
    topk_idx (L, N, k)). Returns dict(balance, z, group_balance) — all
    golden-tested against the reference (tests/test_router_losses_golden)."""
    logits, topk_idx = router_stats
    L, N, E = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    flat_p = probs.reshape(L * N, E)
    flat_i = topk_idx.reshape(L * N, -1)
    out = {
        "balance": router_balance_loss(flat_p, flat_i, num_experts),
        "z": router_z_loss(logits.reshape(L * N, E)),
    }
    if ep_groups > 1:
        out["group_balance"] = router_group_balance_loss(probs, topk_idx, num_experts, ep_groups)
    return out


def lm_loss(
    params,
    cfg: BailingMoeConfig,
    input_ids,
    attention_mask,
    image_mask=None,
    balance_alpha: float = 0.0,
    z_alpha: float = 0.0,
    group_alpha: float = 0.0,
    logits_l2_alpha: float = 0.0,
    ep_groups: int = 1,
):
    """Causal LM loss over a right-padded batch. input_ids: (B, T).

    Non-zero balance_alpha / z_alpha / group_alpha add the reference's router
    auxiliary losses (modeling_utils.py:563-600) weighted accordingly; the
    forward then also collects per-layer router stats."""
    B, T = input_ids.shape
    # route MoE dispatch through the differentiable (custom_vjp) kernel paths
    cfg = dataclasses.replace(cfg, moe_differentiable=True)
    want_aux = balance_alpha > 0 or z_alpha > 0 or group_alpha > 0
    cache = LLMCache.create(cfg, B, T, dtype=jnp.bfloat16)
    embeds = embed_tokens(params, input_ids)
    if want_aux:
        hidden, _, stats = bailing_forward(
            params, cfg, embeds, cache, attention_mask.astype(bool), image_mask=image_mask,
            return_router_stats=True,
        )
    else:
        hidden, _ = bailing_forward(params, cfg, embeds, cache, attention_mask.astype(bool), image_mask=image_mask)
    logits = compute_logits(params, cfg, hidden)
    targets = input_ids[:, 1:]
    logits = logits[:, :-1]
    mask = attention_mask[:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    if want_aux:
        aux = moe_aux_losses(stats, cfg.num_experts, ep_groups=max(ep_groups, 2 if group_alpha > 0 else 1))
        loss = loss + balance_alpha * aux["balance"] + z_alpha * aux["z"]
        if group_alpha > 0:
            loss = loss + group_alpha * aux["group_balance"]
    if logits_l2_alpha > 0:
        # reference last_logits_l2_loss (modeling_utils.py:599-607): mean L2
        # norm of the LM logits over supervised positions
        l2 = jnp.linalg.norm(logits.astype(jnp.float32), ord=2, axis=-1)
        loss = loss + logits_l2_alpha * jnp.sum(l2 * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return loss


# ---------------------------------------------------------------------------
# Rectified-flow velocity-matching loss
# ---------------------------------------------------------------------------


def rf_loss(rf_params, cfg: RFHeadConfig, data, z, key, *, t=None, noise=None):
    """Velocity-matching loss for the RF head.

    data: (N, target_channels) ground-truth latents (MingTok 32-d, standardized);
    z: (N, z_channels) conditioning (vis_head output). t/noise may be supplied
    explicitly (golden tests); default t ~ U[0,1) (reference
    t_sample_strategy="uniform", diff_loss_rf_swiglu.py:96), noise ~ N(0, I).

    x_t = t*noise + (1-t)*data; target v* = data - noise; MSE in fp32.
    """
    N = data.shape[0]
    kt, kn = jax.random.split(key)
    if t is None:
        t = jax.random.uniform(kt, (N,), jnp.float32)
    if noise is None:
        noise = jax.random.normal(kn, data.shape, jnp.float32)
    from mingunivision_tpu.models.rf_head import rf_net_apply

    data32 = data.astype(jnp.float32)
    x_t = t[:, None] * noise + (1.0 - t[:, None]) * data32
    v_pred = rf_net_apply(rf_params, cfg, x_t.astype(data.dtype), t, z).astype(jnp.float32)
    v_target = data32 - noise
    return jnp.mean(jnp.square(v_pred - v_target))


def image_gen_loss(
    params,  # {"llm", "rf_head", "vis_head", "linear_proj"}
    llm_cfg: BailingMoeConfig,
    rf_cfg: RFHeadConfig,
    text_ids,  # (B, Tt) prompt tokens ending in <image_start>
    text_mask,  # (B, Tt)
    sem_features,  # (B, N, feature_dim) MingTok semantic tokens (frozen encoder)
    latents,  # (B, N, target_channels) MingTok 32-d standardized latents
    key,
):
    """Teacher-forced AR image-generation training step.

    The inference loop (engine/generate.py) feeds linear_proj(semantic token i)
    as input i+1 and regresses latent i from the PREVIOUS position's hidden via
    vis_head -> RF head. Training mirrors that with teacher forcing: run the LLM
    over [text, proj(sem)], take the N hiddens at positions Tt-1 .. Tt+N-2, and
    apply the RF velocity loss against the ground-truth latents. MingTok is
    frozen by construction — its features arrive as data, not params.
    """
    from mingunivision_tpu.engine.generate import linear_proj_apply
    from mingunivision_tpu.models.rf_head import vis_head_apply

    llm_cfg = dataclasses.replace(llm_cfg, moe_differentiable=True)
    B, Tt = text_ids.shape
    N = sem_features.shape[1]
    T = Tt + N
    embeds = embed_tokens(params["llm"], text_ids)
    proj = linear_proj_apply(params["linear_proj"], sem_features).astype(embeds.dtype)
    seq = jnp.concatenate([embeds, proj], axis=1)  # (B, T, h)
    mask = jnp.concatenate([text_mask.astype(bool), jnp.ones((B, N), bool)], axis=1)
    image_mask = jnp.concatenate([jnp.zeros((B, Tt), bool), jnp.ones((B, N), bool)], axis=1)

    cache = LLMCache.create(llm_cfg, B, T, dtype=seq.dtype)
    hidden, _ = bailing_forward(params["llm"], llm_cfg, seq, cache, mask, image_mask=image_mask)
    pred_h = lax.dynamic_slice_in_dim(hidden, Tt - 1, N, axis=1)  # (B, N, h)
    z = vis_head_apply(params["vis_head"], pred_h)  # (B, N, zc)
    return rf_loss(
        params["rf_head"],
        rf_cfg,
        latents.reshape(B * N, -1),
        z.reshape(B * N, -1),
        key,
    )


# ---------------------------------------------------------------------------
# Optimizer / schedules / train steps
# ---------------------------------------------------------------------------


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def warmup_cosine_schedule(peak_lr: float, warmup_steps: int, total_steps: int, end_lr_frac: float = 0.1):
    """Standard LLM pretraining schedule preset: linear warmup -> cosine decay."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=peak_lr * end_lr_frac,
    )


def make_scheduled_optimizer(peak_lr: float, warmup_steps: int, total_steps: int, weight_decay: float = 0.01, clip: float = 1.0):
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(warmup_cosine_schedule(peak_lr, warmup_steps, total_steps), weight_decay=weight_decay),
    )


def make_train_step(cfg: BailingMoeConfig, optimizer, accum_steps: int = 1, donate: bool = True, **loss_kwargs):
    """LM train step; with accum_steps > 1 the batch's leading axis is split into
    microbatches scanned sequentially (grads averaged) — activation memory drops
    by the factor while weights/optimizer state are touched once.

    With donate=True (default) the input TrainState's buffers are DONATED to
    the step — the standard `state, loss = step(state, ...)` loop rebinds, and
    XLA updates params/adamw moments in place instead of holding two copies
    (~6.6 GB per copy at one 16B-A3B layer; two copies don't fit one v5e).
    Pass donate=False only if the caller must keep the pre-step state alive.

    Extra keyword args (balance_alpha, z_alpha, group_alpha, logits_l2_alpha,
    ep_groups) are forwarded to lm_loss — the router auxiliary losses.
    """

    def grads_of(params, input_ids, attention_mask):
        return jax.value_and_grad(lm_loss)(params, cfg, input_ids, attention_mask, **loss_kwargs)

    def train_step(state: TrainState, input_ids, attention_mask):
        if accum_steps == 1:
            loss, grads = grads_of(state.params, input_ids, attention_mask)
        else:
            B = input_ids.shape[0]
            mb = B // accum_steps
            ids_mb = input_ids[: mb * accum_steps].reshape(accum_steps, mb, -1)
            mask_mb = attention_mask[: mb * accum_steps].reshape(accum_steps, mb, -1)

            def body(carry, xs):
                acc_loss, acc_grads = carry
                loss, grads = grads_of(state.params, xs[0], xs[1])
                return (acc_loss + loss, jax.tree_util.tree_map(jnp.add, acc_grads, grads)), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, grads), _ = lax.scan(body, (jnp.float32(0.0), zero), (ids_mb, mask_mb))
            loss = loss / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def mingtok_train_loss(
    params,
    cfg,
    images,
    teacher_features=None,
    *,
    pixel_weight: float = 1.0,
    feature_weight: float = 1.0,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
):
    """MingTok joint pretraining loss: pixel reconstruction + semantic
    feature-distillation.

    The reference trains MingTok with a pixel reconstruction objective
    (vision_transformer.py:529-562) plus a semantic-distillation target (the
    tech report's joint training; LPIPS hook :564-570 is a separate perceptual
    term added via utils.feature_net). `teacher_features`: (B, N, feature_dim)
    targets for x_norm_patchtokens (e.g. a frozen CLIP/DINO teacher); omitted ->
    pixel-only.
    """
    from mingunivision_tpu.models.mingtok import (
        expand_sem_to_pix_tokens,
        mingtok_encode,
        pixel_decoder_apply,
        pixel_reconstruction_loss,
    )
    from mingunivision_tpu.ops.linear import dense

    feats = mingtok_encode(params, cfg, images, compute_dtype=compute_dtype, remat=remat)
    sem = feats["x_norm_patchtokens"].astype(jnp.float32)

    # pixel decode from the semantic tokens (mingtok_pixel_decoder path, kept
    # at the patch level for the loss)
    ratio = cfg.semantic_decoder.patch_size // cfg.pixel_decoder.patch_size
    pix_in = expand_sem_to_pix_tokens(dense(sem, params["sem_to_pix"]), ratio)
    pred_patches = pixel_decoder_apply(params["pixel_decoder"], cfg.pixel_decoder, pix_in, remat=remat)

    loss = jnp.float32(0.0)
    metrics = {}
    if pixel_weight:
        pl = pixel_reconstruction_loss(pred_patches, images.astype(jnp.float32), cfg)
        loss = loss + pixel_weight * pl
        metrics["pixel_loss"] = pl
    if teacher_features is not None and feature_weight:
        fl = jnp.mean(jnp.square(sem - teacher_features.astype(jnp.float32)))
        loss = loss + feature_weight * fl
        metrics["feature_distill_loss"] = fl
    return loss, metrics


def make_image_gen_train_step(llm_cfg: BailingMoeConfig, rf_cfg: RFHeadConfig, optimizer, donate: bool = True):
    """Jitted image-gen train step over {llm, rf_head, vis_head, linear_proj}.

    Input state donated by default (see make_train_step)."""

    def train_step(state: TrainState, text_ids, text_mask, sem_features, latents, key):
        loss, grads = jax.value_and_grad(image_gen_loss)(
            state.params, llm_cfg, rf_cfg, text_ids, text_mask, sem_features, latents, key
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
