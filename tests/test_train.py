"""Training-step tests: LM loss, gradients, router aux losses, token head."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.config import tiny_llm_config
from mingunivision_tpu.engine.train import TrainState, lm_loss, make_optimizer, make_train_step
from mingunivision_tpu.models.bailing_moe import (
    init_bailing_moe_params,
    init_token_classifier,
    moe_route,
    router_balance_loss,
    router_z_loss,
    token_classification_logits,
)


class TestLoss:
    def test_lm_loss_finite_and_masked(self):
        cfg = tiny_llm_config()
        params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 12))
        mask = np.ones((2, 12), np.int32)
        mask[1, 8:] = 0
        loss = lm_loss(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
        assert np.isfinite(float(loss))
        # masking matters
        loss_full = lm_loss(params, cfg, jnp.asarray(ids), jnp.ones((2, 12), jnp.int32))
        assert float(loss) != float(loss_full)

    def test_train_step_reduces_loss_on_repeated_batch(self):
        cfg = tiny_llm_config()
        params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        opt = make_optimizer(1e-2)
        state = TrainState(params, opt.init(params), jnp.int32(0))
        step = make_train_step(cfg, opt)
        ids = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 16)))
        mask = jnp.ones((2, 16), jnp.int32)
        state, l0 = step(state, ids, mask)
        for _ in range(5):
            state, l1 = step(state, ids, mask)
        assert float(l1) < float(l0)
        assert int(state.step) == 6


class TestRouterLosses:
    def test_balance_loss_minimized_by_uniform(self):
        E, N, k = 8, 64, 2
        uniform = jnp.full((N, E), 1.0 / E)
        idx_uniform = jnp.asarray(np.stack([np.arange(N) % E, (np.arange(N) + 1) % E], -1))
        l_uniform = router_balance_loss(uniform, idx_uniform, E)
        # collapsed routing: all to expert 0/1
        collapsed = jnp.zeros((N, E)).at[:, 0].set(1.0)
        idx_coll = jnp.zeros((N, k), jnp.int32)
        l_coll = router_balance_loss(collapsed, idx_coll, E)
        assert float(l_coll) > float(l_uniform)
        # uniform value == k (fraction sums k, E * sum(k/E * 1/E) = k)
        np.testing.assert_allclose(float(l_uniform), k, rtol=1e-5)

    def test_z_loss_positive(self):
        logits = jnp.asarray(np.random.default_rng(0).standard_normal((16, 8)), jnp.float32)
        assert float(router_z_loss(logits)) > 0


class TestTokenClassification:
    def test_head_shapes(self):
        cfg = tiny_llm_config()
        clf = init_token_classifier(jax.random.PRNGKey(0), cfg, num_labels=5, dtype=jnp.float32)
        h = jnp.asarray(np.random.default_rng(0).standard_normal((2, 7, cfg.hidden_size)), jnp.float32)
        out = token_classification_logits(None, cfg, h, clf)
        assert out.shape == (2, 7, 5)
