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


class TestRFTraining:
    def test_rf_head_learns_fixed_point(self):
        """Sampler/loss consistency: train the RF head to map a fixed z to a
        fixed latent; the Euler sampler must then reproduce that latent."""
        import optax

        from mingunivision_tpu.config import RFHeadConfig
        from mingunivision_tpu.engine.train import rf_loss
        from mingunivision_tpu.models.rf_head import init_rf_head_params, rf_sample

        cfg = RFHeadConfig(target_channels=4, z_channels=8, width=64, depth=2, mlp_mult=4, num_sampling_steps=32)
        params = init_rf_head_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        target = jnp.asarray([[1.0, -0.5, 0.25, 2.0]], jnp.float32)
        z = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8)), jnp.float32)

        opt = optax.adam(3e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, key):
            data = jnp.tile(target, (64, 1))
            zz = jnp.tile(z, (64, 1))
            loss, grads = jax.value_and_grad(rf_loss)(params, cfg, data, zz, key)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        key = jax.random.PRNGKey(1)
        for i in range(400):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sub)
        sample = rf_sample(params, cfg, z, jax.random.PRNGKey(2), temperature=0.01)
        np.testing.assert_allclose(np.asarray(sample), np.asarray(target), atol=0.15)

    def test_image_gen_train_step_reduces_loss(self):
        from mingunivision_tpu.engine.train import TrainState, make_image_gen_train_step, make_optimizer
        from mingunivision_tpu.engine.generate import init_linear_proj_params
        from mingunivision_tpu.models.rf_head import init_rf_head_params, init_vis_head_params
        from mingunivision_tpu.config import RFHeadConfig

        llm_cfg = tiny_llm_config()
        rf_cfg = RFHeadConfig(target_channels=4, z_channels=16, width=32, depth=1, mlp_mult=4, num_sampling_steps=2)
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        feat_dim = 24
        params = {
            "llm": init_bailing_moe_params(ks[0], llm_cfg, dtype=jnp.float32),
            "rf_head": init_rf_head_params(ks[1], rf_cfg, dtype=jnp.float32),
            "vis_head": init_vis_head_params(ks[2], llm_cfg.hidden_size, rf_cfg.z_channels, dtype=jnp.float32),
            "linear_proj": init_linear_proj_params(ks[3], feat_dim, llm_cfg.hidden_size, 2, dtype=jnp.float32),
        }
        opt = make_optimizer(3e-3)
        state = TrainState(params, opt.init(params), jnp.int32(0))
        step = make_image_gen_train_step(llm_cfg, rf_cfg, opt)

        rng = np.random.default_rng(2)
        text_ids = jnp.asarray(rng.integers(0, 400, (2, 5)))
        text_mask = jnp.ones((2, 5), jnp.int32)
        sem = jnp.asarray(rng.standard_normal((2, 3, feat_dim)), jnp.float32)
        lat = jnp.asarray(rng.standard_normal((2, 3, 4)), jnp.float32)

        key = jax.random.PRNGKey(3)
        state, l0 = step(state, text_ids, text_mask, sem, lat, key)
        for _ in range(8):
            state, l1 = step(state, text_ids, text_mask, sem, lat, key)
        assert np.isfinite(float(l0)) and float(l1) < float(l0)

    def test_grad_accumulation_matches_full_batch(self):
        from mingunivision_tpu.engine.train import TrainState, make_optimizer, make_train_step

        cfg = tiny_llm_config()
        params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        opt = make_optimizer(1e-2)
        ids = jnp.asarray(np.random.default_rng(4).integers(0, cfg.vocab_size, (4, 12)))
        mask = jnp.ones((4, 12), jnp.int32)

        # the steps DONATE their input state, so s2 needs its own param buffers
        # built before s1's are consumed
        params2 = jax.tree_util.tree_map(jnp.copy, params)
        s1 = TrainState(params, opt.init(params), jnp.int32(0))
        s2 = TrainState(params2, opt.init(params2), jnp.int32(0))
        s1, loss1 = make_train_step(cfg, opt)(s1, ids, mask)
        s2, loss2 = make_train_step(cfg, opt, accum_steps=2)(s2, ids, mask)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
        a = jax.tree_util.tree_leaves(s1.params)
        b = jax.tree_util.tree_leaves(s2.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5)

    def test_warmup_cosine_schedule(self):
        from mingunivision_tpu.engine.train import warmup_cosine_schedule

        sched = warmup_cosine_schedule(1e-3, warmup_steps=10, total_steps=100)
        assert float(sched(0)) == 0.0
        assert abs(float(sched(10)) - 1e-3) < 1e-9
        assert float(sched(99)) < 3e-4


class TestMingTokTraining:
    def test_joint_loss_decreases(self):
        import optax

        from mingunivision_tpu.engine.train import mingtok_train_loss
        from mingunivision_tpu.models.mingtok import init_mingtok_params
        from tests.test_engine import tiny_mm

        cfg = tiny_mm().mingtok
        params = init_mingtok_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.uniform(-1, 1, (2, 3, 32, 32)), jnp.float32)
        n_tok = (32 // cfg.encoder.patch_size) ** 2
        teacher = jnp.asarray(rng.standard_normal((2, n_tok, cfg.feature_dim)), jnp.float32)

        def loss_fn(p):
            loss, metrics = mingtok_train_loss(p, cfg, images, teacher, compute_dtype=jnp.float32)
            return loss

        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(grads, s)
            return optax.apply_updates(p, updates), s, loss

        p, s, l0 = step(params, opt_state)
        for _ in range(5):
            p, s, l1 = step(p, s)
        assert np.isfinite(float(l0)) and float(l1) < float(l0)

    def test_pixel_only_mode(self):
        from mingunivision_tpu.engine.train import mingtok_train_loss
        from mingunivision_tpu.models.mingtok import init_mingtok_params
        from tests.test_engine import tiny_mm

        cfg = tiny_mm().mingtok
        params = init_mingtok_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
        images = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (1, 3, 32, 32)), jnp.float32)
        loss, metrics = mingtok_train_loss(params, cfg, images, None, compute_dtype=jnp.float32)
        assert np.isfinite(float(loss))
        assert "pixel_loss" in metrics and "feature_distill_loss" not in metrics


def test_lm_loss_with_router_aux():
    """Aux coefficients change the loss; stats path stays differentiable."""
    from mingunivision_tpu.engine.train import moe_aux_losses
    from mingunivision_tpu.models.bailing_moe import bailing_forward, embed_tokens, LLMCache

    cfg = tiny_llm_config()
    params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 12)))
    mask = jnp.ones((2, 12), jnp.int32)

    base = float(lm_loss(params, cfg, ids, mask))
    with_aux = float(lm_loss(params, cfg, ids, mask, balance_alpha=0.01, z_alpha=0.001, group_alpha=0.01, ep_groups=2))
    assert np.isfinite(with_aux) and with_aux != base

    # stats shapes from the forward
    cache = LLMCache.create(cfg, 2, 12, dtype=jnp.float32)
    _, _, (logits, idx) = bailing_forward(
        params, cfg, embed_tokens(params, ids), cache, mask.astype(bool), return_router_stats=True
    )
    L, N, E = logits.shape
    assert L == cfg.num_hidden_layers and N == 2 * 12 and E == cfg.num_experts
    assert idx.shape == (L, N, cfg.num_experts_per_tok)
    aux = moe_aux_losses((logits, idx), cfg.num_experts, ep_groups=2)
    assert all(np.isfinite(float(v)) for v in aux.values())

    # gradients flow through the aux terms
    g = jax.grad(lambda p: lm_loss(p, cfg, ids, mask, balance_alpha=0.01, z_alpha=0.001))(params)
    gate_g = g["layers"]["mlp"]["gate"]["w"]
    assert np.isfinite(np.asarray(gate_g)).all()


class TestTrainerDriver:
    def test_train_lm_smoke_and_resume(self, tmp_path):
        """examples/train_lm.py: loss descends on the synthetic stream; async
        checkpoints land; --resume restores the latest step and continues."""
        import json as _json
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ck = str(tmp_path / "ck")

        def run(*extra):
            out = subprocess.run(
                [sys.executable, "examples/train_lm.py", "--tiny", "--allow-cpu",
                 "--ckpt-dir", ck, "--ckpt-every", "10", "--log-every", "5", *extra],
                cwd=repo, capture_output=True, text=True, timeout=500,
            )
            assert out.returncode == 0, out.stderr[-2000:]
            return [
                _json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")
            ], out.stdout

        logs, _ = run("--steps", "20")
        assert logs[-1]["step"] == 20
        assert logs[-1]["loss"] < logs[0]["loss"] + 0.05  # descending-ish
        logs2, stdout2 = run("--steps", "30", "--resume")
        assert "resumed" in stdout2 and "step 20" in stdout2
        assert logs2[-1]["step"] == 30

    def test_train_lm_sharded_mesh_matches_unsharded(self, tmp_path):
        """--mesh 2,2,2 on the virtual CPU mesh: same seeds => the sharded
        loss trajectory must equal the single-device run's (GSPMD math parity
        through the full train loop)."""
        import json as _json
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

        def run(*extra):
            out = subprocess.run(
                [sys.executable, "examples/train_lm.py", "--tiny", "--allow-cpu",
                 "--steps", "10", "--log-every", "10", *extra],
                cwd=repo, capture_output=True, text=True, timeout=500,
            )
            assert out.returncode == 0, out.stderr[-2000:]
            return [_json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]

        single = run()
        sharded = run("--mesh", "2,2,2")
        assert abs(single[-1]["loss"] - sharded[-1]["loss"]) < 2e-3, (single, sharded)

    def test_train_mingtok_smoke(self):
        """examples/train_mingtok.py: prefetch-queue-fed joint loss descends."""
        import json as _json
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run(
            [sys.executable, "examples/train_mingtok.py", "--tiny", "--allow-cpu",
             "--steps", "12", "--log-every", "4"],
            cwd=repo, capture_output=True, text=True, timeout=500,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        logs = [_json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
        assert logs[-1]["step"] == 12
        assert logs[-1]["loss"] < logs[0]["loss"]


class TestRemat:
    def test_remat_layers_grads_match(self):
        """cfg.remat_layers recomputes layers in backward — loss and grads
        must be IDENTICAL to the non-remat graph (same math, less memory)."""
        import dataclasses

        cfg = tiny_llm_config()
        params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        ids = jnp.asarray(np.random.default_rng(7).integers(0, cfg.vocab_size, (2, 16)))
        mask = jnp.ones((2, 16), jnp.int32)

        v0, g0 = jax.value_and_grad(lm_loss)(params, cfg, ids, mask)
        cfg_r = dataclasses.replace(cfg, remat_layers=True)
        v1, g1 = jax.value_and_grad(lm_loss)(params, cfg_r, ids, mask)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_mingtok_remat_grads_match(self):
        from mingunivision_tpu.config import tiny_mingtok_config
        from mingunivision_tpu.engine.train import mingtok_train_loss
        from mingunivision_tpu.models.mingtok import init_mingtok_params

        cfg = tiny_mingtok_config()
        params = init_mingtok_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        S = cfg.encoder.img_size
        imgs = jnp.asarray(np.random.default_rng(8).standard_normal((1, 3, S, S)), jnp.float32)

        def loss(p, remat):
            return mingtok_train_loss(p, cfg, imgs, None, compute_dtype=jnp.float32, remat=remat)[0]

        v0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
        v1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
