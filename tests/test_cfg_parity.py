"""Batched-CFG correctness: block-major batched T2I must apply the SAME
classifier-free guidance as the single-image path (VERDICT r2 Weak #1 — the
round-2 batched path silently fell into the unguided branch because rf_sample
inferred the guidance layout from B in (2, 3)).

Three layers of proof:
  1. rf_sample unit: B=3*n block-major (explicit cfg_rows=3) is bit-equal to n
     independent B=3 single-image runs with the same per-image noise.
  2. Regression: the guided batched sample differs from the unguided one, and
     the batched output is SENSITIVE to text_cfg (the bug's empirical signature
     was text_cfg=1 vs 9 bit-identical at B=6).
  3. End-to-end: batched_image_generation([a, b]) image 0 equals
     batched_image_generation([a]) image 0 with the same key (per-image noise
     is fold_in(key, image_index), independent of n_images).

Reference guidance formula: /root/reference/mingunivision/diff_loss_rf_swiglu.py:144-171.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mingunivision_tpu.config import RFHeadConfig
from mingunivision_tpu.models.rf_head import init_rf_head_params, rf_sample


def _densify(params, key):
    """init_rf_head_params is AdaLN-ZERO (velocity is exactly 0 at init, making
    any guidance test vacuous) — replace every zero leaf with small randoms."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = [
        jnp.where(jnp.all(l == 0), 0.08 * jax.random.normal(k, l.shape, l.dtype), l)
        for l, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.fixture(scope="module")
def rf():
    cfg = RFHeadConfig(target_channels=8, z_channels=16, width=32, depth=2, mlp_mult=4, num_sampling_steps=4)
    params = _densify(init_rf_head_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32), jax.random.PRNGKey(9))
    return params, cfg


class TestRFSampleBlockMajor:
    def _z_block_major(self, cfg, n):
        rng = np.random.default_rng(3)
        # per-image CFG triples: z_img[i] = (cond_i, uncond_i, text_uncond_i)
        z_img = rng.standard_normal((n, 3, cfg.z_channels)).astype(np.float32)
        # block-major batch: [conds 0..n | unconds 0..n | text_unconds 0..n]
        z_bm = np.concatenate([z_img[:, 0], z_img[:, 1], z_img[:, 2]], axis=0)
        noise = rng.standard_normal((n, cfg.target_channels)).astype(np.float32)
        return z_img, z_bm, noise

    def test_batched_equals_per_image(self, rf):
        params, cfg = rf
        n = 2
        z_img, z_bm, noise = self._z_block_major(cfg, n)
        got = np.asarray(
            rf_sample(
                params, cfg, jnp.asarray(z_bm), key=None,
                text_cfg=3.0, image_cfg=1.1, noise=noise, cfg_rows=3,
            )
        )  # (6, C) block-major
        for i in range(n):
            want = np.asarray(
                rf_sample(
                    params, cfg, jnp.asarray(z_img[i]), key=None,
                    text_cfg=3.0, image_cfg=1.1, noise=noise[i : i + 1], cfg_rows=3,
                )
            )  # (3, C), every row guided
            # image i's cond/uncond/tu rows in the block-major output
            for blk in range(3):
                np.testing.assert_allclose(got[blk * n + i], want[blk], rtol=1e-5, atol=1e-6)

    def test_batched_equals_per_image_with_renorm_and_shift(self, rf):
        params, cfg = rf
        n = 3
        z_img, z_bm, noise = self._z_block_major(cfg, n)
        kw = dict(text_cfg=2.0, image_cfg=1.2, cfg_renorm_type="channel", time_shifting_factor=3.0)
        got = np.asarray(
            rf_sample(params, cfg, jnp.asarray(z_bm), key=None, noise=noise, cfg_rows=3, **kw)
        )
        for i in range(n):
            want = np.asarray(
                rf_sample(params, cfg, jnp.asarray(z_img[i]), key=None, noise=noise[i : i + 1], cfg_rows=3, **kw)
            )
            np.testing.assert_allclose(got[i], want[0], rtol=1e-5, atol=1e-6)

    def test_two_way_block_major(self, rf):
        params, cfg = rf
        n = 2
        rng = np.random.default_rng(5)
        z_img = rng.standard_normal((n, 2, cfg.z_channels)).astype(np.float32)
        z_bm = np.concatenate([z_img[:, 0], z_img[:, 1]], axis=0)
        noise = rng.standard_normal((n, cfg.target_channels)).astype(np.float32)
        got = np.asarray(
            rf_sample(params, cfg, jnp.asarray(z_bm), key=None, text_cfg=2.5, noise=noise, cfg_rows=2)
        )
        for i in range(n):
            want = np.asarray(
                rf_sample(params, cfg, jnp.asarray(z_img[i]), key=None, text_cfg=2.5, noise=noise[i : i + 1], cfg_rows=2)
            )
            np.testing.assert_allclose(got[i], want[0], rtol=1e-5, atol=1e-6)

    def test_guidance_not_silently_dropped(self, rf):
        """The round-2 bug's signature: at B=6 the output was IDENTICAL for any
        text_cfg because the unguided branch never read it."""
        params, cfg = rf
        _, z_bm, noise = self._z_block_major(cfg, 2)
        s1 = np.asarray(rf_sample(params, cfg, jnp.asarray(z_bm), key=None, text_cfg=1.0, noise=noise, cfg_rows=3))
        s9 = np.asarray(rf_sample(params, cfg, jnp.asarray(z_bm), key=None, text_cfg=9.0, noise=noise, cfg_rows=3))
        assert not np.allclose(s1, s9), "batched sampler ignores text_cfg (unguided branch)"
        # guided differs from explicit unguided
        su = np.asarray(rf_sample(params, cfg, jnp.asarray(z_bm), key=None, text_cfg=9.0, noise=noise, cfg_rows=1))
        assert not np.allclose(s9, su)

    def test_bad_cfg_rows_raises(self, rf):
        params, cfg = rf
        z = jnp.zeros((5, cfg.z_channels), jnp.float32)
        with pytest.raises(ValueError):
            rf_sample(params, cfg, z, key=jax.random.PRNGKey(0), cfg_rows=3)


class TestEndToEndBatchedParity:
    """batched_image_generation: image 0 of an n=2 batch == image 0 of n=1."""

    def _setup(self):
        from tests.test_image_batch import _tiny_cfg, _params
        from mingunivision_tpu.config import RuntimeConfig

        cfg = _tiny_cfg()
        params = _params(cfg)
        params["rf_head"] = _densify(params["rf_head"], jax.random.PRNGKey(9))
        return cfg, params, RuntimeConfig(max_seq_len=192, compute_dtype="float32")

    def _req(self, rng, T):
        ids = rng.integers(0, 400, (1, T))
        am = np.ones((1, T), np.int64)
        um = am.copy()
        um[:, T // 2 :] = 0
        return {"input_ids": ids, "attention_mask": am, "uncond_attention_mask": um}

    def test_image0_invariant_to_batch_size(self):
        from mingunivision_tpu.serving.image_batch import batched_image_generation

        cfg, params, rt = self._setup()
        rng = np.random.default_rng(11)
        a, b = self._req(rng, 6), self._req(rng, 10)
        key = jax.random.PRNGKey(42)
        solo = batched_image_generation(params, cfg, rt, [a], key)
        duo = batched_image_generation(params, cfg, rt, [a, b], key)
        np.testing.assert_allclose(duo[0], solo[0], rtol=1e-4, atol=1e-5)

    def test_batched_sensitive_to_text_cfg(self):
        import dataclasses
        from mingunivision_tpu.serving.image_batch import batched_image_generation

        cfg, params, rt = self._setup()
        rng = np.random.default_rng(12)
        reqs = [self._req(rng, 6), self._req(rng, 9)]
        key = jax.random.PRNGKey(7)
        lo = batched_image_generation(params, cfg, rt, reqs, key, igen=dataclasses.replace(cfg.image_gen, text_cfg=1.0))
        hi = batched_image_generation(params, cfg, rt, reqs, key, igen=dataclasses.replace(cfg.image_gen, text_cfg=9.0))
        assert not np.allclose(lo, hi), "batched T2I ignores text_cfg"
