"""Fused whole-sampler kernel (ops/kernels/rf_sampler.py) vs the rf_sample
fori_loop oracle — same quantized tables, same noise, interpret mode on CPU.

The oracle is rf_sample itself: on CPU it always takes the XLA loop (the
fused path is TPU-gated), so calling both with identical noise pins the
whole-sampler kernel — CFG combine, channel renorm, Euler grid, final layer —
against the reference-parity path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.config import RFHeadConfig
from mingunivision_tpu.models.rf_head import (
    _time_grid,
    init_rf_head_params,
    precompute_modulations,
    rf_sample,
)
from mingunivision_tpu.ops.kernels.rf_sampler import rf_sample_fused, rf_sampler_supported
from mingunivision_tpu.utils.quantize import quantize_tree


def _setup(bits=8, depth=3, width=128, mult=3, steps=4):
    cfg = RFHeadConfig(
        target_channels=8, z_channels=32, width=width, depth=depth, mlp_mult=mult,
        num_sampling_steps=steps,
    )
    params = init_rf_head_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # densify the zero-initialized adaLN / final layer so the net does real work
    leaves, td = jax.tree_util.tree_flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree_util.tree_unflatten(
        td,
        [jnp.where(jnp.all(l == 0), 0.05 * jax.random.normal(k, l.shape, l.dtype), l) for l, k in zip(leaves, ks)],
    )
    qparams = dict(params)
    qparams["res_blocks"] = quantize_tree(params["res_blocks"], bits=bits, min_size=1024)
    return cfg, qparams


def _run_both(cfg, qparams, cfg_rows, n_img=1, renorm=None, text_cfg=3.0, image_cfg=1.1, bits=8, **fused_kw):
    rng = np.random.default_rng(3)
    B = cfg_rows * n_img
    z = jnp.asarray(rng.standard_normal((B, cfg.z_channels)), jnp.float32)
    noise_rows = rng.standard_normal((n_img, cfg.target_channels)).astype(np.float32)
    kw = dict(text_cfg=text_cfg, image_cfg=image_cfg, cfg_renorm_type=renorm,
              noise=noise_rows, cfg_rows=cfg_rows, key=None)
    want = np.asarray(rf_sample(qparams, cfg, z, **kw))

    ts, dts = _time_grid(cfg, None)
    block_mods, final_mods = precompute_modulations(qparams, cfg, ts, z)
    noise_full = jnp.tile(jnp.asarray(noise_rows, jnp.float32), (cfg_rows, 1))
    assert rf_sampler_supported(qparams, B, cfg_rows)
    got = np.asarray(
        rf_sample_fused(
            qparams, cfg, noise_full, block_mods, final_mods, dts,
            jnp.float32(text_cfg), jnp.float32(image_cfg),
            cfg_rows=cfg_rows, renorm_channel=renorm == "channel",
            compute_dtype=jnp.float32, chunk=128, interpret=True, **fused_kw,
        )
    )
    return got, want


class TestFusedSampler:
    def test_cfg3_matches_oracle_int8(self):
        cfg, qp = _setup(bits=8)
        got, want = _run_both(cfg, qp, cfg_rows=3)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_cfg3_channel_renorm(self):
        cfg, qp = _setup(bits=8)
        got, want = _run_both(cfg, qp, cfg_rows=3, renorm="channel")
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_cfg2(self):
        cfg, qp = _setup(bits=8)
        got, want = _run_both(cfg, qp, cfg_rows=2, text_cfg=2.0)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_unguided(self):
        cfg, qp = _setup(bits=8)
        got, want = _run_both(cfg, qp, cfg_rows=1, n_img=2)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_batched_block_major(self):
        """n_img=2 through one fused call == each image solo (block-major CFG)."""
        cfg, qp = _setup(bits=8)
        got, want = _run_both(cfg, qp, cfg_rows=3, n_img=2)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_int4_s8_bounded(self):
        """int4 integer-dot fused sampler: bounded drift vs the XLA int4 loop
        (activation-quant noise compounds over steps; same bound class as the
        per-step kernel's BENCHMARKS entry)."""
        # int4 split-halves need 128-aligned half planes: w/2 and H/2 % 128
        # (SwiGLU hidden = round8(mult*width*2/3): width 768 / mult 1 -> H 512)
        cfg, qp = _setup(bits=4, width=768, mult=1, depth=2)
        got, want = _run_both(cfg, qp, cfg_rows=3, bits=4)
        rel = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-12)
        assert np.isfinite(got).all() and rel < 0.05, rel

    def test_int4_s8_pipelined_schedule_matches_block(self):
        """The pipelined down-proj schedule (q3 row chunks streamed on the
        extended c axis) must be bit-identical to the block schedule — same
        math, different DMA order."""
        cfg, qp = _setup(bits=4, width=768, mult=1, depth=2)
        got_b, want = _run_both(cfg, qp, cfg_rows=3, bits=4, schedule="block")
        got_p, _ = _run_both(cfg, qp, cfg_rows=3, bits=4, schedule="pipelined", down_chunk=128)
        # same math, different down-proj accumulation order -> f32 reassociation
        np.testing.assert_allclose(got_p, got_b, rtol=1e-4, atol=1e-5)
        rel = np.linalg.norm(got_p - want) / (np.linalg.norm(want) + 1e-12)
        assert np.isfinite(got_p).all() and rel < 0.05, rel

    def test_int4_s8_pipelined_renorm_multi_image(self):
        cfg, qp = _setup(bits=4, width=768, mult=1, depth=2)
        got_b, _ = _run_both(cfg, qp, cfg_rows=3, n_img=2, renorm="channel", bits=4, schedule="block")
        got_p, _ = _run_both(
            cfg, qp, cfg_rows=3, n_img=2, renorm="channel", bits=4, schedule="pipelined", down_chunk=64
        )
        # reassociation diffs get amplified by the per-step s8 REquantization
        # (scale picks differ at ulp level) and the renorm ratio — trajectory-
        # level tolerance, not single-op
        np.testing.assert_allclose(got_p, got_b, rtol=5e-3, atol=5e-3)

    def test_full_tree_quantized_projections(self):
        """api.py quantizes the WHOLE rf tree (quantize_tree over rf_head), so
        input_proj/final_layer.linear arrive as QuantizedArray above the
        min-size threshold — the fused driver must dequant them, not .astype
        (round-4 regression: AttributeError on the production int4 tree)."""
        cfg, qp = _setup(bits=8)
        qp = dict(qp)
        qp["input_proj"] = quantize_tree(qp["input_proj"], bits=8, min_size=16)
        qp["final_layer"] = dict(qp["final_layer"])
        qp["final_layer"]["linear"] = quantize_tree(qp["final_layer"]["linear"], bits=8, min_size=16)
        got, want = _run_both(cfg, qp, cfg_rows=3)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_traced_cfg_scalars(self):
        """text/image cfg may be traced (cfg schedules) — the fused path must
        accept them without recompiling the branch structure."""
        cfg, qp = _setup(bits=8)

        def f(tc):
            rng = np.random.default_rng(3)
            z = jnp.asarray(rng.standard_normal((3, cfg.z_channels)), jnp.float32)
            noise_full = jnp.tile(jnp.asarray(rng.standard_normal((1, cfg.target_channels)), jnp.float32), (3, 1))
            ts, dts = _time_grid(cfg, None)
            bm, fm = precompute_modulations(qp, cfg, ts, z)
            return rf_sample_fused(
                qp, cfg, noise_full, bm, fm, dts, tc, jnp.float32(1.1),
                cfg_rows=3, renorm_channel=False, compute_dtype=jnp.float32,
                chunk=128, interpret=True,
            )
        a = np.asarray(f(jnp.float32(3.0)))
        b = np.asarray(f(jnp.float32(1.0)))
        assert np.isfinite(a).all() and not np.allclose(a, b)
