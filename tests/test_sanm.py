"""SAN-M audio encoder (models/sanm.py) — the funasr SANMEncoder analog behind
the UniVision wrapper's extract_audio_feature hook (reference
modeling_bailingmm.py:22, :140-150; tower never constructed by the UniVision
checkpoint, so the oracle here is the architecture spec, not weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.models.sanm import (
    SANMConfig,
    _fsmn,
    extract_audio_feature,
    init_sanm_params,
    sanm_encode,
)

CFG = SANMConfig(
    input_size=24, output_size=32, attention_heads=4, linear_units=48,
    num_blocks=3, kernel_size=5, llm_hidden=16,
)


@pytest.fixture(scope="module")
def params():
    return init_sanm_params(jax.random.PRNGKey(0), CFG)


class TestFSMN:
    def test_depthwise_conv_matches_numpy(self):
        rng = np.random.default_rng(1)
        B, T, D, K = 2, 9, 6, 5
        v = rng.standard_normal((B, T, D)).astype(np.float32)
        kern = rng.standard_normal((K, D)).astype(np.float32)
        mask = np.ones((B, T), bool)
        got = np.asarray(_fsmn(jnp.asarray(v), jnp.asarray(kern), jnp.asarray(mask), shift=0))
        # numpy oracle: per-channel 1d conv, symmetric padding, + residual
        pad = (K - 1) // 2
        vp = np.pad(v, ((0, 0), (pad, pad), (0, 0)))
        want = v.copy()
        for t in range(T):
            want[:, t] += np.einsum("bkd,kd->bd", vp[:, t : t + K], kern)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_sanm_shift_moves_receptive_field(self):
        rng = np.random.default_rng(2)
        v = jnp.asarray(rng.standard_normal((1, 8, 4)), jnp.float32)
        kern = jnp.asarray(rng.standard_normal((3, 4)), jnp.float32)
        mask = jnp.ones((1, 8), bool)
        sym = np.asarray(_fsmn(v, kern, mask, shift=0))
        left = np.asarray(_fsmn(v, kern, mask, shift=1))  # look-back only
        assert not np.allclose(sym, left)


class TestEncoder:
    def test_shapes_and_padding_invariance(self, params):
        rng = np.random.default_rng(3)
        T = 12
        feats = jnp.asarray(rng.standard_normal((2, T, CFG.input_size)), jnp.float32)
        lengths = jnp.asarray([12, 7])
        out = sanm_encode(params, CFG, feats, lengths)
        assert out.shape == (2, T, CFG.output_size)
        # frames past the length are zeroed
        assert np.allclose(np.asarray(out)[1, 7:], 0.0)
        # garbage in the padding must not change valid-frame outputs
        feats2 = feats.at[1, 7:].set(99.0)
        out2 = sanm_encode(params, CFG, feats2, lengths)
        np.testing.assert_allclose(np.asarray(out)[1, :7], np.asarray(out2)[1, :7], rtol=1e-4, atol=1e-5)

    def test_first_layer_changes_width_no_crash_single_block(self):
        cfg1 = SANMConfig(input_size=24, output_size=32, attention_heads=4,
                          linear_units=48, num_blocks=1, kernel_size=5, llm_hidden=16)
        p = init_sanm_params(jax.random.PRNGKey(1), cfg1)
        assert p["encoders"] is None
        out = sanm_encode(p, cfg1, jnp.ones((1, 6, 24)), jnp.asarray([6]))
        assert out.shape == (1, 6, 32)

    def test_extract_audio_feature_hook(self, params):
        rng = np.random.default_rng(4)
        feats = jnp.asarray(rng.standard_normal((2, 10, CFG.input_size)), jnp.float32)
        lengths = jnp.asarray([10, 4])
        emb, out_len = extract_audio_feature(params, CFG, feats, lengths)
        assert emb.shape == (2, 10, CFG.llm_hidden)
        assert np.array_equal(np.asarray(out_len), [10, 4])
        # norm_query_embeds: valid rows are unit-norm (reference F.normalize,
        # modeling_bailingmm.py:148-149), padded rows zero
        norms = np.linalg.norm(np.asarray(emb), axis=-1)
        np.testing.assert_allclose(norms[0], 1.0, rtol=1e-4)
        np.testing.assert_allclose(norms[1, :4], 1.0, rtol=1e-4)
        assert np.allclose(norms[1, 4:], 0.0)

    def test_jit_and_scan_stability(self, params):
        feats = jnp.ones((1, 8, CFG.input_size))
        lengths = jnp.asarray([8])
        f = jax.jit(lambda p, x, l: sanm_encode(p, CFG, x, l))
        out = f(params, feats, lengths)
        assert bool(jnp.all(jnp.isfinite(out)))
