"""RoPE scaling family golden tests vs the reference implementations."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference snapshot not mounted"
)

from mingunivision_tpu.ops.rope import (  # noqa: E402
    dynamic_ntk_theta,
    linear_scaled_cos_sin,
    rope_cos_sin,
    scaled_rope_cos_sin,
    yarn_cos_sin,
)


@pytest.fixture(scope="module")
def ref():
    import refutil

    return refutil.import_reference_llm()


DIM, THETA = 32, 10000.0


class TestRopeScalingFamily:
    def test_linear_matches_reference(self, ref):
        emb = ref.BailingMoeLinearScalingRotaryEmbedding(DIM, max_position_embeddings=64, base=THETA, scaling_factor=4.0)
        x = torch.zeros(1, 1, 32, DIM)
        cos_ref, sin_ref = emb(x, seq_len=32)
        pos = jnp.arange(32)
        cos, sin = linear_scaled_cos_sin(pos, DIM, THETA, 4.0)
        np.testing.assert_allclose(np.asarray(cos), cos_ref.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sin), sin_ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_dynamic_ntk_matches_reference(self, ref):
        max_pos, factor, seq = 32, 2.0, 64  # beyond trained length
        emb = ref.BailingMoeDynamicNTKScalingRotaryEmbedding(
            DIM, max_position_embeddings=max_pos, base=THETA, scaling_factor=factor
        )
        x = torch.zeros(1, 1, seq, DIM)
        cos_ref, sin_ref = emb(x, seq_len=seq)
        theta2 = dynamic_ntk_theta(seq, DIM, THETA, factor, max_pos)
        cos, sin = rope_cos_sin(jnp.arange(seq), DIM, theta2)
        np.testing.assert_allclose(np.asarray(cos), cos_ref.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sin), sin_ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_yarn_matches_reference(self, ref):
        kwargs = dict(original_max_position_embeddings=32, beta_fast=8.0, beta_slow=1.0, mscale=1.0, mscale_all_dim=0.0)
        emb = ref.BailingMoeYarnRotaryEmbedding(
            DIM, max_position_embeddings=128, base=THETA, scaling_factor=4.0, **kwargs
        )
        x = torch.zeros(1, 1, 64, DIM)
        cos_ref, sin_ref = emb(x, seq_len=64)
        cos, sin = yarn_cos_sin(jnp.arange(64), DIM, THETA, 4.0, **kwargs)
        np.testing.assert_allclose(np.asarray(cos), cos_ref.numpy(), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(sin), sin_ref.numpy(), rtol=2e-4, atol=2e-4)

    def test_dispatch(self):
        pos = jnp.arange(8)
        base = np.asarray(rope_cos_sin(pos, DIM, THETA)[0])
        none = np.asarray(scaled_rope_cos_sin(pos, DIM, THETA, scaling_type="none")[0])
        np.testing.assert_allclose(base, none)
        lin = np.asarray(scaled_rope_cos_sin(pos, DIM, THETA, scaling_type="linear", scaling_factor=2.0)[0])
        assert not np.allclose(base, lin)
