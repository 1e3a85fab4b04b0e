"""Capacity-dense MoE prefill dispatch (ops/kernels/moe_capacity.py) —
sort-free rank, exactness vs the masked-dense oracle, overflow fallback."""

import numpy as np

import jax
import jax.numpy as jnp

from mingunivision_tpu.models.bailing_moe import moe_experts_dense
from mingunivision_tpu.ops.kernels.moe_capacity import (
    expert_rank,
    moe_experts_capacity,
    moe_experts_capacity_exact,
    moe_experts_capacity_gmm,
)


def _rank_oracle(flat_e, E):
    seen = np.zeros(E, np.int32)
    out = np.zeros(len(flat_e), np.int32)
    for i, e in enumerate(flat_e):
        out[i] = seen[e]
        seen[e] += 1
    return out, seen


class TestExpertRank:
    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        E = 16
        flat = rng.integers(0, E, size=1536).astype(np.int32)
        want_rank, want_gs = _rank_oracle(flat, E)
        rank, gs = jax.jit(expert_rank, static_argnums=1)(jnp.asarray(flat), E)
        np.testing.assert_array_equal(np.asarray(rank), want_rank)
        np.testing.assert_array_equal(np.asarray(gs), want_gs)

    def test_unpadded_small_and_ragged(self):
        rng = np.random.default_rng(1)
        for A in (7, 512, 700):
            flat = rng.integers(0, 5, size=A).astype(np.int32)
            want_rank, want_gs = _rank_oracle(flat, 5)
            rank, gs = expert_rank(jnp.asarray(flat), 5, block=512)
            np.testing.assert_array_equal(np.asarray(rank), want_rank)
            np.testing.assert_array_equal(np.asarray(gs), want_gs)


def _toy(seed, E=8, d=64, m=96, N=32, k=3):
    rng = np.random.default_rng(seed)
    experts = {
        "gate_proj": jnp.asarray(rng.standard_normal((E, d, m)) * 0.05, jnp.float32),
        "up_proj": jnp.asarray(rng.standard_normal((E, d, m)) * 0.05, jnp.float32),
        "down_proj": jnp.asarray(rng.standard_normal((E, m, d)) * 0.05, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, E, size=(N, k)).astype(np.int32))
    w = jax.nn.softmax(jnp.asarray(rng.standard_normal((N, k)), jnp.float32), -1)
    return experts, x, idx, w, E


class TestMoECapacity:
    def test_matches_dense_when_fits(self):
        experts, x, idx, w, E = _toy(2)
        want = np.asarray(moe_experts_dense(experts, x, idx, w, E))
        got = np.asarray(moe_experts_capacity(experts, x, idx, w, E, capacity=32 * 3))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_overflow_drops_without_guard(self):
        experts, x, idx, w, E = _toy(3)
        idx = jnp.zeros_like(idx)  # everything routed to expert 0 -> load 96
        want = np.asarray(moe_experts_dense(experts, x, idx, w, E))
        got = np.asarray(moe_experts_capacity(experts, x, idx, w, E, capacity=16))
        assert np.abs(got - want).max() > 1e-3  # silently wrong — hence the guard

    def test_exact_wrapper_falls_back_on_overflow(self):
        experts, x, idx, w, E = _toy(4)
        idx = jnp.zeros_like(idx)
        want = np.asarray(moe_experts_dense(experts, x, idx, w, E))
        got = np.asarray(
            jax.jit(moe_experts_capacity_exact, static_argnums=(4, 5))(
                experts, x, idx, w, E, 16
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_exact_wrapper_uses_capacity_when_fits(self):
        experts, x, idx, w, E = _toy(5)
        want = np.asarray(moe_experts_dense(experts, x, idx, w, E))
        got = np.asarray(
            jax.jit(moe_experts_capacity_exact, static_argnums=(4, 5))(
                experts, x, idx, w, E, 96
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_capacity_gmm_matches_dense(self):
        """Uniform-groups fused-kernel path (interpret mode) vs dense oracle."""
        experts, x, idx, w, E = _toy(7, E=8, d=128, m=256, N=32, k=3)
        want = np.asarray(moe_experts_dense(experts, x, idx, w, E))
        got = np.asarray(
            moe_experts_capacity_gmm(experts, x, idx, w, E, capacity=96, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    def test_capacity_gmm_quantized(self):
        from mingunivision_tpu.utils.quantize import quantize_array

        experts, x, idx, w, E = _toy(8, E=8, d=128, m=256, N=32, k=3)
        q = {k2: quantize_array(v, 8) for k2, v in experts.items()}
        want = np.asarray(moe_experts_dense(q, x, idx, w, E))
        got = np.asarray(
            moe_experts_capacity_gmm(q, x, idx, w, E, capacity=96, s8=False, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    def test_capacity_gmm_exact_both_branches(self):
        """The guarded wrapper: capacity branch when loads fit, argsort-gmm
        fallback on overflow — both exact vs dense (interpret mode)."""
        from mingunivision_tpu.ops.kernels.moe_capacity import moe_experts_capacity_gmm_exact

        experts, x, idx, w, E = _toy(10, E=8, d=128, m=256, N=32, k=3)
        want = np.asarray(moe_experts_dense(experts, x, idx, w, E))
        fits = np.asarray(
            moe_experts_capacity_gmm_exact(experts, x, idx, w, E, 96, tm_fallback=32, interpret=True)
        )
        np.testing.assert_allclose(fits, want, rtol=5e-4, atol=5e-4)
        idx0 = jnp.zeros_like(idx)  # overflow: load 96 > capacity 32
        want0 = np.asarray(moe_experts_dense(experts, x, idx0, w, E))
        fb = np.asarray(
            moe_experts_capacity_gmm_exact(experts, x, idx0, w, E, 32, tm_fallback=32, interpret=True)
        )
        np.testing.assert_allclose(fb, want0, rtol=5e-4, atol=5e-4)

    def test_capacity_gmm_drops_overflow(self):
        experts, x, idx, w, E = _toy(9, E=8, d=128, m=256, N=32, k=3)
        idx = jnp.zeros_like(idx)  # load 96 on expert 0
        want = np.asarray(moe_experts_dense(experts, x, idx, w, E))
        got = np.asarray(
            moe_experts_capacity_gmm(experts, x, idx, w, E, capacity=32, interpret=True)
        )
        assert np.abs(got - want).max() > 1e-3  # hence the _exact guard

    def test_capacity_gmm_quantized_int4(self):
        """int4 is the headline serving tier and routes through the
        plane-aware chunked q4 kernel with tm=capacity (ADVICE r4 low #3)."""
        from mingunivision_tpu.ops.kernels.moe_capacity import moe_experts_capacity_gmm_exact
        from mingunivision_tpu.utils.quantize import quantize_array

        experts, x, idx, w, E = _toy(11, E=8, d=128, m=256, N=32, k=3)
        q = {k2: quantize_array(v, 4) for k2, v in experts.items()}
        want = np.asarray(moe_experts_dense(q, x, idx, w, E))
        got = np.asarray(
            moe_experts_capacity_gmm(q, x, idx, w, E, capacity=96, s8=False, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
        exact = np.asarray(
            moe_experts_capacity_gmm_exact(q, x, idx, w, E, 96, tm_fallback=32, s8=False, interpret=True)
        )
        np.testing.assert_allclose(exact, want, rtol=5e-2, atol=5e-2)

    def test_exact_guard_ignores_pad_rows(self):
        """ADVICE r4 medium #1: right-padded prompts route all pads to the same
        top-k; with token_valid, pads neither trip the guard nor displace a
        later sequence's valid rows from capacity slots."""
        from mingunivision_tpu.ops.kernels.moe_capacity import moe_experts_capacity_gmm_exact

        experts, x, idx, w, E = _toy(12, E=8, d=128, m=256, N=32, k=3)
        # rows 8..15 are seq-0 padding (mid-batch!), rows 16.. are seq 1 valid
        valid = jnp.ones((32,), bool).at[8:16].set(False)
        # all pads pile onto expert 0 (worst case): 8 pads x k=3 = 24 > capacity 8
        idx = idx.at[8:16].set(0)
        # valid rows' loads stay <= capacity 8 per expert: spread them round-robin
        spread = (jnp.arange(32 * 3, dtype=jnp.int32) % E).reshape(32, 3)
        idx = jnp.where(valid[:, None], spread, idx)
        want = np.asarray(moe_experts_dense(experts, x, idx, w, E))
        got = np.asarray(
            moe_experts_capacity_gmm_exact(
                experts, x, idx, w, E, 16, tm_fallback=32, interpret=True, token_valid=valid
            )
        )
        # valid rows exact despite pad overflow (pads routed out-of-bounds)
        np.testing.assert_allclose(got[np.asarray(valid)], want[np.asarray(valid)], rtol=5e-4, atol=5e-4)

    def test_bf16_path(self):
        experts, x, idx, w, E = _toy(6)
        experts = {k2: v.astype(jnp.bfloat16) for k2, v in experts.items()}
        xb = x.astype(jnp.bfloat16)
        want = np.asarray(moe_experts_dense(experts, xb, idx, w, E), np.float32)
        got = np.asarray(moe_experts_capacity(experts, xb, idx, w, E, 96), np.float32)
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
