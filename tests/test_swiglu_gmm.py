"""Fused SwiGLU grouped-matmul prefill kernel (ops/kernels/moe_swiglu_gmm).

Interpret-mode on CPU: validates the grid schedule reuse (megablox group
metadata), the resident-x chunk loop, and the masked row store against the
masked-dense oracle. TPU perf is recorded in BENCHMARKS.md."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.models.bailing_moe import moe_experts_dense
from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import (
    SWIGLU_GMM_AVAILABLE,
    moe_experts_swiglu_gmm,
    swiglu_gmm_supported,
)
from mingunivision_tpu.utils.quantize import quantize_array

pytestmark = pytest.mark.skipif(not SWIGLU_GMM_AVAILABLE, reason="megablox unavailable")


def _setup(key, E, h, m, N, k):
    ks = jax.random.split(key, 6)
    experts = {
        "gate_proj": 0.1 * jax.random.normal(ks[0], (E, h, m), jnp.float32),
        "up_proj": 0.1 * jax.random.normal(ks[1], (E, h, m), jnp.float32),
        "down_proj": 0.1 * jax.random.normal(ks[2], (E, m, h), jnp.float32),
    }
    x = jax.random.normal(ks[3], (N, h), jnp.float32)
    idx = jax.random.randint(ks[4], (N, k), 0, E)
    w = jax.nn.softmax(jax.random.normal(ks[5], (N, k))).astype(jnp.float32)
    return experts, x, idx, w


@pytest.mark.parametrize("N,tm", [(96, 32), (64, 64)])
def test_matches_masked_dense(N, tm):
    E, h, m, k = 8, 256, 384, 3
    experts, x, idx, w = _setup(jax.random.PRNGKey(0), E, h, m, N, k)
    ref = moe_experts_dense(experts, x, idx, w, E)
    got = moe_experts_swiglu_gmm(experts, x, idx, w, E, tm=tm, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


def test_skewed_routing_and_padding():
    """Unbalanced groups + row padding into the last group."""
    E, h, m, k = 4, 128, 256, 2
    experts, x, _, w = _setup(jax.random.PRNGKey(1), E, h, m, 50, k)
    # all assignments to experts {0, 3}: empty groups inside, heavy padding
    idx = jnp.asarray(np.random.default_rng(0).choice([0, 3], (50, k)))
    ref = moe_experts_dense(experts, x, idx, w, E)
    got = moe_experts_swiglu_gmm(experts, x, idx, w, E, tm=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


def test_supported_predicate():
    E, h, m = 4, 256, 384
    experts, x, _, _ = _setup(jax.random.PRNGKey(2), E, h, m, 8, 2)
    assert swiglu_gmm_supported(experts, x)
    q = {k: quantize_array(v, 8) for k, v in experts.items()}
    assert swiglu_gmm_supported(q, x)  # int8 dequant-fused path
    bad = dict(experts, gate_proj=experts["gate_proj"][:, :, :200])
    assert not swiglu_gmm_supported(bad, x)


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_fused_matches_dense(bits):
    """Dequant-fused grouped SwiGLU (full-expert blocks, scales on matmul
    results) vs the masked-dense dequant oracle."""
    E, h, m, N, k = 8, 256, 384, 96, 3
    experts, x, idx, w = _setup(jax.random.PRNGKey(3), E, h, m, N, k)
    q = {kk: quantize_array(v, bits) for kk, v in experts.items()}
    assert swiglu_gmm_supported(q, x)
    ref = moe_experts_dense(q, x, idx, w, E)
    got = moe_experts_swiglu_gmm(q, x, idx, w, E, tm=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


@pytest.mark.parametrize("bits", [8, 4])
def test_s8_integer_dot_matches_exact(bits):
    """Integer-MXU chunked kernels (s8=True) vs the exact-dequant kernels.
    The s8 path adds per-row activation-quant noise (~0.4%/matmul) on top of
    identical weight handling — bound it relative to the exact kernel. The
    bitcast/no-u8-operand construction makes interpret semantics match the
    compiled Mosaic signed-dot semantics (CLAUDE.md)."""
    from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import swiglu_gmm_quant

    E, h, m, N, k = 4, 256, 384, 64, 2
    experts, x, idx, w = _setup(jax.random.PRNGKey(6), E, h, m, N, k)
    q = {kk: quantize_array(v, bits) for kk, v in experts.items()}
    A = N * k
    flat_e = idx.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)
    xs = jnp.take(x, order // k, axis=0)
    gs = jnp.bincount(flat_e, length=E).astype(jnp.int32)
    exact = swiglu_gmm_quant(xs, q["gate_proj"], q["up_proj"], q["down_proj"], gs, tm=32, interpret=True, s8=False)
    got = swiglu_gmm_quant(xs, q["gate_proj"], q["up_proj"], q["down_proj"], gs, tm=32, interpret=True, s8=True)
    exact = np.asarray(exact, np.float32)
    got = np.asarray(got, np.float32)
    rel_l2 = np.linalg.norm(got - exact) / (np.linalg.norm(exact) + 1e-9)
    assert rel_l2 < 0.02, rel_l2
    # and it still matches the fp oracle at the tier's own grade
    ref = np.asarray(moe_experts_dense(q, x, idx, w, E), np.float32)
    inv = jnp.argsort(order, stable=True)
    comb = jnp.take(jnp.asarray(got), inv, axis=0).reshape(N, k, -1)
    comb = np.asarray(jnp.einsum("nkh,nk->nh", comb, w.astype(jnp.float32)))
    rel_l2_ref = np.linalg.norm(comb - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel_l2_ref < 0.02, rel_l2_ref


def test_grad_through_ad_wrapper_matches_dense():
    """moe_experts_swiglu_gmm_ad: fused-kernel forward, megablox-vjp backward.
    Both the forward value and grads w.r.t. expert tables / activations /
    router weights must match jax.grad through the masked-dense oracle."""
    from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import moe_experts_swiglu_gmm_ad

    E, h, m, N, k = 4, 128, 256, 64, 2
    experts, x, idx, w = _setup(jax.random.PRNGKey(5), E, h, m, N, k)

    def loss_ad(experts, x, w):
        y = moe_experts_swiglu_gmm_ad(experts, x, idx, w, E, 32, True)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_ref(experts, x, w):
        y = moe_experts_dense(experts, x, idx, w, E)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    (v_ad, g_ad) = jax.value_and_grad(loss_ad, argnums=(0, 1, 2))(experts, x, w)
    (v_ref, g_ref) = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(experts, x, w)
    np.testing.assert_allclose(float(v_ad), float(v_ref), rtol=1e-4)
    for ga, gr in zip(jax.tree.leaves(g_ad), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gr), atol=2e-3, rtol=1e-3)


def test_int4_full_block_fallback_matches():
    """The non-chunked int4 kernel (full-expert blocks) stays available via
    swiglu_gmm_quant(int4_chunked=False)."""
    import jax.numpy as jnp

    from mingunivision_tpu.ops.kernels.moe_swiglu_gmm import swiglu_gmm_quant

    E, h, m, N, k = 4, 256, 384, 32, 2
    experts, x, idx, w = _setup(jax.random.PRNGKey(4), E, h, m, N, k)
    q = {kk: quantize_array(v, 4) for kk, v in experts.items()}
    A = N * k
    flat_e = idx.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)
    xs = jnp.take(x, order // k, axis=0)
    gs = jnp.bincount(flat_e, length=E).astype(jnp.int32)
    full = swiglu_gmm_quant(xs, q["gate_proj"], q["up_proj"], q["down_proj"], gs, tm=32, interpret=True, int4_chunked=False)
    chunked = swiglu_gmm_quant(xs, q["gate_proj"], q["up_proj"], q["down_proj"], gs, tm=32, interpret=True, int4_chunked=True)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=5e-4)


class TestSwigluGmmStacked:
    """Depth-stacked (L, E, ...) tables + layer_idx: the prefill kernels
    block-index (layer, expert) via scalar prefetch instead of consuming a
    scan-sliced per-layer copy (the slice copy measured ~2.5 ms/layer bf16 on
    v5e). Parity: stacked kernel at layer l == unstacked kernel on slice l."""

    def test_stacked_bf16_matches_sliced(self):
        from mingunivision_tpu.utils.quantize import QuantizedArray  # noqa: F401

        E, h, m, N, k, L = 8, 256, 384, 96, 3, 3
        key = jax.random.PRNGKey(7)
        ks = jax.random.split(key, 6)
        stacked = {
            "gate_proj": 0.1 * jax.random.normal(ks[0], (L, E, h, m), jnp.float32),
            "up_proj": 0.1 * jax.random.normal(ks[1], (L, E, h, m), jnp.float32),
            "down_proj": 0.1 * jax.random.normal(ks[2], (L, E, m, h), jnp.float32),
        }
        x = jax.random.normal(ks[3], (N, h), jnp.float32)
        idx = jax.random.randint(ks[4], (N, k), 0, E)
        w = jax.nn.softmax(jax.random.normal(ks[5], (N, k))).astype(jnp.float32)
        assert swiglu_gmm_supported(stacked, x)
        for layer in (0, L - 1):
            sliced = {kk: v[layer] for kk, v in stacked.items()}
            ref = moe_experts_swiglu_gmm(sliced, x, idx, w, E, tm=32, interpret=True)
            got = moe_experts_swiglu_gmm(
                stacked, x, idx, w, E, tm=32, interpret=True, layer_idx=layer
            )
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    @pytest.mark.parametrize("bits", [8, 4])
    def test_stacked_quantized_matches_sliced(self, bits):
        from mingunivision_tpu.utils.quantize import QuantizedArray

        E, h, m, N, k, L = 8, 256, 384, 96, 3, 2
        key = jax.random.PRNGKey(8)
        ks = jax.random.split(key, 6)
        raw = {
            "gate_proj": 0.1 * jax.random.normal(ks[0], (L, E, h, m), jnp.float32),
            "up_proj": 0.1 * jax.random.normal(ks[1], (L, E, h, m), jnp.float32),
            "down_proj": 0.1 * jax.random.normal(ks[2], (L, E, m, h), jnp.float32),
        }
        q = {kk: quantize_array(v, bits) for kk, v in raw.items()}
        x = jax.random.normal(ks[3], (N, h), jnp.float32)
        idx = jax.random.randint(ks[4], (N, k), 0, E)
        w = jax.nn.softmax(jax.random.normal(ks[5], (N, k))).astype(jnp.float32)
        assert swiglu_gmm_supported(q, x)
        layer = L - 1
        sliced = {
            kk: QuantizedArray(v.q[layer], v.s[layer], v.bits) for kk, v in q.items()
        }
        ref = moe_experts_swiglu_gmm(sliced, x, idx, w, E, tm=32, interpret=True)
        got = moe_experts_swiglu_gmm(q, x, idx, w, E, tm=32, interpret=True, layer_idx=layer)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    def test_capacity_stacked_matches_sliced(self):
        from mingunivision_tpu.ops.kernels.moe_capacity import moe_experts_capacity_gmm_exact

        E, h, m, N, k, L = 8, 256, 384, 96, 3, 2
        key = jax.random.PRNGKey(9)
        ks = jax.random.split(key, 6)
        stacked = {
            "gate_proj": 0.1 * jax.random.normal(ks[0], (L, E, h, m), jnp.float32),
            "up_proj": 0.1 * jax.random.normal(ks[1], (L, E, h, m), jnp.float32),
            "down_proj": 0.1 * jax.random.normal(ks[2], (L, E, m, h), jnp.float32),
        }
        x = jax.random.normal(ks[3], (N, h), jnp.float32)
        idx = jax.random.randint(ks[4], (N, k), 0, E)
        w = jax.nn.softmax(jax.random.normal(ks[5], (N, k))).astype(jnp.float32)
        layer = 1
        sliced = {kk: v[layer] for kk, v in stacked.items()}
        cap = 64  # generous: the capacity branch executes
        ref = moe_experts_capacity_gmm_exact(sliced, x, idx, w, E, cap, tm_fallback=32, interpret=True)
        got = moe_experts_capacity_gmm_exact(
            stacked, x, idx, w, E, cap, tm_fallback=32, interpret=True, layer_idx=layer
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
