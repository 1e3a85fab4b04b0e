"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.ops.attention import cached_decode_attention
from mingunivision_tpu.ops.kernels.decode_attention import pallas_decode_attention


class TestDecodeAttentionKernel:
    @pytest.mark.parametrize("Hq,Hkv", [(16, 4), (4, 4)])
    def test_matches_xla_reference(self, Hq, Hkv):
        B, S, D = 2, 1024, 64
        rng = np.random.default_rng(0)
        q = rng.standard_normal((B, 1, Hq, D)).astype(np.float32)
        k = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
        v = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
        mask = np.zeros((B, S), bool)
        mask[0, :700] = True
        mask[1, :321] = True
        mask[1, 400:450] = True  # CFG-style hole pattern

        want = np.asarray(
            cached_decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), S, extra_mask=jnp.asarray(mask))
        )
        got = np.asarray(
            pallas_decode_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask), tile_s=256, interpret=True
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_bf16_inputs(self):
        B, S, Hq, Hkv, D = 1, 512, 8, 2, 64
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)
        mask = jnp.zeros((B, S), bool).at[:, :100].set(True)
        got = pallas_decode_attention(q, k, v, mask, tile_s=256, interpret=True)
        want = cached_decode_attention(q, k, v, S, extra_mask=mask)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
        )


class TestGatheredExpertMatmul:
    def test_matches_take_gather(self):
        from mingunivision_tpu.models.bailing_moe import moe_experts_gather
        from mingunivision_tpu.ops.kernels.expert_matmul import moe_experts_gather_pallas

        rng = np.random.default_rng(0)
        E, h, m, N, k = 8, 64, 32, 3, 2
        experts = {
            "gate_proj": jnp.asarray(rng.standard_normal((E, h, m)), jnp.float32),
            "up_proj": jnp.asarray(rng.standard_normal((E, h, m)), jnp.float32),
            "down_proj": jnp.asarray(rng.standard_normal((E, m, h)), jnp.float32),
        }
        x = jnp.asarray(rng.standard_normal((N, h)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, E, (N, k)), jnp.int32)
        w = jnp.asarray(rng.random((N, k)), jnp.float32)
        want = np.asarray(moe_experts_gather(experts, x, idx, w))
        got = np.asarray(moe_experts_gather_pallas(experts, x, idx, w, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_tile_split(self):
        from mingunivision_tpu.ops.kernels.expert_matmul import gathered_expert_matmul

        rng = np.random.default_rng(1)
        E, h, N = 4, 32, 64
        w = jnp.asarray(rng.standard_normal((E, h, N)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((5, h)), jnp.float32)
        ids = jnp.asarray([0, 3, 1, 1, 2], jnp.int32)
        got = np.asarray(gathered_expert_matmul(x, w, ids, tile_n=32, interpret=True))
        want = np.stack([np.asarray(x[i] @ w[int(ids[i])]) for i in range(5)])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestMoEStreamKernel:
    def test_matches_dense(self):
        from mingunivision_tpu.models.bailing_moe import moe_experts_dense
        from mingunivision_tpu.ops.kernels.moe_stream import moe_experts_stream

        rng = np.random.default_rng(0)
        E, d, m, N, k = 8, 256, 384, 3, 4
        experts = {
            "gate_proj": jnp.asarray(rng.standard_normal((E, d, m)) * 0.05, jnp.float32),
            "up_proj": jnp.asarray(rng.standard_normal((E, d, m)) * 0.05, jnp.float32),
            "down_proj": jnp.asarray(rng.standard_normal((E, m, d)) * 0.05, jnp.float32),
        }
        x = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, E, (N, k)), jnp.int32)
        idx = idx.at[1, 0].set(idx[0, 0])  # duplicate across rows -> DMA-elision path
        w = jax.nn.softmax(jnp.asarray(rng.standard_normal((N, k)), jnp.float32), -1)
        want = np.asarray(moe_experts_dense(experts, x, idx, w, E))
        got = np.asarray(moe_experts_stream(experts, x, idx, w, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_single_token(self):
        from mingunivision_tpu.models.bailing_moe import moe_experts_dense
        from mingunivision_tpu.ops.kernels.moe_stream import moe_experts_stream

        rng = np.random.default_rng(1)
        E, d, m = 4, 128, 256
        experts = {
            "gate_proj": jnp.asarray(rng.standard_normal((E, d, m)) * 0.05, jnp.float32),
            "up_proj": jnp.asarray(rng.standard_normal((E, d, m)) * 0.05, jnp.float32),
            "down_proj": jnp.asarray(rng.standard_normal((E, m, d)) * 0.05, jnp.float32),
        }
        x = jnp.asarray(rng.standard_normal((1, d)), jnp.float32)
        idx = jnp.asarray([[2, 0]], jnp.int32)
        w = jnp.asarray([[0.7, 0.3]], jnp.float32)
        want = np.asarray(moe_experts_dense(experts, x, idx, w, E))
        got = np.asarray(moe_experts_stream(experts, x, idx, w, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_dedup_aggregated_slots(self):
        """A > E collapses assignments to one slot per PRESENT expert with
        pre-summed gates (round-4 decode-MoE dedup); absent experts must not
        contribute and batch rows keep their own mixtures."""
        from mingunivision_tpu.models.bailing_moe import moe_experts_dense
        from mingunivision_tpu.ops.kernels.moe_stream import moe_experts_stream

        rng = np.random.default_rng(7)
        E, d, m, N, k = 8, 128, 256, 16, 3  # A = 48 > E = 8
        experts = {
            "gate_proj": jnp.asarray(rng.standard_normal((E, d, m)) * 0.05, jnp.float32),
            "up_proj": jnp.asarray(rng.standard_normal((E, d, m)) * 0.05, jnp.float32),
            "down_proj": jnp.asarray(rng.standard_normal((E, m, d)) * 0.05, jnp.float32),
        }
        x = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
        # expert 5 never routed; expert 0 heavily duplicated
        pool = np.asarray([0, 1, 2, 3, 4, 6, 7])
        idx_np = rng.choice(pool, size=(N, k)).astype(np.int32)
        idx_np[:, 0] = 0
        idx = jnp.asarray(idx_np)
        w = jax.nn.softmax(jnp.asarray(rng.standard_normal((N, k)), jnp.float32), -1)
        want = np.asarray(moe_experts_dense(experts, x, idx, w, E))
        got = np.asarray(moe_experts_stream(experts, x, idx, w, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_supported_gate(self):
        from mingunivision_tpu.ops.kernels.moe_stream import stream_supported

        experts = {
            "gate_proj": jnp.zeros((4, 256, 384)),
            "up_proj": jnp.zeros((4, 256, 384)),
            "down_proj": jnp.zeros((4, 384, 256)),
        }
        idx = jnp.zeros((3, 4), jnp.int32)
        x = jnp.zeros((3, 256))
        assert stream_supported(experts, x, idx)
        # unaligned hidden dim -> unsupported
        bad = {k: jnp.zeros((4, 100, 384)) if "down" not in k else jnp.zeros((4, 384, 100)) for k in experts}
        assert not stream_supported(bad, x, idx)
        # A > E no longer trips the slot cap: dedup-aggregation collapses the
        # grid to min(A, E) = 4 steps
        assert stream_supported(experts, x, jnp.zeros((10, 6), jnp.int32))
        # ... but min(A, E) above the cap still falls back to masked-dense
        wide = {
            "gate_proj": jnp.zeros((48, 256, 384)),
            "up_proj": jnp.zeros((48, 256, 384)),
            "down_proj": jnp.zeros((48, 384, 256)),
        }
        assert not stream_supported(wide, x, jnp.zeros((10, 6), jnp.int32))


class TestMoEStreamInt8:
    def _quant_experts(self, rng, E, d, m):
        from mingunivision_tpu.utils.quantize import quantize_array

        dense = {
            "gate_proj": jnp.asarray(rng.standard_normal((E, d, m)) * 0.05, jnp.float32),
            "up_proj": jnp.asarray(rng.standard_normal((E, d, m)) * 0.05, jnp.float32),
            "down_proj": jnp.asarray(rng.standard_normal((E, m, d)) * 0.05, jnp.float32),
        }
        quant = {k: quantize_array(v, bits=8) for k, v in dense.items()}
        return dense, quant

    def test_int8_matches_xla_dequant(self):
        """Dequant-fused kernel == XLA dequant-then-gather on the SAME int8
        tables (exact same quantized numerics, only the fusion differs)."""
        from mingunivision_tpu.models.bailing_moe import moe_experts_gather
        from mingunivision_tpu.ops.kernels.moe_stream import moe_experts_stream, stream_supported

        rng = np.random.default_rng(2)
        E, d, m, N, k = 8, 256, 384, 3, 4
        _, quant = self._quant_experts(rng, E, d, m)
        x = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, E, (N, k)), jnp.int32)
        idx = idx.at[2, 1].set(idx[0, 2])  # duplicate -> DMA-elision path
        w = jax.nn.softmax(jnp.asarray(rng.standard_normal((N, k)), jnp.float32), -1)
        assert stream_supported(quant, x, idx)
        want = np.asarray(moe_experts_gather(quant, x, idx, w))
        # the EXACT dequant kernel (flag pinned: s8 int-dots are the serving
        # default since round 5)
        import mingunivision_tpu.ops.kernels.moe_stream as _ms

        _orig = (_ms.INT_DOT_STREAM, _ms.INT_DOT_STREAM_INT8)
        _ms.INT_DOT_STREAM = _ms.INT_DOT_STREAM_INT8 = False
        try:
            got = np.asarray(moe_experts_stream(quant, x, idx, w, interpret=True))
        finally:
            _ms.INT_DOT_STREAM, _ms.INT_DOT_STREAM_INT8 = _orig
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
        # the integer-dot kernel carries bounded activation-quant noise
        _ms.INT_DOT_STREAM = _ms.INT_DOT_STREAM_INT8 = True
        try:
            noisy = np.asarray(moe_experts_stream(quant, x, idx, w, interpret=True))
        finally:
            _ms.INT_DOT_STREAM, _ms.INT_DOT_STREAM_INT8 = _orig
        rel = np.linalg.norm(noisy - want) / (np.linalg.norm(want) + 1e-12)
        # ~4% at this tiny d=256 (3 chained s8-quantized matmuls; relative
        # noise shrinks ~1/sqrt(d) at the real width 2048)
        assert rel < 0.06, f"intdot stream rel-L2 {rel:.4f}"

    def test_mixed_bits_not_supported(self):
        from mingunivision_tpu.ops.kernels.moe_stream import stream_supported
        from mingunivision_tpu.utils.quantize import quantize_array

        rng = np.random.default_rng(3)
        E, d, m = 4, 256, 384
        mixed = {
            "gate_proj": quantize_array(rng.standard_normal((E, d, m)).astype(np.float32), bits=4),
            "up_proj": quantize_array(rng.standard_normal((E, d, m)).astype(np.float32), bits=8),
            "down_proj": quantize_array(rng.standard_normal((E, m, d)).astype(np.float32), bits=4),
        }
        assert not stream_supported(mixed, jnp.zeros((2, d)), jnp.zeros((2, 4), jnp.int32))

    def test_int4_matches_xla_dequant(self):
        """int4 split-halves fused kernel == XLA dequant on the same tables."""
        from mingunivision_tpu.models.bailing_moe import moe_experts_gather
        from mingunivision_tpu.ops.kernels.moe_stream import moe_experts_stream, stream_supported
        from mingunivision_tpu.utils.quantize import quantize_array

        rng = np.random.default_rng(4)
        E, d, m, N, k = 8, 256, 384, 3, 4
        quant = {
            "gate_proj": quantize_array(jnp.asarray(rng.standard_normal((E, d, m)) * 0.05, jnp.float32), bits=4),
            "up_proj": quantize_array(jnp.asarray(rng.standard_normal((E, d, m)) * 0.05, jnp.float32), bits=4),
            "down_proj": quantize_array(jnp.asarray(rng.standard_normal((E, m, d)) * 0.05, jnp.float32), bits=4),
        }
        x = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, E, (N, k)), jnp.int32)
        w = jax.nn.softmax(jnp.asarray(rng.standard_normal((N, k)), jnp.float32), -1)
        assert stream_supported(quant, x, idx)
        want = np.asarray(moe_experts_gather(quant, x, idx, w))
        # the EXACT dequant kernel (flag pinned: s8 int-dots are the serving
        # default since round 5)
        import mingunivision_tpu.ops.kernels.moe_stream as _ms

        _orig = (_ms.INT_DOT_STREAM, _ms.INT_DOT_STREAM_INT8)
        _ms.INT_DOT_STREAM = _ms.INT_DOT_STREAM_INT8 = False
        try:
            got = np.asarray(moe_experts_stream(quant, x, idx, w, interpret=True))
        finally:
            _ms.INT_DOT_STREAM, _ms.INT_DOT_STREAM_INT8 = _orig
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
        # the integer-dot kernel carries bounded activation-quant noise
        _ms.INT_DOT_STREAM = _ms.INT_DOT_STREAM_INT8 = True
        try:
            noisy = np.asarray(moe_experts_stream(quant, x, idx, w, interpret=True))
        finally:
            _ms.INT_DOT_STREAM, _ms.INT_DOT_STREAM_INT8 = _orig
        rel = np.linalg.norm(noisy - want) / (np.linalg.norm(want) + 1e-12)
        # ~4% at this tiny d=256 (3 chained s8-quantized matmuls; relative
        # noise shrinks ~1/sqrt(d) at the real width 2048)
        assert rel < 0.06, f"intdot stream rel-L2 {rel:.4f}"


class TestMoEStreamStacked:
    def test_stacked_layer_index_matches_sliced(self):
        """Stacked (L, E, ...) tables + layer_idx == slicing the layer first."""
        from mingunivision_tpu.models.bailing_moe import moe_experts_dense
        from mingunivision_tpu.ops.kernels.moe_stream import moe_experts_stream

        rng = np.random.default_rng(5)
        L, E, d, m, N, k = 3, 8, 256, 384, 3, 4
        stacked = {
            "gate_proj": jnp.asarray(rng.standard_normal((L, E, d, m)) * 0.05, jnp.float32),
            "up_proj": jnp.asarray(rng.standard_normal((L, E, d, m)) * 0.05, jnp.float32),
            "down_proj": jnp.asarray(rng.standard_normal((L, E, m, d)) * 0.05, jnp.float32),
        }
        x = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, E, (N, k)), jnp.int32)
        w = jax.nn.softmax(jnp.asarray(rng.standard_normal((N, k)), jnp.float32), -1)
        for li in (0, 2):
            sliced = {kk: v[li] for kk, v in stacked.items()}
            want = np.asarray(moe_experts_dense(sliced, x, idx, w, E))
            got = np.asarray(moe_experts_stream(stacked, x, idx, w, layer_idx=jnp.int32(li), interpret=True))
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_stacked_int8(self):
        from mingunivision_tpu.models.bailing_moe import moe_experts_gather
        from mingunivision_tpu.ops.kernels.moe_stream import moe_experts_stream
        from mingunivision_tpu.utils.quantize import quantize_array

        rng = np.random.default_rng(6)
        L, E, d, m, N, k = 2, 4, 128, 256, 2, 3
        stacked = {
            "gate_proj": quantize_array(rng.standard_normal((L, E, d, m)).astype(np.float32) * 0.05, bits=8),
            "up_proj": quantize_array(rng.standard_normal((L, E, d, m)).astype(np.float32) * 0.05, bits=8),
            "down_proj": quantize_array(rng.standard_normal((L, E, m, d)).astype(np.float32) * 0.05, bits=8),
        }
        x = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, E, (N, k)), jnp.int32)
        w = jax.nn.softmax(jnp.asarray(rng.standard_normal((N, k)), jnp.float32), -1)
        from mingunivision_tpu.utils.quantize import QuantizedArray

        li = 1
        sliced = {kk: QuantizedArray(v.q[li], v.s[li], 8) for kk, v in stacked.items()}
        want = np.asarray(moe_experts_gather(sliced, x, idx, w))
        # pin the exact dequant kernel (s8 int-dots are the serving default)
        import mingunivision_tpu.ops.kernels.moe_stream as _ms

        _orig = (_ms.INT_DOT_STREAM, _ms.INT_DOT_STREAM_INT8)
        _ms.INT_DOT_STREAM = _ms.INT_DOT_STREAM_INT8 = False
        try:
            got = np.asarray(moe_experts_stream(stacked, x, idx, w, layer_idx=jnp.int32(li), interpret=True))
        finally:
            _ms.INT_DOT_STREAM, _ms.INT_DOT_STREAM_INT8 = _orig
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
        # the s8 default on the stacked path: bounded activation-quant noise
        got_s8 = np.asarray(moe_experts_stream(stacked, x, idx, w, layer_idx=jnp.int32(li), interpret=True))
        rel = np.linalg.norm(got_s8 - want) / (np.linalg.norm(want) + 1e-12)
        assert rel < 0.06, f"s8 stacked stream rel-L2 {rel:.4f}"


class TestRFMLPStack:
    def test_matches_xla_premod_path(self):
        """Fused RF block-stack kernel == the scanned XLA premod path on the
        same int8 tables (fp32 activations, interpret mode)."""
        from mingunivision_tpu.config import RFHeadConfig
        from mingunivision_tpu.models.rf_head import (
            init_rf_head_params,
            precompute_modulations,
        )
        from mingunivision_tpu.ops.activations import swiglu
        from mingunivision_tpu.ops.kernels.rf_mlp import rf_mlp_stack, rf_mlp_supported
        from mingunivision_tpu.ops.linear import dense
        from mingunivision_tpu.ops.norms import layer_norm
        from mingunivision_tpu.utils.quantize import quantize_tree

        cfg = RFHeadConfig(target_channels=8, z_channels=32, width=128, depth=3, mlp_mult=3, num_sampling_steps=2)  # hidden=256 (128-aligned)
        params = init_rf_head_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        # make adaLN non-zero so the modulations actually do something
        params["res_blocks"]["adaLN"]["w"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(1), params["res_blocks"]["adaLN"]["w"].shape, jnp.float32
        )
        qparams = dict(params)
        qparams["res_blocks"] = quantize_tree(params["res_blocks"], bits=8, min_size=1024)
        blocks = qparams["res_blocks"]
        assert rf_mlp_supported(blocks)

        B = 3
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((B, cfg.width)), jnp.float32)
        z = jnp.asarray(rng.standard_normal((B, cfg.z_channels)), jnp.float32)
        ts = jnp.asarray([0.7], jnp.float32)
        block_mods, _ = precompute_modulations(qparams, cfg, ts, z)
        mods = block_mods[:, 0]  # (depth, B, 3w)

        # XLA oracle on the SAME quantized tables
        def xla_stack(h):
            for l in range(cfg.depth):
                blk = jax.tree_util.tree_map(lambda a: a[l], blocks)
                shift, scale, gate = jnp.split(mods[l].astype(h.dtype), 3, axis=-1)
                hh = layer_norm(h, blk["in_ln"]["w"], blk["in_ln"]["b"], eps=cfg.ln_eps)
                hh = hh * (1 + scale) + shift
                hh = dense(swiglu(dense(hh, blk["mlp"]["w12"])), blk["mlp"]["w3"])
                h = h + gate * hh
            return h

        want = np.asarray(xla_stack(x))
        got = np.asarray(rf_mlp_stack(blocks, x, mods, ln_eps=cfg.ln_eps, chunk=128, interpret=True))
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
        # opt-in int8 integer-dot mode: bounded activation-quant noise
        s8 = np.asarray(
            rf_mlp_stack(blocks, x, mods, ln_eps=cfg.ln_eps, chunk=128, interpret=True, unpack_mode="s8")
        )
        rel = np.linalg.norm(s8 - want) / (np.linalg.norm(want) + 1e-12)
        assert rel < 0.02, f"int8 s8-mode rel-L2 {rel:.4f}"

    def test_int4_matches_xla_premod_path(self):
        """int4 split-halves RF stack kernel vs the XLA path on the same tables."""
        from mingunivision_tpu.config import RFHeadConfig
        from mingunivision_tpu.models.rf_head import init_rf_head_params, precompute_modulations
        from mingunivision_tpu.ops.activations import swiglu
        from mingunivision_tpu.ops.kernels.rf_mlp import rf_mlp_stack, rf_mlp_supported
        from mingunivision_tpu.ops.linear import dense
        from mingunivision_tpu.ops.norms import layer_norm
        from mingunivision_tpu.utils.quantize import quantize_tree

        # width 256 (halves 128-aligned), hidden = int(1024*2/3)=680 -> NOT aligned;
        # use mlp_mult=3: int(768*2/3)=512, halves 256 -> aligned
        cfg = RFHeadConfig(target_channels=8, z_channels=32, width=256, depth=2, mlp_mult=3, num_sampling_steps=2)
        params = init_rf_head_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        params["res_blocks"]["adaLN"]["w"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(1), params["res_blocks"]["adaLN"]["w"].shape, jnp.float32
        )
        blocks = quantize_tree(params["res_blocks"], bits=4, min_size=1024)
        assert rf_mlp_supported(blocks)

        rng = np.random.default_rng(3)
        B = 3
        x = jnp.asarray(rng.standard_normal((B, cfg.width)), jnp.float32)
        z = jnp.asarray(rng.standard_normal((B, cfg.z_channels)), jnp.float32)
        qp = dict(params)
        qp["res_blocks"] = blocks
        block_mods, _ = precompute_modulations(qp, cfg, jnp.asarray([0.4], jnp.float32), z)
        mods = block_mods[:, 0]

        def xla_stack(h):
            for l in range(cfg.depth):
                blk = jax.tree_util.tree_map(lambda a: a[l], blocks)
                shift, scale, gate = jnp.split(mods[l].astype(h.dtype), 3, axis=-1)
                hh = layer_norm(h, blk["in_ln"]["w"], blk["in_ln"]["b"], eps=cfg.ln_eps)
                hh = hh * (1 + scale) + shift
                hh = dense(swiglu(dense(hh, blk["mlp"]["w12"])), blk["mlp"]["w3"])
                h = h + gate * hh
            return h

        want = np.asarray(xla_stack(x))
        # every nibble-unpack strategy must agree (the v5e sweep picks one as
        # the module default; 'alg' reconstructs hi via (b - (b&15))/16 with
        # rank-1 offset corrections and must be numerically identical)
        for mode in ("i32", "i16", "i8", "alg", "mxu", "s8"):
            got = np.asarray(
                rf_mlp_stack(blocks, x, mods, ln_eps=cfg.ln_eps, chunk=256, interpret=True, unpack_mode=mode)
            )
            np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4, err_msg=mode)
