"""Unit tests for core ops against torch-CPU oracles (no checkpoints needed)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mingunivision_tpu.ops.norms import layer_norm, rms_norm
from mingunivision_tpu.ops.activations import gelu_exact, swiglu, swiglu_hidden_dim
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.rope import rope_cos_sin, mrope_cos_sin, apply_rope
from mingunivision_tpu.ops.attention import mha, cached_decode_attention
from mingunivision_tpu.ops.patching import (
    patchify,
    unpatchify,
    expand_sem_to_pix_tokens,
    bicubic_resize_torch,
    interpolate_pos_embed,
)

torch = pytest.importorskip("torch")


def rnd(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


class TestNorms:
    def test_rms_norm_matches_torch_fp32(self):
        x = rnd(2, 5, 64)
        w = rnd(64, seed=1)
        got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-5))
        xt = torch.tensor(x)
        var = xt.pow(2).mean(-1, keepdim=True)
        want = (torch.tensor(w) * (xt * torch.rsqrt(var + 1e-5))).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_layer_norm_matches_torch(self):
        x = rnd(3, 7, 32)
        w, b = rnd(32, seed=1), rnd(32, seed=2)
        got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-6))
        want = torch.nn.functional.layer_norm(
            torch.tensor(x), (32,), torch.tensor(w), torch.tensor(b), eps=1e-6
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestActivations:
    def test_gelu_exact_matches_torch_default(self):
        x = rnd(128)
        got = np.asarray(gelu_exact(jnp.asarray(x)))
        want = torch.nn.GELU()(torch.tensor(x)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_swiglu_matches_reference_forward(self):
        x12 = rnd(4, 16)
        got = np.asarray(swiglu(jnp.asarray(x12)))
        x1, x2 = torch.tensor(x12).chunk(2, dim=-1)
        want = (torch.nn.functional.silu(x1) * x2).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_swiglu_hidden_dim_sizing(self):
        # reference swiglu_ffn.py:66 — encoder 768*4 -> 2048, decoder 1024*4 -> 2736,
        # RF head 3072*4 -> 8192
        assert swiglu_hidden_dim(768 * 4) == 2048
        assert swiglu_hidden_dim(1024 * 4) == 2736
        assert swiglu_hidden_dim(3072 * 4) == 8192


class TestDense:
    def test_dense_matches_torch_linear(self):
        x = rnd(2, 5, 16)
        w = rnd(16, 8, seed=1)
        b = rnd(8, seed=2)
        got = np.asarray(dense(jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)}))
        want = torch.nn.functional.linear(torch.tensor(x), torch.tensor(w.T), torch.tensor(b)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestRope:
    def _torch_rope(self, q, k, pos, dim, theta):
        inv = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
        t = torch.tensor(pos).float()
        freqs = torch.outer(t, inv)
        emb = torch.cat((freqs, freqs), dim=-1)
        cos, sin = emb.cos(), emb.sin()

        def rot(x):
            x1, x2 = x[..., : dim // 2], x[..., dim // 2 :]
            return torch.cat((-x2, x1), dim=-1)

        # x layout here: (B, T, H, D); broadcast cos over heads
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
        return (q * c + rot(q) * s), (k * c + rot(k) * s)

    def test_1d_rope_matches_torch(self):
        B, T, H, D = 1, 6, 2, 16
        q, k = rnd(B, T, H, D), rnd(B, T, H, D, seed=1)
        pos = np.arange(T)
        cos, sin = rope_cos_sin(jnp.asarray(pos)[None], D, 600000.0)
        gq, gk = apply_rope(jnp.asarray(q), jnp.asarray(k), cos, sin)
        wq, wk = self._torch_rope(torch.tensor(q), torch.tensor(k), pos, D, 600000.0)
        np.testing.assert_allclose(np.asarray(gq), wq.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk), wk.numpy(), rtol=1e-4, atol=1e-4)

    def test_mrope_equal_planes_reduces_to_1d(self):
        D = 16
        pos = np.arange(7)
        cos1, sin1 = rope_cos_sin(jnp.asarray(pos)[None], D, 1e4)
        pos3 = jnp.broadcast_to(jnp.asarray(pos)[None, None], (3, 1, 7))
        cos3, sin3 = mrope_cos_sin(pos3, D, 1e4, (2, 3, 3))
        np.testing.assert_allclose(np.asarray(cos1), np.asarray(cos3), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sin1), np.asarray(sin3), rtol=1e-6)

    def test_mrope_interleave_matches_reference_sections(self):
        # distinct planes: verify the i%3 interleave of [s,s,s]*2 chunks
        D = 16
        secs = (2, 3, 3)
        pos3 = jnp.stack(
            [jnp.arange(5)[None], 10 + jnp.arange(5)[None], 20 + jnp.arange(5)[None]]
        )
        cos3_full, _ = rope_cos_sin(pos3, D, 1e4)  # (3, 1, 5, 16)
        cos, _ = mrope_cos_sin(pos3, D, 1e4, secs)
        # chunk boundaries: [0:2]->t, [2:5]->h, [5:8]->w, [8:10]->t, [10:13]->h, [13:16]->w
        np.testing.assert_allclose(np.asarray(cos[..., 0:2]), np.asarray(cos3_full[0, ..., 0:2]))
        np.testing.assert_allclose(np.asarray(cos[..., 2:5]), np.asarray(cos3_full[1, ..., 2:5]))
        np.testing.assert_allclose(np.asarray(cos[..., 5:8]), np.asarray(cos3_full[2, ..., 5:8]))
        np.testing.assert_allclose(np.asarray(cos[..., 8:10]), np.asarray(cos3_full[0, ..., 8:10]))
        np.testing.assert_allclose(np.asarray(cos[..., 13:16]), np.asarray(cos3_full[2, ..., 13:16]))


class TestAttention:
    def _sdpa(self, q, k, v, is_causal=False, mask=None):
        # torch oracle in (B, H, T, D)
        qt = torch.tensor(q).permute(0, 2, 1, 3)
        kt = torch.tensor(k).permute(0, 2, 1, 3)
        vt = torch.tensor(v).permute(0, 2, 1, 3)
        if kt.shape[1] != qt.shape[1]:
            rep = qt.shape[1] // kt.shape[1]
            kt = kt.repeat_interleave(rep, dim=1)
            vt = vt.repeat_interleave(rep, dim=1)
        attn_mask = None if mask is None else torch.tensor(mask)
        out = torch.nn.functional.scaled_dot_product_attention(
            qt, kt, vt, attn_mask=attn_mask, is_causal=is_causal
        )
        return out.permute(0, 2, 1, 3).numpy()

    def test_bidirectional_matches_sdpa(self):
        q, k, v = rnd(2, 9, 4, 16), rnd(2, 9, 4, 16, seed=1), rnd(2, 9, 4, 16, seed=2)
        got = np.asarray(mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        want = self._sdpa(q, k, v)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_causal_gqa_matches_sdpa(self):
        q = rnd(1, 7, 8, 16)
        k, v = rnd(1, 7, 2, 16, seed=1), rnd(1, 7, 2, 16, seed=2)
        got = np.asarray(mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), is_causal=True))
        want = self._sdpa(q, k, v, is_causal=True)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_cached_decode_matches_full_attention(self):
        B, S, H, D = 2, 10, 4, 16
        q_all = rnd(B, S, H, D)
        k_all = rnd(B, S, H, D, seed=1)
        v_all = rnd(B, S, H, D, seed=2)
        full = np.asarray(
            mha(jnp.asarray(q_all), jnp.asarray(k_all), jnp.asarray(v_all), is_causal=True)
        )
        # decode the last position through the cache API with padding
        Smax = 16
        k_cache = np.zeros((B, Smax, H, D), np.float32)
        v_cache = np.zeros((B, Smax, H, D), np.float32)
        k_cache[:, :S] = k_all
        v_cache[:, :S] = v_all
        got = np.asarray(
            cached_decode_attention(
                jnp.asarray(q_all[:, -1:]),
                jnp.asarray(k_cache),
                jnp.asarray(v_cache),
                cache_len=S,
            )
        )
        np.testing.assert_allclose(got[:, 0], full[:, -1], rtol=1e-4, atol=1e-4)


class TestPatching:
    def test_patchify_unpatchify_roundtrip_and_torch_layout(self):
        imgs = rnd(2, 3, 16, 16)
        p = 4
        x = patchify(jnp.asarray(imgs), p)
        # torch oracle (vision_transformer.py:500-513)
        it = torch.tensor(imgs)
        h = w = 16 // p
        xt = it.reshape(2, 3, h, p, w, p)
        xt = torch.einsum("nchpwq->nhwpqc", xt).reshape(2, h * w, p * p * 3)
        np.testing.assert_allclose(np.asarray(x), xt.numpy(), rtol=1e-6)
        back = unpatchify(x, p)
        np.testing.assert_allclose(np.asarray(back), imgs, rtol=1e-6)

    def test_sem_to_pix_expand_matches_einops(self):
        einops = pytest.importorskip("einops")
        x = rnd(2, 16, 4 * 5)  # grid 4x4, ratio 2, c=5
        got = np.asarray(expand_sem_to_pix_tokens(jnp.asarray(x), 2))
        want = einops.rearrange(x, "b (h w) (x y c) -> b (h x w y) c", h=4, w=4, x=2, y=2)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_bicubic_matches_torch_interpolate(self):
        x = rnd(1, 3, 16, 16)
        got = np.asarray(bicubic_resize_torch(jnp.asarray(x), (32, 32)))
        want = torch.nn.functional.interpolate(
            torch.tensor(x), size=(32, 32), mode="bicubic", align_corners=False
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_bicubic_scale_factor_kludge_matches_torch(self):
        # the DINO interpolate_offset path: scale_factor=(w0+0.1)/M
        x = rnd(1, 2, 16, 16)
        M, w0 = 16, 32
        s = (w0 + 0.1) / M
        got = np.asarray(bicubic_resize_torch(jnp.asarray(x), (w0, w0), scale_hw=(s, s)))
        want = torch.nn.functional.interpolate(
            torch.tensor(x), scale_factor=(s, s), mode="bicubic", align_corners=False
        ).numpy()
        assert want.shape[-1] == w0
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_interpolate_pos_embed_identity(self):
        pe = jnp.asarray(rnd(1, 17, 8))  # 4x4 grid + cls(last)
        out = interpolate_pos_embed(pe, 4, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(pe))

    def test_interpolate_pos_embed_cls_preserved(self):
        pe = jnp.asarray(rnd(1, 17, 8))
        out = interpolate_pos_embed(pe, 4, 8)
        assert out.shape == (1, 65, 8)
        np.testing.assert_allclose(np.asarray(out[:, -1]), np.asarray(pe[:, -1]))
