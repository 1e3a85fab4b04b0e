"""Qwen2.5-VL vision tower (omni checkpoint family) — CHECKPOINT-EXACT.

The omni model loads `qwen2_5_vit.Qwen2_5_VisionTransformer` via
trust_remote_code (ming_lite.patch :1456-1476; config.json vision_config:
hidden 1280, depth 32, heads 16, window_size 112, fullatt_block_indexes
[7, 15, 23, 31], SiLU SwiGLU MLP, RMSNorm) — the public Qwen2.5-VL
architecture. This implementation matches it activation-for-activation
(golden-tested against transformers' Qwen2_5_VisionTransformerPretrainedModel
in tests/test_omni_golden.py; converter `qwen_vit_params_from_torch`).

Pipeline per image (flat NaViT patch rows + grid_thw):
  patch_embed (linear == the reference Conv3d over one patch) ->
  window-permute tokens in spatial_merge_unit groups ->
  blocks: RMSNorm -> qkv+2D-RoPE attention (window mask, full mask at
  fullatt_block_indexes) -> RMSNorm -> SwiGLU MLP ->
  merger: RMSNorm -> concat 2x2 neighborhoods -> Linear/GELU/Linear ->
  inverse window permutation.

TPU-first: grid_thw is host-known, so the window permutation, rotary tables
and the (N, N) window/full attention masks are precomputed host-side (numpy)
and the whole tower is ONE jitted static-shape call; varlen flash attention is
unnecessary at these lengths (<= a few thousand patches).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mingunivision_tpu.ops.attention import mha
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.norms import rms_norm
from mingunivision_tpu.utils.init import linear_init


@dataclass(frozen=True)
class QwenViTConfig:
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    in_chans: int = 3
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    intermediate_size: int = 3420
    out_dim: int = 2048  # LLM hidden
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    rms_eps: float = 1e-6
    rope_theta: float = 10000.0

    @property
    def patch_input_dim(self) -> int:
        return self.in_chans * self.temporal_patch_size * self.patch_size**2

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size**2


def init_qwen_vit_params(key, cfg: QwenViTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.depth + 3)
    d, m = cfg.embed_dim, cfg.intermediate_size

    def block_init(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        return {
            "norm1": {"w": jnp.ones((d,), dtype)},
            "attn": {
                "qkv": linear_init(k1, d, 3 * d, bias=True, dtype=dtype),
                "proj": linear_init(k2, d, d, bias=True, dtype=dtype),
            },
            "norm2": {"w": jnp.ones((d,), dtype)},
            "mlp": {
                "gate_proj": linear_init(k3, d, m, bias=True, dtype=dtype),
                "up_proj": linear_init(k4, d, m, bias=True, dtype=dtype),
                "down_proj": linear_init(k5, m, d, bias=True, dtype=dtype),
            },
        }

    blocks = jax.vmap(block_init)(jax.random.split(ks[0], cfg.depth))
    merged = d * cfg.merge_unit
    return {
        "patch_embed": {"w": 0.02 * jax.random.normal(ks[1], (cfg.patch_input_dim, d), dtype)},
        "blocks": blocks,
        "merger": {
            "ln_q": {"w": jnp.ones((d,), dtype)},
            "fc1": linear_init(ks[2], merged, merged, bias=True, dtype=dtype),
            "fc2": linear_init(ks[cfg.depth + 2], merged, cfg.out_dim, bias=True, dtype=dtype),
        },
    }


# ---------------------------------------------------------------------------
# Host-side geometry (grid_thw is host-known; all numpy)
# ---------------------------------------------------------------------------


def rot_pos_ids(grid_thw, merge_size: int) -> np.ndarray:
    """(h, w) position ids per patch token in merge-window order
    (reference rot_pos_emb, modeling_qwen2_5_vl)."""
    out = []
    for t, h, w in grid_thw:
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hpos = hpos.reshape(h // merge_size, merge_size, w // merge_size, merge_size)
        hpos = hpos.transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wpos = wpos.reshape(h // merge_size, merge_size, w // merge_size, merge_size)
        wpos = wpos.transpose(0, 2, 1, 3).reshape(-1)
        out.append(np.tile(np.stack([hpos, wpos], axis=-1), (t, 1)))
    return np.concatenate(out, axis=0)  # (N, 2)


def window_partition(grid_thw, cfg: QwenViTConfig):
    """Window permutation over spatial_merge_unit token groups + per-token
    window/image ids (reference get_window_index)."""
    merge = cfg.spatial_merge_size
    wms = cfg.window_size // merge // cfg.patch_size  # merger windows per side
    index_parts, win_ids_parts = [], []
    img_ids_parts = []
    base = 0
    win_base = 0
    for img_i, (t, h, w) in enumerate(grid_thw):
        lh, lw = h // merge, w // merge
        index = np.arange(t * lh * lw).reshape(t, lh, lw)
        # the reference pads by wms - lh % wms even when divisible (an all- -100
        # pad window that drops out) — ordering is identical with zero pad there
        pad_h = (-lh) % wms
        pad_w = (-lw) % wms
        nh, nw = (lh + pad_h) // wms, (lw + pad_w) // wms
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        padded[:, :lh, :lw] = index
        padded = padded.reshape(t, nh, wms, nw, wms).transpose(0, 1, 3, 2, 4).reshape(-1, wms, wms)
        flat = padded.reshape(-1)
        valid = flat != -100
        order = flat[valid]
        index_parts.append(order + base)
        # window id per ordered token group
        win_of_group = np.repeat(np.arange(padded.shape[0]), wms * wms)[valid]
        win_ids_parts.append(win_of_group + win_base)
        img_ids_parts.append(np.full(order.shape, img_i, np.int64))
        base += t * lh * lw
        win_base += padded.shape[0]
    window_index = np.concatenate(index_parts)  # group-level permutation
    win_ids = np.concatenate(win_ids_parts)
    img_ids = np.concatenate(img_ids_parts)
    return window_index, win_ids, img_ids


def vit_geometry(grid_thw, cfg: QwenViTConfig):
    """All data-independent tensors for one call: token permutation, rotary
    cos/sin (permuted order), window mask, full mask."""
    grid_thw = np.asarray(grid_thw).reshape(-1, 3)
    pos = rot_pos_ids(grid_thw, cfg.spatial_merge_size)  # (N, 2)
    window_index, win_ids, img_ids = window_partition(grid_thw, cfg)
    unit = cfg.merge_unit
    N = pos.shape[0]
    perm = (window_index[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)  # token-level
    inv_perm = np.argsort(perm)

    half = cfg.head_dim // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, half, 2, dtype=np.float64) / half))
    freqs = (pos[..., None].astype(np.float64) * inv_freq[None, None, :]).reshape(N, -1)  # (N, hd/2)
    freqs = freqs[perm]
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos, sin = np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)

    tok_win = np.repeat(win_ids, unit)
    tok_img = np.repeat(img_ids, unit)
    win_mask = tok_win[:, None] == tok_win[None, :]
    full_mask = tok_img[:, None] == tok_img[None, :]
    # full mask must be expressed in the SAME (permuted) order as the tokens
    return perm, inv_perm, cos, sin, win_mask, full_mask


# ---------------------------------------------------------------------------
# Jitted apply
# ---------------------------------------------------------------------------


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def qwen_vit_apply(params, cfg: QwenViTConfig, patch_rows, grid_thw):
    """patch_rows: (N, C*t*p*p) flat NaViT rows; grid_thw: host ints.

    Returns (N / merge_unit, out_dim) merged embeddings in original order."""
    perm, _, cos, sin, win_mask, full_mask = vit_geometry(grid_thw, cfg)
    fullatt = np.zeros((cfg.depth,), bool)
    fullatt[list(cfg.fullatt_block_indexes)] = True
    return _qwen_vit_jit(
        params,
        cfg,
        patch_rows,
        jnp.asarray(perm),
        jnp.asarray(cos),
        jnp.asarray(sin),
        jnp.asarray(win_mask),
        jnp.asarray(full_mask),
        jnp.asarray(fullatt),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _qwen_vit_jit(params, cfg: QwenViTConfig, patch_rows, perm, cos, sin, win_mask, full_mask, fullatt):
    N = patch_rows.shape[0]
    H, D = cfg.num_heads, cfg.head_dim
    x = jnp.einsum("ni,id->nd", patch_rows, params["patch_embed"]["w"].astype(patch_rows.dtype))
    x = jnp.take(x, perm, axis=0)

    cosb = cos[None, :, None, :]  # (1, N, 1, hd) — same rotation for every head
    sinb = sin[None, :, None, :]

    def block(carry, inp):
        h = carry
        p, is_full = inp
        hn = rms_norm(h, p["norm1"]["w"], eps=cfg.rms_eps)
        qkv = dense(hn, p["attn"]["qkv"]).reshape(N, 3, H, D)
        q, k, v = qkv[:, 0][None], qkv[:, 1][None], qkv[:, 2][None]  # (1, N, H, D)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cosb + _rotate_half(qf) * sinb).astype(h.dtype)
        k = (kf * cosb + _rotate_half(kf) * sinb).astype(h.dtype)
        mask = jnp.where(is_full, full_mask, win_mask)[None, None]  # (1, 1, N, N)
        a = mha(q, k, v, mask=mask, scale=D**-0.5)[0].reshape(N, H * D)
        h = h + dense(a, p["attn"]["proj"])
        hn = rms_norm(h, p["norm2"]["w"], eps=cfg.rms_eps)
        g = dense(hn, p["mlp"]["gate_proj"])
        u = dense(hn, p["mlp"]["up_proj"])
        h = h + dense(jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u, p["mlp"]["down_proj"])
        return h, None

    x, _ = jax.lax.scan(block, x, (params["blocks"], fullatt))

    # merger: RMSNorm -> concat merge_unit neighbors -> MLP
    m = params["merger"]
    x = rms_norm(x, m["ln_q"]["w"], eps=cfg.rms_eps).reshape(N // cfg.merge_unit, -1)
    x = dense(x, m["fc1"])
    x = dense(jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype), m["fc2"])
    # undo the window permutation at GROUP level (merger collapsed each group)
    group_inv = jnp.argsort(perm[:: cfg.merge_unit] // cfg.merge_unit)
    return jnp.take(x, group_inv, axis=0)


def init_query_tokens(key, hidden: int, scales=(4, 8, 16), dtype=jnp.float32):
    """Query-token dict for scale-4/8/16 image generation (omni path,
    ming_lite.patch :1512-1527): L2-normalized (s*s, hidden) tables."""
    out = {}
    for i, s in enumerate(scales):
        t = jax.random.normal(jax.random.fold_in(key, i), (s * s, hidden), jnp.float32)
        out[f"{s}x{s}"] = (t / jnp.linalg.norm(t, axis=-1, keepdims=True)).astype(dtype)
    return out
