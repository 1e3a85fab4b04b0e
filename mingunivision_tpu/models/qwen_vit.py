"""Qwen2.5-VL-style dynamic-resolution vision tower (omni checkpoint family).

Capability analog of the vLLM patch's omni vision tower (ming_lite.patch
bailingmm.py: Qwen2.5-ViT with NaViT flat-patch inputs; config.json
vision_config): consumes the flat (N, C*t*p*p) patch rows + grid_thw produced by
`processing/dynamic_image.DynamicImageProcessor`, applies 2-D rotary position
embeddings over each image's (h, w) grid, runs full-attention transformer
blocks, and merges 2x2 spatial neighborhoods through an MLP into LLM-width
embeddings (the "merger").

TPU-first: everything static-shape per call (one image's grid is a static
argument of the jitted apply); blocks are scan-stacked like every other tower.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mingunivision_tpu.models.vit import run_blocks, stacked_block_init
from mingunivision_tpu.ops.activations import gelu_exact
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.norms import layer_norm
from mingunivision_tpu.ops.rope import rotate_half
from mingunivision_tpu.utils.init import linear_init


@dataclass(frozen=True)
class QwenViTConfig:
    patch_size: int = 14
    temporal_patch_size: int = 2
    merge_size: int = 2
    in_chans: int = 3
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_dim: int = 2048  # LLM hidden
    ln_eps: float = 1e-6
    rope_theta: float = 10000.0

    @property
    def patch_input_dim(self) -> int:
        return self.in_chans * self.temporal_patch_size * self.patch_size**2


def init_qwen_vit_params(key, cfg: QwenViTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    merge_in = cfg.embed_dim * cfg.merge_size**2
    return {
        "patch_embed": linear_init(ks[0], cfg.patch_input_dim, cfg.embed_dim, dtype=dtype),
        "blocks": stacked_block_init(ks[1], cfg.depth, cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, "mlp", dtype=dtype),
        "merger": {
            "norm": {"w": jnp.ones((cfg.embed_dim,), dtype), "b": jnp.zeros((cfg.embed_dim,), dtype)},
            "fc1": linear_init(ks[2], merge_in, merge_in, dtype=dtype),
            "fc2": linear_init(ks[3], merge_in, cfg.out_dim, dtype=dtype),
        },
    }


def rot_pos_2d(grid_hw: Tuple[int, int], dim: int, theta: float):
    """2-D rotary tables: half the head dim rotates with the row index, half
    with the column index (Qwen2-VL vision rotary)."""
    h, w = grid_hw
    half = dim // 2
    inv = 1.0 / (theta ** (jnp.arange(0, half, 2, dtype=jnp.float32) / half))
    rows = jnp.repeat(jnp.arange(h), w).astype(jnp.float32)
    cols = jnp.tile(jnp.arange(w), h).astype(jnp.float32)
    fr = rows[:, None] * inv  # (N, half/2)
    fc = cols[:, None] * inv
    freqs = jnp.concatenate([fr, fc], axis=-1)  # (N, half)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (N, dim)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_vision_rope(x, cos, sin):
    """x: (B, N, H, D); cos/sin: (N, D)."""
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    xf = x.astype(jnp.float32)
    return ((xf * c) + (rotate_half(xf) * s)).astype(x.dtype)


def qwen_vit_apply(params, cfg: QwenViTConfig, patch_rows, grid_thw: Tuple[int, int, int]):
    """patch_rows: (N, C*t*p*p) flat rows for ONE image/clip; grid_thw static.

    Returns merged embeddings (N // merge_size^2, out_dim).
    """
    t, h, w = grid_thw
    N = t * h * w
    assert patch_rows.shape[0] == N
    x = dense(patch_rows[None], params["patch_embed"])  # (1, N, D)

    head_dim = cfg.embed_dim // cfg.num_heads
    cos, sin = rot_pos_2d((h, w), head_dim, cfg.rope_theta)
    if t > 1:
        cos = jnp.tile(cos, (t, 1))
        sin = jnp.tile(sin, (t, 1))

    # blocks with rotary injected into q/k: reuse the generic block but wrap the
    # attention by pre-rotating via a custom run (simplest: inline block loop)
    from mingunivision_tpu.models.vit import _qkv, ffn_apply
    from mingunivision_tpu.ops.attention import mha

    def body(carry, p):
        hx = carry
        hn = layer_norm(hx, p["norm1"]["w"], p["norm1"]["b"], eps=cfg.ln_eps)
        q, k, v = _qkv(p, hn, cfg.num_heads)
        q = _apply_vision_rope(q, cos, sin)
        k = _apply_vision_rope(k, cos, sin)
        a = mha(q, k, v)
        hx = hx + dense(a.reshape(hx.shape), p["attn"]["proj"])
        hn = layer_norm(hx, p["norm2"]["w"], p["norm2"]["b"], eps=cfg.ln_eps)
        return hx + ffn_apply(p["mlp"], hn, "mlp"), None

    x, _ = jax.lax.scan(body, x, params["blocks"])

    # merger: 2x2 spatial neighborhoods -> MLP -> out_dim
    m = cfg.merge_size
    x = layer_norm(x, params["merger"]["norm"]["w"], params["merger"]["norm"]["b"], eps=cfg.ln_eps)
    x = x.reshape(t, h // m, m, w // m, m, cfg.embed_dim)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(t * (h // m) * (w // m), m * m * cfg.embed_dim)
    x = dense(gelu_exact(dense(x, params["merger"]["fc1"])), params["merger"]["fc2"])
    return x


# Query-token dictionary for scale-conditioned omni image generation
# (vLLM patch bailingmm.py query tokens for scale-4/8/16; SDK <gen_imageN>).
def init_query_tokens(key, hidden: int, scales=(4, 8, 16), dtype=jnp.float32):
    ks = jax.random.split(key, len(scales))
    return {
        f"scale_{s}": 0.02 * jax.random.normal(k, (s * s, hidden), jnp.float32).astype(dtype)
        for s, k in zip(scales, ks)
    }
