"""Patchification, spatial expansion and torch-parity bicubic interpolation.

These small deterministic ops are where reconstruction parity is easiest to lose
(SURVEY §7 "hard parts" #3); each has a golden unit test against the reference
semantics.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def patchify(imgs, patch_size: int):
    """(B, 3, H, W) -> (B, L, p*p*3).

    Parity: TransformerDecoder.patchify (vision_transformer.py:500-513) —
    per-patch layout is (p, q, c) i.e. channel-last within the flattened patch.
    """
    B, C, H, W = imgs.shape
    p = patch_size
    h, w = H // p, W // p
    x = imgs.reshape(B, C, h, p, w, p)
    x = jnp.einsum("nchpwq->nhwpqc", x)
    return x.reshape(B, h * w, p * p * C)


def unpatchify(x, patch_size: int):
    """(B, L, p*p*3) -> (B, 3, H, W) for square L.

    Parity: vision_transformer.py:515-527.
    """
    B, L, _ = x.shape
    p = patch_size
    h = w = int(math.isqrt(L))
    assert h * w == L, f"unpatchify needs square token count, got {L}"
    x = x.reshape(B, h, w, p, p, 3)
    x = jnp.einsum("nhwpqc->nchpwq", x)
    return x.reshape(B, 3, h * p, w * p)


def expand_sem_to_pix_tokens(x, ratio: int):
    """Spatially expand semantic tokens for the pixel decoder.

    (B, hw, (ratio*ratio*C)) -> (B, hw*ratio*ratio, C) with einops pattern
    "b (h w) (x y c) -> b (h x w y) c" (modeling_mingtok.py:184-188): token (h,w)
    sub-position (x,y) lands at flat index ((h*r + x)*w_grid*r + w*r + y).
    """
    B, L, D = x.shape
    h = w = int(math.isqrt(L))
    assert h * w == L
    r = ratio
    c = D // (r * r)
    x = x.reshape(B, h, w, r, r, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # b h x w y c
    return x.reshape(B, h * r * w * r, c)


# ---------------------------------------------------------------------------
# torch-parity bicubic interpolation (for positional-embedding resizing)
# ---------------------------------------------------------------------------


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch's cubic convolution kernel (a = -0.75; PIL uses a = -0.5)."""
    t = np.abs(t)
    out = np.zeros_like(t)
    m1 = t <= 1
    out[m1] = ((a + 2) * t[m1] - (a + 3)) * t[m1] * t[m1] + 1
    m2 = (t > 1) & (t < 2)
    out[m2] = (((t[m2] - 5) * t[m2] + 8) * t[m2] - 4) * a
    return out


@lru_cache(maxsize=64)
def _bicubic_weight_matrix(in_size: int, out_size: int, scale: float | None) -> np.ndarray:
    """Dense (out, in) interpolation matrix for one axis.

    Matches torch F.interpolate(mode="bicubic", align_corners=False):
      src = (dst + 0.5) / scale - 0.5, with scale = out/in unless an explicit
      scale_factor was provided (torch uses the PROVIDED factor for coordinate
      mapping when recompute_scale_factor=False — this is how the reference's
      interpolate_offset=0.1 kludge takes effect, vision_transformer.py:198-203).
    Border handling: index clamp; no antialiasing.
    """
    s = scale if scale is not None else out_size / in_size
    j = np.arange(out_size, dtype=np.float64)
    x = (j + 0.5) / s - 0.5
    i0 = np.floor(x).astype(np.int64)
    t = x - i0
    W = np.zeros((out_size, in_size), dtype=np.float64)
    for k in range(-1, 3):
        w = _cubic_kernel(t - k)
        idx = np.clip(i0 + k, 0, in_size - 1)
        np.add.at(W, (np.arange(out_size), idx), w)
    return W.astype(np.float32)


def bicubic_resize_torch(x, out_hw, scale_hw=None):
    """torch-parity bicubic resize of (..., H, W) arrays (fp32 math).

    scale_hw: optional (sh, sw) explicit scale factors (see matrix docstring).
    """
    H, W = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    sh, sw = (scale_hw if scale_hw is not None else (None, None))
    Mh = jnp.asarray(_bicubic_weight_matrix(H, oh, sh))
    Mw = jnp.asarray(_bicubic_weight_matrix(W, ow, sw))
    dtype = x.dtype
    y = jnp.einsum("oh,...hw->...ow", Mh, x.astype(jnp.float32), precision="highest")
    y = jnp.einsum("pw,...ow->...op", Mw, y, precision="highest")
    return y.astype(dtype)


def interpolate_pos_embed(pos_embed, grid_size: int, new_grid: int, *, offset: float = 0.1, cls_last: bool = True):
    """Resize a ViT positional embedding table to a new grid.

    pos_embed: (1, N+1, D) with the CLS position LAST (encoder appends CLS after
    patch tokens — vision_transformer.py:218-223, a reference quirk).
    Returns (1, new_grid**2 + 1, D), CLS still last. fp32 math, cast back.

    Parity: VisionTransformerEncoder.interpolate_pos_encoding
    (vision_transformer.py:183-215) including the interpolate_offset scale kludge.
    """
    if new_grid == grid_size:
        return pos_embed
    dtype = pos_embed.dtype
    pe = pos_embed.astype(jnp.float32)
    if cls_last:
        patch_pe, cls_pe = pe[:, :-1], pe[:, -1:]
    else:
        cls_pe, patch_pe = pe[:, :1], pe[:, 1:]
    D = patch_pe.shape[-1]
    grid = patch_pe.reshape(1, grid_size, grid_size, D).transpose(0, 3, 1, 2)  # (1, D, M, M)
    if offset:
        s = float(new_grid + offset) / grid_size
        out = bicubic_resize_torch(grid, (new_grid, new_grid), scale_hw=(s, s))
    else:
        out = bicubic_resize_torch(grid, (new_grid, new_grid))
    out = out.transpose(0, 2, 3, 1).reshape(1, new_grid * new_grid, D)
    if cls_last:
        return jnp.concatenate([out, cls_pe], axis=1).astype(dtype)
    return jnp.concatenate([cls_pe, out], axis=1).astype(dtype)
