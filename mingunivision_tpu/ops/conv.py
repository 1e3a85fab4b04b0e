"""1-D convolution primitives (NCW layout) for the audio stack."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


DN = ("NCH", "OIH", "NCH")


def conv1d_init(key, in_ch, out_ch, kernel, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    scale = (1.0 / (in_ch * kernel)) ** 0.5
    return {
        "w": scale * jax.random.normal(kw, (out_ch, in_ch, kernel), jnp.float32).astype(dtype),
        "b": jnp.zeros((out_ch,), dtype),
    }


def conv1d(x, params, *, stride: int = 1, padding="SAME", dilation: int = 1):
    """x: (B, C, T) -> (B, C', T')."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    y = lax.conv_general_dilated(
        x,
        params["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=DN,
        preferred_element_type=jnp.float32,
    )
    return (y + params["b"].astype(jnp.float32)[None, :, None]).astype(x.dtype)


def conv1d_transpose(x, params, *, stride: int, padding: int = 0):
    """Transposed conv (upsampling). Matches torch ConvTranspose1d geometry:
    out = (T-1)*stride - 2*padding + kernel."""
    kernel = params["w"].shape[-1]
    # torch ConvTranspose1d == lhs-dilated conv with flipped, transposed kernel
    w = jnp.flip(params["w"], axis=-1).transpose(1, 0, 2)  # (in, out, k) -> OIH w/ swap
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1,),
        padding=[(kernel - 1 - padding, kernel - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=DN,
        preferred_element_type=jnp.float32,
    )
    return (y + params["b"].astype(jnp.float32)[None, :, None]).astype(x.dtype)


def conv1d_transpose_init(key, in_ch, out_ch, kernel, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    scale = (1.0 / (in_ch * kernel)) ** 0.5
    # stored as (in, out, k) torch-style for transpose conv
    return {
        "w": scale * jax.random.normal(kw, (in_ch, out_ch, kernel), jnp.float32).astype(dtype),
        "b": jnp.zeros((out_ch,), dtype),
    }
