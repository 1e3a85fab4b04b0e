"""Normalization primitives.

Both norms compute statistics in fp32 and cast back to the input dtype — matching
the reference's fp32-variance RMSNorm (modeling_bailing_moe.py:122-136) and the
autocast-exempt LayerNorms in the ViTs (nn.LayerNorm upcasts internally).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def layer_norm(x, weight=None, bias=None, eps: float = 1e-6):
    """LayerNorm over the last axis; fp32 internals; optional affine."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def rms_norm(x, weight, eps: float = 1e-5):
    """T5-style RMSNorm: fp32 variance, `(weight * x_normed).astype(in_dtype)`.

    Parity: reference BailingMoeRMSNorm (modeling_bailing_moe.py:122-136).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * lax.rsqrt(var + eps)
    return (weight.astype(jnp.float32) * y).astype(dtype)
