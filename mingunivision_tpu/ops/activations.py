"""Activations.

torch ``nn.GELU()`` defaults to the exact erf formulation — so our GELU must use
``approximate=False`` (JAX defaults to the tanh approximation, a real parity trap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def silu(x):
    return jax.nn.silu(x)


def swiglu(x12):
    """SwiGLU on a fused last-dim tensor: silu(x1) * x2 with x12 = [x1; x2].

    Parity: SwiGLUFFN.forward (mingtok/vision_transformer/layers/swiglu_ffn.py:33).
    """
    x1, x2 = jnp.split(x12, 2, axis=-1)
    return jax.nn.silu(x1) * x2


def swiglu_hidden_dim(hidden_features: int) -> int:
    """SwiGLUFFNFused hidden sizing: round8(2/3 * hidden).

    Parity: swiglu_ffn.py:66 — ``(int(h * 2 / 3) + 7) // 8 * 8``.
    """
    return (int(hidden_features * 2 / 3) + 7) // 8 * 8
