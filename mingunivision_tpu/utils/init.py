"""Weight initializers (torch-compatible shapes & distributions).

Only used for from-scratch init (tests, smoke runs); real checkpoints come through
the weight converter. Linear weights are stored as ``(in, out)`` — the JAX-native
layout for ``x @ w`` — i.e. the TRANSPOSE of torch's ``(out, in)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32).astype(dtype)


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    a = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, jnp.float32, -a, a).astype(dtype)


def linear_init(key, in_dim, out_dim, bias=True, std=0.02, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    p = {"w": trunc_normal(kw, (in_dim, out_dim), std=std, dtype=dtype)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def zeros_linear_init(in_dim, out_dim, bias=True, dtype=jnp.float32):
    p = {"w": jnp.zeros((in_dim, out_dim), dtype)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p
