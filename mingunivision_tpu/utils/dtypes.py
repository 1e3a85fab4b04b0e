"""Dtype policy helpers.

The framework-wide policy (mirrors the reference autocast boundaries,
mingtok/modeling_mingtok.py:157,:180):
  - params: bf16 for encoder / semantic decoder / LLM / RF head; fp32 for the
    pixel decoder and all LayerNorm/RMSNorm scale vectors' math.
  - compute: bf16 matmuls on the MXU with fp32 accumulation
    (``preferred_element_type=float32``), fp32 softmax and normalization internals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DTYPE_MAP = {
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "float16": jnp.float16,
    "fp16": jnp.float16,
    "int8": jnp.int8,
}


def resolve_dtype(dtype) -> jnp.dtype:
    if isinstance(dtype, str):
        return DTYPE_MAP[dtype]
    return jnp.dtype(dtype)


def cast_tree(tree, dtype):
    """Cast every floating-point leaf of a pytree to `dtype`."""
    dtype = resolve_dtype(dtype)

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
