"""Dense layers over `(in, out)`-layout weights with fp32 MXU accumulation."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def dense(x, params, *, precision=None):
    """x @ w (+ b). Weights are stored `(in, out)`; accumulate fp32 on the MXU.

    fp32 inputs default to HIGHEST precision (the fp32 pixel-decoder path needs
    true-fp32 matmuls for PSNR parity); bf16 inputs run at full MXU rate.
    Accepts int8 `QuantizedArray` weights (dequantized in the weight stream).
    """
    from mingunivision_tpu.utils.quantize import dequant_weight

    w = params["w"]
    if precision is None and x.dtype == jnp.float32:
        precision = lax.Precision.HIGHEST
    y = lax.dot_general(
        x,
        dequant_weight(w, x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)
