"""Dense layers over `(in, out)`-layout weights with fp32 MXU accumulation."""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp
from jax import lax

# fp32 matmul precision policy (trace-time). HIGHEST = true fp32 (6-pass on the
# MXU); "high" = bf16x3 (~fp32-class accuracy at ~3x the bf16 cost) — the
# fp32 pixel decoder can trade between them (PixelDecoderConfig.matmul_precision).
_FP32_PRECISION = contextvars.ContextVar("fp32_precision", default=lax.Precision.HIGHEST)

_PRECISIONS = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}


@contextlib.contextmanager
def fp32_matmul_precision(name: str):
    tok = _FP32_PRECISION.set(_PRECISIONS[name])
    try:
        yield
    finally:
        _FP32_PRECISION.reset(tok)


def dense(x, params, *, precision=None):
    """x @ w (+ b). Weights are stored `(in, out)`; accumulate fp32 on the MXU.

    fp32 inputs default to HIGHEST precision (the fp32 pixel-decoder path needs
    true-fp32 matmuls for PSNR parity); bf16 inputs run at full MXU rate.
    Accepts int8 `QuantizedArray` weights (dequantized in the weight stream).
    """
    from mingunivision_tpu.utils.quantize import dequant_weight

    w = params["w"]
    if precision is None and x.dtype == jnp.float32:
        precision = _FP32_PRECISION.get()
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
