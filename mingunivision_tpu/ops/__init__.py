from mingunivision_tpu.ops.norms import layer_norm, rms_norm
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.ops.activations import gelu_exact, silu

__all__ = ["layer_norm", "rms_norm", "dense", "gelu_exact", "silu"]
