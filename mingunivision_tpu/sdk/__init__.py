from mingunivision_tpu.sdk.ming import Ming, MingUtils

__all__ = ["Ming", "MingUtils"]
