"""ming-univision-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of inclusionAI/Ming-UniVision.

A unified autoregressive multimodal model: one Bailing-MoE decoder performs image
understanding, text-to-image generation and multi-round in-context editing over the
continuous latent space of the MingTok-Vision tokenizer, with a rectified-flow MLP
head sampling continuous visual tokens during AR decode.

This is a from-scratch TPU-first design, not a port: pure-functional models over
immutable param pytrees, `lax.scan`-stacked transformer layers, preallocated
static-shape KV caches, capacity-based / ragged MoE dispatch, Pallas kernels on the
hot paths and `jax.sharding.Mesh` (TP/EP/DP) scale-out.

Reference behavior parity is documented per-module against the upstream snapshot
(see docstrings citing `/root/reference/<file>:<line>`).
"""

from mingunivision_tpu.version import __version__

__all__ = ["__version__"]
