"""Device-mesh construction.

TPU-native replacement for the reference's vLLM TP/PP + NCCL distributed stack
(SURVEY §2.9): one `jax.sharding.Mesh` with (data, expert, model) axes; every
collective is emitted by XLA from sharding annotations and rides ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from mingunivision_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, expert, model) mesh.

    With no config, all available devices go to the `model` axis (pure TP) —
    the right default for single-host v5e-8 serving of a 16B model.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if cfg is None:
        cfg = MeshConfig(data=1, expert=1, model=n)
    if cfg.num_devices != n:
        raise ValueError(f"mesh {cfg.shape} needs {cfg.num_devices} devices, have {n}")
    arr = np.asarray(devices).reshape(cfg.shape)
    return Mesh(arr, cfg.axis_names)


def local_mesh_1x1() -> Mesh:
    """Trivial single-device mesh (lets the same sharded code run on one chip)."""
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1), ("data", "expert", "model"))
