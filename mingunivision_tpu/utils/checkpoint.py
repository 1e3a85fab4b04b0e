"""Checkpoint I/O.

Two formats:
  1. Reference HF checkpoints: safetensors shards (+ index json) holding the
     torch state dict — loaded lazily as numpy and converted via utils/convert.py
     (replaces HF from_pretrained, SURVEY §5 "checkpoint/resume").
  2. Native format: Orbax save/restore of our param pytrees (fast TPU-sharded
     restore for serving).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# safetensors (HF torch checkpoints)
# ---------------------------------------------------------------------------


def load_safetensors_dir(path: str, dtype=None, use_native: bool = True) -> Dict[str, np.ndarray]:
    """Load every *.safetensors shard in `path` into one flat name->array dict.

    With `use_native` (default) shards are mmap'd and materialized through the
    multithreaded C++ reader (utils/native_io.py) — the fast path for 16B-class
    checkpoints; falls back to the `safetensors` python reader otherwise.
    """
    out: Dict[str, np.ndarray] = {}
    shards = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not shards:
        raise FileNotFoundError(f"no .safetensors shards under {path}")

    if use_native:
        from mingunivision_tpu.utils.native_io import SafetensorsFile, load_native

        if load_native() is not None:
            for shard in shards:
                f = SafetensorsFile(os.path.join(path, shard))
                for name in f.keys():
                    arr = f.read(name)
                    out[name] = arr if dtype is None else arr.astype(dtype)
                f.close()
            return out

    from safetensors import safe_open

    for shard in shards:
        with safe_open(os.path.join(path, shard), framework="np") as f:
            for name in f.keys():
                arr = f.get_tensor(name)
                if arr.dtype.kind == "V":  # raw bf16 surfaces as void16 on old numpy
                    import ml_dtypes

                    arr = arr.view(ml_dtypes.bfloat16)
                out[name] = arr if dtype is None else arr.astype(dtype)
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load either safetensors shards or a torch .bin/.pt checkpoint as numpy."""
    if os.path.isdir(path) and any(f.endswith(".safetensors") for f in os.listdir(path)):
        return load_safetensors_dir(path)
    import torch

    if os.path.isdir(path):
        cands = [f for f in os.listdir(path) if f.endswith((".bin", ".pt", ".pth"))]
        if not cands:
            raise FileNotFoundError(f"no checkpoint files under {path}")
        sd: Dict[str, np.ndarray] = {}
        for c in sorted(cands):
            chunk = torch.load(os.path.join(path, c), map_location="cpu", weights_only=True)
            if "model" in chunk and isinstance(chunk["model"], dict):
                chunk = chunk["model"]  # MingTok raw-ckpt layout (modeling_mingtok.py:129-138)
            sd.update({k: v.float().numpy() for k, v in chunk.items() if hasattr(v, "numpy")})
        return sd
    chunk = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in chunk and isinstance(chunk["model"], dict):
        chunk = chunk["model"]
    return {
        k: v.float().numpy()
        for k, v in chunk.items()
        if hasattr(v, "numpy") and not k.startswith("target_backbone")
    }


# ---------------------------------------------------------------------------
# Orbax (native pytree checkpoints)
# ---------------------------------------------------------------------------


def save_pytree(path: str, params) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def restore_pytree(path: str, template=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, target=template)
    return ckptr.restore(path)


class AsyncTrainCheckpointer:
    """Async training checkpoints: `save()` snapshots device state and returns
    immediately (Orbax serializes in background threads); the train loop keeps
    stepping while the previous checkpoint writes. `wait()`/close() join.

    TPU-native replacement for blocking torch.save-style checkpointing in a
    training loop (the reference has no training checkpointing at all —
    SURVEY §5 checkpoint/resume)."""

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path: str, state) -> None:
        import orbax.checkpoint as ocp

        self._ckptr.save(os.path.abspath(path), args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def restore(self, path: str, template):
        import orbax.checkpoint as ocp

        self.wait()
        return self._ckptr.restore(os.path.abspath(path), args=ocp.args.StandardRestore(template))

    def close(self) -> None:
        self.wait()
        self._ckptr.close()
