"""Param-pytree helpers (models are pure functions over nested dict params)."""

from __future__ import annotations

import jax
import numpy as np


def tree_param_count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "shape"))


def tree_size_bytes(tree) -> int:
    return sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "shape") and hasattr(x, "dtype")
    )


def flatten_with_paths(tree, prefix=""):
    """Yield (dotted_path, leaf) pairs for a nested-dict pytree."""
    if isinstance(tree, dict):
        for k in sorted(tree.keys()):
            yield from flatten_with_paths(tree[k], f"{prefix}{k}." if prefix or True else k)
    else:
        yield prefix.rstrip("."), tree
