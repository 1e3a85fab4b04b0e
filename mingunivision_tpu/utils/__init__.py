from mingunivision_tpu.utils.dtypes import DTYPE_MAP, cast_tree, resolve_dtype
from mingunivision_tpu.utils.pytree import tree_size_bytes, tree_param_count

__all__ = [
    "DTYPE_MAP",
    "cast_tree",
    "resolve_dtype",
    "tree_size_bytes",
    "tree_param_count",
]
