from mingunivision_tpu.parallel.mesh import make_mesh
from mingunivision_tpu.parallel.sharding import (
    cache_sharding,
    llm_param_shardings,
    shard_llm_params,
)

__all__ = ["make_mesh", "llm_param_shardings", "cache_sharding", "shard_llm_params"]
