from mofanerf_tpu.parallel.mesh import (
    make_mesh,
    ray_sharding,
    replicated,
    shard_params_rules,
)

__all__ = ["make_mesh", "ray_sharding", "replicated", "shard_params_rules"]
