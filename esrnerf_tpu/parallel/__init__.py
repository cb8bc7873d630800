from esrnerf_tpu.parallel.mesh import (  # noqa: F401
    ShardHelpers,
    batch_sharding,
    get_mesh,
    replicated,
    shard_batch,
    wrap_step_shard_map,
)
