from esrnerf_tpu.parallel.mesh import (  # noqa: F401
    ShardHelpers,
    batch_sharding,
    fsdp_param_sharding,
    get_mesh,
    place_params_fsdp,
    replicated,
    shard_batch,
    wrap_step_shard_map,
)
