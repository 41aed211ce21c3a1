from agacs_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    opt_state_shard_stats,
    param_sharding_rules,
    shard_batch,
    shard_opt_state,
    shard_params,
)
