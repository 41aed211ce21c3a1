from agacs_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    shard_batch,
    shard_params,
)
