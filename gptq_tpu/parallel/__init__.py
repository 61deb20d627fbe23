from gptq_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_params,
    sharding_rules,
)
