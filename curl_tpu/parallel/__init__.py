"""Device-mesh parallelism utilities."""

from curl_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    local_mesh_cpu,
    make_mesh,
    replicated,
    shard_pytree,
)
