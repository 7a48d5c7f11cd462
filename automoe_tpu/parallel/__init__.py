from automoe_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
