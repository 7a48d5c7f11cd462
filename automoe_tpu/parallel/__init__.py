from automoe_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from automoe_tpu.parallel.pp import (  # noqa: F401
    pipeline_apply,
    stage_param_sharding,
)
from automoe_tpu.parallel.sp import (  # noqa: F401
    shard_batch_spatial,
    spatial_batch_shardings,
)
