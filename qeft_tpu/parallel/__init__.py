from qeft_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    cache_shardings,
    shard_params,
)
