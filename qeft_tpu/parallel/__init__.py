from qeft_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    cache_shardings,
    shard_params,
)
from qeft_tpu.parallel.pp import pp_decode_step, pp_shardings
from qeft_tpu.parallel.sp import llama_decode_step_sp, llama_prefill_sp
