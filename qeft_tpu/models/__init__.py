from qeft_tpu.models.llama import (
    LlamaConfig,
    LLAMA_PRESETS,
    init_params,
    llama_forward,
    llama_prefill,
    llama_decode_step,
    init_kv_cache,
)
from qeft_tpu.models.registry import ModelMeta, get_model_meta
