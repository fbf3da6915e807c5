from qeft_tpu.quant.quantizer import (
    QuantSpec,
    QuantParams,
    find_params,
    quantize,
    fake_quantize,
)
from qeft_tpu.quant.gptq import gptq_quantize, hessian_from_inputs, LayerQuantResult
from qeft_tpu.quant.outliers import hessian_sort_ids, select_global_outliers
from qeft_tpu.quant.reorder import sparse_to_dense_ids, inverse_permutation
