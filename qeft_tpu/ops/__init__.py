from qeft_tpu.ops.packing import (
    pack_codes,
    unpack_codes,
    pack_layer,
    QLinearParams,
    dequantize_weight,
)
from qeft_tpu.ops.qlinear import qlinear_apply, qlinear_xla
