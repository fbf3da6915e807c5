from qeft_tpu.data.loaders import get_loaders, get_calibration_tokens
