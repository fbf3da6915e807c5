"""qeft-tpu: TPU-native quantization + parameter-efficient fine-tuning framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of QEFT
(arXiv:2410.08661): Hessian-based outlier-column selection with offline global
reordering (OGR), group-wise INT4 GPTQ reconstruction, packed mixed-precision
linears backed by Pallas kernels, and weak-column-tuning (WCT) fine-tuning.
"""

__version__ = "0.1.0"
