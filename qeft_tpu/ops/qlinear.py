"""Forward paths of the packed mixed-precision linear.

Dispatch mirrors the reference's kernel selection (qlinear.py:217-330):
few-token calls take the fused dequant-matvec (Pallas) decode path, larger
calls take the dequant-GEMM prefill path; layers with an input permutation
(o_proj) gather their input first.  All shapes are static under jit, so the
dispatch is resolved at trace time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import os

from qeft_tpu.ops.packing import QLinearParams, dequantize_weight

# tokens below this take the decode (matvec) kernel — reference uses 8
# (qlinear.py:251-253)
DECODE_MAX_TOKENS = 8

# kernel-path override: "1"/"0" forces Pallas on/off; unset = auto (TPU only)
_PALLAS_ENV = "QEFT_PALLAS"


def pallas_enabled() -> bool:
    v = os.environ.get(_PALLAS_ENV)
    if v is not None:
        return v not in ("0", "false", "off")
    return jax.default_backend() == "tpu"


def qlinear_xla(x: jax.Array, p: QLinearParams, dtype=jnp.bfloat16) -> jax.Array:
    """Pure-XLA reference path: dequantize then matmul.

    Used for CPU tests, as the autodiff-friendly training forward, and as the
    prefill path until/unless the Pallas GEMM beats XLA's fusion.  XLA fuses
    the unpack+dequant into the matmul's operand read on TPU.
    """
    w = dequantize_weight(p, dtype)  # [K, N]; outlier rows are exactly 0
    y = jnp.matmul(x.astype(dtype), w)
    if p.oweight is not None:
        r = p.oweight.shape[0]
        y = y + jnp.matmul(x[..., -r:].astype(dtype), p.oweight.astype(dtype))
    if p.bias is not None:
        y = y + p.bias.astype(y.dtype)
    return y


def qlinear_apply(
    x: jax.Array,
    p: QLinearParams,
    use_pallas: bool = True,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Main entry: dynamic-reorder gather (if any) + kernel dispatch.

    ``x``: [..., K].  Returns [..., N].
    """
    if p.reorder_ids is not None:
        x = jnp.take(x, p.reorder_ids, axis=-1)

    tokens = 1
    for d in x.shape[:-1]:
        tokens *= d

    if use_pallas and pallas_enabled():
        from qeft_tpu.ops import pallas_qmm

        if tokens < DECODE_MAX_TOKENS:
            return pallas_qmm.qgemv(x, p, dtype=dtype)
        return pallas_qmm.qgemm(x, p, dtype=dtype)
    return qlinear_xla(x, p, dtype=dtype)
