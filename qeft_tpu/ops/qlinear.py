"""Forward + backward of the packed mixed-precision linear.

Dispatch mirrors the reference's kernel selection (qlinear.py:217-330):
few-token calls take the fused dequant-matvec (Pallas) decode path, larger
calls take the dequant-GEMM prefill path.  All shapes are static under jit,
so the dispatch is resolved at trace time.

Training: `qlinear_apply` carries a `jax.custom_vjp`, so WCT fine-tuning
differentiates THROUGH the Pallas forward (pallas_call has no autodiff rule
of its own).  The backward is the TPU-native counterpart of the reference's
`QuantMatMulQEFT.backward` (/root/reference/qeft/qlinear.py:28-44) with its
square-layer-only quirk fixed:

    grad_input   = g @ W_deq^T              (true transpose; Pallas `qgemm_t`
                                             streams the packed codes, or the
                                             XLA dequant path off-TPU)
                 + pad_last_r(g @ oweight^T) (fp weak-column slab)
    grad_oweight = x[..., -r:]^T @ g        (the only trainable parameter)
    grad_bias    = sum g
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

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

    Used for CPU tests and as the non-TPU fallback.  XLA fuses the
    unpack+dequant into the matmul's operand read on TPU.
    """
    w = dequantize_weight(p, dtype)  # [K, N]; outlier rows are exactly 0
    y = jnp.matmul(x.astype(dtype), w)
    if p.oweight is not None:
        r = p.oweight.shape[0]
        y = y + jnp.matmul(x[..., -r:].astype(dtype), p.oweight.astype(dtype))
    if p.bias is not None:
        y = y + p.bias.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# custom-vjp core: primal args are the individual buffers so cotangents can be
# returned per-leaf (oweight is the trainable one; int qweight gets float0)


def _num_tokens(x: jax.Array) -> int:
    tokens = 1
    for d in x.shape[:-1]:
        tokens *= d
    return tokens


def _forward_impl(spec, x, qweight, scales, scaled_zeros, oweight, bias):
    group_size, use_pallas, dtype_name = spec
    dtype = jnp.dtype(dtype_name)
    p = QLinearParams(
        qweight=qweight, scales=scales, scaled_zeros=scaled_zeros,
        oweight=oweight, bias=bias, group_size=group_size,
    )
    if use_pallas and pallas_enabled():
        from qeft_tpu.ops import pallas_qmm

        if _num_tokens(x) < DECODE_MAX_TOKENS:
            return pallas_qmm.qgemv(x, p, dtype=dtype)
        return pallas_qmm.qgemm(x, p, dtype=dtype)
    return qlinear_xla(x, p, dtype=dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _qlinear_core(spec, x, qweight, scales, scaled_zeros, oweight, bias):
    return _forward_impl(spec, x, qweight, scales, scaled_zeros, oweight, bias)


def _core_fwd(spec, x, qweight, scales, scaled_zeros, oweight, bias):
    y = _forward_impl(spec, x, qweight, scales, scaled_zeros, oweight, bias)
    return y, (x, qweight, scales, scaled_zeros, oweight, bias)


def _core_bwd(spec, res, g):
    x, qweight, scales, scaled_zeros, oweight, bias = res
    group_size, use_pallas, dtype_name = spec
    dtype = jnp.dtype(dtype_name)
    p = QLinearParams(
        qweight=qweight, scales=scales, scaled_zeros=scaled_zeros,
        oweight=oweight, bias=bias, group_size=group_size,
    )
    n = g.shape[-1]
    k = x.shape[-1]
    g2 = g.reshape(-1, n)
    x2 = x.reshape(-1, k)

    # dense part: dx = g @ W_deq^T (outlier rows of W_deq are exactly zero)
    if use_pallas and pallas_enabled():
        from qeft_tpu.ops import pallas_qmm

        dx2 = pallas_qmm.qgemm_t(g2, p, dtype=dtype).astype(jnp.float32)
    else:
        w = dequantize_weight(p, dtype)  # [K, N]
        dx2 = jax.lax.dot_general(
            g2.astype(dtype), w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if oweight is not None:
        r = oweight.shape[0]
        ow = oweight.astype(dtype)
        dx_out = jax.lax.dot_general(
            g2.astype(dtype), ow, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [M, r]
        dx2 = dx2.at[:, k - r :].add(dx_out)
        dow = jax.lax.dot_general(
            x2[:, k - r :].astype(dtype), g2.astype(dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(oweight.dtype)  # [r, N]
    else:
        dow = None

    dbias = None if bias is None else jnp.sum(g2, axis=0).astype(bias.dtype)
    dx = dx2.reshape(x.shape).astype(x.dtype)

    # frozen buffers: int codes get float0 (non-differentiable), float
    # scale/zero buffers get symbolic-cheap zeros (DCE'd — only oweight is
    # ever requested by the WCT optimizer)
    dqw = np.zeros(qweight.shape, dtype=jax.dtypes.float0)
    ds = jnp.zeros_like(scales)
    dsz = jnp.zeros_like(scaled_zeros)
    return (dx, dqw, ds, dsz, dow, dbias)


_qlinear_core.defvjp(_core_fwd, _core_bwd)


def qlinear_apply(
    x: jax.Array,
    p: QLinearParams,
    use_pallas: bool = True,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Main entry: kernel dispatch with a training-safe custom vjp.

    ``x``: [..., K].  Returns [..., N].

    Linears packed without a static model reorder carry ``reorder_ids``: the
    input gathers into the weight's sorted (outliers-last) order first.  The
    gather sits OUTSIDE the custom vjp, so autodiff transposes it for free.
    """
    if p.reorder_ids is not None:
        x = jnp.take(x, p.reorder_ids, axis=-1)
    spec = (p.group_size, bool(use_pallas), jnp.dtype(dtype).name)
    return _qlinear_core(
        spec, x, p.qweight, p.scales, p.scaled_zeros, p.oweight, p.bias
    )


def qlinear_fused_stage(
    x: jax.Array,
    sl,
    lnw: jax.Array = None,
    residual: jax.Array = None,
    eps: float = 1e-5,
    one_offset: bool = False,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """One decoder STAGE as a single stacked pallas_call: RMS-norm prologue
    (``lnw`` given — qkv/upgate stages take the RAW residual), packed matvec,
    in-kernel weak-column GEMM, residual-add epilogue (``residual`` given —
    o/down stages).  Inference-only.

    Replaces the per-stage chain norm -> plane-permute -> kernel -> outlier
    matmul -> add that round 2 ran as ~6 separate XLA/pallas computations per
    stage (BASELINE.md: ~3.4 ms/token of non-matvec overhead in the decode
    loop).  Falls back to the composed ops whenever the kernel can't apply
    (no Pallas, >8 tokens, per-layer reorder_ids, bias)."""
    p = sl.params
    if (
        pallas_enabled()
        and _num_tokens(x) <= 8
        and p.reorder_ids is None
        and p.bias is None
    ):
        from qeft_tpu.ops import pallas_qmm

        return pallas_qmm.qgemv_stacked_fused(
            x, p, sl.idx, lnw=lnw, residual=residual, eps=eps,
            one_offset=one_offset, dtype=dtype,
        )
    if lnw is not None:
        from qeft_tpu.models.llama import rms_norm

        x = rms_norm(x, lnw, eps, one_offset)
    y = qlinear_apply_stacked(x, sl, dtype=dtype)
    return y if residual is None else residual + y


def qlinear_apply_stacked(x: jax.Array, sl, dtype=jnp.bfloat16) -> jax.Array:
    """Apply layer ``sl.idx`` of a STACKED QLinearParams (see
    packing.StackedLinear).  Inference-only (no custom vjp): the decode-shaped
    forwards are the only callers.

    Few tokens + Pallas: qgemv_stacked selects the layer inside the kernel's
    index map (no weight copy).  Otherwise: slice the layer out (the prefill
    GEMM's MXU time dominates the slice) and take the regular path.
    """
    p = sl.params
    if (
        pallas_enabled()
        and _num_tokens(x) < DECODE_MAX_TOKENS
        and p.reorder_ids is None
    ):
        from qeft_tpu.ops import pallas_qmm

        return pallas_qmm.qgemv_stacked(x, p, sl.idx, dtype=dtype)
    lin = jax.tree.map(lambda a: jax.lax.dynamic_index_in_dim(a, sl.idx, 0, False), p)
    return qlinear_apply(x, lin, dtype=dtype)
