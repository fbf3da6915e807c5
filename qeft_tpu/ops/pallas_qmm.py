"""Pallas TPU kernels for the packed mixed-precision linear.

TPU-native replacements for the reference CUDA kernels:
- `qgemv` <- gemv_4bit_qeft (decode matvec,
  /root/reference/qeft/kernel/quantization_new/gemv/gemv_cuda_qeft.cu)
- `qgemm` <- gemm_4bit (prefill GEMM with on-the-fly dequant,
  /root/reference/qeft/kernel/quantization_new/gemm/gemm_cuda.cu)

Design: the affine dequant is factored out of the contraction,

    y[b,n] = sum_g  s[g,n] * (x_g . q_g[:,n])  +  sz[g,n] * sum(x_g)

so the per-element work is one nibble unpack + one int->compute-dtype convert,
and the contraction runs on the MXU with fp32 accumulation (exact: codes are
<= 15).  The grid is (M_tiles, N_tiles, groups): packed weight tiles stream
HBM->VMEM double-buffered by the pallas pipeline; a VMEM fp32 scratch
accumulates across the sequential group dimension and writes out once.

The half-group packed layout (ops/packing.py) means group ``gi`` of a weight
is packed rows ``[gi*g/2, (gi+1)*g/2)``: unpacking is one mask and one shift
per byte, the two nibble planes being the two contiguous halves of the group —
no element shuffles (the TPU answer to the reference's AWQ interleave +
`dequantize_s4_to_fp16x2` bit magic, qlinear.py:81-121).

The fp16 outlier ("weak column") slab contributes exactly zero through the
dense path (its codes are the zero-points, packing.py), so its rank-r GEMM is
added outside the kernel where XLA fuses it — same split the reference uses
for prefill (qlinear.py:265-266).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qeft_tpu.ops.packing import QLinearParams


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _qmm_kernel(x_ref, qw_ref, s_ref, sz_ref, out_ref, acc_ref, *, n_groups: int):
    """One (m-tile, n-tile, group) grid step.

    x_ref: [BM, g] — this group's slice of the activations
    qw_ref: [g/2, BN] packed codes
    s_ref/sz_ref: [1, 8, BN] — the 8-group band containing this group
      (TPU block shapes need >=8 sublanes; the group's row is mask-selected)
    acc_ref: [BM, BN] fp32 VMEM scratch, persists across the group dimension.
    """
    gi = pl.program_id(2)

    @pl.when(gi == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cdtype = x_ref.dtype  # bf16 in production; fp32 in parity tests
    g = x_ref.shape[1]
    half = g // 2

    x_g = x_ref[:]
    qw = qw_ref[:].astype(jnp.int32)
    lo = (qw & 0xF).astype(cdtype)
    hi = (qw >> 4).astype(cdtype)
    part = jnp.dot(x_g[:, :half], lo, preferred_element_type=jnp.float32)
    part += jnp.dot(x_g[:, half:], hi, preferred_element_type=jnp.float32)
    sumx = jnp.sum(x_g.astype(jnp.float32), axis=1, keepdims=True)  # [BM, 1]

    row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == (gi % 8)
    s = jnp.sum(s_ref[0].astype(jnp.float32) * row, axis=0)  # [BN]
    sz = jnp.sum(sz_ref[0].astype(jnp.float32) * row, axis=0)
    acc_ref[:] += part * s[None, :] + sumx * sz[None, :]

    @pl.when(gi == n_groups - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _run_qmm(x2d: jax.Array, p: QLinearParams, bm: int, bn: int, dtype) -> jax.Array:
    m, k = x2d.shape
    n = p.out_features
    g = p.group_size if p.group_size > 0 else k
    n_groups = k // g
    grid = (-(-m // bm), n // bn, n_groups)

    kernel = functools.partial(_qmm_kernel, n_groups=n_groups)

    # scales as [G/8, 8, N] bands (sublane-legal blocks; row selected in-kernel)
    g_pad = -(-n_groups // 8) * 8
    scales = jnp.pad(p.scales, ((0, g_pad - n_groups), (0, 0))).reshape(
        g_pad // 8, 8, n
    )
    szeros = jnp.pad(p.scaled_zeros, ((0, g_pad - n_groups), (0, 0))).reshape(
        g_pad // 8, 8, n
    )

    flops = 2 * m * k * n
    bytes_accessed = k * n // 2 + m * k * 2 + m * n * 2 + 2 * n_groups * n * 2
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((grid[0] * bm, n), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, g), lambda i, j, gi: (i, gi), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (g // 2, bn), lambda i, j, gi: (gi, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 8, bn), lambda i, j, gi: (gi // 8, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 8, bn), lambda i, j, gi: (gi // 8, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, gi: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=_interpret(),
    )(x2d, p.qweight, scales, szeros)
    return out[:m]


def _pick_bn(n: int, bn: int) -> int:
    """Largest 128-multiple divisor of n that is <= bn (lane-aligned tiles)."""
    if n % bn == 0:
        return bn
    cand = (bn // 128) * 128
    while cand >= 128:
        if n % cand == 0:
            return cand
        cand -= 128
    return n  # n < 128: single tile


def _flatten_call(x: jax.Array, p: QLinearParams, bm: int, bn: int, dtype):
    lead = x.shape[:-1]
    k = x.shape[-1]
    bn = _pick_bn(p.out_features, bn)
    x2d = x.reshape(-1, k)
    m = x2d.shape[0]
    if m < bm:
        x2d = jnp.pad(x2d, ((0, bm - m), (0, 0)))
    y = _run_qmm(x2d, p, bm, bn, dtype)[:m]
    if p.oweight is not None:
        r = p.oweight.shape[0]
        y = y + jnp.matmul(
            x2d[:m, k - r :], p.oweight.astype(x2d.dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
    y = y.reshape(*lead, p.out_features)
    if p.bias is not None:
        y = y + p.bias.astype(y.dtype)
    return y


def qgemv(x: jax.Array, p: QLinearParams, dtype=jnp.bfloat16) -> jax.Array:
    """Decode path: few tokens, weight-streaming bound."""
    return _flatten_call(x, p, bm=8, bn=512, dtype=dtype)


def qgemm(x: jax.Array, p: QLinearParams, dtype=jnp.bfloat16) -> jax.Array:
    """Prefill/training path: many tokens, MXU bound."""
    return _flatten_call(x, p, bm=256, bn=256, dtype=dtype)
