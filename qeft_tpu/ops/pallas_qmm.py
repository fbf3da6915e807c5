"""Pallas TPU kernels for the packed mixed-precision linear.

TPU-native replacements for the reference CUDA kernels:
- `qgemv` <- gemv_4bit_qeft (decode matvec,
  /root/reference/qeft/kernel/quantization_new/gemv/gemv_cuda_qeft.cu)
- `qgemm` <- gemm_4bit (prefill GEMM with on-the-fly dequant,
  /root/reference/qeft/kernel/quantization_new/gemm/gemm_cuda.cu)

Kernel contract (see ops/packing.py): weights pack 8 codes per int32 with
plane striding, so nibble plane ``p`` of a weight tile is a contiguous K-slab
per group.  Everything in the kernel stays in native 32-bit lanes:

    for p in 0..7:   (static unroll)
        plane  = (qw >> 4p) & 0xF          # int32 shift+mask
        w_p    = f32(plane) * scale        # native int32->f32, group broadcast
        acc   += x_p @ bf16(w_p)           # one big MXU dot per plane
    acc += sumx @ scaled_zeros             # zero-points via one small dot

``x_p`` are the activations in plane-major order and ``sumx`` the per-group
activation sums, both computed outside the kernel (tiny XLA ops).  No
per-group small dots (MXU latency), no sub-32-bit integer relayouts (Mosaic
has no native u8->f path), no dynamic indexing (Mosaic needs static sublane
offsets).  Packed tiles stream HBM->VMEM in [K/8, BN] int32 bursts (1-3 MB),
double-buffered across the N-tile grid by the pallas pipeline.

The fp16 outlier ("weak column") slab contributes exactly zero through the
dense path (its codes are the zero-points, packing.py), so its rank-r GEMM is
added outside the kernel where XLA fuses it — same split the reference uses
for prefill (qlinear.py:265-266).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qeft_tpu.ops.packing import QLinearParams, plane_order_activations


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sexp_repeat() -> bool:
    return os.environ.get("QEFT_SEXP_REPEAT", "1") not in ("0", "", "false")


def _f32w() -> bool:
    """Keep dequantized plane weights in f32 for the MXU dot instead of
    rounding them to bf16 first.  Saves the per-plane [K/8, BN] f32->bf16
    convert (the VPU, not the MXU, limits the dequant chain: ablation probe
    down 602.9 vs 589.7, qkv 585.5 vs 568.5 GB/s-int4) and is MORE exact.
    QEFT_GEMV_F32W=0 restores the bf16 dot."""
    return os.environ.get("QEFT_GEMV_F32W", "1") not in ("0", "", "false")


def _plane_dot(xp, wp_f32, cdtype):
    """acc contribution of one dequantized plane: f32 or bf16 MXU dot."""
    if _f32w():
        return jnp.dot(xp.astype(jnp.float32), wp_f32,
                       preferred_element_type=jnp.float32)
    return jnp.dot(xp, wp_f32.astype(cdtype),
                   preferred_element_type=jnp.float32)


def _tele() -> bool:
    """Telescoped 8-bit-field extraction (round 5): extract each byte field
    once and derive both of its nibbles by a plain shift, cutting the
    per-word extraction from 16 VPU ops (8 shifts + 8 ands) to 10; the
    16*c_hi cross term the byte field introduces cancels EXACTLY against a
    dot of the activation difference x_hi - 16*x_lo (computed on the [BM,
    K/8] side, ~bn/8 times smaller than the [K/8, BN] plane work).  Numerics:
    median relative deviation vs the plain-plane f32 path is ~3e-6 (max
    ~4e-3 on near-zero outputs) — far below the bf16 activation granularity;
    the 16-bit-field variant amplifies MXU rounding ~200x worse and was
    rejected.  Default OFF until the on-chip A/B lands; QEFT_GEMV_TELE=1
    enables."""
    return os.environ.get("QEFT_GEMV_TELE", "0") not in ("0", "", "false")


def _dequant_dots(acc, qw, get_xp, s_exp, cdtype):
    """acc += sum_p x_p @ (plane_p(qw) * s_exp) over all 8 nibble planes.

    ``get_xp(p)`` yields the [BM, K/8] plane-major activation slice.  Two
    realizations of the same math: the plain per-plane shift+mask loop, or
    the telescoped byte-field form (`_tele`)."""
    if not _tele():
        for p in range(8):
            plane = (qw >> (4 * p)) & 0xF
            acc += _plane_dot(get_xp(p), _plane_weights(plane, s_exp), cdtype)
        return acc
    fields = ((0, qw & 0xFF), (2, (qw >> 8) & 0xFF), (4, (qw >> 16) & 0xFF),
              (6, jax.lax.shift_right_logical(qw, 24)))
    for base, field in fields:
        lo = field  # c_lo + 16*c_hi
        hi = field >> 4  # c_hi
        x_lo = get_xp(base).astype(jnp.float32)
        x_hi = get_xp(base + 1).astype(jnp.float32)
        acc += jnp.dot(x_lo, lo.astype(jnp.float32) * s_exp,
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(x_hi - 16.0 * x_lo, hi.astype(jnp.float32) * s_exp,
                       preferred_element_type=jnp.float32)
    return acc


def _auto_bn(n: int, k8: int, bn_env: str = "QEFT_GEMV_BN") -> int:
    """Decode-matvec N-tile width.

    Explicit QEFT_GEMV_BN wins.  Otherwise pick the widest 128-multiple
    divisor of N up to 1024 whose double-buffered int32 plane tile fits a
    ~3 MB VMEM slice (k8*bn*4): the ablation probe measured a ~0.4 us
    fixed cost PER GRID STEP, so fewer/wider tiles win when VMEM allows
    (qkv [512 x 12288] 631 GB/s-int4 at bn=1024 vs 568 at 512; down-proj
    [1376 x 4096] prefers 512 — 1024 overflows the budget and loses)."""
    env = os.environ.get(bn_env, "")
    if env:
        return _pick_bn(n, int(env))
    cap = 1024
    while cap > 512 and k8 * cap * 4 > 3_000_000:
        cap -= 128
    return _pick_bn(n, cap)


def _expand_scales(s_tile, k8: int, h_height: int):
    """[Gp, BN] group scales -> [k8, BN] per-packed-row scales.  Packed word
    row r belongs to group r % n_groups (the group-interleaved layout,
    packing.py), so the expansion is ONE `pltpu.repeat` — a relayout, not
    compute.  QEFT_SEXP_REPEAT=0 falls back to an equivalent 0/1 f32 MXU
    selection dot, whose per-tile cost rivals the decode matvec itself
    (on-chip A/B: 95.2 dot vs 99.9 repeat tok/s on the 7B headline).

    Other measured dead ends, for the record: a bf16 selection dot + bf16
    plane multiply ran 84.6 tok/s — bf16 arithmetic against int32-laned
    planes forces Mosaic relayouts per plane."""
    gp = s_tile.shape[0]
    n_groups = k8 // h_height
    if _sexp_repeat():
        return pltpu.repeat(s_tile[:n_groups].astype(jnp.float32),
                            h_height, 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (k8, gp), 0) % n_groups
    cols = jax.lax.broadcasted_iota(jnp.int32, (k8, gp), 1)
    expand = (rows == cols).astype(jnp.float32)
    return jnp.dot(expand, s_tile.astype(jnp.float32),
                   preferred_element_type=jnp.float32)


def _plane_weights(plane, s_exp):
    """Dequantize one nibble plane (f32): codes times the expanded scales."""
    return plane.astype(jnp.float32) * s_exp


def _qmm_kernel(
    xpl_ref, sumx_ref, qw_ref, s_ref, sz_ref, out_ref, *, n_groups: int
):
    """One (m-tile, n-tile) grid step.

    xpl: [BM, K] plane-major activations; sumx: [BM, Gp] group sums
    qw: [K/8, BN] packed int32; s/sz: [Gp, BN]; out: [BM, BN].
    """
    cdtype = xpl_ref.dtype  # bf16 in production; fp32 in parity tests
    k8, bn = qw_ref.shape  # k8 = K/8
    h = k8 // n_groups  # plane height per group

    qw = qw_ref[:]
    # expand group scales to one row per packed word via an MXU selection dot
    # (every op stays 2D: 3D reshape-broadcasts send the Mosaic compiler into
    # minutes-long relayout searches); the expansion serves all 8 planes
    s_exp = _expand_scales(s_ref[:], k8, h)

    acc = jnp.dot(
        sumx_ref[:].astype(cdtype), sz_ref[:].astype(cdtype),
        preferred_element_type=jnp.float32,
    )
    acc = _dequant_dots(
        acc, qw, lambda p: xpl_ref[:, p * k8 : (p + 1) * k8], s_exp, cdtype
    )

    out_ref[:] = acc.astype(out_ref.dtype)


def _run_qmm(x2d: jax.Array, p: QLinearParams, bm: int, bn: int, dtype) -> jax.Array:
    m, k = x2d.shape
    n = p.out_features
    g = p.group_size if p.group_size > 0 else k
    n_groups = k // g
    grid = (-(-m // bm), n // bn)

    xpl = plane_order_activations(x2d, k, g)
    sumx = jnp.sum(
        x2d.reshape(m, n_groups, g).astype(jnp.float32), axis=2
    ).astype(x2d.dtype)

    # pad the group dim to a sublane-legal multiple of 8
    gp = max(8, -(-n_groups // 8) * 8)
    scales = jnp.pad(p.scales, ((0, gp - n_groups), (0, 0)))
    szeros = jnp.pad(p.scaled_zeros, ((0, gp - n_groups), (0, 0)))
    sumx = jnp.pad(sumx, ((0, 0), (0, gp - n_groups)))

    kernel = functools.partial(_qmm_kernel, n_groups=n_groups)

    flops = 2 * m * k * n
    bytes_accessed = k * n // 2 + 2 * m * k + m * n * 2 + 2 * gp * n * 2
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((grid[0] * bm, n), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, gp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 8, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gp, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gp, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=_interpret(),
    )(xpl, sumx, p.qweight, scales, szeros)
    return out[:m]


def _qmm_kernel_stacked(
    layer_ref, xpl_ref, sumx_ref, qw_ref, s_ref, sz_ref, out_ref, *, n_groups: int
):
    """Stacked-weights twin of `_qmm_kernel`: the weight operands carry a
    leading layer dim selected by the scalar-prefetched ``layer_ref`` in the
    BlockSpec index maps, so the kernel DMAs the layer's slab straight out of
    the stacked [L, ...] HBM buffer — no per-layer dynamic-slice copy ever
    materializes (the lax.scan-over-stacked-leaves pattern pays one)."""
    cdtype = xpl_ref.dtype
    k8, bn = qw_ref.shape[1], qw_ref.shape[2]
    h = k8 // n_groups

    qw = qw_ref.at[0][:]
    s_exp = _expand_scales(s_ref.at[0][:], k8, h)

    acc = jnp.dot(
        sumx_ref[:].astype(cdtype), sz_ref.at[0][:].astype(cdtype),
        preferred_element_type=jnp.float32,
    )
    acc = _dequant_dots(
        acc, qw, lambda p: xpl_ref[:, p * k8 : (p + 1) * k8], s_exp, cdtype
    )

    out_ref[:] = acc.astype(out_ref.dtype)


def qgemv_stacked(
    x: jax.Array,  # [..., K]
    p: QLinearParams,  # STACKED leaves: qweight [L, K/8, N], scales [L, G, N]
    layer: jax.Array,  # scalar int32 layer index
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Decode matvec reading layer ``layer``'s weights in place from the
    stacked parameter pytree (scalar-prefetch index maps).  The outlier slab
    and bias are dynamic-sliced outside — [r, N] / [N] are trivial copies;
    the int4 planes (the actual bytes) never are."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    l_count, k8, n = p.qweight.shape
    g = p.group_size if p.group_size > 0 else k
    n_groups = k // g
    bm = 8
    bn = _auto_bn(n, k8)
    x2d = x.reshape(-1, k)
    m = x2d.shape[0]
    if m < bm:
        x2d = jnp.pad(x2d, ((0, bm - m), (0, 0)))
    grid = (-(-x2d.shape[0] // bm), n // bn)

    xpl = plane_order_activations(x2d, k, g)
    sumx = jnp.sum(
        x2d.reshape(x2d.shape[0], n_groups, g).astype(jnp.float32), axis=2
    ).astype(x2d.dtype)
    gp = max(8, -(-n_groups // 8) * 8)
    scales = jnp.pad(p.scales, ((0, 0), (0, gp - n_groups), (0, 0)))
    szeros = jnp.pad(p.scaled_zeros, ((0, 0), (0, gp - n_groups), (0, 0)))
    sumx = jnp.pad(sumx, ((0, 0), (0, gp - n_groups)))

    kernel = functools.partial(_qmm_kernel_stacked, n_groups=n_groups)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j, l_ref: (i, 0)),
            pl.BlockSpec((bm, gp), lambda i, j, l_ref: (i, 0)),
            pl.BlockSpec((1, k8, bn), lambda i, j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, gp, bn), lambda i, j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, gp, bn), lambda i, j, l_ref: (l_ref[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l_ref: (i, j)),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((grid[0] * bm, n), dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(jnp.asarray(layer, jnp.int32).reshape(1), xpl, sumx,
      p.qweight, scales, szeros)[:m]

    if p.oweight is not None:
        ow = jax.lax.dynamic_index_in_dim(p.oweight, layer, 0, keepdims=False)
        r = ow.shape[0]
        out = out + jnp.matmul(
            x2d[:m, k - r:], ow.astype(x2d.dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
    y = out.reshape(*lead, n)
    if p.bias is not None:
        b = jax.lax.dynamic_index_in_dim(p.bias, layer, 0, keepdims=False)
        y = y + b.astype(y.dtype)
    return y


def _qmm_kernel_stacked_fused(
    l_ref, *args, n_groups: int, eps: float, one_offset: bool,
    norm: bool, has_ow: bool, has_res: bool,
):
    """Stage-fused decode matvec: one pallas_call per (layer, stage) that also
    performs the stage's XLA glue — the RMS norm of the raw residual (qkv /
    upgate stages), the fp16 weak-column ("outlier") GEMM, and the residual
    add (o / down stages).  Motivation (BASELINE.md round-2 decomposition):
    the raw 7B decode loop ran 10.4 ms/token against a ~7 ms weight-stream
    floor, with the gap dominated by per-layer norms/gathers/adds and
    per-kernel entry overhead; folding them into the weight-streaming kernel
    removes ~20 XLA fusions per layer from the serialized decode chain.

    The prologue (RMS norm + per-group activation sums) depends only on the
    m-tile, so it runs ONCE on the first n-tile and parks its results in VMEM
    scratch for the remaining grid steps (the n grid dim is "arbitrary" =
    sequential).  The first fused kernel recomputed it per n-tile — 24-43
    redundant norm+sum passes per call — and LOST its on-chip A/B to the
    composed path (90.7 vs 95.2 tok/s) despite removing the XLA glue.

    Dequant differs from `_qmm_kernel_stacked` in folding the zero-points into
    the plane dequant (``w = code*scale + scaled_zero`` exactly as the fake
    path's `dequantize_weight`) instead of the separate group-sum dot — same
    math, one fewer host-side prepass (no sumx input).

    Args by position (flags select which are present):
      xpl [BM, K]  raw residual (norm=True) or stage input, PLANE order
      xtail [BM, R]  last-r columns of the input in ORIGINAL order (has_ow)
      lnw [1, K]   plane-ordered norm weight (norm)
      lnwt [1, R]  norm-weight tail, original order (norm and has_ow)
      qw [1, K/8, BN] / s,sz [1, Gp, BN]  layer-selected packed operands
      ow [1, R, BN]  layer-selected outlier slab (has_ow)
      res [BM, BN]  residual tile to add (has_res)
      out [BM, BN]
    Scratch:
      h_ref [BM, K]  normed (or pass-through) activations, plane order
      t_ref [BM, Rp] normed input tail (has_ow)
      sumx_ref [BM, Gp] per-group activation sums (f32)
    """
    it = iter(args)
    xpl_ref = next(it)
    xtail_ref = next(it) if has_ow else None
    lnw_ref = next(it) if norm else None
    lnwt_ref = next(it) if (norm and has_ow) else None
    qw_ref = next(it)
    s_ref = next(it)
    sz_ref = next(it)
    ow_ref = next(it) if has_ow else None
    res_ref = next(it) if has_res else None
    out_ref = next(it)
    h_ref = next(it)
    t_ref = next(it) if has_ow else None
    sumx_ref = next(it)

    cdtype = xpl_ref.dtype
    k8, bn = qw_ref.shape[1], qw_ref.shape[2]
    h_height = k8 // n_groups
    gp = s_ref.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _prologue():
        x = xpl_ref[:]
        if norm:
            xf = x.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            rstd = jax.lax.rsqrt(var + eps)
            lnw = lnw_ref[:]
            w_ln = (1.0 + lnw) if one_offset else lnw
            h = (xf * rstd).astype(cdtype) * w_ln
        else:
            h = x
        h_ref[:] = h
        if has_ow:
            t = xtail_ref[:]
            if norm:
                tw = (1.0 + lnwt_ref[:]) if one_offset else lnwt_ref[:]
                t = (t.astype(jnp.float32) * rstd).astype(cdtype) * tw
            t_ref[:] = t
        # zero-points fold in via per-group activation sums (8 tiny [BM, k8]
        # x [k8, Gp] dots against a 0/1 expansion), NOT a second [k8, Gp] x
        # [Gp, BN] expansion dot — that dot's f32 MXU cost rivals the matvec
        # itself and measurably slowed the first fused kernel (81 vs 95
        # tok/s on-chip).  Exactness on outlier rows is preserved: their
        # codes are the zero points, and bf16(zp*s) cancels bf16(-zp*s)
        # exactly in the f32 acc.
        rows = jax.lax.broadcasted_iota(jnp.int32, (k8, gp), 0) % n_groups
        cols = jax.lax.broadcasted_iota(jnp.int32, (k8, gp), 1)
        expand = (rows == cols).astype(cdtype)
        sumx = jnp.zeros((h.shape[0], gp), jnp.float32)
        for p in range(8):
            sumx += jnp.dot(h[:, p * k8 : (p + 1) * k8], expand,
                            preferred_element_type=jnp.float32)
        sumx_ref[:] = sumx

    h = h_ref[:]
    s_exp = _expand_scales(s_ref.at[0][:], k8, h_height)
    qw = qw_ref.at[0][:]
    acc = jnp.dot(sumx_ref[:].astype(cdtype), sz_ref.at[0][:].astype(cdtype),
                  preferred_element_type=jnp.float32)
    acc = _dequant_dots(
        acc, qw, lambda p: h[:, p * k8 : (p + 1) * k8], s_exp, cdtype
    )

    if has_ow:
        acc += jnp.dot(t_ref[:], ow_ref.at[0][:].astype(cdtype),
                       preferred_element_type=jnp.float32)
    if has_res:
        acc += res_ref[:].astype(jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def qgemv_stacked_fused(
    x: jax.Array,  # [..., K] stage input (RAW residual when lnw is given)
    p: QLinearParams,  # STACKED leaves: qweight [L, K/8, N], oweight [L, r, N]
    layer: jax.Array,  # scalar int32 layer index
    lnw: jax.Array = None,  # [K] per-layer norm weight (original order)
    residual: jax.Array = None,  # [..., N] residual to add to the output
    eps: float = 1e-5,
    one_offset: bool = False,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """`qgemv_stacked` with the stage glue fused into the kernel (see
    `_qmm_kernel_stacked_fused`).  With ``lnw`` the kernel RMS-norms the raw
    residual in its prologue; with ``residual`` it adds the skip connection in
    its epilogue; the weak-column GEMM always rides inside (the stacked
    oweight is layer-selected by the same scalar-prefetch index map, so the
    [r, N] slab is never sliced/copied host-side).  Bias unsupported (llama
    family carries none on these stages)."""
    assert p.bias is None and p.reorder_ids is None
    lead = x.shape[:-1]
    k = x.shape[-1]
    l_count, k8, n = p.qweight.shape
    g = p.group_size if p.group_size > 0 else k
    n_groups = k // g
    bm = 8
    bn = _auto_bn(n, k8)
    if k8 * bn * 4 > 3_000_000:
        # scoped-VMEM guard: the fused kernel carries the double-buffered
        # int32 planes PLUS f32 dequant temps, the outlier slab blocks, and
        # the residual tile — at down-proj scale (K=11008) a 512-wide tile
        # exceeds the 16 MiB scoped budget by ~1.1 MB (measured on v5e)
        bn = _pick_bn(n, 256)
    x2d = x.reshape(-1, k)
    m = x2d.shape[0]
    pad_m = -m % bm
    if pad_m:
        x2d = jnp.pad(x2d, ((0, pad_m), (0, 0)))
    grid = (x2d.shape[0] // bm, n // bn)

    norm = lnw is not None
    has_ow = p.oweight is not None
    has_res = residual is not None

    xpl = plane_order_activations(x2d, k, g)
    gp = max(8, -(-n_groups // 8) * 8)
    scales = jnp.pad(p.scales, ((0, 0), (0, gp - n_groups), (0, 0)))
    szeros = jnp.pad(p.scaled_zeros, ((0, 0), (0, gp - n_groups), (0, 0)))

    def c0(i, j, l_ref):  # x-like operands: m-tiled, layer/N-invariant
        return (i, 0)

    def cl3(i, j, l_ref):  # stacked [L, *, N] operands: layer-selected N tile
        return (l_ref[0], 0, j)

    operands = [xpl]
    in_specs = [pl.BlockSpec((bm, k), c0)]

    r = 0
    if has_ow:
        r = p.oweight.shape[1]
        rp = -(-r // 128) * 128  # lane-align the tail block
        xtail = x2d[:, k - r :]
        if rp != r:
            xtail = jnp.pad(xtail, ((0, 0), (0, rp - r)))
        operands.append(xtail)
        in_specs.append(pl.BlockSpec((bm, rp), c0))
    if norm:
        lnw2 = lnw.reshape(1, k)
        lnw_pl = plane_order_activations(lnw2, k, g)
        operands.append(lnw_pl)
        in_specs.append(pl.BlockSpec((1, k), lambda i, j, l_ref: (0, 0)))
        if has_ow:
            lnwt = lnw2[:, k - r :]
            if rp != r:
                lnwt = jnp.pad(lnwt, ((0, 0), (0, rp - r)))
            operands.append(lnwt)
            in_specs.append(pl.BlockSpec((1, rp), lambda i, j, l_ref: (0, 0)))

    operands += [p.qweight, scales, szeros]
    in_specs += [
        pl.BlockSpec((1, k8, bn), cl3),
        pl.BlockSpec((1, gp, bn), cl3),
        pl.BlockSpec((1, gp, bn), cl3),
    ]
    if has_ow:
        ow = p.oweight
        if rp != r:
            ow = jnp.pad(ow, ((0, 0), (0, rp - r), (0, 0)))
        operands.append(ow)
        in_specs.append(pl.BlockSpec((1, rp, bn), cl3))
    if has_res:
        res2 = residual.reshape(-1, n)
        if pad_m:
            res2 = jnp.pad(res2, ((0, pad_m), (0, 0)))
        operands.append(res2)
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, l_ref: (i, j)))

    kernel = functools.partial(
        _qmm_kernel_stacked_fused, n_groups=n_groups, eps=eps,
        one_offset=one_offset, norm=norm, has_ow=has_ow, has_res=has_res,
    )
    gp = scales.shape[1]
    cdtype = x2d.dtype
    scratch = [pltpu.VMEM((bm, k), cdtype)]  # h: normed plane-order input
    if has_ow:
        scratch.append(pltpu.VMEM((bm, rp), cdtype))  # normed tail
    scratch.append(pltpu.VMEM((bm, gp), jnp.float32))  # per-group sums
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l_ref: (i, j)),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((grid[0] * bm, n), dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # the n dim must iterate in order: tile 0 computes the norm +
            # group-sum prologue into scratch, later tiles reuse it
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)[:m]
    return out.reshape(*lead, n)


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
    """Decode path: few tokens, weight-streaming bound.

    N-tile width from `_auto_bn` (fewer/wider tiles when VMEM allows);
    QEFT_GEMV_BN overrides."""
    bn = _auto_bn(p.out_features, p.in_features // 8)
    return _flatten_call(x, p, bm=8, bn=bn, dtype=dtype)


def qgemm(x: jax.Array, p: QLinearParams, dtype=jnp.bfloat16) -> jax.Array:
    """Prefill/training path: many tokens, MXU bound."""
    return _flatten_call(x, p, bm=128, bn=256, dtype=dtype)


# ---------------------------------------------------------------------------
# transposed GEMM for the training backward (grad_input = g @ W_deq^T)


def _qmm_t_kernel(g_ref, qw_ref, s_ref, sz_ref, out_ref, acc_ref, *, h: int,
                  bk8: int, n_groups: int):
    """One (m-tile, k8-tile, n-tile) grid step of dx = g @ W_deq^T.

    g: [BM, BN] output-cotangent tile; qw: [BK8, BN] packed int32 tile;
    s/sz: [Gp, BN] full (padded) group params for this n-tile;
    out: [BM, 8*BK8] — within-block column p*BK8 + u is packed-word row
    j*BK8 + u, nibble plane p (the host side inverse-permutes to original K
    order).  The n grid dim is an accumulation (reduction) dimension.
    """
    j = pl.program_id(1)
    n_idx = pl.program_id(2)
    n_n = pl.num_programs(2)

    @pl.when(n_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qw = qw_ref[:]  # [BK8, BN] int32
    gp = s_ref.shape[0]
    # per-packed-row group select via a 0/1 expansion dot (all 2D, see
    # _qmm_kernel): row r of this tile belongs to group (j*BK8 + r) %
    # n_groups (group-interleaved word layout, packing.py)
    rows = (
        j * bk8 + jax.lax.broadcasted_iota(jnp.int32, (bk8, gp), 0)
    ) % n_groups
    cols = jax.lax.broadcasted_iota(jnp.int32, (bk8, gp), 1)
    expand = (rows == cols).astype(jnp.float32)
    s_exp = jnp.dot(expand, s_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    sz_exp = jnp.dot(expand, sz_ref[:].astype(jnp.float32),
                     preferred_element_type=jnp.float32)

    gblk = g_ref[:]
    cdtype = gblk.dtype
    for p in range(8):
        plane = (qw >> (4 * p)) & 0xF
        wp = (plane.astype(jnp.float32) * s_exp + sz_exp).astype(cdtype)
        # dx_p = g @ wp^T: contract both operands on their N (lane) dim
        dxp = jax.lax.dot_general(
            gblk, wp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BM, BK8]
        acc_ref[:, p * bk8 : (p + 1) * bk8] += dxp

    @pl.when(n_idx == n_n - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _pick_bk8(k8: int) -> int:
    """Largest divisor of K/8 that is <=128 and a multiple of 16 (so the
    output tile's lane dim 8*BK8 is 128-aligned)."""
    cand = 128
    while cand >= 16:
        if k8 % cand == 0:
            return cand
        cand -= 16
    return k8  # tiny layers: single tile


def _plane_tile_inverse_ids(k: int, g: int, bk8: int) -> np.ndarray:
    """index array inv st dx[:, k] = dx_raw[:, inv[k]] undoes the kernel's
    (tile, plane, row) output ordering back to original K order."""
    h = g // 8
    n_groups = k // g
    ks = np.arange(k)
    gi, rem = ks // g, ks % g
    p, jj = rem // h, rem % h
    w = jj * n_groups + gi  # packed-word row (group-interleaved layout)
    jtile, u = w // bk8, w % bk8
    return (jtile * (8 * bk8) + p * bk8 + u).astype(np.int32)


def qgemm_t(g: jax.Array, p: QLinearParams, dtype=jnp.bfloat16, bm: int = 128,
            bn: int = 512) -> jax.Array:
    """dx = g @ W_deq^T streamed from the packed codes (training backward).

    ``g``: [..., N] cotangent of the dense output; returns [..., K].  The
    outlier rows of W_deq are exactly zero (packing contract), so the fp slab
    contribution is added by the caller.  TPU-native counterpart of the
    reference's grad_input matmul (/root/reference/qeft/qlinear.py:38-44) with
    the true transpose.
    """
    lead = g.shape[:-1]
    n = g.shape[-1]
    k = p.in_features
    k8 = k // 8
    gsz = p.group_size if p.group_size > 0 else k
    h = gsz // 8
    n_groups = k // gsz

    g2 = g.reshape(-1, n)
    m = g2.shape[0]
    if m < bm:
        g2 = jnp.pad(g2, ((0, bm - m), (0, 0)))
    bn = _pick_bn(n, bn)
    bk8 = _pick_bk8(k8)
    grid = (-(-g2.shape[0] // bm), k8 // bk8, n // bn)

    gp = max(8, -(-n_groups // 8) * 8)
    scales = jnp.pad(p.scales, ((0, gp - n_groups), (0, 0)))
    szeros = jnp.pad(p.scaled_zeros, ((0, gp - n_groups), (0, 0)))

    kernel = functools.partial(_qmm_t_kernel, h=h, bk8=bk8, n_groups=n_groups)
    flops = 2 * m * k * n
    bytes_accessed = k * n // 2 + 2 * m * n + 2 * m * k + 2 * gp * n * 2
    raw = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((grid[0] * bm, k), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, j, ni: (i, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk8, bn), lambda i, j, ni: (j, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((gp, bn), lambda i, j, ni: (0, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((gp, bn), lambda i, j, ni: (0, ni), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, 8 * bk8), lambda i, j, ni: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bm, 8 * bk8), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=_interpret(),
    )(g2.astype(dtype), p.qweight, scales, szeros)

    inv = jnp.asarray(_plane_tile_inverse_ids(k, gsz, bk8))
    dx = jnp.take(raw[:m], inv, axis=1)
    return dx.reshape(*lead, k)
