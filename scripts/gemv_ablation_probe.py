"""Is the decode matvec kernel VPU-bound (dequant ops) or DMA-bound?

qgemv streams int4 planes at ~440-473 GB/s while the chip's dense-matvec
read rate is ~740 GB/s (BASELINE.md).  Per weight element the kernel spends
~5 VPU ops (shift, mask, int32->f32 convert, scale mul, f32->bf16 convert);
if those are the bottleneck, cutting planes processed should cut time
near-linearly; if DMA-bound, time should not move.

Variants (WRONG MATH where noted — timing only, never product code):
  v0_full    : the production 8-plane dequant dot
  v1_noscale : drop the scale mul + f32 path (plane -> bf16 direct)  [wrong]
  v2_4plane  : dequant+dot only 4 of 8 planes (half VPU, same DMA)   [wrong]
  v3_2plane  : 2 of 8 planes                                          [wrong]
  v4_dma     : no dequant at all: out = rowsum of the int32 tile      [wrong]
  v5_noshift : mask-only extraction (no shift)                        [wrong]

Shapes: down-proj [11008 -> 4096] and qkv [4096 -> 12288] at g=128, the 7B
headline's two largest streams.  Reports us/call and effective GB/s of the
int4 bytes.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fetch1(y):
    return np.asarray(jax.tree.leaves(y)[0].ravel()[:1])


g0 = jax.jit(lambda x: x + 1)
_fetch1(g0(jnp.zeros((8, 128), jnp.float32)))
RTT = min(
    (lambda t0: (_fetch1(g0(jnp.zeros((8, 128), jnp.float32))),
                 time.perf_counter() - t0)[1])(time.perf_counter())
    for _ in range(5)
)
print(f"null RTT: {RTT*1e3:.2f} ms", flush=True)

ITERS = 1024


def timeit(fn, *args, reps=3):
    _fetch1(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch1(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 1e-9) / ITERS


def make_kernel(variant: str, n_groups: int):
    def kernel(xpl_ref, qw_ref, s_ref, out_ref):
        k8, bn = qw_ref.shape
        h = k8 // n_groups
        qw = qw_ref[:]
        if variant in ("v7_tele16", "v8_tele8"):
            # EXACT telescoped extraction (round-5, VERDICT r4 #3): extract
            # 16-bit (or 8-bit) fields once and derive the per-code dequant
            # operands by plain shifts of the SAME field; the cross terms the
            # wide field introduces cancel exactly against dots of activation
            # DIFFERENCES a_p = x_p - 16*x_{p-1} ([BM, K/8] VPU work, ~250x
            # smaller than the [K/8, BN] plane work it replaces).  Cuts the
            # per-word extraction from 16 VPU ops (8 shifts + 8 ands) to 8
            # (tele16) / 10 (tele8); converts/muls/dots stay one per code.
            s_exp = pltpu.repeat(s_ref[:n_groups].astype(jnp.float32), h, 0)
            acc = jnp.zeros(out_ref.shape, jnp.float32)
            if variant == "v7_tele16":
                fields = [(0, qw & 0xFFFF),
                          (4, jax.lax.shift_right_logical(qw, 16))]
                levels = 4
            else:
                fields = [(0, qw & 0xFF), (2, (qw >> 8) & 0xFF),
                          (4, (qw >> 16) & 0xFF),
                          (6, jax.lax.shift_right_logical(qw, 24))]
                levels = 2
            for base, field in fields:
                cur = field
                for j in range(levels):
                    p = base + j
                    if j > 0:
                        cur = cur >> 4
                    xp = xpl_ref[:, p * k8 : (p + 1) * k8].astype(jnp.float32)
                    if j > 0:
                        xm = xpl_ref[:, (p - 1) * k8 : p * k8].astype(
                            jnp.float32)
                        xp = xp - 16.0 * xm
                    acc += jnp.dot(xp, cur.astype(jnp.float32) * s_exp,
                                   preferred_element_type=jnp.float32)
            out_ref[:] = acc.astype(out_ref.dtype)
            return
        if variant == "v4_dma":
            # touch every word once, no dequant; keep an input dependency so
            # the call cannot hoist out of the timing loop
            out_ref[:] = (
                jnp.broadcast_to(
                    jnp.sum(qw.astype(jnp.float32), axis=0, keepdims=True),
                    out_ref.shape,
                )
                + xpl_ref[:, :bn].astype(jnp.float32)
            ).astype(out_ref.dtype)
            return
        s_exp = pltpu.repeat(s_ref[:n_groups].astype(jnp.float32), h, 0)
        planes = {"v2_4plane": 4, "v3_2plane": 2}.get(variant, 8)
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        for p in range(planes):
            if variant == "v5_noshift":
                plane = qw & 0xF
            else:
                plane = (qw >> (4 * p)) & 0xF
            if variant == "v1_noscale":
                wp = plane.astype(jnp.bfloat16)
            elif variant == "v6_f32dot":
                # keep the scaled weights in f32: saves the per-plane
                # [k8, BN] f32->bf16 convert, pays an f32 MXU dot
                wp = plane.astype(jnp.float32) * s_exp
            else:
                wp = (plane.astype(jnp.float32) * s_exp).astype(jnp.bfloat16)
            xp = xpl_ref[:, p * k8 : (p + 1) * k8]
            if variant == "v6_f32dot":
                xp = xp.astype(jnp.float32)
            acc += jnp.dot(xp, wp, preferred_element_type=jnp.float32)
        out_ref[:] = acc.astype(out_ref.dtype)

    return kernel


def build(variant: str, k: int, n: int, g: int, bn: int):
    k8 = k // 8
    n_groups = k // g
    kernel = make_kernel(variant, n_groups)
    bm = 8
    grid = (1, n // bn)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bm, n), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k8, bn), lambda i, j: (0, j)),
            pl.BlockSpec((n_groups, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )

    qw = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).integers(
                -(2**31), 2**31, (k8, n), dtype=np.int64
            ).astype(np.int32)
        )
    )
    s = jax.device_put(jnp.ones((n_groups, n), jnp.float32) * 0.01)
    x = jnp.ones((bm, k), jnp.bfloat16) * 0.01

    @jax.jit
    def loop(x, qw, s):
        def body(i, xc):
            y = call(xc, qw, s)
            # data-dep chain so the loop cannot hoist; fold N -> K cheaply
            w = min(k, n)
            dep = jnp.pad(y[:, :w] * jnp.bfloat16(1e-8), ((0, 0), (0, k - w)))
            return xc + dep

        return jax.lax.fori_loop(0, ITERS, body, x)

    return loop, (x, qw, s)


import os

ROUND3 = os.environ.get("QEFT_ABL_ROUND3", "0") not in ("0", "", "false")
if ROUND3:
    # round 3 (r5): telescoped-extraction variants vs the adopted v6 f32-dot
    # production math, at the production tile widths
    RUNS = [("down 11008->4096", 11008, 4096, 128, 512),
            ("qkv 4096->12288", 4096, 12288, 128, 1024)]
    for label, k, n, g, bn in RUNS:
        ib = k * n // 2
        for v in ("v6_f32dot", "v7_tele16", "v8_tele8", "v4_dma"):
            loop, args = build(v, k, n, g, bn)
            t = timeit(loop, *args)
            print(f"{label} {v:10s} bn={bn}: {t*1e6:7.1f} us/call  "
                  f"{ib/t/1e9:6.1f} GB/s-int4", flush=True)
    raise SystemExit

ROUND2 = os.environ.get("QEFT_ABL_ROUND2", "0") not in ("0", "", "false")
if ROUND2:
    # round 2: f32-dot variant + BN sweep at the two big shapes
    RUNS = [("down 11008->4096", 11008, 4096, 128, 512, "v6_f32dot"),
            ("qkv 4096->12288", 4096, 12288, 128, 512, "v6_f32dot"),
            ("down 11008->4096", 11008, 4096, 128, 256, "v0_full"),
            ("down 11008->4096", 11008, 4096, 128, 1024, "v0_full"),
            ("qkv 4096->12288", 4096, 12288, 128, 1024, "v0_full"),
            ("qkv 4096->12288", 4096, 12288, 128, 2048, "v0_full")]
    for label, k, n, g, bn, v in RUNS:
        ib = k * n // 2
        loop, args = build(v, k, n, g, bn)
        t = timeit(loop, *args)
        print(f"{label} {v} bn={bn}: {t*1e6:7.1f} us/call  "
              f"{ib/t/1e9:6.1f} GB/s-int4", flush=True)
    raise SystemExit
SHAPES = [("down 11008->4096", 11008, 4096, 128, 512),
          ("qkv 4096->12288", 4096, 12288, 128, 512)]
VARIANTS = ["v0_full", "v2_4plane", "v3_2plane", "v4_dma", "v1_noscale",
            "v5_noshift"]

for label, k, n, g, bn in SHAPES:
    ib = k * n // 2  # int4 bytes
    print(f"--- {label} (int4 {ib/1e6:.1f} MB) ---", flush=True)
    for v in VARIANTS:
        loop, args = build(v, k, n, g, bn)
        t = timeit(loop, *args)
        print(f"{v:11s}: {t*1e6:7.1f} us/call  {ib/t/1e9:6.1f} GB/s-int4",
              flush=True)
