"""Does `lax.scan` over stacked [L, ...] weight leaves cost extra HBM traffic?

Session-4 evidence: a one-pass chain of the 7B matvec kernels inside the
model's scan costs ~12.6 ms while the kernels standalone sum to ~8 ms at
their measured 440-470 GB/s.  Hypothesis: scan's per-iteration dynamic-slice
of each stacked leaf materializes a copy of the layer's weights (an extra
read+write through HBM) that the pallas_call then re-reads.

Patterns, all chaining 32 down-proj-shaped qgemv calls with iteration-
dependent inputs (y feeds x, so nothing hoists):
  A. lax.scan over stacked [L, K/8, N] leaves   (the model's pattern)
  B. python-unrolled static slices stacked[l]
  C. python-unrolled over 32 SEPARATE per-layer arrays (no slicing: floor)

An outer fori_loop of PASSES (x feeds across passes) amortizes the ~32 ms
relay RTT; fetch-synced timing.
"""

import sys
import time

sys.path.append("/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from qeft_tpu.ops.packing import QLinearParams, pack_codes
from qeft_tpu.ops.pallas_qmm import qgemv

L, K, N, G, R = 32, 11008, 4096, 128, 128
PASSES = 32

rng = np.random.default_rng(0)


def one_layer(seed):
    r = np.random.default_rng(seed)
    codes = jnp.asarray(r.integers(0, 16, size=(K, N)).astype(np.int32))
    return QLinearParams(
        qweight=pack_codes(codes, G),
        scales=jnp.asarray(r.random((K // G, N)) * 0.02 + 0.01, jnp.bfloat16),
        scaled_zeros=jnp.asarray(-r.random((K // G, N)) * 0.1, jnp.bfloat16),
        oweight=jnp.asarray(r.normal(size=(R, N)) * 0.02, jnp.bfloat16),
        bias=None, group_size=G,
    )


layers = [one_layer(i) for i in range(L)]
stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
x0 = jnp.asarray(rng.normal(size=(1, K)), jnp.bfloat16)

wbytes = L * (K * N // 2 + 2 * (K // G) * N * 2 + R * N * 2)


def feed(x, y):
    # y [1, N] -> perturb x [1, K]: iteration-dependent, nothing hoists
    return x + y[:, :1].astype(x.dtype) * jnp.bfloat16(1e-12)


@jax.jit
def run_scan(x0, stacked):
    def one_pass(i, x):
        def body(xc, lin):
            return feed(xc, qgemv(xc, lin)), None

        x, _ = jax.lax.scan(body, x, stacked)
        return x

    return jax.lax.fori_loop(0, PASSES, one_pass, x0)


@jax.jit
def run_sliced(x0, stacked):
    def one_pass(i, x):
        for l in range(L):
            lin = jax.tree.map(lambda a: a[l], stacked)
            x = feed(x, qgemv(x, lin))
        return x

    return jax.lax.fori_loop(0, PASSES, one_pass, x0)


@jax.jit
def run_separate(x0, *layers_flat):
    layers_ = [
        QLinearParams(qweight=layers_flat[4 * i], scales=layers_flat[4 * i + 1],
                      scaled_zeros=layers_flat[4 * i + 2],
                      oweight=layers_flat[4 * i + 3], bias=None, group_size=G)
        for i in range(L)
    ]

    def one_pass(i, x):
        for lin in layers_:
            x = feed(x, qgemv(x, lin))
        return x

    return jax.lax.fori_loop(0, PASSES, one_pass, x0)


flat = []
for lin in layers:
    flat += [lin.qweight, lin.scales, lin.scaled_zeros, lin.oweight]
flat = tuple(flat)


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    np.asarray(fn(*args).ravel()[:1])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args).ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    per_pass = best / PASSES
    print(f"{name}: {per_pass*1e3:7.3f} ms/pass  "
          f"{wbytes/per_pass/1e9:6.0f} GB/s  (compile {compile_s:.0f}s)",
          flush=True)


timeit("A scan over stacked ", run_scan, x0, stacked)
timeit("B unrolled slices   ", run_sliced, x0, stacked)
timeit("C separate buffers  ", run_separate, x0, *flat)


# D. fori_loop over layer indices + qgemv_stacked: the weights stay one
# stacked HBM buffer; the kernel's scalar-prefetched index map DMAs the
# layer's slab directly (no slice op in the graph at all)
from qeft_tpu.ops.pallas_qmm import qgemv_stacked


@jax.jit
def run_stacked(x0, stacked):
    def one_pass(i, x):
        def body(l, xc):
            return feed(xc, qgemv_stacked(xc, stacked, l))

        return jax.lax.fori_loop(0, L, body, x)

    return jax.lax.fori_loop(0, PASSES, one_pass, x0)


timeit("D stacked-kernel    ", run_stacked, x0, stacked)
