"""Device-time kernel benchmark: loops inside one jit so tunnel dispatch
latency amortizes away."""
import sys
import time

sys.path.append("/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from qeft_tpu.ops.packing import QLinearParams, pack_codes
from qeft_tpu.ops.pallas_qmm import qgemv, qgemm
from qeft_tpu.ops.qlinear import qlinear_xla

K, N, G, R = 11008, 4096, 128, 128
rng = np.random.default_rng(0)
codes = rng.integers(0, 16, size=(K, N)).astype(np.int32)
qweight = jnp.asarray(np.asarray(pack_codes(jnp.asarray(codes), G)))
scales = jnp.asarray(rng.random((K // G, N)).astype(np.float32) * 0.02 + 0.01, dtype=jnp.bfloat16)
szeros = jnp.asarray(-rng.random((K // G, N)).astype(np.float32) * 0.1, dtype=jnp.bfloat16)
ow = jnp.asarray(rng.normal(size=(R, N)).astype(np.float32) * 0.02, dtype=jnp.bfloat16)
p = QLinearParams(qweight=qweight, scales=scales, scaled_zeros=szeros,
                  oweight=ow, bias=None, group_size=G)


# On the relayed chip ``block_until_ready`` is NOT a reliable completion
# barrier (session-3 measured a 64-step 7B decode loop at 0.13 ms "total");
# only fetching data (np.asarray) proves the computation ran.  Every timed
# loop's carry is data-dependent on all iterations, so fetching one element
# forces the whole chain; the fixed dispatch+fetch RTT is subtracted.
def _fetch1(y):
    return np.asarray(y.ravel()[:1])


def _null_rtt() -> float:
    g = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.float32)
    _fetch1(g(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _fetch1(g(x))
        best = min(best, time.perf_counter() - t0)
    return best


RTT = None


def bench(f, x, iters):
    global RTT
    if RTT is None:
        RTT = _null_rtt()
        print(f"null dispatch+fetch RTT: {RTT*1e3:.1f}ms", flush=True)

    def body(i, carry):
        # tiny-but-nonzero feedback: *0 lets XLA fold non-opaque ops away
        # entirely (the dense-gemm control read 0.00ms)
        y = f(carry)
        return carry + (y[..., :1] * 1e-12).astype(carry.dtype)

    g = jax.jit(lambda x: jax.lax.fori_loop(0, iters, body, x))
    t0 = time.perf_counter()
    _fetch1(g(x))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _fetch1(g(x))
        best = min(best, time.perf_counter() - t0)
    dt = max(best - RTT, 1e-9) / iters
    return dt, compile_s


x = jnp.asarray(rng.normal(size=(1, K)), dtype=jnp.bfloat16)
wbytes = K * N // 2 + 2 * (K // G) * N * 2 + R * N * 2

t, c = bench(lambda x: qgemv(x, p), x, 400)
print(f"gemv pallas: {t*1e6:.1f}us  BW: {wbytes/t/1e9:.0f}GB/s  (compile {c:.1f}s)", flush=True)
t, c = bench(lambda x: qlinear_xla(x, p), x, 400)
print(f"gemv xla:    {t*1e6:.1f}us  BW: {wbytes/t/1e9:.0f}GB/s  (compile {c:.1f}s)", flush=True)

wd = jnp.asarray(rng.normal(size=(K, N)), dtype=jnp.bfloat16)
t, c = bench(lambda x: jnp.matmul(x, wd), x, 400)
print(f"dense bf16 matvec: {t*1e6:.1f}us  BW: {K*N*2/t/1e9:.0f}GB/s", flush=True)

xp = jnp.asarray(rng.normal(size=(512, K)), dtype=jnp.bfloat16)
fl = 2 * 512 * K * N


def bench_mm(f, x, iters):
    def body(i, carry):
        y = f(carry)
        return carry + (y[:, :1] * 1e-12).astype(carry.dtype)

    g = jax.jit(lambda x: jax.lax.fori_loop(0, iters, body, x))
    _fetch1(g(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _fetch1(g(x))
        best = min(best, time.perf_counter() - t0)
    return max(best - (RTT or 0.0), 1e-9) / iters


t = bench_mm(lambda x: qgemm(x, p), xp, 20)
print(f"gemm pallas: {t*1e3:.2f}ms  {fl/t/1e12:.1f} TFLOP/s", flush=True)
t = bench_mm(lambda x: qlinear_xla(x, p), xp, 20)
print(f"gemm xla:    {t*1e3:.2f}ms  {fl/t/1e12:.1f} TFLOP/s", flush=True)
t = bench_mm(lambda x: jnp.matmul(x, wd), xp, 20)
print(f"gemm dense bf16: {t*1e3:.2f}ms  {fl/t/1e12:.1f} TFLOP/s", flush=True)
