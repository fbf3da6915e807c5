"""Smoke-check the Pallas kernels on real TPU: numerics vs XLA + bandwidth."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from qeft_tpu.ops.packing import QLinearParams, pack_codes
from qeft_tpu.ops.pallas_qmm import qgemv, qgemm
from qeft_tpu.ops.qlinear import qlinear_xla

print("backend:", jax.default_backend(), jax.devices())

K, N, G, R = 11008, 4096, 128, 128
rng = np.random.default_rng(0)
codes = rng.integers(0, 16, size=(K, N)).astype(np.int32)
qweight = jnp.asarray(np.asarray(pack_codes(jnp.asarray(codes), G)))
scales = jnp.asarray(rng.random((K // G, N)).astype(np.float32) * 0.02 + 0.01, dtype=jnp.bfloat16)
szeros = jnp.asarray(-rng.random((K // G, N)).astype(np.float32) * 0.1, dtype=jnp.bfloat16)
ow = jnp.asarray(rng.normal(size=(R, N)).astype(np.float32) * 0.02, dtype=jnp.bfloat16)
p = QLinearParams(qweight=qweight, scales=scales, scaled_zeros=szeros,
                  oweight=ow, bias=None, group_size=G)

x = jnp.asarray(rng.normal(size=(1, K)), dtype=jnp.bfloat16)

f_pal = jax.jit(lambda x: qgemv(x, p))
f_xla = jax.jit(lambda x: qlinear_xla(x, p))

y_pal = np.asarray(f_pal(x), dtype=np.float32)
y_xla = np.asarray(f_xla(x), dtype=np.float32)
rel = np.abs(y_pal - y_xla) / (np.abs(y_xla) + 1e-3)
print(f"gemv rel err: mean={rel.mean():.2e} max={rel.max():.2e}")

def bench(f, x, iters=50):
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x)
    y.block_until_ready()
    return (time.perf_counter() - t0) / iters

t_pal = bench(f_pal, x)
t_xla = bench(f_xla, x)
wbytes = K * N // 2 + 2 * (K // G) * N * 2 + R * N * 2
print(f"gemv pallas: {t_pal*1e6:.1f}us  xla: {t_xla*1e6:.1f}us")
print(f"weight bytes: {wbytes/1e6:.1f}MB  pallas BW: {wbytes/t_pal/1e9:.0f}GB/s  xla BW: {wbytes/t_xla/1e9:.0f}GB/s")

# prefill
xp = jnp.asarray(rng.normal(size=(512, K)), dtype=jnp.bfloat16)
fp_pal = jax.jit(lambda x: qgemm(x, p))
fp_xla = jax.jit(lambda x: qlinear_xla(x, p))
yp = np.asarray(fp_pal(xp), dtype=np.float32)
yx = np.asarray(fp_xla(xp), dtype=np.float32)
rel = np.abs(yp - yx) / (np.abs(yx) + 1e-2)
print(f"gemm rel err: mean={rel.mean():.2e} max={rel.max():.2e}")
t_pal = bench(fp_pal, xp, 20)
t_xla = bench(fp_xla, xp, 20)
fl = 2 * 512 * K * N
print(f"gemm pallas: {t_pal*1e3:.2f}ms ({fl/t_pal/1e12:.1f} TFLOP/s)  xla: {t_xla*1e3:.2f}ms ({fl/t_xla/1e12:.1f} TFLOP/s)")
