"""Validate the relay's completion-barrier semantics (54e55e7).

Times the SAME fori_loop three ways:
  1. block_until_ready on the loop output
  2. np.asarray of one element of the loop output (data pull)
  3. np.asarray of the FULL output

If (1) << (2), block_until_ready is not a completion barrier here and every
block-synced timing in BASELINE.md's session-3 notes is invalid.  The loop is
sized so true execution time (~1 s) dwarfs any RTT.
"""

import sys
import time

sys.path.append("/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

n = 8192
w = jnp.ones((n, n), jnp.bfloat16) * jnp.bfloat16(1e-4)
x = jnp.ones((8, n), jnp.bfloat16)
ITERS = 400  # 400 x 8x8192x8192 matmuls ~ 0.4 TFLOP ~ 2-20 ms... scaled below


@jax.jit
def loop(x, w):
    def body(i, a):
        y = jnp.matmul(a, w, preferred_element_type=jnp.float32)
        return (y * jnp.float32(1e-4)).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, ITERS, body, x)


# expected device time: 400 * 2*8*8192^2 flops = 0.43 TFLOP -> >= 2.2 ms at
# peak; the matmuls are tiny-M so realistically 50-200 ms.
out = loop(x, w)
np.asarray(out.ravel()[:1])  # compile + settle

for name, sync in (
    ("block_until_ready", lambda o: o.block_until_ready()),
    ("fetch 1 element  ", lambda o: np.asarray(o.ravel()[:1])),
    ("fetch full output", lambda o: np.asarray(o)),
):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(loop(x, w))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:9.2f} ms", flush=True)
