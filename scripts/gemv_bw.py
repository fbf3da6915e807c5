import time, jax, jax.numpy as jnp, sys, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from qeft_tpu.testing import random_packed_linear
from qeft_tpu.ops.pallas_qmm import qgemv

for (K, N) in [(4096, 4096), (4096, 11008), (11008, 4096)]:
    p = random_packed_linear(jax.random.PRNGKey(0), K, N)
    x = jnp.zeros((1, K), jnp.bfloat16)
    def loop50(x, p=p):
        def body(i, c):
            y = qgemv(c, p)
            return c + (y[:, :1]*0).astype(c.dtype)
        return jax.lax.fori_loop(0, 50, body, x)
    g = jax.jit(loop50)
    t0=time.time(); _ = np.asarray(g(x)); c = time.time()-t0
    t0=time.time(); _ = np.asarray(g(x)); dt=(time.time()-t0)/50
    wb = K*N//2 + 2*(K//128)*N*2 + 128*N*2
    print(f"K={K} N={N}: {dt*1e6:.0f}us/call  BW={wb/dt/1e9:.0f} GB/s (compile {c:.0f}s)", flush=True)
