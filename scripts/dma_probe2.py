"""Pure-DMA pallas probe: no reductions, no big elementwise ops in the chain."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K8, N = 1376, 4096
qw = jnp.ones((K8, N), jnp.int32)
nbytes = K8 * N * 4


def make(bn, multiple_buffering=None):
    def kern(s_ref, qw_ref, o_ref):
        o_ref[:] = qw_ref[:8, :].astype(jnp.float32) + s_ref[:]

    def f(small):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((8, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((K8, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(small, qw)
    return f


def bench(f, iters=100):
    def loop(small):
        def body(i, s):
            return f(s) * jnp.float32(1e-20)
        return jax.lax.fori_loop(0, iters, body, small)
    g = jax.jit(loop)
    small = jnp.zeros((8, N), jnp.float32)
    t0 = time.time(); _ = np.asarray(g(small)); comp = time.time() - t0
    t0 = time.time(); _ = np.asarray(g(small)); dt = (time.time() - t0) / iters
    return dt, comp


for bn in [256, 512, 1024]:
    dt, comp = bench(make(bn))
    print(f"BN={bn}: {dt*1e6:.0f}us  BW={nbytes/dt/1e9:.0f} GB/s (compile {comp:.0f}s)", flush=True)
