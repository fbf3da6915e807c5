"""Isolate the pallas pipeline's pure streaming rate vs the qmm kernel."""
import time, sys, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

K, N = 11008, 4096
BN = 512
qw = jnp.ones((K // 8, N), jnp.int32)

def dma_kernel(qw_ref, o_ref):
    o_ref[:] = jnp.broadcast_to(jnp.sum(qw_ref[:], axis=0, keepdims=True).astype(jnp.float32), o_ref.shape)

def dma_only(qw):
    return pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        grid=(N // BN,),
        in_specs=[pl.BlockSpec((K // 8, BN), lambda j: (0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, BN), lambda j: (0, j), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(qw)

def bench(f, arg, iters=50):
    def loop(a):
        def body(i, c):
            y = f(a + c.astype(a.dtype))
            return (y[0, :1] * 0).astype(jnp.int32)[0]
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))
    g = jax.jit(loop)
    t0 = time.time(); _ = np.asarray(g(arg)); comp = time.time() - t0
    t0 = time.time(); _ = np.asarray(g(arg)); dt = (time.time() - t0) / iters
    return dt, comp

nbytes = (K // 8) * N * 4
dt, comp = bench(dma_only, qw)
print(f"dma-only sum kernel: {dt*1e6:.0f}us  BW={nbytes/dt/1e9:.0f} GB/s (compile {comp:.0f}s)", flush=True)

# same but with int-ops per plane (no dots): measures unpack VPU cost
def unpack_kernel(qw_ref, o_ref):
    qw = qw_ref[:]
    acc = jnp.zeros((1, qw.shape[1]), jnp.float32)
    for p in range(8):
        plane = (qw >> (4 * p)) & 0xF
        acc += jnp.sum(plane.astype(jnp.float32), axis=0, keepdims=True)
    o_ref[:] = jnp.broadcast_to(acc, o_ref.shape)

def unpack_only(qw):
    return pl.pallas_call(
        unpack_kernel,
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        grid=(N // BN,),
        in_specs=[pl.BlockSpec((K // 8, BN), lambda j: (0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, BN), lambda j: (0, j), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(qw)

dt, comp = bench(unpack_only, qw)
print(f"unpack+reduce kernel: {dt*1e6:.0f}us  BW={nbytes/dt/1e9:.0f} GB/s (compile {comp:.0f}s)", flush=True)
