"""Decode-step cost decomposition at the CURRENT operating point (~100 tok/s
after the group-interleaved layout, scripts/migrate_word_layout.py).

Questions this answers (all on-chip, fetch-synced, RTT-subtracted):
  [A] What does ONE pallas_call ENTRY cost? (tiny kernel, chained fori_loop)
      -> multiplies by ~129 entries/token to bound the fusion win.
  [B] What does each fused decode stage cost stand-alone at 7B shapes
      (qkv 4096->12288, o 4096->4096, upgate 4096->22016, down 11008->4096)?
      -> sum*32 + attention + lm_head vs the measured full step isolates the
      glue (rope/slicing/KV-update/residual plumbing XLA runs between calls).
  [C] What do the XLA attention + lm_head cost inside the loop regime?

Run: python scripts/entry_overhead_probe.py  (needs the TPU relay)
"""

import functools
import os
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

from qeft_tpu.models.llama import LLAMA_PRESETS, init_kv_cache, llama_decode_step
from qeft_tpu.ops.pallas_qmm import qgemv_stacked_fused
from qeft_tpu.testing import build_packed_model


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


def timeit(fn, *args, reps=3):
    """best-of over reps of an iteration-chained jitted fn; returns seconds."""
    _fetch1(fn(*args))  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch1(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 1e-9)


# --- [A] pallas entry overhead: tiny kernel, 512 chained calls in a loop ---
def _tiny_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def _tiny_call(x):
    return pl.pallas_call(
        _tiny_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)


ITERS = 512


@jax.jit
def chain_pallas(x):
    return jax.lax.fori_loop(0, ITERS, lambda i, a: _tiny_call(a), x)


@jax.jit
def chain_xla(x):
    return jax.lax.fori_loop(0, ITERS, lambda i, a: a + 1.0, x)


x0 = jnp.zeros((8, 128), jnp.float32)
t_p = timeit(chain_pallas, x0)
t_x = timeit(chain_xla, x0)
per_entry = (t_p - t_x) / ITERS
print(f"[A] pallas chain {t_p*1e3:.2f} ms, xla chain {t_x*1e3:.2f} ms "
      f"-> {per_entry*1e6:.2f} us per pallas entry "
      f"(x129 entries/token = {per_entry*129*1e3:.2f} ms/token)", flush=True)

# --- [B] per-stage fused matvec at 7B shapes ------------------------------
cfg = LLAMA_PRESETS["llama2-7b"]
params = jax.device_put(
    build_packed_model(cfg, jax.random.PRNGKey(0), fuse_stages=True)
)
layers = params["layers"]
L = cfg.num_layers
d, f = cfg.hidden_size, cfg.intermediate_size

STAGES = [
    ("qkv", "qkv", d, True),     # norm in prologue
    ("o", "o", d, False),
    ("upgate", "upgate", d, True),
    ("down", "down", f, False),
]

stage_ms = {}
for name, key, k_in, normed in STAGES:
    lin = layers[key]
    lnw = layers["input_ln"][0] if normed else None
    xs = jnp.ones((1, 1, k_in), jnp.bfloat16) * 0.01

    def run(x, lin=lin, lnw=lnw, k_in=k_in):
        def body(i, a):
            y = qgemv_stacked_fused(
                a, lin, jnp.int32(0), lnw=lnw, eps=cfg.rms_norm_eps,
            )
            # keep the carry shape AND a real data dependency (a *0.0 fold
            # would let XLA dead-code the kernel out of the loop entirely)
            w = min(k_in, y.shape[-1])
            dep = jnp.pad(y[..., :w] * jnp.bfloat16(1e-8),
                          ((0, 0), (0, 0), (0, k_in - w)))
            return a + dep

        return jax.lax.fori_loop(0, 64, body, x)

    t = timeit(jax.jit(run), xs) / 64
    stage_ms[name] = t * 1e3
    print(f"[B] {name}: {t*1e6:.1f} us/call  (x32 = {t*32*1e3:.2f} ms/token)",
          flush=True)

print(f"[B] sum of 4 stages x32 = {sum(stage_ms.values())*32:.2f} ms/token",
      flush=True)

# --- [C] full decode step at pos ~510 -------------------------------------
MAX_LEN = int(os.environ.get("QEFT_BENCH_MAXLEN", "512"))
cache = init_kv_cache(cfg, 1, MAX_LEN, dtype=jnp.bfloat16)
tok = jnp.zeros((1, 1), jnp.int32)


@jax.jit
def step_loop(params, tok, cache):
    def body(i, carry):
        t, c = carry
        lg, c = llama_decode_step(params, t, c, jnp.int32(448) + i, cfg)
        return jnp.argmax(lg, -1)[:, None].astype(jnp.int32), c

    return jax.lax.fori_loop(0, 64, body, (tok, cache))


t_step = timeit(step_loop, params, tok, cache) / 64
print(f"[C] full decode step: {t_step*1e3:.2f} ms/token "
      f"({1/t_step:.1f} tok/s raw loop)", flush=True)

glue = t_step * 1e3 - sum(stage_ms.values()) * 32
print(f"    step - stages = {glue:.2f} ms/token of attention + lm_head + "
      f"glue", flush=True)
