"""Isolate the generate-loop vs raw-decode-loop gap (session 7).

decode_decompose's full_loop (constant position, no token buffer) runs
10.39 ms/token while bench's generate measures 12.0 ms.  This probe times
four fori_loop variants, all 64 iterations inside one jit, fetch-synced:

  const_pos   — decode at a constant position (decompose's shape)
  traced_pos  — position = loop index + offset (generate's shape)
  +tokbuf     — traced pos + dynamic_slice/dynamic_update_slice of the
                [1, 256] output-token buffer (generate's bookkeeping)
  prefill     — one 64-token prefill, timed separately (amortization check)

Knobs: QEFT_BENCH_MAXLEN (default 512).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qeft_tpu.models.llama import (
    LLAMA_PRESETS,
    init_kv_cache,
    llama_decode_step,
    llama_prefill,
)
from qeft_tpu.testing import build_packed_model

MAX_LEN = int(os.environ.get("QEFT_BENCH_MAXLEN", "512"))
ITERS = 64
CTX = 64

cfg = LLAMA_PRESETS["llama2-7b"]
params = jax.device_put(build_packed_model(cfg, jax.random.PRNGKey(0), fuse_stages=True))


def _small(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


def _null_rtt() -> float:
    g = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.float32)
    _small(g(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _small(g(x))
        best = min(best, time.perf_counter() - t0)
    return best


RTT = _null_rtt()
print(f"null dispatch+fetch RTT: {RTT*1e3:.1f}ms")


def timeit(fn, *args):
    _small(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _small(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 1e-9)


cache = init_kv_cache(cfg, 1, MAX_LEN, dtype=jnp.bfloat16)


@jax.jit
def const_pos(params, cache):
    def body(i, carry):
        tok, cache = carry
        logits, cache = llama_decode_step(
            params, tok, cache, jnp.int32(MAX_LEN - 2), cfg)
        return jnp.argmax(logits, -1).astype(jnp.int32)[:, None], cache

    return jax.lax.fori_loop(0, ITERS, body, (jnp.zeros((1, 1), jnp.int32), cache))


@jax.jit
def traced_pos(params, cache):
    def body(i, carry):
        tok, cache = carry
        logits, cache = llama_decode_step(params, tok, cache, CTX + i, cfg)
        return jnp.argmax(logits, -1).astype(jnp.int32)[:, None], cache

    return jax.lax.fori_loop(0, ITERS, body, (jnp.zeros((1, 1), jnp.int32), cache))


@jax.jit
def traced_tokbuf(params, cache):
    out = jnp.zeros((1, 256), jnp.int32)

    def body(i, carry):
        out, cache = carry
        cur = jax.lax.dynamic_slice(out, (0, i), (1, 1))
        logits, cache = llama_decode_step(params, cur, cache, CTX + i, cfg)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, i + 1))
        return out, cache

    return jax.lax.fori_loop(0, ITERS, body, (out, cache))


@jax.jit
def prefill(params, toks, cache):
    logits, cache = llama_prefill(params, toks, cache, cfg)
    return jnp.argmax(logits[:, -1], -1), cache


toks = jnp.zeros((1, CTX), jnp.int32)
for name, fn, args in (
    ("const_pos ", const_pos, (params, cache)),
    ("traced_pos", traced_pos, (params, cache)),
    ("traced+buf", traced_tokbuf, (params, cache)),
):
    t = timeit(fn, *args)
    print(f"{name}: {t/ITERS*1e3:7.3f} ms/token  ({ITERS/t:6.1f} tok/s)")

tp = timeit(prefill, params, toks, cache)
print(f"prefill {CTX} tokens: {tp*1e3:7.1f} ms  "
      f"(amortized over 256 gen: {tp/256*1e3:5.3f} ms/token)")
