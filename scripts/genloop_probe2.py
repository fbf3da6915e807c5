"""Part 2 of the generate-loop gap hunt: same-process A/B of
(a) generate() exactly as bench calls it and (b) the raw decode fori_loop at
the SAME iteration count (255).  If (b) stays ~96 tok/s while (a) reads ~84,
the cost is in generate's program structure; if (b) degrades at 255 iters,
the 64-iter probes were flattered by warm-up effects."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qeft_tpu.generate import SampleConfig, generate
from qeft_tpu.models.llama import LLAMA_PRESETS, init_kv_cache, llama_decode_step
from qeft_tpu.testing import build_packed_model

MAX_LEN = int(os.environ.get("QEFT_BENCH_MAXLEN", "512"))
CTX, GEN = 64, 256
ITERS = GEN - 1

cfg = LLAMA_PRESETS["llama2-7b"]
params = jax.device_put(build_packed_model(cfg, jax.random.PRNGKey(0), fuse_stages=True))


def _small(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


g = jax.jit(lambda x: x + 1)
_small(g(jnp.zeros((8, 128), jnp.float32)))
RTT = min(
    (lambda t0: (_small(g(jnp.zeros((8, 128), jnp.float32))), time.perf_counter() - t0)[1])(
        time.perf_counter()
    )
    for _ in range(5)
)
print(f"null RTT: {RTT*1e3:.1f}ms")

cache = init_kv_cache(cfg, 1, MAX_LEN, dtype=jnp.bfloat16)
prompt = jax.random.randint(jax.random.PRNGKey(0), (1, CTX), 0, cfg.vocab_size, jnp.int32)
sc = SampleConfig(greedy=True)


def timeit(fn, *args, reps=3):
    _small(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _small(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 1e-9)


@jax.jit
def raw_loop(params, cache):
    out = jnp.zeros((1, GEN), jnp.int32)

    def body(i, carry):
        out, cache = carry
        cur = jax.lax.dynamic_slice(out, (0, i - 1), (1, 1))
        logits, cache = llama_decode_step(params, cur, cache, CTX + i - 1, cfg)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, i))
        return out, cache

    return jax.lax.fori_loop(1, GEN, body, (out, cache))


t_raw = timeit(raw_loop, params, cache)
print(f"raw 255-step loop : {t_raw/ITERS*1e3:7.3f} ms/token ({ITERS/t_raw:6.1f} tok/s)")

t_gen = timeit(generate, params, prompt, cache, cfg, GEN, sc)
print(f"generate(256)     : {t_gen/GEN*1e3:7.3f} ms/token ({GEN/t_gen:6.1f} tok/s)")


# --- probe 3: prefill FUSED into the same program as the loop --------------
from qeft_tpu.models.llama import llama_prefill


@jax.jit
def prefill_plus_loop(params, prompt, cache):
    logits, cache = llama_prefill(params, prompt, cache, cfg)
    out = jnp.zeros((1, GEN), jnp.int32)
    out = out.at[:, 0].set(jnp.argmax(logits[:, -1], -1).astype(jnp.int32))

    def body(i, carry):
        out, cache = carry
        cur = jax.lax.dynamic_slice(out, (0, i - 1), (1, 1))
        logits, cache = llama_decode_step(params, cur, cache, CTX + i - 1, cfg)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, i))
        return out, cache

    return jax.lax.fori_loop(1, GEN, body, (out, cache))


t_pl = timeit(prefill_plus_loop, params, prompt, cache)
print(f"prefill+loop fused: {t_pl/GEN*1e3:7.3f} ms/token ({GEN/t_pl:6.1f} tok/s)")
