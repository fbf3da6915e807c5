"""Residual-glue decomposition: time llama_decode_step variants with single
pieces surgically removed (timing-only — the ablated variants compute WRONG
math; they exist to price each piece of per-layer XLA glue).

decode_decompose.py prices matvec/attention/lm_head; the ~0.9 ms residual
(norms/rope/embed/gathers/entry overhead) is what this probe splits:

  full        — llama_decode_step + argmax (same as decode_decompose)
  no_rope     — apply_rope skipped on q and k
  no_gather   — the per-layer o_reorder gather skipped
  no_kvwrite  — no in-block cache update_slice, no post-scan token write
  no_argmax   — feed a constant next token (prices argmax+token glue)
  no_attn     — attention replaced with a zeros ctx (prices attention+glue
                jointly with the kv write; cross-check vs decode_decompose)

Uses the real packed ckpt when present.  Knobs: QEFT_BENCH_MAXLEN (default
320 = bench ctx+gen), QEFT_PAD_UPGATE honored via load.
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

from qeft_tpu.checkpoint import load_packed
from qeft_tpu.models import llama as L
from qeft_tpu.models.llama import init_kv_cache
from qeft_tpu.models.registry import get_model_meta
from qeft_tpu.pipeline import fuse_packed_stages

CKPT = os.environ.get(
    "QEFT_BENCH_CKPT", "/root/repo/ckpt/llama2_7b_w4g128r128_packed"
)
MAX_LEN = int(os.environ.get("QEFT_BENCH_MAXLEN", "320"))
POS = MAX_LEN - 2
ITERS = 64

if os.path.exists(CKPT + ".json"):
    params, cfg, family = load_packed(CKPT)
    params = fuse_packed_stages(params, get_model_meta(family))
else:
    from qeft_tpu.models.llama import LLAMA_PRESETS
    from qeft_tpu.testing import build_packed_model

    print("NOTE: random packed builder (no real ckpt)")
    cfg = LLAMA_PRESETS["llama2-7b"]
    params = build_packed_model(cfg, jax.random.PRNGKey(0), fuse_stages=True)
params = jax.device_put(params)


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
    return max(best - RTT, 1e-9) / ITERS


cache = init_kv_cache(cfg, 1, MAX_LEN, dtype=jnp.bfloat16)


def make_loop(argmax=True):
    @jax.jit
    def loop(params, cache):
        def body(i, carry):
            tok, cache = carry
            logits, cache = L.llama_decode_step(
                params, tok, cache, jnp.int32(POS), cfg
            )
            if argmax:
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
            else:
                # still data-dependent on logits so nothing hoists
                nxt = (logits[:, :1] * 1e-20).astype(jnp.int32) + 1
            return nxt, cache

        return jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((1, 1), jnp.int32), cache)
        )

    return loop


results = {}
results["full"] = timeit(make_loop(), params, cache)
results["no_argmax"] = timeit(make_loop(argmax=False), params, cache)

# --- monkeypatched variants (timing-only, wrong math) ----------------------
_orig_rope = L.apply_rope
_orig_tw = L._cache_token_write

try:
    L.apply_rope = lambda x, c, s: x
    results["no_rope"] = timeit(make_loop(), params, cache)
finally:
    L.apply_rope = _orig_rope

if "o_reorder" in params["layers"]:
    stripped = {
        **params,
        "layers": {k: v for k, v in params["layers"].items()
                   if k != "o_reorder"},
    }
    results["no_gather"] = timeit(make_loop(), stripped, cache)

# no kv write: block reads the cache as-is (stale), scan emits token slices
# but the final write is dropped AND the in-block update_slice is skipped by
# passing kv_out="token" with a no-op update — easiest surgical cut is to
# drop the post-scan write and patch dynamic_update_slice inside the block
# via the cache-write helper; the in-block slab update (llama_block:392) is
# priced separately by no_attn below.
try:
    L._cache_token_write = lambda cache, tok, pos: cache
    results["no_tokwrite"] = timeit(make_loop(), params, cache)
finally:
    L._cache_token_write = _orig_tw

_orig_attn = L._attention
try:
    L._attention = lambda q, k, v, m, r, dt: jnp.zeros(
        (q.shape[0], q.shape[1], q.shape[2] * q.shape[3]), dt
    )
    results["no_attn"] = timeit(make_loop(), params, cache)
finally:
    L._attention = _orig_attn

base = results["full"]
print(f"cache slots {MAX_LEN}, pos {POS}")
print(f"full        : {base*1e3:7.3f} ms/token ({1/base:6.1f} tok/s)")
for name in ("no_rope", "no_gather", "no_tokwrite", "no_argmax", "no_attn"):
    if name in results:
        t = results[name]
        print(f"{name:12s}: {t*1e3:7.3f} ms  (delta {1e3*(base-t):+6.3f} ms)")
