"""Decode-step time decomposition (real 7B checkpoint when present,
random shape-faithful builder otherwise — a notice is printed).

bench.py shows ~15.3 ms/token while the pure weight-stream floor is ~11.5 ms
(3.86 GB at the chip's measured ~335 GB/s): ~25% of each step is NOT weight
streaming.  This probe measures where it goes, all inside single jits
(fori_loop/scan) so tunnel dispatch amortizes:

  full       — llama_decode_step + argmax, cache carried through the loop
  matvec     — the four stage-fused projections scanned over all layers +
               lm_head: the kernel-only weight-streaming floor
  no_lmhead  — full step with a 128-column lm_head (delta = lm_head cost)
  attn       — decode attention alone over the real-size cache (incl. the
               KV write), XLA vs Pallas paths

residual = full - matvec - attn - lm_head ~= norms + rope + embed + gathers
+ per-kernel entry/exit overhead.

Knobs: QEFT_BENCH_MAXLEN (default 512), QEFT_KV_DTYPE=int8, QEFT_PALLAS_ATTN.
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
from qeft_tpu.models.llama import apply_linear, init_kv_cache, llama_decode_step
from qeft_tpu.models.registry import get_model_meta
from qeft_tpu.pipeline import fuse_packed_stages

CKPT = os.environ.get(
    "QEFT_BENCH_CKPT", "/root/repo/ckpt/llama2_7b_w4g128r128_packed"
)
MAX_LEN = int(os.environ.get("QEFT_BENCH_MAXLEN", "512"))
POS = MAX_LEN - 2  # steady-state decode position
ITERS = 64

if os.path.exists(CKPT + ".json"):
    params, cfg, family = load_packed(CKPT)
    params = fuse_packed_stages(params, get_model_meta(family))
else:  # fresh VM: same shape-faithful fallback as bench.py
    from qeft_tpu.models.llama import LLAMA_PRESETS
    from qeft_tpu.testing import build_packed_model

    print(f"NOTE: ckpt manifest missing at {CKPT}.json — using the random "
          "packed builder (shape-faithful, NOT real pipeline weights)")
    cfg = LLAMA_PRESETS["llama2-7b"]
    params = build_packed_model(cfg, jax.random.PRNGKey(0), fuse_stages=True)
params = jax.device_put(params)
quant_kv = os.environ.get("QEFT_KV_DTYPE", "").lower() == "int8"


def _small(out):
    """A tiny leaf of ``out`` to fetch host-side.  On the relayed chip
    ``block_until_ready`` is NOT a reliable completion barrier (session-3 [B]
    measured a 64-step 7B decode loop at 0.13 ms total); only an actual data
    pull (np.asarray) proves the computation ran.  Every timed loop here
    returns a value data-dependent on ALL its iterations, so fetching one
    scalar forces the whole chain."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


def _null_rtt() -> float:
    """Dispatch + 1-scalar fetch round-trip through the relay: the fixed
    per-measurement cost to subtract."""
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
    _small(fn(*args))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _small(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 1e-9) / ITERS


# --- full decode step ------------------------------------------------------
cache = init_kv_cache(cfg, 1, MAX_LEN, dtype=jnp.bfloat16)


@jax.jit
def full_loop(params, cache):
    def body(i, carry):
        tok, cache = carry
        logits, cache = llama_decode_step(params, tok, cache, jnp.int32(POS), cfg)
        return jnp.argmax(logits, -1).astype(jnp.int32)[:, None], cache

    return jax.lax.fori_loop(0, ITERS, body, (jnp.zeros((1, 1), jnp.int32), cache))


t_full = timeit(full_loop, params, cache)

# --- weight-streaming floor: projections only ------------------------------
d, f = cfg.hidden_size, cfg.intermediate_size
hq, dh = cfg.num_heads, cfg.head_dim
x_d = jnp.zeros((1, d), jnp.bfloat16)
x_q = jnp.zeros((1, hq * dh), jnp.bfloat16)
x_f = jnp.zeros((1, f), jnp.bfloat16)
layers = params["layers"]
proj_in = [("qkv", x_d), ("o", x_q), ("upgate", x_d), ("down", x_f)]
proj_in = [(n, x) for n, x in proj_in if n in layers]


@jax.jit
def matvec_loop(layers, lm_head):
    # every iteration's inputs depend on the previous iteration's outputs:
    # XLA hoists loop-INVARIANT chains out of fori_loop entirely (session-4
    # [B] measured the "floor" at one-pass cost divided by ITERS).
    # Kernels run through the SAME stacked StackedLinear views the decode
    # scan uses (qgemv_stacked scalar-prefetch) — the old apply_linear-over-
    # scan version timed the slower scan-slice path (stale per BASELINE.md).
    from qeft_tpu.ops.packing import StackedLinear
    from qeft_tpu.ops.qlinear import qlinear_apply_stacked

    n_layers = jax.tree.leaves(layers["qkv"])[0].shape[0]

    def step(i, carry):
        acc, xd, xq, xf = carry

        def one(name, x):
            def body(li, c):
                xc, a = c
                y = qlinear_apply_stacked(xc, StackedLinear(layers[name], li))
                return (xc + y[0, :1].astype(xc.dtype) * 1e-12,
                        a + y[0, 0].astype(jnp.float32))

            _, c = jax.lax.fori_loop(0, n_layers, body, (x, jnp.float32(0)))
            return c

        ins = {"qkv": xd, "o": xq, "upgate": xd, "down": xf}
        acc = acc + sum(one(n, ins[n]) for n, _ in proj_in)
        acc = acc + jnp.matmul(xd, lm_head)[0, 0].astype(jnp.float32)
        d = (acc * 1e-20).astype(jnp.bfloat16)
        return acc, xd + d, xq + d, xf + d

    return jax.lax.fori_loop(
        0, ITERS, step, (jnp.float32(0), x_d, x_q, x_f)
    )[0]


lm = params["lm_head"]
t_matvec = timeit(matvec_loop, {n: layers[n] for n, _ in proj_in}, lm)

# --- lm_head cost ----------------------------------------------------------
small = dict(params, lm_head=lm[:, :128])


@jax.jit
def nolm_loop(params, cache):
    def body(i, carry):
        tok, cache = carry
        logits, cache = llama_decode_step(params, tok, cache, jnp.int32(POS), cfg)
        return (jnp.argmax(logits, -1) % 128).astype(jnp.int32)[:, None], cache

    return jax.lax.fori_loop(0, ITERS, body, (jnp.zeros((1, 1), jnp.int32), cache))


t_nolm = timeit(nolm_loop, small, cache)

# --- attention alone -------------------------------------------------------
hkv = cfg.num_kv_heads
q = jnp.zeros((1, hq, dh), jnp.bfloat16)
kv_new = jnp.zeros((1, hkv, 1, dh), jnp.bfloat16)
kc = jnp.zeros((cfg.num_layers, 1, hkv, MAX_LEN, dh), jnp.bfloat16)


def attn_loop_factory(pallas: bool):
    if pallas:
        from qeft_tpu.ops.pallas_attention import decode_attention

        def attend_q(q_cur, k_all, v_all):
            return decode_attention(q_cur, k_all, v_all, jnp.int32(POS))
    else:
        from qeft_tpu.models.llama import _attention

        valid = jnp.arange(MAX_LEN)[None, None, None, :] <= POS
        mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)

        def attend_q(q_cur, k_all, v_all):
            # q as [B, Sq=1, H, Dh]
            return _attention(
                q_cur[:, None], k_all, v_all, mask, hq // hkv, jnp.bfloat16
            )

    @jax.jit
    def attn_loop(kc, vc):
        def step(i, carry):
            q_cur, acc = carry

            def body(c, kv):
                k_l, v_l = kv
                k_l = jax.lax.dynamic_update_slice(k_l, kv_new, (0, 0, POS, 0))
                v_l = jax.lax.dynamic_update_slice(v_l, kv_new, (0, 0, POS, 0))
                ctx = attend_q(q_cur, k_l, v_l)
                return c + jnp.sum(ctx.astype(jnp.float32)), None

            acc2, _ = jax.lax.scan(body, jnp.float32(0), (kc, vc))
            # q depends on the step's result: nothing hoists
            return q_cur + (acc2 * 1e-20).astype(q_cur.dtype), acc + acc2

        return jax.lax.fori_loop(0, ITERS, step, (q, jnp.float32(0)))[1]

    return attn_loop


t_attn_xla = timeit(attn_loop_factory(False), kc, kc)
t_attn_pal = timeit(attn_loop_factory(True), kc, kc)

lm_cost = t_full - t_nolm
t_attn = min(t_attn_xla, t_attn_pal)
residual = t_full - t_matvec - t_attn
print(f"cache slots {MAX_LEN}, pos {POS}, int8_kv={quant_kv}")
print(f"full step        : {t_full*1e3:8.3f} ms/token  ({1/t_full:6.1f} tok/s)")
print(f"matvec floor     : {t_matvec*1e3:8.3f} ms  ({t_matvec/t_full*100:4.1f}%)")
print(f"lm_head (delta)  : {lm_cost*1e3:8.3f} ms  ({lm_cost/t_full*100:4.1f}%)")
print(f"attention xla    : {t_attn_xla*1e3:8.3f} ms  ({t_attn_xla/t_full*100:4.1f}%)")
print(f"attention pallas : {t_attn_pal*1e3:8.3f} ms  ({t_attn_pal/t_full*100:4.1f}%)")
print(f"residual (norms/rope/embed/overhead): {residual*1e3:8.3f} ms  "
      f"({residual/t_full*100:4.1f}%)")
