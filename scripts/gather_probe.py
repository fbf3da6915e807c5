"""Price per-layer [1,4096] channel-permutation implementations on TPU.

The OGR o-projection gather (`jnp.take(ctx, o_reorder[l], -1)`) costs
~1.07 ms/token in the 7B decode loop (residual_probe.py) — a dynamic LANE
gather per layer, pathological on TPU vector memory.  This probe times
alternatives, each inside a 32-iteration scan (one per "layer") chained for
64 "tokens" so dispatch amortizes and nothing hoists:

  take_lane    — current: jnp.take along the last (lane) axis
  take_sublane — transpose to [4096, 1], gather rows, transpose back
  onehot_bf16  — x @ P with P the stacked [L, 4096, 4096] bf16 one-hot
                 (streams 33 MB/layer — priced for reference)
  onehot_tail  — x @ S with S [L, 4096, 128] bf16 one-hot: the selection
                 matmul that replaces the gather for a tail-only design
  take_static  — jnp.take with layer-0's indices CONSTANT (what a fully
                 unrolled layer loop could compile to)
  baseline     — no permutation (loop + glue cost to subtract)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

L, K, R, ITERS = 32, 4096, 128, 64

rng = np.random.default_rng(0)
perms = np.stack([rng.permutation(K) for _ in range(L)]).astype(np.int32)
idx = jnp.asarray(perms)  # [L, K]
tail_idx = jnp.asarray(perms[:, -R:])  # [L, R]
x0 = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)

P = jnp.asarray(
    np.eye(K, dtype=np.float32)[perms].transpose(0, 2, 1), jnp.bfloat16
)  # [L, K, K]: (x @ P[l])[j] = x[perm[l, j]]
S = P[:, :, -R:]  # [L, K, R] tail selection


def _small(out):
    return np.asarray(jax.tree.leaves(out)[0].ravel()[:1])


def _null_rtt():
    g = jax.jit(lambda x: x + 1)
    _small(g(x0))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _small(g(x0))
        best = min(best, time.perf_counter() - t0)
    return best


RTT = _null_rtt()
print(f"null RTT {RTT*1e3:.1f} ms")


def timeit(fn, *args):
    _small(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _small(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 1e-9) / ITERS


def make(variant):
    @jax.jit
    def loop(x, idx, P, S):
        def tok(i, xc):
            def layer(xl, l):
                if variant == "take_lane":
                    y = jnp.take(xl, idx[l], axis=-1)
                elif variant == "take_sublane":
                    y = jnp.take(xl.reshape(K, 1), idx[l], axis=0).reshape(1, K)
                elif variant == "onehot_bf16":
                    y = jnp.dot(xl, P[l], preferred_element_type=jnp.float32
                                ).astype(xl.dtype)
                elif variant == "onehot_tail":
                    t = jnp.dot(xl, S[l], preferred_element_type=jnp.float32)
                    y = xl.at[:, :R].add(t.astype(xl.dtype))  # consume tail
                elif variant == "take_static":
                    y = jnp.take(xl, idx0_const, axis=-1)
                else:
                    y = xl
                return y + jnp.bfloat16(1e-8), None

            xc, _ = jax.lax.scan(layer, xc, jnp.arange(L))
            return xc

        return jax.lax.fori_loop(0, ITERS, tok, x)

    return loop


idx0_const = jnp.asarray(perms[0])

# --- banded compaction variants -------------------------------------------
# The OGR o permutation is a COMPACTION: non-outliers keep relative order,
# so every non-tail output takes its source from within [j, j+R] — output
# 128-block b reads only input blocks {b, b+1}.  The permutation then
# factors into 31 per-block [256 -> 128] one-hot matmuls + a [K -> R] tail
# selection, streaming ~2 MB/layer instead of executing a 4096-lane gather.
NB = K // 128 - 1  # banded out-blocks (the last block is the outlier tail)
comp_perms = np.stack([
    np.concatenate([np.setdiff1d(np.arange(K), p[-R:], assume_unique=False),
                    p[-R:]])
    for p in perms
])  # true compactions: non-outliers in order, outliers last
band = np.zeros((L, NB, 256, 128), np.float32)
for l in range(L):
    for j in range(NB * 128):
        b, o = divmod(j, 128)
        src = comp_perms[l, j]
        assert 0 <= src - 128 * b < 256, (l, j, src)
        band[l, b, src - 128 * b, o] = 1.0
band = jnp.asarray(band, jnp.bfloat16)
S_c = jnp.asarray(
    np.eye(K, dtype=np.float32)[comp_perms[:, -R:]].transpose(0, 2, 1),
    jnp.bfloat16,
)  # [L, K, R]


def make_band(variant):
    @jax.jit
    def loop(x, band, S_c):
        def tok(i, xc):
            def layer(xl, l):
                mat = xl.reshape(K // 128, 128)
                pairs = jnp.concatenate([mat[:-1], mat[1:]], axis=1)  # [31,256]
                if variant == "einsum":
                    bd = jnp.einsum(
                        "bk,bkn->bn", pairs, band[l],
                        preferred_element_type=jnp.float32,
                    )
                else:  # unrolled static dots
                    bd = jnp.stack([
                        jnp.dot(pairs[b], band[l, b],
                                preferred_element_type=jnp.float32)
                        for b in range(NB)
                    ])
                tail = jnp.dot(xl, S_c[l], preferred_element_type=jnp.float32)
                y = jnp.concatenate(
                    [bd.reshape(1, NB * 128), tail.reshape(1, R)], axis=-1
                ).astype(xl.dtype)
                return y + jnp.bfloat16(1e-8), None

            xc, _ = jax.lax.scan(layer, xc, jnp.arange(L))
            return xc

        return jax.lax.fori_loop(0, ITERS, tok, x)

    return loop


def check_band():
    """Band+tail must equal the plain take for a true compaction."""
    mat = np.asarray(x0, np.float32).reshape(K // 128, 128)
    pairs = np.concatenate([mat[:-1], mat[1:]], axis=1)
    bd = np.einsum("bk,bkn->bn", pairs, np.asarray(band[0], np.float32))
    tail = np.asarray(x0, np.float32) @ np.asarray(S_c[0], np.float32)
    got = np.concatenate([bd.reshape(-1), tail.reshape(-1)])
    want = np.asarray(x0, np.float32)[0, comp_perms[0]]
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


base = timeit(make("baseline"), x0, idx, P, S)
print(f"baseline      : {base*1e6:8.1f} us/token-equivalent")
for v in ("take_lane", "take_sublane", "onehot_tail", "take_static",
          "onehot_bf16"):
    t = timeit(make(v), x0, idx, P, S)
    print(f"{v:14s}: {t*1e6:8.1f} us  (delta {1e6*(t-base):+8.1f} us "
          f"= {1e3*(t-base):+6.3f} ms/token)")
check_band()
for v in ("einsum", "unrolled"):
    t = timeit(make_band(v), x0, band, S_c)
    print(f"band_{v:9s}: {t*1e6:8.1f} us  (delta {1e6*(t-base):+8.1f} us "
          f"= {1e3*(t-base):+6.3f} ms/token)")
