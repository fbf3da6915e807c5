"""Stacked-cache decode attention (decode_attention_stacked) + the
copy-free decode step built on it (QEFT_ATTN_STACKED).

The kernel reads layer ``l``'s slab straight out of the [L, B, H_kv, S, D]
cache (scalar-prefetch layer select) and folds the current token's K/V in as
an extra width-1 flash term — slots at ``pos`` hold STALE data and must be
masked strictly.  The oracle computes attention over [cache[:pos] ; new]."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qeft_tpu.ops.pallas_attention import decode_attention_stacked


def reference_stacked(q, k_cache, v_cache, layer, pos, k_new, v_new):
    """softmax over [cache[layer, :, :, :pos] ; new token] per (b, head)."""
    b, h, d = q.shape
    _, _, hkv, s, _ = k_cache.shape
    n_rep = h // hkv
    out = np.zeros_like(q)
    for bi in range(b):
        for hi in range(h):
            kv = hi // n_rep
            keys = np.concatenate(
                [k_cache[layer, bi, kv, :pos, :], k_new[bi, kv][None]], axis=0
            )
            vals = np.concatenate(
                [v_cache[layer, bi, kv, :pos, :], v_new[bi, kv][None]], axis=0
            )
            scores = keys @ q[bi, hi] * (d**-0.5)
            p = np.exp(scores - scores.max())
            p /= p.sum()
            out[bi, hi] = p @ vals
    return out


@pytest.mark.parametrize("layer,pos,blk", [(0, 0, 8), (1, 5, 8), (2, 37, 16),
                                           (3, 63, 8)])
def test_stacked_attention_matches_oracle(layer, pos, blk):
    rng = np.random.default_rng(0)
    L, b, h, hkv, d, s = 4, 2, 8, 4, 128, 64
    q = rng.normal(size=(b, h, d)).astype(np.float32)
    k = rng.normal(size=(L, b, hkv, s, d)).astype(np.float32)
    v = rng.normal(size=(L, b, hkv, s, d)).astype(np.float32)
    kn = rng.normal(size=(b, hkv, d)).astype(np.float32)
    vn = rng.normal(size=(b, hkv, d)).astype(np.float32)
    # poison slots >= pos (incl. the stale slot at pos): the kernel must
    # never read them into the result
    k[:, :, :, pos:, :] = 1e4
    v[:, :, :, pos:, :] = 1e4

    out = np.asarray(decode_attention_stacked(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(layer),
        jnp.int32(pos), jnp.asarray(kn), jnp.asarray(vn), blk=blk,
    ))
    ref = reference_stacked(q, k, v, layer, pos, kn, vn)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_stacked_attention_int8_scales():
    rng = np.random.default_rng(1)
    L, b, h, hkv, d, s, pos = 2, 1, 4, 2, 128, 128, 21
    q = rng.normal(size=(b, h, d)).astype(np.float32)
    codes_k = rng.integers(-127, 127, size=(L, b, hkv, s, d)).astype(np.int8)
    codes_v = rng.integers(-127, 127, size=(L, b, hkv, s, d)).astype(np.int8)
    ks = (rng.uniform(0.005, 0.02, size=(L, b, hkv, s))).astype(np.float32)
    vs = (rng.uniform(0.005, 0.02, size=(L, b, hkv, s))).astype(np.float32)
    kn = rng.normal(size=(b, hkv, d)).astype(np.float32)
    vn = rng.normal(size=(b, hkv, d)).astype(np.float32)

    out = np.asarray(decode_attention_stacked(
        jnp.asarray(q), jnp.asarray(codes_k), jnp.asarray(codes_v),
        jnp.int32(1), jnp.int32(pos), jnp.asarray(kn), jnp.asarray(vn),
        blk=128, k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs),
    ))
    k_deq = codes_k.astype(np.float32) * ks[..., None]
    v_deq = codes_v.astype(np.float32) * vs[..., None]
    ref = reference_stacked(q, k_deq, v_deq, 1, pos, kn, vn)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def _packed(cfg, dtype=jnp.float32):
    from qeft_tpu.testing import build_packed_model

    return build_packed_model(cfg, jax.random.PRNGKey(0), g=64, r=16,
                              fuse_stages=True, dtype=dtype)


@pytest.mark.parametrize("quantized", [False, True])
def test_decode_step_stacked_attn_matches_default(monkeypatch, quantized):
    """QEFT_ATTN_STACKED decode == the default decode step (same greedy
    logits; for int8 caches the new-token term skips the quantize round-trip,
    so compare within the quantization error of one vector)."""
    from qeft_tpu.models import LLAMA_PRESETS, init_kv_cache
    from qeft_tpu.models.llama import llama_decode_step, llama_prefill

    monkeypatch.setenv("QEFT_PALLAS", "1")
    cfg = LLAMA_PRESETS["tiny-v2"]
    params = _packed(cfg)
    cache = init_kv_cache(cfg, 2, 128 if quantized else 32,
                          dtype=jnp.float32, quantized=quantized)
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 6)))
    _, cache = llama_prefill(params, prompt, cache, cfg)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 1)))

    monkeypatch.setenv("QEFT_ATTN_STACKED", "0")
    ref_logits, ref_cache = llama_decode_step(params, tok, cache, jnp.int32(6),
                                              cfg)
    monkeypatch.setenv("QEFT_ATTN_STACKED", "1")
    logits, new_cache = llama_decode_step(params, tok, cache, jnp.int32(6),
                                          cfg)
    tol = 5e-2 if quantized else 2e-3
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=tol, atol=tol)
    # the cache write-back is identical (token-granular, post-scan)
    for name in new_cache:
        np.testing.assert_allclose(
            np.asarray(new_cache[name][:, :, :, 6], np.float32),
            np.asarray(ref_cache[name][:, :, :, 6], np.float32),
            rtol=2e-3, atol=2e-3,
        )


def test_decode_step_stacked_attn_multi_step(monkeypatch):
    """Three successive stacked-attn decode steps stay on the reference
    trajectory (cache writes land where the next step reads)."""
    from qeft_tpu.models import LLAMA_PRESETS, init_kv_cache
    from qeft_tpu.models.llama import llama_decode_step, llama_prefill

    monkeypatch.setenv("QEFT_PALLAS", "1")
    cfg = LLAMA_PRESETS["tiny-v2"]
    params = _packed(cfg)
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 5)))

    def run(flag):
        monkeypatch.setenv("QEFT_ATTN_STACKED", flag)
        cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
        _, cache = llama_prefill(params, prompt, cache, cfg)
        tok = jnp.asarray([[7]])
        toks = []
        for i in range(3):
            logits, cache = llama_decode_step(params, tok, cache,
                                              jnp.int32(5 + i), cfg)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            toks.append(int(tok[0, 0]))
        return toks

    assert run("1") == run("0")
