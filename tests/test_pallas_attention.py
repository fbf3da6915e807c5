import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qeft_tpu.ops.pallas_attention import decode_attention


def reference_attention(q, k_cache, v_cache, pos):
    """Masked single-query attention oracle in NumPy (head-major cache)."""
    b, h, d = q.shape
    _, hkv, s, _ = k_cache.shape
    n_rep = h // hkv
    out = np.zeros_like(q)
    for bi in range(b):
        for hi in range(h):
            kv = hi // n_rep
            scores = k_cache[bi, kv, :, :] @ q[bi, hi] * (d**-0.5)
            scores[pos + 1 :] = -np.inf
            p = np.exp(scores - scores.max())
            p /= p.sum()
            out[bi, hi] = p @ v_cache[bi, kv, :, :]
    return out


@pytest.mark.parametrize("pos,blk", [(0, 8), (5, 8), (15, 8), (37, 16)])
def test_decode_attention_matches_oracle(pos, blk):
    rng = np.random.default_rng(0)
    b, h, hkv, d, s = 2, 8, 4, 128, 64
    q = rng.normal(size=(b, h, d)).astype(np.float32)
    k = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    v = rng.normal(size=(b, hkv, s, d)).astype(np.float32)

    out = np.asarray(
        decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), pos, blk=blk)
    )
    ref = reference_attention(q, k, v, pos)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_decode_attention_mha():
    rng = np.random.default_rng(1)
    b, h, d, s = 1, 4, 128, 32
    q = rng.normal(size=(b, h, d)).astype(np.float32)
    k = rng.normal(size=(b, h, s, d)).astype(np.float32)
    v = rng.normal(size=(b, h, s, d)).astype(np.float32)
    out = np.asarray(
        decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 10, blk=8)
    )
    ref = reference_attention(q, k, v, 10)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_model_decode_with_pallas_attention_matches(monkeypatch):
    import jax
    from qeft_tpu.models import LLAMA_PRESETS, init_params, init_kv_cache
    from qeft_tpu.models.llama import llama_decode_step

    cfg = LLAMA_PRESETS["tiny"]
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    tok = jnp.asarray([[5]])

    # seed a few cache positions via decode steps on the default path
    for i in range(4):
        logits_ref, cache = llama_decode_step(params, tok, cache, jnp.int32(i), cfg)

    monkeypatch.setenv("QEFT_PALLAS_ATTN", "1")
    logits_pal, _ = llama_decode_step(params, tok, cache, jnp.int32(4), cfg)
    monkeypatch.delenv("QEFT_PALLAS_ATTN")
    logits_def, _ = llama_decode_step(params, tok, cache, jnp.int32(4), cfg)
    np.testing.assert_allclose(
        np.asarray(logits_pal), np.asarray(logits_def), rtol=2e-4, atol=2e-4
    )


def test_non_divisible_cache_lengths():
    """Caches sized ctx+gen are rarely multiples of the tuned block (e.g.
    1088 = 64 + 1024): the requested block must be fitted DOWN to a divisor
    of s_max instead of tripping the divisibility assert (round-2 review)."""
    from qeft_tpu.ops.pallas_attention import _fit_blk

    assert _fit_blk(1088, 1024) == 544
    assert _fit_blk(4096, 1024) == 1024
    assert _fit_blk(520, 1024) == 520  # 8-aligned whole cache
    assert _fit_blk(68, 64) == 68  # odd length: single whole-cache block

    rng = np.random.default_rng(1)
    b, h, hkv, d, s, pos = 1, 4, 2, 64, 72, 33
    q = rng.normal(size=(b, h, d)).astype(np.float32)
    k = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    v = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    out = np.asarray(
        decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), pos, blk=64)
    )
    np.testing.assert_allclose(out, reference_attention(q, k, v, pos), rtol=2e-3, atol=2e-3)


def test_decode_attention_int8_kv():
    """The quantized-cache kernel (int8 codes + per-vector scales as score/
    prob row multiplies) must equal attention over the dequantized cache."""
    from qeft_tpu.models.llama import _kv_quantize, _kv_dequantize

    rng = np.random.default_rng(2)
    # s is 128-aligned (as init_kv_cache(quantized=True) constructs); blk=128
    # keeps blk < s so the clamped-index block mapping path is exercised
    b, h, hkv, d, s, pos = 2, 8, 4, 64, 256, 141
    q = rng.normal(size=(b, h, d)).astype(np.float32)
    k = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    v = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    kq, ks = _kv_quantize(jnp.asarray(k))
    vq, vs = _kv_quantize(jnp.asarray(v))

    out = np.asarray(
        decode_attention(jnp.asarray(q), kq, vq, pos, blk=128, k_scale=ks, v_scale=vs)
    )
    ref = reference_attention(
        q,
        np.asarray(_kv_dequantize(kq, ks, jnp.float32)),
        np.asarray(_kv_dequantize(vq, vs, jnp.float32)),
        pos,
    )
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_model_decode_int8_cache_with_pallas_attention(monkeypatch):
    """End-to-end: int8 cache + forced-on Pallas attention must track the
    XLA-path decode."""
    from qeft_tpu.models import LLAMA_PRESETS, init_params, init_kv_cache
    from qeft_tpu.models.llama import llama_decode_step, llama_prefill

    cfg = LLAMA_PRESETS["tiny"]
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 8)))

    def run():
        cache = init_kv_cache(cfg, 1, 16, quantized=True)
        _, cache = llama_prefill(params, tokens[:, :6], cache, cfg)
        logits, _ = llama_decode_step(params, tokens[:, 6:7], cache, jnp.int32(6), cfg)
        return np.asarray(logits)

    monkeypatch.setenv("QEFT_PALLAS_ATTN", "0")
    ref = run()
    monkeypatch.setenv("QEFT_PALLAS_ATTN", "1")
    got = run()
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
