"""Interpret-mode parity for the flash/blockwise causal window attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qeft_tpu.models.llama import _attention
from qeft_tpu.ops.pallas_flash import flash_window_attention


def _ref_window(q, k_all, v_all, pos, n_rep):
    b, s, h, d = q.shape
    s_k = k_all.shape[2]
    key_pos = jnp.arange(s_k)[None, None, None, :]
    query_pos = (pos + jnp.arange(s))[None, None, :, None]
    mask = jnp.where(key_pos <= query_pos, 0.0, -jnp.inf).astype(jnp.float32)
    return _attention(q, k_all, v_all, mask, n_rep, jnp.float32)


@pytest.mark.parametrize(
    "b,s,h,hkv,d,s_k,pos,blkq,blkk",
    [
        (1, 16, 4, 2, 64, 64, 0, 8, 16),    # prefill into a larger cache
        (2, 16, 4, 4, 64, 64, 13, 8, 16),   # window at an offset (spec verify)
        (1, 64, 4, 1, 64, 64, 0, 16, 64),   # MQA, kv = window itself
        (1, 10, 2, 2, 64, 64, 3, 8, 16),    # ragged S: q padded to blk_q
    ],
)
def test_flash_matches_eager(b, s, h, hkv, d, s_k, pos, blkq, blkk):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, hkv, s_k, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, hkv, s_k, d)), jnp.float32)
    # entries past pos+s must be ignored entirely: poison them with large
    # finite garbage (real caches are zero-initialized; NaN would turn the
    # exactly-zero masked probabilities into 0*NaN)
    poison = jnp.arange(s_k)[None, None, :, None] > pos + s - 1
    k = jnp.where(poison, 1e4, k)
    v = jnp.where(poison, -1e4, v)

    ref = np.asarray(_ref_window(q, jnp.where(poison, 0.0, k),
                                 jnp.where(poison, 0.0, v), pos, h // hkv))
    got = np.asarray(flash_window_attention(q, k, v, jnp.int32(pos),
                                            blk_q=blkq, blk_k=blkk))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    assert np.isfinite(got).all()


def test_flash_prefill_logits_parity(monkeypatch):
    """llama_prefill with QEFT_FLASH_ATTN=1 (interpret) equals the eager
    path's logits and cache."""
    from qeft_tpu.models.llama import LLAMA_PRESETS, init_kv_cache, llama_prefill
    from qeft_tpu.models.llama import init_params

    cfg = LLAMA_PRESETS["tiny"]
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 12)))

    def run():
        cache = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
        logits, c = llama_prefill(params, prompt, cache, cfg)
        return np.asarray(logits, np.float32), np.asarray(c["k"], np.float32)

    monkeypatch.setenv("QEFT_FLASH_ATTN", "0")
    ref_l, ref_k = run()
    monkeypatch.setenv("QEFT_FLASH_ATTN", "1")
    got_l, got_k = run()
    np.testing.assert_allclose(got_l, ref_l, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_k, ref_k, rtol=2e-5, atol=2e-5)
