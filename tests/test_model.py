import numpy as np
import jax
import jax.numpy as jnp

from qeft_tpu.models import (
    LLAMA_PRESETS,
    init_params,
    llama_forward,
    llama_prefill,
    llama_decode_step,
    init_kv_cache,
)


def test_forward_shapes():
    cfg = LLAMA_PRESETS["tiny"]
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tokens = jnp.arange(12).reshape(2, 6) % cfg.vocab_size
    logits = llama_forward(params, tokens, cfg)
    assert logits.shape == (2, 6, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_prefill_decode_matches_full_forward():
    """Incremental decoding through the static KV cache must reproduce the
    full-sequence forward (the reference validates its FT attention the same
    way, via PPL equality)."""
    cfg = LLAMA_PRESETS["tiny"]
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 10)))

    full = np.asarray(llama_forward(params, tokens, cfg))

    cache = init_kv_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    prefill_len = 6
    logits_p, cache = llama_prefill(params, tokens[:, :prefill_len], cache, cfg)
    np.testing.assert_allclose(
        np.asarray(logits_p), full[:, :prefill_len], rtol=2e-3, atol=2e-3
    )

    for i in range(prefill_len, 10):
        logits_d, cache = llama_decode_step(
            params, tokens[:, i : i + 1], cache, jnp.int32(i), cfg
        )
        np.testing.assert_allclose(
            np.asarray(logits_d), full[:, i], rtol=2e-3, atol=2e-3
        )


def test_gqa_heads():
    cfg = LLAMA_PRESETS["tiny"]  # 4 heads, 2 kv heads
    assert cfg.num_heads != cfg.num_kv_heads
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    tokens = jnp.zeros((1, 4), jnp.int32)
    logits = llama_forward(params, tokens, cfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_gemma_variant_forward_and_decode():
    from qeft_tpu.models.llama import llama_prefill, LLAMA_PRESETS

    cfg = LLAMA_PRESETS["tiny-gemma"]
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    # gemma convention: zero-centered norm weights, tied-ish head fine as-is
    tokens = jnp.arange(8)[None, :] % cfg.vocab_size
    full = np.asarray(llama_forward(params, tokens, cfg))
    assert np.isfinite(full).all()

    cache = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    logits_p, cache = llama_prefill(params, tokens[:, :5], cache, cfg)
    np.testing.assert_allclose(np.asarray(logits_p), full[:, :5], rtol=2e-3, atol=2e-3)
    for i in range(5, 8):
        logits_d, cache = llama_decode_step(
            params, tokens[:, i : i + 1], cache, jnp.int32(i), cfg
        )
        np.testing.assert_allclose(np.asarray(logits_d), full[:, i], rtol=2e-3, atol=2e-3)
