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


def test_int8_kv_cache_decode_close_to_full_forward():
    """Quantized (int8 + per-vector scale) KV cache: incremental decode must
    track the full bf16-path forward within int8 rounding error.  Capability
    beyond the reference (its FT cache is fp16-only, ftllama_modeling.py:60-67);
    halves KV bytes streamed per decode step."""
    from qeft_tpu.models.llama import cache_quantized, llama_decode_step_ragged

    cfg = LLAMA_PRESETS["tiny"]
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 10)))

    full = np.asarray(llama_forward(params, tokens, cfg))

    cache = init_kv_cache(cfg, batch=2, max_len=16, quantized=True)
    assert cache_quantized(cache) and cache["k"].dtype == jnp.int8
    logits_p, cache = llama_prefill(params, tokens[:, :6], cache, cfg)
    # int8 KV rounding perturbs logits slightly: check closeness + top-1 match
    np.testing.assert_allclose(np.asarray(logits_p), full[:, :6], rtol=0.05, atol=0.05)
    for i in range(6, 10):
        logits_d, cache = llama_decode_step(
            params, tokens[:, i : i + 1], cache, jnp.int32(i), cfg
        )
        np.testing.assert_allclose(np.asarray(logits_d), full[:, i], rtol=0.05, atol=0.05)
        assert (np.argmax(np.asarray(logits_d), -1) == np.argmax(full[:, i], -1)).all()

    # ragged (serving) path with per-sequence positions and int8 cache
    cache2 = init_kv_cache(cfg, batch=2, max_len=16, quantized=True)
    _, cache2 = llama_prefill(params, tokens[:, :6], cache2, cfg)
    logits_r, _ = llama_decode_step_ragged(
        params, tokens[:, 6:7], cache2, jnp.asarray([6, 6], jnp.int32), cfg
    )
    np.testing.assert_allclose(np.asarray(logits_r), full[:, 6], rtol=0.05, atol=0.05)


def test_ragged_window_forward_matches_per_sequence():
    """llama_forward_window_ragged at per-sequence offsets == running each
    sequence alone through llama_forward_window at its own scalar offset
    (logits AND cache writes)."""
    from qeft_tpu.models.llama import llama_forward_window, llama_forward_window_ragged

    cfg = LLAMA_PRESETS["tiny"]
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b, w, max_len = 3, 4, 24
    pos = np.array([2, 7, 0], np.int32)

    cache = init_kv_cache(cfg, b, max_len, dtype=jnp.float32)
    # seed each sequence's prefix up to its pos with a private prefill
    for i in range(b):
        if pos[i] == 0:
            continue
        pre = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, int(pos[i]))))
        sub = {k: v[:, i : i + 1] for k, v in cache.items()}
        _, sub = llama_forward_window(params, pre, sub, jnp.int32(0), cfg)
        cache = {k: v.at[:, i : i + 1].set(sub[k]) for k, v in cache.items()}

    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, w)))
    rag_logits, rag_cache = llama_forward_window_ragged(
        params, toks, cache, jnp.asarray(pos), cfg
    )

    for i in range(b):
        sub = {k: v[:, i : i + 1] for k, v in cache.items()}
        ref_logits, ref_cache = llama_forward_window(
            params, toks[i : i + 1], sub, jnp.int32(int(pos[i])), cfg
        )
        np.testing.assert_allclose(
            np.asarray(rag_logits[i : i + 1]), np.asarray(ref_logits),
            rtol=2e-4, atol=2e-4,
        )
        for k in cache:
            np.testing.assert_allclose(
                np.asarray(rag_cache[k][:, i : i + 1]), np.asarray(ref_cache[k]),
                rtol=2e-4, atol=2e-4,
            )


def test_stacked_gemv_decode_matches_default(monkeypatch):
    """The stacked decode path (default ON: StackedLinear views + the
    scalar-prefetch kernel, interpret mode on CPU) must reproduce the
    scan-sliced decode step (QEFT_STACKED_GEMV=0) and ragged window exactly."""
    import numpy as np

    from qeft_tpu.models.llama import (
        LLAMA_PRESETS, init_kv_cache, llama_decode_step, llama_prefill,
        llama_forward_window_ragged,
    )
    from qeft_tpu.testing import build_packed_model

    cfg = LLAMA_PRESETS["tiny-v2"]
    params = build_packed_model(cfg, jax.random.PRNGKey(5), fuse_stages=True)
    params = jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a, params
    )
    rng = np.random.default_rng(5)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 6)))
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 1)))

    def run():
        cache = init_kv_cache(cfg, 2, 16, dtype=jnp.float32)
        _, cache = llama_prefill(params, prompt, cache, cfg)
        logits, cache = llama_decode_step(params, tok, cache, jnp.int32(6), cfg)
        wl, _ = llama_forward_window_ragged(
            params, jnp.tile(tok, (1, 3)), cache,
            jnp.asarray([7, 7], jnp.int32), cfg,
        )
        return np.asarray(logits, np.float32), np.asarray(wl, np.float32)

    monkeypatch.setenv("QEFT_STACKED_GEMV", "0")
    ref_l, ref_w = run()
    monkeypatch.setenv("QEFT_STACKED_GEMV", "1")
    monkeypatch.setenv("QEFT_PALLAS", "1")  # interpret-mode kernels on CPU
    monkeypatch.setenv("QEFT_FUSED_DECODE", "1")  # cover the fused stages too
    got_l, got_w = run()
    np.testing.assert_allclose(got_l, ref_l, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_w, ref_w, rtol=2e-4, atol=2e-4)
