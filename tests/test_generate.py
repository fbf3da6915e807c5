import numpy as np
import jax
import jax.numpy as jnp

from qeft_tpu.models import LLAMA_PRESETS, init_params, llama_forward
from qeft_tpu.generate import generate_simple, SampleConfig

CFG = LLAMA_PRESETS["tiny"]


def test_greedy_generation_matches_stepwise_argmax():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 5)))

    out = np.asarray(generate_simple(params, prompt, CFG, max_new_tokens=6))
    assert out.shape == (1, 6)

    # oracle: repeatedly run the full forward and take argmax
    seq = np.asarray(prompt)
    for i in range(6):
        logits = np.asarray(llama_forward(params, jnp.asarray(seq), CFG))
        nxt = int(np.argmax(logits[0, -1]))
        assert nxt == out[0, i], f"step {i}: {nxt} != {out[0, i]}"
        seq = np.concatenate([seq, [[nxt]]], axis=1)


def test_sampling_runs():
    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    prompt = jnp.zeros((2, 3), jnp.int32)
    sc = SampleConfig(greedy=False, temperature=0.8, top_k=10)
    out = np.asarray(generate_simple(params, prompt, CFG, max_new_tokens=4, sc=sc))
    assert out.shape == (2, 4)
    assert (out >= 0).all() and (out < CFG.vocab_size).all()


def test_top_p_nucleus_support_and_distribution():
    """top_p keeps exactly the smallest descending-prob prefix with mass
    > top_p (HF TopPLogitsWarper semantics) and renormalizes within it."""
    from qeft_tpu.generate import _sample_token

    probs = np.array([0.45, 0.30, 0.15, 0.07, 0.03], np.float32)
    logits = jnp.asarray(np.log(probs))[None, :]  # batch of 1
    sc = SampleConfig(greedy=False, temperature=1.0, top_p=0.8)

    draws = jax.vmap(
        lambda k: _sample_token(logits, k, sc)[0]
    )(jax.random.split(jax.random.PRNGKey(0), 4000))
    draws = np.asarray(draws)

    # nucleus = {0, 1, 2}: 0.45+0.30=0.75 < 0.8, so token 2 is the first to
    # cross and is kept; 3 and 4 must never appear
    assert set(np.unique(draws)) <= {0, 1, 2}
    counts = np.bincount(draws, minlength=5) / draws.size
    renorm = probs[:3] / probs[:3].sum()
    np.testing.assert_allclose(counts[:3], renorm, atol=0.03)


def test_top_p_one_is_identity():
    from qeft_tpu.generate import _sample_token

    logits = jnp.asarray(np.random.default_rng(0).standard_normal((2, 17)), jnp.float32)
    k = jax.random.PRNGKey(3)
    a = _sample_token(logits, k, SampleConfig(greedy=False, top_p=1.0))
    b = _sample_token(logits, k, SampleConfig(greedy=False))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eos_early_exit_and_padding():
    """With eos_id, generation matches the unrestricted run up to and
    including the first EOS, is eos-padded after it, and the early-exiting
    while_loop produces identical output to the dense loop."""
    from qeft_tpu.generate import generate
    from qeft_tpu.models.llama import init_kv_cache

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompt = jnp.asarray(np.random.default_rng(4).integers(0, CFG.vocab_size, (2, 4)))
    n = 8

    cache = init_kv_cache(CFG, 2, 16, dtype=jnp.float32)
    free, _ = generate(params, prompt, cache, CFG, n)
    free = np.asarray(free)

    # pick the token each sequence emits at position 3 as "EOS" for seq 0
    eos = int(free[0, 3])
    cache = init_kv_cache(CFG, 2, 16, dtype=jnp.float32)
    out, _ = generate(params, prompt, cache, CFG, n, eos_id=eos)
    out = np.asarray(out)

    for bidx in range(2):
        hits = np.where(free[bidx] == eos)[0]
        stop = hits[0] if hits.size else n - 1
        np.testing.assert_array_equal(out[bidx, : stop + 1], free[bidx, : stop + 1])
        assert (out[bidx, stop + 1 :] == eos).all()
