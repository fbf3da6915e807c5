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
