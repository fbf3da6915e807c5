import numpy as np
import jax
import jax.numpy as jnp

from qeft_tpu.models import LLAMA_PRESETS, init_params, init_kv_cache
from qeft_tpu.generate import generate, SampleConfig
from qeft_tpu.speculative import speculative_generate

CFG = LLAMA_PRESETS["tiny"]


def setup(seed_t=0, seed_d=1):
    target = init_params(CFG, jax.random.PRNGKey(seed_t), dtype=jnp.float32)
    draft = init_params(CFG, jax.random.PRNGKey(seed_d), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 6)))
    return target, draft, prompt


def run_spec(target, draft, prompt, n, gamma):
    t_cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    d_cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    return speculative_generate(
        target, draft, prompt, t_cache, d_cache, CFG, CFG, n, gamma
    )


def test_speculative_equals_target_greedy():
    """The defining property: spec decoding reproduces the target model's own
    greedy output exactly, for any draft."""
    target, draft, prompt = setup()
    cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    ref, _ = generate(target, prompt, cache, CFG, 10, SampleConfig())
    for gamma in (1, 3, 4):
        out, telem = run_spec(target, draft, prompt, 10, gamma)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref)), gamma


def test_draft_equals_target_accepts_most():
    target, _, prompt = setup()
    out, telem = run_spec(target, target, prompt, 12, 4)
    # identical models accept most candidates; random tiny-model logits are
    # near-flat, so decode-step vs window-forward reduction order flips the
    # occasional argmax tie — require a clearly-positive acceptance rate
    assert float(telem["mean_accept_length"]) >= 1.0, telem
    cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    ref, _ = generate(target, prompt, cache, CFG, 12, SampleConfig())
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_telemetry_counts():
    target, draft, prompt = setup()
    out, telem = run_spec(target, draft, prompt, 8, 2)
    assert int(telem["rounds"]) >= 1
    assert 0 <= float(telem["mean_accept_length"]) <= 2.0


def test_speculative_cache_requirement_documented():
    """Cache must cover prompt + max_new + gamma + 1 (verify-window overhang)."""
    target, draft, prompt = setup()
    n, gamma = 10, 4
    need = prompt.shape[1] + n + gamma + 1
    t_cache = init_kv_cache(CFG, 1, need, dtype=jnp.float32)
    d_cache = init_kv_cache(CFG, 1, need, dtype=jnp.float32)
    out, _ = speculative_generate(target, draft, prompt, t_cache, d_cache, CFG, CFG, n, gamma)
    cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    from qeft_tpu.generate import generate, SampleConfig
    ref, _ = generate(target, prompt, cache, CFG, n, SampleConfig())
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
