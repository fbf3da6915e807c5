import numpy as np
import jax
import jax.numpy as jnp

from qeft_tpu.models.opt import OPT_PRESETS, init_params, opt_forward

CFG = OPT_PRESETS["opt-tiny"]


def test_opt_forward_shapes():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    tokens = jnp.arange(12).reshape(2, 6) % CFG.vocab_size
    logits = opt_forward(params, tokens, CFG)
    assert logits.shape == (2, 6, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_opt_causality():
    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    a = rng.integers(0, CFG.vocab_size, size=(1, 8))
    b = a.copy()
    b[0, -1] = (b[0, -1] + 1) % CFG.vocab_size  # change only the last token
    la = np.asarray(opt_forward(params, jnp.asarray(a), CFG))
    lb = np.asarray(opt_forward(params, jnp.asarray(b), CFG))
    # logits before the changed position must be identical
    np.testing.assert_allclose(la[:, :-1], lb[:, :-1], atol=1e-5)
    assert np.abs(la[:, -1] - lb[:, -1]).max() > 1e-4
