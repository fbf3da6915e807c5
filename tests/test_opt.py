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


def test_opt_quantization_pipeline():
    """OWQ quantization (per-layer outliers, no OGR) over the OPT family."""
    import jax.numpy as jnp
    from qeft_tpu.models.registry import get_model_meta
    from qeft_tpu.pipeline import QuantizeArgs, quantize_model, pack_model
    from qeft_tpu.quant.quantizer import QuantSpec

    meta = get_model_meta("opt")
    params = init_params(CFG, jax.random.PRNGKey(4), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    calib = rng.integers(0, CFG.vocab_size, size=(2, 16))
    args = QuantizeArgs(
        spec=QuantSpec(bits=4, sym=False, mse=False, group_size=32),
        target_rank=8, no_frob_norm=True, nsamples=2, reorder=False,
    )
    qparams, quantizers = quantize_model(params, calib, CFG, meta, args)
    tokens = jnp.asarray(calib[:1])
    lf = np.asarray(opt_forward(params, tokens, CFG))
    lq = np.asarray(opt_forward(qparams, tokens, CFG))
    corr = np.corrcoef(lf.ravel(), lq.ravel())[0, 1]
    assert corr > 0.98, corr
    assert len(quantizers) == CFG.num_layers * 6
