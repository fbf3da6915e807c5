import numpy as np
import jax
import jax.numpy as jnp

from qeft_tpu.models import LLAMA_PRESETS, init_params
from qeft_tpu.models.registry import get_model_meta
from qeft_tpu.eval import eval_ppl
from qeft_tpu.data import get_loaders
from qeft_tpu.pipeline import QuantizeArgs, extract_global_outidx, quantize_model, pack_model
from qeft_tpu.quant.quantizer import QuantSpec

CFG = LLAMA_PRESETS["tiny"]
META = get_model_meta("llama")


def test_synthetic_loaders_deterministic():
    a = get_loaders("synthetic", nsamples=4, seed=7, seqlen=32, vocab_size=CFG.vocab_size)
    b = get_loaders("synthetic", nsamples=4, seed=7, seqlen=32, vocab_size=CFG.vocab_size)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (4, 32)
    test = get_loaders("synthetic", train=False, seed=7, vocab_size=CFG.vocab_size)
    assert test.ndim == 1 and len(test) >= (1 << 17)
    assert test.max() < CFG.vocab_size


def test_ppl_sane_on_random_model():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    test = get_loaders("synthetic", train=False, vocab_size=CFG.vocab_size)
    ppl = eval_ppl(params, test, CFG, seqlen=64, max_windows=4)
    # random model ~ uniform over vocab
    assert 0.3 * CFG.vocab_size < ppl < 3 * CFG.vocab_size, ppl


def test_fake_vs_packed_ppl_equality():
    """PPL-level statement of the reference's oracle (README.md:55-59)."""
    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    calib = get_loaders("synthetic", nsamples=2, seed=0, seqlen=32, vocab_size=CFG.vocab_size)
    args = QuantizeArgs(
        spec=QuantSpec(bits=4, sym=False, mse=False, group_size=64),
        target_rank=8, no_frob_norm=True, nsamples=2,
    )
    outidx, _ = extract_global_outidx(params, calib, CFG, META, args)
    qparams, quantizers = quantize_model(params, calib, CFG, META, args, outidx)
    packed = pack_model(qparams, quantizers, CFG, META, dtype=jnp.float32)

    test = get_loaders("synthetic", train=False, vocab_size=CFG.vocab_size)
    ppl_fake = eval_ppl(qparams, test, CFG, seqlen=64, max_windows=3)
    ppl_packed = eval_ppl(packed, test, CFG, seqlen=64, max_windows=3)
    assert abs(ppl_fake - ppl_packed) / ppl_fake < 1e-3, (ppl_fake, ppl_packed)


def test_streamed_eval_matches_jitted_eval():
    """Layer-streaming eval (for models bigger than HBM) must agree with the
    whole-model jitted harness."""
    import jax

    from qeft_tpu.eval import eval_ppl, eval_ppl_streamed
    from qeft_tpu.models import LLAMA_PRESETS, init_params
    from qeft_tpu.models.registry import get_model_meta

    cfg = LLAMA_PRESETS["tiny"]
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    test = rng.integers(0, cfg.vocab_size, size=(4 * 64,))
    a = eval_ppl(params, test, cfg, seqlen=64)
    b = eval_ppl_streamed(params, test, cfg, get_model_meta("llama"), seqlen=64)
    np.testing.assert_allclose(b, a, rtol=1e-4)


def test_c4_doc_crop_protocol():
    """Reference c4 calibration parity (datautils.py:58-91): every sample is
    cropped from ONE randomly chosen document longer than seqlen — short
    documents are re-drawn, and no crop spans a document boundary."""
    import numpy as np

    from qeft_tpu.data.loaders import _sample_doc_crops

    rng = np.random.default_rng(0)
    # doc i's tokens are all == i, with varying lengths (some too short)
    lengths = [3, 50, 8, 40, 2, 64]
    docs = [np.full(n, i, np.int64) for i, n in enumerate(lengths)]
    out = _sample_doc_crops(lambda i: docs[i], len(docs), nsamples=16,
                            seqlen=16, seed=0)
    assert out.shape == (16, 16)
    for row in out:
        assert (row == row[0]).all()  # never spans documents
        assert lengths[int(row[0])] > 16  # short docs were re-drawn
