import numpy as np
import jax
import jax.numpy as jnp

from qeft_tpu.models import LLAMA_PRESETS, init_params
from qeft_tpu.models.registry import get_model_meta
from qeft_tpu.pipeline import QuantizeArgs, extract_global_outidx, quantize_model, pack_model
from qeft_tpu.quant.quantizer import QuantSpec
from qeft_tpu.finetune import (
    TrainConfig,
    split_wct,
    merge_wct,
    make_optimizer,
    make_train_step,
    wct_loss,
    causal_lm_loss,
    IGNORE_INDEX,
)

CFG = LLAMA_PRESETS["tiny"]
META = get_model_meta("llama")


def packed_tiny(seed=0):
    params = init_params(CFG, jax.random.PRNGKey(seed), dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    calib = rng.integers(0, CFG.vocab_size, size=(2, 16))
    args = QuantizeArgs(
        spec=QuantSpec(bits=4, sym=False, mse=False, group_size=64),
        target_rank=8, no_frob_norm=True, nsamples=2,
    )
    outidx, _ = extract_global_outidx(params, calib, CFG, META, args)
    qparams, quantizers = quantize_model(params, calib, CFG, META, args, outidx)
    return pack_model(qparams, quantizers, CFG, META, dtype=jnp.float32)


def test_split_merge_roundtrip():
    packed = packed_tiny()
    ow, frozen = split_wct(packed, META)
    assert set(ow.keys()) == set(META.all_linears)
    merged = merge_wct(ow, frozen)
    for name in META.all_linears:
        np.testing.assert_allclose(
            np.asarray(merged["layers"][name].oweight),
            np.asarray(packed["layers"][name].oweight),
            rtol=1e-6,
        )


def test_loss_masking():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.asarray([[1, 2, IGNORE_INDEX, 3]])
    loss = causal_lm_loss(logits, labels)
    # uniform logits -> loss == log(8) over the 2 valid shifted targets
    np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-5)


def test_wct_training_reduces_loss_and_touches_only_oweights():
    packed = packed_tiny()
    ow, frozen = split_wct(packed, META)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(2, 16)))
    labels = ids

    tc = TrainConfig(learning_rate=5e-3, total_steps=20, remat=True, max_grad_norm=1.0)
    opt = make_optimizer(tc)
    opt_state = opt.init(ow)
    step = make_train_step(CFG, opt, remat=tc.remat)

    loss0 = float(wct_loss(ow, frozen, ids, labels, CFG))
    losses = []
    for _ in range(8):
        ow, opt_state, loss = step(ow, opt_state, frozen, ids, labels)
        losses.append(float(loss))
    assert losses[-1] < loss0, (loss0, losses)

    # frozen part is untouched by construction; oweights actually moved
    packed2 = merge_wct(ow, frozen)
    moved = np.abs(
        np.asarray(packed2["layers"]["q"].oweight)
        - np.asarray(packed["layers"]["q"].oweight)
    ).max()
    assert moved > 0

    # gradients exist for every oweight
    grads = jax.grad(lambda o: wct_loss(o, frozen, ids, labels, CFG))(ow)
    for name, g in grads.items():
        assert float(jnp.abs(g).max()) > 0, name
