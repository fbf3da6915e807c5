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


def test_grad_accum_matches_larger_batch():
    """MultiSteps(grad_accum=2) over two half-batches == one full-batch step."""
    import optax

    packed = packed_tiny()
    ow0, frozen = split_wct(packed, META)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(4, 16)))

    # full batch, plain sgd for exact comparability
    sgd = optax.sgd(1e-2)
    st = sgd.init(ow0)
    step_full = make_train_step(CFG, sgd, remat=False)
    ow_full, _, _ = step_full(jax.tree.map(jnp.copy, ow0), st, frozen, ids, ids)

    accum = optax.MultiSteps(optax.sgd(1e-2), 2)
    st2 = accum.init(ow0)
    step_acc = make_train_step(CFG, accum, remat=False)
    ow_acc = jax.tree.map(jnp.copy, ow0)
    for half in (ids[:2], ids[2:]):
        ow_acc, st2, _ = step_acc(ow_acc, st2, frozen, half, half)

    # MultiSteps averages the two half-batch grads; each half-batch loss is a
    # mean over its own tokens, so with equal valid-token counts this equals
    # the full-batch gradient
    for name in ow_full:
        np.testing.assert_allclose(
            np.asarray(ow_acc[name]), np.asarray(ow_full[name]), rtol=2e-4, atol=2e-6
        )


def test_wikitext_sft_blocks_fully_supervised(monkeypatch):
    """wikitext SFT = block-packed LM (ref finetune.py:792-898): empty prompt,
    every token of the block supervised."""
    import qeft_tpu.data.loaders as loaders_mod
    from qeft_tpu.data.sft import load_sft_examples, mask_and_pad

    fake = np.arange(24, dtype=np.int64).reshape(2, 12) % 7 + 1

    monkeypatch.setattr(
        loaders_mod, "get_loaders",
        lambda name, nsamples, seed, seqlen, model, vocab_size, train: fake,
    )
    # tokenizer_path is only consulted by AutoTokenizer for non-synthetic
    # datasets; stub that out too
    import qeft_tpu.data.sft as sft_mod
    monkeypatch.setattr(
        "transformers.AutoTokenizer.from_pretrained", lambda *a, **k: None
    )
    exs = load_sft_examples("wikitext", "unused", 2, vocab_size=32)
    assert len(exs) == 2 and exs[0].prompt_ids.size == 0
    input_ids, labels = mask_and_pad(exs, max_len=12, pad_id=0, train_on_prompt=False)
    np.testing.assert_array_equal(input_ids, fake)
    np.testing.assert_array_equal(labels, fake)  # nothing masked


def test_wct_training_other_family():
    """WCT fine-tuning is family-dispatched (the reference fine-tunes any of
    its models through the HF trainer): OPT trains through its own forward,
    loss decreases, and only oweights change."""
    import jax
    import jax.numpy as jnp

    from qeft_tpu.finetune import (
        TrainConfig, make_optimizer, make_train_step, merge_wct, split_wct,
    )
    from qeft_tpu.models.opt import OPT_PRESETS, init_params as opt_init
    from qeft_tpu.models.registry import get_model_meta
    from qeft_tpu.pipeline import QuantizeArgs, pack_model, quantize_model
    from qeft_tpu.quant.quantizer import QuantSpec

    cfg = OPT_PRESETS["opt-tiny"]
    meta = get_model_meta("opt")
    params = opt_init(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = np.random.default_rng(0).integers(0, cfg.vocab_size, size=(2, 16))
    args = QuantizeArgs(
        spec=QuantSpec(bits=4, sym=False, mse=False, group_size=32),
        target_rank=8, no_frob_norm=True, nsamples=2, reorder=False,
    )
    qparams, quantizers = quantize_model(params, calib, cfg, meta, args)
    packed = pack_model(qparams, quantizers, cfg, meta, dtype=jnp.float32)

    oweights, frozen = split_wct(packed, meta)
    tc = TrainConfig(learning_rate=1e-3, total_steps=6, remat=True)
    opt = make_optimizer(tc)
    opt_state = opt.init(oweights)
    step = make_train_step(cfg, opt, remat=True, family="opt")

    ids = jnp.asarray(calib)
    losses = []
    for _ in range(6):
        oweights, opt_state, loss = step(oweights, opt_state, frozen, ids, ids)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # the merged model still forwards
    from qeft_tpu.models.opt import opt_forward

    out = opt_forward(merge_wct(oweights, frozen), ids[:1], cfg)
    assert np.isfinite(np.asarray(out)).all()


def test_wct_train_step_with_flash_attn_forced(monkeypatch):
    """Training must never route through the flash pallas_call (it has no
    JVP rule): the on-chip default is flash ON, and round-5's first 7B WCT
    session crashed exactly here.  llama_forward_train pins the XLA
    attention for its trace regardless of the flash gate."""
    monkeypatch.setenv("QEFT_FLASH_ATTN", "1")
    packed = packed_tiny()
    ow, frozen = split_wct(packed, META)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(2, 16)))

    tc = TrainConfig(learning_rate=5e-3, total_steps=2, remat=True)
    opt = make_optimizer(tc)
    opt_state = opt.init(ow)
    step = make_train_step(CFG, opt, remat=True)
    ow, opt_state, loss = step(ow, opt_state, frozen, ids, ids)
    assert np.isfinite(float(loss))
