import numpy as np
import jax
import jax.numpy as jnp

from qeft_tpu.models import LLAMA_PRESETS, llama_forward
from qeft_tpu.models.registry import get_model_meta
from qeft_tpu.checkpoint import (
    save_fake,
    load_fake,
    save_packed,
    load_packed,
    save_wct,
    load_wct,
    load_model,
)
from qeft_tpu.finetune import split_wct
from tests.test_finetune import packed_tiny

CFG = LLAMA_PRESETS["tiny"]
META = get_model_meta("llama")


def test_packed_roundtrip(tmp_path):
    packed = packed_tiny()
    path = str(tmp_path / "model_packed.npz")
    save_packed(path, packed, CFG)
    loaded, cfg, family = load_packed(path)
    assert cfg == CFG

    tokens = jnp.zeros((1, 4), jnp.int32)
    ref = np.asarray(llama_forward(packed, tokens, CFG))
    out = np.asarray(llama_forward(loaded, tokens, CFG))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_fake_roundtrip_and_repack(tmp_path):
    from qeft_tpu.models import init_params
    from qeft_tpu.pipeline import (
        QuantizeArgs, extract_global_outidx, quantize_model, pack_model,
    )
    from qeft_tpu.quant.quantizer import QuantSpec

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    calib = rng.integers(0, CFG.vocab_size, size=(2, 16))
    args = QuantizeArgs(
        spec=QuantSpec(bits=4, sym=False, mse=False, group_size=64),
        target_rank=8, no_frob_norm=True, nsamples=2,
    )
    outidx, _ = extract_global_outidx(params, calib, CFG, META, args)
    qparams, quantizers = quantize_model(params, calib, CFG, META, args, outidx)

    path = str(tmp_path / "model_fake.npz")
    save_fake(path, qparams, quantizers, CFG)
    lparams, lquant, cfg, family = load_fake(path)

    tokens = jnp.zeros((1, 4), jnp.int32)
    ref = np.asarray(llama_forward(qparams, tokens, CFG))
    out = np.asarray(llama_forward(lparams, tokens, CFG))
    np.testing.assert_allclose(out, ref, rtol=1e-6)

    # packing from the reloaded fake ckpt == packing from memory
    p1 = pack_model(qparams, quantizers, CFG, META, dtype=jnp.float32)
    p2 = pack_model(lparams, lquant, CFG, META, dtype=jnp.float32)
    o1 = np.asarray(llama_forward(p1, tokens, CFG))
    o2 = np.asarray(llama_forward(p2, tokens, CFG))
    np.testing.assert_allclose(o2, o1, rtol=1e-6)


def test_wct_overlay(tmp_path):
    packed = packed_tiny()
    base = str(tmp_path / "base_packed.npz")
    save_packed(base, packed, CFG)

    ow, _ = split_wct(packed, META)
    # simulate fine-tuning: shift one slab
    ow = dict(ow)
    ow["q"] = ow["q"] + 1.0
    wct = str(tmp_path / "wct.npz")
    save_wct(wct, ow, base)

    loaded, cfg, family = load_wct(wct)
    np.testing.assert_allclose(
        np.asarray(loaded["layers"]["q"].oweight),
        np.asarray(packed["layers"]["q"].oweight) + 1.0,
        rtol=1e-3,
    )
    # dispatching loader resolves the format
    loaded2, _, _ = load_model(wct)
    np.testing.assert_allclose(
        np.asarray(loaded2["layers"]["q"].oweight),
        np.asarray(loaded["layers"]["q"].oweight),
    )


def test_convert_fake_to_packed_matches_direct_packing(tmp_path):
    """python -m qeft_tpu.convert: a fake checkpoint repacks into exactly the
    packed model that quantize-time --packing would have produced."""
    import jax
    import jax.numpy as jnp

    from qeft_tpu.checkpoint import load_packed, save_fake, save_packed
    from qeft_tpu.convert import main as convert_main
    from qeft_tpu.models import LLAMA_PRESETS, init_params, llama_forward
    from qeft_tpu.models.registry import get_model_meta
    from qeft_tpu.pipeline import (
        QuantizeArgs, extract_global_outidx, pack_model, quantize_model,
    )
    from qeft_tpu.quant.quantizer import QuantSpec

    cfg = LLAMA_PRESETS["tiny"]
    meta = get_model_meta("llama")
    params = init_params(cfg, jax.random.PRNGKey(11), dtype=jnp.float32)
    calib = np.random.default_rng(0).integers(0, cfg.vocab_size, size=(2, 16))
    args = QuantizeArgs(
        spec=QuantSpec(bits=4, sym=False, mse=False, group_size=32),
        target_rank=8, no_frob_norm=True, nsamples=2, reorder=True,
    )
    outidx, _ = extract_global_outidx(params, calib, cfg, meta, args)
    qparams, quantizers = quantize_model(params, calib, cfg, meta, args, outidx)

    save_fake(str(tmp_path / "m_fake"), qparams, quantizers, cfg, family="llama")
    convert_main([str(tmp_path / "m_fake"), str(tmp_path / "m_conv")])

    direct = pack_model(qparams, quantizers, cfg, meta)
    save_packed(str(tmp_path / "m_direct"), direct, cfg, family="llama")

    pc, ccfg, _ = load_packed(str(tmp_path / "m_conv"))
    pd, _, _ = load_packed(str(tmp_path / "m_direct"))
    toks = jnp.asarray(calib[:1])
    np.testing.assert_allclose(
        np.asarray(llama_forward(pc, toks, ccfg), np.float32),
        np.asarray(llama_forward(pd, toks, ccfg), np.float32),
        rtol=2e-3, atol=2e-3,
    )
