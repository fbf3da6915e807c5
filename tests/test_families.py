"""phi / bloom / falcon family gates: forward sanity, causality, KV-cache
decode parity, quantization pipeline, and the fake-vs-packed oracle
(VERDICT round-1 missing #3: a meta without a forward is not a capability).

Every family runs the full OGR (global reorder) path: the residual
permutation is exact for LayerNorm blocks (statistics are permutation-
invariant), for bloom's embedding LayerNorm (permuted with the stream),
for falcon's parallel-residual block (qkv and fc1 share the permuted
ln(x)), and under ALiBi (a head-space score bias).  The reference's
make_reorder is equally family-generic (reorder.py:148-176).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qeft_tpu.models import bloom as bloom_mod
from qeft_tpu.models import falcon as falcon_mod
from qeft_tpu.models import phi as phi_mod
from qeft_tpu.models.registry import get_model_meta
from qeft_tpu.pipeline import (
    QuantizeArgs,
    extract_global_outidx,
    pack_model,
    quantize_model,
)
from qeft_tpu.quant.quantizer import QuantSpec

FAMILIES = {
    "phi": dict(
        mod=phi_mod, cfg=phi_mod.PHI_PRESETS["phi-tiny"],
        forward=phi_mod.phi_forward, prefill=phi_mod.phi_prefill,
        decode=phi_mod.phi_decode_step, init_cache=phi_mod.init_kv_cache,
        n_linears=6, reorder=True,
    ),
    "bloom": dict(
        mod=bloom_mod, cfg=bloom_mod.BLOOM_PRESETS["bloom-tiny"],
        forward=bloom_mod.bloom_forward, prefill=bloom_mod.bloom_prefill,
        decode=bloom_mod.bloom_decode_step, init_cache=bloom_mod.init_kv_cache,
        n_linears=4, reorder=True,
    ),
    "falcon": dict(
        mod=falcon_mod, cfg=falcon_mod.FALCON_PRESETS["falcon-tiny"],
        forward=falcon_mod.falcon_forward, prefill=falcon_mod.falcon_prefill,
        decode=falcon_mod.falcon_decode_step, init_cache=falcon_mod.init_kv_cache,
        n_linears=4, reorder=True,
    ),
}


@pytest.fixture(params=sorted(FAMILIES))
def fam(request):
    return request.param, FAMILIES[request.param]


def test_forward_shapes(fam):
    name, f = fam
    cfg = f["cfg"]
    params = f["mod"].init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tokens = jnp.arange(12).reshape(2, 6) % cfg.vocab_size
    logits = f["forward"](params, tokens, cfg)
    assert logits.shape == (2, 6, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_causality(fam):
    name, f = fam
    cfg = f["cfg"]
    params = f["mod"].init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    a = rng.integers(0, cfg.vocab_size, size=(1, 8))
    b = a.copy()
    b[0, -1] = (b[0, -1] + 1) % cfg.vocab_size
    la = np.asarray(f["forward"](params, jnp.asarray(a), cfg))
    lb = np.asarray(f["forward"](params, jnp.asarray(b), cfg))
    np.testing.assert_allclose(la[:, :-1], lb[:, :-1], atol=1e-5)
    assert np.abs(la[:, -1] - lb[:, -1]).max() > 1e-4


def test_decode_matches_forward(fam):
    """prefill + single-token decode logits == full-sequence forward logits
    (ALiBi/partial-rope/MQA each exercise their cache plumbing here)."""
    name, f = fam
    cfg = f["cfg"]
    params = f["mod"].init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.vocab_size, size=(1, 9))

    full = np.asarray(f["forward"](params, jnp.asarray(toks), cfg))

    cache = f["init_cache"](cfg, 1, 16, dtype=jnp.float32)
    logits_pre, cache = f["prefill"](params, jnp.asarray(toks[:, :5]), cache, cfg)
    np.testing.assert_allclose(np.asarray(logits_pre), full[:, :5], rtol=2e-4, atol=2e-4)
    for i in range(5, 9):
        step_logits, cache = f["decode"](
            params, jnp.asarray(toks[:, i : i + 1]), cache, jnp.int32(i), cfg
        )
        np.testing.assert_allclose(
            np.asarray(step_logits), full[:, i], rtol=2e-4, atol=2e-4
        )


def _quantize_packed(name, f, key=5):
    meta = get_model_meta(name)
    cfg = f["cfg"]
    params = f["mod"].init_params(cfg, jax.random.PRNGKey(key), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    calib = rng.integers(0, cfg.vocab_size, size=(2, 16))
    args = QuantizeArgs(
        spec=QuantSpec(bits=4, sym=False, mse=False, group_size=32),
        target_rank=8, no_frob_norm=True, nsamples=2, reorder=f["reorder"],
    )
    outidx = None
    if f["reorder"]:
        outidx, _ = extract_global_outidx(params, calib, cfg, meta, args)
    qparams, quantizers = quantize_model(params, calib, cfg, meta, args, outidx)
    packed = pack_model(qparams, quantizers, cfg, meta, dtype=jnp.float32)
    assert len(quantizers) == cfg.num_layers * f["n_linears"]
    return params, qparams, packed, meta


def test_quantize_and_fake_vs_packed(fam):
    """Capture -> GPTQ-OWQ (-> OGR for phi) -> pack; the packed path must
    match the fake-quant reconstruction (the reference's correctness oracle,
    README.md:55-59), and both stay correlated with the fp model."""
    name, f = fam
    cfg = f["cfg"]
    params, qparams, packed, meta = _quantize_packed(name, f)
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 12)))
    lfake = np.asarray(f["forward"](qparams, toks, cfg))
    lpacked = np.asarray(f["forward"](packed, toks, cfg))
    np.testing.assert_allclose(lpacked, lfake, rtol=2e-2, atol=2e-2)
    lfp = np.asarray(f["forward"](params, toks, cfg))
    corr = np.corrcoef(lfp.ravel(), lpacked.ravel())[0, 1]
    assert corr > 0.97, corr


def test_checkpoint_family_roundtrip(fam, tmp_path):
    """save_packed(family=...) -> load_model dispatches to the family config
    and the loaded model generates identically."""
    from qeft_tpu.checkpoint import load_model, save_packed
    from qeft_tpu.generate import SampleConfig, generate
    from qeft_tpu.models.api import get_model_api

    name, f = fam
    cfg = f["cfg"]
    _, _, packed, meta = _quantize_packed(name, f)
    path = str(tmp_path / f"{name}_tiny_packed")
    save_packed(path, packed, cfg, family=name)
    loaded, lcfg, family = load_model(path)
    assert family == name
    assert lcfg == cfg

    api = get_model_api(family)
    prompt = jnp.asarray([[3, 1, 4, 1, 5]])
    cache = api.init_cache(lcfg, 1, 32, dtype=jnp.float32)
    toks_a, _ = generate(packed, prompt, cache, cfg, 6, SampleConfig(), api=api)
    toks_b, _ = generate(loaded, prompt, cache, lcfg, 6, SampleConfig(), api=api)
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_b))


def test_reorder_is_exact_isomorphism_per_family(fam):
    """Global reorder of an UNQUANTIZED model must not change its function —
    per family (bloom: embed LayerNorm + ALiBi; falcon: parallel residual)."""
    from qeft_tpu.pipeline import QuantizerState, reorder_model

    name, f = fam
    cfg = f["cfg"]
    params = f["mod"].init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    meta = get_model_meta(name)
    rng = np.random.default_rng(2)
    d = cfg.hidden_size
    global_out = jnp.asarray(np.sort(rng.choice(d, size=4, replace=False)))

    def in_features(lin_name):
        return params["layers"][lin_name].shape[1]

    def out_features(lin_name):
        return params["layers"][lin_name].shape[2]

    def dummy_state(k_in, n_out_dim, r):
        out_ids = jnp.asarray(np.sort(rng.choice(k_in, size=r, replace=False)))
        g = max(k_in // 64, 1)
        return QuantizerState(
            scale_group=jnp.ones((n_out_dim, g)),
            zero_group=jnp.zeros((n_out_dim, g)),
            out_ids=out_ids, sym=False, bits=4, group_size=64,
        )

    quantizers = {}
    for i in range(cfg.num_layers):
        for lin in meta.qkv + meta.out + meta.ffn1 + meta.ffn2:
            quantizers[(i, lin)] = dummy_state(
                in_features(lin), out_features(lin), 4
            )

    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 12)))
    before = np.asarray(f["forward"](params, tokens, cfg))
    reordered = reorder_model(params, quantizers, global_out, cfg, meta)
    assert "o_reorder" in reordered["layers"]
    after = np.asarray(f["forward"](reordered, tokens, cfg))
    np.testing.assert_allclose(after, before, rtol=1e-4, atol=1e-4)
