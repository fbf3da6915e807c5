import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qeft_tpu.models import LLAMA_PRESETS, init_params, llama_forward
from qeft_tpu.models.registry import get_model_meta
from qeft_tpu.pipeline import (
    QuantizeArgs,
    QuantizerState,
    extract_global_outidx,
    quantize_model,
    reorder_model,
    pack_model,
)
from qeft_tpu.quant.quantizer import QuantSpec

CFG = LLAMA_PRESETS["tiny"]
META = get_model_meta("llama")


def setup(seed=0, nsamples=4, seqlen=32):
    params = init_params(CFG, jax.random.PRNGKey(seed), dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    calib = rng.integers(0, CFG.vocab_size, size=(nsamples, seqlen))
    return params, calib


def make_args(**kw):
    base = dict(
        spec=QuantSpec(bits=4, sym=False, mse=False, group_size=64),
        target_rank=8,
        no_frob_norm=True,
        nsamples=4,
    )
    base.update(kw)
    return QuantizeArgs(**base)


def test_extract_outidx_shape_and_range():
    params, calib = setup()
    args = make_args()
    outidx, per_layer = extract_global_outidx(params, calib, CFG, META, args)
    assert outidx.shape == (8,)
    assert np.all(np.diff(outidx) > 0)
    assert outidx.min() >= 0 and outidx.max() < CFG.hidden_size
    assert len(per_layer) == CFG.num_layers * len(META.qkv + META.ffn1)


def test_reorder_is_exact_isomorphism():
    """Global reorder of an UNQUANTIZED model must not change its function
    (this is what makes OGR 'offline': reference reorder.py relies on it)."""
    params, calib = setup()
    rng = np.random.default_rng(1)
    d, hd, f = CFG.hidden_size, CFG.num_heads * CFG.head_dim, CFG.intermediate_size
    global_out = jnp.asarray(np.sort(rng.choice(d, size=8, replace=False)))

    def dummy_state(k_in, n_out_dim, r):
        out_ids = jnp.asarray(np.sort(rng.choice(k_in, size=r, replace=False)))
        g = k_in // 64
        return QuantizerState(
            scale_group=jnp.ones((n_out_dim, g)),
            zero_group=jnp.zeros((n_out_dim, g)),
            out_ids=out_ids,
            sym=False,
            bits=4,
            group_size=64,
        )

    quantizers = {}
    for i in range(CFG.num_layers):
        quantizers[(i, "o")] = dummy_state(hd, d, 4)
        quantizers[(i, "down")] = dummy_state(f, d, 4)
        for name in ("q", "k", "v"):
            quantizers[(i, name)] = dummy_state(d, hd, 8)
        for name in ("up", "gate"):
            quantizers[(i, name)] = dummy_state(d, f, 8)

    tokens = jnp.asarray(calib[:1])
    logits_before = np.asarray(llama_forward(params, tokens, CFG))
    reordered = reorder_model(params, quantizers, global_out, CFG, META)
    assert "o_reorder" in reordered["layers"]
    logits_after = np.asarray(llama_forward(reordered, tokens, CFG))
    np.testing.assert_allclose(logits_after, logits_before, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reorder", [True, False])
def test_quantize_model_end_to_end(reorder):
    params, calib = setup()
    args = make_args(reorder=reorder)
    outidx = None
    if reorder:
        outidx, _ = extract_global_outidx(params, calib, CFG, META, args)
    qparams, quantizers = quantize_model(params, calib, CFG, META, args, outidx)

    tokens = jnp.asarray(calib[:1])
    logits_fp = np.asarray(llama_forward(params, tokens, CFG))
    logits_q = np.asarray(llama_forward(qparams, tokens, CFG))
    assert np.isfinite(logits_q).all()
    # 4-bit + outliers on a tiny model: outputs correlated with fp
    corr = np.corrcoef(logits_fp.ravel(), logits_q.ravel())[0, 1]
    assert corr > 0.98, corr
    assert len(quantizers) == CFG.num_layers * 7


def test_fake_vs_packed_model_parity():
    """Model-level correctness oracle (reference README.md:55-59): the packed
    execution path must reproduce the fake-quant reconstruction."""
    params, calib = setup()
    args = make_args(reorder=True)
    outidx, _ = extract_global_outidx(params, calib, CFG, META, args)
    qparams, quantizers = quantize_model(params, calib, CFG, META, args, outidx)
    packed = pack_model(qparams, quantizers, CFG, META, dtype=jnp.float32)

    tokens = jnp.asarray(calib[:2])
    logits_fake = np.asarray(llama_forward(qparams, tokens, CFG))
    logits_packed = np.asarray(llama_forward(packed, tokens, CFG))
    np.testing.assert_allclose(logits_packed, logits_fake, rtol=5e-3, atol=5e-3)


def test_quantized_beats_nothing_sanity():
    # RTN should be worse than (or equal to) GPTQ on the same setup
    params, calib = setup()
    tokens = jnp.asarray(calib[:2])
    logits_fp = np.asarray(llama_forward(params, tokens, CFG))

    def err(args):
        outidx, _ = extract_global_outidx(params, calib, CFG, META, args)
        qp, _ = quantize_model(params, calib, CFG, META, args, outidx)
        lq = np.asarray(llama_forward(qp, tokens, CFG))
        return float(np.mean((lq - logits_fp) ** 2))

    e_gptq = err(make_args(reorder=True))
    e_rtn = err(make_args(reorder=True, rtn=True))
    assert e_gptq <= e_rtn * 1.05


def test_fused_stage_packing_matches_unfused(monkeypatch):
    # compare pack-time vs post-pack fusion without the (default-on) load-time
    # upgate padding — padding equivalence has its own test (test_pad_upgate)
    monkeypatch.setenv("QEFT_PAD_UPGATE", "0")
    params, calib = setup()
    args = make_args(reorder=True)
    outidx, _ = extract_global_outidx(params, calib, CFG, META, args)
    qparams, quantizers = quantize_model(params, calib, CFG, META, args, outidx)
    packed = pack_model(qparams, quantizers, CFG, META, dtype=jnp.float32)
    fused = pack_model(qparams, quantizers, CFG, META, dtype=jnp.float32, fuse_stages=True)
    assert "qkv" in fused["layers"] and "upgate" in fused["layers"]
    assert "q" not in fused["layers"]

    tokens = jnp.asarray(calib[:1])
    a = np.asarray(llama_forward(packed, tokens, CFG))
    b = np.asarray(llama_forward(fused, tokens, CFG))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)

    # post-pack fusion of the stacked layout (bench.py's load path) must
    # match pack-time fusion exactly
    from qeft_tpu.pipeline import fuse_packed_stages

    refused = fuse_packed_stages(packed, META)
    assert "qkv" in refused["layers"] and "q" not in refused["layers"]
    # o_band/o_tail are load-time operand attachments (ops/permute.py), not
    # part of the pack-time tree; their equivalence has its own tests
    refused["layers"] = {
        k: v for k, v in refused["layers"].items()
        if k not in ("o_band", "o_tail")
    }
    for k, v in refused["layers"].items():
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
            v, fused["layers"][k],
        )


def test_true_sequential_runs_and_is_close():
    params, calib = setup()
    args = make_args(reorder=True, true_sequential=True)
    outidx, _ = extract_global_outidx(params, calib, CFG, META, args)
    qp, quant = quantize_model(params, calib, CFG, META, args, outidx)
    tokens = jnp.asarray(calib[:1])
    logits_fp = np.asarray(llama_forward(params, tokens, CFG))
    logits_q = np.asarray(llama_forward(qp, tokens, CFG))
    corr = np.corrcoef(logits_fp.ravel(), logits_q.ravel())[0, 1]
    assert corr > 0.98, corr


def test_target_bit_budget_allocation():
    """--target_bit converts an average-bit budget into per-layer outlier
    counts via layer ratios (reference main.py:76-95)."""
    from qeft_tpu.pipeline import _n_out_dict

    params, _ = setup()
    args = make_args(target_rank=None, target_bit=4.2)
    n_out = _n_out_dict(params, META, args, CFG)
    # all even, positive for owq layers, scaled by ratios
    assert all(v % 2 == 0 for v in n_out.values())
    assert n_out["q"] > 0
    # mlp layers have ratio 0.375 of attention's 1.0 (but different k_in)
    d, f = CFG.hidden_size, CFG.intermediate_size
    r = (12 / (16 - 4)) * (4.2 - 4) / 7
    assert n_out["q"] == round(d * r * 1.0) + (round(d * r * 1.0) % 2)


def test_host_reorder_matches_jnp_reorder():
    from qeft_tpu.pipeline import reorder_model_host

    params, calib = setup()
    rng = np.random.default_rng(4)
    d, hd, f = CFG.hidden_size, CFG.num_heads * CFG.head_dim, CFG.intermediate_size
    global_out = jnp.asarray(np.sort(rng.choice(d, size=8, replace=False)))

    def dummy_state(k_in, n_out_dim, r):
        out_ids = jnp.asarray(np.sort(rng.choice(k_in, size=r, replace=False)))
        g = k_in // 64
        return QuantizerState(
            scale_group=jnp.asarray(rng.random((n_out_dim, g)).astype(np.float32)),
            zero_group=jnp.asarray(rng.random((n_out_dim, g)).astype(np.float32)),
            out_ids=out_ids, sym=False, bits=4, group_size=64,
        )

    def make_states():
        q = {}
        rng2 = np.random.default_rng(4)
        for i in range(CFG.num_layers):
            q[(i, "o")] = dummy_state(hd, d, 4)
            q[(i, "down")] = dummy_state(f, d, 4)
            for name in ("q", "k", "v"):
                q[(i, name)] = dummy_state(d, hd, 8)
            for name in ("up", "gate"):
                q[(i, name)] = dummy_state(d, f, 8)
        return q

    rng = np.random.default_rng(5)
    qa = make_states()
    rng = np.random.default_rng(5)
    qb = {k: QuantizerState(
        scale_group=jnp.asarray(np.array(v.scale_group)),
        zero_group=jnp.asarray(np.array(v.zero_group)),
        out_ids=v.out_ids, sym=v.sym, bits=v.bits, group_size=v.group_size,
    ) for k, v in qa.items()}

    ref = reorder_model(params, qa, global_out, CFG, META)
    host = reorder_model_host(
        jax.tree.map(lambda a: np.asarray(a), params), qb, np.asarray(global_out),
        CFG, META,
    )
    for key in ("embed", "final_ln", "lm_head"):
        np.testing.assert_allclose(np.asarray(host[key]), np.asarray(ref[key]), rtol=1e-6)
    for name in list(META.all_linears) + list(META.ln) + ["o_reorder"]:
        np.testing.assert_allclose(
            np.asarray(host["layers"][name]), np.asarray(ref["layers"][name]),
            rtol=1e-6, err_msg=name,
        )
    for key in qa:
        np.testing.assert_allclose(
            np.asarray(qb[key].scale_group), np.asarray(qa[key].scale_group),
            rtol=1e-6, err_msg=str(key),
        )


def test_act_order_per_layer_fake_vs_packed_parity():
    """--act_order aligns group params to the sensitivity permutation; packing
    must permute rows by the SAME ids (stored as QuantizerState.perm_ids) and
    gather the input at runtime, or the packed model is silently corrupted
    (round-2 review finding)."""
    params, calib = setup()
    args = make_args(reorder=False, act_order=True)
    qparams, quantizers = quantize_model(params, calib, CFG, META, args, None)
    assert all(st.perm_ids is not None for st in quantizers.values())
    packed = pack_model(qparams, quantizers, CFG, META, dtype=jnp.float32)

    tokens = jnp.asarray(calib[:2])
    logits_fake = np.asarray(llama_forward(qparams, tokens, CFG))
    logits_packed = np.asarray(llama_forward(packed, tokens, CFG))
    np.testing.assert_allclose(logits_packed, logits_fake, rtol=5e-3, atol=5e-3)


def test_act_order_with_global_reorder_pack_rejected():
    """The static global reorder assumes the canonical outliers-last layout;
    act-order group params cannot ride it — packing must refuse loudly."""
    params, calib = setup()
    args = make_args(reorder=True, act_order=True)
    outidx, _ = extract_global_outidx(params, calib, CFG, META, args)
    qparams, quantizers = quantize_model(params, calib, CFG, META, args, outidx)
    with pytest.raises(ValueError, match="act_order"):
        pack_model(qparams, quantizers, CFG, META, dtype=jnp.float32)
