"""Importer for reference (xvyaward/qeft) packed checkpoints.

The AWQ-interleave inverse is verified against the reference's OWN
`pack_intweight` (its source is exec'd from /root/reference as a test oracle
— reference code never enters the package); the end-to-end test constructs a
faithful reference-format checkpoint and checks the imported model
dequantizes to the exact fake weights it encodes."""

import ast

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from qeft_tpu.import_reference import import_reference_packed, unpack_awq

REF_QLINEAR = "/root/reference/qeft/qlinear.py"


def _reference_pack_intweight():
    """Load the reference's pack_intweight as an oracle (torch-only function;
    the surrounding module needs qeft_cuda, so extract just the function)."""
    src = open(REF_QLINEAR).read()
    tree = ast.parse(src)
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "pack_intweight"
    )
    ns = {"torch": torch, "np": np}
    exec(compile(ast.Module([fn], type_ignores=[]), REF_QLINEAR, "exec"), ns)
    return ns["pack_intweight"]


def test_unpack_awq_inverts_reference_pack_intweight():
    pack_intweight = _reference_pack_intweight()
    rng = np.random.default_rng(0)
    for oc, ic in [(8, 64), (32, 128), (12, 192)]:
        codes = rng.integers(0, 16, size=(oc, ic), dtype=np.int64)
        packed = pack_intweight(
            torch.from_numpy(codes).to(torch.int32), interleave=4, kstride=64
        ).numpy()
        assert packed.shape == (oc // 4, ic)
        back = unpack_awq(packed, oc, ic)
        np.testing.assert_array_equal(back, codes)


def _make_reference_ckpt(tmp_path, cfg, g=64, r=8, seed=0):
    """Construct a faithful reference-format packed checkpoint
    (modelutils.py:248-268 + QuantLinear.pack conventions) with random
    quantization params, returning (path, {name: fake [K, N]})."""
    from argparse import Namespace

    pack_intweight = _reference_pack_intweight()
    rng = np.random.default_rng(seed)
    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    hd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim

    shapes = {  # torch orientation [OC, IC]
        "self_attn.q_proj.": (hd, d), "self_attn.k_proj.": (kvd, d),
        "self_attn.v_proj.": (kvd, d), "self_attn.o_proj.": (d, hd),
        "mlp.up_proj.": (f, d), "mlp.gate_proj.": (f, d),
        "mlp.down_proj.": (d, f),
    }
    sd, fakes, quantinfos = {}, {}, {}
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        sd[pre + "input_layernorm.weight"] = torch.ones(d, dtype=torch.float16)
        sd[pre + "post_attention_layernorm.weight"] = torch.ones(d, dtype=torch.float16)
        for name, (oc, ic) in shapes.items():
            ng = ic // g
            codes = rng.integers(0, 16, size=(oc, ic)).astype(np.float32)
            scales = (rng.random((oc, ng), np.float32) * 0.02 + 0.01)
            zeros = rng.integers(1, 15, size=(oc, ng)).astype(np.float32)
            # outlier columns: codes hold the zero-point -> dense contributes 0
            codes[:, ic - r:] = np.repeat(zeros, g, axis=1)[:, ic - r:]
            oweight = (rng.standard_normal((oc, r)) * 0.05).astype(np.float32)
            # the fake weight the reference would have packed
            w = (codes - np.repeat(zeros, g, axis=1)) * np.repeat(scales, g, axis=1)
            w_kn = w.T.copy()
            w_kn[ic - r:, :] = oweight.T
            fakes[(i, name)] = w_kn

            sd[pre + name + "qweight"] = pack_intweight(
                torch.from_numpy(codes.astype(np.int64)).to(torch.int32),
                interleave=4, kstride=64,
            )
            sd[pre + name + "scales"] = torch.from_numpy(scales.T.copy()).to(torch.float16)
            sd[pre + name + "scaled_zeros"] = torch.from_numpy(
                (-(zeros * scales)).T.copy()
            ).to(torch.float16)
            sd[pre + name + "oweight"] = torch.from_numpy(oweight).to(torch.float16)
            sd[pre + name + "outlieridx"] = torch.from_numpy(
                rng.choice(ic, size=r, replace=False).astype(np.int64)
            ) if "o_proj" in name else torch.arange(ic - r, ic)
            quantinfos[pre + name[:-1]] = Namespace(
                bits=4, sym=False, group_size=g, n_out=r, reorder=True
            )
    sd["model.embed_tokens.weight"] = torch.from_numpy(
        rng.standard_normal((v, d)).astype(np.float32)
    ).to(torch.float16)
    sd["model.norm.weight"] = torch.ones(d, dtype=torch.float16)
    sd["lm_head.weight"] = torch.from_numpy(
        rng.standard_normal((v, d)).astype(np.float32)
    ).to(torch.float16)

    path = str(tmp_path / "ref_packed.pth")
    torch.save(
        {"model_state_dict": sd, "quantinfos": quantinfos, "packing": True,
         "dtype": torch.float16, "bits": 4, "group_size": g},
        path,
    )
    return path, fakes


def test_import_reference_checkpoint_end_to_end(tmp_path):
    import dataclasses

    from qeft_tpu.models import LLAMA_PRESETS
    from qeft_tpu.models.llama import llama_forward
    from qeft_tpu.ops.packing import dequantize_weight

    cfg = dataclasses.replace(LLAMA_PRESETS["tiny"], hidden_size=256,
                              intermediate_size=512, num_layers=2)
    path, fakes = _make_reference_ckpt(tmp_path, cfg)
    params, family = import_reference_packed(path, cfg)
    assert family == "llama"

    # bit-faithful weights: dense part + outlier slab reconstruct the fake
    # weight the reference checkpoint encodes (bf16 params vs fp16 source)
    blk0 = jax.tree.map(lambda a: a[0], params["layers"])
    for ours, theirs in [("q", "self_attn.q_proj."), ("down", "mlp.down_proj.")]:
        lin = blk0[ours]
        w = np.array(dequantize_weight(lin, jnp.float32))
        r = lin.n_outlier
        w[-r:, :] = np.asarray(lin.oweight, np.float32)
        np.testing.assert_allclose(w, fakes[(0, theirs)], rtol=2e-2, atol=2e-3)

    assert "o_reorder" in blk0
    toks = jnp.asarray(np.arange(10)[None] % cfg.vocab_size)
    out = llama_forward(params, toks, cfg)
    assert np.isfinite(np.asarray(out, np.float32)).all()

    # round-trips through our checkpoint IO
    from qeft_tpu.checkpoint import load_packed, save_packed

    save_packed(str(tmp_path / "imported"), params, cfg, family=family)
    loaded, lcfg, lfam = load_packed(str(tmp_path / "imported"))
    out2 = llama_forward(loaded, toks, lcfg)
    np.testing.assert_allclose(
        np.asarray(out2, np.float32), np.asarray(out, np.float32), rtol=1e-5
    )


def test_import_reference_wct_overlay(tmp_path):
    """Reference WCT (oweight-only) checkpoints overlay onto the imported
    packed base; non-slab weights stay identical."""
    import dataclasses

    from qeft_tpu.import_reference import import_reference_wct
    from qeft_tpu.models import LLAMA_PRESETS

    cfg = dataclasses.replace(LLAMA_PRESETS["tiny"], hidden_size=256,
                              intermediate_size=512, num_layers=2)
    base_path, _ = _make_reference_ckpt(tmp_path, cfg)
    base_params, _ = import_reference_packed(base_path, cfg)

    rng = np.random.default_rng(1)
    tuned = (rng.standard_normal((cfg.num_heads * cfg.head_dim, 8)) * 0.1).astype(np.float32)
    wct_path = str(tmp_path / "wct.pth")
    torch.save({
        "oweight_state_dict": {
            "model.layers.1.self_attn.q_proj": torch.from_numpy(tuned).to(torch.float16)
        },
        "base_path": base_path,
    }, wct_path)

    params, family = import_reference_wct(wct_path, cfg)
    got = np.asarray(params["layers"]["q"].oweight[1], np.float32)
    np.testing.assert_allclose(got, tuned.T, rtol=2e-2, atol=2e-3)
    # untouched layer 0 slab matches the base import
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["q"].oweight[0]),
        np.asarray(base_params["layers"]["q"].oweight[0]),
    )
