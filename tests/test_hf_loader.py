"""Round-trip the HF safetensors loader against a fabricated checkpoint."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qeft_tpu.models import LLAMA_PRESETS, init_params, llama_forward

CFG = LLAMA_PRESETS["tiny"]


def write_fake_hf_ckpt(path, params):
    """Write our tiny model as an HF-Llama-style safetensors checkpoint."""
    from safetensors.numpy import save_file

    hf = {
        "model.embed_tokens.weight": np.asarray(params["embed"], np.float32),
        "model.norm.weight": np.asarray(params["final_ln"], np.float32),
        "lm_head.weight": np.asarray(params["lm_head"], np.float32).T.copy(),
    }
    name_map = {
        "q": "self_attn.q_proj", "k": "self_attn.k_proj", "v": "self_attn.v_proj",
        "o": "self_attn.o_proj", "up": "mlp.up_proj", "gate": "mlp.gate_proj",
        "down": "mlp.down_proj",
    }
    for i in range(CFG.num_layers):
        pre = f"model.layers.{i}."
        hf[pre + "input_layernorm.weight"] = np.asarray(
            params["layers"]["input_ln"][i], np.float32
        )
        hf[pre + "post_attention_layernorm.weight"] = np.asarray(
            params["layers"]["post_ln"][i], np.float32
        )
        for ours, theirs in name_map.items():
            hf[pre + theirs + ".weight"] = np.asarray(
                params["layers"][ours][i], np.float32
            ).T.copy()
    save_file(hf, str(path / "model.safetensors"))

    cfg_json = {
        "vocab_size": CFG.vocab_size,
        "hidden_size": CFG.hidden_size,
        "intermediate_size": CFG.intermediate_size,
        "num_hidden_layers": CFG.num_layers,
        "num_attention_heads": CFG.num_heads,
        "num_key_value_heads": CFG.num_kv_heads,
        "head_dim": CFG.head_dim,
        "max_position_embeddings": CFG.max_position_embeddings,
        "rms_norm_eps": CFG.rms_norm_eps,
        "rope_theta": CFG.rope_theta,
    }
    with open(path / "config.json", "w") as f:
        json.dump(cfg_json, f)


def test_hf_loader_roundtrip(tmp_path):
    from qeft_tpu.models.hf_loader import load_hf_llama

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    write_fake_hf_ckpt(tmp_path, params)

    loaded, cfg = load_hf_llama(str(tmp_path), dtype=jnp.float32)
    assert cfg.hidden_size == CFG.hidden_size
    assert cfg.num_kv_heads == CFG.num_kv_heads

    tokens = jnp.arange(8)[None, :] % CFG.vocab_size
    ref = np.asarray(llama_forward(params, tokens, CFG))
    out = np.asarray(llama_forward(loaded, tokens, cfg))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_hf_loader_falcon_new_decoder_architecture(tmp_path):
    """falcon-40B/180B lineage: GQA kv heads, separate ln_attn/ln_mlp, and
    HF's per-kv-group interleaved fused qkv.  Fabricate an HF checkpoint
    FROM our falcon-tiny-40b params (interleaving qkv the way HF stores it)
    and check the loader inverts it exactly."""
    from safetensors.numpy import save_file

    from qeft_tpu.models import falcon as falcon_mod
    from qeft_tpu.models.hf_loader import (
        _falcon_qkv_deinterleave_ids,
        load_hf_falcon,
    )

    cfg = falcon_mod.FALCON_PRESETS["falcon-tiny-40b"]
    params = falcon_mod.init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    ids = _falcon_qkv_deinterleave_ids(cfg.num_heads, cfg.num_kv_heads, cfg.head_dim)
    inv = np.argsort(ids)  # our [q|k|v] -> HF per-group interleave

    hf = {
        "transformer.word_embeddings.weight": np.asarray(params["embed"], np.float32),
        "transformer.ln_f.weight": np.asarray(params["final_ln"], np.float32),
        "transformer.ln_f.bias": np.asarray(params["final_ln_b"], np.float32),
        "lm_head.weight": np.asarray(params["lm_head"], np.float32).T.copy(),
    }
    for i in range(cfg.num_layers):
        pre = f"transformer.h.{i}."
        lay = params["layers"]
        hf[pre + "ln_attn.weight"] = np.asarray(lay["attn_ln"][i], np.float32)
        hf[pre + "ln_attn.bias"] = np.asarray(lay["attn_ln_b"][i], np.float32)
        hf[pre + "ln_mlp.weight"] = np.asarray(lay["mlp_ln"][i], np.float32)
        hf[pre + "ln_mlp.bias"] = np.asarray(lay["mlp_ln_b"][i], np.float32)
        qkv_ours = np.asarray(lay["qkv"][i], np.float32)  # [K, N] contiguous
        hf[pre + "self_attention.query_key_value.weight"] = (
            qkv_ours[:, inv].T.copy()
        )
        hf[pre + "self_attention.dense.weight"] = np.asarray(
            lay["dense"][i], np.float32).T.copy()
        hf[pre + "mlp.dense_h_to_4h.weight"] = np.asarray(
            lay["fc1"][i], np.float32).T.copy()
        hf[pre + "mlp.dense_4h_to_h.weight"] = np.asarray(
            lay["fc2"][i], np.float32).T.copy()
    save_file(hf, str(tmp_path / "model.safetensors"))
    with open(tmp_path / "config.json", "w") as f:
        json.dump({
            "model_type": "falcon",
            "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.hidden_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "num_kv_heads": cfg.num_kv_heads,
            "new_decoder_architecture": True,
            "layer_norm_epsilon": cfg.layer_norm_eps,
        }, f)

    loaded, lcfg = load_hf_falcon(str(tmp_path), dtype=jnp.float32)
    assert lcfg.dual_ln and lcfg.num_kv_heads == cfg.num_kv_heads

    tokens = jnp.arange(10)[None, :] % cfg.vocab_size
    ref = np.asarray(falcon_mod.falcon_forward(params, tokens, cfg))
    out = np.asarray(falcon_mod.falcon_forward(loaded, tokens, lcfg))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
