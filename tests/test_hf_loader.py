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
