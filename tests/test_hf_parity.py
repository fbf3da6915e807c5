"""Logit parity against REAL HuggingFace implementations.

For every supported family a tiny random-init HF model is saved as
safetensors, loaded through our hf_loader, and our functional forward's
logits are compared with the HF model's own forward.  This gates the whole
chain at once: config translation, weight layout (transposes, bloom's
megatron qkv interleave, falcon's multi-query fusion), and the model math
(RoPE variants, partial rotary, ALiBi, parallel blocks, LayerNorm biases).

The reference delegates all of this to transformers itself
(utils/modelutils.py:66-105); this suite is what proves our reimplementation
matches it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import torch

from qeft_tpu.models.api import get_model_api
from qeft_tpu.models.hf_loader import load_hf_model


def _save(model, path):
    model.eval()
    model.save_pretrained(str(path), safe_serialization=True)


def _compare(path, family, seqlen=12, rtol=2e-3, atol=2e-3):
    from transformers import AutoModelForCausalLM

    hf = AutoModelForCausalLM.from_pretrained(str(path), torch_dtype=torch.float32)
    hf.eval()
    params, cfg, fam = load_hf_model(str(path), dtype=jnp.float32)
    assert fam == family
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, size=(1, seqlen))
    with torch.no_grad():
        want = hf(torch.from_numpy(toks)).logits.float().numpy()
    got = np.asarray(get_model_api(fam).forward(params, jnp.asarray(toks), cfg))
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


def test_llama_parity(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    _save(LlamaForCausalLM(LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )), tmp_path)
    _compare(tmp_path, "llama")


def test_opt_parity(tmp_path):
    from transformers import OPTConfig, OPTForCausalLM

    _save(OPTForCausalLM(OPTConfig(
        vocab_size=128, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=64, do_layer_norm_before=True,
    )), tmp_path)
    _compare(tmp_path, "opt")


def test_phi_parity(tmp_path):
    from transformers import PhiConfig, PhiForCausalLM

    _save(PhiForCausalLM(PhiConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=64,
    )), tmp_path)
    _compare(tmp_path, "phi")


def test_bloom_parity(tmp_path):
    from transformers import BloomConfig, BloomForCausalLM

    _save(BloomForCausalLM(BloomConfig(
        vocab_size=128, hidden_size=64, n_layer=2, n_head=4,
    )), tmp_path)
    _compare(tmp_path, "bloom")


def test_falcon_parity(tmp_path):
    from transformers import FalconConfig, FalconForCausalLM

    _save(FalconForCausalLM(FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        bias=False, new_decoder_architecture=False, alibi=False,
    )), tmp_path)
    _compare(tmp_path, "falcon")


def test_gemma_parity(tmp_path):
    """Gemma numerics through the loader: gelu MLP, (1+w) RMSNorm,
    sqrt(hidden)-scaled embeddings, tied lm_head (the config flags must ride
    config_from_hf, not just the presets)."""
    from transformers import GemmaConfig, GemmaForCausalLM

    _save(GemmaForCausalLM(GemmaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64,
    )), tmp_path)
    _compare(tmp_path, "gemma")
