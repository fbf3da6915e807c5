"""Load HuggingFace checkpoints (llama- and opt-family) into our parameter
pytrees.

Replaces the reference's `get_hfmodel` (/root/reference/qeft/utils/modelutils.py:66-105),
which loads a full torch model; we only need the tensors, so we read the
safetensors shards directly (no torch, no init).  Dense linears transpose to
our [K, N] (in-features-first) convention.  `load_hf_model` dispatches on
config.json's model_type (the reference dispatches by model-name matching,
utils/misc.py:69-95).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from qeft_tpu.models.llama import LlamaConfig
from qeft_tpu.models.opt import OPTConfig

_HF_LAYER_MAP = {
    "q": "self_attn.q_proj",
    "k": "self_attn.k_proj",
    "v": "self_attn.v_proj",
    "o": "self_attn.o_proj",
    "up": "mlp.up_proj",
    "gate": "mlp.gate_proj",
    "down": "mlp.down_proj",
}


def config_from_hf(path: str) -> LlamaConfig:
    with open(os.path.join(path, "config.json")) as f:
        hc = json.load(f)
    head_dim = hc.get("head_dim", hc["hidden_size"] // hc["num_attention_heads"])
    gemma = hc.get("model_type", "llama").lower() == "gemma"
    return LlamaConfig(
        vocab_size=hc["vocab_size"],
        hidden_size=hc["hidden_size"],
        intermediate_size=hc["intermediate_size"],
        num_layers=hc["num_hidden_layers"],
        num_heads=hc["num_attention_heads"],
        num_kv_heads=hc.get("num_key_value_heads", hc["num_attention_heads"]),
        head_dim=head_dim,
        max_position_embeddings=hc.get("max_position_embeddings", 4096),
        rms_norm_eps=hc.get("rms_norm_eps", 1e-5),
        rope_theta=hc.get("rope_theta", 10000.0),
        # gemma numerics (matching the LLAMA_PRESETS gemma entries): gelu
        # MLP, (1+w)-scaled RMSNorm, sqrt(hidden)-scaled embeddings
        act="gelu_tanh" if gemma else "silu",
        rms_one_offset=gemma,
        embed_scale=gemma,
    )


def _open_shards(path: str):
    from safetensors import safe_open

    index_path = os.path.join(path, "model.safetensors.index.json")
    tensors: Dict[str, Tuple[str, str]] = {}
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
        key_to_file = index["weight_map"]
    else:
        files = ["model.safetensors"]
        with safe_open(os.path.join(path, files[0]), framework="np") as f:
            key_to_file = {k: files[0] for k in f.keys()}
    return key_to_file, path


def load_hf_llama(path: str, dtype=jnp.bfloat16) -> Tuple[Dict, LlamaConfig]:
    cfg = config_from_hf(path)
    get, has = _reader(path)

    def lin(name: str):
        # HF stores [out, in]; ours is [in, out]
        return jnp.asarray(get(name).T, dtype=dtype)

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        blk = {
            "input_ln": jnp.asarray(get(pre + "input_layernorm.weight"), dtype=dtype),
            "post_ln": jnp.asarray(
                get(pre + "post_attention_layernorm.weight"), dtype=dtype
            ),
        }
        for ours, theirs in _HF_LAYER_MAP.items():
            blk[ours] = lin(pre + theirs + ".weight")
        blocks.append(blk)

    import jax

    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype=dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": jnp.asarray(get("model.norm.weight"), dtype=dtype),
    }
    if has("lm_head.weight"):
        params["lm_head"] = lin("lm_head.weight")
    else:  # tied embeddings
        params["lm_head"] = params["embed"].T
    return params, cfg


# ---------------------------------------------------------------------------
# OPT family


def opt_config_from_hf(path: str) -> OPTConfig:
    with open(os.path.join(path, "config.json")) as f:
        hc = json.load(f)
    wepd = hc.get("word_embed_proj_dim", hc["hidden_size"])
    return OPTConfig(
        vocab_size=hc["vocab_size"],
        hidden_size=hc["hidden_size"],
        ffn_dim=hc["ffn_dim"],
        num_layers=hc["num_hidden_layers"],
        num_heads=hc["num_attention_heads"],
        max_position_embeddings=hc.get("max_position_embeddings", 2048),
        do_layer_norm_before=hc.get("do_layer_norm_before", True),
        word_embed_proj_dim=None if wepd == hc["hidden_size"] else wepd,
    )


_HF_OPT_MAP = {
    "q": "self_attn.q_proj",
    "k": "self_attn.k_proj",
    "v": "self_attn.v_proj",
    "o": "self_attn.out_proj",
    "fc1": "fc1",
    "fc2": "fc2",
}


def load_hf_opt(path: str, dtype=jnp.bfloat16) -> Tuple[Dict, OPTConfig]:
    cfg = opt_config_from_hf(path)
    get, has = _reader(path)

    def arr(name):
        return jnp.asarray(get(name), dtype=dtype)

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"model.decoder.layers.{i}."
        blk = {
            "attn_ln": arr(pre + "self_attn_layer_norm.weight"),
            "attn_ln_b": arr(pre + "self_attn_layer_norm.bias"),
            "final_ln": arr(pre + "final_layer_norm.weight"),
            "final_ln_b": arr(pre + "final_layer_norm.bias"),
        }
        for ours, theirs in _HF_OPT_MAP.items():
            blk[ours] = jnp.asarray(get(pre + theirs + ".weight").T, dtype=dtype)
            blk[ours + "_b"] = arr(pre + theirs + ".bias")
        blocks.append(blk)

    import jax

    params = {
        "embed": arr("model.decoder.embed_tokens.weight"),
        "embed_pos": arr("model.decoder.embed_positions.weight"),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }
    if has("model.decoder.final_layer_norm.weight"):
        params["final_ln"] = arr("model.decoder.final_layer_norm.weight")
        params["final_ln_b"] = arr("model.decoder.final_layer_norm.bias")
    # opt-350m: narrow embedding space projected into/out of the stream
    # (reference pre/post layers, utils/misc.py:77-79)
    if has("model.decoder.project_in.weight"):
        params["project_in"] = jnp.asarray(
            get("model.decoder.project_in.weight").T, dtype=dtype
        )
        params["project_out"] = jnp.asarray(
            get("model.decoder.project_out.weight").T, dtype=dtype
        )
    if has("lm_head.weight"):
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype=dtype)
    else:  # tied embeddings
        params["lm_head"] = params["embed"].T
    return params, cfg


# ---------------------------------------------------------------------------
# phi / bloom / falcon families


def _reader(path: str):
    """(get(name) -> np.ndarray, has(name) -> bool) over the shard set."""
    from safetensors import safe_open

    key_to_file, base = _open_shards(path)
    handles = {}

    def get(name: str) -> np.ndarray:
        fname = key_to_file[name]
        if fname not in handles:
            handles[fname] = safe_open(os.path.join(base, fname), framework="np")
        return handles[fname].get_tensor(name)

    return get, (lambda name: name in key_to_file)


def load_hf_phi(path: str, dtype=jnp.bfloat16):
    """HF PhiForCausalLM (phi-1/1.5/2) -> our parallel-block pytree."""
    import jax

    from qeft_tpu.models.phi import PhiConfig

    with open(os.path.join(path, "config.json")) as f:
        hc = json.load(f)
    cfg = PhiConfig(
        vocab_size=hc["vocab_size"],
        hidden_size=hc["hidden_size"],
        intermediate_size=hc["intermediate_size"],
        num_layers=hc["num_hidden_layers"],
        num_heads=hc["num_attention_heads"],
        num_kv_heads=hc.get("num_key_value_heads") or hc["num_attention_heads"],
        max_position_embeddings=hc.get("max_position_embeddings", 2048),
        layer_norm_eps=hc.get("layer_norm_eps", 1e-5),
        partial_rotary_factor=hc.get("partial_rotary_factor", 0.5),
        rope_theta=hc.get("rope_theta", 10000.0),
    )
    get, has = _reader(path)

    def arr(name):
        return jnp.asarray(get(name), dtype=dtype)

    names = {"q": "self_attn.q_proj", "k": "self_attn.k_proj",
             "v": "self_attn.v_proj", "o": "self_attn.dense",
             "fc1": "mlp.fc1", "fc2": "mlp.fc2"}
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        blk = {
            "input_ln": arr(pre + "input_layernorm.weight"),
            "input_ln_b": arr(pre + "input_layernorm.bias"),
        }
        for ours, theirs in names.items():
            blk[ours] = jnp.asarray(get(pre + theirs + ".weight").T, dtype=dtype)
            blk[ours + "_b"] = arr(pre + theirs + ".bias")
        blocks.append(blk)

    params = {
        "embed": arr("model.embed_tokens.weight"),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": arr("model.final_layernorm.weight"),
        "final_ln_b": arr("model.final_layernorm.bias"),
        "lm_head": jnp.asarray(get("lm_head.weight").T, dtype=dtype),
        "lm_head_b": (
            arr("lm_head.bias")
            if has("lm_head.bias")
            else jnp.zeros((cfg.vocab_size,), dtype)
        ),
    }
    return params, cfg


def load_hf_bloom(path: str, dtype=jnp.bfloat16):
    """HF BloomForCausalLM -> our pytree.  HF's fused query_key_value is
    head-INTERLEAVED ([H, 3, Dh] output rows, megatron lineage); our layout
    is contiguous [q | k | v], so the loader de-interleaves once."""
    import jax

    from qeft_tpu.models.bloom import BloomConfig

    with open(os.path.join(path, "config.json")) as f:
        hc = json.load(f)
    d = hc.get("hidden_size") or hc["n_embed"]
    h = hc.get("num_attention_heads") or hc["n_head"]
    cfg = BloomConfig(
        vocab_size=hc["vocab_size"],
        hidden_size=d,
        num_layers=hc.get("num_hidden_layers") or hc["n_layer"],
        num_heads=h,
        layer_norm_eps=hc.get("layer_norm_epsilon", 1e-5),
    )
    get, has = _reader(path)
    dh = d // h

    def arr(name):
        return jnp.asarray(get(name), dtype=dtype)

    def deinterleave_qkv_w(w):  # [3D, D] rows [H, 3, Dh] -> our [K=D, N=3D]
        q, k, v = np.moveaxis(w.reshape(h, 3, dh, d), 1, 0)  # each [H, Dh, D]
        return jnp.asarray(
            np.concatenate([q.reshape(d, d), k.reshape(d, d), v.reshape(d, d)]).T,
            dtype=dtype,
        )

    def deinterleave_qkv_b(b):  # [3D] -> [3D] in our order
        q, k, v = np.moveaxis(b.reshape(h, 3, dh), 1, 0)
        return jnp.asarray(np.concatenate([q.ravel(), k.ravel(), v.ravel()]), dtype=dtype)

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"transformer.h.{i}."
        blocks.append({
            "attn_ln": arr(pre + "input_layernorm.weight"),
            "attn_ln_b": arr(pre + "input_layernorm.bias"),
            "post_ln": arr(pre + "post_attention_layernorm.weight"),
            "post_ln_b": arr(pre + "post_attention_layernorm.bias"),
            "qkv": deinterleave_qkv_w(get(pre + "self_attention.query_key_value.weight")),
            "qkv_b": deinterleave_qkv_b(get(pre + "self_attention.query_key_value.bias")),
            "dense": jnp.asarray(get(pre + "self_attention.dense.weight").T, dtype=dtype),
            "dense_b": arr(pre + "self_attention.dense.bias"),
            "fc1": jnp.asarray(get(pre + "mlp.dense_h_to_4h.weight").T, dtype=dtype),
            "fc1_b": arr(pre + "mlp.dense_h_to_4h.bias"),
            "fc2": jnp.asarray(get(pre + "mlp.dense_4h_to_h.weight").T, dtype=dtype),
            "fc2_b": arr(pre + "mlp.dense_4h_to_h.bias"),
        })

    embed = arr("transformer.word_embeddings.weight")
    params = {
        "embed": embed,
        "embed_ln": arr("transformer.word_embeddings_layernorm.weight"),
        "embed_ln_b": arr("transformer.word_embeddings_layernorm.bias"),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": arr("transformer.ln_f.weight"),
        "final_ln_b": arr("transformer.ln_f.bias"),
        "lm_head": (
            jnp.asarray(get("lm_head.weight").T, dtype=dtype)
            if has("lm_head.weight")
            else embed.T  # bloom ties lm_head to the embedding
        ),
    }
    return params, cfg


def _falcon_qkv_deinterleave_ids(hq: int, hkv: int, dh: int) -> "np.ndarray":
    """Column ids turning HF new_decoder_architecture's PER-GROUP fused qkv
    layout — [q_g0.., k_g0, v_g0, q_g1.., k_g1, v_g1, ...] with hq/hkv query
    heads per kv group (HF modeling_falcon _split_heads, new arch) — into our
    contiguous [all q | all k | all v]."""
    import numpy as np

    q_per = hq // hkv
    stride = (q_per + 2) * dh
    ids = []
    for h in range(hq):  # q heads
        g, j = divmod(h, q_per)
        ids.append(np.arange(g * stride + j * dh, g * stride + (j + 1) * dh))
    for g in range(hkv):  # k heads
        ids.append(np.arange(g * stride + q_per * dh, g * stride + (q_per + 1) * dh))
    for g in range(hkv):  # v heads
        ids.append(np.arange(g * stride + (q_per + 1) * dh, g * stride + stride))
    return np.concatenate(ids)


def load_hf_falcon(path: str, dtype=jnp.bfloat16):
    """HF FalconForCausalLM -> our pytree.  Covers BOTH lineages (the
    reference loads any falcon via AutoModel, utils/modelutils.py:66-105):
    - falcon-7b: multi_query, one ln per block; HF's fused qkv rows are
      already [all q heads | k | v], matching our contiguous layout;
    - falcon-40B/180B (new_decoder_architecture): GQA kv heads, separate
      ln_attn/ln_mlp, and a per-kv-group interleaved fused qkv that is
      de-interleaved once here."""
    import jax

    from qeft_tpu.models.falcon import FalconConfig

    with open(os.path.join(path, "config.json")) as f:
        hc = json.load(f)
    new_arch = bool(hc.get("new_decoder_architecture"))
    if not new_arch and not hc.get("multi_query", True):
        raise NotImplementedError(
            "falcon loader supports the falcon-7b (multi_query) and "
            "new_decoder_architecture lineages"
        )
    hq = hc["num_attention_heads"]
    hkv = hc.get("num_kv_heads", hq) if new_arch else 1
    cfg = FalconConfig(
        vocab_size=hc["vocab_size"],
        hidden_size=hc["hidden_size"],
        num_layers=hc["num_hidden_layers"],
        num_heads=hq,
        num_kv_heads=hkv,
        layer_norm_eps=hc.get("layer_norm_epsilon", 1e-5),
        rope_theta=hc.get("rope_theta", 10000.0),
        dual_ln=new_arch,
    )
    get, has = _reader(path)

    def arr(name):
        return jnp.asarray(get(name), dtype=dtype)

    qkv_ids = (
        _falcon_qkv_deinterleave_ids(hq, hkv, cfg.head_dim) if new_arch else None
    )

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"transformer.h.{i}."
        ln_name = "ln_attn" if new_arch else "input_layernorm"
        qkv_w = get(pre + "self_attention.query_key_value.weight").T  # [K, N]
        if qkv_ids is not None:
            qkv_w = qkv_w[:, qkv_ids]
        blk = {
            "attn_ln": arr(pre + f"{ln_name}.weight"),
            "attn_ln_b": arr(pre + f"{ln_name}.bias"),
            "qkv": jnp.asarray(qkv_w, dtype=dtype),
            "dense": jnp.asarray(get(pre + "self_attention.dense.weight").T, dtype=dtype),
            "fc1": jnp.asarray(get(pre + "mlp.dense_h_to_4h.weight").T, dtype=dtype),
            "fc2": jnp.asarray(get(pre + "mlp.dense_4h_to_h.weight").T, dtype=dtype),
        }
        if new_arch:
            blk["mlp_ln"] = arr(pre + "ln_mlp.weight")
            blk["mlp_ln_b"] = arr(pre + "ln_mlp.bias")
        blocks.append(blk)

    embed = arr("transformer.word_embeddings.weight")
    params = {
        "embed": embed,
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": arr("transformer.ln_f.weight"),
        "final_ln_b": arr("transformer.ln_f.bias"),
        "lm_head": (
            jnp.asarray(get("lm_head.weight").T, dtype=dtype)
            if has("lm_head.weight")
            else embed.T
        ),
    }
    return params, cfg


def load_hf_model(path: str, dtype=jnp.bfloat16):
    """model_type dispatch -> (params, config, family).  The reference
    dispatches by model-name matching (utils/misc.py:69-95) and loads via
    AutoModel; here config.json's model_type picks the family loader."""
    with open(os.path.join(path, "config.json")) as f:
        hc = json.load(f)
    mt = hc.get("model_type", "llama").lower()
    if mt == "opt":
        params, cfg = load_hf_opt(path, dtype=dtype)
        return params, cfg, "opt"
    if mt in ("llama", "gemma", "mistral"):
        params, cfg = load_hf_llama(path, dtype=dtype)
        if mt == "mistral":
            # mistral topology == llama, but its sliding-window attention is
            # served here as FULL attention — identical for sequences up to
            # sliding_window; cap the position budget so longer sequences
            # can't silently diverge from the HF implementation
            sw = hc.get("sliding_window") or 0
            if sw and sw < cfg.max_position_embeddings:
                import dataclasses as _dc

                cfg = _dc.replace(cfg, max_position_embeddings=sw)
        return params, cfg, "gemma" if mt == "gemma" else "llama"
    if mt == "phi":
        params, cfg = load_hf_phi(path, dtype=dtype)
        return params, cfg, "phi"
    if mt == "bloom":
        params, cfg = load_hf_bloom(path, dtype=dtype)
        return params, cfg, "bloom"
    if mt == "falcon":
        params, cfg = load_hf_falcon(path, dtype=dtype)
        return params, cfg, "falcon"
    raise NotImplementedError(f"HF model_type {mt!r} not supported")
