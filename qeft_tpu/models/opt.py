"""Functional JAX OPT-family decoder (fc1/fc2 MLP, LayerNorm, learned
positional embeddings) with the full generation surface: plain forward,
prefill, windowed forward, and single-token decode over the head-major static
KV cache — the same API set as models/llama.py.

Covers the reference's OPT support (model_config.json:2-25; the reference
reuses HF's modeling_opt and its past_key_values path, utils/misc.py:81-86).
Same conventions as models/llama.py: dense linears are [K, N], per-layer
params stack on a leading axis and scan, packed linears are QLinearParams.
OGR reorder applies to OPT too: LayerNorm's mean subtraction is
permutation-invariant, so the residual-stream permutation remains exact
(positional embeddings and residual-writing biases are permuted with it).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from qeft_tpu.ops.permute import apply_o_reorder
from qeft_tpu.models.llama import _attention, _causal_mask, apply_linear


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    ffn_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    do_layer_norm_before: bool = True
    # opt-350m: token embeddings live in a narrower space and are projected
    # into/out of the hidden stream (HF word_embed_proj_dim; the reference
    # appends project_in/out to pre/post layers, utils/misc.py:77-79).
    # opt-350m is also post-LN (do_layer_norm_before=False, no final LN).
    word_embed_proj_dim: Optional[int] = None  # None -> hidden_size
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_kv_heads(self) -> int:
        return self.num_heads  # OPT is MHA

    @property
    def embed_dim(self) -> int:
        return self.word_embed_proj_dim or self.hidden_size


OPT_PRESETS: Dict[str, OPTConfig] = {
    "opt-125m": OPTConfig(),
    "opt-1.3b": OPTConfig(hidden_size=2048, ffn_dim=8192, num_layers=24, num_heads=32),
    "opt-6.7b": OPTConfig(hidden_size=4096, ffn_dim=16384, num_layers=32, num_heads=32),
    "opt-350m": OPTConfig(
        hidden_size=1024, ffn_dim=4096, num_layers=24, num_heads=16,
        word_embed_proj_dim=512, do_layer_norm_before=False,
    ),
    "opt-tiny": OPTConfig(
        vocab_size=256, hidden_size=128, ffn_dim=256, num_layers=2, num_heads=4,
        max_position_embeddings=128,
    ),
    "opt-tiny-350m": OPTConfig(  # opt-350m quirks at test scale
        vocab_size=256, hidden_size=128, ffn_dim=256, num_layers=2, num_heads=4,
        max_position_embeddings=128, word_embed_proj_dim=64,
        do_layer_norm_before=False,
    ),
}

# OPT's learned positional embedding is queried at position+2 (HF convention)
_POS_OFFSET = 2


def init_params(cfg: OPTConfig, key: jax.Array, dtype=None) -> Dict:
    dtype = dtype or cfg.dtype
    d, f = cfg.hidden_size, cfg.ffn_dim
    keys = jax.random.split(key, 8)

    def lin(k, kin, kout):
        return (jax.random.normal(k, (kin, kout), jnp.float32) * (kin**-0.5)).astype(dtype)

    def block(k):
        ks = jax.random.split(k, 6)
        return {
            "attn_ln": jnp.ones((d,), dtype),
            "attn_ln_b": jnp.zeros((d,), dtype),
            "final_ln": jnp.ones((d,), dtype),
            "final_ln_b": jnp.zeros((d,), dtype),
            "q": lin(ks[0], d, d),
            "q_b": jnp.zeros((d,), dtype),
            "k": lin(ks[1], d, d),
            "k_b": jnp.zeros((d,), dtype),
            "v": lin(ks[2], d, d),
            "v_b": jnp.zeros((d,), dtype),
            "o": lin(ks[3], d, d),
            "o_b": jnp.zeros((d,), dtype),
            "fc1": lin(ks[4], d, f),
            "fc1_b": jnp.zeros((f,), dtype),
            "fc2": lin(ks[5], f, d),
            "fc2_b": jnp.zeros((d,), dtype),
        }

    blocks = [block(jax.random.fold_in(keys[0], i)) for i in range(cfg.num_layers)]
    e = cfg.embed_dim
    out = {
        "embed": (jax.random.normal(keys[1], (cfg.vocab_size, e), jnp.float32) * 0.02).astype(dtype),
        "embed_pos": (
            jax.random.normal(keys[2], (cfg.max_position_embeddings + _POS_OFFSET, d), jnp.float32)
            * 0.02
        ).astype(dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "lm_head": lin(keys[3], e, cfg.vocab_size),
    }
    if cfg.do_layer_norm_before:
        # post-LN OPT (350m) has no final layer norm (HF modeling_opt)
        out["final_ln"] = jnp.ones((d,), dtype)
        out["final_ln_b"] = jnp.zeros((d,), dtype)
    if e != d:
        out["project_in"] = lin(keys[4], e, d)
        out["project_out"] = lin(keys[5], d, e)
    return out


def layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def _embed_opt(params: Dict, tokens: jax.Array, positions: jax.Array) -> jax.Array:
    """tokens [B, S]; positions [B, S] or [1, S] absolute positions."""
    x = jnp.take(params["embed"], tokens, axis=0)
    if "project_in" in params:  # opt-350m narrow embedding space
        x = apply_linear(params["project_in"], x, x.dtype)
    return x + jnp.take(params["embed_pos"], positions + _POS_OFFSET, axis=0)


def opt_block(
    blk: Dict,
    x: jax.Array,
    cfg: OPTConfig,
    mask: Optional[jax.Array],
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_pos: Optional[jax.Array] = None,
    capture: bool = False,
):
    """One OPT decoder block; same cache contract as llama_block
    (head-major [B, H, S_max, Dh] caches written at ``cache_pos``)."""
    b, s, d = x.shape
    h, dh = cfg.num_heads, cfg.head_dim
    dtype = x.dtype

    res = x
    if cfg.do_layer_norm_before:
        x = layer_norm(x, blk["attn_ln"], blk["attn_ln_b"], cfg.layer_norm_eps)
    qkv_in = x
    q = (apply_linear(blk["q"], x, dtype) + blk["q_b"]).reshape(b, s, h, dh)
    k = (apply_linear(blk["k"], x, dtype) + blk["k_b"]).reshape(b, s, h, dh)
    v = (apply_linear(blk["v"], x, dtype) + blk["v_b"]).reshape(b, s, h, dh)
    kh = k.transpose(0, 2, 1, 3)  # [B, H, S, Dh]
    vh = v.transpose(0, 2, 1, 3)

    if kv is not None:
        k_cache, v_cache = kv
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, kh.astype(k_cache.dtype), (0, 0, cache_pos, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, vh.astype(v_cache.dtype), (0, 0, cache_pos, 0)
        )
        k_all, v_all = k_cache.astype(dtype), v_cache.astype(dtype)
        new_kv = (k_cache, v_cache)
    else:
        k_all, v_all = kh, vh
        new_kv = None

    ctx = _attention(q, k_all, v_all, mask, 1, dtype)
    o_in = apply_o_reorder(ctx, blk)
    x = res + apply_linear(blk["o"], o_in, dtype) + blk["o_b"]
    if not cfg.do_layer_norm_before:
        x = layer_norm(x, blk["attn_ln"], blk["attn_ln_b"], cfg.layer_norm_eps)

    res = x
    if cfg.do_layer_norm_before:
        x = layer_norm(x, blk["final_ln"], blk["final_ln_b"], cfg.layer_norm_eps)
    ffn1_in = x
    h1 = jax.nn.relu(apply_linear(blk["fc1"], x, dtype) + blk["fc1_b"])
    x = res + apply_linear(blk["fc2"], h1, dtype) + blk["fc2_b"]
    if not cfg.do_layer_norm_before:
        x = layer_norm(x, blk["final_ln"], blk["final_ln_b"], cfg.layer_norm_eps)
    if capture:
        # inputs to the four sequential quantization stages (reference
        # model_config.json:2-25: [qkv], [out_proj], [fc1], [fc2])
        return x, new_kv, {"qkv_in": qkv_in, "o_in": ctx, "ffn1_in": ffn1_in, "ffn2_in": h1}
    return x, new_kv, None


def _final(params: Dict, x: jax.Array, cfg: OPTConfig) -> jax.Array:
    if "final_ln" in params:  # absent for post-LN opt-350m
        x = layer_norm(x, params["final_ln"], params["final_ln_b"], cfg.layer_norm_eps)
    if "project_out" in params:
        x = apply_linear(params["project_out"], x, x.dtype)
    return apply_linear(params["lm_head"], x, x.dtype)


def opt_forward(params: Dict, tokens: jax.Array, cfg: OPTConfig) -> jax.Array:
    """Plain full-sequence forward -> logits [B, S, V] (no cache; PPL eval)."""
    b, s = tokens.shape
    x = _embed_opt(params, tokens, jnp.arange(s)[None, :])
    mask = _causal_mask(s)

    def body(xc, blk):
        out, _, _ = opt_block(blk, xc, cfg, mask)
        return out, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return _final(params, x, cfg)


def init_kv_cache(cfg: OPTConfig, batch: int, max_len: int, dtype=None):
    """Head-major static cache: [L, B, H, S_max, Dh]."""
    dtype = dtype or cfg.dtype
    shape = (cfg.num_layers, batch, cfg.num_heads, max_len, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def opt_forward_window(
    params: Dict, tokens: jax.Array, cache: Dict, pos: jax.Array, cfg: OPTConfig
):
    """Forward a WINDOW of tokens at offset ``pos`` through the cache
    (generalizes prefill at pos=0 and decode at W=1; see llama_forward_window)."""
    b, w = tokens.shape
    max_len = cache["k"].shape[3]
    positions = pos + jnp.arange(w)[None, :]
    x = _embed_opt(params, tokens, positions)
    key_pos = jnp.arange(max_len)[None, None, None, :]
    query_pos = (pos + jnp.arange(w))[None, None, :, None]
    mask = jnp.where(key_pos <= query_pos, 0.0, -jnp.inf).astype(jnp.float32)

    def body(xc, inp):
        blk, kc, vc = inp
        out, (kc, vc), _ = opt_block(blk, xc, cfg, mask, kv=(kc, vc), cache_pos=pos)
        return out, (kc, vc)

    x, (ks, vs) = jax.lax.scan(body, x, (params["layers"], cache["k"], cache["v"]))
    return _final(params, x, cfg), {"k": ks, "v": vs}


def opt_prefill(params: Dict, tokens: jax.Array, cache: Dict, cfg: OPTConfig):
    """Prefill: fills cache[..., :S, :]; returns (logits [B, S, V], cache)."""
    return opt_forward_window(params, tokens, cache, jnp.int32(0), cfg)


def opt_decode_step(
    params: Dict, token: jax.Array, cache: Dict, pos: jax.Array, cfg: OPTConfig
):
    """One decode step. token: [B, 1]; pos: scalar int32.  Returns
    (logits [B, V], new cache)."""
    logits, cache = opt_forward_window(params, token, cache, pos, cfg)
    return logits[:, 0, :], cache
