"""Functional JAX Falcon-family decoder (parallel attention+MLP, rotary,
multi-query attention, fused query_key_value linear, gelu MLP) with the full
generation surface: plain forward, prefill, windowed forward, and
single-token decode over the head-major static KV cache.

Covers the reference's falcon support (model_config.json:127-148; the
reference reuses HF's modeling_falcon and forces percdamp=1.0 for falcon,
utils/misc.py:132-136 — our CLI applies the same override).  Architecture
notes (falcon-7b lineage, parallel_attn=True):
- ONE LayerNorm per block ("attn_ln"): attention and MLP both read ln(x)
  and both add into the residual.
- Multi-query attention: ``num_kv_heads`` (1 for falcon-7b) K/V heads
  shared across all query heads; the fused qkv linear uses OUR contiguous
  [q | k | v] column layout (HF's per-group interleave is a megatron
  artifact; a loader would de-interleave once).
- Linears carry no biases (HF falcon bias=False); LayerNorms do.

Same conventions as models/llama.py.  Global (OGR) reorder IS supported:
the parallel-residual block permutes exactly (qkv and fc1 read the permuted
ln outputs; dense/fc2 outputs permute with the stream).  The
new_decoder_architecture lineage (falcon-40B/180B: separate ln_attn/ln_mlp,
GQA kv heads) is covered by ``dual_ln=True`` + the loader's per-group qkv
de-interleave.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from qeft_tpu.ops.permute import apply_o_reorder
from qeft_tpu.models.llama import (
    _attention,
    _causal_mask,
    apply_linear,
    apply_rope,
    rope_tables,
)
from qeft_tpu.models.opt import layer_norm


@dataclasses.dataclass(frozen=True)
class FalconConfig:
    vocab_size: int = 65024
    hidden_size: int = 4544
    num_layers: int = 32
    num_heads: int = 71
    num_kv_heads: int = 1
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    dtype: Any = jnp.bfloat16
    # new_decoder_architecture (falcon-40B/180B): separate ln_attn / ln_mlp
    # per block (HF FalconConfig.new_decoder_architecture) + GQA kv heads
    dual_ln: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def ffn_dim(self) -> int:
        return 4 * self.hidden_size


FALCON_PRESETS: Dict[str, FalconConfig] = {
    "falcon-7b": FalconConfig(),
    "falcon-40b": FalconConfig(
        vocab_size=65024, hidden_size=8192, num_layers=60, num_heads=128,
        num_kv_heads=8, dual_ln=True,
    ),
    "falcon-tiny": FalconConfig(
        vocab_size=256, hidden_size=128, num_layers=2, num_heads=4,
        num_kv_heads=1, max_position_embeddings=128,
    ),
    "falcon-tiny-40b": FalconConfig(
        vocab_size=256, hidden_size=128, num_layers=2, num_heads=4,
        num_kv_heads=2, max_position_embeddings=128, dual_ln=True,
    ),
}


def init_params(cfg: FalconConfig, key: jax.Array, dtype=None) -> Dict:
    dtype = dtype or cfg.dtype
    d, f = cfg.hidden_size, cfg.ffn_dim
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(key, 8)

    def lin(k, kin, kout):
        return (jax.random.normal(k, (kin, kout), jnp.float32) * (kin**-0.5)).astype(dtype)

    def block(k):
        ks = jax.random.split(k, 4)
        blk = {
            "attn_ln": jnp.ones((d,), dtype),
            "attn_ln_b": jnp.zeros((d,), dtype),
            "qkv": lin(ks[0], d, (hq + 2 * hkv) * dh),
            "dense": lin(ks[1], hq * dh, d),
            "fc1": lin(ks[2], d, f),
            "fc2": lin(ks[3], f, d),
        }
        if cfg.dual_ln:
            blk["mlp_ln"] = jnp.ones((d,), dtype)
            blk["mlp_ln_b"] = jnp.zeros((d,), dtype)
        return blk

    blocks = [block(jax.random.fold_in(keys[0], i)) for i in range(cfg.num_layers)]
    return {
        "embed": (jax.random.normal(keys[1], (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": jnp.ones((d,), dtype),
        "final_ln_b": jnp.zeros((d,), dtype),
        "lm_head": lin(keys[2], d, cfg.vocab_size),
    }


def falcon_block(
    blk: Dict,
    x: jax.Array,
    cfg: FalconConfig,
    cos: jax.Array,
    sin: jax.Array,
    mask: Optional[jax.Array],
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_pos: Optional[jax.Array] = None,
    capture: bool = False,
):
    """One PARALLEL falcon block: x + attn(ln_attn(x)) + mlp(ln_mlp(x)); the
    falcon-7b lineage shares ONE ln (ln_mlp == ln_attn), the
    new_decoder_architecture lineage (falcon-40B/180B) carries a separate
    "mlp_ln".  Same cache contract as llama_block."""
    b, s, d = x.shape
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    dtype = x.dtype

    h = layer_norm(x, blk["attn_ln"], blk["attn_ln_b"], cfg.layer_norm_eps)
    h_mlp = (
        layer_norm(x, blk["mlp_ln"], blk["mlp_ln_b"], cfg.layer_norm_eps)
        if "mlp_ln" in blk else h
    )
    qkv = apply_linear(blk["qkv"], h, dtype)
    q = qkv[..., : hq * dh].reshape(b, s, hq, dh)
    k = qkv[..., hq * dh : (hq + hkv) * dh].reshape(b, s, hkv, dh)
    v = qkv[..., (hq + hkv) * dh :].reshape(b, s, hkv, dh)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    kh = k.transpose(0, 2, 1, 3)
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

    ctx = _attention(q, k_all, v_all, mask, hq // hkv, dtype)
    o_in = apply_o_reorder(ctx, blk)
    attn_out = apply_linear(blk["dense"], o_in, dtype)

    h1 = jax.nn.gelu(
        apply_linear(blk["fc1"], h_mlp, dtype).astype(jnp.float32),
        approximate=True,
    ).astype(dtype)
    mlp_out = apply_linear(blk["fc2"], h1, dtype)

    x = x + attn_out + mlp_out
    if capture:
        # stage inputs (model_config.json:127-148: [qkv], [dense], [fc1],
        # [fc2]); in the 7b lineage qkv and fc1 share the normalized input
        return x, new_kv, {"qkv_in": h, "o_in": ctx, "ffn1_in": h_mlp,
                           "ffn2_in": h1}
    return x, new_kv, None


def pipeline_block_forward(blk: Dict, x: jax.Array, cfg: FalconConfig, capture: bool = False):
    """Full-sequence block forward for the quantization pipeline's capture /
    Hessian / re-forward scans -> (out, captured-or-None)."""
    s = x.shape[1]
    cos, sin = rope_tables(cfg, jnp.arange(s)[None, :])
    out, _, cap = falcon_block(blk, x, cfg, cos, sin, _causal_mask(s), capture=capture)
    return out, cap


def _final(params: Dict, x: jax.Array, cfg: FalconConfig) -> jax.Array:
    x = layer_norm(x, params["final_ln"], params["final_ln_b"], cfg.layer_norm_eps)
    return apply_linear(params["lm_head"], x, x.dtype)


def falcon_forward(params: Dict, tokens: jax.Array, cfg: FalconConfig) -> jax.Array:
    """Plain full-sequence forward -> logits [B, S, V] (no cache; PPL eval)."""
    b, s = tokens.shape
    x = jnp.take(params["embed"], tokens, axis=0)
    cos, sin = rope_tables(cfg, jnp.arange(s)[None, :])
    mask = _causal_mask(s)

    def body(xc, blk):
        out, _, _ = falcon_block(blk, xc, cfg, cos, sin, mask)
        return out, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return _final(params, x, cfg)


def init_kv_cache(cfg: FalconConfig, batch: int, max_len: int, dtype=None):
    """Head-major static cache: [L, B, H_kv, S_max, Dh]."""
    dtype = dtype or cfg.dtype
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def falcon_forward_window(
    params: Dict, tokens: jax.Array, cache: Dict, pos: jax.Array, cfg: FalconConfig
):
    """Forward a WINDOW of tokens at offset ``pos`` through the cache."""
    b, w = tokens.shape
    max_len = cache["k"].shape[3]
    x = jnp.take(params["embed"], tokens, axis=0)
    cos, sin = rope_tables(cfg, pos + jnp.arange(w)[None, :])
    key_pos = jnp.arange(max_len)[None, None, None, :]
    query_pos = (pos + jnp.arange(w))[None, None, :, None]
    mask = jnp.where(key_pos <= query_pos, 0.0, -jnp.inf).astype(jnp.float32)

    def body(xc, inp):
        blk, kc, vc = inp
        out, (kc, vc), _ = falcon_block(
            blk, xc, cfg, cos, sin, mask, kv=(kc, vc), cache_pos=pos
        )
        return out, (kc, vc)

    x, (ks, vs) = jax.lax.scan(body, x, (params["layers"], cache["k"], cache["v"]))
    return _final(params, x, cfg), {"k": ks, "v": vs}


def falcon_prefill(params: Dict, tokens: jax.Array, cache: Dict, cfg: FalconConfig):
    return falcon_forward_window(params, tokens, cache, jnp.int32(0), cfg)


def falcon_decode_step(
    params: Dict, token: jax.Array, cache: Dict, pos: jax.Array, cfg: FalconConfig
):
    logits, cache = falcon_forward_window(params, token, cache, pos, cfg)
    return logits[:, 0, :], cache
