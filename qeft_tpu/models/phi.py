"""Functional JAX Phi-family decoder (parallel attention+MLP residual,
partial rotary embedding, fc1/fc2 MLP, LayerNorm) with the full generation
surface: plain forward, prefill, windowed forward, and single-token decode
over the head-major static KV cache.

Covers the reference's phi support (model_config.json:78-103; the reference
reuses HF's modeling_phi).  Architecture notes:
- ONE LayerNorm per block ("input_ln"): attention and MLP both read ln(x)
  and both add into the residual (phi's parallel block).  The reference's
  ln_layers list for phi names a post_attention_layernorm that HF phi does
  not have; we model the real architecture.
- Partial rotary: RoPE applies to the first ``rotary_dim`` dims of each
  head; the remainder passes through.
- Biases on every linear (and the lm_head).

Same conventions as models/llama.py: dense linears are [K, N], per-layer
params stack on a leading axis and scan, packed linears are QLinearParams.
OGR reorder applies: LayerNorm is permutation-invariant in its stats, and
everything writing the residual (o/fc2 outputs + biases) permutes with it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from qeft_tpu.ops.permute import apply_o_reorder
from qeft_tpu.models.llama import _attention, _causal_mask, apply_linear
from qeft_tpu.models.opt import layer_norm


@dataclasses.dataclass(frozen=True)
class PhiConfig:
    vocab_size: int = 51200
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_layers: int = 24
    num_heads: int = 32
    num_kv_heads: int = 32
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    partial_rotary_factor: float = 0.5
    rope_theta: float = 10000.0
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def rotary_dim(self) -> int:
        # HF: int(partial_rotary_factor * head_dim), always even
        return int(self.partial_rotary_factor * self.head_dim)


PHI_PRESETS: Dict[str, PhiConfig] = {
    "phi-1.5": PhiConfig(),
    "phi-2": PhiConfig(hidden_size=2560, intermediate_size=10240, num_layers=32, partial_rotary_factor=0.4),
    "phi-tiny": PhiConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=4, num_kv_heads=4, max_position_embeddings=128,
    ),
}


def init_params(cfg: PhiConfig, key: jax.Array, dtype=None) -> Dict:
    dtype = dtype or cfg.dtype
    d, f = cfg.hidden_size, cfg.intermediate_size
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(key, 8)

    def lin(k, kin, kout):
        return (jax.random.normal(k, (kin, kout), jnp.float32) * (kin**-0.5)).astype(dtype)

    def block(k):
        ks = jax.random.split(k, 6)
        return {
            "input_ln": jnp.ones((d,), dtype),
            "input_ln_b": jnp.zeros((d,), dtype),
            "q": lin(ks[0], d, hq * dh),
            "q_b": jnp.zeros((hq * dh,), dtype),
            "k": lin(ks[1], d, hkv * dh),
            "k_b": jnp.zeros((hkv * dh,), dtype),
            "v": lin(ks[2], d, hkv * dh),
            "v_b": jnp.zeros((hkv * dh,), dtype),
            "o": lin(ks[3], hq * dh, d),
            "o_b": jnp.zeros((d,), dtype),
            "fc1": lin(ks[4], d, f),
            "fc1_b": jnp.zeros((f,), dtype),
            "fc2": lin(ks[5], f, d),
            "fc2_b": jnp.zeros((d,), dtype),
        }

    blocks = [block(jax.random.fold_in(keys[0], i)) for i in range(cfg.num_layers)]
    return {
        "embed": (jax.random.normal(keys[1], (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": jnp.ones((d,), dtype),
        "final_ln_b": jnp.zeros((d,), dtype),
        "lm_head": lin(keys[2], d, cfg.vocab_size),
        "lm_head_b": jnp.zeros((cfg.vocab_size,), dtype),
    }


def _rope_partial(x: jax.Array, cos: jax.Array, sin: jax.Array, rotary_dim: int) -> jax.Array:
    """RoPE on the first ``rotary_dim`` dims of each head; rest untouched.
    x: [B, S, H, Dh]; cos/sin: [B?, S, rotary_dim]."""
    xr, xp = x[..., :rotary_dim], x[..., rotary_dim:]
    half = rotary_dim // 2
    x1, x2 = xr[..., :half], xr[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[..., None, :].astype(x.dtype)
    s = sin[..., None, :].astype(x.dtype)
    return jnp.concatenate([xr * c + rotated * s, xp], axis=-1)


def phi_rope_tables(cfg: PhiConfig, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    rd = cfg.rotary_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def phi_block(
    blk: Dict,
    x: jax.Array,
    cfg: PhiConfig,
    cos: jax.Array,
    sin: jax.Array,
    mask: Optional[jax.Array],
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_pos: Optional[jax.Array] = None,
    capture: bool = False,
):
    """One PARALLEL decoder block: x + attn(ln(x)) + mlp(ln(x)); same cache
    contract as llama_block (head-major [B, H_kv, S_max, Dh] caches)."""
    b, s, d = x.shape
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    dtype = x.dtype

    h = layer_norm(x, blk["input_ln"], blk["input_ln_b"], cfg.layer_norm_eps)

    q = (apply_linear(blk["q"], h, dtype) + blk["q_b"]).reshape(b, s, hq, dh)
    k = (apply_linear(blk["k"], h, dtype) + blk["k_b"]).reshape(b, s, hkv, dh)
    v = (apply_linear(blk["v"], h, dtype) + blk["v_b"]).reshape(b, s, hkv, dh)
    q = _rope_partial(q, cos, sin, cfg.rotary_dim)
    k = _rope_partial(k, cos, sin, cfg.rotary_dim)
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
    attn_out = apply_linear(blk["o"], o_in, dtype) + blk["o_b"]

    # MLP reads the SAME normalized input (parallel block)
    h1 = jax.nn.gelu(
        (apply_linear(blk["fc1"], h, dtype) + blk["fc1_b"]).astype(jnp.float32),
        approximate=True,
    ).astype(dtype)
    mlp_out = apply_linear(blk["fc2"], h1, dtype) + blk["fc2_b"]

    x = x + attn_out + mlp_out
    if capture:
        # stage inputs (model_config.json:78-103: [qkv], [dense], [fc1],
        # [fc2]); qkv and fc1 share the parallel block's normalized input
        return x, new_kv, {"qkv_in": h, "o_in": ctx, "ffn1_in": h, "ffn2_in": h1}
    return x, new_kv, None


def pipeline_block_forward(blk: Dict, x: jax.Array, cfg: PhiConfig, capture: bool = False):
    """Full-sequence block forward for the quantization pipeline's capture /
    Hessian / re-forward scans -> (out, captured-or-None)."""
    s = x.shape[1]
    cos, sin = phi_rope_tables(cfg, jnp.arange(s)[None, :])
    out, _, cap = phi_block(blk, x, cfg, cos, sin, _causal_mask(s), capture=capture)
    return out, cap


def _final(params: Dict, x: jax.Array, cfg: PhiConfig) -> jax.Array:
    x = layer_norm(x, params["final_ln"], params["final_ln_b"], cfg.layer_norm_eps)
    return apply_linear(params["lm_head"], x, x.dtype) + params["lm_head_b"]


def phi_forward(params: Dict, tokens: jax.Array, cfg: PhiConfig) -> jax.Array:
    """Plain full-sequence forward -> logits [B, S, V] (no cache; PPL eval)."""
    b, s = tokens.shape
    x = jnp.take(params["embed"], tokens, axis=0)
    cos, sin = phi_rope_tables(cfg, jnp.arange(s)[None, :])
    mask = _causal_mask(s)

    def body(xc, blk):
        out, _, _ = phi_block(blk, xc, cfg, cos, sin, mask)
        return out, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return _final(params, x, cfg)


def init_kv_cache(cfg: PhiConfig, batch: int, max_len: int, dtype=None):
    """Head-major static cache: [L, B, H_kv, S_max, Dh]."""
    dtype = dtype or cfg.dtype
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def phi_forward_window(
    params: Dict, tokens: jax.Array, cache: Dict, pos: jax.Array, cfg: PhiConfig
):
    """Forward a WINDOW of tokens at offset ``pos`` through the cache."""
    b, w = tokens.shape
    max_len = cache["k"].shape[3]
    x = jnp.take(params["embed"], tokens, axis=0)
    cos, sin = phi_rope_tables(cfg, pos + jnp.arange(w)[None, :])
    key_pos = jnp.arange(max_len)[None, None, None, :]
    query_pos = (pos + jnp.arange(w))[None, None, :, None]
    mask = jnp.where(key_pos <= query_pos, 0.0, -jnp.inf).astype(jnp.float32)

    def body(xc, inp):
        blk, kc, vc = inp
        out, (kc, vc), _ = phi_block(
            blk, xc, cfg, cos, sin, mask, kv=(kc, vc), cache_pos=pos
        )
        return out, (kc, vc)

    x, (ks, vs) = jax.lax.scan(body, x, (params["layers"], cache["k"], cache["v"]))
    return _final(params, x, cfg), {"k": ks, "v": vs}


def phi_prefill(params: Dict, tokens: jax.Array, cache: Dict, cfg: PhiConfig):
    return phi_forward_window(params, tokens, cache, jnp.int32(0), cfg)


def phi_decode_step(
    params: Dict, token: jax.Array, cache: Dict, pos: jax.Array, cfg: PhiConfig
):
    logits, cache = phi_forward_window(params, token, cache, pos, cfg)
    return logits[:, 0, :], cache
