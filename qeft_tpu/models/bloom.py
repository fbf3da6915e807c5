"""Functional JAX BLOOM-family decoder (ALiBi attention, fused
query_key_value linear, LayerNorm, gelu MLP) with the full generation
surface: plain forward, prefill, windowed forward, and single-token decode
over the head-major static KV cache.

Covers the reference's bloom support (model_config.json:104-126; the
reference reuses HF's modeling_bloom).  Architecture notes:
- ALiBi position bias instead of positional embeddings: score bias
  slopes[h] * key_pos (HF convention; equivalent to -m*(q-k) per softmax
  row's shift invariance), so the KV cache needs no position bookkeeping
  beyond the causal mask.
- The fused qkv linear uses OUR contiguous [q | k | v] column layout, not
  HF's per-head interleave (an artifact of its megatron lineage; the layout
  is ours to choose, the HF loader would de-interleave once at load).
- Embedding is followed by a LayerNorm ("embed_ln", HF
  word_embeddings_layernorm).

Same conventions as models/llama.py.  Global (OGR) reorder is not supported
for bloom (reference parity: per-layer outliers only; quantize with
reorder=False).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qeft_tpu.ops.permute import apply_o_reorder
from qeft_tpu.models.llama import _attention, _causal_mask, apply_linear
from qeft_tpu.models.opt import layer_norm


@dataclasses.dataclass(frozen=True)
class BloomConfig:
    vocab_size: int = 250880
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    max_position_embeddings: int = 2048  # cache-sizing bound (ALiBi itself is unbounded)
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_kv_heads(self) -> int:
        return self.num_heads  # bloom is MHA

    @property
    def ffn_dim(self) -> int:
        return 4 * self.hidden_size


BLOOM_PRESETS: Dict[str, BloomConfig] = {
    "bloom-560m": BloomConfig(),
    "bloom-7b1": BloomConfig(hidden_size=4096, num_layers=30, num_heads=32),
    "bloom-tiny": BloomConfig(
        vocab_size=256, hidden_size=128, num_layers=2, num_heads=4,
        max_position_embeddings=128,
    ),
}


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Per-head ALiBi slopes (Press et al.; HF build_alibi_tensor)."""

    def pow2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        return np.asarray(pow2(n_heads), np.float32)
    closest = 2 ** math.floor(math.log2(n_heads))
    extra = pow2(2 * closest)[0::2][: n_heads - closest]
    return np.asarray(pow2(closest) + extra, np.float32)


def init_params(cfg: BloomConfig, key: jax.Array, dtype=None) -> Dict:
    dtype = dtype or cfg.dtype
    d, f = cfg.hidden_size, cfg.ffn_dim
    keys = jax.random.split(key, 8)

    def lin(k, kin, kout):
        return (jax.random.normal(k, (kin, kout), jnp.float32) * (kin**-0.5)).astype(dtype)

    def block(k):
        ks = jax.random.split(k, 4)
        return {
            "attn_ln": jnp.ones((d,), dtype),
            "attn_ln_b": jnp.zeros((d,), dtype),
            "post_ln": jnp.ones((d,), dtype),
            "post_ln_b": jnp.zeros((d,), dtype),
            "qkv": lin(ks[0], d, 3 * d),
            "qkv_b": jnp.zeros((3 * d,), dtype),
            "dense": lin(ks[1], d, d),
            "dense_b": jnp.zeros((d,), dtype),
            "fc1": lin(ks[2], d, f),
            "fc1_b": jnp.zeros((f,), dtype),
            "fc2": lin(ks[3], f, d),
            "fc2_b": jnp.zeros((d,), dtype),
        }

    blocks = [block(jax.random.fold_in(keys[0], i)) for i in range(cfg.num_layers)]
    return {
        "embed": (jax.random.normal(keys[1], (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype),
        "embed_ln": jnp.ones((d,), dtype),
        "embed_ln_b": jnp.zeros((d,), dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": jnp.ones((d,), dtype),
        "final_ln_b": jnp.zeros((d,), dtype),
        "lm_head": lin(keys[2], d, cfg.vocab_size),
    }


def _alibi_bias(cfg: BloomConfig, key_positions: jax.Array) -> jax.Array:
    """[1, H, 1, Sk] additive score bias: slopes[h] * key_pos."""
    slopes = jnp.asarray(alibi_slopes(cfg.num_heads))  # [H]
    return (slopes[:, None] * key_positions[None, :].astype(jnp.float32))[None, :, None, :]


def bloom_block(
    blk: Dict,
    x: jax.Array,
    cfg: BloomConfig,
    mask: Optional[jax.Array],  # causal + alibi, [B?, H, Sq, Sk]
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_pos: Optional[jax.Array] = None,
    capture: bool = False,
):
    """One BLOOM decoder block; same cache contract as llama_block."""
    b, s, d = x.shape
    h_, dh = cfg.num_heads, cfg.head_dim
    dtype = x.dtype

    hn = layer_norm(x, blk["attn_ln"], blk["attn_ln_b"], cfg.layer_norm_eps)
    qkv = apply_linear(blk["qkv"], hn, dtype) + blk["qkv_b"]
    q = qkv[..., :d].reshape(b, s, h_, dh)
    k = qkv[..., d : 2 * d].reshape(b, s, h_, dh)
    v = qkv[..., 2 * d :].reshape(b, s, h_, dh)
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

    ctx = _attention(q, k_all, v_all, mask, 1, dtype)
    o_in = apply_o_reorder(ctx, blk)
    x = x + apply_linear(blk["dense"], o_in, dtype) + blk["dense_b"]

    h2 = layer_norm(x, blk["post_ln"], blk["post_ln_b"], cfg.layer_norm_eps)
    h1 = jax.nn.gelu(
        (apply_linear(blk["fc1"], h2, dtype) + blk["fc1_b"]).astype(jnp.float32),
        approximate=True,
    ).astype(dtype)
    x = x + apply_linear(blk["fc2"], h1, dtype) + blk["fc2_b"]

    if capture:
        # stage inputs (model_config.json:104-126: [qkv], [dense], [fc1], [fc2])
        return x, new_kv, {"qkv_in": hn, "o_in": ctx, "ffn1_in": h2, "ffn2_in": h1}
    return x, new_kv, None


def pipeline_block_forward(blk: Dict, x: jax.Array, cfg: BloomConfig, capture: bool = False):
    """Full-sequence block forward for the quantization pipeline's capture /
    Hessian / re-forward scans -> (out, captured-or-None)."""
    s = x.shape[1]
    mask = _causal_mask(s) + _alibi_bias(cfg, jnp.arange(s))
    out, _, cap = bloom_block(blk, x, cfg, mask, capture=capture)
    return out, cap


def _final(params: Dict, x: jax.Array, cfg: BloomConfig) -> jax.Array:
    x = layer_norm(x, params["final_ln"], params["final_ln_b"], cfg.layer_norm_eps)
    return apply_linear(params["lm_head"], x, x.dtype)


def _embed_bloom(params: Dict, tokens: jax.Array, cfg: BloomConfig) -> jax.Array:
    x = jnp.take(params["embed"], tokens, axis=0)
    return layer_norm(x, params["embed_ln"], params["embed_ln_b"], cfg.layer_norm_eps)


def bloom_forward(params: Dict, tokens: jax.Array, cfg: BloomConfig) -> jax.Array:
    """Plain full-sequence forward -> logits [B, S, V] (no cache; PPL eval)."""
    b, s = tokens.shape
    x = _embed_bloom(params, tokens, cfg)
    mask = _causal_mask(s) + _alibi_bias(cfg, jnp.arange(s))

    def body(xc, blk):
        out, _, _ = bloom_block(blk, xc, cfg, mask)
        return out, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return _final(params, x, cfg)


def init_kv_cache(cfg: BloomConfig, batch: int, max_len: int, dtype=None):
    """Head-major static cache: [L, B, H, S_max, Dh]."""
    dtype = dtype or cfg.dtype
    shape = (cfg.num_layers, batch, cfg.num_heads, max_len, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def bloom_forward_window(
    params: Dict, tokens: jax.Array, cache: Dict, pos: jax.Array, cfg: BloomConfig
):
    """Forward a WINDOW of tokens at offset ``pos`` through the cache."""
    b, w = tokens.shape
    max_len = cache["k"].shape[3]
    x = _embed_bloom(params, tokens, cfg)
    key_pos = jnp.arange(max_len)
    query_pos = (pos + jnp.arange(w))[None, None, :, None]
    causal = jnp.where(
        key_pos[None, None, None, :] <= query_pos, 0.0, -jnp.inf
    ).astype(jnp.float32)
    mask = causal + _alibi_bias(cfg, key_pos)

    def body(xc, inp):
        blk, kc, vc = inp
        out, (kc, vc), _ = bloom_block(blk, xc, cfg, mask, kv=(kc, vc), cache_pos=pos)
        return out, (kc, vc)

    x, (ks, vs) = jax.lax.scan(body, x, (params["layers"], cache["k"], cache["v"]))
    return _final(params, x, cfg), {"k": ks, "v": vs}


def bloom_prefill(params: Dict, tokens: jax.Array, cache: Dict, cfg: BloomConfig):
    return bloom_forward_window(params, tokens, cache, jnp.int32(0), cfg)


def bloom_decode_step(
    params: Dict, token: jax.Array, cache: Dict, pos: jax.Array, cfg: BloomConfig
):
    logits, cache = bloom_forward_window(params, token, cache, pos, cfg)
    return logits[:, 0, :], cache
