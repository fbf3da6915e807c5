"""Functional JAX Llama-family decoder (covers Llama/Llama-2/vicuna-style
models, GQA included).

This is OUR transformer — the reference borrows HuggingFace's and surgically
patches it (/root/reference/qeft/monkeypatch/ftllama_modeling.py); we instead
own the forward, so quantization capture, reordering, packed execution, and
sharding are plain function composition over a parameter pytree.

Layout conventions:
- dense linear weights are ``[K, N]`` (in-features first): ``y = x @ w``;
  packed linears are `QLinearParams` (see ops/packing.py) — both dispatch
  through `apply_linear`.
- per-layer params are stacked on a leading axis and scanned
  (`lax.scan` over blocks — one compiled block body regardless of depth).
- the KV cache is static-shape **head-major** ``[L, B, H_kv, S_max, Dh]``;
  decode writes at a runtime position (the reference's FT static cache,
  ftllama_modeling.py:60-67, without the CUDA x8 packing which is meaningless
  on TPU).  Head-major keeps every attention contraction a direct batched
  matmul (no transposes in the decode hot path) and gives the Pallas decode
  kernel contiguous [S, Dh] tiles per head.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from qeft_tpu.ops.packing import QLinearParams, StackedLinear
from qeft_tpu.ops.permute import apply_o_reorder
from qeft_tpu.ops.qlinear import qlinear_apply, qlinear_fused_stage


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    dtype: Any = jnp.bfloat16
    # family variants (gemma: reference model_config.json:52-77 treats gemma
    # as llama-topology; these switches cover its numerics)
    act: str = "silu"  # "silu" | "gelu_tanh"
    rms_one_offset: bool = False  # gemma: norm scale is (1 + w)
    embed_scale: bool = False  # gemma: embeddings scaled by sqrt(hidden)


LLAMA_PRESETS: Dict[str, LlamaConfig] = {
    "llama2-7b": LlamaConfig(),
    "llama2-13b": LlamaConfig(
        hidden_size=5120, intermediate_size=13824, num_layers=40, num_heads=40,
        num_kv_heads=40,
    ),
    "llama2-70b": LlamaConfig(
        hidden_size=8192, intermediate_size=28672, num_layers=80, num_heads=64,
        num_kv_heads=8,
    ),
    "llama3-8b": LlamaConfig(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8,
        max_position_embeddings=8192, rope_theta=500000.0,
    ),
    "llama3-70b": LlamaConfig(
        vocab_size=128256, hidden_size=8192, intermediate_size=28672,
        num_layers=80, num_heads=64, num_kv_heads=8,
        max_position_embeddings=8192, rope_theta=500000.0,
    ),
    "tiny": LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=64, max_position_embeddings=256,
    ),
    "tiny-v2": LlamaConfig(
        vocab_size=512, hidden_size=512, intermediate_size=1024, num_layers=4,
        num_heads=4, num_kv_heads=4, head_dim=128, max_position_embeddings=512,
    ),
    "gemma-2b": LlamaConfig(
        vocab_size=256000, hidden_size=2048, intermediate_size=16384,
        num_layers=18, num_heads=8, num_kv_heads=1, head_dim=256,
        max_position_embeddings=8192, rms_norm_eps=1e-6,
        act="gelu_tanh", rms_one_offset=True, embed_scale=True,
    ),
    "gemma-7b": LlamaConfig(
        vocab_size=256000, hidden_size=3072, intermediate_size=24576,
        num_layers=28, num_heads=16, num_kv_heads=16, head_dim=256,
        max_position_embeddings=8192, rms_norm_eps=1e-6,
        act="gelu_tanh", rms_one_offset=True, embed_scale=True,
    ),
    "tiny-gemma": LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=64, max_position_embeddings=256,
        act="gelu_tanh", rms_one_offset=True, embed_scale=True,
    ),
}


# ---------------------------------------------------------------------------
# params


def init_params(cfg: LlamaConfig, key: jax.Array, dtype=None) -> Dict:
    """Random-init parameter pytree (shape-faithful; used for tests/benchmarks
    when real checkpoints are unavailable)."""
    dtype = dtype or cfg.dtype
    d, f = cfg.hidden_size, cfg.intermediate_size
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(key, 10)

    def lin(k, kin, kout):
        return (jax.random.normal(k, (kin, kout), jnp.float32) * (kin**-0.5)).astype(dtype)

    def stack(fn):
        outs = [fn(jax.random.fold_in(keys[0], i)) for i in range(cfg.num_layers)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    def block(k):
        ks = jax.random.split(k, 7)
        return {
            "input_ln": jnp.ones((d,), dtype),
            "post_ln": jnp.ones((d,), dtype),
            "q": lin(ks[0], d, hq * dh),
            "k": lin(ks[1], d, hkv * dh),
            "v": lin(ks[2], d, hkv * dh),
            "o": lin(ks[3], hq * dh, d),
            "up": lin(ks[4], d, f),
            "gate": lin(ks[5], d, f),
            "down": lin(ks[6], f, d),
        }

    return {
        "embed": (jax.random.normal(keys[1], (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype),
        "layers": stack(block),
        "final_ln": jnp.ones((d,), dtype),
        "lm_head": lin(keys[2], d, cfg.vocab_size),
    }


# ---------------------------------------------------------------------------
# primitives


def _pallas_attn_enabled(s_max: int) -> bool:
    """Default: ON for large caches on TPU, where the length-aware DMA
    clamping beats XLA's full-cache masked attention (on-chip A/B,
    BASELINE.md round 2: 35.2 vs 33.1 tok/s at a 4096-slot cache); at small
    caches XLA is ~1% ahead, so we keep it.  QEFT_PALLAS_ATTN=1/0 forces."""
    import os

    v = os.environ.get("QEFT_PALLAS_ATTN")
    if v is not None:
        return v not in ("0", "false", "off")
    return jax.default_backend() == "tpu" and s_max >= 1024


def apply_linear(lin, x: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    if isinstance(lin, QLinearParams):
        return qlinear_apply(x, lin, dtype=dtype)
    if isinstance(lin, StackedLinear):
        from qeft_tpu.ops.qlinear import qlinear_apply_stacked

        return qlinear_apply_stacked(x, lin, dtype=dtype)
    return jnp.matmul(x.astype(lin.dtype), lin)


# trace-time override of the flash gate (set by llama_forward_train: the
# flash pallas_call has no JVP rule, so DIFFERENTIATED forwards must take
# the XLA attention — the reference trains through eager HF attention too)
_FLASH_ATTN_OVERRIDE = None


def _flash_attn_enabled() -> bool:
    """Flash/blockwise prefill+window attention (ops/pallas_flash.py):
    default ON on TPU, where it avoids materializing the [Sq, Sk] fp32 score
    tensor (~2.1 GB at 4096-ctx 7B) and reads only the valid cache prefix;
    off on CPU (interpret-mode kernels are for opt-in tests).
    QEFT_FLASH_ATTN=1/0 forces."""
    if _FLASH_ATTN_OVERRIDE is not None:
        return _FLASH_ATTN_OVERRIDE
    v = os.environ.get("QEFT_FLASH_ATTN")
    if v is not None:
        return v not in ("0", "false", "off")
    return jax.default_backend() == "tpu"


def _fused_decode_enabled() -> bool:
    """Stage-fused decode blocks run norm + packed matvec + outlier GEMM +
    residual as ONE pallas_call per stage (qlinear_fused_stage).  Default ON
    since the kernel computes its norm/group-sum prologue once into VMEM
    scratch instead of per n-tile: on-chip A/B (real 7B ckpt, session 8)
    106.66 tok/s fused vs 104.18 composed.  (The first fused kernel
    recomputed the prologue per tile and LOST 90.7 vs 95.2 — see
    _qmm_kernel_stacked_fused.)  QEFT_FUSED_DECODE=0 restores the composed
    norm -> kernel -> outlier-GEMM -> add chain."""
    return os.environ.get("QEFT_FUSED_DECODE", "1") not in ("0", "", "false")


def _fused_stage_blk(blk: Dict) -> bool:
    return all(isinstance(blk.get(n), StackedLinear)
               for n in ("qkv", "o", "upgate", "down"))


def _stacked_gemv_enabled() -> bool:
    """Default ON: the decode-shaped forwards view packed weights through
    StackedLinear instead of letting lax.scan slice each layer's planes (the
    slice materializes a copy — scripts/scan_copy_probe.py: 219 GB/s scanned
    vs 245 GB/s stacked-kernel on the 7B matvec chain; on-chip A/B: 75.9 vs
    63.0 tok/s @512 slots, chip session 6).  QEFT_STACKED_GEMV=0 restores the
    scan-sliced path."""
    return os.environ.get("QEFT_STACKED_GEMV", "1") not in ("0", "", "false")


def _layer_xs(params: Dict, cache: Dict):
    """(xs, blk_of) for the layer scan.

    Default: scan slices (layers, cache) leaves per iteration.  Stacked mode:
    only the cache and an index ride as xs; packed-weight leaves stay whole
    (closed over) and blk_of builds per-layer views — StackedLinear for
    QLinearParams, a normal slice for small array leaves (norms, o_reorder)."""
    layers = params["layers"]
    if not _stacked_gemv_enabled():
        return (layers, cache), lambda blk, c: blk
    n_layers = jax.tree.leaves(layers)[0].shape[0]

    def blk_of(l, c):
        return {
            name: leaf.layer_view(l) if isinstance(leaf, QLinearParams)
            else leaf[l]
            for name, leaf in layers.items()
        }

    return (jnp.arange(n_layers), cache), blk_of


def rms_norm(x: jax.Array, w: jax.Array, eps: float, one_offset: bool = False) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * (1.0 + w) if one_offset else normed * w


def rope_tables(cfg: LlamaConfig, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables [..., Dh] for the given positions."""
    dh = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., Dh/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half RoPE. x: [B, S, H, Dh]; cos/sin: [B?, S, Dh]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[..., None, :].astype(x.dtype)
    s = sin[..., None, :].astype(x.dtype)
    return x * c + rotated * s


def _act(gate: jax.Array, act: str) -> jax.Array:
    if act == "gelu_tanh":
        return jax.nn.gelu(gate, approximate=True)
    return jax.nn.silu(gate)


def _split_upgate(ug: jax.Array, cfg: LlamaConfig):
    """(up, gate) from a fused [up | gate] projection output.  Each half may
    be N-padded to the decode tile multiple (pipeline.pad_upgate_halves packs
    [up | 0pad | gate | 0pad] so bn=1024 applies to the 7B upgate); the pad
    columns are exactly zero and dropped here by static slices."""
    f_pad = ug.shape[-1] // 2
    f = min(cfg.intermediate_size, f_pad)
    return ug[..., :f], ug[..., f_pad : f_pad + f]


def _embed(params, tokens, cfg) -> jax.Array:
    x = jnp.take(params["embed"], tokens, axis=0)
    if cfg.embed_scale:
        x = x * jnp.asarray(cfg.hidden_size**0.5, x.dtype)
    return x


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    if n_rep == 1:
        return x
    return jnp.repeat(x, n_rep, axis=1)  # [B, H_kv, S, Dh] -> [B, H, S, Dh]


def _attention(
    q: jax.Array,  # [B, Sq, H, Dh]
    k_all: jax.Array,  # [B, H_kv, Sk, Dh] (head-major)
    v_all: jax.Array,  # [B, H_kv, Sk, Dh]
    mask: Optional[jax.Array],
    n_rep: int,
    dtype,
) -> jax.Array:
    """Masked softmax attention; returns ctx [B, Sq, H*Dh]."""
    b, sq, h, dh = q.shape
    qh = q.transpose(0, 2, 1, 3)  # [B, H, Sq, Dh]
    k_rep = _repeat_kv(k_all, n_rep)
    v_rep = _repeat_kv(v_all, n_rep)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, k_rep).astype(jnp.float32)
    scores = scores * (dh**-0.5)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v_rep)
    return ctx.transpose(0, 2, 1, 3).reshape(b, sq, h * dh)


# ---------------------------------------------------------------------------
# decoder block


def llama_block(
    blk: Dict,
    x: jax.Array,
    cfg: LlamaConfig,
    cos: jax.Array,
    sin: jax.Array,
    mask: Optional[jax.Array],
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_pos: Optional[jax.Array] = None,
    capture: bool = False,
    kv_out: str = "slab",
):
    """One decoder block.

    ``kv``: (k_cache, v_cache) each [B, H_kv, S_max, Dh] head-major; when
    given, this block's K/V are written at ``cache_pos`` and attention runs
    over the cache.  Returns (x_out, new_kv, captured-intermediates-or-None).

    ``kv_out="token"`` returns just this call's new K/V slices ([B, H_kv, S,
    Dh], plus scale slices for int8 caches) instead of the updated slabs:
    when the layer loop is a scan, stacking full slabs as ys re-WRITES the
    entire cache every step (~2.1 GB/step at 4096 slots — the dominant
    long-context cost in the session-5 decomposition); the caller instead
    issues ONE whole-cache token write after the scan.
    """
    b, s, d = x.shape
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    dtype = x.dtype

    fused = _fused_decode_enabled() and not capture and _fused_stage_blk(blk)
    if fused:
        # norm + packed matvec + outlier GEMM in one pallas_call per stage
        h = None
        qkv = qlinear_fused_stage(
            x, blk["qkv"], lnw=blk["input_ln"], eps=cfg.rms_norm_eps,
            one_offset=cfg.rms_one_offset, dtype=dtype,
        )
        q = qkv[..., : hq * dh].reshape(b, s, hq, dh)
        k = qkv[..., hq * dh : (hq + hkv) * dh].reshape(b, s, hkv, dh)
        v = qkv[..., (hq + hkv) * dh :].reshape(b, s, hkv, dh)
    else:
        h = rms_norm(x, blk["input_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
        if "qkv" in blk:
            # stage-fused packed projection (valid because OGR gives every
            # member of the qkv stage the same input permutation and layout)
            qkv = apply_linear(blk["qkv"], h, dtype)
            q = qkv[..., : hq * dh].reshape(b, s, hq, dh)
            k = qkv[..., hq * dh : (hq + hkv) * dh].reshape(b, s, hkv, dh)
            v = qkv[..., (hq + hkv) * dh :].reshape(b, s, hkv, dh)
        else:
            q = apply_linear(blk["q"], h, dtype).reshape(b, s, hq, dh)
            k = apply_linear(blk["k"], h, dtype).reshape(b, s, hkv, dh)
            v = apply_linear(blk["v"], h, dtype).reshape(b, s, hkv, dh)

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    kh = k.transpose(0, 2, 1, 3)  # [B, H_kv, S, Dh] head-major
    vh = v.transpose(0, 2, 1, 3)

    if kv is not None and len(kv) == 4:
        # int8 cache: quantize the new vectors, store codes + scales,
        # dequantize the whole cache for attention (XLA fuses the dequant
        # into the attention dots' operand reads)
        k_cache, v_cache, ks_c, vs_c = kv
        kq, ksn = _kv_quantize(kh)
        vq, vsn = _kv_quantize(vh)
        k_cache = jax.lax.dynamic_update_slice(k_cache, kq, (0, 0, cache_pos, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, vq, (0, 0, cache_pos, 0))
        ks_c = jax.lax.dynamic_update_slice(ks_c, ksn, (0, 0, cache_pos))
        vs_c = jax.lax.dynamic_update_slice(vs_c, vsn, (0, 0, cache_pos))
        k_all = _kv_dequantize(k_cache, ks_c, dtype)
        v_all = _kv_dequantize(v_cache, vs_c, dtype)
        new_kv = (kq, vq, ksn, vsn) if kv_out == "token" else (
            k_cache, v_cache, ks_c, vs_c
        )
    elif kv is not None:
        k_cache, v_cache = kv
        kh_c, vh_c = kh.astype(k_cache.dtype), vh.astype(v_cache.dtype)
        k_cache = jax.lax.dynamic_update_slice(k_cache, kh_c, (0, 0, cache_pos, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, vh_c, (0, 0, cache_pos, 0))
        k_all, v_all = k_cache.astype(dtype), v_cache.astype(dtype)
        new_kv = (kh_c, vh_c) if kv_out == "token" else (k_cache, v_cache)
    else:
        k_all, v_all = kh, vh
        new_kv = None

    if s == 1 and kv is not None and _pallas_attn_enabled(k_all.shape[2]):
        # single-token decode: length-aware Pallas attention reads only the
        # valid cache prefix (FT single_query_attention equivalent)
        from qeft_tpu.ops.pallas_attention import decode_attention

        if len(kv) == 4 and k_cache.shape[2] % 128 == 0:
            # int8 cache codes stream directly (half the bytes); the bf16
            # k_all/v_all dequant above is dead code XLA eliminates.
            # Misaligned caches (init_kv_cache rounds up, so only hand-built
            # ones) fall through to XLA attention over the dequant.
            ctx = decode_attention(
                q[:, 0], k_cache, v_cache, cache_pos, k_scale=ks_c, v_scale=vs_c
            )
        elif len(kv) == 4:  # misaligned int8 cache: XLA over the dequant
            ctx = _attention(q, k_all, v_all, mask, hq // hkv, dtype)
        else:
            ctx = decode_attention(q[:, 0], k_all, v_all, cache_pos)
        ctx = ctx.reshape(b, 1, hq * dh)
    elif s > 1 and _flash_attn_enabled():
        # every llama_block caller passes the causal-window mask (query i at
        # absolute pos cache_pos+i attends keys <= cache_pos+i), which is
        # exactly the flash kernel's in-kernel mask — scores never materialize
        from qeft_tpu.ops.pallas_flash import flash_window_attention

        pos0 = cache_pos if cache_pos is not None else jnp.int32(0)
        ctx = flash_window_attention(q, k_all, v_all, pos0)
    else:
        ctx = _attention(q, k_all, v_all, mask, hq // hkv, dtype)

    # OGR: o_proj's input is in head order and cannot be statically permuted;
    # reordered models carry a per-block gather (reference qlinear.py:273-275)
    o_in = apply_o_reorder(ctx, blk)
    if fused:
        x = qlinear_fused_stage(o_in, blk["o"], residual=x, dtype=dtype)
        ug = qlinear_fused_stage(
            x, blk["upgate"], lnw=blk["post_ln"], eps=cfg.rms_norm_eps,
            one_offset=cfg.rms_one_offset, dtype=dtype,
        )
        up, gate = _split_upgate(ug, cfg)
        act = _act(gate, cfg.act) * up
        h2 = None
        x = qlinear_fused_stage(act, blk["down"], residual=x, dtype=dtype)
    else:
        attn_out = apply_linear(blk["o"], o_in, dtype)
        x = x + attn_out

        h2 = rms_norm(x, blk["post_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
        if "upgate" in blk:
            ug = apply_linear(blk["upgate"], h2, dtype)
            up, gate = _split_upgate(ug, cfg)
        else:
            up = apply_linear(blk["up"], h2, dtype)
            gate = apply_linear(blk["gate"], h2, dtype)
        act = _act(gate, cfg.act) * up
        mlp_out = apply_linear(blk["down"], act, dtype)
        x = x + mlp_out

    captured = None
    if capture:
        # inputs to the four sequential quantization stages
        # (reference main.py:107-128 captures these via forward hooks)
        captured = {"qkv_in": h, "o_in": ctx, "ffn1_in": h2, "ffn2_in": act}
    return x, new_kv, captured


# ---------------------------------------------------------------------------
# full model


def _causal_mask(s: int, dtype=jnp.float32) -> jax.Array:
    mask = jnp.triu(jnp.full((s, s), -jnp.inf, dtype), k=1)
    return mask[None, None, :, :]


def llama_forward(params: Dict, tokens: jax.Array, cfg: LlamaConfig) -> jax.Array:
    """Plain full-sequence forward -> logits [B, S, V] (no cache; PPL eval)."""
    b, s = tokens.shape
    x = _embed(params, tokens, cfg)
    pos = jnp.arange(s)[None, :]
    cos, sin = rope_tables(cfg, pos)
    mask = _causal_mask(s)

    def body(xc, blk):
        out, _, _ = llama_block(blk, xc, cfg, cos, sin, mask)
        return out, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
    return apply_linear(params["lm_head"], x, x.dtype)


def init_kv_cache(
    cfg: LlamaConfig, batch: int, max_len: int, dtype=None, quantized: bool = False
):
    """Head-major static cache: [L, B, H_kv, S_max, Dh].

    ``quantized=True`` stores int8 codes + per-(layer,batch,head,position)
    fp32 scales — halves the KV bytes streamed per decode step vs bf16, which
    dominates HBM traffic at long contexts (BASELINE.md: the 4096-slot cache
    costs ~2.1 GB/token at 7B).  A capability beyond the reference (its FT
    cache is fp16-only, ftllama_modeling.py:60-67).  QEFT_KV_DTYPE=int8 turns
    it on by default.
    """
    import os

    dtype = dtype or cfg.dtype
    if os.environ.get("QEFT_KV_DTYPE", "").lower() == "int8":
        quantized = True
    if quantized:
        # the int8 attention kernel's scale planes put S on the LANE dim, so
        # S must be 128-aligned; extra slots are never attended (mask <= pos)
        max_len = (max_len + 127) // 128 * 128
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    if quantized:
        sshape = shape[:-1]
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(sshape, jnp.float32),
            "v_scale": jnp.zeros(sshape, jnp.float32),
        }
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def cache_quantized(cache: Dict) -> bool:
    return "k_scale" in cache


def _kv_of(c: Dict):
    """Per-layer cache-slice dict -> the kv tuple llama_block consumes."""
    if "k_scale" in c:
        return (c["k"], c["v"], c["k_scale"], c["v_scale"])
    return (c["k"], c["v"])


def _kv_dict(new_kv) -> Dict:
    if len(new_kv) == 4:
        return {"k": new_kv[0], "v": new_kv[1],
                "k_scale": new_kv[2], "v_scale": new_kv[3]}
    return {"k": new_kv[0], "v": new_kv[1]}


def cache_max_len(cache: Dict) -> int:
    return cache["k"].shape[3]


def _cache_token_write(cache: Dict, tok: Dict, pos) -> Dict:
    """ONE whole-cache write of the layer scan's stacked token K/V slices
    (ys [L, B, H_kv, W, Dh]) at scalar offset ``pos``.

    The scan bodies attend over locally-updated slab copies and emit only
    the new tokens' K/V; stacking full slabs as ys would re-write the entire
    cache every decode step (session-5 decomposition: ~2.1 GB/step at 4096
    slots)."""
    out = {}
    for name, leaf in cache.items():
        n = tok[name].astype(leaf.dtype)
        start = (0, 0, 0, pos, 0)[: leaf.ndim]
        out[name] = jax.lax.dynamic_update_slice(leaf, n, start)
    return out


def _cache_token_write_ragged(cache: Dict, tok: Dict, pos: jax.Array) -> Dict:
    """Per-sequence variant: sequence b's window lands at pos[b]."""
    def one(c, n, p):  # c: [L, H_kv, S, (Dh)]; n: [L, H_kv, W, (Dh)]
        return jax.lax.dynamic_update_slice(c, n, (0, 0, p, 0)[: c.ndim])

    return {
        name: jax.vmap(one, in_axes=(1, 1, 0), out_axes=1)(
            cache[name], tok[name].astype(cache[name].dtype), pos
        )
        for name in cache
    }


def _kv_quantize(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[..., S, Dh] -> (int8 codes, fp32 per-vector scales [..., S])."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    codes = jnp.round(xf / scale[..., None]).astype(jnp.int8)
    return codes, scale


def _kv_dequantize(codes: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    return (codes.astype(jnp.float32) * scale[..., None]).astype(dtype)


def llama_prefill(params: Dict, tokens: jax.Array, cache: Dict, cfg: LlamaConfig):
    """Prefill: fills cache[..., :S, :], returns (logits [B, S, V], cache)."""
    b, s = tokens.shape
    max_len = cache_max_len(cache)
    x = _embed(params, tokens, cfg)
    pos = jnp.arange(s)[None, :]
    cos, sin = rope_tables(cfg, pos)
    mask = jnp.concatenate(
        [_causal_mask(s), jnp.full((1, 1, s, max_len - s), -jnp.inf)], axis=-1
    )

    def body(xc, inp):
        blk, c = inp
        out, new_kv, _ = llama_block(
            blk, xc, cfg, cos, sin, mask, kv=_kv_of(c), cache_pos=jnp.int32(0),
            kv_out="token",
        )
        return out, _kv_dict(new_kv)

    x, tok = jax.lax.scan(body, x, (params["layers"], cache))
    new_cache = _cache_token_write(cache, tok, 0)
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
    logits = apply_linear(params["lm_head"], x, x.dtype)
    return logits, new_cache


def llama_forward_window(
    params: Dict, tokens: jax.Array, cache: Dict, pos: jax.Array, cfg: LlamaConfig
):
    """Forward a WINDOW of tokens at offset ``pos`` through the cache.

    tokens: [B, W]; query i sits at absolute position pos+i and attends cache
    entries <= pos+i.  Generalizes prefill (pos=0) and single-token decode
    (W=1); the speculative-decoding verify pass uses W=gamma+1.
    Returns (logits [B, W, V], new cache).
    """
    b, w = tokens.shape
    max_len = cache_max_len(cache)
    x = _embed(params, tokens, cfg)
    positions = pos + jnp.arange(w)[None, :]
    cos, sin = rope_tables(cfg, positions)
    key_pos = jnp.arange(max_len)[None, None, None, :]
    query_pos = (pos + jnp.arange(w))[None, None, :, None]
    mask = jnp.where(key_pos <= query_pos, 0.0, -jnp.inf).astype(jnp.float32)

    xs, blk_of = _layer_xs(params, cache)

    def body(xc, inp):
        first, c = inp
        out, new_kv, _ = llama_block(
            blk_of(first, c), xc, cfg, cos, sin, mask, kv=_kv_of(c),
            cache_pos=pos, kv_out="token",
        )
        return out, _kv_dict(new_kv)

    x, tok = jax.lax.scan(body, x, xs)
    new_cache = _cache_token_write(cache, tok, pos)
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
    logits = apply_linear(params["lm_head"], x, x.dtype)
    return logits, new_cache


def llama_forward_window_ragged(
    params: Dict, tokens: jax.Array, cache: Dict, pos: jax.Array, cfg: LlamaConfig
):
    """Forward a window of W tokens per sequence at PER-SEQUENCE offsets.

    tokens: [B, W]; pos: [B] int32 — sequence b's window starts at absolute
    position pos[b]: its KV slab is written at [pos[b], pos[b]+W) and query i
    attends cache entries <= pos[b]+i.  W=1 is the continuous-batching decode
    primitive; W=gamma+1 is the batched speculative verify pass.  Returns
    (logits [B, W, V], new cache).
    """
    b, w = tokens.shape
    max_len = cache_max_len(cache)
    x = _embed(params, tokens, cfg)  # [B, W, D]
    positions = pos[:, None] + jnp.arange(w)[None, :]  # [B, W]
    cos, sin = rope_tables(cfg, positions)  # [B, W, Dh]
    key_pos = jnp.arange(max_len)[None, None, None, :]
    query_pos = positions[:, None, :, None]  # [B, 1, W, 1]
    mask = jnp.where(key_pos <= query_pos, 0.0, -jnp.inf).astype(jnp.float32)

    def write_at(cache_l, new):
        # per-sequence scatter: vmap a length-W dynamic update over the batch
        # cache_l: [B, H_kv, S, Dh], new [B, H_kv, W, Dh] — or the per-vector
        # scale planes [B, H_kv, S] / [B, H_kv, W]
        def one(c, n, p):
            return jax.lax.dynamic_update_slice(c, n, (0, p, 0)[: c.ndim])

        return jax.vmap(one)(cache_l, new, pos)

    xs, blk_of = _layer_xs(params, cache)

    def body(xc, inp):
        first, c = inp
        blk = blk_of(first, c)
        kc, vc = c["k"], c["v"]
        # inline block with ragged cache write
        hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        dtype = xc.dtype
        h = rms_norm(xc, blk["input_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
        if "qkv" in blk:
            qkv = apply_linear(blk["qkv"], h, dtype)
            q = qkv[..., : hq * dh].reshape(b, w, hq, dh)
            k = qkv[..., hq * dh : (hq + hkv) * dh].reshape(b, w, hkv, dh)
            v = qkv[..., (hq + hkv) * dh :].reshape(b, w, hkv, dh)
        else:
            q = apply_linear(blk["q"], h, dtype).reshape(b, w, hq, dh)
            k = apply_linear(blk["k"], h, dtype).reshape(b, w, hkv, dh)
            v = apply_linear(blk["v"], h, dtype).reshape(b, w, hkv, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kh, vh = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
        if "k_scale" in c:
            kq, ksn = _kv_quantize(kh)
            vq, vsn = _kv_quantize(vh)
            kc, vc = write_at(kc, kq), write_at(vc, vq)
            ksc = write_at(c["k_scale"], ksn)
            vsc = write_at(c["v_scale"], vsn)
            k_read = _kv_dequantize(kc, ksc, dtype)
            v_read = _kv_dequantize(vc, vsc, dtype)
            # ys carry only this call's token K/V (see _cache_token_write)
            new_c = {"k": kq, "v": vq, "k_scale": ksn, "v_scale": vsn}
        else:
            kh_c, vh_c = kh.astype(kc.dtype), vh.astype(vc.dtype)
            kc, vc = write_at(kc, kh_c), write_at(vc, vh_c)
            k_read, v_read = kc.astype(dtype), vc.astype(dtype)
            new_c = {"k": kh_c, "v": vh_c}
        if _flash_attn_enabled():
            # flash for EVERY ragged window width (W=1 decode and W=gamma+1
            # spec verify included): per-row results are width-invariant, so
            # greedy self-draft verification is bit-exact (VERDICT weak #5)
            from qeft_tpu.ops.pallas_flash import flash_window_attention

            ctx = flash_window_attention(q, k_read, v_read, pos)
        else:
            ctx = _attention(q, k_read, v_read, mask, hq // hkv, dtype)
        o_in = apply_o_reorder(ctx, blk)
        xc = xc + apply_linear(blk["o"], o_in, dtype)
        h2 = rms_norm(xc, blk["post_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
        if "upgate" in blk:
            ug = apply_linear(blk["upgate"], h2, dtype)
            up, gate = _split_upgate(ug, cfg)
        else:
            up = apply_linear(blk["up"], h2, dtype)
            gate = apply_linear(blk["gate"], h2, dtype)
        xc = xc + apply_linear(blk["down"], _act(gate, cfg.act) * up, dtype)
        return xc, new_c

    x, tok = jax.lax.scan(body, x, xs)
    new_cache = _cache_token_write_ragged(cache, tok, pos)
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
    logits = apply_linear(params["lm_head"], x, x.dtype)
    return logits, new_cache


def llama_decode_step_ragged(
    params: Dict, tokens: jax.Array, cache: Dict, pos: jax.Array, cfg: LlamaConfig
):
    """Batched decode with PER-SEQUENCE positions (continuous batching).

    tokens: [B, 1]; pos: [B] int32 — each sequence writes its KV at its own
    position and attends its own prefix.  This is the ragged decode primitive
    the serving engine batches heterogeneous requests with (no analogue in the
    reference, which is single-sequence).
    """
    logits, new_cache = llama_forward_window_ragged(params, tokens, cache, pos, cfg)
    return logits[:, 0, :], new_cache


def _stacked_attn_enabled() -> bool:
    """Stacked-cache decode attention (ops/pallas_attention.py::
    decode_attention_stacked): the layer scan closes over the WHOLE stacked
    KV cache and the kernel DMAs each layer's slab directly (scalar-prefetch
    layer select) with the new token folded in as an extra flash term — no
    per-layer slab slice, no dynamic_update_slice copy before attention (the
    two copies cost ~0.5 GB/token at a 512-slot 7B cache).
    QEFT_ATTN_STACKED=1/0 forces; default OFF until the on-chip A/B lands
    (chip session r4)."""
    v = os.environ.get("QEFT_ATTN_STACKED")
    if v is not None:
        return v not in ("0", "false", "off")
    return False


def _decode_step_stacked_attn(
    params: Dict, token: jax.Array, cache: Dict, pos: jax.Array,
    cfg: LlamaConfig
):
    """Decode step where the layer scan carries NO cache operands: packed
    weights ride scalar-prefetch kernels (stacked gemv / fused stages) and
    attention reads the stacked cache in place (decode_attention_stacked).
    The only cache write is the one token-granular update after the scan."""
    from qeft_tpu.ops.pallas_attention import decode_attention_stacked

    b = token.shape[0]
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = _embed(params, token, cfg)  # [B, 1, D]
    dtype = x.dtype
    cos, sin = rope_tables(cfg, pos[None, None])
    layers = params["layers"]
    n_layers = jax.tree.leaves(layers)[0].shape[0]
    quantized = cache_quantized(cache)
    fused = _fused_decode_enabled()
    scales = (
        (cache["k_scale"], cache["v_scale"]) if quantized else (None, None)
    )

    def blk_of(l):
        return {
            name: leaf.layer_view(l) if isinstance(leaf, QLinearParams)
            else leaf[l]
            for name, leaf in layers.items()
        }

    def body(xc, l):
        blk = blk_of(l)
        if fused:
            qkv = qlinear_fused_stage(
                xc, blk["qkv"], lnw=blk["input_ln"], eps=cfg.rms_norm_eps,
                one_offset=cfg.rms_one_offset, dtype=dtype,
            )
        else:
            h = rms_norm(xc, blk["input_ln"], cfg.rms_norm_eps,
                         cfg.rms_one_offset)
            qkv = apply_linear(blk["qkv"], h, dtype)
        q = qkv[..., : hq * dh].reshape(b, 1, hq, dh)
        k = qkv[..., hq * dh : (hq + hkv) * dh].reshape(b, 1, hkv, dh)
        v = qkv[..., (hq + hkv) * dh :].reshape(b, 1, hkv, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kh = k.transpose(0, 2, 1, 3)  # [B, H_kv, 1, Dh]
        vh = v.transpose(0, 2, 1, 3)

        ctx = decode_attention_stacked(
            q[:, 0], cache["k"], cache["v"], l, pos, kh[:, :, 0], vh[:, :, 0],
            k_scale=scales[0], v_scale=scales[1],
        ).reshape(b, 1, hq * dh)
        if quantized:
            kq, ksn = _kv_quantize(kh)
            vq, vsn = _kv_quantize(vh)
            new_c = {"k": kq, "v": vq, "k_scale": ksn, "v_scale": vsn}
        else:
            new_c = {"k": kh.astype(cache["k"].dtype),
                     "v": vh.astype(cache["v"].dtype)}

        o_in = apply_o_reorder(ctx, blk)
        if fused:
            xc = qlinear_fused_stage(o_in, blk["o"], residual=xc, dtype=dtype)
            ug = qlinear_fused_stage(
                xc, blk["upgate"], lnw=blk["post_ln"], eps=cfg.rms_norm_eps,
                one_offset=cfg.rms_one_offset, dtype=dtype,
            )
            up, gate = _split_upgate(ug, cfg)
            xc = qlinear_fused_stage(
                _act(gate, cfg.act) * up, blk["down"], residual=xc,
                dtype=dtype,
            )
        else:
            xc = xc + apply_linear(blk["o"], o_in, dtype)
            h2 = rms_norm(xc, blk["post_ln"], cfg.rms_norm_eps,
                          cfg.rms_one_offset)
            ug = apply_linear(blk["upgate"], h2, dtype)
            up, gate = _split_upgate(ug, cfg)
            xc = xc + apply_linear(blk["down"], _act(gate, cfg.act) * up,
                                   dtype)
        return xc, new_c

    x, tok = jax.lax.scan(body, x, jnp.arange(n_layers))
    new_cache = _cache_token_write(cache, tok, pos)
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
    logits = apply_linear(params["lm_head"], x, x.dtype)
    return logits[:, 0, :], new_cache


def llama_decode_step(
    params: Dict, token: jax.Array, cache: Dict, pos: jax.Array, cfg: LlamaConfig
):
    """One decode step. token: [B, 1]; pos: scalar int32 (current length).

    Returns (logits [B, V], new cache).
    """
    b = token.shape[0]
    max_len = cache_max_len(cache)
    if (
        _stacked_attn_enabled()
        and _stacked_gemv_enabled()
        and "qkv" in params["layers"]
        and "upgate" in params["layers"]
        and (not cache_quantized(cache) or max_len % 128 == 0)
    ):
        return _decode_step_stacked_attn(params, token, cache, pos, cfg)
    x = _embed(params, token, cfg)  # [B, 1, D]
    cos, sin = rope_tables(cfg, pos[None, None])
    # attend to positions <= pos
    valid = jnp.arange(max_len)[None, None, None, :] <= pos
    mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)

    xs, blk_of = _layer_xs(params, cache)

    def body(xc, inp):
        first, c = inp
        out, new_kv, _ = llama_block(
            blk_of(first, c), xc, cfg, cos, sin, mask, kv=_kv_of(c),
            cache_pos=pos, kv_out="token",
        )
        return out, _kv_dict(new_kv)

    x, tok = jax.lax.scan(body, x, xs)
    new_cache = _cache_token_write(cache, tok, pos)
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
    logits = apply_linear(params["lm_head"], x, x.dtype)
    return logits[:, 0, :], new_cache
