"""Explicit tensor-parallel decode via shard_map: per-shard Pallas kernels +
manual collectives.

GSPMD auto-partitions XLA ops but treats a `pallas_call` as an opaque unit, so
the jit+NamedSharding path (parallel/mesh.py) can only run the XLA dequant
fallback multi-chip.  This module is the megatron-style explicit path: inside
`shard_map` every device holds its weight shard and calls the SAME single-chip
Pallas kernels on local data; the communication per block is two all-gathers
(head/MLP activations) and two psums (row-parallel outputs) riding ICI.

Sharding contract:
- qkv / upgate (column-parallel): the fused N dimension is host-side
  INTERLEAVED so shard ``t`` holds ``[q_t | k_t | v_t]`` (resp.
  ``[up_t | gate_t]``) — a uniform slice of the fused dim would hand shard 0
  only q columns.  Sharded on N: qweight/scales/scaled_zeros/oweight.
- o / down (row-parallel): packed K rows shard contiguously (whole
  quantization groups per shard — requires G % tp == 0); scales replicated
  and row-sliced in-kernel; the rank-r fp outlier slab is the TAIL of K
  (SURVEY's "outlier columns interacting with TP sharding" hard part) and is
  applied once, by the last shard.
- KV cache sharded over kv heads; residual-stream activations replicated.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qeft_tpu.ops.permute import apply_o_reorder
from qeft_tpu.models.llama import (
    LlamaConfig,
    _act,
    _attention,
    _embed,
    apply_linear,
    apply_rope,
    rms_norm,
    rope_tables,
)
from qeft_tpu.ops.packing import QLinearParams, StackedLinear


def _interleave_perm(sizes, tp: int) -> np.ndarray:
    """Column permutation turning [A|B|...] into concat_t [A_t|B_t|...]."""
    offs = np.cumsum([0] + list(sizes[:-1]))
    pieces = []
    for t in range(tp):
        for off, s in zip(offs, sizes):
            w = s // tp
            pieces.append(np.arange(off + t * w, off + (t + 1) * w))
    return np.concatenate(pieces)


def _shard_major_words(qw: jax.Array, group_size: int, tp: int) -> jax.Array:
    """Permute packed word rows from the GLOBAL group-interleave to
    shard-major order for row-parallel K sharding.

    pack_codes emits word row ``jj*G + gi`` (group-interleaved layout,
    ops/packing.py) — a contiguous 1/tp slice of word rows spans ALL
    quantization groups, so sharding them contiguously hands each shard an
    invalid packing of a non-contiguous K range.  Reordering rows to
    ``(t, jj, gi_local)`` with ``gi = t*G/tp + gi_local`` makes the t-th
    contiguous slab exactly ``pack_codes`` of K rows
    ``[t*K/tp, (t+1)*K/tp)`` in the LOCAL interleave (local word row
    ``jj*(G/tp) + gi_local``), which is what the per-shard kernels and
    `_row_parallel_apply`'s contiguous x-slices assume."""
    *lead, k8, n = qw.shape
    g = group_size if group_size > 0 else k8 * 8
    h = g // 8
    n_groups = k8 // h
    if tp == 1 or n_groups == 1:
        return qw
    assert n_groups % tp == 0, (n_groups, tp)
    w = qw.reshape(*lead, h, tp, n_groups // tp, n)
    axes = tuple(range(len(lead)))
    w = w.transpose(*axes, len(lead) + 1, len(lead), len(lead) + 2,
                    len(lead) + 3)
    return w.reshape(*lead, k8, n)


def _permute_cols(lin: QLinearParams, perm: np.ndarray) -> QLinearParams:
    take = lambda a: None if a is None else jnp.take(jnp.asarray(a), jnp.asarray(perm), axis=-1)
    return dataclasses.replace(
        lin, qweight=take(lin.qweight), scales=take(lin.scales),
        scaled_zeros=take(lin.scaled_zeros), oweight=take(lin.oweight),
        bias=take(lin.bias),
    )


def tp_shard_packed_params(params: Dict, mesh: Mesh, cfg: LlamaConfig,
                           pp_axis: str = None) -> Dict:
    """Host-side: lay out a stage-fused packed model for the shard_map path.

    ``pp_axis``: also shard the stacked LAYER dimension of every per-layer
    leaf over that mesh axis (the 2-D tp×pp composition, parallel/tp_pp.py);
    None = layers replicated (pure TP)."""
    tp = mesh.shape["tp"]
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    L = pp_axis  # layer-axis placement of per-layer leaves

    def put(a, spec):
        if a is None:  # e.g. packed with n_outlier=0: no fp slab
            return None
        return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

    def put_col(lin: QLinearParams):
        return dataclasses.replace(
            lin,
            qweight=put(lin.qweight, P(L, None, "tp")),
            scales=put(lin.scales, P(L, None, "tp")),
            scaled_zeros=put(lin.scaled_zeros, P(L, None, "tp")),
            oweight=put(lin.oweight, P(L, None, "tp")),
            bias=put(lin.bias, P(L, "tp")),  # N-sharded with the output
        )

    def put_row(lin: QLinearParams):
        return dataclasses.replace(
            lin,
            qweight=put(
                _shard_major_words(lin.qweight, lin.group_size, tp),
                P(L, "tp", None),
            ),
            # group params shard WITH the K rows (whole groups per shard, see
            # the assertion below), so the local kernel needs no slicing
            scales=put(lin.scales, P(L, "tp", None)),
            scaled_zeros=put(lin.scaled_zeros, P(L, "tp", None)),
            oweight=put(lin.oweight, P(L, None, None)),
            # replicated; _row_parallel_apply adds it on the last shard only
            # so the psum counts it exactly once
            bias=put(lin.bias, P(L, None)),
        )

    def rep(a, layer_leaf=False):
        if layer_leaf and L is not None:
            return put(a, P(L, *(None,) * (a.ndim - 1)))
        return put(a, P(*(None,) * a.ndim))

    qkv_perm = _interleave_perm([hq * dh, hkv * dh, hkv * dh], tp)
    f = params["layers"]["upgate"].out_features // 2
    if f != cfg.intermediate_size:
        # default loads pad the upgate halves for bn=1024 single-chip decode
        # tiles (pipeline.pad_upgate_halves); the TP column-interleave
        # permutation assumes N = 2*intermediate, so slice the pad back out
        from qeft_tpu.pipeline import unpad_upgate_halves

        layers = dict(params["layers"])
        layers["upgate"] = unpad_upgate_halves(
            layers["upgate"], cfg.intermediate_size
        )
        params = {**params, "layers": layers}
        f = cfg.intermediate_size
    ug_perm = _interleave_perm([f, f], tp)

    new_layers = {}
    for name, leaf in params["layers"].items():
        if isinstance(leaf, QLinearParams):
            if name == "qkv":
                new_layers[name] = put_col(_permute_cols(leaf, qkv_perm))
            elif name == "upgate":
                new_layers[name] = put_col(_permute_cols(leaf, ug_perm))
            else:  # o, down: row-parallel
                g = leaf.group_size if leaf.group_size > 0 else leaf.in_features
                n_groups = leaf.in_features // g
                assert n_groups % tp == 0, (
                    f"{name}: {n_groups} quantization groups must divide tp={tp} "
                    "(row-parallel shards whole groups)"
                )
                new_layers[name] = put_row(leaf)
        else:
            new_layers[name] = rep(leaf, layer_leaf=True)

    return {
        "embed": rep(params["embed"]),
        "layers": new_layers,
        "final_ln": rep(params["final_ln"]),
        "lm_head": put(params["lm_head"], P(None, "tp")),
    }


def _row_parallel_apply(lin: QLinearParams, x_full, my, tp, dtype):
    """Local row-shard contraction of a row-parallel packed linear (scales
    arrive pre-sharded with the K rows); adds the outlier-slab GEMM on the
    last shard. Caller psums the result."""
    k_shard = lin.qweight.shape[0] * 8
    x_my = jax.lax.dynamic_slice_in_dim(x_full, my * k_shard, k_shard, axis=-1)
    local = dataclasses.replace(lin, oweight=None, bias=None)
    part = apply_linear(local, x_my, dtype)
    # slab + bias are NOT K-partitioned: add each once (last shard) so the
    # caller's psum counts them exactly once, not tp times
    last_shard = my == tp - 1
    if lin.oweight is not None:
        r = lin.oweight.shape[0]
        slab = jnp.matmul(x_full[..., -r:], lin.oweight.astype(x_full.dtype))
        part = part + jnp.where(last_shard, slab.astype(part.dtype), jnp.zeros_like(part))
    if lin.bias is not None:
        part = part + jnp.where(
            last_shard, lin.bias.astype(part.dtype), jnp.zeros_like(lin.bias, part.dtype)
        )
    return part


def _row_parallel_apply_stacked(sl, x_full, my, tp, dtype):
    """Stacked-weights twin of `_row_parallel_apply`: the layer's local row
    shard is selected inside the kernel (scalar-prefetch index map) instead
    of sliced out of the scan."""
    from qeft_tpu.ops.qlinear import qlinear_apply_stacked

    p = sl.params
    k_shard = p.qweight.shape[-2] * 8
    x_my = jax.lax.dynamic_slice_in_dim(x_full, my * k_shard, k_shard, axis=-1)
    local = dataclasses.replace(p, oweight=None, bias=None)
    part = qlinear_apply_stacked(x_my, StackedLinear(local, sl.idx), dtype)
    last_shard = my == tp - 1
    if p.oweight is not None:
        ow = jax.lax.dynamic_index_in_dim(p.oweight, sl.idx, 0, keepdims=False)
        r = ow.shape[0]
        slab = jnp.matmul(x_full[..., -r:], ow.astype(x_full.dtype))
        part = part + jnp.where(last_shard, slab.astype(part.dtype),
                                jnp.zeros_like(part))
    if p.bias is not None:
        bias = jax.lax.dynamic_index_in_dim(p.bias, sl.idx, 0, keepdims=False)
        part = part + jnp.where(
            last_shard, bias.astype(part.dtype),
            jnp.zeros_like(bias, part.dtype),
        )
    return part


def _tp_specs(params: Dict, cache: Dict, pp_axis: str = None,
              dp_axis: str = None):
    L = pp_axis  # layer-axis placement ("pp" in the 2-D composition)

    def lin_spec(leaf: QLinearParams, shard_n: bool) -> QLinearParams:
        # spec pytree must share the leaf's treedef (aux data included), so
        # None fields stay None and group_size matches
        if shard_n:
            qw = sc = ow = P(L, None, "tp")
        else:
            qw = sc = P(L, "tp", None)
            ow = P(L, None, None)
        bias_spec = P(L, "tp") if shard_n else P(L, None)
        return QLinearParams(
            qweight=qw, scales=sc, scaled_zeros=sc,
            oweight=ow if leaf.oweight is not None else None,
            bias=bias_spec if leaf.bias is not None else None,
            group_size=leaf.group_size,
        )

    layer_specs = {}
    for name, leaf in params["layers"].items():
        if isinstance(leaf, QLinearParams):
            layer_specs[name] = lin_spec(leaf, name in ("qkv", "upgate"))
        else:
            layer_specs[name] = P(L, *(None,) * (leaf.ndim - 1))
    param_specs = {
        "embed": P(None, None),
        "layers": layer_specs,
        "final_ln": P(None),
        "lm_head": P(None, "tp"),
    }
    # head-major cache [L, B, H_kv, S, Dh] (+ [L, B, H_kv, S] int8 scale
    # planes): shard over kv heads (layers over pp in the 2-D case, batch
    # rows over dp in the 3-D dp×pp×tp composition)
    cache_specs = {
        name: P(*(L, dp_axis, "tp", None, None)[: cache[name].ndim])
        for name in cache
    }
    return param_specs, cache_specs


def _tp_block_step(blk: Dict, xc: jax.Array, c: Dict, cos, sin, mask, pos,
                   cfg: LlamaConfig, tp: int, dtype):
    """One decoder layer on the LOCAL tp shards at scalar window offset
    ``pos`` (runs inside shard_map with a 'tp' axis; also the per-layer body
    of the 2-D tp×pp stage, parallel/tp_pp.py).  ``c``: this layer's local
    cache slice ([B, H_kv/tp, S, Dh] leaves).  Mirrors the single-chip
    defaults: fused norm+matvec stages, int8-KV quantize/dequant, Pallas
    decode attention where enabled.  Returns (x_out, token K/V slices)."""
    from qeft_tpu.models.llama import (
        _kv_dequantize,
        _kv_quantize,
        _pallas_attn_enabled,
    )
    from qeft_tpu.ops.qlinear import qlinear_fused_stage

    my = jax.lax.axis_index("tp")
    b, w = xc.shape[0], xc.shape[1]
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    hq_l, hkv_l = hq // tp, hkv // tp
    max_len = c["k"].shape[2]

    qkv = qlinear_fused_stage(
        xc, blk["qkv"], lnw=blk["input_ln"], eps=cfg.rms_norm_eps,
        one_offset=cfg.rms_one_offset, dtype=dtype,
    )  # local [q_t|k_t|v_t]
    q = qkv[..., : hq_l * dh].reshape(b, w, hq_l, dh)
    k = qkv[..., hq_l * dh : (hq_l + hkv_l) * dh].reshape(b, w, hkv_l, dh)
    v = qkv[..., (hq_l + hkv_l) * dh :].reshape(b, w, hkv_l, dh)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)

    if "k_scale" in c:
        kq, ksn = _kv_quantize(kh)
        vq, vsn = _kv_quantize(vh)
        kc = jax.lax.dynamic_update_slice(c["k"], kq, (0, 0, pos, 0))
        vc = jax.lax.dynamic_update_slice(c["v"], vq, (0, 0, pos, 0))
        ksc = jax.lax.dynamic_update_slice(c["k_scale"], ksn, (0, 0, pos))
        vsc = jax.lax.dynamic_update_slice(c["v_scale"], vsn, (0, 0, pos))
        new_c = {"k": kq, "v": vq, "k_scale": ksn, "v_scale": vsn}
        if w == 1 and _pallas_attn_enabled(max_len) and max_len % 128 == 0:
            from qeft_tpu.ops.pallas_attention import decode_attention

            ctx = decode_attention(
                q[:, 0], kc, vc, pos, k_scale=ksc, v_scale=vsc
            ).reshape(b, 1, hq_l * dh)
        else:
            ctx = _attention(
                q, _kv_dequantize(kc, ksc, dtype),
                _kv_dequantize(vc, vsc, dtype), mask, hq_l // hkv_l, dtype,
            )
    else:
        kc = jax.lax.dynamic_update_slice(
            c["k"], kh.astype(c["k"].dtype), (0, 0, pos, 0)
        )
        vc = jax.lax.dynamic_update_slice(
            c["v"], vh.astype(c["v"].dtype), (0, 0, pos, 0)
        )
        new_c = {"k": kh.astype(c["k"].dtype), "v": vh.astype(c["v"].dtype)}
        if w == 1 and _pallas_attn_enabled(max_len):
            from qeft_tpu.ops.pallas_attention import decode_attention

            ctx = decode_attention(q[:, 0], kc.astype(dtype),
                                   vc.astype(dtype), pos)
            ctx = ctx.reshape(b, 1, hq_l * dh)
        else:
            ctx = _attention(
                q, kc.astype(dtype), vc.astype(dtype), mask,
                hq_l // hkv_l, dtype,
            )

    # heads were interleaved shard-contiguously, so the tiled gather
    # reassembles the FULL head-ordered context
    ctx_full = jax.lax.all_gather(ctx, "tp", axis=2, tiled=True)
    o_in = apply_o_reorder(ctx_full, blk)
    xc = xc + jax.lax.psum(
        _row_parallel_apply_stacked(blk["o"], o_in, my, tp, dtype), "tp"
    )

    ug = qlinear_fused_stage(
        xc, blk["upgate"], lnw=blk["post_ln"], eps=cfg.rms_norm_eps,
        one_offset=cfg.rms_one_offset, dtype=dtype,
    )  # local [up_t|gate_t]
    f_l = ug.shape[-1] // 2
    act = _act(ug[..., f_l:], cfg.act) * ug[..., :f_l]
    # local act covers MLP-internal dims [t*f/tp, (t+1)*f/tp): exactly
    # down's K-shard t — NO gather needed for the dense part; the
    # outlier slab needs the tail, so gather once
    act_full = jax.lax.all_gather(act, "tp", axis=2, tiled=True)
    xc = xc + jax.lax.psum(
        _row_parallel_apply_stacked(blk["down"], act_full, my, tp, dtype),
        "tp",
    )
    return xc, new_c


def tp_layer_views(layers: Dict):
    """blk_of(l): per-layer views of stacked layer params — StackedLinear for
    packed linears (layer selected inside the kernel), plain slices for small
    array leaves (norms, o_reorder)."""
    def blk_of(l):
        return {
            name: leaf.layer_view(l) if isinstance(leaf, QLinearParams)
            else leaf[l]
            for name, leaf in layers.items()
        }

    return blk_of


def _tp_window_body(params: Dict, tokens: jax.Array, cache: Dict,
                    pos, cfg: LlamaConfig, tp: int):
    """Forward a W-token window at offset ``pos`` through the LOCAL shards
    (runs inside shard_map over the 'tp' axis).  Mirrors the single-chip
    defaults: stacked-gemv StackedLinear views (the scan carries only a layer
    index; packed planes are layer-selected inside the kernels), fused
    norm+matvec stages, int8-KV quantize/dequant, token-granular cache
    write-back.  Returns (local logits [B, W, V/tp], new local cache)."""
    from qeft_tpu.models.llama import _cache_token_write

    b, w = tokens.shape
    dtype = params["embed"].dtype
    layers = params["layers"]
    n_layers = jax.tree.leaves(layers)[0].shape[0]

    x = _embed(params, tokens, cfg)
    positions = pos + jnp.arange(w)[None, :]
    cos, sin = rope_tables(cfg, positions)
    max_len = cache["k"].shape[3]
    key_pos = jnp.arange(max_len)[None, None, None, :]
    query_pos = positions[:, None, :, None]
    mask = jnp.where(key_pos <= query_pos, 0.0, -jnp.inf).astype(jnp.float32)

    blk_of = tp_layer_views(layers)

    def body(xc, inp):
        l, c = inp
        return _tp_block_step(blk_of(l), xc, c, cos, sin, mask, pos, cfg, tp,
                              dtype)

    x, tok = jax.lax.scan(body, x, (jnp.arange(n_layers), cache))
    new_cache = _cache_token_write(cache, tok, pos)
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
    logits_local = apply_linear(params["lm_head"], x, x.dtype)  # [B,W,V/tp]
    return logits_local, new_cache


def tp_forward_window(
    params: Dict,
    tokens: jax.Array,  # [B, W]
    cache: Dict,  # KV (+ int8 scale planes) sharded over kv heads
    pos: jax.Array,
    cfg: LlamaConfig,
    mesh: Mesh,
):
    """W-token window forward under shard_map over 'tp' (W=ctx: prefill;
    W=1: decode; W=gamma+1: speculative verify).  Returns global logits
    [B, W, V] and the sharded cache."""
    tp = mesh.shape["tp"]
    hq, hkv = cfg.num_heads, cfg.num_kv_heads
    assert hq % tp == 0 and hkv % tp == 0, (hq, hkv, tp)
    param_specs, cache_specs = _tp_specs(params, cache)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(param_specs, P(None, None), cache_specs, P()),
        out_specs=(P(None, None, "tp"), cache_specs),
        check_vma=False,
    )
    def fwd(params, tokens, cache, pos):
        return _tp_window_body(params, tokens, cache, pos, cfg, tp)

    return fwd(params, tokens, cache, pos)


def _tp_window_body_ragged(params: Dict, tokens: jax.Array, cache: Dict,
                           pos: jax.Array, cfg: LlamaConfig, tp: int):
    """Ragged twin of `_tp_window_body`: per-sequence window offsets.

    tokens: [B, W]; pos: [B] int32 — sequence b's window lands at absolute
    positions [pos[b], pos[b]+W) of ITS cache rows and query i attends keys
    <= pos[b]+i.  This is the continuous-batching decode primitive the
    serving engine needs on a TP mesh (VERDICT r3 #4: Engine over a mesh);
    the reference has no analogue (single-sequence generation,
    monkeypatch/ftllama_generate.py).  Runs inside shard_map over 'tp';
    returns (local logits [B, W, V/tp], new local cache)."""
    from qeft_tpu.models.llama import (
        _cache_token_write_ragged,
        _flash_attn_enabled,
        _kv_dequantize,
        _kv_quantize,
    )
    from qeft_tpu.ops.qlinear import qlinear_fused_stage

    my = jax.lax.axis_index("tp")
    b, w = tokens.shape
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    hq_l, hkv_l = hq // tp, hkv // tp
    dtype = params["embed"].dtype
    layers = params["layers"]
    n_layers = jax.tree.leaves(layers)[0].shape[0]

    x = _embed(params, tokens, cfg)
    positions = pos[:, None] + jnp.arange(w)[None, :]  # [B, W]
    cos, sin = rope_tables(cfg, positions)
    max_len = cache["k"].shape[3]
    key_pos = jnp.arange(max_len)[None, None, None, :]
    query_pos = positions[:, None, :, None]
    mask = jnp.where(key_pos <= query_pos, 0.0, -jnp.inf).astype(jnp.float32)

    def write_at(cache_l, new):
        # per-sequence scatter: vmap a W-slot dynamic update over the batch
        def one(c, n, p):
            return jax.lax.dynamic_update_slice(c, n, (0, p, 0)[: c.ndim])

        return jax.vmap(one)(cache_l, new.astype(cache_l.dtype), pos)

    def blk_of(l):
        return {
            name: leaf.layer_view(l) if isinstance(leaf, QLinearParams)
            else leaf[l]
            for name, leaf in layers.items()
        }

    def body(xc, inp):
        l, c = inp
        blk = blk_of(l)
        qkv = qlinear_fused_stage(
            xc, blk["qkv"], lnw=blk["input_ln"], eps=cfg.rms_norm_eps,
            one_offset=cfg.rms_one_offset, dtype=dtype,
        )  # local [q_t|k_t|v_t]
        q = qkv[..., : hq_l * dh].reshape(b, w, hq_l, dh)
        k = qkv[..., hq_l * dh : (hq_l + hkv_l) * dh].reshape(b, w, hkv_l, dh)
        v = qkv[..., (hq_l + hkv_l) * dh :].reshape(b, w, hkv_l, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kh = k.transpose(0, 2, 1, 3)
        vh = v.transpose(0, 2, 1, 3)

        if "k_scale" in c:
            kq, ksn = _kv_quantize(kh)
            vq, vsn = _kv_quantize(vh)
            kc, vc = write_at(c["k"], kq), write_at(c["v"], vq)
            ksc = write_at(c["k_scale"], ksn)
            vsc = write_at(c["v_scale"], vsn)
            k_read = _kv_dequantize(kc, ksc, dtype)
            v_read = _kv_dequantize(vc, vsc, dtype)
            new_c = {"k": kq, "v": vq, "k_scale": ksn, "v_scale": vsn}
        else:
            kc, vc = write_at(c["k"], kh), write_at(c["v"], vh)
            k_read, v_read = kc.astype(dtype), vc.astype(dtype)
            new_c = {"k": kh.astype(c["k"].dtype), "v": vh.astype(c["v"].dtype)}

        if _flash_attn_enabled():
            # width-invariant flash windows keep W=1 decode and W=gamma+1
            # spec-verify logits bit-identical (same property the single-chip
            # ragged forward relies on)
            from qeft_tpu.ops.pallas_flash import flash_window_attention

            ctx = flash_window_attention(q, k_read, v_read, pos)
        else:
            ctx = _attention(q, k_read, v_read, mask, hq_l // hkv_l, dtype)

        ctx_full = jax.lax.all_gather(ctx, "tp", axis=2, tiled=True)
        o_in = apply_o_reorder(ctx_full, blk)
        xc = xc + jax.lax.psum(
            _row_parallel_apply_stacked(blk["o"], o_in, my, tp, dtype), "tp"
        )

        ug = qlinear_fused_stage(
            xc, blk["upgate"], lnw=blk["post_ln"], eps=cfg.rms_norm_eps,
            one_offset=cfg.rms_one_offset, dtype=dtype,
        )
        f_l = ug.shape[-1] // 2
        act = _act(ug[..., f_l:], cfg.act) * ug[..., :f_l]
        act_full = jax.lax.all_gather(act, "tp", axis=2, tiled=True)
        xc = xc + jax.lax.psum(
            _row_parallel_apply_stacked(blk["down"], act_full, my, tp, dtype),
            "tp",
        )
        return xc, new_c

    x, tok = jax.lax.scan(body, x, (jnp.arange(n_layers), cache))
    new_cache = _cache_token_write_ragged(cache, tok, pos)
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
    logits_local = apply_linear(params["lm_head"], x, x.dtype)
    return logits_local, new_cache


def tp_forward_window_ragged(
    params: Dict,
    tokens: jax.Array,  # [B, W]
    cache: Dict,
    pos: jax.Array,  # [B] int32 per-sequence offsets
    cfg: LlamaConfig,
    mesh: Mesh,
):
    """Ragged W-token window under shard_map over 'tp'.  Returns global
    logits [B, W, V] and the sharded cache."""
    tp = mesh.shape["tp"]
    param_specs, cache_specs = _tp_specs(params, cache)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(param_specs, P(None, None), cache_specs, P(None)),
        out_specs=(P(None, None, "tp"), cache_specs),
        check_vma=False,
    )
    def fwd(params, tokens, cache, pos):
        return _tp_window_body_ragged(params, tokens, cache, pos, cfg, tp)

    return fwd(params, tokens, cache, pos)


def tp_decode_step_ragged(
    params: Dict,
    tokens: jax.Array,  # [B, 1]
    cache: Dict,
    pos: jax.Array,  # [B]
    cfg: LlamaConfig,
    mesh: Mesh,
):
    """Continuous-batching decode tick on a TP mesh: each sequence writes its
    KV at its own position and attends its own prefix, every weight shard
    stays put.  Returns (logits [B, V], new cache)."""
    logits, new_cache = tp_forward_window_ragged(
        params, tokens, cache, pos, cfg, mesh
    )
    return logits[:, 0, :], new_cache


def tp_decode_burst(
    params: Dict,
    tokens: jax.Array,  # [B, 1]
    cache: Dict,
    pos: jax.Array,  # [B]
    cfg: LlamaConfig,
    mesh: Mesh,
    n: int,
    sc,
    key: jax.Array,
):
    """``n`` ragged decode ticks in ONE shard_map program (the TP twin of
    serving._decode_burst): per tick, each shard computes its [B, V/tp]
    logits slice, one all_gather assembles the full logits, and every shard
    samples the SAME next token from the replicated key.  One host dispatch
    per burst instead of per token.  Returns (tokens [B, n], new cache)."""
    from qeft_tpu.generate import _sample_token

    tp = mesh.shape["tp"]
    b = tokens.shape[0]
    param_specs, cache_specs = _tp_specs(params, cache)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(param_specs, P(None, None), cache_specs, P(None), P(None)),
        out_specs=(P(None, None), cache_specs),
        check_vma=False,
    )
    def burst(params, tokens, cache, pos, key):
        out = jnp.zeros((b, n), jnp.int32)

        def tick(i, carry):
            tokens, cache, pos, out, key = carry
            key, sub = jax.random.split(key)
            logits_local, cache = _tp_window_body_ragged(
                params, tokens, cache, pos, cfg, tp
            )
            logits = jax.lax.all_gather(
                logits_local[:, 0, :], "tp", axis=1, tiled=True
            )
            nxt = _sample_token(logits, sub, sc)  # [B]; replicated
            return nxt[:, None], cache, pos + 1, out.at[:, i].set(nxt), key

        _, cache, _, out, _ = jax.lax.fori_loop(
            0, n, tick, (tokens, cache, pos, out, key)
        )
        return out, cache

    return burst(params, tokens, cache, pos, key)


def tp_decode_step(
    params: Dict,
    token: jax.Array,  # [B, 1]
    cache: Dict,
    pos: jax.Array,
    cfg: LlamaConfig,
    mesh: Mesh,
):
    """One decode step under shard_map over the 'tp' axis, running the
    single-chip default kernel stack per shard (stacked gemv + fused stages
    + Pallas/int8 decode attention where enabled).

    Requires a stage-fused packed model laid out by `tp_shard_packed_params`;
    num_heads, num_kv_heads and every row-parallel group count must divide tp.
    """
    logits, new_cache = tp_forward_window(params, token, cache, pos, cfg, mesh)
    return logits[:, 0, :], new_cache


def tp_generate(
    params: Dict,
    prompt: jax.Array,  # [B, S_prompt]
    cache: Dict,
    cfg: LlamaConfig,
    mesh: Mesh,
    max_new_tokens: int,
):
    """Greedy TP generation: ONE shard_map'd prefill program + ONE
    shard_map'd decode-loop program (the whole token loop inside, one
    all_gather of [B, V/tp] logits per step for the argmax) — the TP twin of
    `generate`'s split-program structure."""
    b, s_prompt = prompt.shape
    tp = mesh.shape["tp"]
    param_specs, cache_specs = _tp_specs(params, cache)

    logits, cache = tp_forward_window(
        params, prompt, cache, jnp.int32(0), cfg, mesh
    )
    first = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(param_specs, P(None), cache_specs),
        out_specs=(P(None, None), cache_specs),
        check_vma=False,
    )
    def decode_loop(params, first, cache):
        out = jnp.zeros((b, max_new_tokens), jnp.int32)
        out = out.at[:, 0].set(first)

        def step(i, carry):
            out, cache = carry
            cur = jax.lax.dynamic_slice(out, (0, i - 1), (b, 1))
            logits_local, cache = _tp_window_body(
                params, cur, cache, jnp.int32(s_prompt) + i - 1, cfg, tp
            )
            logits_full = jax.lax.all_gather(
                logits_local[:, 0, :], "tp", axis=1, tiled=True
            )
            nxt = jnp.argmax(logits_full, axis=-1).astype(jnp.int32)
            out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, i))
            return out, cache

        return jax.lax.fori_loop(1, max_new_tokens, step, (out, cache))

    return decode_loop(params, first, cache)
