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
from qeft_tpu.ops.packing import QLinearParams


def _interleave_perm(sizes, tp: int) -> np.ndarray:
    """Column permutation turning [A|B|...] into concat_t [A_t|B_t|...]."""
    offs = np.cumsum([0] + list(sizes[:-1]))
    pieces = []
    for t in range(tp):
        for off, s in zip(offs, sizes):
            w = s // tp
            pieces.append(np.arange(off + t * w, off + (t + 1) * w))
    return np.concatenate(pieces)


def _permute_cols(lin: QLinearParams, perm: np.ndarray) -> QLinearParams:
    take = lambda a: None if a is None else jnp.take(jnp.asarray(a), jnp.asarray(perm), axis=-1)
    return dataclasses.replace(
        lin, qweight=take(lin.qweight), scales=take(lin.scales),
        scaled_zeros=take(lin.scaled_zeros), oweight=take(lin.oweight),
        bias=take(lin.bias),
    )


def tp_shard_packed_params(params: Dict, mesh: Mesh, cfg: LlamaConfig) -> Dict:
    """Host-side: lay out a stage-fused packed model for the shard_map path."""
    tp = mesh.shape["tp"]
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def put(a, spec):
        if a is None:  # e.g. packed with n_outlier=0: no fp slab
            return None
        return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

    def put_col(lin: QLinearParams):
        return dataclasses.replace(
            lin,
            qweight=put(lin.qweight, P(None, None, "tp")),
            scales=put(lin.scales, P(None, None, "tp")),
            scaled_zeros=put(lin.scaled_zeros, P(None, None, "tp")),
            oweight=put(lin.oweight, P(None, None, "tp")),
            bias=put(lin.bias, P(None, "tp")),  # N-sharded with the output
        )

    def put_row(lin: QLinearParams):
        return dataclasses.replace(
            lin,
            qweight=put(lin.qweight, P(None, "tp", None)),
            scales=put(lin.scales, P(None, None, None)),
            scaled_zeros=put(lin.scaled_zeros, P(None, None, None)),
            oweight=put(lin.oweight, P(None, None, None)),
            # replicated; _row_parallel_apply adds it on the last shard only
            # so the psum counts it exactly once
            bias=put(lin.bias, P(None, None)),
        )

    rep = lambda a: put(a, P(*(None,) * a.ndim))

    qkv_perm = _interleave_perm([hq * dh, hkv * dh, hkv * dh], tp)
    f = params["layers"]["upgate"].out_features // 2
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
            new_layers[name] = rep(leaf)

    return {
        "embed": rep(params["embed"]),
        "layers": new_layers,
        "final_ln": rep(params["final_ln"]),
        "lm_head": put(params["lm_head"], P(None, "tp")),
    }


def _row_parallel_apply(lin: QLinearParams, x_full, my, tp, dtype):
    """Local row-shard contraction of a row-parallel packed linear; adds the
    outlier-slab GEMM on the last shard. Caller psums the result."""
    k_shard = lin.qweight.shape[0] * 8
    g = lin.group_size if lin.group_size > 0 else k_shard * tp
    gsh = k_shard // g
    x_my = jax.lax.dynamic_slice_in_dim(x_full, my * k_shard, k_shard, axis=-1)
    local = dataclasses.replace(
        lin,
        scales=jax.lax.dynamic_slice_in_dim(lin.scales, my * gsh, gsh, axis=0),
        scaled_zeros=jax.lax.dynamic_slice_in_dim(lin.scaled_zeros, my * gsh, gsh, axis=0),
        oweight=None, bias=None, group_size=lin.group_size,
    )
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


def tp_decode_step(
    params: Dict,
    token: jax.Array,  # [B, 1]
    cache: Dict,  # KV sharded over kv heads (dim 3)
    pos: jax.Array,
    cfg: LlamaConfig,
    mesh: Mesh,
):
    """One decode step under shard_map over the 'tp' axis.

    Requires a stage-fused packed model laid out by `tp_shard_packed_params`;
    num_heads, num_kv_heads and every row-parallel group count must divide tp.
    """
    tp = mesh.shape["tp"]
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    assert hq % tp == 0 and hkv % tp == 0, (hq, hkv, tp)
    hq_l, hkv_l = hq // tp, hkv // tp

    def lin_spec(leaf: QLinearParams, shard_n: bool) -> QLinearParams:
        # spec pytree must share the leaf's treedef (aux data included), so
        # None fields stay None and group_size matches
        def opt(spec):
            return spec

        if shard_n:
            qw = sc = ow = P(None, None, "tp")
        else:
            qw = P(None, "tp", None)
            sc = ow = P(None, None, None)
        bias_spec = P(None, "tp") if shard_n else P(None, None)
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
            layer_specs[name] = P(*(None,) * leaf.ndim)
    param_specs = {
        "embed": P(None, None),
        "layers": layer_specs,
        "final_ln": P(None),
        "lm_head": P(None, "tp"),
    }
    # head-major cache [L, B, H_kv, S, Dh]: shard over kv heads
    cache_specs = {
        "k": P(None, None, "tp", None, None),
        "v": P(None, None, "tp", None, None),
    }

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(param_specs, P(None, None), cache_specs, P()),
        out_specs=(P(None, "tp"), cache_specs),
        check_vma=False,
    )
    def step(params, token, cache, pos):
        my = jax.lax.axis_index("tp")
        b = token.shape[0]
        dtype = params["embed"].dtype
        x = _embed(params, token, cfg)
        cos, sin = rope_tables(cfg, pos[None, None])
        max_len = cache["k"].shape[3]
        valid = jnp.arange(max_len)[None, None, None, :] <= pos
        mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)

        def body(xc, inp):
            blk, kc, vc = inp  # kc/vc: [B, hkv_l, S, dh] local heads (head-major)
            h = rms_norm(xc, blk["input_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
            qkv = apply_linear(blk["qkv"], h, dtype)  # local [q_t|k_t|v_t]
            q = qkv[..., : hq_l * dh].reshape(b, 1, hq_l, dh)
            k = qkv[..., hq_l * dh : (hq_l + hkv_l) * dh].reshape(b, 1, hkv_l, dh)
            v = qkv[..., (hq_l + hkv_l) * dh :].reshape(b, 1, hkv_l, dh)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            kc = jax.lax.dynamic_update_slice(
                kc, k.transpose(0, 2, 1, 3).astype(kc.dtype), (0, 0, pos, 0)
            )
            vc = jax.lax.dynamic_update_slice(
                vc, v.transpose(0, 2, 1, 3).astype(vc.dtype), (0, 0, pos, 0)
            )
            ctx = _attention(
                q, kc.astype(dtype), vc.astype(dtype), mask, hq_l // hkv_l, dtype
            )

            # heads were interleaved shard-contiguously, so the tiled gather
            # reassembles the FULL head-ordered context
            ctx_full = jax.lax.all_gather(ctx, "tp", axis=2, tiled=True)
            o_in = ctx_full
            if "o_reorder" in blk:
                o_in = jnp.take(ctx_full, blk["o_reorder"], axis=-1)
            attn_out = jax.lax.psum(
                _row_parallel_apply(blk["o"], o_in, my, tp, dtype), "tp"
            )
            xc = xc + attn_out

            h2 = rms_norm(xc, blk["post_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
            ug = apply_linear(blk["upgate"], h2, dtype)  # local [up_t|gate_t]
            f_l = ug.shape[-1] // 2
            act = _act(ug[..., f_l:], cfg.act) * ug[..., :f_l]
            # local act covers MLP-internal dims [t*f/tp, (t+1)*f/tp): exactly
            # down's K-shard t — NO gather needed for the dense part; the
            # outlier slab needs the tail, so gather once
            act_full = jax.lax.all_gather(act, "tp", axis=2, tiled=True)
            xc = xc + jax.lax.psum(
                _row_parallel_apply(blk["down"], act_full, my, tp, dtype), "tp"
            )
            return xc, (kc, vc)

        x, (ks, vs) = jax.lax.scan(body, x, (params["layers"], cache["k"], cache["v"]))
        x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
        logits_local = apply_linear(params["lm_head"], x, x.dtype)  # [B,1,V/tp]
        return logits_local[:, 0, :], {"k": ks, "v": vs}

    return step(params, token, cache, pos)
