"""Sequence parallelism: ring-attention prefill over an ``sp`` mesh axis.

Long-context capability absent from the reference (whose prefill is a plain
eager O(S^2) matmul on one GPU, capped at max_position_embeddings —
ftllama_modeling.py:87-125, main.py:516-521).  Here the PROMPT dimension is
sharded across devices: every projection/norm/MLP is per-token and therefore
trivially local, and attention runs as a causal ring — each device's query
chunk accumulates flash-style (online softmax) against K/V chunks that rotate
around the ring with one `lax.ppermute` per step, so the full S x S score
matrix never materializes on any chip and K/V transfers ride ICI.

API: `llama_prefill_sp(params, tokens, cfg, mesh)` -> (logits [B, S, V],
kv [L, B, H_kv, S, Dh]); scatter the kv slab into a decode cache with
`cache[k].at[:, :, :, :S].set(...)` to continue with normal decode.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from qeft_tpu.ops.permute import apply_o_reorder
from qeft_tpu.models.llama import (
    LlamaConfig,
    _act,
    _embed,
    apply_linear,
    apply_rope,
    rms_norm,
    rope_tables,
)

_NEG = -1e30  # finite mask value: keeps the online-softmax update NaN-free
# (an all-masked chunk contributes garbage that the next real chunk's
# rescaling multiplies by exp(_NEG - real_max) == 0)


def _ring_attention(q, k, v, q_off, n_sp, dtype):
    """Causal flash attention of a local query chunk against the ring of K/V
    chunks.  q: [B, Hq, Sl, Dh] at global rows [q_off, q_off+Sl); k/v:
    [B, Hkv, Sl, Dh] — this device's chunk, rotated around the ring."""
    b, hq, sl, dh = q.shape
    hkv = k.shape[1]
    rep = hq // hkv
    p = jax.lax.axis_index("sp")
    scale = dh ** -0.5
    qf = q.astype(jnp.float32) * scale

    acc = jnp.zeros((b, hq, sl, dh), jnp.float32)
    m = jnp.full((b, hq, sl), _NEG, jnp.float32)
    denom = jnp.zeros((b, hq, sl), jnp.float32)

    def step(r, state):
        acc, m, denom, kc, vc = state
        src = (p - r) % n_sp  # which global chunk this kc/vc is
        k_off = src * sl
        # GQA via grouped einsums — NOT jnp.repeat, which would materialize
        # K/V at full Hq width (rep x the stored bytes) in the hot loop
        kf = kc.astype(jnp.float32)  # [B, Hkv, Sl, Dh]
        vf = vc.astype(jnp.float32)
        qg = qf.reshape(b, hkv, rep, sl, dh)
        s = jnp.einsum("bgrqd,bgkd->bgrqk", qg, kf).reshape(b, hq, sl, sl)
        qpos = q_off + jnp.arange(sl)
        kpos = k_off + jnp.arange(sl)
        causal = qpos[:, None] >= kpos[None, :]
        s = jnp.where(causal[None, None], s, _NEG)
        m_new = jnp.maximum(m, s.max(axis=-1))
        alpha = jnp.exp(m - m_new)  # rescale of the old accumulator
        pexp = jnp.exp(s - m_new[..., None])
        denom = denom * alpha + pexp.sum(axis=-1)
        pv = jnp.einsum(
            "bgrqk,bgkd->bgrqd", pexp.reshape(b, hkv, rep, sl, sl), vf
        ).reshape(b, hq, sl, dh)
        acc = acc * alpha[..., None] + pv
        kc, vc = jax.lax.ppermute(
            (kc, vc), "sp", [(i, (i + 1) % n_sp) for i in range(n_sp)]
        )
        return acc, m_new, denom, kc, vc

    acc, m, denom, _, _ = jax.lax.fori_loop(0, n_sp, step, (acc, m, denom, k, v))
    out = acc / jnp.maximum(denom, 1e-30)[..., None]
    return out.astype(dtype)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def llama_prefill_sp(
    params: Dict, tokens: jax.Array, cfg: LlamaConfig, mesh: Mesh
) -> Tuple[jax.Array, Dict]:
    """Sequence-sharded prefill: tokens [B, S] with S split over the ``sp``
    axis.  Returns (logits [B, S, V], kv {"k","v": [L, B, H_kv, S, Dh]}) —
    both assembled across shards by the out-spec."""
    n_sp = mesh.shape["sp"]
    b, s = tokens.shape
    assert s % n_sp == 0, (s, n_sp)

    def shard(params_l, tokens_l):
        p = jax.lax.axis_index("sp")
        sl = tokens_l.shape[1]
        off = p * sl
        x = _embed(params_l, tokens_l, cfg)
        positions = off + jnp.arange(sl)[None, :]
        cos, sin = rope_tables(cfg, positions)
        hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        dtype = x.dtype

        def body(xc, blk):
            h = rms_norm(xc, blk["input_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
            if "qkv" in blk:
                qkv = apply_linear(blk["qkv"], h, dtype)
                q = qkv[..., : hq * dh].reshape(b, sl, hq, dh)
                k = qkv[..., hq * dh : (hq + hkv) * dh].reshape(b, sl, hkv, dh)
                v = qkv[..., (hq + hkv) * dh :].reshape(b, sl, hkv, dh)
            else:
                q = apply_linear(blk["q"], h, dtype).reshape(b, sl, hq, dh)
                k = apply_linear(blk["k"], h, dtype).reshape(b, sl, hkv, dh)
                v = apply_linear(blk["v"], h, dtype).reshape(b, sl, hkv, dh)
            q = apply_rope(q, cos, sin).transpose(0, 2, 1, 3)
            k = apply_rope(k, cos, sin).transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            ctx = _ring_attention(q, k, v, jnp.int32(off), n_sp, dtype)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, sl, hq * dh)
            o_in = apply_o_reorder(ctx, blk)
            xc = xc + apply_linear(blk["o"], o_in, dtype)
            h2 = rms_norm(xc, blk["post_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
            if "upgate" in blk:
                ug = apply_linear(blk["upgate"], h2, dtype)
                f = ug.shape[-1] // 2
                up, gate = ug[..., :f], ug[..., f:]
            else:
                up = apply_linear(blk["up"], h2, dtype)
                gate = apply_linear(blk["gate"], h2, dtype)
            xc = xc + apply_linear(blk["down"], _act(gate, cfg.act) * up, dtype)
            return xc, (k, v)

        x, (ks, vs) = jax.lax.scan(body, x, params_l["layers"])
        x = rms_norm(x, params_l["final_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
        logits = apply_linear(params_l["lm_head"], x, x.dtype)
        return logits, {"k": ks, "v": vs}  # kv: [L, B, H_kv, Sl, Dh]

    p_specs = jax.tree.map(lambda _: P(), params)
    return jax.shard_map(
        shard,
        mesh=mesh,
        in_specs=(p_specs, P(None, "sp")),
        out_specs=(P(None, "sp", None), {"k": P(None, None, None, "sp", None),
                                         "v": P(None, None, None, "sp", None)}),
        check_vma=False,
    )(params, tokens)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def llama_decode_step_sp(
    params: Dict, tokens: jax.Array, cache: Dict, pos: jax.Array,
    cfg: LlamaConfig, mesh: Mesh,
) -> Tuple[jax.Array, Dict]:
    """Single-token decode with the KV cache SHARDED over ``sp`` (cache
    leaves [L, B, H_kv, S_max, Dh] split on the S_max axis): each device
    computes flash attention over its local cache slab and the partial
    (max, denom, acc) triples combine exactly with one psum round — the
    long-context decode where no chip holds the whole cache (SURVEY §5
    long-context: "sharded KV + blockwise decode attention over ICI").

    The new token's K/V is written by the shard that owns position ``pos``.
    tokens: [B, 1]; pos scalar int32.  Returns (logits [B, V], new cache).
    """
    n_sp = mesh.shape["sp"]
    b = tokens.shape[0]
    s_total = cache["k"].shape[3]
    assert s_total % n_sp == 0
    s_loc = s_total // n_sp

    def shard(params_l, toks, cache_l, pos_):
        p = jax.lax.axis_index("sp")
        lo = p * s_loc  # this shard owns global positions [lo, lo + s_loc)
        x = _embed(params_l, toks, cfg)
        cos, sin = rope_tables(cfg, (pos_ + jnp.zeros((1, 1), jnp.int32)))
        hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        rep = hq // hkv
        dtype = x.dtype

        def body(xc, inp):
            blk, c = inp
            h = rms_norm(xc, blk["input_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
            if "qkv" in blk:
                qkv = apply_linear(blk["qkv"], h, dtype)
                q = qkv[..., : hq * dh].reshape(b, 1, hq, dh)
                k = qkv[..., hq * dh : (hq + hkv) * dh].reshape(b, 1, hkv, dh)
                v = qkv[..., (hq + hkv) * dh :].reshape(b, 1, hkv, dh)
            else:
                q = apply_linear(blk["q"], h, dtype).reshape(b, 1, hq, dh)
                k = apply_linear(blk["k"], h, dtype).reshape(b, 1, hkv, dh)
                v = apply_linear(blk["v"], h, dtype).reshape(b, 1, hkv, dh)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            kh = k.transpose(0, 2, 1, 3)  # [B, H_kv, 1, Dh]
            vh = v.transpose(0, 2, 1, 3)

            # owner shard writes the new K/V at its local offset
            owns = (pos_ >= lo) & (pos_ < lo + s_loc)
            loc = jnp.clip(pos_ - lo, 0, s_loc - 1)

            def wr(cl, new):
                upd = jax.lax.dynamic_update_slice(
                    cl, new.astype(cl.dtype), (0, 0, loc, 0)[: cl.ndim]
                )
                return jnp.where(owns, upd, cl)

            if "k_scale" in c:  # quantized (int8) KV slab: codes + scales
                from qeft_tpu.models.llama import _kv_dequantize, _kv_quantize

                kq, ksn = _kv_quantize(kh)
                vq, vsn = _kv_quantize(vh)
                kc, vc = wr(c["k"], kq), wr(c["v"], vq)
                ksc, vsc = wr(c["k_scale"], ksn), wr(c["v_scale"], vsn)
                k_read = _kv_dequantize(kc, ksc, dtype)
                v_read = _kv_dequantize(vc, vsc, dtype)
                new_c = {"k": kc, "v": vc, "k_scale": ksc, "v_scale": vsc}
            else:
                kc = wr(c["k"], kh)
                vc = wr(c["v"], vh)
                k_read, v_read = kc, vc
                new_c = {"k": kc, "v": vc}

            # local flash partial over the shard's slab (GQA via grouped
            # einsums, not a repeat that would materialize rep x the K/V bytes)
            qf = q.transpose(0, 2, 1, 3).astype(jnp.float32) * dh ** -0.5
            kf = k_read.astype(jnp.float32)  # [B, Hkv, s_loc, Dh]
            vf = v_read.astype(jnp.float32)
            qg = qf.reshape(b, hkv, rep, 1, dh)
            s = jnp.einsum("bgrqd,bgkd->bgrqk", qg, kf).reshape(
                b, hq, 1, s_loc
            )  # [B, Hq, 1, s_loc]
            valid = (lo + jnp.arange(s_loc)) <= pos_
            s = jnp.where(valid[None, None, None, :], s, _NEG)
            m_loc = s.max(axis=-1)  # [B, Hq, 1]
            # one psum round combines the shard partials exactly
            m_glob = jax.lax.pmax(m_loc, "sp")
            pexp = jnp.exp(s - m_glob[..., None])
            denom = jax.lax.psum(pexp.sum(axis=-1), "sp")
            acc = jax.lax.psum(
                jnp.einsum(
                    "bgrqk,bgkd->bgrqd", pexp.reshape(b, hkv, rep, 1, s_loc), vf
                ).reshape(b, hq, 1, dh),
                "sp",
            )
            ctx = (acc / jnp.maximum(denom, 1e-30)[..., None]).astype(dtype)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, 1, hq * dh)
            o_in = apply_o_reorder(ctx, blk)
            xc = xc + apply_linear(blk["o"], o_in, dtype)
            h2 = rms_norm(xc, blk["post_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
            if "upgate" in blk:
                ug = apply_linear(blk["upgate"], h2, dtype)
                f = ug.shape[-1] // 2
                up, gate = ug[..., :f], ug[..., f:]
            else:
                up = apply_linear(blk["up"], h2, dtype)
                gate = apply_linear(blk["gate"], h2, dtype)
            xc = xc + apply_linear(blk["down"], _act(gate, cfg.act) * up, dtype)
            return xc, new_c

        x, new_cache = jax.lax.scan(body, x, (params_l["layers"], cache_l))
        x = rms_norm(x, params_l["final_ln"], cfg.rms_norm_eps, cfg.rms_one_offset)
        logits = apply_linear(params_l["lm_head"], x, x.dtype)
        return logits[:, 0, :], new_cache

    p_specs = jax.tree.map(lambda _: P(), params)
    # cache leaves shard on their S axis (axis 3); int8 scale planes are
    # rank-4 ([L, B, H, S]) so the spec is built per-leaf by rank
    c_spec = jax.tree.map(
        lambda leaf: P(*([None] * 3 + ["sp"] + [None] * (leaf.ndim - 4))),
        cache,
    )
    return jax.shard_map(
        shard, mesh=mesh,
        in_specs=(p_specs, P(), c_spec, P()),
        out_specs=(P(), c_spec),
        check_vma=False,
    )(params, tokens, cache, pos)
