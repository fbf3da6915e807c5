"""Pallas decode attention over the head-major static KV cache (GQA-aware,
length-aware).

TPU-native replacement for the reference's FasterTransformer single-query
attention kernel (`single_query_attention`,
/root/reference/qeft/kernel/attention/decoder_masked_multihead_attention*.cu):
one new token attends over the first ``pos+1`` entries of a statically
allocated cache.

Design (round 2 — the round-1 kernel lost to XLA because Mosaic has no
batched dot_general, forcing a per-kv-head Python loop of tiny MXU dots):
- the cache is **head-major** ``[B, H_kv, S, D]``, so one (batch, kv-head)
  pair owns a contiguous ``[S, D]`` slab;
- the grid is ``(B*H_kv, S/blk)``: each step runs exactly TWO dots on
  ``[rep, D] x [blk, D]^T`` and ``[rep, blk] x [blk, D]`` — single MXU
  issues, no loops, no relayouts;
- the S-block index map CLAMPS at the current length, so every step past the
  valid prefix maps to the same block — pallas skips the DMA when the block
  index is unchanged, making HBM traffic proportional to the ACTUAL sequence
  length (the reference kernel gets this by looping to ``timestep``; XLA's
  masked attention always reads the whole cache).

RoPE is applied outside (a [B,H,D]-sized op, negligible); the reference fuses
it only because CUDA kernel launches are expensive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _default_blk(s_max: int) -> int:
    """On-chip A/B (BASELINE.md round 2): bigger S-blocks win — 512-slot
    cache: blk 512 62.24 tok/s vs blk 256 61.79; 4096-slot: blk 1024
    35.22 vs blk 256 34.65 (XLA attention: 62.75 / 33.06)."""
    import os

    env = os.environ.get("QEFT_ATTN_BLK")
    if env:
        return int(env)
    return 1024


def _fit_blk(s_max: int, cap: int, align: int = 8) -> int:
    """Largest S-block <= cap that divides s_max and keeps ``align``-ment
    (8 for the K/V sublane dim; 128 for the int8 scale planes whose S is the
    LANE dim); falls back to one whole-cache block (block == array dims is
    always legal) for lengths with no aligned divisor."""
    for blk in range(min(cap, s_max), align - 1, -1):
        if s_max % blk == 0 and blk % align == 0:
            return blk
    return s_max


def decode_attention(
    q: jax.Array,  # [B, H, D] (RoPE already applied)
    k_cache: jax.Array,  # [B, H_kv, S, D] head-major (new K already written)
    v_cache: jax.Array,  # [B, H_kv, S, D]
    pos: jax.Array,  # scalar int32: index of the current token
    blk: int = 0,  # 0 -> QEFT_ATTN_BLK (default min(1024, s_max), fitted)
    k_scale: jax.Array = None,  # [B, H_kv, S] per-vector scales (int8 cache)
    v_scale: jax.Array = None,
) -> jax.Array:
    """With ``k_scale``/``v_scale`` the caches hold int8 codes: the kernel
    streams HALF the KV bytes and applies the scales as [1, blk] row
    multiplies — K's scale folds into the score columns, V's into the
    probability columns before the PV dot, so no dequantized K/V tile is
    ever materialized.  The scales ride as ``[B*H_kv, 1, S]`` with
    ``(1, 1, blk)`` blocks: the sublane dim equals the array dim (legal at
    any cache size) and the lane dim is 128-aligned.  Rejected layouts, for
    the record: 2D ``(1, blk)`` blocks fail block-mapping checks whenever
    blk < S (sublane dim 1 neither 8-aligned nor full); ``[.., S, 1]`` with
    ``(1, blk, 1)`` blocks passes those but Mosaic cannot slice a lane dim
    of 1 ("Slice shape along dimension 2 must be aligned to tiling (128)")."""
    b, h, d = q.shape
    _, hkv, s_max, _ = k_cache.shape
    n_rep = h // hkv
    quantized = k_scale is not None
    if quantized:
        # S is the LANE dim of the scale planes: even a whole-array block is
        # rejected by Mosaic when s_max isn't 128-aligned (the VMEM ref pads
        # to the next lane tile and the slice misaligns)
        assert s_max % 128 == 0, (
            f"int8 KV cache needs a 128-aligned slot count, got {s_max} "
            "(init_kv_cache(quantized=True) rounds up automatically)"
        )
    # any requested block is fitted DOWN to a divisor of s_max: caches sized
    # ctx+gen are rarely multiples of the tuned block (e.g. 1088 slots)
    blk = _fit_blk(s_max, blk or _default_blk(s_max),
                   align=128 if quantized else 8)
    assert s_max % blk == 0
    n_s = s_max // blk
    scale = d**-0.5

    # q and out ride as 3D [B*H_kv, 1, rep*D] with full-size trailing block
    # dims (always legal) so their blocks never slice a sub-tile dim; K/V
    # stay 3D with a leading block dim of 1, which slices the UNtiled outer
    # dim only
    qf = q.reshape(b * hkv, 1, n_rep * d)
    kf = k_cache.reshape(b * hkv, s_max, d)
    vf = v_cache.reshape(b * hkv, s_max, d)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    def kernel(pos_ref, q_ref, k_ref, v_ref, *rest):
        if quantized:
            ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
        else:
            o_ref, m_ref, l_ref, acc_ref = rest
        s_idx = pl.program_id(1)
        p_now = pos_ref[0]

        @pl.when(s_idx == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(s_idx * blk <= p_now)
        def _():
            qt = q_ref[:].astype(jnp.float32).reshape(n_rep, d)
            kt = k_ref.at[0][:].astype(jnp.float32)  # [blk, D]
            vt = v_ref.at[0][:].astype(jnp.float32)
            scores = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [rep, blk]
            if quantized:
                scores = scores * ks_ref.at[0][:]  # [1, blk] K scales
            valid = (
                s_idx * blk
                + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
            ) <= p_now
            scores = jnp.where(valid, scores, -jnp.inf)

            m_prev = m_ref[:]  # [rep, 1]
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
            p = jnp.exp(scores - m_new)  # [rep, blk]
            alpha = jnp.exp(m_prev - m_new)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            if quantized:
                p = p * vs_ref.at[0][:]  # V scales fold into the prob columns
            pv = jnp.dot(p, vt, preferred_element_type=jnp.float32)  # [rep, D]
            acc_ref[:] = acc_ref[:] * alpha + pv
            m_ref[:] = m_new

        @pl.when(s_idx == pl.num_programs(1) - 1)
        def _():
            o_ref[:] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype).reshape(1, 1, n_rep * d)

    def clamp_idx(bi, si, pos_ref):
        # blocks past the valid prefix re-map to the last valid block: the
        # pallas pipeline skips the DMA when the block index doesn't change
        return (bi, jnp.minimum(si, pos_ref[0] // blk), 0)

    in_specs = [
        pl.BlockSpec((1, 1, n_rep * d), lambda bi, si, pos_ref: (bi, 0, 0)),
        pl.BlockSpec((1, blk, d), clamp_idx),
        pl.BlockSpec((1, blk, d), clamp_idx),
    ]
    operands = [qf, kf, vf]
    if quantized:
        def clamp_idx_s(bi, si, pos_ref):
            return (bi, 0, jnp.minimum(si, pos_ref[0] // blk))

        in_specs += [pl.BlockSpec((1, 1, blk), clamp_idx_s)] * 2
        operands += [
            k_scale.reshape(b * hkv, 1, s_max).astype(jnp.float32),
            v_scale.reshape(b * hkv, 1, s_max).astype(jnp.float32),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * hkv, n_s),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, n_rep * d), lambda bi, si, pos_ref: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_rep, 1), jnp.float32),
            pltpu.VMEM((n_rep, 1), jnp.float32),
            pltpu.VMEM((n_rep, d), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * hkv, 1, n_rep * d), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(pos_arr, *operands)
    return out.reshape(b, h, d)


def decode_attention_stacked(
    q: jax.Array,  # [B, H, D] (RoPE already applied)
    k_cache: jax.Array,  # [L, B, H_kv, S, D] STACKED cache, stale at pos
    v_cache: jax.Array,  # [L, B, H_kv, S, D]
    layer: jax.Array,  # scalar int32
    pos: jax.Array,  # scalar int32: index of the current token
    k_new: jax.Array,  # [B, H_kv, D] this layer's new-token K (RoPE applied)
    v_new: jax.Array,  # [B, H_kv, D]
    blk: int = 0,
    k_scale: jax.Array = None,  # [L, B, H_kv, S] per-vector scales (int8)
    v_scale: jax.Array = None,
) -> jax.Array:
    """`decode_attention` reading layer ``layer`` STRAIGHT out of the stacked
    cache (scalar-prefetched layer index in the block maps) with the current
    token's K/V supplied separately and folded in as one extra width-1 flash
    term in-kernel.

    Why this exists (round-4 decode decomposition): the scan-over-layers
    decode loop used to (a) slice each layer's [B, H_kv, S, D] slab out of
    the stacked cache (lax.scan materializes xs slices — a full slab copy),
    and (b) dynamic_update_slice the new token into it (a second slab copy)
    before attention read it.  At a 512-slot 7B cache that is ~0.5 GB/token
    of pure copy traffic on top of the ~0.27 GB the attention actually needs.
    Here the slab is DMA'd once, length-clamped (only blocks covering
    positions < pos move), and never copied: cache slots at ``pos`` hold
    STALE data and are masked strictly; the new token's score/value ride the
    extra term.  The caller writes the token K/V back to the cache once per
    step, after the layer scan (models/llama._cache_token_write).

    int8 caches stream codes + fold scales exactly like `decode_attention`;
    the new-token term uses the UNquantized vectors (more exact than the
    quantize->dequantize round-trip the slab-update path pays).
    """
    b, h, d = q.shape
    n_layers, _, hkv, s_max, _ = k_cache.shape
    n_rep = h // hkv
    quantized = k_scale is not None
    if quantized:
        assert s_max % 128 == 0, (
            f"int8 KV cache needs a 128-aligned slot count, got {s_max}"
        )
    blk = _fit_blk(s_max, blk or _default_blk(s_max),
                   align=128 if quantized else 8)
    n_s = s_max // blk
    scale = d**-0.5

    qf = q.reshape(b * hkv, 1, n_rep * d)
    kf = k_cache.reshape(n_layers * b * hkv, s_max, d)
    vf = v_cache.reshape(n_layers * b * hkv, s_max, d)
    knf = k_new.reshape(b * hkv, 1, d)
    vnf = v_new.reshape(b * hkv, 1, d)
    # scalar prefetch: [layer, pos]
    sref = jnp.stack(
        [jnp.asarray(layer, jnp.int32), jnp.asarray(pos, jnp.int32)]
    )

    def kernel(s_ref, q_ref, k_ref, v_ref, kn_ref, vn_ref, *rest):
        if quantized:
            ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
        else:
            o_ref, m_ref, l_ref, acc_ref = rest
        s_idx = pl.program_id(1)
        p_now = s_ref[1]

        @pl.when(s_idx == 0)
        def _():
            # seed the online-softmax state with the new-token term (width-1
            # flash block): slot ``pos`` of the slab is stale and masked, the
            # real current token lives in kn/vn
            qt = q_ref[:].astype(jnp.float32).reshape(n_rep, d)
            kn = kn_ref[:].astype(jnp.float32).reshape(1, d)
            vn = vn_ref[:].astype(jnp.float32).reshape(1, d)
            s_new = jnp.sum(qt * kn, axis=-1, keepdims=True) * scale  # [rep,1]
            # p = exp(s_new - m) = 1 at m = s_new: state = (m=s_new, l=1, acc=vn)
            m_ref[:] = s_new
            l_ref[:] = jnp.ones_like(s_new)
            acc_ref[:] = jnp.broadcast_to(vn, (n_rep, d))

        @pl.when(s_idx * blk < p_now)
        def _():
            qt = q_ref[:].astype(jnp.float32).reshape(n_rep, d)
            kt = k_ref.at[0][:].astype(jnp.float32)  # [blk, D]
            vt = v_ref.at[0][:].astype(jnp.float32)
            scores = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [rep, blk]
            if quantized:
                scores = scores * ks_ref.at[0][:]
            valid = (
                s_idx * blk
                + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
            ) < p_now  # STRICT: slot ``pos`` is stale
            scores = jnp.where(valid, scores, -jnp.inf)

            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
            p = jnp.exp(scores - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            if quantized:
                p = p * vs_ref.at[0][:]
            pv = jnp.dot(p, vt, preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] * alpha + pv
            m_ref[:] = m_new

        @pl.when(s_idx == pl.num_programs(1) - 1)
        def _():
            o_ref[:] = (
                acc_ref[:] / l_ref[:]
            ).astype(o_ref.dtype).reshape(1, 1, n_rep * d)

    def bh_idx(bi, si, s_ref):
        return (bi, 0, 0)

    def clamp_idx(bi, si, s_ref):
        # valid slab positions are < pos: last touched block covers pos-1;
        # blocks past it re-map (DMA skipped).  pos==0 -> every step maps to
        # block 0 (its DMA is wasted once but never read: the @when guard
        # skips the compute)
        last = jnp.maximum(s_ref[1] - 1, 0) // blk
        return (s_ref[0] * (b * hkv) + bi, jnp.minimum(si, last), 0)

    in_specs = [
        pl.BlockSpec((1, 1, n_rep * d), bh_idx),
        pl.BlockSpec((1, blk, d), clamp_idx),
        pl.BlockSpec((1, blk, d), clamp_idx),
        pl.BlockSpec((1, 1, d), bh_idx),
        pl.BlockSpec((1, 1, d), bh_idx),
    ]
    operands = [qf, kf, vf, knf, vnf]
    if quantized:
        def clamp_idx_s(bi, si, s_ref):
            last = jnp.maximum(s_ref[1] - 1, 0) // blk
            return (s_ref[0] * (b * hkv) + bi, 0, jnp.minimum(si, last))

        in_specs += [pl.BlockSpec((1, 1, blk), clamp_idx_s)] * 2
        operands += [
            k_scale.reshape(n_layers * b * hkv, 1, s_max).astype(jnp.float32),
            v_scale.reshape(n_layers * b * hkv, 1, s_max).astype(jnp.float32),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * hkv, n_s),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, n_rep * d), bh_idx),
        scratch_shapes=[
            pltpu.VMEM((n_rep, 1), jnp.float32),
            pltpu.VMEM((n_rep, 1), jnp.float32),
            pltpu.VMEM((n_rep, d), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * hkv, 1, n_rep * d), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(sref, *operands)
    return out.reshape(b, h, d)
