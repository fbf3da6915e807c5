"""Pallas decode attention over the static KV cache (GQA-aware, length-aware).

TPU-native replacement for the reference's FasterTransformer single-query
attention kernel (`single_query_attention`,
/root/reference/qeft/kernel/attention/decoder_masked_multihead_attention*.cu):
one new token attends over the first ``pos+1`` entries of a statically
allocated cache.

Key trick: the grid covers the whole cache in S-blocks, but the index map
CLAMPS the block index at the current length, so every step past the valid
prefix maps to the same block — pallas skips the DMA when the block index is
unchanged, making HBM traffic proportional to the ACTUAL sequence length (the
reference kernel gets this by looping to ``timestep``; XLA's gather-free
masked attention reads the whole cache).  RoPE is applied outside (it's a
[B,H,D]-sized op, negligible); the reference fuses it only because CUDA kernel
launches are expensive.

Layout: K/V cache [B, S, H_kv, D] (the model's layout) is viewed as
[B, S, H_kv*D] and blocked over S; heads decompose inside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _attn_kernel(
    pos_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, blk: int, n_rep: int, scale: float,
):
    """Flash-style single-query attention over one (batch, s-block) step.

    q_ref: [H, D]; k_ref/v_ref: [blk, H_kv*D] block of the cache
    o_ref: [H, D]; m/l/acc: VMEM scratch carried across s-blocks.
    """
    s_idx = pl.program_id(1)
    n_s = pl.num_programs(1)
    pos = pos_ref[0]

    @pl.when(s_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h, d = q_ref.shape
    hkv = h // n_rep

    @pl.when(s_idx * blk <= pos)
    def _():
        q = q_ref[:].astype(jnp.float32)  # [H, D]
        k = k_ref[:].reshape(blk, hkv, d).astype(jnp.float32)
        v = v_ref[:].reshape(blk, hkv, d).astype(jnp.float32)

        # scores [H, blk]: head h attends kv-head h // n_rep.  Mosaic's
        # dot_general has no general batched form ("batch dims must be
        # equal"), so contract per kv head with plain 2D dots.
        score_rows = []
        for gi in range(hkv):
            q_g = q[gi * n_rep : (gi + 1) * n_rep, :]  # [rep, D]
            k_g = k[:, gi, :]  # [blk, D]
            score_rows.append(
                jax.lax.dot_general(
                    q_g, k_g, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        scores = jnp.concatenate(score_rows, axis=0) * scale  # [H, blk]

        valid = (s_idx * blk + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)) <= pos
        scores = jnp.where(valid, scores, -jnp.inf)

        m_prev = m_ref[:]  # [H, 1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)  # [H, blk]
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv_rows = []
        for gi in range(hkv):
            p_g = p[gi * n_rep : (gi + 1) * n_rep, :]  # [rep, blk]
            v_g = v[:, gi, :]  # [blk, D]
            pv_rows.append(
                jnp.dot(p_g, v_g, preferred_element_type=jnp.float32)
            )
        pv = jnp.concatenate(pv_rows, axis=0)  # [H, D]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(s_idx == n_s - 1)
    def _():
        o_ref[:] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def decode_attention(
    q: jax.Array,  # [B, H, D] (RoPE already applied)
    k_cache: jax.Array,  # [B, S, H_kv, D] (new K already written)
    v_cache: jax.Array,  # [B, S, H_kv, D]
    pos: jax.Array,  # scalar int32: index of the current token
    blk: int = 256,
) -> jax.Array:
    b, h, d = q.shape
    _, s_max, hkv, _ = k_cache.shape
    n_rep = h // hkv
    blk = min(blk, s_max)
    assert s_max % blk == 0
    n_s = s_max // blk
    scale = d**-0.5

    kernel = functools.partial(_attn_kernel, blk=blk, n_rep=n_rep, scale=scale)
    k2 = k_cache.reshape(b, s_max, hkv * d)
    v2 = v_cache.reshape(b, s_max, hkv * d)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    def clamp_idx(bi, si, pos_ref):
        # blocks past the valid prefix re-map to the last valid block: the
        # pallas pipeline skips the DMA when the block index doesn't change
        return (bi, jnp.minimum(si, pos_ref[0] // blk), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_s),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda bi, si, pos_ref: (bi, 0, 0)),
            pl.BlockSpec((1, blk, hkv * d), clamp_idx),
            pl.BlockSpec((1, blk, hkv * d), clamp_idx),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda bi, si, pos_ref: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )

    def kernel3(pos_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
        _attn_kernel(
            pos_ref, q_ref.at[0], k_ref.at[0], v_ref.at[0], o_ref.at[0],
            m_ref, l_ref, acc_ref, blk=blk, n_rep=n_rep, scale=scale,
        )

    out = pl.pallas_call(
        kernel3,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(pos_arr, q, k2, v2)
    return out
