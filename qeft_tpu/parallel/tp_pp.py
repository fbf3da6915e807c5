"""2-D/3-D tensor×pipeline(×data) parallel decode: a ("pp", "tp") mesh —
optionally ("dp", "pp", "tp") with batch rows sharded over the outer dp axis.

The 70B pod shape (BASELINE.md: Llama-2-70B w4/g128 multi-host decode): layers
shard over the OUTER ``pp`` axis (one layer span per stage, exactly
parallel/pp.py), and inside every stage each block's weights shard over the
INNER ``tp`` axis with the megatron-style collectives of
parallel/tp_forward.py — all_gather/psum ride the fast inner-mesh ICI links
while only the thin stage-boundary activation crosses the outer axis once per
tick via ppermute.  The reference's only analogue round-robins whole blocks
over 2 GPUs with blocking copies (/root/reference/qeft/utils/modelutils.py:
21-57, used for its 65B/70B benchmark at benchmark.py:255-256).

Everything (GPipe fill/drain, TP collectives, decode loop) runs inside ONE
shard_map program over the 2-D mesh — two host dispatches per generation
(prefill + whole decode loop), like parallel/pp.py.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qeft_tpu.models.llama import (
    LlamaConfig,
    _embed,
    apply_linear,
    rms_norm,
    rope_tables,
)
from qeft_tpu.parallel.pp import _pick_m_count
from qeft_tpu.parallel.tp_forward import (
    _tp_block_step,
    _tp_specs,
    tp_layer_views,
    tp_shard_packed_params,
)


def _dp_axis(mesh: Mesh):
    """Optional outer data-parallel axis: present iff the mesh names 'dp'.
    The 3-D dp×pp×tp composition shards batch rows (tokens + cache) over it;
    weights replicate and no collective ever crosses it."""
    return "dp" if "dp" in mesh.shape else None


def tppp_shard_params(params: Dict, cache: Dict, mesh: Mesh,
                      cfg: LlamaConfig) -> Tuple[Dict, Dict]:
    """Lay out a stage-fused packed model + cache on the ("pp", "tp") mesh
    (optionally ("dp", "pp", "tp")): layer axis on ``pp``, weight N/K axes on
    ``tp`` (column-interleaved qkv/upgate, shard-major-word o/down — the
    tp_forward contract), KV heads on ``tp``, batch rows on ``dp``."""
    sharded = tp_shard_packed_params(params, mesh, cfg, pp_axis="pp")
    _, cache_specs = _tp_specs(params, cache, pp_axis="pp",
                               dp_axis=_dp_axis(mesh))
    cache = {
        name: jax.device_put(leaf, NamedSharding(mesh, cache_specs[name]))
        for name, leaf in cache.items()
    }
    return sharded, cache


def _tppp_stage_window(params_l, toks, cache_l, pos_, *, cfg: LlamaConfig,
                       n_pp: int, tp: int, m_count: int):
    """One GPipe-scheduled W-token window on the LOCAL (layer-span × tp)
    shards; runs inside shard_map over BOTH mesh axes.  Returns
    (last-position logits [B, V] replicated, updated local cache)."""
    p = jax.lax.axis_index("pp")
    b, w = toks.shape
    mb = b // m_count
    max_len = cache_l["k"].shape[3]
    dtype = params_l["embed"].dtype
    layers = params_l["layers"]
    n_local = jax.tree.leaves(layers)[0].shape[0]
    blk_of = tp_layer_views(layers)

    # replicated prologue: embedding + rope + mask for ALL microbatches
    x0 = _embed(params_l, toks, cfg).reshape(m_count, mb, w, -1)
    positions = pos_ + jnp.arange(w)[None, :]
    cos, sin = rope_tables(cfg, positions)
    key_pos = jnp.arange(max_len)[None, None, None, :]
    query_pos = positions[:, None, :, None]
    mask = jnp.where(key_pos <= query_pos, 0.0, -jnp.inf).astype(jnp.float32)

    def run_span(x, c_mb):
        def body(xc, inp):
            l, c = inp
            return _tp_block_step(blk_of(l), xc, c, cos, sin, mask, pos_,
                                  cfg, tp, dtype)

        return jax.lax.scan(body, x, (jnp.arange(n_local), c_mb))

    v_local = params_l["lm_head"].shape[-1]  # V/tp
    logits_acc = jnp.zeros((m_count, mb, v_local), jnp.float32)
    carry = jnp.zeros_like(x0[0])

    def tick(t, state):
        carry, cache_c, logits_acc = state
        m = t - p  # this stage's microbatch index at tick t
        active = (m >= 0) & (m < m_count)
        m_c = jnp.clip(m, 0, m_count - 1)

        x_in = jnp.where(p == 0, x0[m_c], carry)
        c_mb = jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, m_c * mb, mb, axis=1),
            cache_c,
        )
        x_out, tok = run_span(x_in, c_mb)

        # masked token-granular write-back: only the window's W slots of the
        # microbatch's KV rows (never a full-slab rewrite)
        def wb(a, n):
            start = (0, m_c * mb, 0, pos_, 0)[: a.ndim]
            n = n.astype(a.dtype)
            cur = jax.lax.dynamic_slice(a, start, n.shape)
            return jax.lax.dynamic_update_slice(
                a, jnp.where(active, n, cur), start
            )

        cache_c = jax.tree.map(wb, cache_c, tok)

        # last pp stage: project the final position onto the LOCAL vocab
        # shard (no collective inside the cond — the tp gather happens once,
        # after the tick loop)
        def project(_):
            h = rms_norm(x_out[:, -1:, :], params_l["final_ln"],
                         cfg.rms_norm_eps, cfg.rms_one_offset)
            lg = apply_linear(params_l["lm_head"], h, h.dtype)
            return lg[:, 0, :].astype(jnp.float32)

        take = active & (p == n_pp - 1)
        lg = jax.lax.cond(
            take, project, lambda _: jnp.zeros((mb, v_local), jnp.float32),
            None,
        )
        logits_acc = jax.lax.dynamic_update_slice_in_dim(
            logits_acc,
            jnp.where(
                take,
                lg,
                jax.lax.dynamic_slice_in_dim(logits_acc, m_c, 1, axis=0)[0],
            )[None],
            m_c,
            axis=0,
        )
        carry = jax.lax.ppermute(
            x_out, "pp", [(i, (i + 1) % n_pp) for i in range(n_pp)]
        )
        return carry, cache_c, logits_acc

    n_ticks = n_pp + m_count - 1
    _, cache_l, logits_acc = jax.lax.fori_loop(
        0, n_ticks, tick, (carry, cache_l, logits_acc)
    )
    # only the last pp stage holds real (local-vocab) logits: one psum over
    # pp replicates them, one tiled all_gather over tp assembles the vocab
    logits_local = jax.lax.psum(logits_acc, "pp")
    logits = jax.lax.all_gather(logits_local, "tp", axis=-1, tiled=True)
    return logits.reshape(b, -1), cache_l


@partial(jax.jit, static_argnames=("cfg", "mesh", "n_microbatches"))
def tppp_forward_window(
    params: Dict,
    tokens: jax.Array,  # [B, W]
    cache: Dict,
    pos: jax.Array,  # scalar int32
    cfg: LlamaConfig,
    mesh: Mesh,
    n_microbatches: int = 0,
) -> Tuple[jax.Array, Dict]:
    """Pipelined+tensor-parallel W-token window (W=prompt: sharded prefill;
    W=1: one decode step).  Returns (last-position logits [B, V], cache)."""
    n_pp, tp = mesh.shape["pp"], mesh.shape["tp"]
    dp_ax = _dp_axis(mesh)
    dp = mesh.shape["dp"] if dp_ax else 1
    b = tokens.shape[0]
    assert b % dp == 0, (b, dp)
    m_count = _pick_m_count(b // dp, n_pp, n_microbatches)
    assert cfg.num_layers % n_pp == 0, (cfg.num_layers, n_pp)
    assert cfg.num_heads % tp == 0 and cfg.num_kv_heads % tp == 0
    param_specs, cache_specs = _tp_specs(params, cache, pp_axis="pp",
                                         dp_axis=dp_ax)

    stage = partial(_tppp_stage_window, cfg=cfg, n_pp=n_pp, tp=tp,
                    m_count=m_count)
    return jax.shard_map(
        stage, mesh=mesh,
        in_specs=(param_specs, P(dp_ax, None), cache_specs, P()),
        out_specs=(P(dp_ax, None), cache_specs),
        check_vma=False,
    )(params, tokens, cache, pos)


def tppp_decode_step(
    params: Dict,
    tokens: jax.Array,  # [B, 1]
    cache: Dict,
    pos: jax.Array,
    cfg: LlamaConfig,
    mesh: Mesh,
    n_microbatches: int = 0,
) -> Tuple[jax.Array, Dict]:
    """One decode step on the 2-D mesh. Returns (logits [B, V], new cache)."""
    return tppp_forward_window(params, tokens, cache, pos, cfg, mesh,
                               n_microbatches=n_microbatches)


@partial(jax.jit,
         static_argnames=("cfg", "mesh", "max_new_tokens", "s_prompt",
                          "n_microbatches"))
def _tppp_decode_loop(
    params: Dict,
    first: jax.Array,  # [B]
    cache: Dict,
    s_prompt: int,
    cfg: LlamaConfig,
    mesh: Mesh,
    max_new_tokens: int,
    n_microbatches: int = 0,
):
    """The whole greedy decode loop in ONE shard_map over the (dp×)pp×tp
    mesh."""
    n_pp, tp = mesh.shape["pp"], mesh.shape["tp"]
    dp_ax = _dp_axis(mesh)
    dp = mesh.shape["dp"] if dp_ax else 1
    b = first.shape[0]
    assert b % dp == 0, (b, dp)
    m_count = _pick_m_count(b // dp, n_pp, n_microbatches)
    param_specs, cache_specs = _tp_specs(params, cache, pp_axis="pp",
                                         dp_axis=dp_ax)
    stage = partial(_tppp_stage_window, cfg=cfg, n_pp=n_pp, tp=tp,
                    m_count=m_count)

    def loop(params_l, first, cache_l):
        bl = first.shape[0]
        out = jnp.zeros((bl, max_new_tokens), jnp.int32)
        out = out.at[:, 0].set(first)

        def step(i, state):
            out, cache_l = state
            cur = jax.lax.dynamic_slice(out, (0, i - 1), (bl, 1))
            logits, cache_l = stage(
                params_l, cur, cache_l, jnp.int32(s_prompt) + i - 1
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, i))
            return out, cache_l

        return jax.lax.fori_loop(1, max_new_tokens, step, (out, cache_l))

    return jax.shard_map(
        loop, mesh=mesh,
        in_specs=(param_specs, P(dp_ax), cache_specs),
        out_specs=(P(dp_ax, None), cache_specs),
        check_vma=False,
    )(params, first, cache)


def tppp_generate(
    params: Dict,
    prompt: jax.Array,  # [B, S]
    cache: Dict,
    cfg: LlamaConfig,
    mesh: Mesh,
    max_new_tokens: int,
    n_microbatches: int = 0,
) -> jax.Array:
    """Greedy 2-D-parallel generation, pod-shaped: one pipelined+TP prefill
    program + the whole decode loop in one program — two host dispatches.
    ``params``/``cache`` must come from `tppp_shard_params`.
    Returns tokens [B, max_new_tokens]."""
    b, s_prompt = prompt.shape
    logits, cache = tppp_forward_window(
        params, prompt, cache, jnp.int32(0), cfg, mesh,
        n_microbatches=n_microbatches,
    )
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    out, _ = _tppp_decode_loop(
        params, first, cache, s_prompt, cfg, mesh, max_new_tokens,
        n_microbatches=n_microbatches,
    )
    return out
