"""Speculative (assisted) decoding: draft-model candidates, single-pass target
verification, KV rollback by position.

Capability parity with the reference's `_assisted_decoding` monkeypatch
(/root/reference/qeft/monkeypatch/ftllama_generate.py:357-639): a small draft
model proposes ``gamma`` tokens, the target scores them in ONE windowed
forward, the longest agreeing prefix is accepted plus one corrected token, and
the static KV cache "rolls back" simply by not advancing ``pos`` past the
accepted length (stale cache entries beyond ``pos`` are masked out — the same
trick as the reference's ``start_pos`` reset, ftllama_generate.py:549-551).

TPU-native: the whole propose-verify loop runs inside one jit
(`lax.while_loop` over rounds, `lax.fori_loop` for the draft steps); per-round
acceptance is a vectorized prefix computation, and the output buffer advances
by a traced offset.  Greedy verification reproduces the target model's greedy
output exactly (tested), matching the reference's do_sample=False path.
Acceptance-rate / accept-length telemetry is returned like the reference's
(ftllama_generate.py:539-541,635-636).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from qeft_tpu.generate import SampleConfig
from qeft_tpu.models.llama import LlamaConfig, llama_prefill


def _warp_probs(logits: jax.Array, sc: SampleConfig) -> jax.Array:
    """Post-processing distribution both models sample from, matching the
    reference's logits-warper stack applied before `_speculative_sampling`
    (ftllama_generate.py:468-474).  Delegates to generate.warp_logits — the
    ONE warper definition — so draft, target, and the plain sampler stay
    identical by construction (the exact-target-distribution guarantee of
    the accept/resample rule depends on it)."""
    from qeft_tpu.generate import warp_logits

    return jax.nn.softmax(warp_logits(logits, sc), axis=-1)


def speculative_accept(
    cand: jax.Array,  # [gamma] int32 draft tokens
    probs_d: jax.Array,  # [gamma, V] draft distributions they were sampled from
    probs_t: jax.Array,  # [gamma+1, V] target distributions (last = bonus pos)
    key: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """The accept/resample rule of speculative SAMPLING (reference
    `_speculative_sampling`, ftllama_generate.py:410-530; Leviathan et al.).

    Draft token i is accepted with prob min(1, p_t(x_i)/p_d(x_i)); at the
    first rejection the corrected token is drawn from norm((p_t - p_d)+);
    if all gamma are accepted the bonus token is drawn from p_t[gamma].
    Returns (n_accept, corrected_token).  Marginally, the emitted token at
    every position is distributed exactly as p_t (tested empirically).
    """
    gamma = cand.shape[0]
    k_u, k_r = jax.random.split(key)
    u = jax.random.uniform(k_u, (gamma,))
    idx = jnp.arange(gamma)
    p_t_x = probs_t[idx, cand]  # [gamma]
    p_d_x = probs_d[idx, cand]
    accept = u * p_d_x < p_t_x  # u < p_t/p_d, safe when p_d == 0
    n_accept = jnp.argmin(
        jnp.concatenate([accept, jnp.zeros((1,), bool)])
    ).astype(jnp.int32)

    # corrected token: residual resample at the rejection position, or the
    # bonus draw from p_t[gamma] when everything was accepted
    residual = jnp.maximum(probs_t[n_accept] - probs_d[jnp.minimum(n_accept, gamma - 1)], 0.0)
    resample_dist = jnp.where(n_accept == gamma, probs_t[gamma], residual)
    # degenerate residual (p_t == p_d exactly): fall back to p_t
    resample_dist = jnp.where(
        jnp.sum(resample_dist) > 0.0, resample_dist, probs_t[n_accept]
    )
    corrected = jax.random.categorical(k_r, jnp.log(resample_dist)).astype(jnp.int32)
    return n_accept, corrected


def _single_seq_telemetry(tel):
    return {
        "rounds": tel["rounds"],
        "accepted_total": tel["accepted_per_seq"][0],
        "mean_accept_length": tel["mean_accept_length"],
    }


def layer_sliced_draft(params: Dict, cfg: LlamaConfig, n_layers: int):
    """SELF-speculative draft: a depth-sliced view of the target itself.

    Keeps ``n_layers`` evenly-strided decoder layers (always including the
    first and last) plus the target's own embed/final_ln/lm_head, so the
    draft shares every weight with the target — zero extra HBM beyond its own
    KV cache — yet stays strongly correlated with the target's predictions
    (LayerSkip-style early exit, but over a strided subnetwork).  This is a
    capability the reference cannot offer: its draft must be a separate HF
    model (`_assisted_decoding` assistant_model, ftllama_generate.py:357-449),
    doubling weight memory; here the stacked [L, ...] layer pytree makes a
    strided slice a metadata-cheap gather.

    Works for dense and packed params alike (QLinearParams leaves and the
    o_reorder gather table all stack on axis 0).  Returns (draft_params,
    draft_cfg)."""
    import dataclasses

    import numpy as np

    assert 1 <= n_layers <= cfg.num_layers
    idx = jnp.asarray(
        np.unique(np.round(np.linspace(0, cfg.num_layers - 1, n_layers)).astype(np.int32))
    )
    draft = dict(params)
    draft["layers"] = jax.tree.map(lambda a: a[idx], params["layers"])
    return draft, dataclasses.replace(cfg, num_layers=int(idx.size))


def speculative_generate(
    target_params: Dict,
    draft_params: Dict,
    prompt: jax.Array,  # [B=1, S]
    t_cache: Dict,
    d_cache: Dict,
    cfg_t: LlamaConfig,
    cfg_d: LlamaConfig,
    max_new_tokens: int,
    gamma: int = 4,
) -> Tuple[jax.Array, Dict]:
    """Greedy speculative decoding (reference parity surface: B=1).
    Returns (tokens [1, max_new_tokens], telemetry {rounds, accepted_total}).

    The emitted sequence equals the target model's own greedy decode.
    Thin wrapper over the batched implementation (one round definition)."""
    assert prompt.shape[0] == 1, "use speculative_generate_batched for B>1"
    out, tel = speculative_generate_batched(
        target_params, draft_params, prompt, t_cache, d_cache, cfg_t, cfg_d,
        max_new_tokens, jax.random.PRNGKey(0), gamma=gamma, greedy=True,
    )
    return out, _single_seq_telemetry(tel)


def speculative_generate_sampled(
    target_params: Dict,
    draft_params: Dict,
    prompt: jax.Array,  # [B=1, S]
    t_cache: Dict,
    d_cache: Dict,
    cfg_t: LlamaConfig,
    cfg_d: LlamaConfig,
    max_new_tokens: int,
    rng: jax.Array,
    gamma: int = 4,
    sc: SampleConfig = SampleConfig(greedy=False),
) -> Tuple[jax.Array, Dict]:
    """Speculative SAMPLING (do_sample path of the reference's
    `_assisted_decoding`, ftllama_generate.py:410-530): the emitted sequence
    is distributed exactly as sampling from the target alone, but costs one
    target forward per ~(1 + mean_accept_length) tokens.  Thin wrapper over
    the batched implementation."""
    assert prompt.shape[0] == 1, "use speculative_generate_batched for B>1"
    out, tel = speculative_generate_batched(
        target_params, draft_params, prompt, t_cache, d_cache, cfg_t, cfg_d,
        max_new_tokens, rng, gamma=gamma, sc=sc, greedy=False,
    )
    return out, _single_seq_telemetry(tel)


def spec_round(
    target_params: Dict,
    draft_params: Dict,
    last: jax.Array,  # [B, 1] last emitted token per sequence
    t_cache: Dict,
    d_cache: Dict,
    base_pos: jax.Array,  # [B] absolute position of `last`
    cfg_t: LlamaConfig,
    cfg_d: LlamaConfig,
    gamma: int,
    sc: SampleConfig,
    greedy: bool,
    key: jax.Array,
):
    """ONE batched speculative round: gamma ragged draft steps, one ragged
    target verify window, per-sequence accept/resample.  Shared by
    `speculative_generate_batched` and the serving engine's `_spec_tick`
    (single definition — the exactness guarantee must not fork).

    Returns (emit [B, gamma+1], n_accept [B], t_cache, d_cache): sequence b
    emits emit[b, :n_accept[b]+1].
    """
    from qeft_tpu.models.llama import (
        llama_decode_step_ragged,
        llama_forward_window_ragged,
    )

    b = last.shape[0]
    vocab = cfg_t.vocab_size
    k_draft, k_acc = jax.random.split(key)

    # --- draft: gamma ragged decode steps (every sequence at its own pos)
    def draft_step(i, c):
        cand, pd, d_cache, cur = c
        logits, d_cache = llama_decode_step_ragged(
            draft_params, cur, d_cache, base_pos + i, cfg_d
        )
        if greedy:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            probs = jax.nn.one_hot(nxt, vocab, dtype=jnp.float32)
        else:
            probs = _warp_probs(logits, sc)  # [B, V]
            nxt = jax.random.categorical(
                jax.random.fold_in(k_draft, i), jnp.log(probs), axis=-1
            ).astype(jnp.int32)
        cand = cand.at[:, i].set(nxt)
        pd = pd.at[:, i].set(probs)
        return cand, pd, d_cache, nxt[:, None]

    cand = jnp.zeros((b, gamma), jnp.int32)
    pd = jnp.zeros((b, gamma, vocab), jnp.float32)
    cand, pd, d_cache, cur = jax.lax.fori_loop(
        0, gamma, draft_step, (cand, pd, d_cache, last)
    )
    # one extra draft step to WRITE cand[gamma-1]'s KV at base_pos+gamma: on a
    # full-accept round the next round starts at base_pos+gamma+1 and this
    # position would otherwise stay a permanent zero hole in the draft cache,
    # silently degrading every later round's acceptance rate.  On partial
    # acceptance the entry is stale but positionally masked until the next
    # round overwrites it (same rollback argument as the module docstring).
    _, d_cache = llama_decode_step_ragged(
        draft_params, cur, d_cache, base_pos + gamma, cfg_d
    )

    # --- target: one ragged verify window per sequence
    window = jnp.concatenate([last, cand], axis=1)  # [B, gamma+1]
    t_logits, t_cache = llama_forward_window_ragged(
        target_params, window, t_cache, base_pos, cfg_t
    )

    if greedy:
        t_pred = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)
        agree = cand == t_pred[:, :gamma]
        n_accept = jnp.argmin(
            jnp.concatenate([agree, jnp.zeros((b, 1), bool)], axis=1), axis=1
        ).astype(jnp.int32)
        corrected = t_pred[jnp.arange(b), n_accept]
    else:
        pt = _warp_probs(t_logits, sc)  # [B, gamma+1, V]
        keys = jax.random.split(k_acc, b)
        n_accept, corrected = jax.vmap(speculative_accept)(cand, pd, pt, keys)

    idx = jnp.arange(gamma + 1)
    emit = jnp.where(
        idx[None, :] < n_accept[:, None],
        jnp.pad(cand, ((0, 0), (0, 1))),
        corrected[:, None],
    )  # [B, gamma+1]
    return emit, n_accept, t_cache, d_cache


@partial(
    jax.jit,
    static_argnames=("cfg_t", "cfg_d", "max_new_tokens", "gamma", "sc", "greedy"),
)
def speculative_generate_batched(
    target_params: Dict,
    draft_params: Dict,
    prompt: jax.Array,  # [B, S]
    t_cache: Dict,
    d_cache: Dict,
    cfg_t: LlamaConfig,
    cfg_d: LlamaConfig,
    max_new_tokens: int,
    rng: jax.Array,
    gamma: int = 4,
    sc: SampleConfig = SampleConfig(greedy=False),
    greedy: bool = False,
) -> Tuple[jax.Array, Dict]:
    """BATCHED speculative decoding with per-sequence accept lengths.

    Beyond both the reference and HF assisted decoding (batch==1 only,
    ftllama_generate.py:357-639): every sequence drafts, verifies, and rolls
    back independently at its own position via the ragged window forward —
    KV rollback is positional per sequence, so a rejection in one sequence
    never stalls the others.  ``greedy=True`` reproduces each sequence's own
    greedy decode; otherwise each emitted token is distributed exactly as
    target-only sampling (per-sequence accept/resample rule).

    Caches must have >= s_prompt + max_new_tokens + gamma + 1 slots (the last
    round may scribble up to gamma tokens past a sequence's accepted length).
    Returns (tokens [B, max_new_tokens], telemetry).
    """
    b, s_prompt = prompt.shape

    t_logits, t_cache = llama_prefill(target_params, prompt, t_cache, cfg_t)
    _, d_cache = llama_prefill(draft_params, prompt, d_cache, cfg_d)
    rng, k0 = jax.random.split(rng)
    if greedy:
        first = jnp.argmax(t_logits[:, -1, :], axis=-1).astype(jnp.int32)
    else:
        first = jax.random.categorical(
            k0, jnp.log(_warp_probs(t_logits[:, -1, :], sc)), axis=-1
        ).astype(jnp.int32)

    out = jnp.zeros((b, max_new_tokens + gamma + 1), jnp.int32)
    out = out.at[:, 0].set(first)
    n_done = jnp.ones((b,), jnp.int32)

    init = (out, n_done, t_cache, d_cache, rng, jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), jnp.int32))

    def cond(carry):
        _, n_done, *_ = carry
        return jnp.any(n_done < max_new_tokens)

    def body(carry):
        out, n_done, t_cache, d_cache, rng, rounds, accepted = carry
        rng, key = jax.random.split(rng)
        bidx = jnp.arange(b)
        last = out[bidx, n_done - 1][:, None]  # [B, 1]
        base_pos = s_prompt + n_done - 1  # [B]

        emit, n_accept, t_cache, d_cache = spec_round(
            target_params, draft_params, last, t_cache, d_cache, base_pos,
            cfg_t, cfg_d, gamma, sc, greedy, key,
        )

        # --- emit per sequence at its own offset (inactive sequences emit 0)
        active = n_done < max_new_tokens
        emitted_len = jnp.where(active, n_accept + 1, 0)

        def write_seq(o_row, e_row, start, e_len):
            def w(i, r):
                return jax.lax.cond(
                    i < e_len,
                    lambda rr: jax.lax.dynamic_update_slice(rr, e_row[i][None], (start + i,)),
                    lambda rr: rr,
                    r,
                )
            return jax.lax.fori_loop(0, gamma + 1, w, o_row)

        out = jax.vmap(write_seq)(out, emit, n_done, emitted_len)
        return (
            out,
            n_done + emitted_len,
            t_cache,
            d_cache,
            rng,
            rounds + active.astype(jnp.int32),  # per-seq participation
            accepted + jnp.where(active, n_accept, 0),
        )

    out, n_done, t_cache, d_cache, rng, rounds, accepted = jax.lax.while_loop(
        cond, body, init
    )
    # per-sequence acceptance over the rounds that sequence actually ran
    per_seq = accepted.astype(jnp.float32) / jnp.maximum(
        rounds.astype(jnp.float32), 1.0
    )
    telemetry = {
        "rounds": rounds.max(),
        "rounds_per_seq": rounds,
        "accepted_per_seq": accepted,
        "mean_accept_length": jnp.mean(per_seq),
    }
    return out[:, :max_new_tokens], telemetry
