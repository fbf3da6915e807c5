"""Jitted generation: prefill + on-device decode loop over the static KV cache.

TPU-native replacement for the reference's monkeypatched HF generation
(/root/reference/qeft/monkeypatch/ftllama_generate.py:181-355): the whole
token-by-token loop runs inside one jit (`lax.fori_loop`), so host<->device
round-trips happen once per sequence instead of once per token.  Greedy and
temperature/top-k/top-p (nucleus) sampling supported.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from qeft_tpu.models.api import ModelApi, get_model_api
from qeft_tpu.models.llama import LlamaConfig, init_kv_cache


@dataclasses.dataclass(frozen=True)
class SampleConfig:
    greedy: bool = True
    temperature: float = 1.0
    top_k: int = 0  # 0 = no top-k
    top_p: float = 1.0  # 1.0 = no nucleus filtering


def warp_logits(logits: jax.Array, sc: SampleConfig) -> jax.Array:
    """The temperature/top-k/top-p logits-warper stack (HF semantics).

    SINGLE definition shared by plain sampling and both sides of speculative
    sampling — the spec accept/resample rule emits exactly the target
    distribution only because draft, target, and sampler all warp through
    this same function."""
    logits = logits.astype(jnp.float32) / sc.temperature
    if sc.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -sc.top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if sc.top_p < 1.0:
        # nucleus: keep the smallest descending-prob prefix with mass > top_p
        # (HF TopPLogitsWarper semantics: the first token crossing the
        # threshold is kept)
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum - probs < sc.top_p  # mass BEFORE this token is < top_p
        n_keep = jnp.maximum(keep.sum(axis=-1, keepdims=True), 1)
        cutoff = jnp.take_along_axis(sorted_logits, n_keep - 1, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


def _sample_token(logits: jax.Array, key: jax.Array, sc: SampleConfig) -> jax.Array:
    if sc.greedy:
        # INVARIANT: the greedy path must never consume ``key`` — generate()'s
        # loop passes the SAME key every step to skip the per-step threefry
        # split.  If greedy tie-breaking ever needs randomness, change
        # generate()'s step() to split unconditionally first.
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(key, warp_logits(logits, sc), axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "sc", "api"))
def _prefill_first(params, prompt, cache, cfg, sc, rng, api):
    logits, cache = api.prefill(params, prompt, cache, cfg)
    rng, k0 = jax.random.split(rng)  # never reuse a consumed key as loop root
    first = _sample_token(logits[:, -1, :], k0, sc)
    return first, cache, rng


def _decode_step_fn(params, i, tokens, cache, key, done, *, b, s_prompt, sc,
                    api, cfg, eos_id):
    if sc.greedy:
        sub = key  # greedy never consumes randomness: skip the per-step
        # threefry split (a serialized extra kernel in the decode chain)
    else:
        key, sub = jax.random.split(key)
    cur = jax.lax.dynamic_slice(tokens, (0, i - 1), (b, 1))
    logits, cache = api.decode_step(
        params, cur, cache, jnp.int32(s_prompt + i - 1), cfg
    )
    nxt = _sample_token(logits, sub, sc)
    if eos_id is not None:
        nxt = jnp.where(done, eos_id, nxt)
        done = done | (nxt == eos_id)
    tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i))
    return tokens, cache, key, done


@partial(jax.jit,
         static_argnames=("cfg", "max_new_tokens", "sc", "api", "s_prompt"),
         donate_argnums=(2,))
def _decode_loop(params, first, cache, rng, s_prompt, cfg, max_new_tokens, sc,
                 api):
    """The decode loop compiled ALONE, with the prefill-produced cache donated
    in.  Keeping prefill out of this program matters: on-chip
    (scripts/genloop_probe2.py) a single fused prefill+loop program ran the
    loop ~1.5 ms/token slower than the identical loop compiled by itself —
    the split costs one extra dispatch (~26 ms through the relay) and wins
    ~380 ms over 256 tokens."""
    b = first.shape[0]
    out_tokens = jnp.zeros((b, max_new_tokens), jnp.int32)
    out_tokens = out_tokens.at[:, 0].set(first)
    step = partial(_decode_step_fn, params, b=b, s_prompt=s_prompt, sc=sc,
                   api=api, cfg=cfg, eos_id=None)
    done0 = jnp.zeros((b,), bool)
    out_tokens, cache, _, _ = jax.lax.fori_loop(
        1, max_new_tokens,
        lambda i, c: step(i, *c), (out_tokens, cache, rng, done0),
    )
    return out_tokens, cache


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "sc", "api",
                                   "eos_id", "s_prompt"))
def _generate_eos(params, first, cache, rng, s_prompt, cfg, max_new_tokens,
                  sc, api, eos_id):
    b = first.shape[0]
    out_tokens = jnp.full((b, max_new_tokens), eos_id, jnp.int32)
    out_tokens = out_tokens.at[:, 0].set(first)
    step = partial(_decode_step_fn, params, b=b, s_prompt=s_prompt, sc=sc,
                   api=api, cfg=cfg, eos_id=eos_id)
    done0 = first == eos_id

    def cond(carry):
        i, _, _, _, done = carry
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(carry):
        i, tokens, cache, key, done = carry
        tokens, cache, key, done = step(i, tokens, cache, key, done)
        return i + 1, tokens, cache, key, done

    _, out_tokens, cache, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), out_tokens, cache, rng, done0)
    )
    return out_tokens, cache


def generate(
    params: Dict,
    prompt: jax.Array,
    cache: Dict,
    cfg,
    max_new_tokens: int,
    sc: SampleConfig = SampleConfig(),
    rng: Optional[jax.Array] = None,
    api: Optional[ModelApi] = None,
    eos_id: Optional[int] = None,
) -> Tuple[jax.Array, Dict]:
    """prompt: [B, S_prompt] -> generated tokens [B, max_new_tokens].

    Runs as TWO compiled programs — prefill, then the whole token loop (the
    loop program gets the cache donated; see `_decode_loop` for why the split
    beats one fused program on-chip).  ``api`` selects the model family's
    forwards (default: llama).  With ``eos_id`` the loop exits early once
    EVERY sequence has emitted EOS (lax.while_loop) and finished sequences
    are eos-padded — the reference's stopping-criteria path (HF generate
    semantics, ftllama_generate.py _sample)."""
    b, s_prompt = prompt.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if api is None:
        api = get_model_api("llama")

    first, cache, rng = _prefill_first(params, prompt, cache, cfg, sc, rng, api)
    if eos_id is None:
        return _decode_loop(params, first, cache, rng, s_prompt, cfg,
                            max_new_tokens, sc, api)
    return _generate_eos(params, first, cache, rng, s_prompt, cfg,
                         max_new_tokens, sc, api, eos_id)


def generate_simple(
    params: Dict,
    prompt: jax.Array,
    cfg: LlamaConfig,
    max_new_tokens: int,
    max_len: Optional[int] = None,
    sc: SampleConfig = SampleConfig(),
    cache_dtype=None,
) -> jax.Array:
    """Convenience wrapper that allocates the cache."""
    b, s = prompt.shape
    max_len = max_len or (s + max_new_tokens)
    cache = init_kv_cache(cfg, b, max_len, dtype=cache_dtype)
    tokens, _ = generate(params, prompt, cache, cfg, max_new_tokens, sc)
    return tokens
