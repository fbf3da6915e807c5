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


def _sample_token(logits: jax.Array, key: jax.Array, sc: SampleConfig) -> jax.Array:
    if sc.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
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
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "sc", "api"))
def generate(
    params: Dict,
    prompt: jax.Array,
    cache: Dict,
    cfg,
    max_new_tokens: int,
    sc: SampleConfig = SampleConfig(),
    rng: Optional[jax.Array] = None,
    api: Optional[ModelApi] = None,
) -> Tuple[jax.Array, Dict]:
    """prompt: [B, S_prompt] -> generated tokens [B, max_new_tokens].

    The entire prefill + decode loop is one compiled program.  ``api``
    selects the model family's forwards (default: llama).
    """
    b, s_prompt = prompt.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if api is None:
        api = get_model_api("llama")

    logits, cache = api.prefill(params, prompt, cache, cfg)
    first = _sample_token(logits[:, -1, :], rng, sc)

    out_tokens = jnp.zeros((b, max_new_tokens), jnp.int32)
    out_tokens = out_tokens.at[:, 0].set(first)

    def body(i, carry):
        tokens, cache, key = carry
        key, sub = jax.random.split(key)
        cur = jax.lax.dynamic_slice(tokens, (0, i - 1), (b, 1))
        logits, cache = api.decode_step(
            params, cur, cache, jnp.int32(s_prompt + i - 1), cfg
        )
        nxt = _sample_token(logits, sub, sc)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i))
        return tokens, cache, key

    out_tokens, cache, _ = jax.lax.fori_loop(
        1, max_new_tokens, body, (out_tokens, cache, rng)
    )
    return out_tokens, cache


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
