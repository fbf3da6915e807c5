"""Perplexity evaluation harness.

Reference `eval_ppl` (/root/reference/qeft/main.py:195-308) streams seqlen-token
windows of the test set through the model and reports exp(mean CE).  Same
protocol here, jitted per window; works on fake-quantized, packed, or fp
params (the packed path vs fake path PPL equality is the reference's
correctness oracle, README.md:55-59).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qeft_tpu.models.api import ModelApi, get_model_api


@partial(jax.jit, static_argnames=("cfg", "api"))
def _window_nll(params: Dict, tokens: jax.Array, cfg, api: ModelApi) -> jax.Array:
    """Sum of next-token negative log-likelihoods over one [1, S] window."""
    logits = api.forward(params, tokens, cfg).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll)


def eval_ppl(
    params: Dict,
    test_tokens: np.ndarray,
    cfg,
    seqlen: int = 2048,
    max_windows: int = 0,
    api: Optional[ModelApi] = None,
    family: str = "llama",
) -> float:
    """exp( total NLL / total predicted tokens ) over seqlen windows."""
    api = api or get_model_api(family)
    n_windows = len(test_tokens) // seqlen
    if max_windows:
        n_windows = min(n_windows, max_windows)
    if n_windows == 0:
        raise ValueError(
            f"test set ({len(test_tokens)} tokens) shorter than one eval "
            f"window (seqlen={seqlen}); pass a smaller --seqlen"
        )
    assert n_windows > 0, "test stream shorter than one window"

    total = 0.0
    for i in range(n_windows):
        window = jnp.asarray(test_tokens[i * seqlen : (i + 1) * seqlen])[None, :]
        total += float(_window_nll(params, window, cfg, api))
    return float(np.exp(total / (n_windows * (seqlen - 1))))
