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

    total = 0.0
    for i in range(n_windows):
        window = jnp.asarray(test_tokens[i * seqlen : (i + 1) * seqlen])[None, :]
        total += float(_window_nll(params, window, cfg, api))
    return float(np.exp(total / (n_windows * (seqlen - 1))))


@partial(jax.jit, static_argnames=("cfg",))
def _final_nll(x, final_ln, lm_head, tokens, cfg):
    from qeft_tpu.models.llama import apply_linear, rms_norm

    h = rms_norm(x, final_ln, cfg.rms_norm_eps, cfg.rms_one_offset)
    logits = apply_linear(lm_head, h, h.dtype).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[:, 1:][..., None], axis=-1)[..., 0]
    return jnp.sum(nll)


def eval_ppl_streamed(
    params: Dict,
    test_tokens: np.ndarray,
    cfg,
    meta,
    seqlen: int = 2048,
    max_windows: int = 0,
) -> float:
    """Layer-streaming PPL eval for models bigger than device memory.

    The reference's harness is layer-streamed for the same reason
    (/root/reference/qeft/main.py:195-308: blocks move CPU<->GPU around each
    use).  Params stay host-resident; one decoder block at a time lands on
    the device and forwards ALL eval windows before the next block loads.
    llama-family (the 7B/13B/70B presets) — other families fit eval_ppl.
    """
    import jax as _jax

    from qeft_tpu.pipeline import _block_at, _family_ops

    n_windows = len(test_tokens) // seqlen
    if max_windows:
        n_windows = min(n_windows, max_windows)
    if n_windows == 0:
        raise ValueError(
            f"test set ({len(test_tokens)} tokens) shorter than one eval "
            f"window (seqlen={seqlen}); pass a smaller --seqlen"
        )
    windows = np.stack(
        [test_tokens[i * seqlen : (i + 1) * seqlen] for i in range(n_windows)]
    )
    tokens = jnp.asarray(windows)

    embed_fn, _, fwd_fn = _family_ops(meta)
    dev = _jax.devices()[0] if _jax.default_backend() != "cpu" else None
    x = _jax.device_put(embed_fn(params, tokens, cfg), dev)
    for i in range(cfg.num_layers):
        blk = _block_at(params["layers"], i, dev)
        x = fwd_fn(blk, x, cfg)

    final_ln = _jax.device_put(jnp.asarray(params["final_ln"]), dev)
    lm_head = _jax.device_put(jax.tree.map(jnp.asarray, params["lm_head"]), dev)
    total = 0.0
    for i in range(n_windows):  # per window: logits are 0.5 GB fp32 at 7B
        total += float(_final_nll(x[i : i + 1], final_ln, lm_head,
                                  tokens[i : i + 1], cfg))
    return float(np.exp(total / (n_windows * (seqlen - 1))))
