"""Weak-column tuning (WCT): train ONLY the fp outlier slabs of a packed model.

Capability parity with the reference finetune driver
(/root/reference/qeft/finetune.py): `set_for_wct` makes each QuantLinear's
`oweight` a trainable fp32 parameter (qlinear.py:239-242), everything else is
frozen, and gradients flow through the quantized matmul
(`QuantMatMulQEFT`, qlinear.py:13-44).

TPU-native re-design: the packed params pytree is *partitioned* into
(trainable oweights, frozen rest).  The quantized matmul carries a
`jax.custom_vjp` (ops/qlinear.py), so training differentiates THROUGH the
Pallas kernels on TPU: backward streams the packed codes via the transposed
Pallas GEMM (`qgemm_t`) for grad_input — the true transpose, fixing the
reference's square-layer-only quirk (it multiplies by the untransposed packed
weight, qlinear.py:38-39) — plus the exact fp-slab grads.  Gradient
checkpointing = `jax.checkpoint` over the block scan.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from qeft_tpu.models.llama import (
    LlamaConfig,
    _causal_mask,
    apply_linear,
    llama_block,
    rms_norm,
    rope_tables,
)
from qeft_tpu.models.registry import ModelMeta
from qeft_tpu.ops.packing import QLinearParams

IGNORE_INDEX = -100


@dataclasses.dataclass
class TrainConfig:
    """Defaults mirror the reference's Platypus-style setup
    (finetune.py:98-263): AdamW, cosine schedule, warmup 3%, bf16 compute."""

    learning_rate: float = 2e-4
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    grad_accum: int = 1
    max_grad_norm: float = 0.3
    lr_schedule: str = "cosine"  # or "constant"
    remat: bool = True


# ---------------------------------------------------------------------------
# parameter partition


def split_wct(packed_params: Dict, meta: ModelMeta) -> Tuple[Dict, Dict]:
    """(trainable oweights fp32, frozen rest). Reference `set_for_wct`."""
    oweights = {}
    frozen_layers = dict(packed_params["layers"])
    for name, lin in packed_params["layers"].items():
        if not isinstance(lin, QLinearParams):
            continue  # norms, reorder ids
        if lin.oweight is not None:
            # explicit copy: the trainable buffer gets donated by train_step
            # and must not alias the packed model's slab
            oweights[name] = jnp.array(lin.oweight, dtype=jnp.float32, copy=True)
            frozen_layers[name] = dataclasses.replace(lin, oweight=None)
    frozen = dict(packed_params)
    frozen["layers"] = frozen_layers
    return oweights, frozen


def merge_wct(oweights: Dict, frozen: Dict) -> Dict:
    layers = dict(frozen["layers"])
    for name, ow in oweights.items():
        layers[name] = dataclasses.replace(layers[name], oweight=ow)
    params = dict(frozen)
    params["layers"] = layers
    return params


# ---------------------------------------------------------------------------
# training forward / loss


def llama_forward_train(params: Dict, tokens: jax.Array, cfg: LlamaConfig, remat: bool = True):
    """Full-sequence forward with optional rematerialized blocks.

    Uses the serving path's `_embed` and norm numerics (gemma's embedding
    scale and (1+w) norm offset included) so training optimizes exactly the
    model that will be served."""
    from qeft_tpu.models import llama as _llama_mod
    from qeft_tpu.models.llama import _embed

    b, s = tokens.shape
    # this forward is DIFFERENTIATED (WCT trains the oweight slabs through
    # it) and the flash pallas_call has no JVP rule — pin the XLA attention
    # for the whole trace (trace-time only: jax.checkpoint/grad rewrite the
    # jaxpr, they never re-run this Python)
    prev_flash = _llama_mod._FLASH_ATTN_OVERRIDE
    _llama_mod._FLASH_ATTN_OVERRIDE = False
    try:
        x = _embed(params, tokens, cfg)
        pos = jnp.arange(s)[None, :]
        cos, sin = rope_tables(cfg, pos)
        mask = _causal_mask(s)

        def body(xc, blk):
            out, _, _ = llama_block(blk, xc, cfg, cos, sin, mask)
            return out, None

        if remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, params["layers"])
        x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps,
                     cfg.rms_one_offset)
        return apply_linear(params["lm_head"], x, x.dtype)
    finally:
        _llama_mod._FLASH_ATTN_OVERRIDE = prev_flash


def causal_lm_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Shifted CE; positions with label == IGNORE_INDEX are masked
    (the reference's prompt-masked Alpaca/qlora collators, finetune.py:518-569)."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != IGNORE_INDEX
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    token_loss = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    token_loss = jnp.where(valid, token_loss, 0.0)
    return jnp.sum(token_loss) / jnp.maximum(jnp.sum(valid), 1)


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    if tc.lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, tc.learning_rate, int(tc.total_steps * tc.warmup_ratio) + 1,
            tc.total_steps,
        )
    else:
        sched = optax.join_schedules(
            [
                optax.linear_schedule(0.0, tc.learning_rate, int(tc.total_steps * tc.warmup_ratio) + 1),
                optax.constant_schedule(tc.learning_rate),
            ],
            [int(tc.total_steps * tc.warmup_ratio) + 1],
        )
    opt = optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm),
        optax.adamw(sched, weight_decay=tc.weight_decay),
    )
    if tc.grad_accum > 1:
        opt = optax.MultiSteps(opt, tc.grad_accum)
    return opt


def _train_forward(family: str, remat: bool):
    """Family-dispatched training forward.  llama/gemma get the block-remat
    forward; other families run their plain full-sequence forward, wrapped
    whole in jax.checkpoint when remat is on (coarser than per-block remat
    but bounds activation memory the same way)."""
    if family in ("llama", "gemma"):
        return lambda params, tokens, cfg: llama_forward_train(
            params, tokens, cfg, remat
        )
    from qeft_tpu.models.api import get_model_api

    fwd = get_model_api(family).forward
    if remat:
        return jax.checkpoint(fwd, static_argnums=(2,))
    return fwd


@partial(jax.jit, static_argnames=("cfg", "remat", "family"))
def wct_loss(oweights, frozen, input_ids, labels, cfg, remat: bool = True,
             family: str = "llama"):
    params = merge_wct(oweights, frozen)
    logits = _train_forward(family, remat)(params, input_ids, cfg)
    return causal_lm_loss(logits, labels)


def make_train_step(cfg, opt, remat: bool = True, family: str = "llama"):
    forward = _train_forward(family, remat)

    @partial(jax.jit, donate_argnames=("oweights", "opt_state"))
    def train_step(oweights, opt_state, frozen, input_ids, labels):
        def loss_fn(ow):
            params = merge_wct(ow, frozen)
            logits = forward(params, input_ids, cfg)
            return causal_lm_loss(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(oweights)
        updates, opt_state = opt.update(grads, opt_state, oweights)
        oweights = optax.apply_updates(oweights, updates)
        return oweights, opt_state, loss

    return train_step
