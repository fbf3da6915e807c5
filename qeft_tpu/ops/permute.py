"""Banded MXU realization of the OGR o-projection input permutation.

The global reorder leaves exactly one runtime permutation in the model: the
o-projection's input gather over attention head space (`blk["o_reorder"]`;
reference analogue /root/reference/qeft/qlinear.py:273-275).  On GPUs a
4096-lane gather is ~free; on TPU a dynamic (or even static) lane gather
executes element-wise through vector memory — measured 1.07 ms/token of the
7B decode step, the single largest piece of non-matvec glue
(scripts/residual_probe.py, scripts/gather_probe.py).

The permutation produced by OGR is not arbitrary: `sparse_to_dense_ids`
builds a COMPACTION — non-outlier channels keep their relative order,
outliers move to the tail.  Every non-tail output position j therefore
sources from within [j, j + r] (at most r outliers precede it), so output
128-block b reads only from input blocks [b, b + 1 + ceil(r/128)).  The
gather factors exactly into:

  - a block-banded one-hot matmul: nb batched [W -> 128] dots over sliding
    input windows (W = 128 * (1 + ceil(r/128)); ~2 MB/layer streamed), and
  - a dense one-hot tail selection [K -> tail_w] for the scattered outlier
    channels (~1 MB/layer).

Both are MXU dots with one-hot operands, bit-exact vs `jnp.take` (the single
nonzero product reproduces the input value exactly in f32 accumulation; the
cast back returns the original value).  On-chip: 0.28 ms/token vs 1.15 for
the gather (gather_probe.py), a ~0.87 ms/token decode win at 7B.

The one-hot operands ride the params tree as stacked layer leaves
(``o_band`` [L, nb, W, 128], ``o_tail`` [L, K, tail_w]) attached at load
time by `attach_o_band` — checkpoints still store only the index form
(``o_reorder`` [L, K]), and every forward falls back to `jnp.take` when the
leaves are absent (non-compaction imports, QEFT_O_BAND=0).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _enabled() -> bool:
    return os.environ.get("QEFT_O_BAND", "1") not in ("0", "", "false")


def build_banded_perm(
    o_reorder, n_tail: int, dtype=jnp.bfloat16
) -> Optional[Tuple[jax.Array, jax.Array]]:
    """[L, K] permutation ids + outlier count -> (band, tail) one-hot
    operands, or None when the ids are not a bandwidth-r compaction (then
    callers keep the `jnp.take` path).

    band [L, nb, W, 128]: out block b (b < nb) = window_b @ band[l, b] where
    window_b = input rows [128b, 128b + W).  tail [L, K, tail_w]: the last
    ``tail_w = K - 128*nb`` outputs = x @ tail[l] (covers the r outliers plus
    any compaction remainder when 128 does not divide K - r).
    """
    ids = np.asarray(o_reorder)
    if ids.ndim != 2:
        return None
    L, K = ids.shape
    r = int(n_tail)
    if K % 128 or r <= 0 or r >= K:
        return None
    nb = (K - r) // 128  # fully-banded output blocks
    if nb <= 0:
        return None
    tail_w = K - nb * 128
    wblk = 1 + -(-r // 128)
    W = 128 * wblk

    band = np.zeros((L, nb, W, 128), np.float32)
    tail = np.zeros((L, K, tail_w), np.float32)
    j_band = np.arange(nb * 128)
    b_of = j_band // 128
    for l in range(L):
        src = ids[l, : nb * 128]
        off = src - 128 * b_of
        if (off < 0).any() or (off >= W).any():
            return None  # not a compaction: fall back to the gather
        band[l, b_of, off, j_band % 128] = 1.0
        tail[l, ids[l, nb * 128 :], np.arange(tail_w)] = 1.0
    return jnp.asarray(band, dtype), jnp.asarray(tail, dtype)


def apply_banded_perm(x: jax.Array, band: jax.Array, tail: jax.Array) -> jax.Array:
    """x [..., K] -> x[..., ids] via the banded one-hot dots (bit-exact)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    nb, w, _ = band.shape
    wblk = w // 128
    x2 = x.reshape(-1, k)
    mat = x2.reshape(-1, k // 128, 128)
    # window_b = rows [b, b+wblk) flattened: sliding windows via shifted slices
    pairs = jnp.concatenate(
        [mat[:, b0 : b0 + nb] for b0 in range(wblk)], axis=-1
    )  # [M, nb, W]
    # same-dtype dots: with one-hot operands every accumulation adds zero, so
    # the result is exact in ANY dtype (and the CPU backend lacks the
    # bf16xbf16->f32 dot the TPU MXU provides)
    bd = jnp.einsum("mbk,bkn->mbn", pairs, band.astype(x.dtype))
    tl = jnp.dot(x2, tail.astype(x.dtype))
    out = jnp.concatenate([bd.reshape(-1, nb * 128), tl], axis=-1)
    return out.astype(x.dtype).reshape(*lead, k)


def apply_o_reorder(ctx: jax.Array, blk: Dict) -> jax.Array:
    """The o-projection input permutation: banded MXU form when the operands
    ride the block, else the plain gather, else identity."""
    if "o_band" in blk:
        return apply_banded_perm(ctx, blk["o_band"], blk["o_tail"])
    if "o_reorder" in blk:
        return jnp.take(ctx, blk["o_reorder"], axis=-1)
    return ctx


def attach_o_band(params: Dict, o_name: str = "o") -> Dict:
    """Attach the banded operands for a stacked packed model (load-time; the
    checkpoint keeps only ``o_reorder``).  No-op when disabled, absent, or
    not representable."""
    layers = params.get("layers", {})
    if not _enabled() or "o_reorder" not in layers or "o_band" in layers:
        return params
    o_lin = layers.get(o_name)
    n_tail = getattr(o_lin, "n_outlier", 0)
    built = build_banded_perm(layers["o_reorder"], n_tail)
    if built is None:
        return params
    band, tail = built
    return {
        **params,
        "layers": {**layers, "o_band": band, "o_tail": tail},
    }
