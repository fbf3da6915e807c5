"""Uniform affine weight quantizer: per-out-channel min-max or MSE grid search.

Capability parity with the reference Quantizer (/root/reference/qeft/quant.py:16-192):
per-channel scale/zero over weight rows, symmetric or asymmetric ranges, and an
MSE-based grid search over range shrinkage (and, asymmetric, zero-point sweep)
scored with an Lp (p=2.4) loss.  Re-designed functional/jittable: parameters are
returned, never stored on modules, and the grid search is a `lax.fori_loop`
(compiler-friendly, runs on CPU or TPU).

Weight orientation convention for this module: ``w`` is ``[OC, C]`` — one
quantization channel per *row* (matches the reference's `find_params(x, weight=True)`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp

EPS = 1e-8


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static configuration of the quantizer (hashable; safe as a jit static arg)."""

    bits: int = 4
    sym: bool = False
    mse: bool = True
    norm: float = 2.4
    group_size: int = -1  # -1: one group spanning the whole row

    @property
    def n_levels(self) -> int:
        return 2**self.bits

    @property
    def minq(self) -> int:
        # reference: quant.py:35-38
        if self.sym:
            return -((self.n_levels - 1) // 2 + 1)
        return 0

    @property
    def maxq(self) -> int:
        if self.sym:
            return (self.n_levels - 1) // 2
        return self.n_levels - 1


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantParams:
    """Per-channel affine parameters. ``scale``/``zero`` are ``[OC]`` (or ``[OC, G]``
    when accumulated over groups)."""

    scale: jax.Array
    zero: jax.Array

    def tree_flatten(self):
        return (self.scale, self.zero), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def quantize(w: jax.Array, scale: jax.Array, zero: jax.Array, spec: QuantSpec) -> jax.Array:
    """Fake-quantize ``w`` with the given affine params (reference quant.py:8-10)."""
    q = jnp.clip(jnp.round(w / scale) + zero, spec.minq, spec.maxq)
    return scale * (q - zero)


def quantize_int(w: jax.Array, scale: jax.Array, zero: jax.Array, spec: QuantSpec) -> jax.Array:
    """Integer codes for ``w`` (what gets packed)."""
    return jnp.clip(jnp.round(w / scale) + zero, spec.minq, spec.maxq).astype(jnp.int32)


def _lp_loss(pred: jax.Array, tgt: jax.Array, p: float) -> jax.Array:
    """Row-wise mean |pred-tgt|^p (reference quant.py:43-49, perchannel)."""
    return jnp.mean(jnp.abs(pred - tgt) ** p, axis=-1)


def _minmax_params(w, spec: QuantSpec):
    """Plain min-max range (reference quant.py:142-158)."""
    zeros_like = jnp.zeros((w.shape[0],), w.dtype)
    xmin = jnp.minimum(jnp.min(w, axis=-1), zeros_like)
    xmax = jnp.maximum(jnp.max(w, axis=-1), zeros_like)

    if spec.sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)

    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)

    if spec.sym:
        scale = xmax / -spec.minq
        zero = jnp.zeros_like(scale)
    else:
        scale = (xmax - xmin) / spec.maxq
        zero = jnp.round(-xmin / scale)
    return scale, zero


def _mse_params_sym(w, spec: QuantSpec, num: int):
    """Symmetric MSE grid search over range shrinkage (reference quant.py:95-114)."""
    minq, maxq = spec.minq, spec.maxq
    zeros_like = jnp.zeros((w.shape[0],), w.dtype)
    xmin = jnp.minimum(jnp.min(w, axis=-1), zeros_like)
    xmax = jnp.maximum(jnp.max(w, axis=-1), zeros_like)
    xrange = jnp.maximum(jnp.abs(xmin), xmax)

    def body(i, carry):
        best_score, best_max = carry
        tmp_max = xrange / num * (i.astype(w.dtype) + 1.0)
        scale = jnp.maximum(tmp_max / -minq, EPS)
        wq = quantize(w, scale[:, None], 0.0, spec)
        score = _lp_loss(w, wq, spec.norm)
        better = score < best_score
        return jnp.minimum(score, best_score), jnp.where(better, tmp_max, best_max)

    init = (jnp.full((w.shape[0],), 1e10, w.dtype), xmax)
    _, best_max = jax.lax.fori_loop(0, num, body, init)

    max_val = jnp.maximum(best_max, 0.0)
    scale = jnp.maximum(max_val / -minq, EPS)
    return scale, jnp.zeros_like(scale)


def _mse_params_asym(w, spec: QuantSpec, num: int):
    """Asymmetric MSE grid: range shrinkage x zero-point sweep (reference quant.py:115-141)."""
    minq, maxq = spec.minq, spec.maxq
    n_levels = spec.n_levels
    zeros_like = jnp.zeros((w.shape[0],), w.dtype)
    xmin = jnp.minimum(jnp.min(w, axis=-1), zeros_like)
    xmax = jnp.maximum(jnp.max(w, axis=-1), zeros_like)
    xrange = xmax - xmin

    def body(step, carry):
        # step enumerates the (i, zp) grid: i in [1, num], zp in [0, n_levels)
        i = step // n_levels + 1
        zp = step % n_levels
        best_score, best_min, best_max = carry

        tmp_max = xrange / num * i.astype(w.dtype)
        delta = jnp.maximum(tmp_max / (maxq - minq), EPS)
        w_round = jnp.round(w / delta[:, None])
        new_min = -zp.astype(w.dtype) * delta
        new_max = tmp_max - zp.astype(w.dtype) * delta
        zero = jnp.clip(minq - jnp.round(new_min / delta), minq, maxq)
        q = jnp.clip(w_round + zero[:, None], minq, maxq)
        wq = delta[:, None] * (q - zero[:, None])
        score = _lp_loss(w, wq, spec.norm)
        better = score < best_score
        return (
            jnp.minimum(score, best_score),
            jnp.where(better, new_min, best_min),
            jnp.where(better, new_max, best_max),
        )

    init = (jnp.full((w.shape[0],), 1e10, w.dtype), xmin, xmax)
    _, best_min, best_max = jax.lax.fori_loop(0, num * n_levels, body, init)

    min_val_neg = jnp.minimum(best_min, 0.0)
    max_val_pos = jnp.maximum(best_max, 0.0)
    scale = jnp.maximum((max_val_pos - min_val_neg) / (maxq - minq), EPS)
    zero = jnp.clip(minq - jnp.round(min_val_neg / scale), minq, maxq)
    return scale, zero


@partial(jax.jit, static_argnames=("spec", "num"))
def find_params(w: jax.Array, spec: QuantSpec, num: int = 100) -> QuantParams:
    """Find per-row affine quantization parameters for weight matrix ``w [OC, C]``.

    Mirrors the reference's `Quantizer.find_params(x, weight=True)`
    (/root/reference/qeft/quant.py:60-181) for the perchannel weight path.
    """
    w = w.astype(jnp.float32)
    if spec.mse:
        if spec.sym:
            scale, zero = _mse_params_sym(w, spec, num)
        else:
            scale, zero = _mse_params_asym(w, spec, num)
    else:
        scale, zero = _minmax_params(w, spec)
    return QuantParams(scale=scale, zero=zero)


def fake_quantize(w: jax.Array, spec: QuantSpec, num: int = 100) -> jax.Array:
    """find_params + quantize in one call (per-row, whole-row group)."""
    p = find_params(w, spec, num)
    return quantize(w, p.scale[:, None], p.zero[:, None], spec)
