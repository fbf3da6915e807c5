"""GPTQ-OWQ reconstruction: Hessian-weighted error-compensated quantization
with full-precision outlier ("weak") columns kept at the end of the layout.

Capability parity with the reference `GPTQ_OWQ`
(/root/reference/qeft/recon.py:13-580), re-designed for XLA:

- Hessian accumulation is one batched matmul over captured activations
  (reference streams per-sample `add_batch`, recon.py:35-57).
- The damped Cholesky-inverse and the column-blocked quantize-and-compensate
  loop (reference recon.py:414-471) become a `lax.scan` over fixed-size blocks
  with an inner `lax.fori_loop` — static shapes, jittable, runs on CPU or TPU.
- Group parameters are (re)found at each group boundary over the
  error-compensated weights, exactly like the `_reorder` variants
  (reference recon.py:534-541), and the trailing all-outlier group repeats the
  last group's params (reference recon.py:560-563).

Convention: ``w`` is ``[OC, IC]`` (row = output channel); the caller passes a
permutation ``ids`` that puts outlier columns *last* (see outliers.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from qeft_tpu.quant.quantizer import QuantSpec, find_params, quantize


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LayerQuantResult:
    """Everything downstream stages need for one linear layer.

    ``w_fake``: fake-quantized weight in the ORIGINAL column order [OC, IC]
                (outlier columns carry their error-compensated fp values).
    ``scale_group``/``zero_group``: ``[OC, G]`` with ``G = IC // group_size``
                aligned to the *reordered* (outliers-last) column layout.
    ``out_ids``: sorted outlier column indices ``[n_out]`` (original order).
    """

    w_fake: jax.Array
    scale_group: jax.Array
    zero_group: jax.Array
    out_ids: jax.Array

    def tree_flatten(self):
        return (self.w_fake, self.scale_group, self.zero_group, self.out_ids), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def hessian_from_inputs(x: jax.Array, nsamples: Optional[int] = None) -> jax.Array:
    """H = (2/nsamples) * sum_b X_b^T X_b over calibration activations.

    ``x``: [nsamples, tokens, IC] (or [tokens, IC] for a single sample).
    Equivalent to the reference's streaming update (recon.py:54-57) which
    nets out to (2/n) * sum x x^T with n = number of samples.
    """
    if x.ndim == 2:
        x = x[None]
    n = nsamples if nsamples is not None else x.shape[0]
    x = x.astype(jnp.float32)
    flat = x.reshape(-1, x.shape[-1])
    # fp32 MXU passes: the Hessian must not be accumulated in bf16
    return (2.0 / n) * jnp.matmul(flat.T, flat, precision=jax.lax.Precision.HIGHEST)


def hessian_accumulate(h: jax.Array, x: jax.Array, nsamples_seen: int, nsamples_new: int):
    """Streaming variant for when activations don't fit at once.

    Maintains the invariant h = (2/n_seen) * sum x x^T.
    """
    x = x.astype(jnp.float32)
    flat = x.reshape(-1, x.shape[-1])
    total = nsamples_seen + nsamples_new
    h = h * (nsamples_seen / total)
    h = h + (2.0 / total) * jnp.matmul(
        flat.T, flat, precision=jax.lax.Precision.HIGHEST
    )
    return h, total


def _blocked_tril_inv(l: jax.Array, nb: int = 8) -> jax.Array:
    """Inverse of a lower-triangular matrix by block forward substitution.

    XLA:TPU's triangular_solve with a wide right-hand side plans ~20 GB of
    HBM at 11008^2 (measured), so the N^2-RHS solve is off the table; this
    builds inv(L) from nb x nb blocks using only [b, b] solves and MXU
    matmuls (peak memory ~ a few b^2 temporaries + the output).
    """
    n = l.shape[0]
    assert n % nb == 0, (n, nb)
    b = n // nb
    eye_b = jnp.eye(b, dtype=l.dtype)

    def blk(a, i, j):
        return jax.lax.dynamic_slice(a, (i * b, j * b), (b, b))

    x = [[None] * nb for _ in range(nb)]
    for i in range(nb):
        xii = jax.lax.linalg.triangular_solve(
            blk(l, i, i), eye_b, left_side=True, lower=True
        )
        x[i][i] = xii
        for j in range(i):
            s = None
            for k in range(j, i):
                term = jnp.matmul(
                    blk(l, i, k), x[k][j], precision=jax.lax.Precision.HIGHEST
                )
                s = term if s is None else s + term
            x[i][j] = -jnp.matmul(xii, s, precision=jax.lax.Precision.HIGHEST)

    zero = jnp.zeros((b, b), l.dtype)
    rows = [
        jnp.concatenate([x[i][j] if j <= i else zero for j in range(nb)], axis=1)
        for i in range(nb)
    ]
    return jnp.concatenate(rows, axis=0)


def _cholesky_inv_upper(h: jax.Array, percdamp: float) -> jax.Array:
    """Damped upper-triangular factor U with H^{-1} = U^T U.

    Numerically equals the reference chain chol(cholesky_inverse(chol(H)))
    (recon.py:414-421) via the reversal identity: with J the index-reversal
    and Lb = chol(J H J),  U = J inv(Lb) J  satisfies U^T U = H^{-1} and is
    upper-triangular with positive diagonal (the unique Cholesky factor).
    Avoids materializing H^{-1} and the wide triangular solve (see
    `_blocked_tril_inv`).
    """
    ic = h.shape[0]
    diag = jnp.diagonal(h)
    dead = diag == 0
    h = jnp.where(jnp.diag(dead), 1.0, h)
    damp = percdamp * jnp.mean(jnp.diagonal(h))
    h = h + jnp.eye(ic, dtype=h.dtype) * damp
    hb = jnp.flip(h, (0, 1))
    lb = jnp.linalg.cholesky(hb)
    nb = 8 if ic % 8 == 0 else 1
    linv = _blocked_tril_inv(lb, nb=nb)
    return jnp.flip(linv, (0, 1))


def _quantize_block(w_blk, scale, zero, u_blk, col_offset, n_nonout, spec: QuantSpec):
    """Inner GPTQ loop over one block of ``g`` columns.

    Returns (q_blk, err_blk). Columns past ``n_nonout`` are inactive: quantized
    value = original value, zero error (so they receive compensation but emit
    none — they are the fp16 outlier slab).
    """
    oc, g = w_blk.shape

    def body(i, carry):
        w_cur, q_acc, err_acc = carry
        active = (col_offset + i) < n_nonout
        w_i = jax.lax.dynamic_slice(w_cur, (0, i), (oc, 1))[:, 0]
        d = u_blk[i, i]
        q_i = quantize(w_i[:, None], scale[:, None], zero[:, None], spec)[:, 0]
        q_i = jnp.where(active, q_i, w_i)
        err = jnp.where(active, (w_i - q_i) / d, 0.0)
        # propagate to the remaining columns of this block (cols > i)
        row_u = u_blk[i]  # [g]
        mask = jnp.arange(g) > i
        w_cur = w_cur - jnp.where(mask[None, :], err[:, None] * row_u[None, :], 0.0)
        q_acc = jax.lax.dynamic_update_slice(q_acc, q_i[:, None], (0, i))
        err_acc = jax.lax.dynamic_update_slice(err_acc, err[:, None], (0, i))
        return w_cur, q_acc, err_acc

    init = (w_blk, jnp.zeros_like(w_blk), jnp.zeros_like(w_blk))
    _, q_blk, err_blk = jax.lax.fori_loop(0, g, body, init)
    return q_blk, err_blk


@partial(
    jax.jit,
    static_argnames=("spec", "n_nonout", "percdamp", "num", "rtn"),
)
def gptq_quantize_permuted(
    w_perm: jax.Array,
    h_perm: jax.Array,
    spec: QuantSpec,
    n_nonout: int,
    percdamp: float = 0.01,
    num: int = 40,
    rtn: bool = False,
):
    """GPTQ over a weight ALREADY permuted to outliers-last column order.

    ``w_perm``: [OC, IC] fp32, ``h_perm``: [IC, IC] fp32 (same permutation).
    Returns (q_perm [OC, IC], scale_group [OC, G], zero_group [OC, G]) in the
    permuted layout. ``rtn=True`` skips error compensation (reference
    `fasterquant_nearest_owq_reorder`, recon.py:327-384).
    """
    oc, ic = w_perm.shape
    g = spec.group_size if spec.group_size > 0 else ic
    assert ic % g == 0, "in-features must be divisible by group size"
    n_groups_total = ic // g
    n_blocks = -(-n_nonout // g)  # ceil: blocks that contain any dense column

    w = w_perm.astype(jnp.float32)
    dead = jnp.diagonal(h_perm) == 0
    w = jnp.where(dead[None, :], 0.0, w)

    if rtn:
        u = jnp.eye(ic, dtype=jnp.float32)  # d=1, no propagation (masked anyway)
    else:
        u = _cholesky_inv_upper(h_perm, percdamp)

    col_ids = jnp.arange(ic)

    def block_step(w_carry, b):
        i1 = b * g
        w_blk = jax.lax.dynamic_slice(w_carry, (0, i1), (oc, g))
        u_blk = jax.lax.dynamic_slice(u, (i1, i1), (g, g))

        # group params over the error-compensated block, inactive cols zeroed
        # (zero-fill is exact: find_params clamps the range to include 0 and the
        # Lp score is scaled uniformly per row, preserving the argmin)
        active = (i1 + jnp.arange(g)) < n_nonout
        w_for_params = jnp.where(active[None, :], w_blk, 0.0)
        p = find_params(w_for_params, spec, num)

        q_blk, err_blk = _quantize_block(w_blk, p.scale, p.zero, u_blk, i1, n_nonout, spec)

        if not rtn:
            # propagate block error to all columns right of the block
            u_rows = jax.lax.dynamic_slice(u, (i1, 0), (g, ic))  # [g, IC]
            update = jnp.matmul(
                err_blk, u_rows, precision=jax.lax.Precision.HIGHEST
            )  # [OC, IC]
            right_mask = col_ids >= (i1 + g)
            w_carry = w_carry - jnp.where(right_mask[None, :], update, 0.0)

        w_carry = jax.lax.dynamic_update_slice(w_carry, q_blk, (0, i1))
        return w_carry, (p.scale, p.zero)

    w_final, (scales, zeros) = jax.lax.scan(block_step, w, jnp.arange(n_blocks))

    # trailing all-outlier groups repeat the last group's params
    # (reference recon.py:560-563)
    scale_group = scales.T  # [OC, n_blocks]
    zero_group = zeros.T
    if n_groups_total > n_blocks:
        pad = n_groups_total - n_blocks
        scale_group = jnp.concatenate(
            [scale_group, jnp.repeat(scale_group[:, -1:], pad, axis=1)], axis=1
        )
        zero_group = jnp.concatenate(
            [zero_group, jnp.repeat(zero_group[:, -1:], pad, axis=1)], axis=1
        )

    return w_final, scale_group, zero_group


def gptq_quantize(
    w: jax.Array,
    h: jax.Array,
    spec: QuantSpec,
    ids: jax.Array,
    out_ids: jax.Array,
    percdamp: float = 0.01,
    num: int = 40,
    rtn: bool = False,
) -> LayerQuantResult:
    """Full OWQ-GPTQ for one layer: permute -> blocked GPTQ -> scatter back.

    ``ids``: [IC] permutation with outlier columns last (from
    `outliers.hessian_sort_ids`).  ``out_ids``: the sorted sparse outlier
    indices [n_out] in the original column order.
    """
    n_out = int(out_ids.shape[0])
    n_nonout = w.shape[1] - n_out
    w_perm = jnp.take(w.astype(jnp.float32), ids, axis=1)
    h_perm = jnp.take(jnp.take(h, ids, axis=0), ids, axis=1)
    q_perm, scale_group, zero_group = gptq_quantize_permuted(
        w_perm, h_perm, spec, n_nonout, percdamp, num, rtn
    )
    inv = jnp.argsort(ids)
    q = jnp.take(q_perm, inv, axis=1)
    return LayerQuantResult(
        w_fake=q, scale_group=scale_group, zero_group=zero_group, out_ids=out_ids
    )
