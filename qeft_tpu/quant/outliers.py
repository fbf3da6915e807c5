"""Outlier ("weak") column selection from Hessian-diagonal sensitivity, and the
global (OGR) sensitivity accumulation.

Capability parity with reference `hessian_sorting`
(/root/reference/qeft/recon.py:60-100) and the global extraction loop
(/root/reference/qeft/extract_outidx.py:103-179).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def hessian_sort_ids(
    h_diag: jax.Array,
    n_out: int,
    frob_norm: Optional[jax.Array] = None,
    outidx: Optional[jax.Array] = None,
    actorder: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Build the outliers-last column permutation for one layer.

    Sensitivity = diag(H), optionally scaled by a per-column Frobenius
    quantization error.  The top ``n_out`` columns (or an externally fixed
    global ``outidx``) are moved to the END of the permutation; the rest keep
    their original relative order (or descending sensitivity if ``actorder``).

    Returns ``(ids [IC], out_ids [n_out])`` with ``out_ids`` sorted ascending.
    Unlike the reference (which appends outliers in descending-sensitivity
    order during reconstruction but sorted order in the final model layout,
    recon.py:85-89 vs reorder.py:6-12), we use the sorted order everywhere:
    GPTQ error compensation onto unquantized columns is invariant to their
    ordering, and a single convention removes a whole class of layout bugs.
    """
    ic = h_diag.shape[0]
    sens = h_diag
    if frob_norm is not None:
        sens = sens * frob_norm

    if n_out == 0 and outidx is None:
        if actorder:
            ids = jnp.argsort(-sens)
        else:
            ids = jnp.arange(ic)
        return ids, jnp.zeros((0,), dtype=jnp.int32)

    if outidx is None:
        _, top = jax.lax.top_k(sens, n_out)
        out_ids = jnp.sort(top).astype(jnp.int32)
    else:
        out_ids = jnp.sort(outidx).astype(jnp.int32)

    if actorder:
        # dense columns in descending-sensitivity order, outliers last
        mask = jnp.ones((ic,), dtype=bool).at[out_ids].set(False)
        keep = jnp.argsort(-jnp.where(mask, sens, -jnp.inf))[: ic - out_ids.shape[0]]
        ids = jnp.concatenate([keep, out_ids])
    else:
        from qeft_tpu.quant.reorder import sparse_to_dense_ids

        ids = sparse_to_dense_ids(out_ids, ic)
    return ids, out_ids


def frob_norm_error(w: jax.Array, spec, num: int = 40) -> jax.Array:
    """Per-column squared quantization error ||W - Q(W)||^2 summed over rows.

    Reference computes this with a temporary quantizer before sorting
    (main.py:131-140, extract_outidx.py:136-143).  ``w`` is [OC, IC].
    """
    from qeft_tpu.quant.quantizer import find_params, quantize

    w = w.astype(jnp.float32)
    p = find_params(w, spec, num)
    wq = quantize(w, p.scale[:, None], p.zero[:, None], spec)
    return jnp.sum((w - wq) ** 2, axis=0)


def normalized_sensitivity(h_diag: jax.Array) -> jax.Array:
    """One layer's contribution to the global sensitivity vector.

    Reference accumulates sum(H_diag / mean(H_diag)) over qkv + up/gate layers
    of every block (extract_outidx.py:159-160).
    """
    return h_diag / jnp.mean(h_diag)


def select_global_outliers(sensitivity_sum: jax.Array, target_rank: int) -> jax.Array:
    """Top-``target_rank`` indices of the accumulated sensitivity, sorted
    ascending (reference extract_outidx.py:174-179)."""
    _, top = jax.lax.top_k(sensitivity_sum, target_rank)
    return jnp.sort(top).astype(jnp.int32)
