"""Offline Global Reordering (OGR): static permutation helpers.

The model-level permutation pass lives in `qeft_tpu.models.reorder_model`
(it needs the model meta); this module holds the index math, mirroring
reference reorder.py:6-12.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sparse_to_dense_ids(sparse_ids: jax.Array, length: int) -> jax.Array:
    """Permutation [non-outliers in order..., outliers in given order].

    Reference reorder.py:6-12.  Built with a sort key instead of boolean-mask
    indexing so it stays jittable/lazy (boolean indexing forces a host sync,
    which also surfaces any queued device error at an unrelated call site).
    """
    n_out = sparse_ids.shape[0]
    key = jnp.arange(length).at[sparse_ids].set(length + jnp.arange(n_out))
    return jnp.argsort(key).astype(jnp.int32)


def inverse_permutation(ids: jax.Array) -> jax.Array:
    return jnp.argsort(ids)
