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

    Reference reorder.py:6-12.
    """
    mask = jnp.ones((length,), dtype=bool).at[sparse_ids].set(False)
    return jnp.concatenate([jnp.arange(length)[mask], sparse_ids.astype(jnp.int32)])


def inverse_permutation(ids: jax.Array) -> jax.Array:
    return jnp.argsort(ids)
