"""Banded o-permutation (ops/permute.py): the OGR o-proj input gather
realized as block-banded + tail one-hot MXU dots must be BIT-EXACT vs
jnp.take for every compaction, and must refuse non-compactions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qeft_tpu.ops.permute import (
    apply_banded_perm,
    apply_o_reorder,
    attach_o_band,
    build_banded_perm,
)
from qeft_tpu.quant.reorder import sparse_to_dense_ids


def _compaction(rng, k, r):
    out = rng.choice(k, size=r, replace=False)
    return np.asarray(sparse_to_dense_ids(jnp.asarray(np.sort(out)), k))


@pytest.mark.parametrize("k,r", [(512, 128), (512, 96), (768, 256), (256, 8)])
def test_band_equals_take(k, r):
    rng = np.random.default_rng(k + r)
    ids = np.stack([_compaction(rng, k, r) for _ in range(3)])
    built = build_banded_perm(jnp.asarray(ids), r)
    assert built is not None
    band, tail = built
    x = jnp.asarray(rng.standard_normal((2, k)), jnp.bfloat16)
    for l in range(3):
        want = jnp.take(x, jnp.asarray(ids[l]), axis=-1)
        got = apply_banded_perm(x, band[l], tail[l])
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32)
        )


def test_band_f32_and_leading_dims():
    rng = np.random.default_rng(0)
    k, r = 512, 64
    ids = _compaction(rng, k, r)[None]
    band, tail = build_banded_perm(jnp.asarray(ids), r)
    x = jnp.asarray(rng.standard_normal((2, 3, k)), jnp.float32)
    want = jnp.take(x, jnp.asarray(ids[0]), axis=-1)
    got = apply_banded_perm(x, band[0], tail[0])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_non_compaction_refused():
    # K must be large enough that the band window (128*(1+ceil(r/128))) does
    # not span the whole axis — at tiny K any permutation is trivially banded
    k = 512
    rng = np.random.default_rng(1)
    full_perm = rng.permutation(k)[None].astype(np.int32)  # arbitrary: not banded
    assert build_banded_perm(jnp.asarray(full_perm), 8) is None
    # misaligned K
    assert build_banded_perm(jnp.asarray(np.arange(100)[None]), 8) is None


def test_apply_o_reorder_dispatch():
    rng = np.random.default_rng(2)
    k, r = 256, 32
    ids = _compaction(rng, k, r)
    x = jnp.asarray(rng.standard_normal((1, k)), jnp.float32)
    blk_take = {"o_reorder": jnp.asarray(ids)}
    band, tail = build_banded_perm(jnp.asarray(ids[None]), r)
    blk_band = {"o_reorder": jnp.asarray(ids), "o_band": band[0],
                "o_tail": tail[0]}
    np.testing.assert_array_equal(
        np.asarray(apply_o_reorder(x, blk_band)),
        np.asarray(apply_o_reorder(x, blk_take)),
    )
    np.testing.assert_array_equal(np.asarray(apply_o_reorder(x, {})),
                                  np.asarray(x))


def test_attach_and_decode_equality():
    """llama decode through the banded path == the gather path, bit-exact
    (f32 tiny model with a REAL random compaction o_reorder)."""
    from qeft_tpu.models import LLAMA_PRESETS, init_kv_cache
    from qeft_tpu.models.llama import llama_decode_step, llama_prefill
    from qeft_tpu.testing import build_packed_model

    cfg = LLAMA_PRESETS["tiny"]  # hd = 4*64 = 256
    rng = np.random.default_rng(3)
    packed = build_packed_model(cfg, jax.random.PRNGKey(0), g=64, r=16,
                                fuse_stages=True, dtype=jnp.float32)
    layers = dict(packed["layers"])
    layers.pop("o_band", None)
    layers.pop("o_tail", None)
    hd = cfg.num_heads * cfg.head_dim
    ids = np.stack([_compaction(rng, hd, 16) for _ in range(cfg.num_layers)])
    layers["o_reorder"] = jnp.asarray(ids)
    base = {**packed, "layers": layers}
    banded = attach_o_band(base)
    assert "o_band" in banded["layers"]

    cache = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    prompt = jnp.asarray([[1, 2, 3]])
    la_all = []
    for params in (base, banded):
        _, c = llama_prefill(params, prompt, cache, cfg)
        l, _ = llama_decode_step(params, jnp.asarray([[4]]), c, jnp.int32(3),
                                 cfg)
        la_all.append(np.asarray(l))
    np.testing.assert_array_equal(la_all[0], la_all[1])
