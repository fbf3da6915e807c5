"""Interpret-mode parity tests for the Pallas quantized matmul kernels.

On CPU these run the same kernel bodies through the Pallas interpreter, so
kernel-vs-XLA parity here transfers to compiled TPU execution (modulo Mosaic
bugs, covered by the on-TPU benchmark)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qeft_tpu.ops.qlinear import qlinear_xla
from qeft_tpu.ops.pallas_qmm import qgemv, qgemm
from tests.test_packing import quantize_and_pack


@pytest.mark.parametrize("tokens", [1, 4, 7])
def test_qgemv_matches_xla(tokens):
    _, res, dense_ids, p = quantize_and_pack(oc=128, ic=256, g=128, r=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(tokens, 256)).astype(np.float32))
    y_ref = np.asarray(qlinear_xla(x, p, dtype=jnp.float32))
    y_pal = np.asarray(qgemv(x, p, dtype=jnp.float32))
    np.testing.assert_allclose(y_pal, y_ref, rtol=2e-3, atol=2e-3)


def test_qgemm_matches_xla():
    _, res, dense_ids, p = quantize_and_pack(oc=128, ic=256, g=64, r=8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 300, 256)).astype(np.float32))
    y_ref = np.asarray(qlinear_xla(x, p, dtype=jnp.float32))
    y_pal = np.asarray(qgemm(x, p, dtype=jnp.float32))
    np.testing.assert_allclose(y_pal, y_ref, rtol=2e-3, atol=2e-3)


def test_qgemv_no_outliers():
    _, res, dense_ids, p = quantize_and_pack(oc=128, ic=256, g=128, r=8)
    # strip the outlier slab: dense-only packed linear
    import dataclasses

    p0 = dataclasses.replace(p, oweight=None)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 256)).astype(np.float32))
    y_ref = np.asarray(qlinear_xla(x, p0, dtype=jnp.float32))
    y_pal = np.asarray(qgemv(x, p0, dtype=jnp.float32))
    np.testing.assert_allclose(y_pal, y_ref, rtol=2e-3, atol=2e-3)


def test_qgemv_whole_row_group():
    _, res, dense_ids, p = quantize_and_pack(oc=128, ic=128, g=-1, r=8)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 128)).astype(np.float32))
    y_ref = np.asarray(qlinear_xla(x, p, dtype=jnp.float32))
    y_pal = np.asarray(qgemv(x, p, dtype=jnp.float32))
    np.testing.assert_allclose(y_pal, y_ref, rtol=2e-3, atol=2e-3)


def test_qgemv_stacked_matches_per_layer():
    """qgemv_stacked (scalar-prefetch layer index over stacked [L, ...]
    weights) must equal qgemv on each layer's slice."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qeft_tpu.ops.packing import QLinearParams, pack_codes
    from qeft_tpu.ops.pallas_qmm import qgemv, qgemv_stacked

    L, K, N, G, R = 3, 256, 256, 64, 16
    rng = np.random.default_rng(7)

    def one(i):
        codes = jnp.asarray(rng.integers(0, 16, size=(K, N)).astype(np.int32))
        return QLinearParams(
            qweight=pack_codes(codes, G),
            scales=jnp.asarray(rng.random((K // G, N)) * 0.02 + 0.01, jnp.float32),
            scaled_zeros=jnp.asarray(-rng.random((K // G, N)) * 0.1, jnp.float32),
            oweight=jnp.asarray(rng.normal(size=(R, N)) * 0.02, jnp.float32),
            bias=jnp.asarray(rng.normal(size=(N,)) * 0.01, jnp.float32),
            group_size=G,
        )

    layers = [one(i) for i in range(L)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    x = jnp.asarray(rng.normal(size=(1, K)), jnp.float32)

    for l in range(L):
        ref = np.asarray(qgemv(x, layers[l], dtype=jnp.float32))
        got = np.asarray(
            qgemv_stacked(x, stacked, jnp.int32(l), dtype=jnp.float32)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("one_offset", [False, True])
def test_qgemv_stacked_fused_matches_composed(one_offset):
    """qgemv_stacked_fused (norm prologue + in-kernel outlier GEMM + residual
    epilogue) must equal the composed chain rms_norm -> qgemv_stacked ->
    outlier add -> residual add on each layer."""
    import jax

    from qeft_tpu.models.llama import rms_norm
    from qeft_tpu.ops.packing import QLinearParams, pack_codes
    from qeft_tpu.ops.pallas_qmm import qgemv, qgemv_stacked_fused

    L, K, N, G, R = 3, 256, 256, 64, 16
    EPS = 1e-5
    rng = np.random.default_rng(11)

    def one(i):
        codes = jnp.asarray(rng.integers(0, 16, size=(K, N)).astype(np.int32))
        return QLinearParams(
            qweight=pack_codes(codes, G),
            scales=jnp.asarray(rng.random((K // G, N)) * 0.02 + 0.01, jnp.float32),
            scaled_zeros=jnp.asarray(-rng.random((K // G, N)) * 0.1, jnp.float32),
            oweight=jnp.asarray(rng.normal(size=(R, N)) * 0.02, jnp.float32),
            group_size=G,
        )

    layers = [one(i) for i in range(L)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    x = jnp.asarray(rng.normal(size=(2, K)), jnp.float32)
    lnw = jnp.asarray(rng.normal(size=(K,)) * 0.1 + 1.0, jnp.float32)
    res = jnp.asarray(rng.normal(size=(2, N)), jnp.float32)

    for l in range(L):
        # norm-fused (qkv/upgate-shaped stage)
        h = rms_norm(x, lnw, EPS, one_offset)
        ref = np.asarray(qgemv(h, layers[l], dtype=jnp.float32))
        got = np.asarray(qgemv_stacked_fused(
            x, stacked, jnp.int32(l), lnw=lnw, eps=EPS, one_offset=one_offset,
            dtype=jnp.float32,
        ))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

        # residual-fused (o/down-shaped stage)
        ref2 = np.asarray(res + qgemv(x, layers[l], dtype=jnp.float32))
        got2 = np.asarray(qgemv_stacked_fused(
            x, stacked, jnp.int32(l), residual=res, dtype=jnp.float32,
        ))
        np.testing.assert_allclose(got2, ref2, rtol=1e-4, atol=1e-4)


def test_qgemv_stacked_fused_no_outliers():
    import dataclasses

    import jax

    from qeft_tpu.ops.packing import QLinearParams, pack_codes
    from qeft_tpu.ops.pallas_qmm import qgemv, qgemv_stacked_fused

    L, K, N, G = 2, 128, 128, 64
    rng = np.random.default_rng(12)

    def one(i):
        codes = jnp.asarray(rng.integers(0, 16, size=(K, N)).astype(np.int32))
        return QLinearParams(
            qweight=pack_codes(codes, G),
            scales=jnp.asarray(rng.random((K // G, N)) * 0.02 + 0.01, jnp.float32),
            scaled_zeros=jnp.asarray(-rng.random((K // G, N)) * 0.1, jnp.float32),
            group_size=G,
        )

    layers = [one(i) for i in range(L)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    x = jnp.asarray(rng.normal(size=(1, K)), jnp.float32)
    for l in range(L):
        ref = np.asarray(qgemv(x, layers[l], dtype=jnp.float32))
        got = np.asarray(
            qgemv_stacked_fused(x, stacked, jnp.int32(l), dtype=jnp.float32)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
