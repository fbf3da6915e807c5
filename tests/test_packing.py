import numpy as np
import jax.numpy as jnp
import pytest

from qeft_tpu.quant import QuantSpec, gptq_quantize, hessian_from_inputs, hessian_sort_ids
from qeft_tpu.ops import pack_codes, unpack_codes, pack_layer, dequantize_weight
from qeft_tpu.ops.packing import pack_codes_np
from qeft_tpu.ops.qlinear import qlinear_xla


@pytest.mark.parametrize("k,n,g", [(256, 64, 128), (128, 32, -1), (256, 128, 64)])
def test_pack_unpack_roundtrip(k, n, g):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(k, n)).astype(np.int32)
    packed = pack_codes(jnp.asarray(codes), g)
    assert packed.dtype == jnp.int32 and packed.shape == (k // 8, n)
    back = unpack_codes(packed, g)
    np.testing.assert_array_equal(np.asarray(back), codes)
    # numpy twin agrees
    np.testing.assert_array_equal(pack_codes_np(codes, g), np.asarray(packed))


def quantize_and_pack(oc=64, ic=256, g=128, r=8, sym=False, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(oc, ic)).astype(np.float32)
    x = rng.normal(size=(512, ic)).astype(np.float32)
    x[:, [7, 100]] *= 10
    h = np.asarray(hessian_from_inputs(jnp.asarray(x)[None]))
    spec = QuantSpec(bits=4, sym=sym, mse=False, group_size=g)
    ids, out_ids = hessian_sort_ids(jnp.asarray(np.diag(h)), n_out=r)
    res = gptq_quantize(jnp.asarray(w), jnp.asarray(h), spec, ids, out_ids)

    # reorder to outliers-last along K and pack
    from qeft_tpu.quant.reorder import sparse_to_dense_ids

    dense_ids = sparse_to_dense_ids(out_ids, ic)
    w_kn = jnp.take(res.w_fake, dense_ids, axis=1).T  # [K, N]
    p = pack_layer(
        w_kn,
        res.scale_group,
        res.zero_group,
        n_outlier=r,
        group_size=g,
        sym=sym,
        dtype=dtype,
    )
    return w, res, dense_ids, p


@pytest.mark.parametrize("sym", [False, True])
def test_fake_vs_packed_forward_parity(sym):
    """The reference's correctness oracle (README.md:55-59): the packed path
    must reproduce the fake-quant reconstruction exactly."""
    w, res, dense_ids, p = quantize_and_pack(sym=sym)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 256)).astype(np.float32)

    y_fake = x @ np.asarray(res.w_fake).T
    x_perm = jnp.take(jnp.asarray(x), dense_ids, axis=-1)
    y_packed = np.asarray(qlinear_xla(x_perm, p, dtype=jnp.float32))
    np.testing.assert_allclose(y_packed, y_fake, rtol=2e-4, atol=2e-4)


def test_dequantized_outlier_rows_are_zero():
    _, _, _, p = quantize_and_pack()
    w = np.asarray(dequantize_weight(p, jnp.float32))
    np.testing.assert_allclose(w[-8:, :], 0.0, atol=1e-6)


def test_dequantize_matches_fake_weight_dense_rows():
    w, res, dense_ids, p = quantize_and_pack()
    w_kn = np.asarray(jnp.take(res.w_fake, dense_ids, axis=1).T)
    deq = np.asarray(dequantize_weight(p, jnp.float32))
    np.testing.assert_allclose(deq[:-8], w_kn[:-8], rtol=2e-4, atol=2e-4)
    # outlier slab stored at full precision
    np.testing.assert_allclose(np.asarray(p.oweight), w_kn[-8:], atol=1e-6)


def test_packed_bf16_forward_close():
    w, res, dense_ids, p = quantize_and_pack(dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 256)).astype(np.float32)
    y_fake = x @ np.asarray(res.w_fake).T
    x_perm = jnp.take(jnp.asarray(x), dense_ids, axis=-1)
    y_packed = np.asarray(qlinear_xla(x_perm, p)).astype(np.float32)
    rel = np.abs(y_packed - y_fake) / (np.abs(y_fake) + 1.0)
    assert rel.mean() < 0.01


@pytest.mark.parametrize("bits", [2, 3])
def test_low_bit_fake_vs_packed_parity(bits):
    """w2/w3 pack into the same nibble layout (codes < 16); the packed path
    must still reproduce the fake-quant reconstruction exactly."""
    rng = np.random.default_rng(10 + bits)
    oc, ic, g, r = 32, 256, 64, 8
    w = rng.normal(size=(oc, ic)).astype(np.float32)
    x = rng.normal(size=(256, ic)).astype(np.float32)
    h = np.asarray(hessian_from_inputs(jnp.asarray(x)[None]))
    spec = QuantSpec(bits=bits, sym=False, mse=False, group_size=g)
    ids, out_ids = hessian_sort_ids(jnp.asarray(np.diag(h)), n_out=r)
    res = gptq_quantize(jnp.asarray(w), jnp.asarray(h), spec, ids, out_ids)

    from qeft_tpu.quant.reorder import sparse_to_dense_ids

    dense_ids = sparse_to_dense_ids(out_ids, ic)
    w_kn = jnp.take(res.w_fake, dense_ids, axis=1).T
    p = pack_layer(w_kn, res.scale_group, res.zero_group, n_outlier=r,
                   group_size=g, bits=bits, dtype=jnp.float32)
    xq = jnp.asarray(rng.normal(size=(3, ic)).astype(np.float32))
    y_fake = np.asarray(xq) @ np.asarray(res.w_fake).T
    y_packed = np.asarray(qlinear_xla(jnp.take(xq, dense_ids, axis=-1), p, dtype=jnp.float32))
    np.testing.assert_allclose(y_packed, y_fake, rtol=2e-4, atol=2e-4)


def test_rtn_pack_linear_lm_head():
    """rtn_pack_linear (used for the int4 lm_head, QEFT_QUANT_LMHEAD) must be
    a per-group minmax RTN fit: every element within scale/2 of the original,
    and the packed forward == matmul with the dequantized weight."""
    from qeft_tpu.pipeline import rtn_pack_linear

    rng = np.random.default_rng(0)
    w = rng.normal(size=(256, 96)).astype(np.float32)  # [K, N]
    g = 64
    p = rtn_pack_linear(jnp.asarray(w), bits=4, group_size=g, dtype=jnp.float32)
    assert p.oweight is None and p.in_features == 256

    wq = np.asarray(dequantize_weight(p, dtype=jnp.float32))
    scale_el = np.repeat(np.asarray(p.scales, dtype=np.float32), g, axis=0)
    assert np.all(np.abs(w - wq) <= scale_el / 2 + 1e-5)

    x = rng.normal(size=(4, 256)).astype(np.float32)
    y = np.asarray(qlinear_xla(jnp.asarray(x), p, dtype=jnp.float32))
    np.testing.assert_allclose(y, x @ wq, rtol=1e-5, atol=1e-5)
