import numpy as np
import jax.numpy as jnp
import pytest

from qeft_tpu.quant import (
    QuantSpec,
    gptq_quantize,
    hessian_from_inputs,
    hessian_sort_ids,
)
from qeft_tpu.quant.gptq import hessian_accumulate


def make_problem(oc=32, ic=256, tokens=512, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(oc, ic)).astype(np.float32)
    # a few high-variance input channels -> natural outliers
    x = rng.normal(size=(tokens, ic)).astype(np.float32)
    x[:, [3, 100, 200]] *= 8
    h = np.asarray(hessian_from_inputs(jnp.asarray(x)[None]))
    return w, x, h


def quant_loss(w, q, h):
    d = w - q
    return float(np.trace(d @ h @ d.T))


def test_hessian_matches_definition():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 16, 8)).astype(np.float32)
    h = np.asarray(hessian_from_inputs(jnp.asarray(x)))
    flat = x.reshape(-1, 8)
    expected = (2.0 / 4) * flat.T @ flat
    np.testing.assert_allclose(h, expected, rtol=1e-5)


def test_hessian_accumulate_matches_batch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(6, 16, 8)).astype(np.float32)
    h_all = np.asarray(hessian_from_inputs(jnp.asarray(x)))
    h = jnp.zeros((8, 8))
    n = 0
    for i in range(6):
        h, n = hessian_accumulate(h, jnp.asarray(x[i]), n, 1)
    np.testing.assert_allclose(np.asarray(h), h_all, rtol=1e-4)


def test_outlier_selection_finds_high_sensitivity_columns():
    w, x, h = make_problem()
    ids, out_ids = hessian_sort_ids(jnp.asarray(np.diag(h)), n_out=4)
    assert set([3, 100, 200]).issubset(set(np.asarray(out_ids).tolist()))
    # ids is a permutation with outliers last
    assert sorted(np.asarray(ids).tolist()) == list(range(256))
    np.testing.assert_array_equal(np.asarray(ids[-4:]), np.asarray(out_ids))


def test_fixed_global_outidx_respected():
    w, x, h = make_problem()
    outidx = jnp.asarray([7, 42, 250], dtype=jnp.int32)
    ids, out_ids = hessian_sort_ids(jnp.asarray(np.diag(h)), n_out=3, outidx=outidx)
    np.testing.assert_array_equal(np.asarray(out_ids), [7, 42, 250])
    np.testing.assert_array_equal(np.asarray(ids[-3:]), [7, 42, 250])


@pytest.mark.parametrize("group_size", [-1, 64])
def test_gptq_beats_rtn(group_size):
    w, x, h = make_problem()
    spec = QuantSpec(bits=4, sym=False, mse=False, group_size=group_size)
    ids, out_ids = hessian_sort_ids(jnp.asarray(np.diag(h)), n_out=4)
    res_gptq = gptq_quantize(jnp.asarray(w), jnp.asarray(h), spec, ids, out_ids)
    res_rtn = gptq_quantize(jnp.asarray(w), jnp.asarray(h), spec, ids, out_ids, rtn=True)
    l_gptq = quant_loss(w, np.asarray(res_gptq.w_fake), h)
    l_rtn = quant_loss(w, np.asarray(res_rtn.w_fake), h)
    assert l_gptq < l_rtn


def test_outlier_columns_nearly_exact_with_identity_hessian():
    # With H = I there is no cross-column compensation: outlier columns must
    # come back exactly full-precision, dense columns on the quant grid.
    rng = np.random.default_rng(5)
    oc, ic = 16, 128
    w = rng.normal(size=(oc, ic)).astype(np.float32)
    h = np.eye(ic, dtype=np.float32)
    spec = QuantSpec(bits=4, sym=False, mse=False, group_size=64)
    outidx = jnp.asarray([5, 70], dtype=jnp.int32)
    ids, out_ids = hessian_sort_ids(jnp.asarray(np.diag(h)), 2, outidx=outidx)
    res = gptq_quantize(jnp.asarray(w), jnp.asarray(h), spec, ids, out_ids)
    q = np.asarray(res.w_fake)
    np.testing.assert_allclose(q[:, [5, 70]], w[:, [5, 70]], atol=1e-5)
    # group params shape: [OC, IC//group]
    assert res.scale_group.shape == (oc, ic // 64)


def test_gptq_identity_hessian_equals_rtn():
    rng = np.random.default_rng(6)
    oc, ic = 8, 64
    w = rng.normal(size=(oc, ic)).astype(np.float32)
    h = np.eye(ic, dtype=np.float32)
    spec = QuantSpec(bits=4, sym=False, mse=False, group_size=-1)
    ids = jnp.arange(ic)
    out_ids = jnp.zeros((0,), dtype=jnp.int32)
    res = gptq_quantize(jnp.asarray(w), jnp.asarray(h), spec, ids, out_ids)
    res_rtn = gptq_quantize(jnp.asarray(w), jnp.asarray(h), spec, ids, out_ids, rtn=True)
    # identity Hessian -> no propagation -> GPTQ == RTN
    np.testing.assert_allclose(
        np.asarray(res.w_fake), np.asarray(res_rtn.w_fake), atol=1e-5
    )


def test_perfectly_quantizable_is_exact():
    rng = np.random.default_rng(7)
    oc, ic = 8, 64
    codes = rng.integers(0, 16, size=(oc, ic))
    w = (0.25 * (codes - 7)).astype(np.float32)
    x = rng.normal(size=(256, ic)).astype(np.float32)
    h = np.asarray(hessian_from_inputs(jnp.asarray(x)[None]))
    spec = QuantSpec(bits=4, sym=False, mse=False, group_size=-1)
    ids = jnp.arange(ic)
    out_ids = jnp.zeros((0,), dtype=jnp.int32)
    res = gptq_quantize(jnp.asarray(w), jnp.asarray(h), spec, ids, out_ids)
    np.testing.assert_allclose(np.asarray(res.w_fake), w, atol=1e-4)


def test_cholesky_inv_upper_identity():
    from qeft_tpu.quant.gptq import _cholesky_inv_upper

    rng = np.random.default_rng(8)
    ic = 64
    a = rng.normal(size=(ic, ic)).astype(np.float32)
    h = a @ a.T + ic * np.eye(ic, dtype=np.float32)
    u = np.asarray(_cholesky_inv_upper(jnp.asarray(h), percdamp=0.0))
    # upper triangular with positive diagonal
    assert np.allclose(u, np.triu(u), atol=1e-6)
    assert (np.diag(u) > 0).all()
    # U^T U == H^{-1}
    hinv = np.linalg.inv(h)
    np.testing.assert_allclose(u.T @ u, hinv, rtol=2e-3, atol=1e-5)
