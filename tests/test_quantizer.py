import numpy as np
import jax.numpy as jnp
import pytest

from qeft_tpu.quant import QuantSpec, find_params, quantize, fake_quantize


def np_minmax_reference(w, sym, bits):
    """Independent NumPy oracle for the min-max path."""
    n_levels = 2**bits
    if sym:
        minq, maxq = -((n_levels - 1) // 2 + 1), (n_levels - 1) // 2
    else:
        minq, maxq = 0, n_levels - 1
    xmin = np.minimum(w.min(axis=1), 0)
    xmax = np.maximum(w.max(axis=1), 0)
    if sym:
        xmax = np.maximum(np.abs(xmin), xmax)
        xmin = np.where(xmin < 0, -xmax, xmin)
    deg = (xmin == 0) & (xmax == 0)
    xmin[deg], xmax[deg] = -1, 1
    if sym:
        scale = xmax / -minq
        zero = np.zeros_like(scale)
    else:
        scale = (xmax - xmin) / maxq
        zero = np.round(-xmin / scale)
    return scale, zero, minq, maxq


@pytest.mark.parametrize("sym", [False, True])
def test_minmax_matches_oracle(sym):
    rng = np.random.default_rng(0)
    w = rng.normal(size=(16, 64)).astype(np.float32)
    spec = QuantSpec(bits=4, sym=sym, mse=False)
    p = find_params(jnp.asarray(w), spec)
    scale_ref, zero_ref, minq, maxq = np_minmax_reference(w, sym, 4)
    np.testing.assert_allclose(np.asarray(p.scale), scale_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p.zero), zero_ref, rtol=1e-5)
    assert spec.minq == minq and spec.maxq == maxq


@pytest.mark.parametrize("sym", [False, True])
def test_quantize_codes_in_range(sym):
    rng = np.random.default_rng(1)
    w = rng.normal(size=(8, 32)).astype(np.float32) * 3
    spec = QuantSpec(bits=4, sym=sym, mse=False)
    p = find_params(jnp.asarray(w), spec)
    q = np.round(np.asarray(w) / np.asarray(p.scale)[:, None]) + np.asarray(p.zero)[:, None]
    q = np.clip(q, spec.minq, spec.maxq)
    assert q.min() >= spec.minq and q.max() <= spec.maxq
    wq = quantize(jnp.asarray(w), p.scale[:, None], p.zero[:, None], spec)
    # dequantized values lie on the grid scale*(k - zero)
    k = np.asarray(wq) / np.asarray(p.scale)[:, None] + np.asarray(p.zero)[:, None]
    np.testing.assert_allclose(k, np.round(k), atol=1e-4)


@pytest.mark.parametrize("sym", [False, True])
def test_mse_not_worse_than_minmax(sym):
    rng = np.random.default_rng(2)
    # heavy-tailed rows: MSE grid search should beat plain min-max
    w = rng.standard_t(df=2, size=(16, 256)).astype(np.float32)
    minmax = QuantSpec(bits=4, sym=sym, mse=False)
    mse = QuantSpec(bits=4, sym=sym, mse=True)
    err_minmax = np.mean((np.asarray(fake_quantize(jnp.asarray(w), minmax)) - w) ** 2)
    err_mse = np.mean((np.asarray(fake_quantize(jnp.asarray(w), mse, num=100)) - w) ** 2)
    assert err_mse <= err_minmax * 1.001


def test_exact_grid_roundtrip():
    # weights already on a 4-bit grid quantize exactly
    rng = np.random.default_rng(3)
    scale = 0.1
    codes = rng.integers(0, 16, size=(4, 64))
    w = (scale * (codes - 8)).astype(np.float32)
    spec = QuantSpec(bits=4, sym=False, mse=False)
    wq = fake_quantize(jnp.asarray(w), spec)
    np.testing.assert_allclose(np.asarray(wq), w, atol=1e-6)


def test_mse_asym_zero_sweep_handles_shifted_data():
    rng = np.random.default_rng(4)
    # all-positive rows: asymmetric quantizer should use the full grid
    w = (rng.random(size=(8, 128)) * 5 + 2).astype(np.float32)
    spec = QuantSpec(bits=4, sym=False, mse=True)
    p = find_params(jnp.asarray(w), spec, num=40)
    wq = quantize(jnp.asarray(w), p.scale[:, None], p.zero[:, None], spec)
    rel = np.mean((np.asarray(wq) - w) ** 2) / np.mean(w**2)
    assert rel < 0.01
