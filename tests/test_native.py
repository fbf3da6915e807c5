import numpy as np
import jax.numpy as jnp
import pytest

from qeft_tpu.ops import native
from qeft_tpu.ops.packing import pack_codes, unpack_codes


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_pack_matches_jnp():
    rng = np.random.default_rng(0)
    k, n, g = 256, 128, 64
    codes = rng.integers(0, 16, size=(k, n)).astype(np.int32)
    a = native.pack_codes(codes, g)
    b = np.asarray(pack_codes(jnp.asarray(codes), g))
    np.testing.assert_array_equal(a, b)
    back = native.unpack_codes(a, k, g)
    np.testing.assert_array_equal(back, codes)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_quantize_codes_matches_numpy():
    rng = np.random.default_rng(1)
    k, n, g, r = 256, 64, 64, 8
    scales = (rng.random((k // g, n)) * 0.05 + 0.01).astype(np.float32)
    zeros = rng.integers(0, 16, size=(k // g, n)).astype(np.float32)
    codes_true = rng.integers(0, 16, size=(k, n)).astype(np.int32)
    s_full = np.repeat(scales, g, axis=0)
    z_full = np.repeat(zeros, g, axis=0)
    w = ((codes_true - z_full) * s_full).astype(np.float32)

    out = native.quantize_codes(w, scales, zeros, g, r)
    expected = codes_true.copy()
    expected[k - r:] = np.clip(np.round(z_full[k - r:]), 0, 15).astype(np.int32)
    np.testing.assert_array_equal(out, expected)
