"""Upgate half-padding (pipeline.pad_upgate_halves): padded decode must be
exact vs unpadded — the pad columns dequantize to exactly zero and the model
split drops them (QEFT_PAD_UPGATE turns this on for bn=1024 decode tiles)."""

import numpy as np
import jax
import jax.numpy as jnp

from qeft_tpu.models import LLAMA_PRESETS, init_kv_cache
from qeft_tpu.models.llama import llama_decode_step, llama_prefill
from qeft_tpu.pipeline import pad_upgate_halves
from qeft_tpu.testing import build_packed_model

CFG = LLAMA_PRESETS["tiny"]  # intermediate 512: pads to 1024 per half


def test_padded_upgate_decode_is_exact(monkeypatch):
    # the baseline build must be UNPADDED (padding is default-on since the
    # round-4 A/B); this test pads explicitly and compares against it
    monkeypatch.setenv("QEFT_PAD_UPGATE", "0")
    packed = build_packed_model(CFG, jax.random.PRNGKey(0), g=64, r=16,
                                fuse_stages=True, dtype=jnp.float32)
    layers = dict(packed["layers"])
    lin = layers["upgate"]
    layers["upgate"] = pad_upgate_halves(lin, multiple=1024)
    padded = {**packed, "layers": layers}
    assert layers["upgate"].out_features == 2048 and lin.out_features == 1024

    cache = init_kv_cache(CFG, 1, 16, dtype=jnp.float32)
    prompt = jnp.asarray([[1, 2, 3, 4]])
    _, cache_a = llama_prefill(packed, prompt, cache, CFG)
    _, cache_b = llama_prefill(padded, prompt, cache, CFG)
    tok = jnp.asarray([[5]])
    la, _ = llama_decode_step(packed, tok, cache_a, jnp.int32(4), CFG)
    lb, _ = llama_decode_step(padded, tok, cache_b, jnp.int32(4), CFG)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_padded_upgate_pallas_interpret_is_exact():
    """Through the (interpret-mode) Pallas kernels: the padded fused-stage
    kernel must agree with the unpadded one bit-for-bit."""
    import os

    prev = os.environ.get("QEFT_PALLAS")
    os.environ["QEFT_PALLAS"] = "1"
    prev_pad = os.environ.get("QEFT_PAD_UPGATE")
    os.environ["QEFT_PAD_UPGATE"] = "0"  # unpadded baseline; pads explicitly
    try:
        packed = build_packed_model(CFG, jax.random.PRNGKey(1), g=64, r=16,
                                    fuse_stages=True, dtype=jnp.float32)
        layers = dict(packed["layers"])
        layers["upgate"] = pad_upgate_halves(layers["upgate"], multiple=1024)
        padded = {**packed, "layers": layers}

        cache = init_kv_cache(CFG, 1, 16, dtype=jnp.float32)
        prompt = jnp.asarray([[7, 8, 9]])
        _, cache_a = llama_prefill(packed, prompt, cache, CFG)
        _, cache_b = llama_prefill(padded, prompt, cache, CFG)
        tok = jnp.asarray([[2]])
        la, _ = llama_decode_step(packed, tok, cache_a, jnp.int32(3), CFG)
        lb, _ = llama_decode_step(padded, tok, cache_b, jnp.int32(3), CFG)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    finally:
        if prev is None:
            os.environ.pop("QEFT_PALLAS", None)
        else:
            os.environ["QEFT_PALLAS"] = prev
        if prev_pad is None:
            os.environ.pop("QEFT_PAD_UPGATE", None)
        else:
            os.environ["QEFT_PAD_UPGATE"] = prev_pad
