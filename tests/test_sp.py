"""Sequence-parallel ring-attention prefill (parallel/sp.py): sharded over
the prompt dimension, must equal single-device prefill — logits AND the K/V
slab — and compose with normal decode afterwards."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from qeft_tpu.models import LLAMA_PRESETS, init_params
from qeft_tpu.models.llama import (
    init_kv_cache,
    llama_decode_step,
    llama_prefill,
)
from qeft_tpu.parallel.sp import llama_prefill_sp

CFG = LLAMA_PRESETS["tiny"]


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), ("sp",))


@pytest.mark.parametrize("n_sp", [2, 4])
def test_sp_prefill_matches_single_device(n_sp):
    mesh = _mesh(n_sp)
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    b, s = 2, 16
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, s)))

    sp_logits, sp_kv = llama_prefill_sp(params, prompt, CFG, mesh)

    cache = init_kv_cache(CFG, b, 32, dtype=jnp.float32)
    ref_logits, ref_cache = llama_prefill(params, prompt, cache, CFG)

    np.testing.assert_allclose(
        np.asarray(sp_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )
    for k in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(sp_kv[k]), np.asarray(ref_cache[k][:, :, :, :s]),
            rtol=2e-4, atol=2e-4,
        )


def test_sp_prefill_then_decode():
    """Scatter the sp-prefill KV slab into a decode cache and decode: tokens
    must equal the fully single-device pipeline's."""
    mesh = _mesh(2)
    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    b, s = 1, 8
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, s)))

    sp_logits, sp_kv = llama_prefill_sp(params, prompt, CFG, mesh)
    cache = init_kv_cache(CFG, b, 16, dtype=jnp.float32)
    cache = {k: cache[k].at[:, :, :, :s].set(sp_kv[k].astype(cache[k].dtype))
             for k in cache}

    ref_cache = init_kv_cache(CFG, b, 16, dtype=jnp.float32)
    ref_logits, ref_cache = llama_prefill(params, prompt, ref_cache, CFG)

    tok = jnp.argmax(sp_logits[:, -1, :], axis=-1)[:, None].astype(jnp.int32)
    ref_tok = jnp.argmax(ref_logits[:, -1, :], axis=-1)[:, None].astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))
    for i in range(4):
        lg, cache = llama_decode_step(params, tok, cache, jnp.int32(s + i), CFG)
        rlg, ref_cache = llama_decode_step(
            params, ref_tok, ref_cache, jnp.int32(s + i), CFG
        )
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(rlg), rtol=2e-4, atol=2e-4
        )
        tok = jnp.argmax(lg, axis=-1)[:, None].astype(jnp.int32)
        ref_tok = jnp.argmax(rlg, axis=-1)[:, None].astype(jnp.int32)


def test_sp_prefill_gqa_and_packed():
    """GQA head repetition inside the ring + packed QLinearParams layers."""
    from qeft_tpu.testing import build_packed_model

    mesh = _mesh(2)
    cfg = dataclasses.replace(CFG, hidden_size=256, num_layers=2)
    params = build_packed_model(cfg, jax.random.PRNGKey(2), g=64, r=16)
    b, s = 1, 8
    prompt = jnp.asarray(
        np.random.default_rng(2).integers(0, cfg.vocab_size, size=(b, s))
    )
    sp_logits, _ = llama_prefill_sp(params, prompt, cfg, mesh)
    cache = init_kv_cache(cfg, b, 16, dtype=jnp.bfloat16)
    ref_logits, _ = llama_prefill(params, prompt, cache, cfg)
    np.testing.assert_allclose(
        np.asarray(sp_logits, np.float32), np.asarray(ref_logits, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_sp_decode_sharded_cache_matches_single_device():
    """Decode over an sp-sharded KV cache (flash partials + one psum round)
    equals single-device decode, including owner-shard cache writes."""
    from qeft_tpu.parallel.sp import llama_decode_step_sp

    n_sp = 2
    mesh = _mesh(n_sp)
    params = init_params(CFG, jax.random.PRNGKey(4), dtype=jnp.float32)
    b, s = 2, 7
    rng = np.random.default_rng(4)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, s)))

    cache = init_kv_cache(CFG, b, 16, dtype=jnp.float32)
    _, cache = llama_prefill(params, prompt, cache, CFG)
    cache_ref = jax.tree.map(jnp.copy, cache)

    tok = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, 1)))
    # cross the shard boundary (s_loc = 8): positions 7, 8, 9
    for step in range(3):
        pos = jnp.int32(s + step)
        ref_logits, cache_ref = llama_decode_step(params, tok, cache_ref, pos, CFG)
        sp_logits, cache = llama_decode_step_sp(params, tok, cache, pos, CFG, mesh)
        np.testing.assert_allclose(
            np.asarray(sp_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
        )
        tok = jnp.argmax(sp_logits, axis=-1).astype(jnp.int32)[:, None]

    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
        ),
        cache, cache_ref,
    )


def test_sp_decode_int8_kv_cache(monkeypatch):
    """sp decode handles the quantized (int8 codes + scale planes) cache."""
    from qeft_tpu.parallel.sp import llama_decode_step_sp

    monkeypatch.setenv("QEFT_KV_DTYPE", "int8")
    mesh = _mesh(2)
    params = init_params(CFG, jax.random.PRNGKey(5), dtype=jnp.float32)
    b, s = 1, 6
    rng = np.random.default_rng(5)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, s)))

    cache = init_kv_cache(CFG, b, 16, dtype=jnp.float32)
    if "k_scale" not in cache:
        pytest.skip("int8 KV knob not active in this build")
    _, cache = llama_prefill(params, prompt, cache, CFG)
    cache_ref = jax.tree.map(jnp.copy, cache)

    tok = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, 1)))
    for step in range(2):
        pos = jnp.int32(s + step)
        ref_logits, cache_ref = llama_decode_step(params, tok, cache_ref, pos, CFG)
        sp_logits, cache = llama_decode_step_sp(params, tok, cache, pos, CFG, mesh)
        np.testing.assert_allclose(
            np.asarray(sp_logits), np.asarray(ref_logits), rtol=5e-2, atol=5e-2
        )
        tok = jnp.argmax(sp_logits, axis=-1).astype(jnp.int32)[:, None]
