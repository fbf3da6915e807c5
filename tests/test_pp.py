"""Pipeline-parallel decode (parallel/pp.py): the GPipe-scheduled sharded
step must reproduce single-device decode exactly, including KV-cache writes.

Replaces the reference's model_multigpu blocking layer pipeline
(/root/reference/qeft/utils/modelutils.py:21-57) with an ICI ppermute ring;
correctness gate mirrors the TP tests (sharded == single-device)."""

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
from qeft_tpu.parallel.pp import pp_decode_step, pp_shardings

import dataclasses

CFG = dataclasses.replace(LLAMA_PRESETS["tiny"], num_layers=4)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), ("pp",))


@pytest.mark.parametrize("n_pp,n_mb", [(2, 2), (4, 2), (4, 4)])
def test_pp_decode_matches_single_device(n_pp, n_mb):
    if CFG.num_layers % n_pp:
        pytest.skip("layer count not divisible")
    mesh = _mesh(n_pp)
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    b = 4
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, 5)))

    cache = init_kv_cache(CFG, b, 16, dtype=jnp.float32)
    _, cache = llama_prefill(params, prompt, cache, CFG)
    cache_ref = jax.tree.map(jnp.copy, cache)

    p_sh, c_sh = pp_shardings(params, cache, mesh)
    params_pp = jax.device_put(params, p_sh)
    cache_pp = jax.device_put(cache, c_sh)

    tok = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, 1)))
    for step in range(3):
        pos = jnp.int32(5 + step)
        ref_logits, cache_ref = llama_decode_step(params, tok, cache_ref, pos, CFG)
        pp_logits, cache_pp = pp_decode_step(
            params_pp, tok, cache_pp, pos, CFG, mesh, n_microbatches=n_mb
        )
        np.testing.assert_allclose(
            np.asarray(pp_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
        )
        tok = jnp.argmax(pp_logits, axis=-1).astype(jnp.int32)[:, None]

    # cache contents identical after the pipelined steps
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
        ),
        cache_pp, cache_ref,
    )


def test_pp_decode_packed_model():
    """Packed QLinearParams layers flow through the pipelined step (leaf-wise
    L-dim sharding descends into the registered pytree) and match the
    single-device packed decode."""
    from qeft_tpu.testing import build_packed_model

    n_pp = 2
    mesh = _mesh(n_pp)
    cfg = dataclasses.replace(CFG, hidden_size=256, num_layers=4)
    params = build_packed_model(cfg, jax.random.PRNGKey(1), g=64, r=16)
    b = 4
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, 5)))

    cache = init_kv_cache(cfg, b, 16, dtype=jnp.bfloat16)
    _, cache = llama_prefill(params, prompt, cache, cfg)
    cache_ref = jax.tree.map(jnp.copy, cache)

    p_sh, c_sh = pp_shardings(params, cache, mesh)
    params_pp = jax.device_put(params, p_sh)
    cache_pp = jax.device_put(cache, c_sh)

    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, 1)))
    pos = jnp.int32(5)
    ref_logits, _ = llama_decode_step(params, tok, cache_ref, pos, cfg)
    pp_logits, _ = pp_decode_step(params_pp, tok, cache_pp, pos, cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(pp_logits), np.asarray(ref_logits), rtol=2e-3, atol=2e-3
    )


def test_pp_decode_int8_kv_cache(monkeypatch):
    """Pipelined decode with the quantized (int8 codes + scale planes) cache."""
    monkeypatch.setenv("QEFT_KV_DTYPE", "int8")
    mesh = _mesh(2)
    params = init_params(CFG, jax.random.PRNGKey(6), dtype=jnp.float32)
    b = 4
    rng = np.random.default_rng(6)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, 5)))

    cache = init_kv_cache(CFG, b, 16, dtype=jnp.float32)
    if "k_scale" not in cache:
        pytest.skip("int8 KV knob not active in this build")
    _, cache = llama_prefill(params, prompt, cache, CFG)
    cache_ref = jax.tree.map(jnp.copy, cache)

    p_sh, c_sh = pp_shardings(params, cache, mesh)
    params_pp = jax.device_put(params, p_sh)
    cache_pp = jax.device_put(cache, c_sh)

    tok = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, 1)))
    pos = jnp.int32(5)
    ref_logits, _ = llama_decode_step(params, tok, cache_ref, pos, CFG)
    pp_logits, _ = pp_decode_step(params_pp, tok, cache_pp, pos, CFG, mesh)
    np.testing.assert_allclose(
        np.asarray(pp_logits), np.asarray(ref_logits), rtol=5e-2, atol=5e-2
    )


def test_pp_generate_matches_plain_generate():
    from qeft_tpu.generate import SampleConfig, generate
    from qeft_tpu.parallel.pp import pp_generate

    mesh = _mesh(2)
    params = init_params(CFG, jax.random.PRNGKey(7), dtype=jnp.float32)
    b = 4
    prompt = jnp.asarray(
        np.random.default_rng(7).integers(0, CFG.vocab_size, size=(b, 5))
    )
    cache = init_kv_cache(CFG, b, 16, dtype=jnp.float32)
    ref, _ = generate(params, prompt, jax.tree.map(jnp.copy, cache), CFG, 8,
                      SampleConfig(greedy=True))
    got = pp_generate(params, prompt, cache, CFG, mesh, 8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
