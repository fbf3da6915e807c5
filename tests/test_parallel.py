"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qeft_tpu.models import LLAMA_PRESETS, init_params, llama_forward
from qeft_tpu.models.registry import get_model_meta
from qeft_tpu.parallel import make_mesh, param_shardings, shard_params, cache_shardings

CFG = LLAMA_PRESETS["tiny"]
META = get_model_meta("llama")


def test_mesh_creation():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh((2, 4))
    assert mesh2.shape == {"dp": 2, "tp": 4}


def test_sharded_dense_forward_matches_single_device():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(2, 8)))

    ref = np.asarray(llama_forward(params, tokens, CFG))

    mesh = make_mesh((2, 4))
    sharded = shard_params(params, mesh, META)
    with jax.set_mesh(mesh):
        out = np.asarray(jax.jit(llama_forward, static_argnames="cfg")(sharded, tokens, CFG))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_sharded_packed_forward_matches_single_device():
    from qeft_tpu.pipeline import QuantizeArgs, extract_global_outidx, quantize_model, pack_model
    from qeft_tpu.quant.quantizer import QuantSpec

    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    calib = rng.integers(0, CFG.vocab_size, size=(2, 16))
    args = QuantizeArgs(
        spec=QuantSpec(bits=4, sym=False, mse=False, group_size=64),
        target_rank=8, no_frob_norm=True, nsamples=2,
    )
    outidx, _ = extract_global_outidx(params, calib, CFG, META, args)
    qparams, quantizers = quantize_model(params, calib, CFG, META, args, outidx)
    packed = pack_model(qparams, quantizers, CFG, META, dtype=jnp.float32)

    tokens = jnp.asarray(calib[:1])
    ref = np.asarray(llama_forward(packed, tokens, CFG))

    mesh = make_mesh((1, 8))
    sharded = shard_params(packed, mesh, META)
    with jax.set_mesh(mesh):
        out = np.asarray(jax.jit(llama_forward, static_argnames="cfg")(sharded, tokens, CFG))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_sharded_generation():
    from qeft_tpu.generate import generate, SampleConfig
    from qeft_tpu.models import init_kv_cache

    params = init_params(CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
    prompt = jnp.zeros((2, 4), jnp.int32)

    cache = init_kv_cache(CFG, 2, 16, dtype=jnp.float32)
    ref, _ = generate(params, prompt, cache, CFG, 5, SampleConfig())

    mesh = make_mesh((2, 4))
    sharded = shard_params(params, mesh, META)
    cache_sh = jax.device_put(
        init_kv_cache(CFG, 2, 16, dtype=jnp.float32),
        cache_shardings(mesh, batch=2, n_kv_heads=CFG.num_kv_heads),
    )
    with jax.set_mesh(mesh):
        out, _ = generate(sharded, prompt, cache_sh, CFG, 5, SampleConfig())
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_param_shardings_with_runtime_reorder_ids():
    """Packed linears carrying a per-linear input gather (per-layer-outlier
    packs: act-order, bloom/falcon without OGR) must shard — reorder_ids
    rides the QLinearParams pytree as a 6th leaf (round-2 review)."""
    import dataclasses

    from qeft_tpu.models.registry import get_model_meta
    from qeft_tpu.parallel import make_mesh, param_shardings
    from qeft_tpu.testing import build_packed_model
    from qeft_tpu.models import LLAMA_PRESETS

    cfg = LLAMA_PRESETS["tiny"]
    params = build_packed_model(cfg, jax.random.PRNGKey(0))
    k_in = cfg.hidden_size
    params["layers"]["q"] = dataclasses.replace(
        params["layers"]["q"],
        reorder_ids=jnp.tile(jnp.arange(k_in, dtype=jnp.int32), (cfg.num_layers, 1)),
    )
    mesh = make_mesh((1, 8))
    shardings = param_shardings(params, mesh, get_model_meta("llama"))
    spec = shardings["layers"]["q"].reorder_ids.spec
    assert all(axis is None for axis in spec), spec


def test_fused_stage_packed_model_actually_shards():
    """Regression: stage-fused packed models ('qkv'/'upgate' keys, the layout
    fuse_packed_stages / pack_model(fuse_stages=True) produce) must get real
    column-parallel shardings, not silent full replication."""
    from qeft_tpu.testing import build_packed_model

    cfg = LLAMA_PRESETS["tiny-v2"]
    params = build_packed_model(cfg, jax.random.PRNGKey(0), fuse_stages=True)
    mesh = make_mesh((1, 4), devices=jax.devices()[:4])
    shardings = param_shardings(params, mesh, META)
    for name in ("qkv", "upgate"):
        spec = shardings["layers"][name].qweight.spec
        assert "tp" in spec, (name, spec)

    # and the sharded forward still matches single-device (builder model is
    # bf16 — GSPMD reduction-order drift is ~bf16 epsilon)
    tokens = jnp.zeros((1, 4), jnp.int32)
    ref = np.asarray(llama_forward(params, tokens, cfg), np.float32)
    sharded = shard_params(params, mesh, META)
    with jax.set_mesh(mesh):
        out = np.asarray(
            jax.jit(llama_forward, static_argnames="cfg")(sharded, tokens, cfg),
            np.float32,
        )
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.02)


def test_cache_shardings_quantized_pytree():
    """int8 KV caches ({k,v,k_scale,v_scale}) must shard without a pytree
    structure mismatch."""
    from qeft_tpu.models import init_kv_cache

    mesh = make_mesh((2, 4))
    cache = init_kv_cache(CFG, 2, 16, quantized=True)
    sh = cache_shardings(mesh, batch=2, n_kv_heads=CFG.num_kv_heads, quantized=True)
    out = jax.device_put(cache, sh)
    assert set(out) == {"k", "v", "k_scale", "v_scale"}
    assert out["k_scale"].sharding.spec == sh["k_scale"].spec
