"""shard_map tensor-parallel decode vs single-device decode (CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from qeft_tpu.models import LLAMA_PRESETS, init_params, init_kv_cache
from qeft_tpu.models.llama import llama_decode_step, llama_prefill
from qeft_tpu.models.registry import get_model_meta
from qeft_tpu.parallel import make_mesh
from qeft_tpu.parallel.tp_forward import tp_shard_packed_params, tp_decode_step
from qeft_tpu.pipeline import QuantizeArgs, extract_global_outidx, quantize_model, pack_model
from qeft_tpu.quant.quantizer import QuantSpec

CFG = LLAMA_PRESETS["tiny-v2"]  # 4 heads / 4 kv heads / dh 128; f=1024
META = get_model_meta("llama")


def fused_packed():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    calib = rng.integers(0, CFG.vocab_size, size=(2, 16))
    args = QuantizeArgs(
        spec=QuantSpec(bits=4, sym=False, mse=False, group_size=128),
        target_rank=16, no_frob_norm=True, nsamples=2,
    )
    outidx, _ = extract_global_outidx(params, calib, CFG, META, args)
    qparams, quantizers = quantize_model(params, calib, CFG, META, args, outidx)
    return pack_model(qparams, quantizers, CFG, META, dtype=jnp.float32, fuse_stages=True)


def test_tp_decode_matches_single_device():
    packed = fused_packed()
    packed = jax.tree.map(jnp.asarray, packed)

    # single-device reference: prefill 4 tokens then one decode step
    cache = init_kv_cache(CFG, 1, 16, dtype=jnp.float32)
    prompt = jnp.asarray([[1, 2, 3, 4]])
    _, cache = llama_prefill(packed, prompt, cache, CFG)
    tok = jnp.asarray([[5]])
    ref_logits, ref_cache = llama_decode_step(packed, tok, cache, jnp.int32(4), CFG)

    for tp in (2, 4):
        mesh = make_mesh((1, tp), axis_names=("dp", "tp"),
                         devices=jax.devices()[:tp])
        sharded = tp_shard_packed_params(packed, mesh, CFG)
        cache_sh = jax.device_put(cache)
        logits, new_cache = tp_decode_step(
            sharded, tok, cache_sh, jnp.int32(4), CFG, mesh
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits), rtol=2e-3, atol=2e-3,
        )
        # cache updated at pos 4 identically (head-major slot dim = 3)
        np.testing.assert_allclose(
            np.asarray(new_cache["k"][:, :, :, 4]),
            np.asarray(ref_cache["k"][:, :, :, 4]),
            rtol=2e-3, atol=2e-3,
        )


def test_tp_decode_bias_and_no_outlier():
    """Hardening: biased linears (col bias shards with N, row bias is added
    exactly once across the psum) and linears packed WITHOUT an outlier slab
    (oweight=None) must still match single-device decode."""
    import dataclasses

    packed = fused_packed()
    packed = jax.tree.map(jnp.asarray, packed)
    rng = np.random.default_rng(1)
    layers = dict(packed["layers"])
    for name in ("qkv", "o", "upgate", "down"):
        lin = layers[name]
        nl, n = lin.qweight.shape[0], lin.qweight.shape[-1]
        bias = jnp.asarray(rng.normal(size=(nl, n)).astype(np.float32) * 0.1)
        ow = None if name in ("upgate", "down") else lin.oweight
        layers[name] = dataclasses.replace(lin, bias=bias, oweight=ow)
    packed = dict(packed, layers=layers)

    cache = init_kv_cache(CFG, 1, 16, dtype=jnp.float32)
    prompt = jnp.asarray([[1, 2, 3, 4]])
    _, cache = llama_prefill(packed, prompt, cache, CFG)
    tok = jnp.asarray([[5]])
    ref_logits, _ = llama_decode_step(packed, tok, cache, jnp.int32(4), CFG)

    mesh = make_mesh((1, 2), axis_names=("dp", "tp"), devices=jax.devices()[:2])
    sharded = tp_shard_packed_params(packed, mesh, CFG)
    logits, _ = tp_decode_step(sharded, tok, jax.device_put(cache), jnp.int32(4), CFG, mesh)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-3, atol=2e-3,
    )


def test_tp_decode_int8_kv_matches_single_device(monkeypatch):
    """int8-KV cache (codes + per-vector scale planes) sharded over kv heads
    must match the single-device int8 decode step."""
    packed = fused_packed()
    packed = jax.tree.map(jnp.asarray, packed)

    cache = init_kv_cache(CFG, 1, 128, quantized=True)
    prompt = jnp.asarray([[1, 2, 3, 4]])
    _, cache = llama_prefill(packed, prompt, cache, CFG)
    tok = jnp.asarray([[5]])
    ref_logits, ref_cache = llama_decode_step(packed, tok, cache, jnp.int32(4), CFG)

    mesh = make_mesh((1, 2), axis_names=("dp", "tp"), devices=jax.devices()[:2])
    sharded = tp_shard_packed_params(packed, mesh, CFG)
    logits, new_cache = tp_decode_step(
        sharded, tok, jax.device_put(cache), jnp.int32(4), CFG, mesh
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(new_cache["k_scale"][:, :, :, 4]),
        np.asarray(ref_cache["k_scale"][:, :, :, 4]),
        rtol=2e-3, atol=2e-3,
    )


def test_tp_generate_matches_single_device():
    """tp_generate (split prefill program + in-shard_map decode loop) must
    emit the same greedy tokens as single-chip generate."""
    from qeft_tpu.generate import SampleConfig, generate
    from qeft_tpu.parallel.tp_forward import tp_generate

    packed = fused_packed()
    packed = jax.tree.map(jnp.asarray, packed)
    prompt = jnp.asarray([[1, 2, 3, 4, 5, 6]])

    cache = init_kv_cache(CFG, 1, 32, dtype=jnp.float32)
    ref_tokens, _ = generate(packed, prompt, cache, CFG, 8, SampleConfig())

    mesh = make_mesh((1, 2), axis_names=("dp", "tp"), devices=jax.devices()[:2])
    sharded = tp_shard_packed_params(packed, mesh, CFG)
    cache2 = init_kv_cache(CFG, 1, 32, dtype=jnp.float32)
    tokens, _ = tp_generate(sharded, prompt, jax.device_put(cache2), CFG, mesh, 8)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref_tokens))
