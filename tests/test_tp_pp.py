"""2-D tp×pp decode (CPU mesh) vs single-device decode — including the 70B
GQA shape (hq=64, hkv=8, GQA ratio 8) at reduced width/depth.

The composition is the pod target (BASELINE.md: Llama-2-70B w4/g128 multi-host
decode): pp shards the layer spans, tp shards every block's weights inside a
span.  VERDICT r3 #5: no 2-D path existed and the 70B head geometry
(fused-qkv interleave at hq != hkv, outlier-slab-on-last-shard at ratio-8
GQA) was untested.

Runs in its OWN subprocess (the test_tp_train pattern): 2-D shard_map decode
is among the largest interpret-mode compiles in the suite and XLA:CPU
segfaults on big compiles late in an accumulated pytest process.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tp_pp_suite():
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    env.update(JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, (
        f"child failed ({r.returncode}):\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    )


# --------------------------------------------------------------------------
# child-process bodies

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh

from qeft_tpu.generate import SampleConfig, generate
from qeft_tpu.models.llama import (
    LLAMA_PRESETS,
    LlamaConfig,
    init_kv_cache,
    llama_decode_step,
    llama_prefill,
)
from qeft_tpu.parallel.tp_pp import (
    tppp_decode_step,
    tppp_generate,
    tppp_shard_params,
)
from qeft_tpu.testing import build_packed_model

# 70B head geometry (hq=64, hkv=8, 8:1 GQA; LLAMA_PRESETS["llama2-70b"]) at
# reduced head_dim/depth/ffn so the CPU mesh runs it in seconds — the
# sharding-relevant shapes (head counts, GQA ratio, fused-qkv interleave,
# group counts per shard) are what the test pins, not the byte volume
CFG_70B_SHAPE = LlamaConfig(
    vocab_size=512,
    hidden_size=1024,  # 64 heads x dh 16
    intermediate_size=3584,  # keeps 70B's 3.5x ratio; 56 g=64 groups
    num_layers=4,
    num_heads=64,
    num_kv_heads=8,
    head_dim=16,
    max_position_embeddings=128,
)


def make_2d_mesh(n_pp: int, tp: int) -> Mesh:
    devs = np.array(jax.devices()[: n_pp * tp]).reshape(n_pp, tp)
    return Mesh(devs, ("pp", "tp"))


def make_3d_mesh(dp: int, n_pp: int, tp: int) -> Mesh:
    devs = np.array(jax.devices()[: dp * n_pp * tp]).reshape(dp, n_pp, tp)
    return Mesh(devs, ("dp", "pp", "tp"))


def _roundtrip(cfg, mesh, batch, r=16, g=64, quantized=False):
    packed = build_packed_model(cfg, jax.random.PRNGKey(0), g=g, r=r,
                                fuse_stages=True, dtype=jnp.float32)
    cache = init_kv_cache(cfg, batch, 32, dtype=jnp.float32,
                          quantized=quantized)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(batch, 6)))
    _, cache = llama_prefill(packed, prompt, cache, cfg)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(batch, 1)))
    ref_logits, ref_cache = llama_decode_step(
        packed, tok, cache, jnp.int32(6), cfg
    )

    sharded, cache_sh = tppp_shard_params(packed, jax.device_put(cache), mesh,
                                          cfg)
    logits, new_cache = tppp_decode_step(
        sharded, tok, cache_sh, jnp.int32(6), cfg, mesh
    )
    np.testing.assert_allclose(
        np.asarray(logits, np.float32),
        np.asarray(ref_logits, np.float32),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(new_cache["k"][:, :, :, 6], np.float32),
        np.asarray(ref_cache["k"][:, :, :, 6], np.float32),
        rtol=2e-3, atol=2e-3,
    )


def check_tppp_decode_matches_single_device():
    cfg = LLAMA_PRESETS["tiny-v2"]
    _roundtrip(cfg, make_2d_mesh(2, 2), batch=2)


def check_tppp_decode_70b_gqa_shape():
    """hq=64/hkv=8 fused-qkv interleave + ratio-8 GQA + 14 down-proj groups
    per tp shard + the fp outlier slab applied by the last shard only."""
    _roundtrip(CFG_70B_SHAPE, make_2d_mesh(2, 4), batch=2)


def check_tppp_decode_int8_kv_matches_single_device():
    """int8-KV (codes + per-vector scale planes) through the 2-D composition:
    the scale planes' [L, B, H_kv, S] leaves must pick up (pp, dp, tp) specs
    consistently with the code slabs."""
    cfg = LLAMA_PRESETS["tiny-v2"]
    _roundtrip(cfg, make_2d_mesh(2, 2), batch=2, quantized=True)


def check_dp_tppp_decode_matches_single_device():
    """Full 3-D dp×pp×tp composition: batch rows shard over the outer dp
    axis (weights replicated, no cross-dp collective), layers over pp, block
    weights/KV heads over tp — the complete pod shape of VERDICT r3 #5."""
    cfg = LLAMA_PRESETS["tiny-v2"]
    _roundtrip(cfg, make_3d_mesh(2, 2, 2), batch=4)


def check_tppp_generate_matches_single_device():
    cfg = LLAMA_PRESETS["tiny-v2"]
    packed = build_packed_model(cfg, jax.random.PRNGKey(1), g=64, r=16,
                                fuse_stages=True, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 5)))

    cache = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    ref_tokens, _ = generate(packed, prompt, cache, cfg, 6, SampleConfig())

    mesh = make_2d_mesh(2, 2)
    cache2 = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    sharded, cache_sh = tppp_shard_params(packed, cache2, mesh, cfg)
    tokens = tppp_generate(sharded, prompt, cache_sh, cfg, mesh, 6)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref_tokens))


if __name__ == "__main__":
    check_tppp_decode_matches_single_device()
    check_tppp_decode_70b_gqa_shape()
    check_tppp_decode_int8_kv_matches_single_device()
    check_dp_tppp_decode_matches_single_device()
    check_tppp_generate_matches_single_device()
    print("tp-pp child ok")
