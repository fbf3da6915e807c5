"""Shape-faithful random model builders for benchmarks/compile checks.

Decode throughput and compile validation don't depend on weight values, so
these build packed models directly (skipping the minutes-long GPTQ pass)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qeft_tpu.models.llama import LlamaConfig
from qeft_tpu.ops.packing import QLinearParams


def random_packed_linear(key, k, n, g=128, r=128, dtype=jnp.bfloat16) -> QLinearParams:
    ks = jax.random.split(key, 4)
    qweight = jax.random.randint(
        ks[0], (k // 8, n), jnp.iinfo(jnp.int32).min, jnp.iinfo(jnp.int32).max, jnp.int32
    )
    scales = (jax.random.uniform(ks[1], (k // g, n)) * 0.02 + 0.01).astype(dtype)
    szeros = (-jax.random.uniform(ks[2], (k // g, n)) * 0.16).astype(dtype)
    ow = (jax.random.normal(ks[3], (r, n)) * 0.02).astype(dtype)
    return QLinearParams(
        qweight=qweight, scales=scales, scaled_zeros=szeros, oweight=ow,
        bias=None, group_size=g,
    )


def build_packed_model(cfg: LlamaConfig, key, g=128, r=128, fuse_stages=False,
                       dtype=jnp.bfloat16):
    """``dtype``: float param dtype — float32 builds are for CPU equality
    tests where bf16 rounding noise would mask real sharding bugs."""
    # Build on the HOST: the per-layer leaves plus their jnp.stack copy would
    # transiently hold 2x the packed bytes — at 13B that OOMs a 16 GB chip
    # before the benchmark even starts.  Callers device_put the final pytree
    # once (one streamed transfer, no doubling).
    if jax.default_backend() == "cpu":
        # already host-resident; do NOT device_put — committing the leaves to
        # cpu:0 would break shard_map tests over multi-device CPU meshes
        return _maybe_pad(
            _build_packed_model_host(cfg, key, g, r, fuse_stages, dtype),
            fuse_stages,
        )
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        host = _maybe_pad(
            _build_packed_model_host(cfg, key, g, r, fuse_stages, dtype),
            fuse_stages,
        )
    # one explicit transfer (device_put with no target would leave the
    # committed-to-CPU arrays where they are)
    return jax.device_put(host, jax.local_devices()[0])


def _maybe_pad(params, fuse_stages):
    """Mirror production load (pipeline.fuse_packed_stages): pad the fused
    upgate halves for bn=1024 decode tiles (QEFT_PAD_UPGATE) and attach the
    banded o-permutation operands (QEFT_O_BAND)."""
    from qeft_tpu.ops.permute import attach_o_band
    from qeft_tpu.pipeline import _pad_upgate_enabled, pad_upgate_halves

    if fuse_stages and _pad_upgate_enabled():
        layers = dict(params["layers"])
        layers["upgate"] = pad_upgate_halves(layers["upgate"])
        params = {**params, "layers": layers}
    if fuse_stages:
        params = attach_o_band(params)
    return params


def _build_packed_model_host(cfg: LlamaConfig, key, g, r, fuse_stages,
                             dtype=jnp.bfloat16):
    d, f = cfg.hidden_size, cfg.intermediate_size
    hd = cfg.num_heads * cfg.head_dim
    hkv = cfg.num_kv_heads * cfg.head_dim
    keys = jax.random.split(key, 4)

    def one(kk):
        kks = jax.random.split(kk, 7)
        blk = {
            "input_ln": jnp.ones((d,), dtype),
            "post_ln": jnp.ones((d,), dtype),
            "o": random_packed_linear(kks[3], hd, d, g, r, dtype),
            "down": random_packed_linear(kks[6], f, d, g, r, dtype),
            "o_reorder": jnp.arange(hd, dtype=jnp.int32),
        }
        if fuse_stages:
            blk["qkv"] = random_packed_linear(kks[0], d, hd + 2 * hkv, g, r, dtype)
            blk["upgate"] = random_packed_linear(kks[4], d, 2 * f, g, r, dtype)
        else:
            blk.update({
                "q": random_packed_linear(kks[0], d, hd, g, r, dtype),
                "k": random_packed_linear(kks[1], d, hkv, g, r, dtype),
                "v": random_packed_linear(kks[2], d, hkv, g, r, dtype),
                "up": random_packed_linear(kks[4], d, f, g, r, dtype),
                "gate": random_packed_linear(kks[5], d, f, g, r, dtype),
            })
        return blk

    blocks = [one(jax.random.fold_in(keys[1], i)) for i in range(cfg.num_layers)]
    return {
        "embed": (jax.random.normal(keys[0], (cfg.vocab_size, d)) * 0.02).astype(dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": jnp.ones((d,), dtype),
        "lm_head": (jax.random.normal(keys[2], (d, cfg.vocab_size)) * 0.02).astype(dtype),
    }
