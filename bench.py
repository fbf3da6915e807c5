"""Headline benchmark: single-chip decode throughput, Llama-2-7B w4/g128/r128.

Measures the reference's canonical decode workload (context 64 + 256 greedy
decode steps, batch 1 — /root/reference/qeft/benchmark.py:117-120,292-338) on
the packed Pallas path, and reports tokens/s against the INT4 weight-streaming
roofline of the chip (BASELINE.md: target >=80% of roofline).

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from qeft_tpu.models.llama import LLAMA_PRESETS, LlamaConfig, init_kv_cache
from qeft_tpu.ops.packing import QLinearParams
from qeft_tpu.generate import generate, SampleConfig

# v5e HBM bandwidth (spec ~819 GB/s)
HBM_BW = 819e9

CTX = 64
GEN = 256
MAX_LEN = 512
GROUP = 128
RANK = 128


def random_packed_linear(key, k, n, g=GROUP, r=RANK, with_reorder=False):
    """Shape-faithful random packed layer (decode throughput is value-agnostic)."""
    ks = jax.random.split(key, 4)
    qweight = jax.random.randint(ks[0], (k // 2, n), 0, 256, jnp.int32).astype(jnp.uint8)
    scales = (jax.random.uniform(ks[1], (k // g, n)) * 0.02 + 0.01).astype(jnp.bfloat16)
    szeros = (-jax.random.uniform(ks[2], (k // g, n)) * 0.16).astype(jnp.bfloat16)
    ow = (jax.random.normal(ks[3], (r, n)) * 0.02).astype(jnp.bfloat16)
    return QLinearParams(
        qweight=qweight, scales=scales, scaled_zeros=szeros, oweight=ow,
        bias=None, reorder_ids=None, group_size=g,
    )


def build_packed_model(cfg: LlamaConfig, key):
    d, f = cfg.hidden_size, cfg.intermediate_size
    hd = cfg.num_heads * cfg.head_dim
    hkv = cfg.num_kv_heads * cfg.head_dim
    keys = jax.random.split(key, 4)

    def blocks(k):
        def one(kk):
            kks = jax.random.split(kk, 7)
            return {
                "input_ln": jnp.ones((d,), jnp.bfloat16),
                "post_ln": jnp.ones((d,), jnp.bfloat16),
                "q": random_packed_linear(kks[0], d, hd),
                "k": random_packed_linear(kks[1], d, hkv),
                "v": random_packed_linear(kks[2], d, hkv),
                "o": random_packed_linear(kks[3], hd, d),
                "up": random_packed_linear(kks[4], d, f),
                "gate": random_packed_linear(kks[5], d, f),
                "down": random_packed_linear(kks[6], f, d),
                "o_reorder": jnp.arange(hd, dtype=jnp.int32),
            }

        outs = [one(jax.random.fold_in(k, i)) for i in range(cfg.num_layers)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    return {
        "embed": (jax.random.normal(keys[0], (cfg.vocab_size, d)) * 0.02).astype(jnp.bfloat16),
        "layers": blocks(keys[1]),
        "final_ln": jnp.ones((d,), jnp.bfloat16),
        "lm_head": (jax.random.normal(keys[2], (d, cfg.vocab_size)) * 0.02).astype(jnp.bfloat16),
    }


def streamed_bytes_per_token(params) -> int:
    """Bytes that must cross HBM per decoded token: every decoder-layer
    parameter + final norm + lm_head (embed is a single-row gather)."""
    total = 0
    for leaf in jax.tree.leaves(params["layers"]):
        total += leaf.size * leaf.dtype.itemsize
    total += params["final_ln"].size * 2
    total += params["lm_head"].size * 2
    return total


def main():
    cfg = LLAMA_PRESETS["llama2-7b"]
    key = jax.random.PRNGKey(0)
    params = build_packed_model(cfg, key)
    params = jax.device_put(params)

    prompt = jax.random.randint(key, (1, CTX), 0, cfg.vocab_size, jnp.int32)
    cache = init_kv_cache(cfg, 1, MAX_LEN, dtype=jnp.bfloat16)
    sc = SampleConfig(greedy=True)

    # compile + warmup
    tokens, _ = generate(params, prompt, cache, cfg, GEN, sc)
    tokens.block_until_ready()

    t0 = time.perf_counter()
    tokens, _ = generate(params, prompt, cache, cfg, GEN, sc)
    tokens.block_until_ready()
    dt = time.perf_counter() - t0
    toks_per_s = GEN / dt

    wbytes = streamed_bytes_per_token(params)
    roofline = HBM_BW / wbytes
    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_s_per_chip_llama2_7b_w4g128r128",
                "value": round(toks_per_s, 2),
                "unit": "tokens/s",
                "vs_baseline": round(toks_per_s / roofline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
