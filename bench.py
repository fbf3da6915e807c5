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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from qeft_tpu.models.llama import LLAMA_PRESETS, init_kv_cache
from qeft_tpu.generate import generate, SampleConfig
from qeft_tpu.testing import build_packed_model

# v5e HBM bandwidth (spec ~819 GB/s)
HBM_BW = 819e9

import os

CTX = 64
GEN = 256
# static KV allocation; the reference allocates max_position_embeddings (4096,
# ftllama_modeling.py:60-67) — QEFT_BENCH_MAXLEN overrides for ablations
MAX_LEN = int(os.environ.get("QEFT_BENCH_MAXLEN", "512"))
GROUP = 128
RANK = 128


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
    # stage-fused packed layers (qkv / upgate): fewer, larger kernel calls
    params = build_packed_model(cfg, key, fuse_stages=True)
    params = jax.device_put(params)

    prompt = jax.random.randint(key, (1, CTX), 0, cfg.vocab_size, jnp.int32)
    cache = init_kv_cache(cfg, 1, MAX_LEN, dtype=jnp.bfloat16)
    sc = SampleConfig(greedy=True)

    # compile + warmup (np.asarray forces real completion through the tunnel);
    # the pooled TPU worker occasionally restarts — retry once after a pause
    for attempt in range(2):
        try:
            tokens, _ = generate(params, prompt, cache, cfg, GEN, sc)
            np.asarray(tokens)
            break
        except Exception:
            if attempt == 1:
                raise
            time.sleep(120)

    best = float("inf")
    for _ in range(3):  # shared-TPU noise: take the best run
        t0 = time.perf_counter()
        tokens, _ = generate(params, prompt, cache, cfg, GEN, sc)
        np.asarray(tokens)
        best = min(best, time.perf_counter() - t0)
    toks_per_s = GEN / best

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
