"""Flash-prefill A/B on the real chip (VERDICT r3 weak #4 / next #6).

Measures long-context prefill latency + device peak memory with the Pallas
flash/blockwise window attention (ops/pallas_flash.py, default ON on TPU)
vs the eager masked-score path it replaced (the [Sq, Sk] fp32 score tensor
materializes there — the reference's prefill is the eager analogue,
/root/reference/qeft/monkeypatch/ftllama_modeling.py:87-125).

Usage:  python scripts/prefill_probe.py [ctx ...]
Knobs:  QEFT_BENCH_CKPT (default real 7B ckpt; random builder fallback),
        QEFT_PREFILL_MODEL (builder preset when no ckpt, default llama2-7b),
        QEFT_FLASH_BLKQ/BLKK (block-size scan).
Each timing is best-of-3, fetch-synced (np.asarray of a logits slice).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qeft_tpu.models.llama import LLAMA_PRESETS, init_kv_cache, llama_prefill
from qeft_tpu.models.registry import get_model_meta

CKPT = os.environ.get(
    "QEFT_BENCH_CKPT", "/root/repo/ckpt/llama2_7b_w4g128r128_packed"
)


def load():
    if os.path.exists(CKPT + ".json"):
        from qeft_tpu.checkpoint import load_packed
        from qeft_tpu.pipeline import fuse_packed_stages

        params, cfg, family = load_packed(CKPT)
        print(f"# real ckpt {CKPT}")
        return fuse_packed_stages(params, get_model_meta(family)), cfg
    from qeft_tpu.testing import build_packed_model

    preset = os.environ.get("QEFT_PREFILL_MODEL", "llama2-7b")
    cfg = LLAMA_PRESETS[preset]
    print(f"# random builder {preset}")
    return build_packed_model(cfg, jax.random.PRNGKey(0), fuse_stages=True), cfg


def peak_mb() -> float:
    stats = jax.local_devices()[0].memory_stats() or {}
    return stats.get("peak_bytes_in_use", 0) / 1e6


def main():
    ctxs = [int(a) for a in sys.argv[1:]] or [1024, 4096]
    params, cfg = load()
    params = jax.device_put(params)
    key = jax.random.PRNGKey(0)

    prefill = jax.jit(llama_prefill, static_argnames=("cfg",))
    for ctx in ctxs:
        prompt = jax.random.randint(key, (1, ctx), 0, cfg.vocab_size, jnp.int32)
        for flash in ("1", "0"):
            os.environ["QEFT_FLASH_ATTN"] = flash
            # fresh traced fn per mode (env is read at trace time)
            fn = jax.jit(llama_prefill, static_argnames=("cfg",))
            cache = init_kv_cache(cfg, 1, ctx, dtype=jnp.bfloat16)
            try:
                logits, _ = fn(params, prompt, cache, cfg)
                np.asarray(logits[:, -1, :1])
            except Exception as e:
                print(f"ctx={ctx} flash={flash}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
                continue
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                logits, _ = fn(params, prompt, cache, cfg)
                np.asarray(logits[:, -1, :1])
                best = min(best, time.perf_counter() - t0)
            print(
                f"ctx={ctx} flash={flash}: {best*1e3:8.1f} ms "
                f"({ctx/best:8.0f} tok/s prefill)  peak_mem={peak_mb():8.0f} MB"
            )


if __name__ == "__main__":
    main()
