"""Probe: GSPMD-sharded vs unsharded decode logits on the multihost_dryrun
tiny model, teacher-forced with the unsharded trajectory.  Distinguishes a
layout/feeding bug (one row's logits totally different) from reduction-order
rounding (uniform tiny deltas)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp
import numpy as np

from qeft_tpu.models.llama import (
    LlamaConfig, init_kv_cache, llama_decode_step, llama_prefill,
)
from qeft_tpu.models.registry import get_model_meta
from qeft_tpu.parallel.mesh import cache_shardings, make_mesh, shard_params
from qeft_tpu.testing import build_packed_model

cfg = LlamaConfig(
    vocab_size=512, hidden_size=256, intermediate_size=512, num_layers=2,
    num_heads=4, num_kv_heads=4, head_dim=64, max_position_embeddings=128,
)
meta = get_model_meta("llama")
packed = build_packed_model(cfg, jax.random.PRNGKey(0), g=64, r=16)
mesh = make_mesh((2, 4), ("dp", "tp"))
sharded = shard_params(packed, mesh, meta)

n, ctx, steps = 4, 8, 3
rng = np.random.default_rng(0)
prompts = jnp.asarray(rng.integers(0, cfg.vocab_size, (n, ctx)))

# eager, unsharded reference (free-running greedy), exactly like the dryrun
ref_cache = init_kv_cache(cfg, n, 32)
rl, ref_cache = llama_prefill(packed, prompts, ref_cache, cfg)
ref_logits = [np.asarray(rl[:, -1, :], np.float32)]
rn = jnp.argmax(rl[:, -1, :], axis=-1)[:, None]
ref_toks = [np.asarray(rn)]
for i in range(steps):
    rl, ref_cache = llama_decode_step(packed, rn, ref_cache, jnp.int32(ctx + i), cfg)
    rn = jnp.argmax(rl, axis=-1)[:, None]
    ref_logits.append(np.asarray(rl, np.float32))
    ref_toks.append(np.asarray(rn))

# sharded, jitted, teacher-forced with the reference tokens
c_sh = cache_shardings(mesh, batch=n, n_kv_heads=cfg.num_kv_heads)
cache = jax.tree.map(jax.device_put, init_kv_cache(cfg, n, 32), c_sh)
prefill = jax.jit(llama_prefill, static_argnames=("cfg",))
decode = jax.jit(llama_decode_step, static_argnames=("cfg",))
logits, cache = prefill(sharded, prompts, cache, cfg)
got = [np.asarray(logits[:, -1, :], np.float32)]
for i in range(steps):
    forced = jnp.asarray(ref_toks[i])
    lg, cache = decode(sharded, forced, cache, jnp.int32(ctx + i), cfg)
    got.append(np.asarray(lg, np.float32))

for i, (mine, ref) in enumerate(zip(got, ref_logits)):
    d = np.abs(mine - ref)
    print(f"step {i}: max={d.max():.4f} mean={d.mean():.4f} "
          f"per_row_max={np.round(d.max(-1), 4)} "
          f"mine_am={mine.argmax(-1)} ref_am={ref.argmax(-1)}")
