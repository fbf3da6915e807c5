"""On-device check: qgemm_t parity + a real WCT train step through Pallas."""
import sys, time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

print("backend:", jax.default_backend(), jax.devices())

from qeft_tpu.ops.packing import QLinearParams, dequantize_weight, pack_codes
from qeft_tpu.ops.pallas_qmm import qgemm_t

# 7B-shaped transposed-GEMM parity
for (k, n, g) in [(4096, 4096, 128), (11008, 4096, 128), (4096, 11008, 128)]:
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (k, n), 0, 16)
    scales = jax.random.uniform(jax.random.fold_in(key, 1), (k // g, n), jnp.float32, 0.01, 0.03)
    zeros = jax.random.randint(jax.random.fold_in(key, 2), (k // g, n), 0, 16).astype(jnp.float32)
    p = QLinearParams(
        qweight=pack_codes(codes, g), scales=scales.astype(jnp.bfloat16),
        scaled_zeros=(-zeros * scales).astype(jnp.bfloat16), oweight=None,
        bias=None, group_size=g,
    )
    gcot = (jax.random.normal(jax.random.fold_in(key, 3), (128, n)) * 0.1).astype(jnp.bfloat16)
    t0 = time.time()
    got = np.asarray(qgemm_t(gcot, p)).astype(np.float32)
    print(f"qgemm_t k={k} n={n}: ran in {time.time()-t0:.1f}s (incl compile)")
    w = dequantize_weight(p, jnp.float32)
    want = np.asarray(gcot.astype(jnp.float32) @ w.T)
    err = np.abs(got - want) / (np.abs(want) + 1e-3)
    print(f"  rel err: median {np.median(err):.2e} max {err.max():.2e}")
    assert np.median(err) < 2e-2, "parity failed"

# real train step through the Pallas forward+backward (1B-ish scale to be fast)
from qeft_tpu.finetune import TrainConfig, make_optimizer, make_train_step, split_wct
from qeft_tpu.models.llama import LlamaConfig
from qeft_tpu.models.registry import get_model_meta
from qeft_tpu.testing import build_packed_model

cfg = LlamaConfig(
    vocab_size=32000, hidden_size=2048, intermediate_size=5504, num_layers=8,
    num_heads=16, num_kv_heads=16, head_dim=128, max_position_embeddings=512,
)
packed = build_packed_model(cfg, jax.random.PRNGKey(0), fuse_stages=True)
meta = get_model_meta("llama")
oweights, frozen = split_wct(packed, meta)
tc = TrainConfig(total_steps=4, remat=True)
opt = make_optimizer(tc)
opt_state = opt.init(oweights)
step = make_train_step(cfg, opt, remat=True)
ids = jnp.asarray(np.random.default_rng(0).integers(0, 32000, (4, 512)))
t0 = time.time()
oweights, opt_state, loss = step(oweights, opt_state, frozen, ids, ids)
print(f"train step 1 (compile): {time.time()-t0:.1f}s loss={float(loss):.4f}")
t0 = time.time()
for _ in range(3):
    oweights, opt_state, loss = step(oweights, opt_state, frozen, ids, ids)
jax.block_until_ready(loss)
print(f"train steps 2-4: {(time.time()-t0)/3:.2f}s/step loss={float(loss):.4f}")
assert np.isfinite(float(loss))
print("TPU VJP CHECK OK")
