"""Sharded WCT training through the (interpret-mode) Pallas kernels:
loss + oweight-gradient parity vs the single-device train path, and one
optimizer step, on the virtual CPU mesh.

Each case runs in its OWN subprocess: compiling the sharded value_and_grad
program is the largest compile in the suite, and XLA:CPU segfaulted on it
three separate times when ~190 tests' worth of programs/buffers had
accumulated in the pytest process (backend_compile / executable-serialize
frames; the same compile succeeds in a fresh process in ~60 s).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn(mode: str) -> None:
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    env.update(JAX_PLATFORMS="cpu", QEFT_PALLAS="1", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), mode],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, (
        f"{mode} child failed ({r.returncode}):\n"
        f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    )


def test_tp_train_loss_and_grad_parity():
    _spawn("parity")


def test_tp_train_step_runs():
    _spawn("step")


# --------------------------------------------------------------------------
# child-process bodies


def _setup(dp=2, tp=2):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qeft_tpu.models.llama import LLAMA_PRESETS
    from qeft_tpu.models.registry import get_model_meta
    from qeft_tpu.parallel import make_mesh
    from qeft_tpu.testing import build_packed_model

    cfg = LLAMA_PRESETS["tiny-v2"]
    meta = get_model_meta("llama")
    packed = build_packed_model(cfg, jax.random.PRNGKey(3), g=64, r=16,
                                fuse_stages=True)
    # f32 for exact parity (the bf16 path runs in the "step" case)
    packed = jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a,
        packed,
    )
    mesh = make_mesh((dp, tp), devices=jax.devices()[: dp * tp])
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(dp * 2, 16)))
    return cfg, meta, packed, mesh, ids


def _run_parity():
    import jax
    import numpy as np

    from qeft_tpu.finetune import split_wct, wct_loss
    from qeft_tpu.parallel.tp_forward import _interleave_perm
    from qeft_tpu.parallel.tp_train import make_tp_loss_and_grad, tp_shard_wct

    cfg, meta, packed, mesh, ids = _setup()
    tp = mesh.shape["tp"]

    # single-device reference
    ow0, frozen0 = split_wct(packed, meta)
    ref_loss, ref_grads = jax.value_and_grad(
        lambda ow: wct_loss(ow, frozen0, ids, ids, cfg, remat=False)
    )(ow0)

    # sharded
    ow, frozen = tp_shard_wct(packed, mesh, cfg, meta)
    lg = make_tp_loss_and_grad(cfg, mesh, ow, frozen, remat=False)
    loss, grads = lg(ow, frozen, ids, ids)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-3)

    # column-parallel oweights were interleave-permuted host-side; invert
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    qkv_perm = _interleave_perm([hq * dh, hkv * dh, hkv * dh], tp)
    f = packed["layers"]["upgate"].out_features // 2
    ug_perm = _interleave_perm([f, f], tp)
    inv = lambda p: np.argsort(p)

    for name, ref in ref_grads.items():
        got = np.asarray(grads[name], np.float32)
        if name == "qkv":
            got = got[..., inv(qkv_perm)]
        elif name == "upgate":
            got = got[..., inv(ug_perm)]
        ref = np.asarray(ref, np.float32)
        scale = np.maximum(np.abs(ref).max(), 1e-6)
        # 5e-4: the sharded path contracts K in per-shard partial sums (and
        # the group-interleaved word layout reorders the plane contraction),
        # so low-precision rounding differs from the single-device reference
        # by a few ulp on near-cancelling sums (observed max 3e-4 normalized,
        # on 0.02% of elements)
        np.testing.assert_allclose(got / scale, ref / scale, atol=5e-4,
                                   err_msg=name)
    print("parity ok")


def _run_step():
    import jax
    import numpy as np

    from qeft_tpu.finetune import TrainConfig, make_optimizer
    from qeft_tpu.parallel.tp_train import make_tp_train_step, tp_shard_wct

    cfg, meta, packed, mesh, ids = _setup()
    ow, frozen = tp_shard_wct(packed, mesh, cfg, meta)
    tc = TrainConfig(learning_rate=1e-3, total_steps=4, remat=True)
    opt = make_optimizer(tc)
    opt_state = opt.init(ow)
    step = make_tp_train_step(cfg, opt, mesh, ow, frozen, remat=True)
    with jax.set_mesh(mesh):
        losses = []
        for _ in range(3):  # step 1 is warmup (lr 0): compare 3rd vs 1st
            ow, opt_state, loss = step(ow, opt_state, frozen, ids, ids)
            losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0]  # oweights actually move on the same batch
    print("step ok")


if __name__ == "__main__":
    import jax

    # the axon sitecustomize force-registers the TPU backend and overrides
    # JAX_PLATFORMS; force CPU back before any backend use (see conftest.py)
    jax.config.update("jax_platforms", "cpu")
    {"parity": _run_parity, "step": _run_step}[sys.argv[1]]()
