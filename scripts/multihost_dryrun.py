"""2-process CPU dryrun of the multi-host path (VERDICT round-1 missing #6).

Launcher mode (no args): spawns TWO child processes of this script, each a
separate JAX process with 4 virtual CPU devices, wired through a local
coordinator.  Each child joins the runtime, builds the SAME tiny packed
model, lays a global (dp=2 hosts, tp=4 local) mesh, feeds its host-local
half of the batch, and runs two WCT train steps.  The launcher checks both
exit codes; the children check that their losses agree (the dp psum crossed
the process boundary correctly).

    python scripts/multihost_dryrun.py          # launcher
    JAX_PROCESS_ID=0 ... python scripts/multihost_dryrun.py --child
"""

import os
import socket
import subprocess
import sys


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launcher() -> int:
    port = free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH="/root/repo",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--child"],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    ok = True
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        tail = out.decode(errors="replace").strip().splitlines()[-6:]
        print(f"--- process {pid} (exit {p.returncode}) ---")
        print("\n".join(tail))
        ok &= p.returncode == 0
    print("MULTIHOST DRYRUN", "OK" if ok else "FAILED")
    return 0 if ok else 1


def child():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from qeft_tpu.finetune import TrainConfig, make_optimizer, make_train_step, split_wct
    from qeft_tpu.models.llama import LlamaConfig
    from qeft_tpu.models.registry import get_model_meta
    from qeft_tpu.parallel.multihost import (
        all_hosts_agree,
        global_mesh,
        host_local_batch,
        init_distributed,
        process_slice,
    )
    from qeft_tpu.parallel.mesh import param_shardings
    from qeft_tpu.testing import build_packed_model

    assert init_distributed(), "env not set by launcher?"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    mesh = global_mesh(tp=4)  # dp=2 across the two processes
    meta = get_model_meta("llama")
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=64, max_position_embeddings=128,
    )
    # every process builds the identical model (same seed), then shards onto
    # the global mesh — on a real pod this is the checkpoint-restore path
    packed = build_packed_model(cfg, jax.random.PRNGKey(0), g=64, r=16)
    shardings = param_shardings(packed, mesh, meta)
    packed = jax.tree.map(
        lambda a, s: jax.make_array_from_callback(
            a.shape, s, lambda idx: np.asarray(a[idx])
        ),
        packed, shardings,
    )
    oweights, frozen = split_wct(packed, meta)

    tc = TrainConfig(learning_rate=1e-4, total_steps=4, remat=True)
    opt = make_optimizer(tc)
    opt_state = opt.init(oweights)
    step = make_train_step(cfg, opt, remat=True)

    n_global, seqlen = 4, 32
    rng = np.random.default_rng(0)
    ids_global = rng.integers(0, cfg.vocab_size, (n_global, seqlen))
    losses = []
    for i in range(2):
        mine = ids_global[process_slice(n_global)]  # this host's rows only
        ids = host_local_batch(mine, mesh)
        oweights, opt_state, loss = step(oweights, opt_state, frozen, ids, ids)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert all_hosts_agree(losses[-1], tol=1e-6), "loss differs across hosts"

    # --- dp-sharded DECODE: each host feeds only its own requests (the
    # multi-host serving path — batch over dp/DCN, weights tp-sharded so
    # their collectives stay on ICI); each host's greedy tokens must match a
    # locally-computed full-batch reference decode exactly
    from qeft_tpu.models.llama import init_kv_cache, llama_decode_step, llama_prefill
    from qeft_tpu.parallel.mesh import cache_shardings

    def my_rows(a):
        """This process's batch rows of a 2D (dp[, tp])-sharded array:
        assemble addressable shards over BOTH dims (logits come out of the
        GSPMD forward vocab-sharded too), dedup replicas."""
        tiles = {}
        for s in a.addressable_shards:
            r0 = s.index[0].start or 0
            c0 = (s.index[-1].start or 0) if a.ndim > 1 else 0
            tiles.setdefault(r0, {}).setdefault(c0, np.asarray(s.data))
        return np.concatenate(
            [
                np.concatenate([row[c] for c in sorted(row)], axis=-1)
                if a.ndim > 1 else row[0]
                for row in (tiles[r] for r in sorted(tiles))
            ],
            axis=0,
        )

    n_global, ctx, steps = 4, 8, 3
    sl = process_slice(n_global)
    prompts = rng.integers(0, cfg.vocab_size, (n_global, ctx))

    # this leg checks CORRECTNESS of dp feeding + sharded cache/collectives,
    # so it runs in f32: the random tiny model drives |activations| ~ 30
    # where one bf16 ulp is 0.25, and its near-tied logits amplify
    # reduction-order ulp noise ~15x per step (scripts/shard_logit_probe.py)
    # — in f32 the sharding noise floor is ~1e-6 and exact argmax on
    # decisive margins is a sound invariant
    f32 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a, t
    )
    packed = f32(packed)
    cache = f32(init_kv_cache(cfg, n_global, 32))
    c_sh = cache_shardings(mesh, batch=n_global, n_kv_heads=cfg.num_kv_heads)
    cache = jax.tree.map(lambda a, s: jax.device_put(a, s), cache, c_sh)
    toks = host_local_batch(prompts[sl], mesh)

    # full-batch reference trajectory on this process alone (same seed ->
    # same weights); the sharded path is then TEACHER-FORCED with the
    # reference tokens so one near-tie argmax flip (sharding only changes
    # partial-sum ORDER, never the math) can't cascade the comparison
    ref_params = f32(build_packed_model(cfg, jax.random.PRNGKey(0), g=64, r=16))
    ref_cache = f32(init_kv_cache(cfg, n_global, 32))
    rl, ref_cache = llama_prefill(ref_params, jnp.asarray(prompts), ref_cache, cfg)
    ref_logits = [np.asarray(rl[:, -1, :], np.float32)]
    rn = jnp.argmax(rl[:, -1, :], axis=-1)[:, None]
    ref_toks = [rn]
    for i in range(steps):
        rl, ref_cache = llama_decode_step(
            ref_params, rn, ref_cache, jnp.int32(ctx + i), cfg
        )
        rn = jnp.argmax(rl, axis=-1)[:, None]
        ref_logits.append(np.asarray(rl, np.float32))
        ref_toks.append(rn)

    prefill = jax.jit(llama_prefill, static_argnames=("cfg",))
    decode = jax.jit(llama_decode_step, static_argnames=("cfg",))
    logits, cache = prefill(packed, toks, cache, cfg)
    got_logits = [my_rows(logits[:, -1, :]).astype(np.float32)]
    for i in range(steps):
        forced = host_local_batch(np.asarray(ref_toks[i])[sl], mesh)
        lg, cache = decode(packed, forced, cache, jnp.int32(ctx + i), cfg)
        got_logits.append(my_rows(lg).astype(np.float32))

    # f32 noise floor: reduction-order deltas ~1e-6, amplified at most a few
    # orders by the ill-conditioned random model; a layout/dp-feeding bug
    # produces O(1) garbage on every row
    for i, (mine, ref) in enumerate(zip(got_logits, ref_logits)):
        d = np.abs(mine - ref[sl])
        assert d.max() < 1e-3, (
            f"step {i} logits diverged: max={d.max():.3g} mean={d.mean():.3g}"
        )
        margin = np.ptp(np.sort(ref[sl], axis=-1)[:, -2:], axis=-1)
        agree = mine.argmax(-1) == ref[sl].argmax(-1)
        assert np.all(agree | (margin < 1e-2)), (
            f"step {i}: decisive argmax flipped: {mine.argmax(-1)} vs "
            f"{ref[sl].argmax(-1)} (margin {margin})"
        )

    # --- per-host continuous-batching SERVING (the pod serving topology):
    # requests scale out across hosts at the load-balancer level (no
    # cross-host collective in the decode path), each host's Engine rides a
    # TP mesh over its OWN ICI-local devices (serving.Engine mesh path);
    # cross-host totals aggregate over DCN only at reporting time
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh
    from qeft_tpu.parallel.tp_forward import tp_shard_packed_params
    from qeft_tpu.serving import Engine, Request

    from qeft_tpu.serving import MultiHostEngine

    local_mesh = Mesh(
        np.array(jax.local_devices()).reshape(1, len(jax.local_devices())),
        ("dp", "tp"),
    )
    # f32 so the tp-vs-single reduction-order noise stays ~1e-6 and greedy
    # outputs are request-for-request EXACT (the test_serving_tp pattern)
    fused = f32(build_packed_model(cfg, jax.random.PRNGKey(7), g=64, r=16,
                                   fuse_stages=True))
    mh = MultiHostEngine(
        tp_shard_packed_params(fused, local_mesh, cfg), cfg, max_batch=2,
        max_len=32, mesh=local_mesh, burst=2, cache_dtype=jnp.float32,
    )
    # every host sees the SAME global request stream; routing keeps its share
    n_req, n_new = 6, 4
    stream = [
        Request(request_id=i,
                prompt=rng.integers(0, cfg.vocab_size, size=4 + (i % 3)),
                max_new_tokens=n_new)
        for i in range(n_req)
    ]
    mine = [r.request_id for r in stream if mh.submit(r)]
    assert len(mine) == n_req // jax.process_count(), mine
    done = mh.run(max_ticks=64)
    got = {r.request_id: list(r.output) for r in done}

    # single-process reference engine over the FULL stream (same params,
    # no mesh): outputs must match request-for-request (VERDICT r4 #4)
    ref_eng = Engine(fused, cfg, max_batch=2, max_len=32,
                     cache_dtype=jnp.float32)
    for i, r in enumerate(stream):
        ref_eng.submit(Request(request_id=r.request_id,
                               prompt=r.prompt, max_new_tokens=n_new))
    ref = {r.request_id: list(r.output) for r in ref_eng.run(max_ticks=64)}
    for rid in mine:
        assert got[rid] == ref[rid], (
            f"request {rid}: multihost {got[rid]} != single-process {ref[rid]}"
        )

    stats = mh.stats()
    assert stats["requests_total"] == n_req, stats
    assert stats["tokens_total"] == n_req * n_new, stats

    print(
        f"process {jax.process_index()}: devices={len(jax.devices())} "
        f"mesh=(dp=2,tp=4) losses={[round(l, 4) for l in losses]} "
        f"dp-sharded decode == reference OK; multihost engine served "
        f"{stats['tokens_local']} tokens locally "
        f"(cluster {stats['tokens_total']}), outputs == single-process "
        f"engine request-for-request"
    )


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        sys.exit(launcher())
