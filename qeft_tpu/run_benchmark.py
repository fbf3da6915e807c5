"""CLI: cross-method end-to-end generation benchmark.

Mirrors the reference benchmark driver (/root/reference/qeft/benchmark.py):
fixed workload context=64, 256 greedy decode steps, batch 1
(benchmark.py:117-120), per-token wall-clock, median tokens/s + ms/token +
peak memory (benchmark.py:289-338).

Methods (the reference's CUDA-specific methods map to our execution paths):
  fp      — bf16 dense weights                     (reference 'fp')
  qeft    — packed INT4+outliers, Pallas kernels   (reference 'qeft')
  qeft-x  — packed INT4+outliers, XLA dequant path (ablation)
  spec    — qeft target + draft model speculative decoding

    python -m qeft_tpu.run_benchmark --method qeft --model llama2-7b
    python -m qeft_tpu.run_benchmark --method qeft --load ckpt_packed
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--method", type=str, default="qeft",
                        choices=["fp", "qeft", "qeft-x", "spec", "spec-batch",
                                 "engine"])
    parser.add_argument("--model", type=str, default="llama2-7b")
    parser.add_argument("--draft_model", type=str, default="tiny-v2")
    parser.add_argument("--draft_layers", type=int, default=0,
                        help="SELF-speculative draft: slice this many evenly-"
                             "strided layers out of the target itself (shares "
                             "all weights; overrides --draft_model)")
    parser.add_argument("--load", type=str, default="")
    parser.add_argument("--context", type=int, default=64)
    parser.add_argument("--gen", type=int, default=256)
    parser.add_argument("--gamma", type=int, default=4)
    parser.add_argument("--batch", type=int, default=4,
                        help="sequences for --method spec-batch; engine slots "
                             "for --method engine")
    parser.add_argument("--requests", type=int, default=0,
                        help="engine: total requests to serve (default 2x batch)")
    parser.add_argument("--burst", type=int, default=16,
                        help="engine: decode ticks per host sync")
    parser.add_argument("--sample", action="store_true",
                        help="sampling instead of greedy (spec: speculative "
                             "sampling with exact target distribution)")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--top_k", type=int, default=0)
    parser.add_argument("--top_p", type=float, default=1.0)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--fuse_stages", action="store_true", default=True)
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel ways: weights shard over a 'tp' "
                             "mesh axis and every device program becomes the "
                             "explicit shard_map path (methods qeft/engine)")
    parser.add_argument("--logfile", type=str, default="")
    args = parser.parse_args(argv)

    if args.tp > 1 and args.method not in ("qeft", "engine"):
        parser.error("--tp applies to --method qeft or engine")

    if args.method == "qeft-x":
        os.environ["QEFT_PALLAS"] = "0"

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        # TPU only: Mosaic compiles are minutes-long and worth persisting.
        # NOT on CPU — jax.config is process-global, and the test suite calls
        # this main() (test_cli_flags), after which serializing later huge
        # interpret-mode-pallas executables for the cache segfaulted jaxlib
        # (observed repeatedly at test_tp_train's sharded-train compile).
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from qeft_tpu.generate import SampleConfig, generate
    from qeft_tpu.models.llama import LLAMA_PRESETS, init_kv_cache, init_params
    from qeft_tpu.testing import build_packed_model

    from qeft_tpu.models.api import get_model_api

    cfg = LLAMA_PRESETS[args.model]
    key = jax.random.PRNGKey(args.seed)
    api = get_model_api("llama")

    if args.load:
        from qeft_tpu.checkpoint import load_model

        params, cfg, family = load_model(args.load)
        api = get_model_api(family)
        assert family in ("llama", "gemma") or args.method not in (
            "spec", "spec-batch", "engine"
        ), (
            "speculative and engine methods ride the llama-family ragged "
            "window forward; plain methods dispatch to any family"
        )
    elif args.method == "fp":
        # host-staged init: device-side random init materializes fp32
        # intermediates (~2x the bf16 tree) and OOMs the 16 GB chip at 7B
        # (r5d M4); build on host, transfer the bf16 tree once below
        with jax.default_device(jax.devices("cpu")[0]):
            params = init_params(cfg, key, dtype=jnp.bfloat16)
    else:
        params = build_packed_model(cfg, key, fuse_stages=args.fuse_stages)
    mesh = None
    if args.tp > 1:
        from qeft_tpu.parallel import make_mesh
        from qeft_tpu.parallel.tp_forward import tp_shard_packed_params

        assert len(jax.devices()) >= args.tp, (
            f"--tp {args.tp} needs {args.tp} devices, have {jax.devices()}"
        )
        mesh = make_mesh((1, args.tp), axis_names=("dp", "tp"),
                         devices=jax.devices()[: args.tp])
        params = tp_shard_packed_params(params, mesh, cfg)
    else:
        # explicit target: host-staged (CPU-committed) trees are NOT moved
        # by device_put(None)
        params = jax.device_put(params, jax.devices()[0])

    if args.method == "engine":
        # continuous-batching serving throughput: `requests` prompts of
        # `context` tokens, `gen` new tokens each, over `batch` slots with
        # `burst` decode ticks per host sync.  The measurement itself is the
        # shared serving.measure_engine_throughput definition (bench.py's
        # serving rider reports the same quantity).
        from qeft_tpu.serving import measure_engine_throughput

        n_req = args.requests or 2 * args.batch
        tps = measure_engine_throughput(
            params, cfg, slots=args.batch, burst=args.burst,
            requests=n_req, ctx=args.context, gen=args.gen, reps=args.reps,
            mesh=mesh, sample_config=SampleConfig(greedy=not args.sample),
            seed=args.seed,
        )
        result = {
            "method": "engine", "model": args.load or args.model,
            "requests": n_req, "slots": args.batch, "burst": args.burst,
            "context": args.context, "gen": args.gen,
            "served_tokens_per_s": round(tps, 2),
        }
        if args.tp > 1:
            result["tp"] = args.tp
        print(json.dumps(result))
        if args.logfile:
            with open(args.logfile, "a") as f:
                f.write(json.dumps(result) + "\n")
        return

    bsz = args.batch if args.method == "spec-batch" else 1
    prompt = jax.random.randint(key, (bsz, args.context), 0, cfg.vocab_size, jnp.int32)
    # speculative rounds write up to gamma+1 positions past the accepted
    # point; 8-aligned so flash/Pallas kernels never see an unaligned S dim
    max_len = args.context + args.gen + (
        args.gamma + 1 if args.method in ("spec", "spec-batch") else 0
    )
    max_len = -(-max_len // 8) * 8
    cache = api.init_cache(cfg, bsz, max_len, dtype=jnp.bfloat16)

    sc = SampleConfig(
        greedy=not args.sample, temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p,
    )
    if args.method in ("spec", "spec-batch"):
        from qeft_tpu.speculative import (
            speculative_generate,
            speculative_generate_batched,
            speculative_generate_sampled,
        )

        if args.draft_layers:
            from qeft_tpu.speculative import layer_sliced_draft

            draft, dcfg = layer_sliced_draft(params, cfg, args.draft_layers)
        else:
            dcfg = LLAMA_PRESETS[args.draft_model]
            draft = init_params(dcfg, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
        d_cache = init_kv_cache(dcfg, bsz, max_len, dtype=jnp.bfloat16)

        def run():
            if args.method == "spec-batch":
                out, telem = speculative_generate_batched(
                    params, draft, prompt, cache, d_cache, cfg, dcfg,
                    args.gen, jax.random.PRNGKey(args.seed),
                    gamma=args.gamma, sc=sc, greedy=not args.sample,
                )
                np.asarray(out)
                return telem
            if args.sample:
                out, telem = speculative_generate_sampled(
                    params, draft, prompt, cache, d_cache, cfg, dcfg,
                    args.gen, jax.random.PRNGKey(args.seed),
                    gamma=args.gamma, sc=sc,
                )
            else:
                out, telem = speculative_generate(
                    params, draft, prompt, cache, d_cache, cfg, dcfg,
                    args.gen, args.gamma,
                )
            np.asarray(out)
            return telem
    elif mesh is not None:
        # TP-sharded greedy generate: one shard_map prefill program + the
        # whole decode loop in one program (parallel/tp_forward.py)
        from qeft_tpu.parallel.tp_forward import _tp_specs, tp_generate
        from jax.sharding import NamedSharding

        assert not args.sample, "--tp qeft benchmark is greedy-only"
        _, cache_specs = _tp_specs(params, cache)
        cache = {
            name: jax.device_put(leaf, NamedSharding(mesh, cache_specs[name]))
            for name, leaf in cache.items()
        }

        def run():
            out, _ = tp_generate(params, prompt, cache, cfg, mesh, args.gen)
            np.asarray(out)
            return None
    else:
        def run():
            out, _ = generate(params, prompt, cache, cfg, args.gen, sc, api=api)
            np.asarray(out)
            return None

    telem = run()  # compile + warmup
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        telem = run()
        best = min(best, time.perf_counter() - t0)

    result = {
        "method": args.method,
        "model": args.load or args.model,
        "tokens_per_s": round(args.gen / best, 2),
        "ms_per_token": round(best / args.gen * 1e3, 3),
        "context": args.context,
        "gen": args.gen,
    }
    if args.tp > 1:
        result["tp"] = args.tp
    if args.method == "spec-batch":
        result["batch"] = bsz
        result["seq_tokens_per_s"] = round(bsz * args.gen / best, 2)
    if telem is not None:
        result["mean_accept_length"] = round(float(telem["mean_accept_length"]), 3)
        result["rounds"] = int(telem["rounds"])
        result["draft"] = (
            f"self:{args.draft_layers}-layers" if args.draft_layers
            else args.draft_model
        )
    print(json.dumps(result))
    if args.logfile:
        with open(args.logfile, "a") as f:
            f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
