"""CLI: quantize / evaluate / benchmark — the main driver.

Mirrors the reference entry point (/root/reference/qeft/main.py:373-581):

    # reconstruction + global reorder + packing
    python -m qeft_tpu.main <model> <dataset> --wbits 4 --groupsize 128 \
        --tuning mse --reorder --outidx_file outidx/w4_r128/outidx.npy \
        --packing --save ckpt/model --eval

    # load a packed checkpoint and benchmark decode
    python -m qeft_tpu.main <model> <dataset> --load ckpt/model --benchmark 128
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from qeft_tpu.extract_outidx import (
    add_common_quant_args,
    build_quantize_args,
    load_model_and_meta,
)


def main():
    parser = argparse.ArgumentParser()
    add_common_quant_args(parser)
    parser.add_argument("--reorder", action="store_true")
    parser.add_argument("--outidx_file", type=str, default=None)
    parser.add_argument("--save", type=str, default="")
    parser.add_argument("--load", type=str, default="")
    parser.add_argument("--fake", action="store_true")
    parser.add_argument("--packing", action="store_true")
    parser.add_argument("--fuse_stages", action="store_true",
                        help="pack q/k/v->qkv and up/gate->upgate as single "
                             "linears (fewer, larger kernels; needs --reorder)")
    parser.add_argument("--eval", action="store_true", help="PPL eval after quantize/load")
    parser.add_argument("--eval_datasets", type=str, default="",
                        help="comma list for the post-quantization PPL sweep "
                             "(reference main.py:556-568 runs wikitext2/ptb/c4); "
                             "default: the calibration dataset only")
    parser.add_argument("--eval_windows", type=int, default=0)
    parser.add_argument("--benchmark", type=int, default=0)
    parser.add_argument("--logfile", type=str, default="")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp  # noqa: F401 (used by --benchmark block)

    from qeft_tpu.models.registry import get_model_meta

    results = {}

    if args.load:
        import contextlib

        from qeft_tpu.checkpoint import load_model as load_ckpt

        # host-stage load + fusion, then transfer ONCE: loading and fusing
        # on-device holds original + fused copies transiently (~2x the
        # packed bytes), which OOMs the 16 GB chip at 13B (r5e O2)
        stage = (
            jax.default_device(jax.devices("cpu")[0])
            if jax.default_backend() == "tpu" else contextlib.nullcontext()
        )
        with stage:
            # family rides the checkpoint manifest — OPT ckpts load as OPT
            params, cfg, family = load_ckpt(args.load)
            meta = get_model_meta(family)
            quantizers = None
            if any(hasattr(l, "qweight") for l in params["layers"].values()):
                # packed checkpoint: serve through the fused fast path
                # exactly like bench.py's production load (same math; fewer,
                # larger kernel calls — unfused reload ran ~6% slower)
                from qeft_tpu.pipeline import fuse_packed_stages

                params = fuse_packed_stages(params, meta)
        tree_bytes = sum(
            l.size * l.dtype.itemsize for l in jax.tree.leaves(params)
        )
        if jax.default_backend() == "tpu" and tree_bytes < 10e9:
            # fits HBM whole: one transfer, direct eval/benchmark; larger
            # trees stay host-side for the layer-streamed eval
            params = jax.device_put(params, jax.devices()[0])
        import os as _os

        if _os.environ.get("QEFT_QUANT_LMHEAD", "0") not in ("0", "", "false") \
                and not hasattr(params.get("lm_head"), "qweight"):
            # ablation knob (same as bench.py): RTN int4/g128 lm_head cuts
            # ~6% of decode bytes/token; --benchmark's streaming PPL is its
            # quality oracle
            from qeft_tpu.pipeline import rtn_pack_linear

            params["lm_head"] = rtn_pack_linear(
                params["lm_head"].astype(jnp.float32)
            )
    else:
        from qeft_tpu.extract_outidx import resolve_dtype

        params, cfg, meta = load_model_and_meta(args.model, dtype=resolve_dtype(args.dtype))
        quantizers = None
        if args.wbits < 16:
            from qeft_tpu.data import get_calibration_tokens
            from qeft_tpu.pipeline import quantize_model

            if args.reorder:
                if args.outidx_file is None:
                    raise ValueError(
                        "Need --outidx_file for global reordering. "
                        "Run python -m qeft_tpu.extract_outidx first."
                    )
                outidx = np.load(args.outidx_file)
            else:
                outidx = None

            seqlen = args.seqlen or min(cfg.max_position_embeddings, 2048)
            calib = get_calibration_tokens(
                args.dataset, args.nsamples, args.seed, seqlen,
                model=args.model, vocab_size=cfg.vocab_size,
            )
            qargs = build_quantize_args(args)
            qargs.reorder = args.reorder
            if meta.family == "falcon":
                # reference forces percdamp=1.0 for falcon (utils/misc.py:132-136)
                qargs.percdamp = 1.0
            tick = time.time()
            params, quantizers = quantize_model(params, calib, cfg, meta, qargs, outidx)
            results["quantize_time_s"] = round(time.time() - tick, 1)
            print(f"Reconstruction done in {results['quantize_time_s']}s")

    packed = None
    if args.save:
        from qeft_tpu.checkpoint import save_fake, save_packed

        if not (args.fake or args.packing):
            raise ValueError("--save requires --fake and/or --packing")
        if args.fake:
            save_fake(args.save + "_fake", params, quantizers, cfg, family=meta.family)
            print(f"fake ckpt -> {args.save}_fake.npz")
        if args.packing:
            from qeft_tpu.pipeline import pack_model

            packed = pack_model(
                params, quantizers, cfg, meta, fuse_stages=args.fuse_stages
            )
            save_packed(args.save + "_packed", packed, cfg, family=meta.family)
            print(f"packed ckpt -> {args.save}_packed.npz")

    from qeft_tpu.models.api import get_model_api

    api = get_model_api(meta.family)

    if args.eval:
        import jax

        from qeft_tpu.data import get_loaders
        from qeft_tpu.eval import eval_ppl, eval_ppl_streamed

        def tree_gb(tree):
            return sum(
                l.size * l.dtype.itemsize for l in jax.tree.leaves(tree)
            ) / 1e9

        # models too big to sit whole in HBM next to the eval compute stream
        # one block at a time (the reference's eval is layer-streamed too,
        # main.py:195-308); packed models are ~4x smaller and eval jitted
        def on_host(tree):
            leaf = jax.tree.leaves(tree)[0]
            if not hasattr(leaf, "devices"):
                return True  # numpy
            return all(d.platform == "cpu" for d in leaf.devices())

        # stream only HOST-resident big trees; a device-resident tree (the
        # --load path transfers anything <10 GB whole) evals directly
        stream_eval = (
            jax.default_backend() == "tpu"
            and meta.family in ("llama", "gemma")
            and tree_gb(params) > 6.0
            and on_host(params)
        )

        if packed is not None and jax.default_backend() == "tpu":
            packed = jax.device_put(packed)  # one transfer, not one per window

        eval_sets = (
            [s.strip() for s in args.eval_datasets.split(",") if s.strip()]
            or [args.dataset]
        )
        for ds in eval_sets:
            test = get_loaders(ds, train=False, model=args.model, vocab_size=cfg.vocab_size)
            # reference protocol: the eval window is the FULL context length
            # (main.py:516-521 sets model.seqlen = max_position_embeddings)
            seqlen = args.seqlen or cfg.max_position_embeddings
            if stream_eval:
                ppl = eval_ppl_streamed(
                    params, test, cfg, meta, seqlen=seqlen,
                    max_windows=args.eval_windows,
                )
            else:
                ppl = eval_ppl(
                    params, test, cfg, seqlen=seqlen, max_windows=args.eval_windows,
                    api=api,
                )
            results[f"ppl_{ds}"] = round(ppl, 4)
            print(f"{ds} ppl: {ppl:.4f}")
            if packed is not None:
                # the reference's correctness oracle (README.md:55-59):
                # packed-path PPL must match the fake-quant reconstruction
                ppl_packed = eval_ppl(
                    packed, test, cfg, seqlen=seqlen, max_windows=args.eval_windows,
                    api=api,
                )
                results[f"ppl_{ds}_packed"] = round(ppl_packed, 4)
                delta = abs(ppl_packed - ppl) / max(ppl, 1e-9)
                print(f"{ds} ppl (packed): {ppl_packed:.4f}  (fake-vs-packed delta {delta:.2%})")

    if args.benchmark:
        import jax

        from qeft_tpu.data import get_loaders
        from qeft_tpu.generate import SampleConfig, generate

        n = args.benchmark

        # (a) throughput: the whole prefill+decode loop in one jit — the
        # TPU-native number (host<->device round trip once per sequence).
        ctx = 64
        prompt = jnp.asarray(
            np.random.default_rng(args.seed).integers(0, cfg.vocab_size, (1, ctx))
        )
        cache = api.init_cache(cfg, 1, ctx + n, dtype=jnp.bfloat16)
        tokens, _ = generate(params, prompt, cache, cfg, n, SampleConfig(), api=api)
        np.asarray(tokens)  # compile + run
        tick = time.time()
        tokens, _ = generate(params, prompt, cache, cfg, n, SampleConfig(), api=api)
        np.asarray(tokens)
        dt = time.time() - tick
        results["decode_tokens_per_s"] = round(n / dt, 2)
        results["ms_per_token"] = round(dt / n * 1e3, 2)
        print(f"decode: {results['decode_tokens_per_s']} tokens/s "
              f"({results['ms_per_token']} ms/token)")

        # (b) the reference's per-token protocol (main.py:310-371): feed real
        # data tokens one at a time through the decode path, time each step
        # with a device sync, accumulate next-token NLL outside the timed
        # region; report median/min latency, streaming PPL (a broken kernel
        # shows up as PPL divergence, not just timing), and peak memory
        # (benchmark.py:337).
        data = get_loaders(
            args.dataset, nsamples=1, seed=args.seed, seqlen=n,
            model=args.model, train=True, vocab_size=cfg.vocab_size,
        )
        input_ids = jnp.asarray(np.asarray(data)[:1, :n])
        step = jax.jit(api.decode_step, static_argnames=("cfg",))
        nll = jax.jit(
            lambda lg, t: -jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)[0, t]
        )
        cache = api.init_cache(cfg, 1, n, dtype=jnp.bfloat16)
        logits, _ = step(params, input_ids[:, :1], cache, jnp.int32(0), cfg)
        jax.block_until_ready(nll(logits, input_ids[0, 1]))  # compile both
        times = []
        tot = 0.0
        for i in range(n):
            tick = time.perf_counter()
            logits, cache = step(params, input_ids[:, i:i + 1], cache,
                                 jnp.int32(i), cfg)
            # one-element data pull: the reference's per-token
            # torch.cuda.synchronize equivalent — on the relayed chip
            # block_until_ready is not a reliable completion barrier
            np.asarray(logits[0, :1])
            times.append(time.perf_counter() - tick)
            if i != n - 1:
                tot += float(nll(logits, input_ids[0, i + 1]))
        results["median_token_latency_ms"] = round(float(np.median(times)) * 1e3, 3)
        results["min_token_latency_ms"] = round(float(np.min(times)) * 1e3, 3)
        results["streaming_ppl"] = round(float(np.exp(tot / (n - 1))), 4)
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            if "peak_bytes_in_use" in stats:
                results["peak_memory_gb"] = round(stats["peak_bytes_in_use"] / 1e9, 3)
        except Exception:
            pass
        print(f"per-token: median {results['median_token_latency_ms']} ms, "
              f"min {results['min_token_latency_ms']} ms, "
              f"streaming ppl {results['streaming_ppl']}"
              + (f", peak mem {results['peak_memory_gb']} GB"
                 if "peak_memory_gb" in results else ""))

    if args.logfile:
        with open(args.logfile, "a") as f:
            f.write(json.dumps({"model": args.model, **vars(args), **results},
                               default=str) + "\n")


if __name__ == "__main__":
    main()
