"""CLI: WCT fine-tuning driver.

Mirrors the reference finetune entry point (/root/reference/qeft/finetune.py:761-1124):

    python -m qeft_tpu.run_finetune --load ckpt/model_packed \
        --dataset platypus --tokenizer <hf-dir> --output_dir runs/wct \
        --max_steps 1000 --batch_size 4 --grad_accum 4

Loads a packed checkpoint, trains ONLY the fp outlier slabs, saves
oweight-only WCT checkpoints (with resume), logs metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _save_opt_state(path: str, opt_state):
    """Optimizer-state sidecar: flattened leaves (bf16 via uint16 view).
    Resume restores Adam moments, MultiSteps accumulation, and the LR
    schedule position (optax counts live in the state)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    leaves = jax.tree_util.tree_leaves(opt_state)
    flat = {}
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        if a.dtype == jnp.bfloat16:
            flat[f"l{i}@bf16"] = a.view(np.uint16)
        else:
            flat[f"l{i}"] = a
    np.savez(path, **flat)


def _load_opt_state(path: str, template):
    import jax
    import jax.numpy as jnp
    import numpy as np

    treedef = jax.tree_util.tree_structure(template)
    n = len(jax.tree_util.tree_leaves(template))
    with np.load(path) as z:
        leaves = []
        for i in range(n):
            if f"l{i}@bf16" in z.files:
                leaves.append(jnp.asarray(z[f"l{i}@bf16"].view(jnp.bfloat16)))
            else:
                leaves.append(jnp.asarray(z[f"l{i}"]))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def get_last_checkpoint(output_dir: str):
    """Resume scan (reference finetune.py:747-759)."""
    if not os.path.isdir(output_dir):
        return None, 0
    if os.path.exists(os.path.join(output_dir, "completed")):
        print("training already finished (completed sentinel found)")
        return "completed", 0
    steps = []
    for name in os.listdir(output_dir):
        if name.startswith("wct_step") and name.endswith(".npz"):
            steps.append(int(name[len("wct_step") : -len(".npz")]))
    if not steps:
        return None, 0
    last = max(steps)
    return os.path.join(output_dir, f"wct_step{last}.npz"), last


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--load", type=str, required=True, help="packed ckpt path")
    parser.add_argument("--dataset", type=str, default="synthetic",
                        choices=["synthetic", "platypus", "alpaca", "oasst1",
                                 "wikitext", "wikitext2"])
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--max_steps", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--grad_accum", type=int, default=1)
    parser.add_argument("--learning_rate", type=float, default=2e-4)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--warmup_ratio", type=float, default=0.03)
    parser.add_argument("--lr_schedule", type=str, default="cosine",
                        choices=["cosine", "constant"])
    parser.add_argument("--max_grad_norm", type=float, default=0.3)
    parser.add_argument("--source_max_len", type=int, default=512)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--save_steps", type=int, default=50)
    parser.add_argument("--log_steps", type=int, default=10)
    parser.add_argument("--nsamples", type=int, default=None)
    parser.add_argument("--no_remat", action="store_true")
    parser.add_argument("--epochs", type=int, default=100)
    # held-out validation loss (reference finetune runs HF Trainer's do_eval)
    parser.add_argument("--eval_steps", type=int, default=0,
                        help="eval validation loss every N steps (0 = off)")
    parser.add_argument("--eval_nsamples", type=int, default=32,
                        help="examples held out of training for validation")
    # MMLU eval callback during training (reference finetune.py:970-1034 runs
    # a periodic MMLU accuracy eval on the training model)
    parser.add_argument("--do_mmlu_eval", action="store_true")
    parser.add_argument("--mmlu_eval_steps", type=int, default=0,
                        help="eval every N steps (default: save_steps)")
    parser.add_argument("--mmlu_source", type=str, default="synthetic",
                        help="'synthetic' (hermetic) or a HF tokenizer dir "
                             "for cais/mmlu")
    parser.add_argument("--mmlu_n", type=int, default=64)
    parser.add_argument("--mmlu_split", type=str, default="validation")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from qeft_tpu.checkpoint import load_packed, save_wct, load_wct
    from qeft_tpu.data.sft import batches, load_sft_examples
    from qeft_tpu.finetune import (
        TrainConfig, make_optimizer, make_train_step, split_wct,
    )
    from qeft_tpu.models.registry import get_model_meta

    os.makedirs(args.output_dir, exist_ok=True)
    resume_path, start_step = get_last_checkpoint(args.output_dir)
    if resume_path == "completed":
        return

    params, cfg, family = load_packed(args.load)
    meta = get_model_meta(family)
    oweights, frozen = split_wct(params, meta)

    if resume_path:
        print(f"resuming from {resume_path} (step {start_step})")
        resumed, _, _ = load_wct(resume_path)
        ro, _ = split_wct(resumed, meta)
        oweights = ro

    tc = TrainConfig(
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        warmup_ratio=args.warmup_ratio,
        total_steps=args.max_steps,
        grad_accum=args.grad_accum,
        max_grad_norm=args.max_grad_norm,
        lr_schedule=args.lr_schedule,
        remat=not args.no_remat,
    )
    opt = make_optimizer(tc)
    opt_state = opt.init(oweights)
    if resume_path:
        opt_path = os.path.join(args.output_dir, f"opt_step{start_step}.npz")
        if os.path.exists(opt_path):
            opt_state = _load_opt_state(opt_path, opt_state)
            print(f"restored optimizer state (schedule at step {start_step})")
        else:
            print("WARNING: no optimizer-state sidecar; Adam moments and the "
                  "LR schedule restart from zero")
    step_fn = make_train_step(cfg, opt, remat=tc.remat, family=family)

    examples = load_sft_examples(
        args.dataset, args.tokenizer, args.nsamples, cfg.vocab_size, args.seed
    )
    eval_examples = []
    if args.eval_steps > 0:
        if args.eval_nsamples <= 0:
            raise ValueError("--eval_nsamples must be positive with --eval_steps")
        if len(examples) <= args.eval_nsamples:
            raise ValueError(
                f"--eval_nsamples {args.eval_nsamples} >= dataset size "
                f"{len(examples)}; nothing left to train on"
            )
        eval_examples = examples[-args.eval_nsamples:]
        examples = examples[: -args.eval_nsamples]
    data = batches(
        examples, args.batch_size, args.source_max_len, args.seed,
        epochs=args.epochs,
    )

    def run_eval(step, ow):
        """Held-out validation loss on the current training model."""
        from qeft_tpu.data.sft import mask_and_pad
        from qeft_tpu.finetune import wct_loss  # already jitted

        loss_fn = wct_loss
        total, n_seen = 0.0, 0
        for i in range(0, len(eval_examples), args.batch_size):
            chunk = eval_examples[i : i + args.batch_size]  # remainder included
            ids, labels = mask_and_pad(chunk, args.source_max_len, 0, False)
            total += float(loss_fn(ow, frozen, jnp.asarray(ids),
                                   jnp.asarray(labels), cfg=cfg, remat=False,
                                   family=family)) * len(chunk)
            n_seen += len(chunk)
        eval_loss = total / n_seen
        print(f"step {step}  eval-loss {eval_loss:.4f} (n={n_seen})")
        return {"step": step, "eval_loss": eval_loss}

    mmlu_examples = None
    if args.do_mmlu_eval:
        from qeft_tpu.eval_mc import load_mmlu_examples, synthetic_mc_examples

        if args.mmlu_source == "synthetic":
            mmlu_examples = synthetic_mc_examples(args.mmlu_n, cfg.vocab_size, args.seed)
        else:
            mmlu_examples = load_mmlu_examples(
                args.mmlu_source, split=args.mmlu_split, n=args.mmlu_n
            )

    def run_mmlu(step, ow):
        """Periodic MC-accuracy eval on the CURRENT training model (merged
        oweights), reference finetune.py:970-1034."""
        from qeft_tpu.eval_mc import evaluate_mc
        from qeft_tpu.finetune import merge_wct

        res = evaluate_mc(merge_wct(ow, frozen), mmlu_examples, cfg, family)
        print(f"step {step}  mmlu-eval accuracy {res['accuracy']:.4f} (n={res['n']})")
        return {"step": step, "mmlu_accuracy": res["accuracy"], "mmlu_n": res["n"]}

    mmlu_every = args.mmlu_eval_steps or args.save_steps
    metrics = []
    if start_step:
        mpath = os.path.join(args.output_dir, "metrics.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                metrics = json.load(f)
        for _ in range(start_step):  # data position follows the step counter
            next(data, None)
    t0 = time.time()
    step = start_step
    for batch in data:
        if step >= args.max_steps:
            break
        ids = jnp.asarray(batch["input_ids"])
        labels = jnp.asarray(batch["labels"])
        oweights, opt_state, loss = step_fn(oweights, opt_state, frozen, ids, labels)
        step += 1
        if step % args.log_steps == 0 or step == 1:
            loss_f = float(loss)
            rate = step / max(time.time() - t0, 1e-9)
            print(f"step {step}/{args.max_steps}  loss {loss_f:.4f}  ({rate:.2f} it/s)")
            metrics.append({"step": step, "loss": loss_f})
        if step % args.save_steps == 0:
            save_wct(
                os.path.join(args.output_dir, f"wct_step{step}"), oweights, args.load
            )
            _save_opt_state(
                os.path.join(args.output_dir, f"opt_step{step}.npz"), opt_state
            )
            with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
                json.dump(metrics, f, indent=1)  # crash-durable
        if mmlu_examples is not None and step % mmlu_every == 0:
            metrics.append(run_mmlu(step, oweights))
        if args.eval_steps > 0 and step % args.eval_steps == 0:
            metrics.append(run_eval(step, oweights))

    if mmlu_examples is not None:
        metrics.append(run_mmlu(step, oweights))
    if args.eval_steps > 0 and step % args.eval_steps != 0:
        metrics.append(run_eval(step, oweights))
    save_wct(os.path.join(args.output_dir, "wct_final"), oweights, args.load)
    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    with open(os.path.join(args.output_dir, "completed"), "w") as f:
        f.write("done\n")
    print(f"WCT checkpoint -> {args.output_dir}/wct_final.npz")


if __name__ == "__main__":
    main()
