"""CLI: OGR step 1 — extract the global outlier channel index set.

Mirrors the reference entry point (/root/reference/qeft/extract_outidx.py:182-331):

    python -m qeft_tpu.extract_outidx <model> <dataset> --wbits 4 \
        --target_rank 128 --no_frob_norm --output_dir outidx/

``<model>`` is a local HF checkpoint dir, a preset name (llama2-7b, tiny, ...)
for random-init runs, or a fake-checkpoint path.  ``<dataset>`` is
wikitext2/ptb/c4/platypus/synthetic or a .npy token file.  Output:
``<output_dir>/w{bits}_r{rank}/outidx.npy`` + per-layer out_ids.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def add_common_quant_args(parser: argparse.ArgumentParser):
    parser.add_argument("model", type=str, help="HF ckpt dir or preset name")
    parser.add_argument("dataset", type=str, help="wikitext2|ptb|c4|platypus|synthetic|*.npy")
    parser.add_argument("--nsamples", type=int, default=128)
    parser.add_argument("--wbits", type=int, default=4, choices=[2, 3, 4, 16])
    parser.add_argument("--target_bit", type=float, default=None)
    parser.add_argument("--target_rank", type=int, default=None)
    parser.add_argument("--tuning", type=str, default="mse", choices=["mse", "minmax"])
    parser.add_argument("--no_frob_norm", action="store_true")
    parser.add_argument("--percdamp", type=float, default=0.01)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--sym", action="store_true")
    parser.add_argument("--groupsize", type=int, default=-1)
    parser.add_argument("--seqlen", type=int, default=None)
    parser.add_argument("--act-order", dest="act_order", action="store_true")
    parser.add_argument("--true-sequential", dest="true_sequential", action="store_true")
    parser.add_argument("--nearest_owq", action="store_true")
    parser.add_argument("--nearest", action="store_true",
                        help="plain RTN, no OWQ outliers (reference main.py:267-273)")
    parser.add_argument("--perhead", type=int, default=None)
    parser.add_argument("--layers", type=str, nargs="*", default=None,
                        help="restrict OWQ outliers to these linears (others "
                             "quantize with 0 outliers; reference misc.py:160-177)")
    parser.add_argument("--dtype", type=str, default="auto",
                        choices=["auto", "float32", "bfloat16", "float16"])
    parser.add_argument("--trust_remote_code", action="store_true",
                        help="accepted for reference-CLI compatibility; our "
                             "loader reads safetensors directly and never "
                             "executes model code, so this is a no-op")


def resolve_dtype(name):
    """Reference `interpret_dtype` (utils/misc.py:39-56)."""
    import jax.numpy as jnp

    if name is None or name == "auto":
        return None
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "float16": jnp.float16}[name]


def load_model_and_meta(model: str, dtype=None):
    """Preset name -> random init; dir with config.json -> HF safetensors."""
    import jax
    import jax.numpy as jnp

    from qeft_tpu.models import bloom as bloom_mod
    from qeft_tpu.models import falcon as falcon_mod
    from qeft_tpu.models import opt as opt_mod
    from qeft_tpu.models import phi as phi_mod
    from qeft_tpu.models.llama import LLAMA_PRESETS, init_params
    from qeft_tpu.models.registry import get_model_meta

    preset_tables = (
        ("llama", LLAMA_PRESETS, init_params),
        ("opt", opt_mod.OPT_PRESETS, opt_mod.init_params),
        ("phi", phi_mod.PHI_PRESETS, phi_mod.init_params),
        ("bloom", bloom_mod.BLOOM_PRESETS, bloom_mod.init_params),
        ("falcon", falcon_mod.FALCON_PRESETS, falcon_mod.init_params),
    )
    # materialize the full model HOST-side: the quantization pipeline streams
    # one block at a time to the device (_block_at); initializing on the TPU
    # would park the whole model (13.5 GB at 7B bf16) in HBM and leave no
    # headroom for the calibration compute
    host = jax.devices("cpu")[0]
    for fam, table, init in preset_tables:
        if model in table:
            cfg = table[model]
            with jax.default_device(host):
                # rbg keys: threefry on host CPU takes minutes at 7B scale
                params = init(cfg, jax.random.key(0, impl="rbg"),
                              dtype=dtype or jnp.float32)
            meta = get_model_meta("gemma" if "gemma" in model else fam)
            return params, cfg, meta
    if os.path.isdir(model):
        from qeft_tpu.models.hf_loader import load_hf_model

        with jax.default_device(host):
            params, cfg, family = load_hf_model(model, dtype=dtype or jnp.bfloat16)
        return params, cfg, get_model_meta(family)
    raise ValueError(f"unknown model {model}")


def build_quantize_args(args):
    from qeft_tpu.pipeline import QuantizeArgs
    from qeft_tpu.quant.quantizer import QuantSpec

    nearest = getattr(args, "nearest", False)
    return QuantizeArgs(
        spec=QuantSpec(
            bits=args.wbits,
            sym=args.sym,
            mse=(args.tuning == "mse"),
            group_size=args.groupsize,
        ),
        # plain --nearest: RTN with no outlier columns at all
        target_rank=None if nearest else args.target_rank,
        target_bit=None if nearest else args.target_bit,
        percdamp=args.percdamp,
        act_order=args.act_order,
        no_frob_norm=args.no_frob_norm,
        rtn=nearest or getattr(args, "nearest_owq", False),
        true_sequential=getattr(args, "true_sequential", False),
        nsamples=args.nsamples,
        perhead=args.perhead,
        owq_layers=(
            tuple(args.layers) if getattr(args, "layers", None) else None
        ),
    )


def main():
    parser = argparse.ArgumentParser()
    add_common_quant_args(parser)
    parser.add_argument("--output_dir", type=str, default="outidx")
    args = parser.parse_args()

    from qeft_tpu.data import get_calibration_tokens
    from qeft_tpu.pipeline import extract_global_outidx

    params, cfg, meta = load_model_and_meta(args.model, dtype=resolve_dtype(args.dtype))
    seqlen = args.seqlen or min(cfg.max_position_embeddings, 2048)
    calib = get_calibration_tokens(
        args.dataset, args.nsamples, args.seed, seqlen,
        model=args.model, vocab_size=cfg.vocab_size,
    )

    qargs = build_quantize_args(args)
    tick = time.time()
    outidx, per_layer = extract_global_outidx(params, calib, cfg, meta, qargs)
    rank = qargs.target_rank if qargs.perhead is None else qargs.perhead * cfg.num_heads

    dirname = os.path.join(args.output_dir, f"w{args.wbits}_r{rank}")
    os.makedirs(dirname, exist_ok=True)
    np.save(os.path.join(dirname, "outidx.npy"), outidx)
    for (i, name), ids in per_layer.items():
        np.save(os.path.join(dirname, f"layer{i}.{name}.npy"), ids)
    print(f"OutlierIdx : {outidx.tolist()}")
    print(f"saved to {dirname}/outidx.npy  ({time.time()-tick:.1f}s)")


if __name__ == "__main__":
    main()
