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


def _fast_host_init(init, cfg, dtype):
    """Shape-faithful random host params WITHOUT running the jax initializer.

    JAX's host-CPU PRNG takes tens of minutes at 7B scale (measured: a
    threefry/rbg 6.7B-value init never finished inside 45 min on this box),
    numpy's ziggurat standard_normal is ~7 min for 6.7B values, and
    ml_dtypes' float32->bfloat16 astype collapses to ~4.5M elem/s on
    multi-GB arrays (317 s for one 1.4B leaf).  Instead: draw ONE 16M-value
    normal pool (~1 s), pre-scale + pre-convert it once per distinct leaf
    scale (bfloat16 via round-to-nearest-even bit twiddling), then tile the
    converted pool into each leaf at memcpy speed (pool length is odd, so
    rows of power-of-two width de-align on each wrap).  `jax.eval_shape`
    supplies the exact tree structure/shapes/dtypes from the family's own
    init_params; leaves are filled by role: norm scales -> 1, biases -> 0,
    matrices -> N(0, K^-1/2) in the [K, N] layout, embeddings -> N(0, 0.02).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    spec = jax.eval_shape(
        lambda: init(cfg, jax.random.key(0, impl="rbg"), dtype=dtype)
    )
    rng = np.random.default_rng(0)
    pool = rng.standard_normal((1 << 24) + 1, np.float32)
    scaled_pools = {}
    state = {"off": 0}

    def np_bf16(x32):
        # float32 -> bfloat16 with round-to-nearest-even (bit-exact vs
        # ml_dtypes astype, which is pathologically slow on huge arrays)
        u = np.ascontiguousarray(x32).view(np.uint32)
        r = (u + np.uint32(0x7FFF) + ((u >> np.uint32(16)) & np.uint32(1)))
        return (r >> np.uint32(16)).astype(np.uint16).view(jnp.bfloat16)

    def scaled_pool(scale, dt):
        key = (float(scale), np.dtype(dt).name)
        if key not in scaled_pools:
            p = pool * np.float32(scale)
            scaled_pools[key] = np_bf16(p) if dt == jnp.bfloat16 \
                else p.astype(dt)
        return scaled_pools[key]

    def draw(p, n):
        # cycle the pool starting at a rolling offset (memcpy-speed)
        off = state["off"]
        state["off"] = (off + n) % p.size
        return np.resize(np.roll(p, -off), n)

    def fill(path, sd):
        name = jax.tree_util.keystr(path)
        shape = sd.shape
        dt = np.dtype(sd.dtype) if sd.dtype != jnp.bfloat16 else jnp.bfloat16
        if "ln" in name and not name.rstrip("']").endswith("_b"):
            return np.ones(shape, np.float32).astype(dt)
        if name.rstrip("']").endswith("_b") or "bias" in name:
            return np.zeros(shape, np.float32).astype(dt)
        if "embed" in name:
            scale = 0.02
        elif len(shape) >= 2:
            scale = float(shape[-2]) ** -0.5
        else:
            scale = 1.0
        return draw(scaled_pool(scale, dt), int(np.prod(shape))).reshape(shape)

    return jax.tree_util.tree_map_with_path(fill, spec)


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
            params = _fast_host_init(init, cfg, dtype or jnp.float32)
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

    # fail BEFORE the multi-hour extraction pass, not at the final top-k
    if args.target_rank is None and args.perhead is None:
        parser.error(
            "--target_rank or --perhead is required: the global outlier "
            "index is a top-k over the sensitivity sum (--target_bit alone "
            "only sets per-layer budgets)"
        )

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
