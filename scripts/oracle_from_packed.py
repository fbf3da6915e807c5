"""Recover the fake-vs-packed PPL oracle FROM a packed checkpoint.

The inline oracle (main.py --eval after --packing) evaluates the in-memory
fake reconstruction against the packed model; if that process dies after the
packed save (e.g. the 13B host-OOM of 2026-08-21), the fake model is gone —
but it is exactly derivable from the packed checkpoint: by the packing
contract (ops/packing.py) the dense rows dequantize to ``code*scale +
scaled_zero`` (outlier rows to 0) and the outlier rows' full-precision
values are the ``oweight`` slab, which `pack_layer` stored verbatim from
the fake weight's trailing rows.  So

    fake[k, n] = dequantize_weight(packed)[k, n]   for k <  K-r
    fake[K-r+i, n] = oweight[i, n]                 for 0 <= i < r

reproduces the fake reconstruction bit-for-bit in bf16.  This script
rebuilds that dense model, evaluates both paths on the same windows, and
prints the oracle delta (reference README.md:55-59).

    python scripts/oracle_from_packed.py <packed_ckpt> [seqlen] [windows]

Validated against the tiny CLI run (fake 436.9587 / packed 436.2449):
reproduces both to the printed precision.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qeft_tpu.checkpoint import load_packed
from qeft_tpu.data.loaders import get_loaders
from qeft_tpu.eval import eval_ppl, eval_ppl_streamed
from qeft_tpu.models.registry import get_model_meta
from qeft_tpu.ops.packing import QLinearParams, dequantize_weight


def fake_from_packed(params: dict) -> dict:
    """Dense fake-reconstruction params from a packed (stacked-leaf) tree.

    Every output leaf stays a HOST numpy array (at 13B the dense tree is
    ~26 GB — far over HBM; `eval_ppl_streamed` transfers one block at a
    time), and the dequant math runs on the CPU backend."""
    cpu = jax.devices("cpu")[0]
    layers = {}
    with jax.default_device(cpu):
        for name, leaf in params["layers"].items():
            if not isinstance(leaf, QLinearParams):
                layers[name] = np.asarray(leaf)
                continue
            l_count = leaf.qweight.shape[0]
            per = []
            for l in range(l_count):  # layer-at-a-time: bounds the temp
                one = QLinearParams(
                    qweight=jnp.asarray(np.asarray(leaf.qweight[l])),
                    scales=jnp.asarray(np.asarray(leaf.scales[l])),
                    scaled_zeros=jnp.asarray(np.asarray(leaf.scaled_zeros[l])),
                    oweight=None if leaf.oweight is None
                    else jnp.asarray(np.asarray(leaf.oweight[l])),
                    bias=None, group_size=leaf.group_size,
                )
                w = dequantize_weight(one)  # [K, N] bf16, outlier rows 0
                if one.oweight is not None:
                    r = one.oweight.shape[0]
                    w = w.at[w.shape[0] - r :, :].set(
                        one.oweight.astype(w.dtype)
                    )
                per.append(np.asarray(w))
            layers[name] = np.stack(per)
            if leaf.bias is not None:
                layers[name + "_bias"] = np.asarray(leaf.bias)
    return {**params, "layers": layers}


def main():
    path = sys.argv[1]
    seqlen = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    windows = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    # host-staged: the packed tree (8.5 GB at 13B) must not sit in HBM while
    # the dense fake (26 GB) streams through block-wise
    with jax.default_device(jax.devices("cpu")[0]):
        packed, cfg, family = load_packed(path)
    meta = get_model_meta(family)
    test = get_loaders("synthetic", train=False, vocab_size=cfg.vocab_size)

    fake = fake_from_packed(packed)
    gb = sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(fake)) / 1e9
    if jax.default_backend() == "tpu" and gb > 6.0:
        ppl_fake = eval_ppl_streamed(fake, test, cfg, meta, seqlen=seqlen,
                                     max_windows=windows)
    else:
        ppl_fake = eval_ppl(fake, test, cfg, seqlen=seqlen,
                            max_windows=windows)
    del fake
    print(f"fake (from packed) ppl: {ppl_fake:.4f}", flush=True)

    if jax.default_backend() == "tpu":
        packed = jax.device_put(packed, jax.devices()[0])
    ppl_packed = eval_ppl(packed, test, cfg, seqlen=seqlen,
                          max_windows=windows)
    delta = abs(ppl_packed - ppl_fake) / max(ppl_fake, 1e-9)
    print(f"packed ppl: {ppl_packed:.4f}  (fake-vs-packed delta {delta:.2%})")


if __name__ == "__main__":
    main()
