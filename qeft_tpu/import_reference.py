"""Import a reference (xvyaward/qeft) PACKED torch checkpoint into this
framework's packed format — the migration path for existing users.

The reference persists `torch.save({'model_state_dict', 'quantinfos', ...})`
(/root/reference/qeft/utils/modelutils.py:248-268) where each QuantLinear
contributes:

- ``qweight``  int16 [OC/4, IC] — INT4 codes in the AWQ tensor-core interleave
  (pack_intweight, qlinear.py:81-121: 32-column [4,4,2] shuffle, in-octet
  [0,2,4,6,1,3,5,7] reorder, 4-row interleave at kstride 64, 4 nibbles per
  int16)
- ``scales``        fp16 [IC/g, OC]
- ``scaled_zeros``  fp16 [IC/g, OC] = -(zeros * scales)^T  (qlinear.py:207-210)
- ``oweight``       fp16 [OC, r] — the fp weak-column slab (last r columns of
  the reordered input dim); the packed codes there hold the zero-point
- ``outlieridx``    int [r]

Those are exactly the quantities our `QLinearParams` stores (scales [G, N]
and scaled_zeros [G, N] match VERBATIM; codes transpose to [K, N] and repack
into the int32 plane layout; oweight transposes to [r, N]), so conversion is
pure layout math — no requantization, bit-exact weights.

The AWQ interleave is inverted WITHOUT hand-deriving the inverse: the forward
shuffle is applied to an index array once per (N, K) shape, giving the source
map of every nibble; scattering through it undoes the packing exactly (tested
against the reference's own pack_intweight run as an oracle).

CLI:
    python -m qeft_tpu.import_reference ref_ckpt.pth out_ckpt --model llama2-7b

Supports the canonical OGR (``--reorder``) checkpoints of the llama family
(the reference README workflow, README.md:41-77).
"""

from __future__ import annotations

import argparse
import functools
from typing import Dict, Tuple

import numpy as np


@functools.lru_cache(maxsize=32)
def _awq_nibble_source_map(n: int, k: int) -> np.ndarray:
    """[N//4, K, 4] array: original flat index (row-major [N, K]) of the code
    stored in nibble ``i`` of packed int16 (row, col).  Built by pushing an
    index array through the reference's forward shuffle (qlinear.py:81-121).
    Cached per shape: a 7B import calls this 224 times over 4 distinct
    shapes, and each build is ~100 MB of index shuffling."""
    a = np.arange(n * k, dtype=np.int64).reshape(n, k)
    # 32-column [4, 4, 2] shuffle
    a = a.reshape(n, k // 32, 4, 4, 2).transpose(0, 1, 3, 2, 4).reshape(n, k // 32, 32)
    # in-octet [0,2,4,6,1,3,5,7] reorder
    a = a.reshape(n, k // 32, 4, 4, 2).transpose(0, 1, 2, 4, 3).reshape(n, k)
    # 4-row interleave at kstride 64
    a = a.reshape(n // 4, 4, k // 64, 64).transpose(0, 2, 1, 3)
    a = a.reshape(n // 4, k // 64, 64, 4)
    return a.reshape(n // 4, k, 4)


def unpack_awq(qweight: np.ndarray, n: int, k: int) -> np.ndarray:
    """int16 [N//4, K] AWQ-packed -> int32 codes [N, K] (exact inverse of the
    reference's pack_intweight)."""
    q = qweight.astype(np.uint16).reshape(n // 4, k)
    nibbles = np.stack(
        [(q >> (4 * i)) & 0xF for i in range(4)], axis=-1
    ).astype(np.int32)  # [N//4, K, 4]
    src = _awq_nibble_source_map(n, k)
    out = np.empty(n * k, np.int32)
    out[src.ravel()] = nibbles.ravel()
    return out.reshape(n, k)


def _import_linear(sd: Dict, prefix: str, group_size: int) -> "QLinearParams":
    from qeft_tpu.ops.packing import QLinearParams, pack_codes_np

    import jax.numpy as jnp

    scales = np.asarray(sd[prefix + "scales"], np.float32)  # [G, OC]
    szeros = np.asarray(sd[prefix + "scaled_zeros"], np.float32)
    g, oc = scales.shape
    ic = np.asarray(sd[prefix + "qweight"]).shape[1]  # [OC/4, IC]
    codes_oc_ic = unpack_awq(np.asarray(sd[prefix + "qweight"]), oc, ic)
    codes_kn = np.ascontiguousarray(codes_oc_ic.T)  # [K, N]
    qweight = pack_codes_np(codes_kn, group_size)

    oweight = None
    if prefix + "oweight" in sd:
        oweight = jnp.asarray(
            np.ascontiguousarray(np.asarray(sd[prefix + "oweight"], np.float32).T),
            jnp.bfloat16,
        )  # [r, N]
    bias = None
    if prefix + "bias" in sd:
        bias = jnp.asarray(np.asarray(sd[prefix + "bias"], np.float32), jnp.bfloat16)
    return QLinearParams(
        qweight=jnp.asarray(qweight),
        scales=jnp.asarray(scales, jnp.bfloat16),
        scaled_zeros=jnp.asarray(szeros, jnp.bfloat16),
        oweight=oweight,
        bias=bias,
        group_size=group_size,
    )


_HF_LLAMA_LINEARS = {
    "q": "self_attn.q_proj.",
    "k": "self_attn.k_proj.",
    "v": "self_attn.v_proj.",
    "o": "self_attn.o_proj.",
    "up": "mlp.up_proj.",
    "gate": "mlp.gate_proj.",
    "down": "mlp.down_proj.",
}


def import_reference_packed(path: str, cfg, ckpt: Dict = None) -> Tuple[Dict, str]:
    """Reference packed .pth -> (our packed params pytree, family).

    ``cfg``: the model's LlamaConfig (the reference checkpoint stores no
    config; its loader re-instantiates from the HF model name the same way,
    modelutils.py:107-183).  ``ckpt``: the already-torch.loaded dict, when
    the caller probed it — multi-GB checkpoints should deserialize once."""
    import jax
    import jax.numpy as jnp

    from qeft_tpu.quant.reorder import sparse_to_dense_ids

    if ckpt is None:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt.get("packing"), "not a packed reference checkpoint"
    sd = {k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in ckpt["model_state_dict"].items()}
    group_size = int(ckpt.get("group_size", 128))
    quantinfos = ckpt.get("quantinfos", {})
    if quantinfos and not all(
        getattr(qi, "reorder", False) for qi in quantinfos.values()
    ):
        raise NotImplementedError(
            "only OGR (--reorder) reference checkpoints are supported: "
            "non-reordered ones keep per-layer scattered outlier columns "
            "(reference forward_outlier), a layout this importer does not "
            "translate"
        )

    def arr(name, dt=jnp.bfloat16):
        return jnp.asarray(np.asarray(sd[name], np.float32), dt)

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        blk = {
            "input_ln": arr(pre + "input_layernorm.weight"),
            "post_ln": arr(pre + "post_attention_layernorm.weight"),
        }
        for ours, theirs in _HF_LLAMA_LINEARS.items():
            blk[ours] = _import_linear(sd, pre + theirs, group_size)
        # o_proj's runtime input gather (attention output is head-ordered and
        # cannot be statically permuted; reference qlinear.py:227-229)
        oid = sd.get(pre + "self_attn.o_proj.outlieridx")
        if oid is not None and len(oid):
            blk["o_reorder"] = jnp.asarray(
                np.asarray(
                    sparse_to_dense_ids(
                        jnp.asarray(np.asarray(oid, np.int64)),
                        blk["o"].in_features,
                    )
                ),
                jnp.int32,
            )
        blocks.append(blk)

    params = {
        "embed": arr("model.embed_tokens.weight"),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": arr("model.norm.weight"),
        "lm_head": jnp.asarray(
            np.ascontiguousarray(np.asarray(sd["lm_head.weight"], np.float32).T),
            jnp.bfloat16,
        ),
    }
    return params, "llama"


def import_reference_wct(
    path: str, cfg, base_path: str = None, ckpt: Dict = None
) -> Tuple[Dict, str]:
    """Reference WCT checkpoint (oweight-only overlay; save_wctmodel,
    modelutils.py:270-284) -> our packed params with fine-tuned slabs.

    ``base_path`` overrides the absolute base path stored in the checkpoint
    (useful when the packed base was moved along with it)."""
    import dataclasses as _dc

    import jax.numpy as jnp

    if ckpt is None:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert "oweight_state_dict" in ckpt, "not a reference WCT checkpoint"
    params, family = import_reference_packed(
        base_path or ckpt["base_path"], cfg
    )
    # keys are the module paths, e.g. model.layers.0.self_attn.q_proj
    inv = {v.rstrip("."): k for k, v in _HF_LLAMA_LINEARS.items()}
    for name, ow in ckpt["oweight_state_dict"].items():
        parts = name.split(".")
        i = int(parts[2])
        ours = inv[".".join(parts[3:])]
        lin = params["layers"][ours]  # stacked [L, ...] leaves
        if lin.oweight is None:
            raise ValueError(
                f"WCT overlay for '{name}' but the packed base has no "
                "outlier slab there — wrong base checkpoint?"
            )
        new_slab = jnp.asarray(
            np.ascontiguousarray(np.asarray(ow, np.float32).T), jnp.bfloat16
        )
        params["layers"][ours] = _dc.replace(
            lin, oweight=lin.oweight.at[i].set(new_slab)
        )
    return params, family


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("src", type=str, help="reference packed .pth/.pt")
    parser.add_argument("dst", type=str, help="our packed checkpoint to write")
    parser.add_argument("--model", type=str, required=True,
                        help="preset name (llama2-7b, ...) or HF dir for the "
                             "config the checkpoint was produced from")
    parser.add_argument("--base", type=str, default=None,
                        help="packed base for a WCT checkpoint (overrides "
                             "the absolute base_path stored inside)")
    args = parser.parse_args(argv)

    from qeft_tpu.checkpoint import save_packed
    from qeft_tpu.models.llama import LLAMA_PRESETS

    if args.model in LLAMA_PRESETS:
        cfg = LLAMA_PRESETS[args.model]
    else:
        from qeft_tpu.models.hf_loader import config_from_hf

        cfg = config_from_hf(args.model)
    import torch

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    if "oweight_state_dict" in ckpt:
        params, family = import_reference_wct(
            args.src, cfg, base_path=args.base, ckpt=ckpt
        )
    else:
        params, family = import_reference_packed(args.src, cfg, ckpt=ckpt)
    save_packed(args.dst, params, cfg, family=family)
    print(f"imported reference checkpoint -> {args.dst}.npz")


if __name__ == "__main__":
    main()
