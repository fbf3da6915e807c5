"""Typed model-meta registry: which linears exist, how they group for
sequential quantization, and per-layer outlier budget ratios.

This is the TPU-native equivalent of the reference's `model_config.json`
(+ `get_model_config`, /root/reference/qeft/utils/misc.py:69-95): the schema
(map_layer/ratios/sequential/ln_layers) is preserved as a dataclass; module
*paths* are gone because our models are functional pytrees with fixed keys.

The four `sequential` stages have the same meaning as the reference
(model_config.json:29-34):
  [0] qkv-like     — input = residual stream (global outliers apply)
  [1] out-like     — input = attention head space (per-layer outliers,
                     dynamic input reorder at runtime)
  [2] ffn1-like    — input = residual stream (global outliers apply)
  [3] ffn2-like    — input = MLP internal space (per-layer outliers,
                     statically reordered into ffn1's output)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple


@dataclasses.dataclass(frozen=True)
class ModelMeta:
    family: str
    # linear names inside one decoder block, by sequential stage
    qkv: Tuple[str, ...]
    out: Tuple[str, ...]
    ffn1: Tuple[str, ...]
    ffn2: Tuple[str, ...]
    # per-layer outlier budget weights (reference model_config.json "ratios")
    ratios: Dict[str, float]
    # layer-norm param names inside one block (elementwise scales that must be
    # permuted together with the residual stream)
    ln: Tuple[str, ...] = ("input_ln", "post_ln")

    @property
    def sequential(self) -> Tuple[Tuple[str, ...], ...]:
        return (self.qkv, self.out, self.ffn1, self.ffn2)

    @property
    def all_linears(self) -> Tuple[str, ...]:
        return self.qkv + self.out + self.ffn1 + self.ffn2

    @property
    def global_outlier_linears(self) -> Tuple[str, ...]:
        """Stages whose input is the (reorderable) residual stream."""
        return self.qkv + self.ffn1


_METAS: Dict[str, ModelMeta] = {
    # reference model_config.json:26-51
    "llama": ModelMeta(
        family="llama",
        qkv=("q", "k", "v"),
        out=("o",),
        ffn1=("up", "gate"),
        ffn2=("down",),
        ratios={
            "q": 1.0,
            "k": 1.0,
            "v": 1.0,
            "o": 1.0,
            "up": 0.375,
            "gate": 0.375,
            "down": 0.375,
        },
    ),
    # reference model_config.json:52-77 (same topology, smaller mlp ratios)
    "gemma": ModelMeta(
        family="gemma",
        qkv=("q", "k", "v"),
        out=("o",),
        ffn1=("up", "gate"),
        ffn2=("down",),
        ratios={
            "q": 1.0,
            "k": 1.0,
            "v": 1.0,
            "o": 1.0,
            "up": 0.125,
            "gate": 0.125,
            "down": 0.125,
        },
    ),
    # reference model_config.json:2-25 (OPT: fc1/fc2 MLP)
    "opt": ModelMeta(
        family="opt",
        qkv=("q", "k", "v"),
        out=("o",),
        ffn1=("fc1",),
        ffn2=("fc2",),
        ratios={"q": 1.0, "k": 1.0, "v": 1.0, "o": 1.0, "fc1": 0.25, "fc2": 0.25},
        ln=("attn_ln", "final_ln"),
    ),
    # reference model_config.json:78-103 (phi: fused dense out, fc1/fc2).
    # phi's block is PARALLEL (one LayerNorm feeds both attention and MLP);
    # the reference's ln_layers names a post_attention_layernorm HF phi does
    # not have — we list the real single norm
    "phi": ModelMeta(
        family="phi",
        qkv=("q", "k", "v"),
        out=("o",),
        ffn1=("fc1",),
        ffn2=("fc2",),
        ratios={"q": 1.0, "k": 1.0, "v": 1.0, "o": 1.0, "fc1": 0.25, "fc2": 0.25},
        ln=("input_ln",),
    ),
    # reference model_config.json:104-126 (bloom: single fused qkv linear)
    "bloom": ModelMeta(
        family="bloom",
        qkv=("qkv",),
        out=("dense",),
        ffn1=("fc1",),
        ffn2=("fc2",),
        ratios={"qkv": 3.0, "dense": 1.0, "fc1": 0.25, "fc2": 0.25},
        ln=("attn_ln", "post_ln"),
    ),
    # reference model_config.json:127-148 (falcon: same stage topology; the
    # reference also forces percdamp=1.0 for falcon, misc.py:132-136)
    "falcon": ModelMeta(
        family="falcon",
        qkv=("qkv",),
        out=("dense",),
        ffn1=("fc1",),
        ffn2=("fc2",),
        ratios={"qkv": 3.0, "dense": 1.0, "fc1": 0.25, "fc2": 0.25},
        # mlp_ln exists only on new_decoder_architecture (falcon-40B/180B)
        # blocks; the reorder passes skip ln names a block doesn't carry
        ln=("attn_ln", "mlp_ln"),
    ),
}


def get_model_meta(name: str) -> ModelMeta:
    """Name-based dispatch, mirroring reference misc.py:69-95."""
    low = name.lower()
    if "opt" in low:
        return _METAS["opt"]
    if "llama" in low or "vicuna" in low or "stablebeluga" in low:
        return _METAS["llama"]
    if "gemma" in low:
        return _METAS["gemma"]
    if "phi" in low:
        return _METAS["phi"]
    if "bloom" in low:
        return _METAS["bloom"]
    if "falcon" in low:
        return _METAS["falcon"]
    if low in _METAS:
        return _METAS[low]
    raise NotImplementedError(f"{name} model family is not implemented")
