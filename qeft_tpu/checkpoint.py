"""Checkpoint formats: fake, packed, and WCT (oweight-only overlay).

The reference persists three torch.save dicts
(/root/reference/qeft/utils/modelutils.py:219-284):
  fake   — full fp16 state_dict + out_ids + bits/group metadata
  packed — qweight/scales/scaled_zeros/oweight buffers + per-layer quantinfos
  wct    — oweight-only state_dict + absolute base_path to the packed ckpt,
           loaded by overlay (`replace_oweight`, modelutils.py:185-217)
with format discrimination by key sniffing (modelutils.py:115).

TPU-native equivalent: one .npz of path-addressed leaves + a JSON manifest
(format tag, model config, quant metadata).  Same three logical formats, same
overlay semantics, no pickle.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from qeft_tpu.ops.packing import QLinearParams

_SEP = "::"
_BF16_TAG = "@bf16"


def _encode(arr) -> Tuple[str, np.ndarray]:
    """npz can't store bfloat16; view as uint16 and tag the key."""
    a = np.asarray(arr)
    if a.dtype == jnp.bfloat16:
        return _BF16_TAG, a.view(np.uint16)
    return "", a


def _decode(key: str, a: np.ndarray) -> Tuple[str, np.ndarray]:
    if key.endswith(_BF16_TAG):
        return key[: -len(_BF16_TAG)], a.view(jnp.bfloat16)
    return key, a


def _flatten(params: Dict) -> Dict[str, np.ndarray]:
    flat = {}

    def put(key, v):
        tag, a = _encode(v)
        flat[key + tag] = a

    def walk(prefix, node):
        if isinstance(node, QLinearParams):
            for f in ("qweight", "scales", "scaled_zeros", "oweight", "bias",
                      "reorder_ids"):
                v = getattr(node, f)
                if v is not None:
                    put(prefix + _SEP + f, v)
            flat[prefix + _SEP + "__group_size"] = np.asarray(node.group_size)
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(prefix + _SEP + k if prefix else k, v)
        elif node is None:
            pass
        else:
            put(prefix, node)

    walk("", params)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    """Rebuild the nested dict; QLinearParams nodes are detected by their
    __group_size sentinel."""
    tree: Dict = {}
    qnodes: Dict[str, Dict] = {}
    flat = dict(_decode(k, v) for k, v in flat.items())
    for key, val in flat.items():
        parts = key.split(_SEP)
        if len(parts) >= 2 and (
            parts[-1]
            in ("qweight", "scales", "scaled_zeros", "oweight", "bias",
                "reorder_ids", "__group_size")
        ):
            node_key = _SEP.join(parts[:-1])
            qnodes.setdefault(node_key, {})[parts[-1]] = val
            continue
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = jnp.asarray(val)

    for node_key, fields in qnodes.items():
        parts = node_key.split(_SEP)
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = QLinearParams(
            qweight=jnp.asarray(fields["qweight"]),
            scales=jnp.asarray(fields["scales"]),
            scaled_zeros=jnp.asarray(fields["scaled_zeros"]),
            oweight=jnp.asarray(fields["oweight"]) if "oweight" in fields else None,
            bias=jnp.asarray(fields["bias"]) if "bias" in fields else None,
            reorder_ids=(
                jnp.asarray(fields["reorder_ids"])
                if "reorder_ids" in fields
                else None
            ),
            group_size=int(fields["__group_size"]),
        )
    return tree


def _cfg_to_dict(cfg) -> Dict:
    d = dataclasses.asdict(cfg)
    d["dtype"] = jnp.dtype(cfg.dtype).name
    return d


def _cfg_from_dict(d: Dict, family: str = "llama"):
    from qeft_tpu.models.api import get_model_api

    d = dict(d)
    d["dtype"] = jnp.dtype(d["dtype"])
    return get_model_api(family).config_cls(**d)


def _save(path: str, params: Dict, manifest: Dict):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(params)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
    mpath = (path[:-4] if path.endswith(".npz") else path) + ".json"
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=1)


def _load(path: str) -> Tuple[Dict, Dict]:
    npz = path if path.endswith(".npz") else path + ".npz"
    mpath = (path[:-4] if path.endswith(".npz") else path) + ".json"
    with np.load(npz) as z:
        flat = {k: z[k] for k in z.files}
    with open(mpath) as f:
        manifest = json.load(f)
    return _unflatten(flat), manifest


# ---------------------------------------------------------------------------
# public API


def save_fake(path: str, params: Dict, quantizers: Dict, cfg, family: str = "llama"):
    """Fake-quantized full-precision checkpoint (+ quantizer states for later
    packing, like the reference's out_ids_dict + quantinfos)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    qflat = {}
    for (i, name), st in quantizers.items():
        base = f"__quant{_SEP}{i}{_SEP}{name}{_SEP}"
        qflat[base + "scale_group"] = np.asarray(st.scale_group)
        qflat[base + "zero_group"] = np.asarray(st.zero_group)
        qflat[base + "out_ids"] = np.asarray(st.out_ids)
        qflat[base + "flags"] = np.asarray([int(st.sym), st.bits, st.group_size])
        if st.perm_ids is not None:  # act-order quantization permutation
            qflat[base + "perm_ids"] = np.asarray(st.perm_ids)
    flat = _flatten(params)
    flat.update(qflat)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
    mpath = (path[:-4] if path.endswith(".npz") else path) + ".json"
    with open(mpath, "w") as f:
        json.dump({"format": "fake", "family": family, "config": _cfg_to_dict(cfg)}, f, indent=1)


def load_fake(path: str):
    from qeft_tpu.pipeline import QuantizerState

    npz = path if path.endswith(".npz") else path + ".npz"
    mpath = (path[:-4] if path.endswith(".npz") else path) + ".json"
    with np.load(npz) as z:
        flat = {k: z[k] for k in z.files}
    with open(mpath) as f:
        manifest = json.load(f)
    assert manifest["format"] == "fake", manifest["format"]

    qstates: Dict = {}
    param_flat = {}
    tmp: Dict = {}
    for k, v in flat.items():
        if k.startswith("__quant" + _SEP):
            _, i, name, field = k.split(_SEP)
            tmp.setdefault((int(i), name), {})[field] = v
        else:
            param_flat[k] = v
    for key, fields in tmp.items():
        sym, bits, group_size = fields["flags"].tolist()
        qstates[key] = QuantizerState(
            scale_group=jnp.asarray(fields["scale_group"]),
            zero_group=jnp.asarray(fields["zero_group"]),
            out_ids=jnp.asarray(fields["out_ids"]),
            sym=bool(sym), bits=int(bits), group_size=int(group_size),
            perm_ids=(
                jnp.asarray(fields["perm_ids"]) if "perm_ids" in fields else None
            ),
        )
    family = manifest.get("family", "llama")
    params = _unflatten(param_flat)
    return params, qstates, _cfg_from_dict(manifest["config"], family), family


def save_packed(path: str, packed_params: Dict, cfg, family: str = "llama"):
    _save(path, packed_params, {"format": "packed", "family": family, "config": _cfg_to_dict(cfg)})


def load_packed(path: str):
    """-> (packed params, config, family)."""
    params, manifest = _load(path)
    assert manifest["format"] == "packed", manifest["format"]
    family = manifest.get("family", "llama")
    return params, _cfg_from_dict(manifest["config"], family), family


def save_wct(path: str, oweights: Dict, base_path: str):
    """Oweight-only overlay (reference save_wctmodel, modelutils.py:270-284)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = {}
    for name, v in oweights.items():
        tag, a = _encode(v)
        flat[f"oweight{_SEP}{name}{tag}"] = a
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
    mpath = (path[:-4] if path.endswith(".npz") else path) + ".json"
    with open(mpath, "w") as f:
        json.dump({"format": "wct", "base_path": os.path.abspath(base_path)}, f, indent=1)


def load_wct(path: str):
    """Load base packed model and overlay the fine-tuned slabs
    (reference load_wctmodel + replace_oweight, modelutils.py:185-217)."""
    npz = path if path.endswith(".npz") else path + ".npz"
    mpath = (path[:-4] if path.endswith(".npz") else path) + ".json"
    with open(mpath) as f:
        manifest = json.load(f)
    assert manifest["format"] == "wct", manifest["format"]
    params, cfg, family = load_packed(manifest["base_path"])
    with np.load(npz) as z:
        for k in z.files:
            key, val = _decode(k, z[k])
            _, name = key.split(_SEP)
            lin: QLinearParams = params["layers"][name]
            params["layers"][name] = dataclasses.replace(
                lin, oweight=jnp.asarray(val).astype(lin.scales.dtype)
            )
    return params, cfg, family


def load_model(path: str):
    """Format sniffing dispatch (reference modelutils.py:107-120).

    -> (params, config, family) for every format.
    """
    mpath = (path[:-4] if path.endswith(".npz") else path) + ".json"
    with open(mpath) as f:
        fmt = json.load(f)["format"]
    if fmt == "packed":
        return load_packed(path)
    if fmt == "wct":
        return load_wct(path)
    if fmt == "fake":
        params, _, cfg, family = load_fake(path)
        return params, cfg, family
    raise ValueError(f"unknown checkpoint format {fmt}")
