"""Device-mesh sharding for the packed model: tensor parallelism over ICI,
data/batch parallelism across hosts.

This is a NEW capability relative to the reference, whose only multi-device
path is a blocking layer-round-robin pipeline (`model_multigpu`,
/root/reference/qeft/utils/modelutils.py:21-57).  Here the packed weights, the
fp16 outlier slabs, and the KV cache carry `NamedSharding`s and the whole
forward runs under jit — XLA GSPMD inserts the all-gathers/reduce-scatters
over ICI (megatron-style: qkv/ffn1 column-parallel over N, o/ffn2 row-parallel
over K with an implicit psum on the block output).

Outlier-slab note (SURVEY.md "hard parts"): the fp16 slab sits at the END of
the K dimension.  Row-parallel K-sharding under GSPMD remains *correct*
regardless (jit semantics are global); the slab simply lives on the last K
shard.  `oweight` itself is sharded over N everywhere so the rank-r GEMM is
balanced.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qeft_tpu.models.registry import ModelMeta

# QLinearParams flattens to this field order (ops/packing.py tree_flatten)
_QFIELDS = ("qweight", "scales", "scaled_zeros", "oweight", "bias", "reorder_ids")


def make_mesh(shape=None, axis_names=("dp", "tp"), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n)
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def _path_keys(path):
    keys = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            keys.append(("dict", p.key))
        elif isinstance(p, jax.tree_util.FlattenedIndexKey):
            keys.append(("idx", p.key))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            keys.append(("attr", p.name))
        elif isinstance(p, jax.tree_util.SequenceKey):
            keys.append(("seq", p.idx))
    return keys


def _linear_spec(field: str, shard_n: bool, stacked: bool) -> P:
    """Spec for one QLinearParams field (leading L axis when stacked)."""
    pre = (None,) if stacked else ()
    if field == "qweight":
        return P(*pre, None, "tp") if shard_n else P(*pre, "tp", None)
    if field in ("scales", "scaled_zeros"):
        # row-parallel: the group count (K/g, e.g. 86 for 7B down_proj) rarely
        # divides tp — replicate; scales are ~1/32 of the int4 bytes
        return P(*pre, None, "tp") if shard_n else P(*pre, None, None)
    if field == "oweight":
        return P(*pre, None, "tp")  # balanced rank-r GEMM either way
    if field == "reorder_ids":
        return P(*pre, None)  # per-linear input gather: replicate
    assert field == "bias", field
    return P(*pre, "tp") if shard_n else P(*pre, None)


def param_shardings(params: Dict, mesh: Mesh, meta: ModelMeta) -> Dict:
    """NamedSharding pytree matching ``params`` (packed or dense, stacked)."""
    # column-parallel: shard N (incl. the stage-fused names pack_model /
    # fuse_packed_stages produce — their fused N dim is still residual-input)
    col = set(meta.qkv + meta.ffn1) | {"qkv", "upgate"}
    row = set(meta.out + meta.ffn2)  # row-parallel: shard K

    def spec_for(path, leaf) -> P:
        keys = _path_keys(path)
        top = keys[0][1]
        if top == "embed":
            return P(None, None)
        if top == "lm_head":
            return P(None, "tp")
        if top == "final_ln":
            return P(None)
        if top == "layers":
            name = keys[1][1]
            stacked = True
            if name in col or name in row:
                shard_n = name in col
                if len(keys) >= 3 and keys[2][0] == "idx":
                    field = _QFIELDS[keys[2][1]]
                    return _linear_spec(field, shard_n, stacked)
                # dense stacked [L, K, N]
                return P(None, None, "tp") if shard_n else P(None, "tp", None)
            # norms [L, D], o_reorder [L, K]: replicated
            return P(*((None,) * leaf.ndim))
        return P(*((None,) * leaf.ndim))

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params
    )


def cache_shardings(
    mesh: Mesh, batch: int = 0, n_kv_heads: int = 0, quantized: bool = False
) -> Dict:
    """Head-major KV cache [L, B, H_kv, S, Dh]: batch over dp, heads over tp.

    Axes that don't divide the mesh (small batch, few GQA kv heads) fall back
    to replication.  ``quantized=True`` matches the int8 cache pytree
    (init_kv_cache quantized / QEFT_KV_DTYPE=int8): the per-vector scale
    planes [L, B, H_kv, S] shard the same way minus the Dh axis.
    """
    dp = "dp" if batch and batch % mesh.shape.get("dp", 1) == 0 else None
    tp = "tp" if n_kv_heads and n_kv_heads % mesh.shape.get("tp", 1) == 0 else None
    spec = NamedSharding(mesh, P(None, dp, tp, None, None))
    out = {"k": spec, "v": spec}
    if quantized:
        sspec = NamedSharding(mesh, P(None, dp, tp, None))
        out["k_scale"] = sspec
        out["v_scale"] = sspec
    return out


def shard_params(params: Dict, mesh: Mesh, meta: ModelMeta) -> Dict:
    return jax.device_put(params, param_shardings(params, mesh, meta))
