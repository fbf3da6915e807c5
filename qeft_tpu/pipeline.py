"""End-to-end quantization pipelines over a functional model pytree.

TPU-native re-design of the reference's three driver stages:

- `extract_global_outidx` — OGR step 1 (reference extract_outidx.py:18-180):
  stream blocks, accumulate normalized Hessian-diagonal sensitivity over the
  residual-stream stages, take the global top-`target_rank` channel set.
- `quantize_model` — layerwise GPTQ-OWQ reconstruction + optional global
  reorder (reference main.py:18-193 + reorder.py:148-176).
- `pack_model` — pack every quantized linear into the TPU layout
  (reference quant.py:216-233 + qlinear.py:180-215).

Where the reference uses forward hooks and in-place module surgery, we use the
model's `capture` mode and pytree updates: each decoder block is a pure
function, so "hooks" are just returned intermediates, and Hessian accumulation
is a jitted scan over calibration samples.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qeft_tpu.models.llama import LlamaConfig, llama_block, rope_tables, _causal_mask
from qeft_tpu.models.registry import ModelMeta
from qeft_tpu.ops.packing import pack_layer
from qeft_tpu.quant.gptq import gptq_quantize, LayerQuantResult
from qeft_tpu.quant.outliers import frob_norm_error, hessian_sort_ids
from qeft_tpu.quant.quantizer import QuantSpec
from qeft_tpu.quant.reorder import sparse_to_dense_ids


@dataclasses.dataclass
class QuantizeArgs:
    """Mirrors the reference CLI surface (main.py:373-501) minus torch-isms."""

    spec: QuantSpec = QuantSpec(bits=4, sym=False, mse=True, group_size=128)
    target_rank: Optional[int] = 128
    target_bit: Optional[float] = None
    percdamp: float = 0.01
    act_order: bool = False
    no_frob_norm: bool = False
    reorder: bool = True
    rtn: bool = False  # nearest_owq
    true_sequential: bool = False
    nsamples: int = 128
    perhead: Optional[int] = None
    # restrict OWQ outliers to these linear names (reference --layers,
    # misc.py:160-177: unselected linears quantize with ratio/n_out 0)
    owq_layers: Optional[Tuple[str, ...]] = None


def _block_at(layers, i, device=None):
    """Slice block ``i`` out of the stacked layers pytree; works for both
    device-resident jnp arrays and host-resident numpy arrays (the reference
    streams blocks CPU<->GPU the same way, main.py:99,180)."""
    blk = jax.tree.map(lambda a: a[i], layers)
    if device is not None:
        blk = jax.device_put(blk, device)
    return blk


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def _stack_host(blocks):
    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizerState:
    """Per-layer quantization metadata carried into packing / checkpoints
    (the reference stores this on Quantizer modules and pickles them as
    'quantinfos', modelutils.py:248-268)."""

    scale_group: jax.Array  # [OC, G] in reordered layout
    zero_group: jax.Array  # [OC, G]
    out_ids: jax.Array  # [n_out] sorted, original column order
    sym: bool
    bits: int
    group_size: int
    # full quantization permutation [IC], stored ONLY when it differs from the
    # canonical outliers-last order (i.e. --act_order): the group params above
    # are aligned to it, so packing must permute rows by it too
    perm_ids: Optional[jax.Array] = None

    def tree_flatten(self):
        return (self.scale_group, self.zero_group, self.out_ids, self.perm_ids), (
            self.sym,
            self.bits,
            self.group_size,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:3], sym=aux[0], bits=aux[1], group_size=aux[2],
                   perm_ids=children[3])


# ---------------------------------------------------------------------------
# calibration capture


@partial(jax.jit, static_argnames=("cfg",))
def _embed_tokens(embed, tokens, cfg: LlamaConfig):
    # takes only the embedding table (passing the whole params pytree into a
    # jitted function would transfer every leaf to device — the rest of the
    # model stays host-resident and streams per block)
    x = jnp.take(embed, tokens, axis=0)
    if getattr(cfg, "embed_scale", False):
        # gemma scales embeddings by sqrt(hidden); calibration must see the
        # same block-0 input distribution the serving forward produces
        x = x * jnp.asarray(cfg.hidden_size**0.5, x.dtype)
    return x


def _hessian_precision():
    """HIGHEST (fp32-equivalent, default) or HIGH (bf16x3, ~2x faster) for
    the calibration Hessian accumulation — set QEFT_HESSIAN_PRECISION=high
    to trade a little accuracy for large-model calibration speed."""
    import os

    if os.environ.get("QEFT_HESSIAN_PRECISION", "highest").lower() == "high":
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.HIGHEST


_ALL_STAGES = ("qkv", "out", "ffn1", "ffn2")
_STAGE_CAP = {"qkv": "qkv_in", "out": "o_in", "ffn1": "ffn1_in", "ffn2": "ffn2_in"}


def _stage_widths(cfg, ffn: int):
    d = cfg.hidden_size
    return {"qkv": d, "out": cfg.num_heads * cfg.head_dim, "ffn1": d, "ffn2": ffn}


@partial(jax.jit, static_argnames=("cfg", "stages"))
def block_hessians(blk, inps, cfg: LlamaConfig, stages=_ALL_STAGES):
    """Run one block over all calibration samples, accumulating the per-stage
    Hessian sums and the block outputs.

    ``inps``: [n, S, D].  Returns (outs [n, S, D], {stage: H_sum}) where
    H_sum = sum over samples/tokens of x x^T (caller scales by 2/nsamples).
    ``stages`` restricts which Hessians are built: the OGR extraction only
    needs qkv/ffn1, and skipping ffn2's [F, F] sum (485 MB fp32 at 7B) keeps
    the extract pass memory-lean on a shared chip.
    """
    n, s, d = inps.shape
    pos = jnp.arange(s)[None, :]
    cos, sin = rope_tables(cfg, pos)
    mask = _causal_mask(s)

    widths = _stage_widths(cfg, cfg.intermediate_size)
    prec = _hessian_precision()

    def step(carry, x):
        out, _, cap = llama_block(blk, x[None], cfg, cos, sin, mask, capture=True)

        def acc(h, a):
            flat = a.reshape(-1, a.shape[-1]).astype(jnp.float32)
            return h + jnp.matmul(flat.T, flat, precision=prec)

        carry = tuple(
            acc(h, cap[_STAGE_CAP[st]]) for h, st in zip(carry, stages)
        )
        return carry, out[0]

    init = tuple(jnp.zeros((widths[st], widths[st]), jnp.float32) for st in stages)
    hs, outs = jax.lax.scan(step, init, inps)
    return outs, dict(zip(stages, hs))


@partial(jax.jit, static_argnames=("cfg",))
def block_forward_batch(blk, inps, cfg: LlamaConfig):
    """Re-forward a (quantized) block over all samples (reference main.py:174-175)."""
    n, s, d = inps.shape
    pos = jnp.arange(s)[None, :]
    cos, sin = rope_tables(cfg, pos)
    mask = _causal_mask(s)

    def step(_, x):
        out, _, _ = llama_block(blk, x[None], cfg, cos, sin, mask)
        return None, out[0]

    _, outs = jax.lax.scan(step, None, inps)
    return outs


# --- OPT family (fc1/fc2 MLP, LayerNorm, learned positions) ---


@partial(jax.jit, static_argnames=("cfg",))
def _opt_embed_tokens(embed, embed_pos, tokens, cfg, project_in=None):
    from qeft_tpu.models.opt import _POS_OFFSET

    s = tokens.shape[1]
    pos = jnp.arange(s) + _POS_OFFSET
    x = jnp.take(embed, tokens, axis=0)
    if project_in is not None:  # opt-350m narrow embedding space
        x = x.astype(project_in.dtype) @ project_in
    return x + jnp.take(embed_pos, pos, axis=0)[None]


@partial(jax.jit, static_argnames=("cfg", "stages"))
def opt_block_hessians(blk, inps, cfg, stages=_ALL_STAGES):
    from qeft_tpu.models.opt import opt_block

    n, s, d = inps.shape
    mask = _causal_mask(s)
    widths = _stage_widths(cfg, cfg.ffn_dim)
    prec = _hessian_precision()

    def step(carry, x):
        out, _, cap = opt_block(blk, x[None], cfg, mask, capture=True)

        def acc(h, a):
            flat = a.reshape(-1, a.shape[-1]).astype(jnp.float32)
            return h + jnp.matmul(flat.T, flat, precision=prec)

        return tuple(
            acc(h, cap[_STAGE_CAP[st]]) for h, st in zip(carry, stages)
        ), out[0]

    init = tuple(jnp.zeros((widths[st], widths[st]), jnp.float32) for st in stages)
    hs, outs = jax.lax.scan(step, init, inps)
    return outs, dict(zip(stages, hs))


@partial(jax.jit, static_argnames=("cfg",))
def opt_block_forward_batch(blk, inps, cfg):
    from qeft_tpu.models.opt import opt_block

    n, s, d = inps.shape
    mask = _causal_mask(s)

    def step(_, x):
        return None, opt_block(blk, x[None], cfg, mask)[0][0]

    _, outs = jax.lax.scan(step, None, inps)
    return outs


def _generic_block_ops(block_fwd, ffn_of):
    """Build (hessians_fn, forward_fn) from a family's full-sequence
    ``pipeline_block_forward(blk, x, cfg, capture)`` (phi/bloom/falcon; llama
    and opt keep their hand-specialized scans above).

    ``ffn_of(cfg)`` names the ffn2-stage input width (intermediate/ffn dim).
    """

    @partial(jax.jit, static_argnames=("cfg", "stages"))
    def hess_fn(blk, inps, cfg, stages=_ALL_STAGES):
        widths = _stage_widths(cfg, ffn_of(cfg))
        prec = _hessian_precision()

        def step(carry, x):
            out, cap = block_fwd(blk, x[None], cfg, capture=True)

            def acc(h, a):
                flat = a.reshape(-1, a.shape[-1]).astype(jnp.float32)
                return h + jnp.matmul(flat.T, flat, precision=prec)

            return tuple(
                acc(h, cap[_STAGE_CAP[st]]) for h, st in zip(carry, stages)
            ), out[0]

        init = tuple(
            jnp.zeros((widths[st], widths[st]), jnp.float32) for st in stages
        )
        hs, outs = jax.lax.scan(step, init, inps)
        return outs, dict(zip(stages, hs))

    @partial(jax.jit, static_argnames=("cfg",))
    def fwd_fn(blk, inps, cfg):
        def step(_, x):
            return None, block_fwd(blk, x[None], cfg)[0][0]

        _, outs = jax.lax.scan(step, None, inps)
        return outs

    return hess_fn, fwd_fn


def _plain_embed(params, tokens, cfg):
    return _embed_tokens(jnp.asarray(params["embed"]), tokens, cfg)


def _bloom_embed(params, tokens, cfg):
    from qeft_tpu.models.bloom import layer_norm

    x = _embed_tokens(jnp.asarray(params["embed"]), tokens, cfg)
    return layer_norm(
        x, jnp.asarray(params["embed_ln"]), jnp.asarray(params["embed_ln_b"]),
        cfg.layer_norm_eps,
    )


_FAMILY_OPS_CACHE: Dict = {}


def _family_ops(meta: ModelMeta):
    """(embed_fn(params, tokens, cfg), hessians_fn, forward_fn) per family.
    Memoized so the generic families reuse one jit cache per process."""
    if meta.family in _FAMILY_OPS_CACHE:
        return _FAMILY_OPS_CACHE[meta.family]
    ops = _family_ops_build(meta)
    _FAMILY_OPS_CACHE[meta.family] = ops
    return ops


def _family_ops_build(meta: ModelMeta):
    if meta.family == "opt":
        return (
            lambda params, tokens, cfg: _opt_embed_tokens(
                jnp.asarray(params["embed"]), jnp.asarray(params["embed_pos"]),
                tokens, cfg,
                project_in=(
                    jnp.asarray(params["project_in"])
                    if "project_in" in params else None
                ),
            ),
            opt_block_hessians,
            opt_block_forward_batch,
        )
    if meta.family == "phi":
        from qeft_tpu.models import phi as phi_mod

        hess, fwd = _generic_block_ops(
            phi_mod.pipeline_block_forward, lambda cfg: cfg.intermediate_size
        )
        return _plain_embed, hess, fwd
    if meta.family == "bloom":
        from qeft_tpu.models import bloom as bloom_mod

        hess, fwd = _generic_block_ops(
            bloom_mod.pipeline_block_forward, lambda cfg: cfg.ffn_dim
        )
        return _bloom_embed, hess, fwd
    if meta.family == "falcon":
        from qeft_tpu.models import falcon as falcon_mod

        hess, fwd = _generic_block_ops(
            falcon_mod.pipeline_block_forward, lambda cfg: cfg.ffn_dim
        )
        return _plain_embed, hess, fwd
    return (
        _plain_embed,
        block_hessians,
        block_forward_batch,
    )


def _stage_of(meta: ModelMeta, name: str) -> str:
    if name in meta.qkv:
        return "qkv"
    if name in meta.out:
        return "out"
    if name in meta.ffn1:
        return "ffn1"
    if name in meta.ffn2:
        return "ffn2"
    raise KeyError(name)


def _n_out_dict(params, meta: ModelMeta, args: QuantizeArgs, cfg: LlamaConfig) -> Dict[str, int]:
    """Per-layer outlier budget (reference extract_outidx.py:82-99)."""
    if args.owq_layers is not None:
        unknown = set(args.owq_layers) - set(meta.all_linears)
        if unknown:
            raise ValueError(
                f"unknown --layers {sorted(unknown)}; "
                f"available: {list(meta.all_linears)}"
            )
        selected = [l for l in meta.all_linears if l in args.owq_layers]
    else:
        selected = list(meta.all_linears)

    n_out = {l: 0 for l in meta.all_linears}
    if args.target_bit is not None:
        wbits = args.spec.bits
        # the average-bits budget is spread over the SELECTED layers only
        # (reference: r /= n_owq_layers = sum(owq_layers.values()))
        r = (12 / (16 - wbits)) * (args.target_bit - wbits) / len(selected)
        blk0 = jax.tree.map(lambda a: a[0], params["layers"])
        for l in selected:
            k_in = blk0[l].shape[0]
            n = round(k_in * r * meta.ratios[l])
            if n % 2 == 1:
                n += 1
            n_out[l] = n
    elif args.target_rank is not None:
        for l in selected:
            n_out[l] = args.target_rank
    return n_out


# ---------------------------------------------------------------------------
# OGR step 1: global outlier index extraction


def extract_global_outidx(
    params: Dict,
    calib_tokens: np.ndarray,
    cfg: LlamaConfig,
    meta: ModelMeta,
    args: QuantizeArgs,
) -> Tuple[np.ndarray, Dict]:
    """Accumulate residual-stream sensitivity over all blocks; return the
    sorted global top-`target_rank` channels + per-layer out_ids.

    Reference extract_outidx.py:103-179.  Each *layer* in the qkv/ffn1 stages
    contributes H_diag/mean(H_diag) — q,k,v share one Hessian so the qkv stage
    effectively contributes 3x (up/gate 2x), preserved here.
    """
    target_rank = args.target_rank
    if args.perhead is not None:
        target_rank = args.perhead * cfg.num_heads

    tokens = jnp.asarray(calib_tokens)
    embed_fn, hess_fn, _ = _family_ops(meta)
    inps = embed_fn(params, tokens, cfg)
    n_layers = cfg.num_layers

    sensitivity = jnp.zeros((cfg.hidden_size,), jnp.float32)
    per_layer_out_ids = {}
    n_out = _n_out_dict(params, meta, args, cfg)

    dev = jax.devices()[0] if jax.default_backend() != "cpu" else None
    for i in range(n_layers):
        blk = _block_at(params["layers"], i, dev)
        # extraction only scores the residual-stream stages — skipping the
        # out/ffn2 Hessians halves the pass's device footprint at 7B
        outs, h_sums = hess_fn(blk, inps, cfg, stages=("qkv", "ffn1"))
        for stage, names in (("qkv", meta.qkv), ("ffn1", meta.ffn1)):
            h_diag_base = jnp.diagonal(h_sums[stage]) * (2.0 / args.nsamples)
            for name in names:
                if args.no_frob_norm:
                    h_diag = h_diag_base
                else:
                    w_nk = blk[name].T.astype(jnp.float32)  # [OC, IC]
                    h_diag = h_diag_base * frob_norm_error(w_nk, args.spec, num=30)
                _, out_ids = hessian_sort_ids(h_diag, n_out[name])
                per_layer_out_ids[(i, name)] = np.asarray(out_ids)
                sensitivity = sensitivity + h_diag / jnp.mean(h_diag)
        inps = outs
        print(f"extract: block {i + 1}/{n_layers}", flush=True)

    _, top = jax.lax.top_k(sensitivity, target_rank)
    outidx = np.sort(np.asarray(top))
    return outidx.astype(np.int32), per_layer_out_ids


# ---------------------------------------------------------------------------
# layerwise GPTQ reconstruction


def quantize_model(
    params: Dict,
    calib_tokens: np.ndarray,
    cfg: LlamaConfig,
    meta: ModelMeta,
    args: QuantizeArgs,
    outidx: Optional[np.ndarray] = None,
) -> Tuple[Dict, Dict]:
    """Layerwise GPTQ-OWQ over every decoder block (reference main.py:18-193).

    Returns (new_params, quantizers).  With ``args.reorder`` the returned
    params are globally reordered (OGR step 2) and each block carries
    ``o_reorder`` ids for the runtime o_proj input gather.
    """
    if args.reorder:
        assert outidx is not None, "global reorder needs the extracted outidx"
        # family-generic, like the reference's make_reorder
        # (/root/reference/qeft/reorder.py:148-176): the residual-stream
        # permutation is exact for RMSNorm AND LayerNorm models (both are
        # elementwise after permutation-invariant statistics), for bloom's
        # embedding LayerNorm (permuted with the stream), for falcon's
        # parallel-residual block (qkv and fc1 share the permuted ln(x)),
        # and for ALiBi (a head-space score bias, untouched by a
        # hidden-dim permutation) — tested per family in test_pipeline.py
    spec = args.spec
    tokens = jnp.asarray(calib_tokens)
    embed_fn, hess_fn, fwd_fn = _family_ops(meta)
    inps = embed_fn(params, tokens, cfg)
    n_out = _n_out_dict(params, meta, args, cfg)
    global_out = None if outidx is None else jnp.asarray(outidx, jnp.int32)

    quantizers: Dict = {}
    new_blocks = []
    # MSE grid density per group re-fit: reference uses num=40 inside the GPTQ
    # group loop (recon.py:540), num=1 in the RTN-reorder loop (recon.py:363),
    # and the find_params default (100) for the single whole-row group
    if args.rtn:
        num_groups = 1
    elif spec.group_size <= 0:
        num_groups = 100
    else:
        num_groups = 40

    # with true_sequential, later stages see activations produced by the
    # already-quantized earlier stages of the same block (reference
    # main.py:102-105 runs the capture per stage group)
    stage_order = (
        [(meta.qkv, ("qkv",)), (meta.out, ("out",)),
         (meta.ffn1, ("ffn1",)), (meta.ffn2, ("ffn2",))]
        if args.true_sequential
        else [(meta.all_linears, _ALL_STAGES)]
    )

    # layer streaming: the full model never needs to fit on device (reference
    # streams blocks CPU<->GPU, main.py:99,180); results land host-side
    dev = jax.devices()[0] if jax.default_backend() != "cpu" else None

    for i in range(cfg.num_layers):
        blk = _block_at(params["layers"], i, dev)

        new_blk = dict(blk)
        h_sums = None
        for stage_names, stage_keys in stage_order:
            # recompute Hessians against the partially-quantized block — but
            # ONLY this group's stage (the [F, F] ffn2 sum alone is ~0.5 GB
            # at 7B; rebuilding all four per group quadruples the cost)
            if args.true_sequential or h_sums is None:
                _, h_sums = hess_fn(new_blk, inps, cfg, stages=stage_keys)
            for name in stage_names:
                _quantize_one(
                    name, blk, new_blk, h_sums, quantizers, i, meta, args,
                    global_out, n_out, num_groups, spec,
                )

        # propagate quantized-block outputs to the next block
        inps = fwd_fn(new_blk, inps, cfg)
        if dev is not None:
            # write into preallocated host arrays — no per-block dict pileup
            # (a 7B run is ~27 GB of fp32 fake weights; duplicating the tree
            # once already OOM-killed a 125 GB host)
            if not new_blocks:
                new_blocks = {
                    k: np.empty((cfg.num_layers,) + v.shape, np.asarray(v).dtype)
                    for k, v in new_blk.items()
                }
            for k, v in new_blk.items():
                new_blocks[k][i] = np.asarray(v)
            for name in meta.all_linears:  # move this block's states host-side
                quantizers[(i, name)] = _to_host(quantizers[(i, name)])
            print(f"quantize: block {i + 1}/{cfg.num_layers}", flush=True)
        else:
            new_blocks.append(new_blk)

    new_params = dict(params)
    if dev is not None:
        new_params["layers"] = new_blocks
    else:
        new_params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *new_blocks)

    if args.reorder:
        if dev is not None:
            new_params = reorder_model_host(new_params, quantizers, global_out, cfg, meta)
        else:
            new_params = reorder_model(new_params, quantizers, global_out, cfg, meta)
    return new_params, quantizers


def _quantize_one(
    name, blk, new_blk, h_sums, quantizers, i, meta, args, global_out, n_out,
    num_groups, spec,
):
    """GPTQ one linear of block ``i``; writes the fake weight into ``new_blk``
    and the quantizer state into ``quantizers``."""
    stage = _stage_of(meta, name)
    h = h_sums[stage] * (2.0 / args.nsamples)
    w_nk = blk[name].T.astype(jnp.float32)  # [OC, IC]

    is_global = args.reorder and name in meta.global_outlier_linears
    # frob-norm weighting: with reorder only the per-layer stages use it
    # (reference main.py:131); without reorder all layers do.
    use_frob = not args.no_frob_norm and (not args.reorder or not is_global)
    frob = frob_norm_error(w_nk, spec, num=40) if use_frob else None

    h_diag = jnp.diagonal(h)
    ids, out_ids = hessian_sort_ids(
        h_diag,
        n_out[name],
        frob_norm=frob,
        outidx=global_out if is_global else None,
        actorder=args.act_order,
    )
    res: LayerQuantResult = gptq_quantize(
        w_nk, h, spec, ids, out_ids,
        percdamp=args.percdamp, num=num_groups, rtn=args.rtn,
    )
    new_blk[name] = res.w_fake.T.astype(blk[name].dtype)  # back to [K, N]
    quantizers[(i, name)] = QuantizerState(
        scale_group=res.scale_group,
        zero_group=res.zero_group,
        out_ids=res.out_ids,
        sym=spec.sym,
        bits=spec.bits,
        group_size=spec.group_size,
        # under --act_order the group params are aligned to the sensitivity
        # permutation, not the canonical outliers-last order — packing must
        # permute rows by the same ids (reference has the same latent
        # mismatch: recon.py:82-89 self.ids vs reorder.py:6-12 layout)
        perm_ids=ids.astype(jnp.int32) if args.act_order else None,
    )


# ---------------------------------------------------------------------------
# OGR step 2: global static reorder


def reorder_model(
    params: Dict,
    quantizers: Dict,
    global_out: jax.Array,
    cfg: LlamaConfig,
    meta: ModelMeta,
) -> Dict:
    """Statically permute the whole model so outlier channels are last.

    Reference reorder.py:148-176 (make_reorder).  Permutations:
    - residual stream (dim D): embed cols, final_ln, lm_head rows, per-block
      lns, qkv/ffn1 input rows, o/ffn2 output cols — by the GLOBAL dense ids.
    - MLP internal dim (F): ffn1 output cols + ffn2 input rows — by ffn2's
      per-layer dense ids.
    - o input (head space, dim H*Dh): statically permuted by o's per-layer
      dense ids; the runtime input gather ids are stored as blk['o_reorder'].
    RMSNorm models make the residual permutation exact (norm is elementwise
    after a permutation-invariant reduction); LayerNorm (OPT) too, since the
    mean/variance are permutation-invariant.  Everything that WRITES into the
    residual stream permutes with it: positional embeddings and the o/ffn2
    output biases (reference reorder.py:14-24 handles embed_positions the
    same way for OPT).
    """
    if "project_in" in params:
        raise ValueError(
            "global reorder is not supported for models whose residual "
            "stream passes through embedding projections (opt-350m "
            "project_in/out): the token-embedding space and the hidden "
            "stream have different widths.  (The reference's reorder_embeds "
            "permutes project_in's INPUT dim, reorder.py:14-24, which does "
            "not permute the stream either.)  Quantize without --reorder "
            "(per-layer outlier path)."
        )
    d = cfg.hidden_size
    g_ids = sparse_to_dense_ids(global_out, d)  # [D]

    new = dict(params)
    new["embed"] = jnp.take(params["embed"], g_ids, axis=1)
    new["final_ln"] = jnp.take(params["final_ln"], g_ids, axis=0)
    new["lm_head"] = jnp.take(params["lm_head"], g_ids, axis=0)
    if "embed_pos" in params:  # OPT learned positions live in the stream
        new["embed_pos"] = jnp.take(params["embed_pos"], g_ids, axis=1)
    if "final_ln_b" in params:
        new["final_ln_b"] = jnp.take(params["final_ln_b"], g_ids, axis=0)
    for k in ("embed_ln", "embed_ln_b"):  # bloom's post-embedding LayerNorm
        if k in params:
            new[k] = jnp.take(params[k], g_ids, axis=0)

    (o_name,) = meta.out
    (f2_name,) = meta.ffn2

    new_blocks = []
    for i in range(cfg.num_layers):
        blk = {k: v[i] for k, v in params["layers"].items() if k != "o_reorder"}
        nb = dict(blk)

        def perm_if_present(name, ids, axis=0):
            if name in blk:
                nb[name] = jnp.take(nb[name], ids, axis=axis)

        # residual-stream inputs + norms (+ LN biases)
        for name in meta.qkv + meta.ffn1:
            nb[name] = jnp.take(blk[name], g_ids, axis=0)
        for ln in meta.ln:
            if ln not in blk:  # e.g. falcon mlp_ln (new-arch only)
                continue
            nb[ln] = jnp.take(blk[ln], g_ids, axis=0)
            perm_if_present(ln + "_b", g_ids)

        # o: static input permutation (head space) + runtime gather ids
        o_state: QuantizerState = quantizers[(i, o_name)]
        o_ids = sparse_to_dense_ids(o_state.out_ids, blk[o_name].shape[0])
        nb[o_name] = jnp.take(blk[o_name], o_ids, axis=0)
        nb["o_reorder"] = o_ids.astype(jnp.int32)
        # o output cols (+ bias) -> global ids; its scale rows too
        nb[o_name] = jnp.take(nb[o_name], g_ids, axis=1)
        perm_if_present(o_name + "_b", g_ids)
        _permute_state_rows(quantizers, (i, o_name), g_ids)

        # MLP internal dim: ffn1 out cols (+ biases) / ffn2 in rows by ffn2's ids
        f2_state: QuantizerState = quantizers[(i, f2_name)]
        f_ids = sparse_to_dense_ids(f2_state.out_ids, blk[f2_name].shape[0])
        for name in meta.ffn1:
            nb[name] = jnp.take(nb[name], f_ids, axis=1)
            perm_if_present(name + "_b", f_ids)
            _permute_state_rows(quantizers, (i, name), f_ids)
        nb[f2_name] = jnp.take(blk[f2_name], f_ids, axis=0)
        # ffn2 out cols (+ bias) -> global ids
        nb[f2_name] = jnp.take(nb[f2_name], g_ids, axis=1)
        perm_if_present(f2_name + "_b", g_ids)
        _permute_state_rows(quantizers, (i, f2_name), g_ids)

        new_blocks.append(nb)

    new["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *new_blocks)
    return new


def reorder_model_host(
    params: Dict,
    quantizers: Dict,
    global_out,
    cfg: LlamaConfig,
    meta: ModelMeta,
) -> Dict:
    """Memory-lean host-side OGR pass: same permutations as `reorder_model`,
    applied leaf-by-leaf, layer-by-layer on numpy arrays (peak overhead = one
    [K, N] temporary instead of duplicating the whole multi-GB tree)."""
    import numpy as _np

    if "project_in" in params:
        raise ValueError(
            "global reorder is not supported with embedding projections "
            "(opt-350m); see reorder_model"
        )
    d = cfg.hidden_size
    go = _np.asarray(global_out)
    mask = _np.ones((d,), bool)
    mask[go] = False
    g_ids = _np.concatenate([_np.arange(d)[mask], go]).astype(_np.int64)

    def dense_ids(sparse, length):
        m = _np.ones((length,), bool)
        m[_np.asarray(sparse)] = False
        return _np.concatenate([_np.arange(length)[m], _np.asarray(sparse)]).astype(_np.int64)

    new = dict(params)
    new["embed"] = _np.ascontiguousarray(_np.asarray(params["embed"])[:, g_ids])
    new["final_ln"] = _np.asarray(params["final_ln"])[g_ids]
    new["lm_head"] = _np.ascontiguousarray(_np.asarray(params["lm_head"])[g_ids, :])
    if "embed_pos" in params:
        new["embed_pos"] = _np.ascontiguousarray(_np.asarray(params["embed_pos"])[:, g_ids])
    if "final_ln_b" in params:
        new["final_ln_b"] = _np.asarray(params["final_ln_b"])[g_ids]
    for k in ("embed_ln", "embed_ln_b"):  # bloom's post-embedding LayerNorm
        if k in params:
            new[k] = _np.asarray(params[k])[g_ids]

    def writable(v):
        a = _np.asarray(v)
        return a if a.flags.writeable else a.copy()

    layers = {k: writable(v) for k, v in params["layers"].items() if k != "o_reorder"}
    (o_name,) = meta.out
    (f2_name,) = meta.ffn2
    o_reorder = _np.empty((cfg.num_layers, layers[o_name].shape[1]), _np.int32)

    def perm_state(key, ids):
        st: QuantizerState = quantizers[key]
        quantizers[key] = QuantizerState(
            scale_group=_np.asarray(st.scale_group)[ids],
            zero_group=_np.asarray(st.zero_group)[ids],
            out_ids=st.out_ids, sym=st.sym, bits=st.bits, group_size=st.group_size,
        )

    def perm_vec(name, i, ids):
        if name in layers:
            layers[name][i] = layers[name][i][ids]

    for i in range(cfg.num_layers):
        for name in meta.qkv + meta.ffn1:
            layers[name][i] = layers[name][i][g_ids, :]
        for ln in meta.ln:
            if ln not in layers:  # e.g. falcon mlp_ln (new-arch only)
                continue
            layers[ln][i] = layers[ln][i][g_ids]
            perm_vec(ln + "_b", i, g_ids)

        o_state: QuantizerState = quantizers[(i, o_name)]
        o_ids = dense_ids(o_state.out_ids, layers[o_name].shape[1])
        layers[o_name][i] = layers[o_name][i][o_ids, :][:, g_ids]
        perm_vec(o_name + "_b", i, g_ids)
        o_reorder[i] = o_ids
        perm_state((i, o_name), g_ids)

        f2_state: QuantizerState = quantizers[(i, f2_name)]
        f_ids = dense_ids(f2_state.out_ids, layers[f2_name].shape[1])
        for name in meta.ffn1:
            layers[name][i] = layers[name][i][:, f_ids]
            perm_vec(name + "_b", i, f_ids)
            perm_state((i, name), f_ids)
        layers[f2_name][i] = layers[f2_name][i][f_ids, :][:, g_ids]
        perm_vec(f2_name + "_b", i, g_ids)
        perm_state((i, f2_name), g_ids)

    layers["o_reorder"] = o_reorder
    new["layers"] = layers
    return new


def _permute_state_rows(quantizers: Dict, key, ids: jax.Array):
    st: QuantizerState = quantizers[key]
    quantizers[key] = QuantizerState(
        scale_group=jnp.take(st.scale_group, ids, axis=0),
        zero_group=jnp.take(st.zero_group, ids, axis=0),
        out_ids=st.out_ids,
        sym=st.sym,
        bits=st.bits,
        group_size=st.group_size,
    )


# ---------------------------------------------------------------------------
# packing


def rtn_pack_linear(
    w_kn: jax.Array, bits: int = 4, group_size: int = 128, dtype=jnp.bfloat16
):
    """RTN-quantize a dense [K, N] linear into packed form (no outliers, no
    Hessian).  Used for the lm_head: the reference streams it in fp16, but on
    TPU its ~0.26 GB/token (7B) is ~6%% of decode HBM traffic — int4+scales
    cuts that ~7x with a per-group minmax fit."""
    from qeft_tpu.ops.packing import pack_layer
    from qeft_tpu.quant.quantizer import QuantSpec, find_params

    k, n = w_kn.shape
    g = group_size if group_size > 0 else k
    assert k % g == 0
    n_groups = k // g
    spec = QuantSpec(bits=bits, sym=False, mse=False, group_size=g)
    # rows for find_params: one per (out-channel, group) slice of length g
    rows = w_kn.reshape(n_groups, g, n).transpose(2, 0, 1).reshape(n * n_groups, g)
    qp = find_params(rows.astype(jnp.float32), spec)
    scale_group = qp.scale.reshape(n, n_groups)
    zero_group = qp.zero.reshape(n, n_groups)
    return pack_layer(
        w_kn, scale_group, zero_group, n_outlier=0, group_size=g,
        sym=False, bits=bits, dtype=dtype,
    )


def _fuse_stage(nb: Dict, names, fused_name: str):
    """Concatenate same-stage packed linears along N (valid under OGR: all
    stage members share the input permutation and group layout).

    Every QLinearParams field carries N on its LAST axis (bias [N] included),
    so axis=-1 fuses both per-block and [L, ...]-stacked layouts.
    """
    import dataclasses as _dc

    lins = [nb.pop(n) for n in names]
    assert all(l.reorder_ids is None for l in lins), (
        "stage fusion requires a statically reordered model (shared input "
        "permutation); per-linear input gathers cannot be fused"
    )
    nb[fused_name] = _dc.replace(
        lins[0],
        qweight=jnp.concatenate([l.qweight for l in lins], axis=-1),
        scales=jnp.concatenate([l.scales for l in lins], axis=-1),
        scaled_zeros=jnp.concatenate([l.scaled_zeros for l in lins], axis=-1),
        oweight=(
            jnp.concatenate([l.oweight for l in lins], axis=-1)
            if lins[0].oweight is not None
            else None
        ),
        bias=(
            jnp.concatenate([l.bias for l in lins], axis=-1)
            if lins[0].bias is not None
            else None
        ),
    )


def _pad_upgate_enabled() -> bool:
    """Pad each half of the fused upgate to a 1024-column multiple so the
    decode matvec's `_auto_bn` can pick bn=1024 (7B upgate is N=2x11008;
    22016 has no 1024 divisor, so it runs bn=512 at 568 GB/s-int4 where the
    qkv stage reaches 631 at bn=1024 — gemv ablation probe, BASELINE.md
    round 3).  Default ON since the round-4 on-chip A/B on the real pipeline
    checkpoint: 108.92 tok/s padded vs 106.69 unpadded (+2.1%, the +1% extra
    zero-pad bytes included).  QEFT_PAD_UPGATE=0 restores unpadded loads;
    the TP shard path unpads automatically (tp_shard_packed_params)."""
    import os

    return os.environ.get("QEFT_PAD_UPGATE", "1") not in ("0", "", "false")


def pad_upgate_halves(lin, multiple: int = 1024):
    """Pad EACH half of a fused [up | gate] packed linear along N up to
    ``multiple`` — layout becomes [up | 0pad | gate | 0pad], so the model's
    half-split stays a static slice (models/llama._split_upgate drops the
    pad).  Zero-padding is exact: pad codes 0 x pad scales 0 + pad
    scaled_zeros 0 -> pad output columns are exactly 0 and are never read."""
    f = lin.out_features // 2
    f_pad = -(-f // multiple) * multiple
    if f_pad == f:
        return lin

    def padh(a):
        if a is None:
            return None
        widths = [(0, 0)] * (a.ndim - 1) + [(0, f_pad - f)]
        return jnp.concatenate(
            [jnp.pad(a[..., :f], widths), jnp.pad(a[..., f:], widths)],
            axis=-1,
        )

    return dataclasses.replace(
        lin, qweight=padh(lin.qweight), scales=padh(lin.scales),
        scaled_zeros=padh(lin.scaled_zeros), oweight=padh(lin.oweight),
        bias=padh(lin.bias),
    )


def unpad_upgate_halves(lin, intermediate_size: int):
    """Inverse of `pad_upgate_halves`: slice a [up | 0pad | gate | 0pad]
    fused linear back to [up | gate].  The TP shard path needs unpadded
    halves (its column-interleave permutation assumes N = 2*intermediate)."""
    f = intermediate_size
    f_pad = lin.out_features // 2
    if f_pad == f:
        return lin

    def cuth(a):
        if a is None:
            return None
        return jnp.concatenate(
            [a[..., :f], a[..., f_pad : f_pad + f]], axis=-1
        )

    return dataclasses.replace(
        lin, qweight=cuth(lin.qweight), scales=cuth(lin.scales),
        scaled_zeros=cuth(lin.scaled_zeros), oweight=cuth(lin.oweight),
        bias=cuth(lin.bias),
    )


def fuse_packed_stages(params: Dict, meta: ModelMeta) -> Dict:
    """Post-pack stage fusion on a loaded (stacked) packed model: q/k/v ->
    'qkv', up/gate -> 'upgate'.  Same math as pack_model(fuse_stages=True);
    lets a checkpoint saved unfused serve through the fused fast path."""
    layers = dict(params["layers"])
    if meta.family in ("llama", "gemma") and len(meta.qkv) == 3 and all(
        n in layers for n in meta.qkv
    ):
        _fuse_stage(layers, meta.qkv, "qkv")
    if len(meta.ffn1) == 2 and all(n in layers for n in meta.ffn1):
        _fuse_stage(layers, meta.ffn1, "upgate")
        if _pad_upgate_enabled():
            layers["upgate"] = pad_upgate_halves(layers["upgate"])
    out = {**params, "layers": layers}
    # banded o-permutation operands (ops/permute.py): the OGR o gather as MXU
    # one-hot dots — 0.28 vs 1.15 ms/token on the 7B decode chain
    from qeft_tpu.ops.permute import attach_o_band

    return attach_o_band(out, o_name=meta.out[0])


def pack_model(
    params: Dict,
    quantizers: Dict,
    cfg: LlamaConfig,
    meta: ModelMeta,
    dtype=jnp.bfloat16,
    fuse_stages: bool = False,
) -> Dict:
    """Swap every quantized linear for its packed QLinearParams.

    ``params`` must be the REORDERED fake-quantized pytree from
    `quantize_model(..., reorder=True)`: every quantized linear's K dim
    already has its outliers contiguous at the end.

    ``fuse_stages``: concatenate q/k/v -> 'qkv' and up/gate -> 'upgate' into
    single packed linears (fewer, larger kernel invocations; the model forward
    splits the outputs).  Requires reorder (shared input permutations).
    """
    def cast_float(v):
        return v.astype(dtype) if jnp.issubdtype(np.asarray(v).dtype, np.floating) else v

    new = {k: (v if k == "layers" else cast_float(v)) for k, v in params.items()}

    # a globally-reordered model always carries the o_proj runtime gather; a
    # non-reordered one (per-layer outliers, e.g. bloom/falcon) keeps its fake
    # weights in ORIGINAL column order, so each packed linear gets its own
    # sorted layout + input-gather ids (reference forward_outlier's
    # outlieridx index_select, qlinear.py:244-263)
    reordered = "o_reorder" in params["layers"]

    new_blocks = []
    dev = jax.devices()[0] if jax.default_backend() != "cpu" else None
    for i in range(cfg.num_layers):
        blk = _block_at(params["layers"], i, dev)
        # cast every non-linear float leaf (norms, biases, OPT extras)
        nb = {
            k: (v if k in meta.all_linears else cast_float(v))
            for k, v in blk.items()
        }
        for name in meta.all_linears:
            st: QuantizerState = quantizers[(i, name)]
            w_kn = jnp.asarray(blk[name])  # [K, N]
            k_in = w_kn.shape[0]
            group = st.group_size if st.group_size > 0 else k_in
            reorder_ids = None
            if st.perm_ids is not None:
                if reordered:
                    raise ValueError(
                        "--act_order quantization cannot be packed with the "
                        "static global reorder: group params follow the "
                        "per-layer sensitivity permutation, not the shared "
                        "residual-stream layout. Pack without --reorder (per-"
                        "layer input gathers) or quantize without --act_order."
                    )
                # group params are aligned to the act-order permutation
                reorder_ids = jnp.asarray(st.perm_ids, dtype=jnp.int32)
                w_kn = jnp.take(w_kn, reorder_ids, axis=0)
            elif not reordered and int(st.out_ids.shape[0]) > 0:
                # permute rows into the sorted (outliers-last) layout the
                # quantizer states describe; runtime gathers the input to match
                reorder_ids = sparse_to_dense_ids(
                    jnp.asarray(st.out_ids), k_in
                ).astype(jnp.int32)
                w_kn = jnp.take(w_kn, reorder_ids, axis=0)
            nb[name] = pack_layer(
                w_kn,
                st.scale_group,
                st.zero_group,
                n_outlier=int(st.out_ids.shape[0]),
                group_size=group,
                sym=st.sym,
                bits=st.bits,
                dtype=dtype,
            )
            if reorder_ids is not None:
                nb[name] = dataclasses.replace(nb[name], reorder_ids=reorder_ids)
        if fuse_stages:
            # llama/gemma share the block that understands fused 'qkv'/'upgate'
            fusable_qkv = meta.family in ("llama", "gemma") and len(meta.qkv) == 3
            if not fusable_qkv and len(meta.ffn1) != 2:
                raise ValueError(
                    f"fuse_stages: family {meta.family!r} has no fusable "
                    "stages (its qkv is already a single linear and its "
                    "ffn1 is unary)"
                )
            if fusable_qkv:
                _fuse_stage(nb, meta.qkv, "qkv")
            if len(meta.ffn1) == 2:
                _fuse_stage(nb, meta.ffn1, "upgate")
        new_blocks.append(_to_host(nb) if dev is not None else nb)
    # QLinearParams are registered pytrees: stacking descends into their
    # array leaves, producing scan-ready [L, ...] stacked packed layers
    # (host-resident when streaming; device_put the result before serving)
    stack = _stack_host if dev is not None else (
        lambda blocks: jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    )
    new["layers"] = stack(new_blocks)
    return new
