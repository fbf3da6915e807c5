"""TPU-native INT4 packing for the mixed-precision QuantizedLinear.

Layout contract (the single source of truth — the Pallas kernels and the XLA
fallback both unpack through `unpack_codes`):

- Integer codes live in ``[K, N]`` orientation (K = in-features, N = out-features,
  so activations multiply as ``y = x @ W``).
- Eight codes pack into one **int32** along K with **plane striding**: within
  each quantization group of ``g`` K-rows (g % 8 == 0, plane height
  ``h = g/8``), packed word ``jj`` of group ``gi`` holds code
  ``gi*g + p*h + jj`` in nibble ``p``.  Word rows are **group-interleaved**:

      packed[jj*G + gi, n] = sum_p code[gi*g + p*h + jj, n] << 4p   (G = K/g)

  so packed word row ``r`` belongs to group ``r % G``.

  Rationale: Mosaic TPU has no native sub-32-bit integer->float path (uint8
  loads relayout through uint32, killing VPU throughput), but int32 shifts /
  masks and int32->f32 converts are single native ops in 32-bit lanes.  Each
  nibble plane unpacks with one shift+mask+convert, and planes are contiguous
  K-slabs per group, so activations rearranged to plane-major order contract
  against each plane in one big MXU dot — no element shuffles.  The
  group-INTERLEAVE (row -> group r % G, not r // h) exists so the in-kernel
  [K/8, N]-scale expansion is one `pltpu.repeat` (tpu.repeat tiles whole
  arrays) instead of a [K/8, G] x [G, BN] f32 MXU selection dot whose cost
  rivals the decode matvec itself (on-chip A/B: 95.2 -> 99.9 tok/s).
- ``scales``/``scaled_zeros`` are ``[G, N]`` with ``G = K // g`` and
  ``w = code * scale + scaled_zero`` (``scaled_zero = -zero*scale``, matching
  the reference convention, /root/reference/qeft/qlinear.py:192-208).
- The last ``r`` K-rows are the outlier ("weak") columns: their codes are set
  to the zero-point so the dense INT4 product contributes exactly zero there
  (reference qlinear.py:200-202); their full-precision values live in
  ``oweight [r, N]`` — the contiguous trainable slab for WCT fine-tuning.

This deliberately replaces the reference's AWQ tensor-core interleave
(qlinear.py:81-121), which encodes CUDA ldmatrix/mma lane mapping and is
meaningless on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QLinearParams:
    """Parameter pytree of one packed mixed-precision linear."""

    qweight: jax.Array  # int32 [K//8, N]
    scales: jax.Array  # [G, N]
    scaled_zeros: jax.Array  # [G, N]
    oweight: Optional[jax.Array] = None  # [r, N] or None
    bias: Optional[jax.Array] = None  # [N] or None
    # input-gather ids [K] for linears packed WITHOUT a static model reorder
    # (per-layer outliers, reference `forward_outlier`'s outlieridx path,
    # qlinear.py:244-263): the packed weight rows live in sorted
    # (outliers-last) order and the activation is gathered to match
    reorder_ids: Optional[jax.Array] = None
    group_size: int = dataclasses.field(default=128)

    @property
    def in_features(self) -> int:
        return self.qweight.shape[-2] * 8

    def layer_view(self, l) -> "StackedLinear":
        """View of layer ``l`` of STACKED [L, ...] leaves (see StackedLinear)."""
        return StackedLinear(self, l)

    @property
    def out_features(self) -> int:
        return self.qweight.shape[-1]

    @property
    def n_outlier(self) -> int:
        return 0 if self.oweight is None else self.oweight.shape[-2]

    def tree_flatten(self):
        children = (self.qweight, self.scales, self.scaled_zeros, self.oweight,
                    self.bias, self.reorder_ids)
        return children, (self.group_size,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, group_size=aux[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StackedLinear:
    """One layer of a STACKED [L, ...] QLinearParams, selected by a (traced)
    index — WITHOUT slicing the packed planes.

    The decode loop scans over layers; slicing each layer's weights out of
    the stacked leaves materializes a copy of the packed planes (extra HBM
    read+write the kernel then re-reads — scripts/scan_copy_probe.py measures
    the cost).  A StackedLinear defers the layer select to the kernel's
    scalar-prefetched BlockSpec index map (`qgemv_stacked`), so the int4
    planes are DMA'd straight out of the stacked buffer.  Small leaves
    (outlier slab, bias) are sliced normally."""

    params: "QLinearParams"  # stacked [L, ...] leaves
    idx: jax.Array  # scalar int32 layer index

    def tree_flatten(self):
        return (self.params, self.idx), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _resolve_group(k: int, group_size: int) -> int:
    g = group_size if group_size > 0 else k
    assert g % 8 == 0 and k % g == 0, (k, group_size)
    return g


def pack_codes(codes: jax.Array, group_size: int) -> jax.Array:
    """[K, N] int codes (0..15) -> int32 [K//8, N] per the plane contract."""
    k, n = codes.shape
    g = _resolve_group(k, group_size)
    h = g // 8
    c = codes.reshape(k // g, 8, h, n).astype(jnp.int32)  # [G, plane, h, N]
    word = jnp.zeros((k // g, h, n), jnp.int32)
    for p in range(8):
        word = word | (c[:, p] << (4 * p))
    # group-interleave the word rows: row jj*G + gi (see module docstring)
    return word.transpose(1, 0, 2).reshape(k // 8, n)


def unpack_codes(packed: jax.Array, group_size: int) -> jax.Array:
    """int32 [K//8, N] -> [K, N] int32 codes. Exact inverse of `pack_codes`."""
    k8, n = packed.shape
    k = k8 * 8
    g = _resolve_group(k, group_size)
    h = g // 8
    w = packed.reshape(h, k // g, n).transpose(1, 0, 2)  # [G, h, N]
    planes = [(w >> (4 * p)) & 0xF for p in range(8)]  # each [G, h, N]
    return jnp.stack(planes, axis=1).reshape(k, n)


def plane_order_activations(x2d: jax.Array, k: int, group_size: int) -> jax.Array:
    """[M, K] activations -> plane-major order [M, K] matching `pack_codes`.

    Row ``gi*g + p*h + jj`` of the weight pairs with output position
    ``p*(K/8) + jj*G + gi`` so that plane ``p`` occupies the contiguous slice
    ``[p*K/8, (p+1)*K/8)`` in group-interleaved word order.
    """
    m = x2d.shape[0]
    g = _resolve_group(k, group_size)
    h = g // 8
    xg = x2d.reshape(m, k // g, 8, h)  # [M, G, plane, h]
    return xg.transpose(0, 2, 3, 1).reshape(m, k)


def pack_layer(
    w_fake_kn: jax.Array,
    scale_group: jax.Array,
    zero_group: jax.Array,
    n_outlier: int,
    group_size: int,
    sym: bool = False,
    bits: int = 4,
    bias: Optional[jax.Array] = None,
    dtype=jnp.bfloat16,
) -> QLinearParams:
    """Pack one reordered fake-quantized layer into the TPU layout.

    ``w_fake_kn``: [K, N] fake-quantized weight in the reordered (outliers-last
    along K) layout.  ``scale_group``/``zero_group``: [N, G] per-out-channel
    group params from GPTQ (note: quant-side orientation, transposed here).

    Mirrors reference `QuantLinear.pack` (/root/reference/qeft/qlinear.py:180-215):
    sym shifts zeros by 2^(bits-1); outlier rows' codes are overwritten with the
    zero-point; scales/scaled_zeros transpose to [G, N].
    """
    k, n = w_fake_kn.shape
    g = _resolve_group(k, group_size)
    n_groups = k // g
    assert scale_group.shape == (n, n_groups), (scale_group.shape, (n, n_groups))

    zeros = zero_group.astype(jnp.float32)
    if sym:
        zeros = zeros + 2 ** (bits - 1)
    scales = scale_group.astype(jnp.float32)  # [N, G]

    w = w_fake_kn.astype(jnp.float32)
    scales_kn = jnp.repeat(scales.T, g, axis=0)  # [K, N]
    zeros_kn = jnp.repeat(zeros.T, g, axis=0)
    codes = jnp.clip(jnp.round(w / scales_kn + zeros_kn), 0, 2**bits - 1).astype(
        jnp.int32
    )

    if n_outlier > 0:
        # dense matmul must contribute exactly 0 on outlier rows
        out_zeros = zeros_kn[k - n_outlier :, :].astype(jnp.int32)
        codes = codes.at[k - n_outlier :, :].set(out_zeros)

    qweight = pack_codes(codes, group_size)
    scaled_zeros = (-(zeros * scales)).T.astype(dtype)  # [G, N]
    oweight = (
        w_fake_kn[k - n_outlier :, :].astype(dtype) if n_outlier > 0 else None
    )
    return QLinearParams(
        qweight=qweight,
        scales=scales.T.astype(dtype),
        scaled_zeros=scaled_zeros,
        oweight=oweight,
        bias=None if bias is None else bias.astype(dtype),
        group_size=group_size,
    )


def dequantize_weight(p: QLinearParams, dtype=jnp.bfloat16) -> jax.Array:
    """Reconstruct the dense [K, N] weight (outlier rows dequantize to zero)."""
    k = p.in_features
    g = _resolve_group(k, p.group_size)
    codes = unpack_codes(p.qweight, p.group_size).astype(jnp.float32)
    scales = jnp.repeat(p.scales.astype(jnp.float32), g, axis=0)
    szeros = jnp.repeat(p.scaled_zeros.astype(jnp.float32), g, axis=0)
    return (codes * scales + szeros).astype(dtype)


def pack_codes_np(codes: np.ndarray, group_size: int) -> np.ndarray:
    """NumPy twin of `pack_codes` for host-side checkpoint tooling."""
    k, n = codes.shape
    g = group_size if group_size > 0 else k
    h = g // 8
    c = codes.reshape(k // g, 8, h, n).astype(np.int64)
    word = np.zeros((k // g, h, n), np.int64)
    for p in range(8):
        word |= c[:, p] << (4 * p)
    return word.astype(np.int32).transpose(1, 0, 2).reshape(k // 8, n)
