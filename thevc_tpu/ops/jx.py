"""JAX/TPU mirrors of the batched codec ops.

The numpy modules (ops.transforms, ops.intra, ...) are the bit-exact
reference; these JAX versions express the same integer math as batched
matmuls/elementwise ops that XLA tiles onto the MXU/VPU.  Integer exactness
notes (SURVEY.md section 7 hard part d): all normative math stays in int32
with explicit shifts — no float path.

The transform stack maps directly: a 2D integer DCT is two matmuls against
constant bases with rounding shifts between, i.e. exactly the shape the MXU
wants when batched over [N, size, size] TUs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..common.rom import (DCT_MATRICES, DST4, INV_QUANT_SCALES, QUANT_SCALES)
from .transforms import (MAX_TR_DYNAMIC_RANGE, QUANT_IQUANT_SHIFT, QUANT_SHIFT,
                         SHIFT_INV_1ST, SHIFT_INV_2ND)


def _basis(size: int, use_dst: bool) -> jnp.ndarray:
    t = DST4 if (use_dst and size == 4) else DCT_MATRICES[size]
    return jnp.asarray(t, jnp.int32)


# ---------------------------------------------------------------------------
# Exact integer matmul on the MXU.  TPU has no native int32 dot — XLA
# EMULATES integer matmuls at ~0.1 GB/s (measured), two orders of
# magnitude under the chip.  float32 dots with HIGHEST precision are
# exact for integer operands as long as every product/partial sum stays
# under 2^24, so integer transforms run as one (or, via a hi/lo split of
# the data operand, two) MXU matmuls with bit-identical results.
# ---------------------------------------------------------------------------

def _exact_dot(spec: str, t: jnp.ndarray, x: jnp.ndarray, t_max: int,
               x_max: int, acc_n: int) -> jnp.ndarray:
    """einsum(spec, t, x) over integer operands, computed exactly on the
    MXU.  t: small constant matrix (|t| <= t_max); x: data (|x| < x_max);
    acc_n: number of accumulated terms."""
    tf = t.astype(jnp.float32)
    if t_max * x_max * acc_n < (1 << 24):
        y = jnp.einsum(spec, tf, x.astype(jnp.float32),
                       precision="highest")
        return y.astype(jnp.int32)
    # split the data operand: x = hi*256 + lo, lo in [0, 256)
    lo = jnp.bitwise_and(x, 255)
    hi = (x - lo) >> 8
    ylo = jnp.einsum(spec, tf, lo.astype(jnp.float32),
                     precision="highest").astype(jnp.int32)
    yhi = jnp.einsum(spec, tf, hi.astype(jnp.float32),
                     precision="highest").astype(jnp.int32)
    return (yhi << 8) + ylo


@partial(jax.jit, static_argnames=("use_dst", "bit_increment"))
def forward_transform(block: jnp.ndarray, use_dst: bool = False,
                      bit_increment: int = 0) -> jnp.ndarray:
    """Batched forward 2D transform [N, s, s] int32 -> int32 coeffs."""
    size = block.shape[-1]
    log2 = int(size).bit_length() - 1
    shift1 = log2 - 1 + bit_increment
    shift2 = log2 + 6
    t = _basis(size, use_dst)
    x = block.astype(jnp.int32)
    tmp = (_exact_dot("kn,bjn->bkj", t, x, 91, 1 << 11, size)
           + (1 << (shift1 - 1))) >> shift1
    out = (_exact_dot("kn,bjn->bkj", t, tmp, 91, 1 << 16, size)
           + (1 << (shift2 - 1))) >> shift2
    return out


@partial(jax.jit, static_argnames=("use_dst", "bit_increment"))
def inverse_transform(coeff: jnp.ndarray, use_dst: bool = False,
                      bit_increment: int = 0) -> jnp.ndarray:
    """Batched inverse 2D transform [N, s, s] -> int32 residual."""
    size = coeff.shape[-1]
    shift1 = SHIFT_INV_1ST
    shift2 = SHIFT_INV_2ND - bit_increment
    t = _basis(size, use_dst)
    s = coeff.astype(jnp.int32)
    tmp = (_exact_dot("nk,bnj->bjk", t, s, 91, 1 << 15, size)
           + (1 << (shift1 - 1))) >> shift1
    tmp = jnp.clip(tmp, -32768, 32767)
    out = (_exact_dot("nk,bnj->bjk", t, tmp, 91, 1 << 15, size)
           + (1 << (shift2 - 1))) >> shift2
    return jnp.clip(out, -32768, 32767)


@partial(jax.jit, static_argnames=("bit_increment",))
def dequant(qcoeff: jnp.ndarray, qp: jnp.ndarray, bit_increment: int = 0) -> jnp.ndarray:
    """Batched dequant [N, s, s] with per-block scaled QP [N]."""
    size = qcoeff.shape[-1]
    log2 = int(size).bit_length() - 1
    per = qp // 6
    rem = qp % 6
    transform_shift = MAX_TR_DYNAMIC_RANGE - (8 + bit_increment) - log2
    shift = QUANT_IQUANT_SHIFT - QUANT_SHIFT - transform_shift
    add = 1 << (shift - 1)
    scales = jnp.asarray(INV_QUANT_SCALES, jnp.int32)
    scale = (scales[rem] << per)[:, None, None]
    q = jnp.clip(qcoeff.astype(jnp.int32), -32768, 32767)
    out = (q * scale + add) >> shift
    return jnp.clip(out, -32768, 32767)


@partial(jax.jit, static_argnames=("is_intra_slice", "bit_increment"))
def quant(coeff: jnp.ndarray, qp: jnp.ndarray, is_intra_slice: bool = True,
          bit_increment: int = 0):
    """Batched non-RDOQ quantization; returns (levels, delta_u)."""
    size = coeff.shape[-1]
    log2 = int(size).bit_length() - 1
    per = qp // 6
    rem = qp % 6
    transform_shift = MAX_TR_DYNAMIC_RANGE - (8 + bit_increment) - log2
    qbits = QUANT_SHIFT + per + transform_shift
    # int32 is sufficient: |coeff| <= 32767, max quant scale 26214 =>
    # |coeff|*scale < 2^30; the rounding add is < 2^29.
    add = ((171 if is_intra_slice else 85) << (qbits - 9)).astype(jnp.int32)[:, None, None]
    qscale = jnp.asarray(QUANT_SCALES, jnp.int32)[rem][:, None, None]
    qb = qbits.astype(jnp.int32)[:, None, None]
    c = coeff.astype(jnp.int32)
    tmp = jnp.abs(c) * qscale
    level = (tmp + add) >> qb
    delta_u = (tmp - (level << qb)) >> (qb - 8)
    level = jnp.clip(jnp.sign(c) * level, -32768, 32767).astype(jnp.int32)
    return level, delta_u.astype(jnp.int32)


def recon_add_clip(pred: jnp.ndarray, resi: jnp.ndarray, max_val: int) -> jnp.ndarray:
    return jnp.clip(pred.astype(jnp.int32) + resi.astype(jnp.int32), 0, max_val)


@partial(jax.jit, static_argnames=("use_dst", "bit_increment"))
def _residual_pipeline_xla(qcoeff: jnp.ndarray, qp: jnp.ndarray,
                           use_dst: bool = False,
                           bit_increment: int = 0) -> jnp.ndarray:
    return inverse_transform(dequant(qcoeff, qp, bit_increment),
                             use_dst, bit_increment).astype(jnp.int16)


def residual_pipeline(qcoeff, qp, use_dst: bool = False,
                      bit_increment: int = 0):
    """Batched dequant + inverse transform [N, s, s] -> residual int16.

    The decoder's stage-1 kernel: every coded TU of a picture of one size
    class runs through this in a single launch.  Two bit-identical
    formulations: the hand-written Pallas kernel (ops.jx_pallas — planar
    lane-batch layout, VPU slab MACs; default on real TPUs) and the XLA
    einsum path (dequant on the VPU + two int32 matmuls).  Returns int16
    (inverse_transform clips to the int16 range, so the cast is lossless
    and halves the device->host transfer on tunneled chips)."""
    from .device import effective_platform, pallas_enabled
    if pallas_enabled():
        from . import jx_pallas
        interpret = effective_platform() != "tpu"
        return jx_pallas.residual_pipeline_planar(
            qcoeff, qp, use_dst, bit_increment, interpret)
    return _residual_pipeline_xla(qcoeff, qp, use_dst, bit_increment)


@partial(jax.jit, static_argnames=("n", "size"))
def _unpack_cgs(cg_vals: jnp.ndarray, cg_idx: jnp.ndarray, n: int,
                size: int) -> jnp.ndarray:
    """Scatter CG-packed coefficients into dense TU blocks on device.

    cg_vals [M, 16] int16 — one coded 4x4 coefficient group per row;
    cg_idx [M] int32 = tu_index * ncg + cg_position (row-major CG grid),
    with padded rows pointing at the dummy slot n * ncg.  Shipping only
    coded CGs cuts the H2D payload ~4-8x at typical QPs (a QP-32 intra
    frame's TU grids are mostly zero: VERDICT r04 #4)."""
    ncg1 = size // 4
    flat = jnp.zeros((n * ncg1 * ncg1 + 1, 16), jnp.int16)
    flat = flat.at[cg_idx].set(cg_vals)
    return (flat[:-1].reshape(n, ncg1, ncg1, 4, 4)
            .transpose(0, 1, 3, 2, 4).reshape(n, size, size))


def residual_pipeline_packed(cg_vals, cg_idx, qp, size: int,
                             use_dst: bool = False,
                             bit_increment: int = 0):
    """CG-packed variant of residual_pipeline: device-side unpack scatter
    followed by the same dequant+IDCT launch (input already resident, so
    the second launch ships no bytes)."""
    qcoeff = _unpack_cgs(cg_vals, cg_idx, int(qp.shape[0]), size)
    return residual_pipeline(qcoeff, qp, use_dst, bit_increment)


@partial(jax.jit, static_argnames=("use_dst", "bit_increment", "max_val"))
def tu_recon_pipeline(pred: jnp.ndarray, qcoeff: jnp.ndarray, qp: jnp.ndarray,
                      use_dst: bool = False, bit_increment: int = 0,
                      max_val: int = 255) -> jnp.ndarray:
    """Fused dequant -> inverse transform -> add -> clip over a TU batch.

    This is the decoder's device hot path: one launch per TU size class.
    """
    deq = dequant(qcoeff, qp, bit_increment)
    resi = inverse_transform(deq, use_dst, bit_increment)
    return recon_add_clip(pred, resi, max_val)


@partial(jax.jit, static_argnames=("use_dst", "bit_increment"))
def transform_quant_pipeline(resi: jnp.ndarray, qp: jnp.ndarray,
                             use_dst: bool = False, bit_increment: int = 0):
    """Fused forward transform -> quant for the encoder candidate sweep."""
    coeff = forward_transform(resi, use_dst, bit_increment)
    return quant(coeff, qp, True, bit_increment)


# ---------------------------------------------------------------------------
# Distortion metrics (encoder device path)
# ---------------------------------------------------------------------------

@jax.jit
def batched_sse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared error per block: [N, h, w] -> [N] (TComRdCost xGetSSE)."""
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return jnp.sum(d * d, axis=(-2, -1))


_H4 = np.array([[1, 1, 1, 1], [1, -1, 1, -1], [1, 1, -1, -1], [1, -1, -1, 1]],
               np.int32)


# H8 = [[H4, H4], [H4, -H4]] — same construction as encoder.rdcost._h8
_H8 = np.block([[_H4, _H4], [_H4, -_H4]]).astype(np.int32)


def intra_sweep_satd(org, preds, bit_increment: int = 0):
    """The 35-mode intra SATD sweep (TEncSearch.cpp:2530-2545) on device:
    [M, s, s] candidate predictions vs one [s, s] original -> [M] SATDs.

    Two bit-identical formulations, like the residual core: the Pallas
    planar kernel (ops.jx_pallas.satd_sweep_planar; default on real TPUs)
    and the XLA einsum path below.  Byte-exact vs the host sweep
    (decision-equality)."""
    from .device import effective_platform, pallas_enabled
    if pallas_enabled():
        from . import jx_pallas
        interpret = effective_platform() != "tpu"
        return jx_pallas.satd_sweep_planar(org, preds, bit_increment,
                                           interpret)
    return _intra_sweep_satd_xla(org, preds, bit_increment)


@partial(jax.jit, static_argnames=("bit_increment",))
def _intra_sweep_satd_xla(org: jnp.ndarray, preds: jnp.ndarray,
                          bit_increment: int = 0) -> jnp.ndarray:
    """XLA einsum formulation: 8x8 Hadamard blocks when the PU is a
    multiple of 8, else 4x4 — two int32 matmuls per block batch on the
    MXU (mirrors encoder.rdcost.calc_had_batched)."""
    m, h, w = preds.shape
    d = org[None].astype(jnp.int32) - preds.astype(jnp.int32)
    if h % 8 == 0:
        hmat = jnp.asarray(_H8, jnp.int32)
        blocks = (d.reshape(m, h // 8, 8, w // 8, 8)
                  .transpose(0, 1, 3, 2, 4).reshape(m, -1, 8, 8))
        t1 = _exact_dot("ij,mbjk->mbik", hmat, blocks, 1, 1 << 11, 8)
        hm = _exact_dot("kl,mbik->mbil", hmat, t1, 1, 1 << 14, 8)
        sads = (jnp.sum(jnp.abs(hm), axis=(2, 3)) + 2) >> 2
    else:
        hmat = jnp.asarray(_H4, jnp.int32)
        blocks = (d.reshape(m, h // 4, 4, w // 4, 4)
                  .transpose(0, 1, 3, 2, 4).reshape(m, -1, 4, 4))
        t1 = _exact_dot("ij,mbjk->mbik", hmat, blocks, 1, 1 << 11, 4)
        hm = _exact_dot("kl,mbik->mbil", hmat, t1, 1, 1 << 13, 4)
        sads = (jnp.sum(jnp.abs(hm), axis=(2, 3)) + 1) >> 1
    return sads.sum(axis=1) >> bit_increment


@jax.jit
def batched_satd4(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """4x4 Hadamard SATD per block (xCalcHADs4x4 equivalent, batched).

    NB the reference adds a DC adjustment (sum>>2); mirrored here.
    """
    h = jnp.asarray(_H4, jnp.int32)
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    t1 = _exact_dot("ij,bjk->bik", h, d, 1, 1 << 11, 4)
    m = _exact_dot("kl,bik->bil", h, t1, 1, 1 << 13, 4)
    sad = jnp.sum(jnp.abs(m), axis=(-2, -1))
    return (sad + 1) >> 1  # HM normalization ((sad+1)>>1), TComRdCost.cpp:1773
