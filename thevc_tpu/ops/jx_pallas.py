"""Pallas TPU kernel for the decoder's residual core: fused dequant +
inverse 2D transform over a whole picture's TU batch in one launch.

Behavioral reference: TComTrQuant.cpp xDeQuant (:1272) and the partial-
butterfly inverse transforms (:417-802) — numerically identical to
ops.transforms.dequant / inverse_transform (the bit-exact numpy source of
truth) and to the XLA einsum formulation in ops.jx.residual_pipeline.

TPU-first layout ("planar"): the TU batch is stored as [s*s, N] with the
BATCH on the lane dimension and the s*s spatial/frequency positions on
sublanes.  Rationale:
  - N is the only large axis (hundreds to tens of thousands of TUs per
    picture), so it is the one that must ride the 128-wide lanes; the
    einsum layout [N, s, s] instead pads the s-wide minor axis up to 128
    lanes (32x memory waste at s=4).
  - int16 coefficients tile perfectly: s*s is always a multiple of 16
    (the int16 sublane quantum) and the column count is padded to a
    multiple of 128 lanes.
  - Both transform passes become slab/outer-product multiply-accumulates
    over [s, C] tiles — pure VPU work with unit-stride lanes.  The op is
    memory-bound (2*s^3 MACs per TU but every byte crosses HBM once), so
    the VPU at full lane occupancy is speed-of-light here; an MXU
    formulation would pad s<=32-wide matmuls onto 128x128 tiles for no
    bandwidth win.

Math (per TU block X, basis T): resi = T^t @ dequant(X) @ T with HM's
rounding shift + int16 clip between the two passes.  In planar layout:
  pass 1:  U[(k,j), c] = sum_n T[n,k] * deq[(n,j), c]
           -> for each output row-block k: sum of scalar-scaled row-blocks
  pass 2:  O[(k,t), c] = sum_j T[j,t] * U[(k,j), c]
           -> for each row-block k: sum of outer(T[j,:], U-row) products
Both passes keep the exact int32 accumulation order-independent (sums of
int32 products that fit 2^31), so bit-exactness vs the numpy reference
holds for every input in the coded range.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..common.rom import DCT_MATRICES, DST4, INV_QUANT_SCALES
from .transforms import (MAX_TR_DYNAMIC_RANGE, QUANT_IQUANT_SHIFT,
                         QUANT_SHIFT, SHIFT_INV_1ST, SHIFT_INV_2ND)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chunk_cols(size: int) -> int:
    # lanes per grid step: bounded so the [s*s, C] int32 intermediates
    # stay a few hundred KB of VMEM with room for pipeline double-buffers
    return {4: 512, 8: 512, 16: 256, 32: 128}[size]


# ---------------------------------------------------------------------------
# Hadamard SATD sweep kernel (encoder candidate preselection)
# ---------------------------------------------------------------------------

def _satd_kernel(b: int, cols: int):
    """Per-block Hadamard |H @ D @ H| abs-sum in the same planar layout as
    the residual kernel: diff blocks [b*b, C] with the block batch on
    lanes.  H is symmetric (Sylvester construction), so the two slab
    passes are structurally identical to the inverse-transform kernel's —
    minus the rounding shifts and int16 clips (pure int32 throughout;
    |D| <= 2^10+ per 10-bit pel, two +-1 passes grow it by b^2 <= 64, far
    inside int32).  Output: one abs-sum lane per block [1, C]."""
    def kernel(hexp_ref, x_ref, o_ref, u_ref):
        for j in range(b):
            def body1(n, acc, j=j):
                hrow = hexp_ref[pl.ds(n * b, b), :]          # H[n,:]^T
                row = x_ref[pl.ds(n * b + j, 1), :]
                return acc + hrow * row
            u_ref[j * b:(j + 1) * b, :] = jax.lax.fori_loop(
                0, b, body1, jnp.zeros((b, cols), jnp.int32))
        total = jnp.zeros((1, cols), jnp.int32)
        for k in range(b):
            def body2(j, acc, k=k):
                hrow = hexp_ref[pl.ds(j * b, b), :]
                row = u_ref[pl.ds(j * b + k, 1), :]
                return acc + hrow * row
            acc = jax.lax.fori_loop(
                0, b, body2, jnp.zeros((b, cols), jnp.int32))
            total = total + jnp.sum(jnp.abs(acc), axis=0, keepdims=True)
        o_ref[:] = total
    return kernel


@partial(jax.jit, static_argnames=("bit_increment", "interpret"))
def satd_sweep_planar(org: jnp.ndarray, preds: jnp.ndarray,
                      bit_increment: int = 0,
                      interpret: bool = False) -> jnp.ndarray:
    """Drop-in equivalent of jx.intra_sweep_satd ([s,s] original vs
    [M,s,s] candidate predictions -> [M] SATDs) through the Pallas
    kernel.  Behavioral reference: TComRdCost.cpp xCalcHADs4x4 (:1684) /
    xCalcHADs8x8 (:1778) summed over the PU (TEncSearch.cpp:2530-2545);
    bit-exact vs encoder.rdcost.calc_had_batched."""
    m, h, w = preds.shape
    b = 8 if h % 8 == 0 else 4
    d = org[None].astype(jnp.int32) - preds.astype(jnp.int32)
    blocks = (d.reshape(m, h // b, b, w // b, b)
              .transpose(0, 1, 3, 2, 4).reshape(-1, b, b))
    n = blocks.shape[0]                                    # m * blocks/PU
    hmat = np.asarray(_HAD8 if b == 8 else _HAD4, np.int32)

    cols = 512
    nc = -(-n // cols) * cols
    xp = blocks.reshape(n, b * b).T                        # planar [b*b, N]
    if nc != n:
        xp = jnp.pad(xp, ((0, 0), (0, nc - n)))

    sums = pl.pallas_call(
        _satd_kernel(b, cols),
        out_shape=jax.ShapeDtypeStruct((1, nc), jnp.int32),
        grid=(nc // cols,),
        in_specs=[
            pl.BlockSpec((b * b, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b * b, cols), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cols), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b * b, cols), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(hmat.reshape(b * b, 1)), xp)[0, :n]

    # per-block HM normalization, then the per-PU sum over its blocks
    sads = (sums + 2) >> 2 if b == 8 else (sums + 1) >> 1
    return sads.reshape(m, -1).sum(axis=1) >> bit_increment


_HAD4 = np.array([[1, 1, 1, 1], [1, -1, 1, -1],
                  [1, 1, -1, -1], [1, -1, -1, 1]], np.int32)
_HAD8 = np.block([[_HAD4, _HAD4], [_HAD4, -_HAD4]]).astype(np.int32)


def _kernel(size: int, cols: int, dq_shift: int, sh2: int):
    """Build the fused dequant+IDCT kernel for one TU size class.

    Takes the basis COLUMN-EXPANDED onto sublanes: texp[(n,k), 0] =
    T[n,k], so each pass's inner step is an outer product
    texp[n*s:n*s+s] (s,1) * row (1,C) — a pure VPU broadcast
    multiply-accumulate with no in-kernel transposes.  Dynamic indexing
    goes through Refs with sublane pl.ds only (Mosaic supports neither
    dynamic_slice on computed values nor dynamic lane slices), hence the
    expansion and the two VMEM scratch planes."""
    s = size
    dq_add = 1 << (dq_shift - 1)
    r1 = 1 << (SHIFT_INV_1ST - 1)
    r2 = 1 << (sh2 - 1)

    def kernel(texp_ref, x_ref, sc_ref, o_ref, deq_ref, u_ref):
        # dequant: per-column (= per-TU) scale, HM's int32 wraparound
        xi = x_ref[:].astype(jnp.int32)               # (s*s, C)
        deq_ref[:] = jnp.clip((xi * sc_ref[:] + dq_add) >> dq_shift,
                              -32768, 32767)

        # pass 1 (row transform), stored per-block transposed:
        #   U'[(j,k), c] = clip((sum_n T[n,k] * deq[(n,j), c] + r1) >> s1)
        # block j accumulates outer(T[n,:], deq row (n,j)) over n.
        for j in range(s):
            def body1(n, acc, j=j):
                tcol = texp_ref[pl.ds(n * s, s), :]            # T[n,:]^T
                row = deq_ref[pl.ds(n * s + j, 1), :]
                return acc + tcol * row
            acc = jax.lax.fori_loop(
                0, s, body1, jnp.zeros((s, cols), jnp.int32))
            u_ref[j * s:(j + 1) * s, :] = jnp.clip(
                (acc + r1) >> SHIFT_INV_1ST, -32768, 32767)

        # pass 2 (column transform):
        #   O[(k,t), c] = clip((sum_j T[j,t] * U'[(j,k), c] + r2) >> sh2)
        for k in range(s):
            def body2(j, acc, k=k):
                tcol = texp_ref[pl.ds(j * s, s), :]            # T[j,:]^T
                row = u_ref[pl.ds(j * s + k, 1), :]
                return acc + tcol * row
            acc = jax.lax.fori_loop(
                0, s, body2, jnp.zeros((s, cols), jnp.int32))
            o_ref[k * s:(k + 1) * s, :] = jnp.clip(
                (acc + r2) >> sh2, -32768, 32767).astype(jnp.int16)

    return kernel


@partial(jax.jit, static_argnames=("use_dst", "bit_increment", "interpret"))
def residual_pipeline_planar(qcoeff: jnp.ndarray, qp: jnp.ndarray,
                             use_dst: bool = False, bit_increment: int = 0,
                             interpret: bool = False) -> jnp.ndarray:
    """Drop-in equivalent of jx.residual_pipeline ([N, s, s] int16 coeffs
    + scaled-QP [N] -> [N, s, s] int16 residual) through the Pallas
    kernel.  The planar repack happens on device inside the same jit."""
    n, s, _ = qcoeff.shape
    if qcoeff.dtype != jnp.int16:     # static: dequant clips to int16 anyway
        qcoeff = jnp.clip(qcoeff, -32768, 32767).astype(jnp.int16)
    qp = jnp.asarray(qp, jnp.int32)
    log2 = int(s).bit_length() - 1
    transform_shift = MAX_TR_DYNAMIC_RANGE - (8 + bit_increment) - log2
    dq_shift = QUANT_IQUANT_SHIFT - QUANT_SHIFT - transform_shift
    sh2 = SHIFT_INV_2ND - bit_increment

    t = np.asarray(DST4 if (use_dst and s == 4) else DCT_MATRICES[s],
                   np.int32)
    scales = jnp.asarray(INV_QUANT_SCALES, jnp.int32)
    scale = (scales[qp % 6] << (qp // 6)).astype(jnp.int32)

    cols = _chunk_cols(s)
    nc = -(-n // cols) * cols
    xp = qcoeff.reshape(n, s * s).T                       # planar [s*s, N]
    if nc != n:
        xp = jnp.pad(xp, ((0, 0), (0, nc - n)))
        scale = jnp.pad(scale, (0, nc - n))
    out = _residual_call(xp, scale.reshape(1, nc), t, s, dq_shift, sh2,
                         interpret)
    return out[:, :n].T.reshape(n, s, s)


def _residual_call(xp, scale_row, t, s, dq_shift, sh2, interpret=False):
    """Run the fused dequant+IDCT kernel on ALREADY-PLANAR input
    [s*s, NC] int16 (NC a multiple of the class's lane chunk) with the
    per-TU scale row [1, NC]; returns planar int16 output."""
    cols = _chunk_cols(s)
    nc = xp.shape[1]
    return pl.pallas_call(
        _kernel(s, cols, dq_shift, sh2),
        out_shape=jax.ShapeDtypeStruct((s * s, nc), jnp.int16),
        grid=(nc // cols,),
        in_specs=[
            pl.BlockSpec((s * s, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s * s, cols), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s * s, cols), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((s * s, cols), jnp.int32),
            pltpu.VMEM((s * s, cols), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(t.reshape(s * s, 1)), xp, scale_row)


@partial(jax.jit, static_argnames=("size", "use_dst", "bit_increment",
                                   "interpret"))
def residual_planar_in(xp: jnp.ndarray, qp: jnp.ndarray, size: int,
                       use_dst: bool = False, bit_increment: int = 0,
                       interpret: bool = False) -> jnp.ndarray:
    """Planar-native residual core: input [s*s, N] int16 (TU batch on
    lanes), scaled-QP [N] -> planar int16 residual.  This is the
    speed-of-light form — a [N, s, s] input first pays a ~16-32x
    tile-padding repack (minor axis s << the 128-lane tile), which is
    exactly what a planar producer avoids."""
    s = size
    log2 = s.bit_length() - 1
    transform_shift = MAX_TR_DYNAMIC_RANGE - (8 + bit_increment) - log2
    dq_shift = QUANT_IQUANT_SHIFT - QUANT_SHIFT - transform_shift
    sh2 = SHIFT_INV_2ND - bit_increment
    t = np.asarray(DST4 if (use_dst and s == 4) else DCT_MATRICES[s],
                   np.int32)
    scales = jnp.asarray(INV_QUANT_SCALES, jnp.int32)
    scale = (scales[qp % 6] << (qp // 6)).astype(jnp.int32)
    return _residual_call(xp, scale.reshape(1, -1), t, s, dq_shift, sh2,
                          interpret)
