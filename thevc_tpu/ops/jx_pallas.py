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

    out = pl.pallas_call(
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
    )(jnp.asarray(t.reshape(s * s, 1)), xp, scale.reshape(1, nc))
    return out[:, :n].T.reshape(n, s, s)
