"""Intra reconstruction driver: batched residual transform + ordered
prediction/add over the TU lists.

Behavioral reference: TDecCu.cpp xReconIntraQT (:689) / xIntraRecLumaBlk
(:469) / xIntraRecChromaBlk (:534) / xReconPCM (:892).

Structure for the TPU build: stage 1 (dequant + inverse transform of every
TU) is embarrassingly parallel over TUs of equal size — it runs as batched
matmul kernels on device.  Stage 2 (prediction + add) carries the intra
neighbor dependency and walks TUs in decode order; on TPU this becomes a
wavefront lax.scan, here a numpy loop that is bit-exact.
"""

from __future__ import annotations

import numpy as np

from ..common import rom
from ..ops import intra as intra_ops
from ..ops import transforms as tops
from ..params import Pps, SliceHeader, Sps
from .frame import DM_CHROMA_IDX, MODE_INTRA, SIZE_NxN, FrameModel


def _tu_availability_flags(f: FrameModel, ux: int, uy: int, num_units: int) -> np.ndarray:
    """Neighbor availability flags for a TU whose top-left luma unit is
    (ux, uy) and which spans num_units 4x4 units per edge.

    Layout (TComPattern::initAdiPattern): flags[0..nu-1] below-left
    (bottom-most first), flags[nu..2nu-1] left, flags[2nu] corner,
    flags[2nu+1..3nu] above, flags[3nu+1..4nu] above-right.
    """
    nu = num_units
    flags = np.zeros(4 * nu + 1, bool)
    flags[2 * nu] = f.available(ux - 1, uy - 1, ux, uy)
    for j in range(2 * nu):
        # left (j < nu) then below-left: unit at row uy + j
        flags[2 * nu - 1 - j] = f.available(ux - 1, uy + j, ux, uy)
    for j in range(2 * nu):
        flags[2 * nu + 1 + j] = f.available(ux + j, uy - 1, ux, uy)
    return flags


def _residual(coeff_block: np.ndarray, qp: int, use_dst: bool, ts: bool,
              bypass: bool, bit_inc: int) -> np.ndarray:
    if bypass:
        return coeff_block.astype(np.int32)
    deq = tops.dequant(coeff_block[None], qp, bit_inc)[0]
    if ts:
        return tops.transform_skip_inv(deq[None], bit_inc)[0].astype(np.int32)
    return tops.inverse_transform(deq[None], use_dst, bit_inc)[0].astype(np.int32)


def reconstruct_intra_frame(f: FrameModel, sh: SliceHeader, sps: Sps,
                            pps: Pps, rec_y: np.ndarray, rec_cb: np.ndarray,
                            rec_cr: np.ndarray) -> None:
    bit_depth = sps.internal_bit_depth
    bit_inc = sps.bit_increment
    max_val = (1 << bit_depth) - 1
    dc_val = 1 << (bit_depth - 1)

    # ---- luma pass ----
    for (px, py, size, abs_part, ctu_addr, tr_depth) in f.luma_tus:
        ux, uy = px // 4, py // 4
        if f.ipcm[uy, ux]:
            rec_y[py:py + size, px:px + size] = f.pcm_y[py:py + size, px:px + size]
            continue
        mode = int(f.luma_dir[uy, ux])
        nu = size // 4
        flags = _tu_availability_flags(f, ux, uy, nu)
        line = intra_ops.fill_reference_line(rec_y, px, py, size, 4, flags, dc_val)
        log2 = size.bit_length() - 1
        if intra_ops.use_filtered(mode, log2, True):
            line = intra_ops.smooth_reference_line(line, size, 4)
        pred = intra_ops.predict(line, size, 4, mode, True, max_val)
        # residual
        cbf = (int(f.cbf[0, uy, ux]) >> tr_depth) & 1
        if cbf:
            qp = int(f.qp[uy, ux])
            qps = tops.qp_scaled(qp, True, sps.qp_bd_offset_y)
            resi = _residual(f.coeff_y[py:py + size, px:px + size], qps,
                             use_dst=(size == 4), ts=bool(f.ts_flag[0, uy, ux]),
                             bypass=bool(f.tq_bypass[uy, ux]), bit_inc=bit_inc)
        else:
            resi = 0
        rec_y[py:py + size, px:px + size] = np.clip(
            pred + resi, 0, max_val).astype(rec_y.dtype)

    # ---- chroma pass ----
    for (cx, cy, size, abs_part, ctu_addr, tr_depth) in f.chroma_tus:
        # luma unit coords of the corresponding luma region
        ux, uy = cx // 2, cy // 2
        if f.ipcm[uy, ux]:
            rec_cb[cy:cy + size, cx:cx + size] = f.pcm_cb[cy:cy + size, cx:cx + size]
            rec_cr[cy:cy + size, cx:cx + size] = f.pcm_cr[cy:cy + size, cx:cx + size]
            continue
        # chroma pred mode: from CU part 0 (getChromaIntraDir(0))
        depth = int(f.depth[uy, ux])
        cu_units = f.units_per_row >> depth
        cux = (ux // cu_units) * cu_units
        cuy = (uy // cu_units) * cu_units
        mode = int(f.chroma_dir[cuy, cux])
        if mode == DM_CHROMA_IDX:
            mode = int(f.luma_dir[cuy, cux])
        nu = size // 2          # availability units (luma 4x4 parts)
        flags = _tu_availability_flags(f, ux, uy, nu)
        cbf_u = (int(f.cbf[1, uy, ux]) >> tr_depth) & 1
        cbf_v = (int(f.cbf[2, uy, ux]) >> tr_depth) & 1
        qp = int(f.qp[uy, ux])
        for comp, rec_c, coeff_plane, cbf, qp_off in (
                (1, rec_cb, f.coeff_cb, cbf_u,
                 pps.chroma_cb_qp_offset + sh.slice_qp_delta_cb),
                (2, rec_cr, f.coeff_cr, cbf_v,
                 pps.chroma_cr_qp_offset + sh.slice_qp_delta_cr)):
            line = intra_ops.fill_reference_line(rec_c, cx, cy, size, 2,
                                                 flags, dc_val)
            pred = intra_ops.predict(line, size, 2, mode, False, max_val)
            if cbf:
                qps = tops.qp_scaled(qp, False, sps.qp_bd_offset_c, qp_off)
                resi = _residual(coeff_plane[cy:cy + size, cx:cx + size], qps,
                                 use_dst=False,
                                 ts=bool(f.ts_flag[comp, uy, ux]),
                                 bypass=bool(f.tq_bypass[uy, ux]),
                                 bit_inc=bit_inc)
            else:
                resi = 0
            rec_c[cy:cy + size, cx:cx + size] = np.clip(
                pred + resi, 0, max_val).astype(rec_c.dtype)
