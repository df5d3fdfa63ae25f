"""Reconstruction driver: batched residual transform + ordered
prediction/add over the CU decode order.

Behavioral reference: TDecCu.cpp xReconIntraQT (:689) / xIntraRecLumaBlk
(:469) / xIntraRecChromaBlk (:534) / xReconPCM (:892) / xReconInter (:648)
/ xDecodeInterTexture (:778).

Structure for the TPU build: stage 1 (dequant + inverse transform of every
TU) is embarrassingly parallel over TUs of equal size — it runs as batched
matmul kernels on device, as does motion compensation (independent PUs).
Stage 2 (prediction + add) carries the intra neighbor dependency and walks
CUs in decode order; on TPU this becomes a wavefront lax.scan, here a
numpy loop that is bit-exact.
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


class _FrameRecon:
    def __init__(self, f: FrameModel, sh: SliceHeader, sps: Sps, pps: Pps,
                 rec_y, rec_cb, rec_cr, inter_pred=None):
        self.f, self.sh, self.sps, self.pps = f, sh, sps, pps
        self.rec_y, self.rec_cb, self.rec_cr = rec_y, rec_cb, rec_cr
        self.inter_pred = inter_pred
        self.bit_inc = sps.bit_increment
        self.max_val = (1 << sps.internal_bit_depth) - 1
        self.dc_val = 1 << (sps.internal_bit_depth - 1)

    # -- intra TU reconstruction (xIntraRecLumaBlk / xIntraRecChromaBlk) --
    def intra_luma_tu(self, tu) -> None:
        f, rec_y = self.f, self.rec_y
        (px, py, size, abs_part, ctu_addr, tr_depth) = tu
        ux, uy = px // 4, py // 4
        if f.ipcm[uy, ux]:
            rec_y[py:py + size, px:px + size] = \
                f.pcm_y[py:py + size, px:px + size]
            return
        mode = int(f.luma_dir[uy, ux])
        nu = size // 4
        flags = _tu_availability_flags(f, ux, uy, nu)
        line = intra_ops.fill_reference_line(rec_y, px, py, size, 4, flags,
                                             self.dc_val)
        log2 = size.bit_length() - 1
        if intra_ops.use_filtered(mode, log2, True):
            line = intra_ops.smooth_reference_line(line, size, 4)
        pred = intra_ops.predict(line, size, 4, mode, True, self.max_val)
        cbf = (int(f.cbf[0, uy, ux]) >> tr_depth) & 1
        if cbf:
            qp = int(f.qp[uy, ux])
            qps = tops.qp_scaled(qp, True, self.sps.qp_bd_offset_y)
            resi = _residual(f.coeff_y[py:py + size, px:px + size], qps,
                             use_dst=(size == 4),
                             ts=bool(f.ts_flag[0, uy, ux]),
                             bypass=bool(f.tq_bypass[uy, ux]),
                             bit_inc=self.bit_inc)
        else:
            resi = 0
        rec_y[py:py + size, px:px + size] = np.clip(
            pred + resi, 0, self.max_val).astype(rec_y.dtype)

    def intra_chroma_tu(self, tu) -> None:
        f, sh, pps = self.f, self.sh, self.pps
        (cx, cy, size, abs_part, ctu_addr, tr_depth) = tu
        ux, uy = cx // 2, cy // 2   # luma unit coords of the luma region
        if f.ipcm[uy, ux]:
            self.rec_cb[cy:cy + size, cx:cx + size] = \
                f.pcm_cb[cy:cy + size, cx:cx + size]
            self.rec_cr[cy:cy + size, cx:cx + size] = \
                f.pcm_cr[cy:cy + size, cx:cx + size]
            return
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
                (1, self.rec_cb, f.coeff_cb, cbf_u,
                 pps.chroma_cb_qp_offset + sh.slice_qp_delta_cb),
                (2, self.rec_cr, f.coeff_cr, cbf_v,
                 pps.chroma_cr_qp_offset + sh.slice_qp_delta_cr)):
            line = intra_ops.fill_reference_line(rec_c, cx, cy, size, 2,
                                                 flags, self.dc_val)
            pred = intra_ops.predict(line, size, 2, mode, False, self.max_val)
            if cbf:
                qps = tops.qp_scaled(qp, False, self.sps.qp_bd_offset_c, qp_off)
                resi = _residual(coeff_plane[cy:cy + size, cx:cx + size], qps,
                                 use_dst=False,
                                 ts=bool(f.ts_flag[comp, uy, ux]),
                                 bypass=bool(f.tq_bypass[uy, ux]),
                                 bit_inc=self.bit_inc)
            else:
                resi = 0
            rec_c[cy:cy + size, cx:cx + size] = np.clip(
                pred + resi, 0, self.max_val).astype(rec_c.dtype)

    # -- inter CU reconstruction (xReconInter) -----------------------------
    def inter_cu(self, px, py, size, luma_tus, chroma_tus) -> None:
        f, sh, pps = self.f, self.sh, self.pps
        pred_y, pred_cb, pred_cr = self.inter_pred.predict_cu(px, py, size)
        resi_y = np.zeros_like(pred_y, np.int32)
        resi_cb = np.zeros_like(pred_cb, np.int32)
        resi_cr = np.zeros_like(pred_cr, np.int32)
        for (tx, ty, tsz, abs_part, ctu_addr, tr_depth) in luma_tus:
            ux, uy = tx // 4, ty // 4
            if (int(f.cbf[0, uy, ux]) >> tr_depth) & 1:
                qp = int(f.qp[uy, ux])
                qps = tops.qp_scaled(qp, True, self.sps.qp_bd_offset_y)
                resi_y[ty - py:ty - py + tsz, tx - px:tx - px + tsz] = \
                    _residual(f.coeff_y[ty:ty + tsz, tx:tx + tsz], qps,
                              use_dst=False, ts=bool(f.ts_flag[0, uy, ux]),
                              bypass=bool(f.tq_bypass[uy, ux]),
                              bit_inc=self.bit_inc)
        cx0, cy0 = px // 2, py // 2
        for (cx, cy, csz, abs_part, ctu_addr, tr_depth) in chroma_tus:
            ux, uy = cx // 2, cy // 2
            qp = int(f.qp[uy, ux])
            for comp, resi_c, coeff_plane, qp_off in (
                    (1, resi_cb, f.coeff_cb,
                     pps.chroma_cb_qp_offset + sh.slice_qp_delta_cb),
                    (2, resi_cr, f.coeff_cr,
                     pps.chroma_cr_qp_offset + sh.slice_qp_delta_cr)):
                if (int(f.cbf[comp, uy, ux]) >> tr_depth) & 1:
                    qps = tops.qp_scaled(qp, False, self.sps.qp_bd_offset_c,
                                         qp_off)
                    resi_c[cy - cy0:cy - cy0 + csz, cx - cx0:cx - cx0 + csz] = \
                        _residual(coeff_plane[cy:cy + csz, cx:cx + csz], qps,
                                  use_dst=False,
                                  ts=bool(f.ts_flag[comp, uy, ux]),
                                  bypass=bool(f.tq_bypass[uy, ux]),
                                  bit_inc=self.bit_inc)
        self.rec_y[py:py + size, px:px + size] = np.clip(
            pred_y.astype(np.int32) + resi_y, 0,
            self.max_val).astype(self.rec_y.dtype)
        cs = size // 2
        self.rec_cb[cy0:cy0 + cs, cx0:cx0 + cs] = np.clip(
            pred_cb.astype(np.int32) + resi_cb, 0,
            self.max_val).astype(self.rec_cb.dtype)
        self.rec_cr[cy0:cy0 + cs, cx0:cx0 + cs] = np.clip(
            pred_cr.astype(np.int32) + resi_cr, 0,
            self.max_val).astype(self.rec_cr.dtype)


def reconstruct_frame(f: FrameModel, sh: SliceHeader, sps: Sps, pps: Pps,
                      rec_y: np.ndarray, rec_cb: np.ndarray,
                      rec_cr: np.ndarray, inter_pred=None,
                      cu_range=None) -> None:
    """Walk CUs in decode order, reconstructing each (TDecCu::decodeCU).

    cu_range=(start, end) restricts to one slice's CUs so each slice is
    reconstructed with its own reference lists (multi-slice pictures)."""
    r = _FrameRecon(f, sh, sps, pps, rec_y, rec_cb, rec_cr, inter_pred)
    lo, hi = cu_range if cu_range is not None else (0, len(f.cu_list))
    for (px, py, size, mode, l0, l1, c0, c1) in f.cu_list[lo:hi]:
        if mode == MODE_INTRA:
            for tu in f.luma_tus[l0:l1]:
                r.intra_luma_tu(tu)
            for tu in f.chroma_tus[c0:c1]:
                r.intra_chroma_tu(tu)
        else:
            r.inter_cu(px, py, size, f.luma_tus[l0:l1], f.chroma_tus[c0:c1])


def reconstruct_intra_frame(f: FrameModel, sh: SliceHeader, sps: Sps,
                            pps: Pps, rec_y: np.ndarray, rec_cb: np.ndarray,
                            rec_cr: np.ndarray) -> None:
    reconstruct_frame(f, sh, sps, pps, rec_y, rec_cb, rec_cr)
