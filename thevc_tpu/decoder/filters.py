"""In-loop filter driver: builds edge/BS maps from the FrameModel and runs
the deblocking + SAO ops.

Behavioral reference: TComLoopFilter.cpp xDeblockCU/xSetEdgefilterTU/PU/
xSetLoopfilterParam/xGetBoundaryStrengthSingle; TDecGop::filterPicture
ordering (deblock, then SAO, then digest check).
"""

from __future__ import annotations

import numpy as np

from ..ops import deblock as dbk
from ..ops import sao as sao_ops
from ..params import Pps, SliceHeader, Sps
from .frame import MODE_INTRA, SIZE_NxN, FrameModel


def _edge_maps(f: FrameModel, sh: SliceHeader, direction: int):
    """Edge flags / BS / per-side QP and no-filter maps for one direction.

    direction 0 = VER (edge left of unit), 1 = HOR (edge above unit).
    """
    uh, uw = f.depth.shape
    # clip to units covering the picture
    pic_uw = (f.width + 3) // 4
    pic_uh = (f.height + 3) // 4

    depth = f.depth.astype(np.int32)
    cu_units = f.units_per_row >> depth
    tr = f.tr_idx.astype(np.int32)
    tu_units = np.maximum(cu_units >> tr, 1)

    uy, ux = np.mgrid[0:uh, 0:uw]
    coord = ux if direction == 0 else uy

    tu_edge = (coord % tu_units) == 0
    cu_edge = (coord % cu_units) == 0
    pu_edge = (f.part_size_arr == SIZE_NxN) & ((coord % np.maximum(cu_units >> 1, 1)) == 0)

    flags = tu_edge | cu_edge | pu_edge
    # picture boundary
    flags &= coord > 0
    # outside-picture units never filtered
    flags &= (ux < pic_uw) & (uy < pic_uh)

    # CU-boundary edges: slice/tile restriction on the P side
    if direction == 0:
        p_ux, p_uy = np.maximum(ux - 1, 0), uy
    else:
        p_ux, p_uy = ux, np.maximum(uy - 1, 0)

    if not sh.lf_cross_slice_boundary_flag:
        diff_slice = f.slice_idx[p_uy, p_ux] != f.slice_idx[uy, ux]
        flags &= ~(cu_edge & diff_slice)
    diff_tile = f.tile_idx[p_uy, p_ux] != f.tile_idx[uy, ux]
    flags &= ~(cu_edge & diff_tile)

    # boundary strength: intra on either side => 2 (BS for inter in round 2)
    p_intra = f.pred_mode[p_uy, p_ux] == MODE_INTRA
    q_intra = f.pred_mode == MODE_INTRA
    bs = np.where(flags & (p_intra | q_intra), 2, 0).astype(np.uint8)

    qp_q = f.qp.astype(np.int32)
    qp_p = f.qp[p_uy, p_ux].astype(np.int32)

    pcm_nofilter = f.sps_pcm_nofilter if hasattr(f, "sps_pcm_nofilter") else False
    no_q = f.tq_bypass.copy()
    no_p = f.tq_bypass[p_uy, p_ux].copy()
    if pcm_nofilter:
        no_q |= f.ipcm
        no_p |= f.ipcm[p_uy, p_ux]
    return flags, bs, qp_p, qp_q, no_p, no_q


def deblock_frame(f: FrameModel, sh: SliceHeader, sps: Sps, pps: Pps,
                  rec_y: np.ndarray, rec_cb: np.ndarray, rec_cr: np.ndarray) -> None:
    if sh.loop_filter_disable:
        return
    f.sps_pcm_nofilter = sps.use_pcm and sps.pcm_filter_disable_flag
    bd = sps.internal_bit_depth
    for direction in (0, 1):
        flags, bs, qp_p, qp_q, no_p, no_q = _edge_maps(f, sh, direction)
        dbk.filter_luma_edges(rec_y, flags, bs, qp_p, qp_q, no_p, no_q,
                              direction, sh.loop_filter_beta_offset,
                              sh.loop_filter_tc_offset, bd)
        dbk.filter_chroma_edges(rec_cb, rec_cr, flags, bs, qp_p, qp_q,
                                no_p, no_q, direction,
                                sh.loop_filter_tc_offset, bd)


def sao_frame(f: FrameModel, sh: SliceHeader, sps: Sps,
              rec_y: np.ndarray, rec_cb: np.ndarray, rec_cr: np.ndarray):
    if not (sps.use_sao and sh.sao_enabled):
        return rec_y, rec_cb, rec_cr
    bd = sps.internal_bit_depth
    out_y = sao_ops.apply_sao_plane(rec_y, f.ctu_size, f.sao_type[0],
                                    f.sao_sub_type[0], f.sao_offsets[0],
                                    f.ctus_w, f.ctus_h, bd)
    if sh.sao_enabled_chroma:
        out_cb = sao_ops.apply_sao_plane(rec_cb, f.ctu_size // 2, f.sao_type[1],
                                         f.sao_sub_type[1], f.sao_offsets[1],
                                         f.ctus_w, f.ctus_h, bd)
        out_cr = sao_ops.apply_sao_plane(rec_cr, f.ctu_size // 2, f.sao_type[2],
                                         f.sao_sub_type[2], f.sao_offsets[2],
                                         f.ctus_w, f.ctus_h, bd)
    else:
        out_cb, out_cr = rec_cb, rec_cr
    return out_y, out_cb, out_cr
