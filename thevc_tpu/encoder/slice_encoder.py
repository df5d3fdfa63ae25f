"""Slice-level encoding: lambda/QP init, CTU compression loop, final write.

Behavioral reference: TEncSlice.cpp (initEncSlice :164, compressSlice :652,
encodeSlice :999) for the single-substream, no-tiles, no-WPP configuration.

The two-pass structure per CTU is preserved exactly:
  1. compressCU — RD search with the GoOn fractional-bit counter and the
     [depth][CI_*] snapshot grid seeded from [0][CI_CURR_BEST];
  2. encodeCU with the counter engine starting from [0][CI_CURR_BEST] —
     this (not the search's NEXT_BEST) produces the next CTU's start state
     (TEncSlice.cpp:912-934).
The real arithmetic pass (encode_slice) then replays the final syntax with
BinEncoder from fresh slice-init contexts.
"""

from __future__ import annotations

import math

import numpy as np

from ..bitstream import OutputBitstream
from ..cabac import contexts as cc
from ..cabac.bitcount import CounterEncoder
from ..cabac.engine import BinEncoder
from ..common import rom
from ..decoder.frame import FrameModel
from ..params import I_SLICE, SliceHeader
from .cu_encoder import CI_CURR_BEST, CuEncoder
from .rdcost import RdCost
from .sbac_writer import SbacWriter


def init_enc_slice(cfg, sps, pps, poc: int, gop_id: int, nal_type: int):
    """initEncSlice: slice type, QP, lambda (TEncSlice.cpp:164).

    Returns (SliceHeader, lambda, chroma_weight, lambda_chroma).
    """
    ge = cfg.gop_list[gop_id] if gop_id < len(cfg.gop_list) else None

    # depth from GOP position (TEncSlice.cpp:180)
    depth = 0
    gop_size = cfg.gop_size
    ipoc = poc % gop_size if gop_size else 0
    if ipoc != 0:
        step = gop_size
        i = step >> 1
        while i >= 1:
            found = any(j == ipoc for j in range(i, gop_size, step))
            # NB the reference increments iDepth even on the found
            # iteration (i=0 + break exits the inner loop only;
            # iStep>>=1 and iDepth++ still execute, TEncSlice.cpp:192-204)
            step >>= 1
            depth += 1
            if found:
                break
            i >>= 1

    intra_period = cfg.intra_period
    is_intra = (poc == 0 or (intra_period > 0 and poc % intra_period == 0)
                or cfg.gop_size == 0)
    slice_type = I_SLICE if is_intra else 0  # B_SLICE otherwise

    dqp = float(cfg.qp)
    if slice_type != I_SLICE and ge is not None:
        dqp += ge.qp_offset

    # lambda (iDQpIdx = 0 case)
    num_b = cfg.gop_size - 1
    shift_qp = 12
    lambda_scale = 1.0 - max(0.0, min(0.5, 0.05 * num_b))
    qp_temp = dqp - shift_qp
    qp_factor = ge.qp_factor if ge is not None else 1.0
    if slice_type == I_SLICE:
        qp_factor = 0.57 * lambda_scale
    lam = qp_factor * math.pow(2.0, qp_temp / 3.0)
    if depth > 0:
        lam *= max(2.0, min(4.0, qp_temp / 6.0))
    if not cfg.use_had_me:
        lam *= 0.95
    iqp = max(-sps.qp_bd_offset_y, min(51, int(math.floor(dqp + 0.5))))

    # WEIGHTED_CHROMA_DISTORTION weight (TEncSlice.cpp:320-328)
    weight = 1.0
    if iqp >= 0:
        weight = math.pow(2.0, (iqp - int(rom.CHROMA_SCALE[iqp])) / 3.0)

    sh = SliceHeader(nal_unit_type=nal_type, temporal_id=0,
                     slice_type=slice_type, poc=poc, slice_qp=iqp)
    sh.gop_depth = depth
    sh.cabac_init_flag = False
    sh.max_num_merge_cand = 5
    sh.slice_cur_start_cu_addr = 0
    sh.slice_cur_end_cu_addr = sps.num_ctus * sps.num_partitions
    sh.dependent_slice_start_cu_addr = 0
    sh.dependent_slice_end_cu_addr = sh.slice_cur_end_cu_addr
    sh.loop_filter_disable = bool(cfg.loop_filter_disable)
    sh.loop_filter_beta_offset = cfg.loop_filter_beta_offset_div2 << 1
    sh.loop_filter_tc_offset = cfg.loop_filter_tc_offset_div2 << 1
    sh.lf_cross_slice_boundary_flag = bool(cfg.lf_cross_slice_boundary_flag)
    sh.tmvp_enabled = cfg.tmvp_mode == 1 and slice_type != I_SLICE
    return sh, lam, weight, lam / weight


def make_cu_encoder(cfg, sps, pps, sh, frame: FrameModel, org_planes,
                    rec_planes, lam: float, weight: float,
                    lam_chroma: float) -> CuEncoder:
    rd = RdCost(sps.bit_increment)
    rd.set_lambda(lam)
    rd.chroma_distortion_weight = weight
    enc_cfg = {"RDOQ": cfg.use_rdoq,
               "TransformSkipFast": cfg.use_transform_skip_fast,
               "CUTransquantBypassFlagValue": cfg.cu_transquant_bypass_flag_value}
    return CuEncoder(frame, sh, sps, pps, org_planes, rec_planes, rd,
                     lam, lam_chroma, enc_cfg)


def compress_slice(cu: CuEncoder) -> None:
    """compressSlice CTU loop (single substream, raster order)."""
    f = cu.f
    sh = cu.sh
    init = cc.make_context_states(sh.slice_type, sh.slice_qp,
                                  sh.cabac_init_flag)
    cu.snap[0][CI_CURR_BEST] = (init.copy(), 0)
    # slice bookkeeping for availability
    f.slice_start[:, :] = sh.slice_cur_start_cu_addr
    f.tile_idx[:, :] = 0

    for ctu_addr in range(f.num_ctus):
        cu.compress_ctu(ctu_addr)
        # final-pass re-encode with the counter: advances [0][CI_CURR_BEST]
        ctx, frac = cu.snap[0][CI_CURR_BEST]
        eng = CounterEncoder(ctx.copy())
        eng.frac_bits = frac
        w = SbacWriter(f, sh, cu.sps, cu.pps, eng)
        cu.encode_ctu(ctu_addr, w)
        cu.snap[0][CI_CURR_BEST] = (eng.ctx, eng.frac_bits)


def encode_slice(cu: CuEncoder, sao_write=None) -> OutputBitstream:
    """encodeSlice: real CABAC pass producing the slice substream."""
    f = cu.f
    sh = cu.sh
    bs = OutputBitstream()
    ctx = cc.make_context_states(sh.slice_type, sh.slice_qp,
                                 sh.cabac_init_flag)
    eng = BinEncoder(bs, ctx)
    eng.start()
    w = SbacWriter(f, sh, cu.sps, cu.pps, eng)
    for ctu_addr in range(f.num_ctus):
        if sao_write is not None:
            sao_write(w, ctu_addr)
        cu.encode_ctu(ctu_addr, w)
    # terminating bit + finish + stop bit + alignment (TEncGOP.cpp:921-929)
    eng.encode_bin_trm(1)
    eng.finish()
    bs.write(1, 1)
    bs.write_align_zero()
    return bs
