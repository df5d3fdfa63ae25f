"""Decoder top: NAL dispatch, parameter-set activation, per-picture decode
pipeline, DPB output ordering, digest verification.

Behavioral reference: TDecTop.cpp (decode :663, xDecodeSlice :318,
xActivateParameterSets :271), TDecGop.cpp (decompressSlice :112,
filterPicture :201), TAppDecTop.cpp output rules (:195-205, :244+).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from .. import nal as nal_mod
from .. import headers
from ..bitstream import InputBitstream
from ..digest import calc_digest
from ..io.yuv import YuvFrame
from ..params import Pps, SliceHeader, Sps, Vps
from .cu_parser import SliceDataParser
from .frame import FrameModel
from .filters import deblock_frame, sao_frame
from .inter import InterPredictor
from .mv import MvCtx
from .recon import reconstruct_frame
from .refpic import Dpb, Picture, build_ref_lists, check_ldc


@dataclass
class DecodedPicture:
    poc: int
    frame: YuvFrame
    output: bool = True
    digest_ok: Optional[bool] = None


class Decoder:
    """Sequential host decoder driving batched reconstruction ops."""

    def __init__(self, max_temporal_layer: int = -1) -> None:
        self.vps_map: Dict[int, Vps] = {}
        self.sps_map: Dict[int, Sps] = {}
        self.pps_map: Dict[int, Pps] = {}
        self.prev_poc = 0
        self.pending_sei: List[dict] = []
        self.pictures: List[DecodedPicture] = []
        self.dpb = Dpb()
        # TAppDecTop.cpp:144-155: NALs above this temporal layer are dropped
        # before decode (-1 = decode all layers).
        self.max_temporal_layer = max_temporal_layer

    def decode_stream(self, data: bytes):
        """Decode a whole Annex-B stream, yielding pictures in POC order.

        (All-intra round 1: every picture is an AU of its own; full DPB
        reorder rules arrive with the inter configs.)
        """
        for unit in nal_mod.iter_annexb_nals(data):
            self.decode_nal(unit)
        return [p for p in sorted(self.pictures, key=lambda p: p.poc)
                if p.output]

    def decode_nal(self, unit: nal_mod.NalUnit) -> None:
        bs = InputBitstream(unit.rbsp)
        t = unit.nal_type
        if t == nal_mod.NAL_UNIT_VPS:
            vps = headers.parse_vps(bs)
            self.vps_map[vps.vps_id] = vps
        elif t == nal_mod.NAL_UNIT_SPS:
            sps = headers.parse_sps(bs)
            self.sps_map[sps.sps_id] = sps
        elif t == nal_mod.NAL_UNIT_PPS:
            pps = headers.parse_pps(bs)
            self.pps_map[pps.pps_id] = pps
        elif t == nal_mod.NAL_UNIT_SEI:
            self.pending_sei.extend(headers.parse_sei_rbsp(unit.rbsp))
        elif nal_mod.is_slice_nal(t):
            if (self.max_temporal_layer >= 0
                    and unit.temporal_id > self.max_temporal_layer):
                return
            self._decode_slice(unit, bs)

    # ------------------------------------------------------------------
    def _decode_slice(self, unit: nal_mod.NalUnit, bs: InputBitstream) -> None:
        sh, sps, pps = headers.parse_slice_header(
            bs, unit.nal_type, unit.temporal_id, self.sps_map, self.pps_map,
            self.prev_poc)
        self.prev_poc = sh.poc

        # DPB bookkeeping (TDecTop::xDecodeSlice)
        if unit.nal_type == nal_mod.NAL_UNIT_CODED_SLICE_IDR:
            self.dpb.idr_flush()
        else:
            self.dpb.apply_rps(sh.rps, sh.poc)

        f = FrameModel(sps, pps)
        list0: list = []
        list1: list = []
        inter_pred = None
        mvctx = None
        if not sh.is_intra:
            list0, list1 = build_ref_lists(sh, self.dpb)
            col_pic = None
            if sh.tmvp_enabled:
                col_list = list1 if (sh.slice_type == 0 and sh.col_dir) \
                    else list0
                col_pic = col_list[sh.col_ref_idx]
            ldc = check_ldc(sh, list0, list1)
            mvctx = MvCtx(f, sh, sps, pps, list0, list1, col_pic, ldc)
            inter_pred = InterPredictor(f, sh, sps, pps, list0, list1)
        parser = SliceDataParser(f, sh, sps, pps, bs, mvctx)
        parser.parse_slice()

        w, h = sps.pic_width_in_luma_samples, sps.pic_height_in_luma_samples
        rec_y = np.zeros((h, w), np.int16)
        rec_cb = np.zeros((h // 2, w // 2), np.int16)
        rec_cr = np.zeros((h // 2, w // 2), np.int16)
        ref_pocs = [[p.poc for p in list0], [p.poc for p in list1]]
        reconstruct_frame(f, sh, sps, pps, rec_y, rec_cb, rec_cr, inter_pred)
        deblock_frame(f, sh, sps, pps, rec_y, rec_cb, rec_cr,
                      ref_pocs if not sh.is_intra else None)
        rec_y, rec_cb, rec_cr = sao_frame(f, sh, sps, rec_y, rec_cb, rec_cr)

        # store in DPB with colocated-motion snapshot (TComPic::compressMotion)
        dpb_pic = Picture(sh.poc, (rec_y, rec_cb, rec_cr), f, sh, ref_pocs,
                          margin=sps.max_cu_width + 16)
        dpb_pic.compress_motion()
        self.dpb.add(dpb_pic)

        frame = YuvFrame(rec_y, rec_cb, rec_cr)
        pic = DecodedPicture(sh.poc, frame)

        # digest verification (TDecGop::filterPicture)
        for sei in self.pending_sei:
            if sei.get("type") == "picture_digest":
                got = calc_digest(sei["method"], frame.planes(),
                                  sps.internal_bit_depth)
                pic.digest_ok = got == list(sei["digest"])
        self.pending_sei = []
        self.pictures.append(pic)
