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
from .recon import reconstruct_intra_frame


@dataclass
class DecodedPicture:
    poc: int
    frame: YuvFrame
    output: bool = True
    digest_ok: Optional[bool] = None


class Decoder:
    """Sequential host decoder driving batched reconstruction ops."""

    def __init__(self) -> None:
        self.vps_map: Dict[int, Vps] = {}
        self.sps_map: Dict[int, Sps] = {}
        self.pps_map: Dict[int, Pps] = {}
        self.prev_poc = 0
        self.pending_sei: List[dict] = []
        self.pictures: List[DecodedPicture] = []

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
            self._decode_slice(unit, bs)

    # ------------------------------------------------------------------
    def _decode_slice(self, unit: nal_mod.NalUnit, bs: InputBitstream) -> None:
        sh, sps, pps = headers.parse_slice_header(
            bs, unit.nal_type, unit.temporal_id, self.sps_map, self.pps_map,
            self.prev_poc)
        self.prev_poc = sh.poc

        if not sh.is_intra:
            raise NotImplementedError("inter slices (round 2)")

        f = FrameModel(sps, pps)
        parser = SliceDataParser(f, sh, sps, pps, bs)
        parser.parse_slice()

        w, h = sps.pic_width_in_luma_samples, sps.pic_height_in_luma_samples
        rec_y = np.zeros((h, w), np.int16)
        rec_cb = np.zeros((h // 2, w // 2), np.int16)
        rec_cr = np.zeros((h // 2, w // 2), np.int16)
        reconstruct_intra_frame(f, sh, sps, pps, rec_y, rec_cb, rec_cr)
        deblock_frame(f, sh, sps, pps, rec_y, rec_cb, rec_cr)
        rec_y, rec_cb, rec_cr = sao_frame(f, sh, sps, rec_y, rec_cb, rec_cr)

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
