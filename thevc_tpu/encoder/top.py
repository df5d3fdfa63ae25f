"""Encoder top level: parameter-set derivation, frame loop, AU assembly.

Behavioral reference: TEncTop.cpp (xInitSPS :463, xInitPPS :560, xInitRPS
:656), TAppEncTop.cpp (xInitLibCfg :68), TEncGOP.cpp (compressGOP :137 —
header NALs :680, slice NAL assembly :826-997, digest SEI :1149,
getNalUnitType :1728, xWriteTileLocationToSliceHeader :1809) and
TAppEncCfg.cpp xCheckParameter derivations.
"""

from __future__ import annotations

import math

import numpy as np

from .. import headers
from .. import nal as nal_mod
from ..digest import calc_digest
from ..decoder.frame import FrameModel
from ..decoder.filters import deblock_frame, sao_frame
from ..io.yuv import YuvFrame, YuvReader, YuvWriter
from ..params import I_SLICE, Pps, ReferencePictureSet, Sps, Vps
from . import slice_encoder as se
from ..utils.cfg import EncoderCfg


def derive_params(cfg: EncoderCfg):
    """Build (Vps, Sps, Pps) exactly as TAppEncTop + TEncTop would."""
    num_reorder, max_dpb = cfg.dpb_params()
    max_tl = cfg.max_temp_layer

    vps = Vps(max_t_layers=max_tl, max_layers=1)
    vps.num_reorder_pics = list(num_reorder)
    vps.max_dec_pic_buffering = list(max_dpb)

    internal_bd = cfg.internal_bit_depth or cfg.input_bit_depth
    sps = Sps()
    sps.pic_width_in_luma_samples = cfg.source_width
    sps.pic_height_in_luma_samples = cfg.source_height
    sps.max_cu_width = cfg.max_cu_width
    sps.max_cu_height = cfg.max_cu_height
    # g_uiAddCUDepth derivation (TAppEncCfg.cpp:928-933)
    add = 0
    while (cfg.max_cu_width >> cfg.max_partition_depth) > \
            (1 << (cfg.qt_tu_log2_min + add)):
        add += 1
    sps.max_cu_depth = cfg.max_partition_depth + add
    sps.add_cu_depth = add + 1
    sps.pcm_log2_min_size = cfg.pcm_log2_min_size
    sps.use_pcm = bool(cfg.use_pcm)
    sps.pcm_log2_max_size = cfg.pcm_log2_max_size
    sps.quadtree_tu_log2_max_size = cfg.qt_tu_log2_max
    sps.quadtree_tu_log2_min_size = cfg.qt_tu_log2_min
    sps.quadtree_tu_max_depth_inter = cfg.qt_tu_max_depth_inter
    sps.quadtree_tu_max_depth_intra = cfg.qt_tu_max_depth_intra
    sps.tmvp_flags_present = cfg.tmvp_mode != 0  # TEncGOP.cpp:402-412
    sps.max_tr_size = 1 << cfg.qt_tu_log2_max
    sps.use_amp = bool(cfg.enable_amp)
    sps.bit_depth = 8
    sps.bit_increment = internal_bd - 8
    sps.qp_bd_offset_y = 6 * (internal_bd - 8)
    sps.qp_bd_offset_c = 6 * (internal_bd - 8)
    sps.use_sao = bool(cfg.use_sao)
    sps.max_t_layers = max_tl
    sps.temporal_id_nesting_flag = False
    sps.max_dec_pic_buffering = list(max_dpb)
    sps.num_reorder_pics = list(num_reorder)
    sps.max_latency_increase = [0] * 8
    pcm_bd = cfg.input_bit_depth if cfg.pcm_input_bit_depth_flag else internal_bd
    sps.pcm_bit_depth_luma = pcm_bd
    sps.pcm_bit_depth_chroma = pcm_bd
    sps.pcm_filter_disable_flag = bool(cfg.pcm_filter_disable_flag)
    sps.scaling_list_enabled_flag = cfg.scaling_list != 0
    # TComSPS constructor defaults not touched by xInitSPS:
    sps.profile_space = 0
    sps.profile_idc = 0       # never set by the encoder in this draft
    sps.rsvd_ind_flags = 0
    sps.level_idc = 0
    sps.profile_compat = 0
    sps.bits_for_poc = 8
    sps.restricted_ref_pic_lists_flag = True
    sps.lists_modification_present_flag = False
    sps.long_term_refs_present = False
    sps.amvp_modes = [1] * 8

    # xInitRPS
    sps.rps_list = []
    for ge in cfg.gop_list[:cfg.gop_size]:
        rps = ReferencePictureSet()
        neg = sorted((p for p in ge.reference_pics if p < 0), reverse=True)
        pos = sorted(p for p in ge.reference_pics if p > 0)
        rps.num_negative_pics = len(neg)
        rps.num_positive_pics = len(pos)
        rps.delta_poc = neg + pos
        rps.used = [True] * len(rps.delta_poc)
        rps.inter_rps_prediction = False
        sps.rps_list.append(rps)

    pps = Pps()
    pps.constrained_intra_pred_flag = bool(cfg.constrained_intra_pred)
    use_dqp = cfg.max_cu_dqp_depth > 0
    if cfg.use_lossless:
        lowest_qp = -sps.qp_bd_offset_y
        if cfg.max_cu_dqp_depth == 0 and cfg.max_delta_qp == 0 \
                and int(cfg.qp) == lowest_qp:
            use_dqp = False
        else:
            use_dqp = True
    elif not use_dqp and (cfg.max_delta_qp != 0 or cfg.use_adaptive_qp):
        use_dqp = True
    pps.use_dqp = use_dqp
    pps.max_cu_dqp_depth = cfg.max_cu_dqp_depth if use_dqp else 0
    pps.chroma_cb_qp_offset = cfg.cb_qp_offset
    pps.chroma_cr_qp_offset = cfg.cr_qp_offset
    pps.num_substreams = 1
    pps.tiles_or_entropy_coding_sync_idc = \
        2 if cfg.wavefront_synchro else \
        (1 if (cfg.num_tile_columns_minus1 > 0 or cfg.num_tile_rows_minus1 > 0)
         else 0)
    pps.use_wp = bool(cfg.use_weighted_pred)
    pps.wp_bipred = bool(cfg.use_weighted_bipred)
    pps.output_flag_present_flag = False
    pps.sign_hide_flag = bool(cfg.sign_hide_flag)
    pps.deblocking_filter_control_present = bool(cfg.dbf_control_present)
    pps.log2_parallel_merge_level_minus2 = cfg.log2_parallel_merge_level - 2
    pps.cabac_init_present_flag = True  # CABAC_INIT_PRESENT_FLAG
    pps.lf_cross_slice_boundary_flag = bool(cfg.lf_cross_slice_boundary_flag)
    # numRefIdxL0DefaultActive: histogram mode of numRefPicsActive
    hist = [0] * 8
    for ge in cfg.gop_list[:cfg.gop_size]:
        if ge.num_ref_pics_active < 8:
            hist[ge.num_ref_pics_active] += 1
    best = max(range(8), key=lambda i: (hist[i], -i))
    pps.num_ref_idx_l0_default_active = best
    pps.num_ref_idx_l1_default_active = best
    pps.transquant_bypass_enable_flag = bool(cfg.transquant_bypass_enable_flag)
    pps.use_transform_skip = bool(cfg.use_transform_skip)
    pps.dependent_slices_enabled_flag = cfg.dependent_slice_mode != 0
    pps.cabac_independent_flag = bool(cfg.cabac_independent_flag)
    pps.pic_init_qp_minus26 = 0
    return vps, sps, pps


def _nal_unit_type(cfg: EncoderCfg, poc: int) -> int:
    """getNalUnitType (TEncGOP.cpp:1728), no CRA leading-pic handling."""
    if poc == 0:
        return nal_mod.NAL_UNIT_CODED_SLICE_IDR
    if cfg.intra_period > 0 and poc % cfg.intra_period == 0:
        if cfg.decoding_refresh_type == 1:
            return nal_mod.NAL_UNIT_CODED_SLICE_CRA
        if cfg.decoding_refresh_type == 2:
            return nal_mod.NAL_UNIT_CODED_SLICE_IDR
    return nal_mod.NAL_UNIT_CODED_SLICE


class Encoder:
    """Full encoder pipeline (all-intra path this round)."""

    def __init__(self, cfg: EncoderCfg):
        self.cfg = cfg
        self.vps, self.sps, self.pps = derive_params(cfg)
        self.frames_encoded = 0
        self.total_bits = 0
        self.psnr_sums = [0.0, 0.0, 0.0]
        # SAO_ENCODING_CHOICE early-termination state (persists per encoder)
        self._sao_rate_state = [[0.0] * 10, [0.0] * 10]

    # ------------------------------------------------------------------
    def encode_frame(self, org: YuvFrame, poc: int, first: bool):
        """Compress one picture; returns (au_bytes_list, recon YuvFrame).

        Mirrors one iteration of TEncGOP::compressGOP for GOPSize=1.
        """
        cfg = self.cfg
        sps, pps = self.sps, self.pps
        nal_type = _nal_unit_type(cfg, poc)
        sh, lam, weight, lam_chroma = se.init_enc_slice(
            cfg, sps, pps, poc, 0, nal_type)
        if nal_type != nal_mod.NAL_UNIT_CODED_SLICE_IDR and sh.is_intra:
            # non-IDR I slice refers to the SPS RPS list entry 0
            sh.rps_idx = 0
            sh.rps = sps.rps_list[0] if sps.rps_list else ReferencePictureSet()

        f = FrameModel(sps, pps)
        h, w = sps.pic_height_in_luma_samples, sps.pic_width_in_luma_samples
        rec_y = np.zeros((h, w), np.int16)
        rec_cb = np.zeros((h // 2, w // 2), np.int16)
        rec_cr = np.zeros((h // 2, w // 2), np.int16)

        cu = se.make_cu_encoder(cfg, sps, pps, sh, f,
                                (org.y, org.cb, org.cr),
                                (rec_y, rec_cb, rec_cr),
                                lam, weight, lam_chroma)
        se.compress_slice(cu)

        # in-loop filters run before the final entropy pass (TEncGOP:631+)
        deblock_frame(f, sh, sps, pps, rec_y, rec_cb, rec_cr)
        sao_write = None
        if sps.use_sao:
            from .sao_encoder import SaoEncoder
            sao = SaoEncoder(f, sh, sps, pps, cfg, lam, lam / weight,
                             (org.y, org.cb, org.cr),
                             depth_sao_rate=self._sao_rate_state,
                             gop_depth=getattr(sh, "gop_depth", 0),
                             init_frac=cu.go_on.frac_bits)
            rec_y, rec_cb, rec_cr = sao.process(rec_y, rec_cb, rec_cr)
            sao_write = sao.make_writer()

        # ---- assemble the access unit ----
        au = []
        if first:
            bs = headers.write_vps(self.vps)
            au.append((nal_mod.NAL_UNIT_VPS, 0, bs.get_bytes()))
            bs = headers.write_sps(sps)
            au.append((nal_mod.NAL_UNIT_SPS, 0, bs.get_bytes()))
            bs = headers.write_pps(pps)
            au.append((nal_mod.NAL_UNIT_PPS, 0, bs.get_bytes()))

        substream = se.encode_slice(cu, sao_write)
        hdr = headers.write_slice_header(sh, sps, pps, last_idr_poc=0)
        hdr.write_align_one()
        hdr.add_substream(substream)
        slice_nal = (nal_type, sh.temporal_id, hdr.get_bytes())

        if cfg.picture_digest:
            method = cfg.picture_digest - 1  # 1:MD5 2:CRC 3:checksum
            digest = calc_digest(method, (rec_y, rec_cb, rec_cr),
                                 sps.internal_bit_depth)
            bs = headers.write_sei_picture_digest(method, digest)
            au.append((nal_mod.NAL_UNIT_SEI, sh.temporal_id, bs.get_bytes()))
        au.append(slice_nal)

        data, _sizes = nal_mod.write_annexb(au)
        self._add_psnr(org, (rec_y, rec_cb, rec_cr), len(data) * 8)
        return data, YuvFrame(rec_y, rec_cb, rec_cr)

    def _add_psnr(self, org: YuvFrame, rec, bits: int) -> None:
        self.frames_encoded += 1
        self.total_bits += bits
        maxval = (1 << self.sps.internal_bit_depth) - 1
        for i, (o, r) in enumerate(zip((org.y, org.cb, org.cr), rec)):
            d = o.astype(np.int64) - r.astype(np.int64)
            sse = float(np.sum(d * d))
            if sse == 0.0:
                psnr = 999.99
            else:
                psnr = 10.0 * math.log10(maxval * maxval * o.size / sse)
            self.psnr_sums[i] += psnr

    # ------------------------------------------------------------------
    def encode(self, out_path: str | None = None):
        """Drive the whole sequence per the cfg; returns bitstream bytes."""
        cfg = self.cfg
        internal_bd = self.sps.internal_bit_depth
        reader = YuvReader(cfg.input_file, cfg.source_width, cfg.source_height,
                           cfg.input_bit_depth, internal_bd)
        reader.skip_frames(cfg.frame_skip)
        writer = None
        if cfg.recon_file:
            out_bd = cfg.output_bit_depth or internal_bd
            writer = YuvWriter(cfg.recon_file, out_bd, internal_bd)
        chunks = []
        poc = 0
        n = cfg.frames_to_be_encoded
        while n <= 0 or poc < n:
            org = reader.read_frame()
            if org is None:
                break
            data, rec = self.encode_frame(org, poc, first=(poc == 0))
            chunks.append(data)
            if writer is not None:
                writer.write_frame(rec)
            poc += 1
        reader.close()
        if writer is not None:
            writer.close()
        stream = b"".join(chunks)
        if out_path:
            with open(out_path, "wb") as fh:
                fh.write(stream)
        return stream
