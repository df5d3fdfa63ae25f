"""SAO parameter estimation (LCU-based RDO) + application.

Behavioral reference: TEncSampleAdaptiveOffset.cpp (SAOProcess :1225,
startSaoEnc :530, rdoSaoUnitAll :1466, saoComponentParamDist :1897,
sao2ChromaParamDist :2064, estSaoTypeDist :1808, estIterOffset :1858,
estSaoDist :1854, calcSaoStatsCuOrg :859, xRoundIbdi :85) and
TComSampleAdaptiveOffset.cpp (m_auiEoTable :94, m_lumaTableBo :181) with
the active macros SAO_SINGLE_MERGE, SAO_TYPE_SHARING, SAO_MERGE_ONE_CTX,
SAO_TYPE_CODING, SAO_ENCODING_CHOICE(+_CHROMA), SAO_SKIP_RIGHT,
SAOLcuBasedOptimization=1.

The per-CTU statistics are pure sign-comparison reductions over the
deblocked frame (vectorized here with numpy; the same formulation batches
over all CTUs on device — ops.jx will mirror it for the TPU path).

Syntax rate is measured with the fractional-bit counter starting from
fresh slice-init contexts (startSaoEnc calls resetEntropy), evolving only
through the chosen SAO syntax per CTU.
"""

from __future__ import annotations

import numpy as np

from ..cabac import contexts as cc
from ..cabac.bitcount import CounterEncoder
from .sbac_writer import SbacWriter

MAX_DOUBLE = 1.7e308
SAO_ENCODING_RATE = 0.75
SAO_ENCODING_RATE_CHROMA = 0.5
N_TYPES = 5          # EO_0, EO_1, EO_2, EO_3, BO
N_CLASSES = 33
BO_CLASSES = 32
BO_LEN = 4
EO_TABLE = np.array([1, 2, 0, 3, 4], np.int64)  # edgeType -> stats class


def _fsum4(vals, i):
    """Naive left-to-right double summation (C semantics; Python's sum()
    uses compensated summation since 3.12, which breaks RD tie-breaks)."""
    s = 0.0
    s += vals[i]
    s += vals[i + 1]
    s += vals[i + 2]
    s += vals[i + 3]
    return s


def _trunc_div(a: int, b: int) -> int:
    """C integer division (truncates toward zero)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def _round_ibdi(x: float, bit_increment: int) -> int:
    """xRoundIbdi (TEncSampleAdaptiveOffset.cpp:85-109): half-away rounding;
    the IBDI variant truncates to int first and uses C integer division."""
    if bit_increment > 0:
        ix = int(x)  # C double->int truncation
        if x > 0:
            return _trunc_div(ix + (1 << (bit_increment - 1)),
                              1 << bit_increment)
        return _trunc_div(ix - (1 << (bit_increment - 1)), 1 << bit_increment)
    return int(x + 0.5) if x >= 0 else -int(-x + 0.5)


class SaoUnit:
    __slots__ = ("type_idx", "sub_type", "offsets", "merge_left", "merge_up",
                 "length")

    def __init__(self):
        self.reset()

    def reset(self):
        self.type_idx = -1
        self.sub_type = 0
        self.offsets = [0, 0, 0, 0]
        self.merge_left = 0
        self.merge_up = 0
        self.length = 0

    def copy_from(self, other: "SaoUnit"):
        self.type_idx = other.type_idx
        self.sub_type = other.sub_type
        self.offsets = list(other.offsets)
        self.merge_left = other.merge_left
        self.merge_up = other.merge_up
        self.length = other.length


class SaoEncoder:
    """TEncSampleAdaptiveOffset equivalent for the LCU-based RDO path."""

    def __init__(self, frame, sh, sps, pps, cfg, lambda_luma: float,
                 lambda_chroma: float, org_planes, depth_sao_rate=None,
                 gop_depth: int = 0, init_frac: int = 0):
        self.f = frame
        self.sh = sh
        self.sps = sps
        self.pps = pps
        self.cfg = cfg
        self.lambda_luma = lambda_luma
        self.lambda_chroma = lambda_chroma
        self.org_y, self.org_cb, self.org_cr = org_planes
        self.gop_depth = gop_depth
        # persistent across pictures (SAO_ENCODING_CHOICE)
        self.depth_sao_rate = depth_sao_rate if depth_sao_rate is not None \
            else [[0.0] * 10, [0.0] * 10]

        bd = sps.internal_bit_depth
        self.bit_increment = sps.bit_increment
        self.sao_bit_increase = bd - min(bd, 10)
        self.offset_th = 1 << min(bd - 5, 5)
        self.shift = sps.bit_increment << 1
        self.bo_shift = bd - 5  # lumaTableBo: 1 + (pel >> (bd-5))

        self.bsao = [True, True]  # [luma, chroma] (SAO_TYPE_SHARING)
        # chosen per-CTU units [comp][ctu]
        self.units = [[SaoUnit() for _ in range(frame.num_ctus)]
                      for _ in range(3)]

        # RD coder state; startSaoEnc does resetEntropy + resetBits on the
        # GoOn coder, which keeps the post-compressSlice fractional-bit
        # residue (TEncBinCABAC::start never clears m_fracBits)
        from .slice_encoder import enc_init_type
        init = cc.make_context_states_idx(enc_init_type(sh, pps),
                                          sh.slice_qp)
        frac = init_frac & 32767
        self.go = CounterEncoder(init.copy())
        self.go.frac_bits = frac
        self.w = SbacWriter(frame, sh, sps, pps, self.go)
        self.curr_best = (init.copy(), frac)
        self.temp_best = (init.copy(), frac)

        # per-CTU stats [comp][type][class]
        self.count = np.zeros((3, N_TYPES, N_CLASSES), np.int64)
        self.offset_org = np.zeros((3, N_TYPES, N_CLASSES), np.int64)
        self.offset = np.zeros((3, N_TYPES, N_CLASSES), np.int64)

    # -- coder snapshots ----------------------------------------------------
    def _load(self, snap):
        ctx, frac = snap
        np.copyto(self.go.ctx, ctx)
        self.go.frac_bits = frac

    def _snap(self):
        return (self.go.ctx.copy(), self.go.frac_bits)

    # ==================================================================
    def process(self, rec_y, rec_cb, rec_cr):
        """SAOProcess: RDO fills frame SAO arrays, then apply offsets."""
        f = self.f
        sh = self.sh
        native_done = self._rdo_native(rec_y, rec_cb, rec_cr)
        if not native_done:
            self._rdo_sao_unit_all(rec_y, rec_cb, rec_cr)
            # store into frame arrays (decoder storage convention)
            for comp in range(3):
                for ctu in range(f.num_ctus):
                    u = self.units[comp][ctu]
                    f.sao_type[comp, ctu] = u.type_idx
                    f.sao_sub_type[comp, ctu] = u.sub_type
                    f.sao_offsets[comp, ctu] = u.offsets
                    f.sao_merge_left[comp, ctu] = bool(u.merge_left)
                    f.sao_merge_up[comp, ctu] = bool(u.merge_up)

        # TEncEntropy::setEntropyCoder:61-74 — the chroma slice flag is
        # forced 0 when the luma flag is off (and then no SAO data is
        # written at all, TEncSlice.cpp:1241)
        sh.sao_enabled = self.bsao[0]
        sh.sao_enabled_chroma = self.bsao[1] if self.bsao[0] else False
        from ..decoder.filters import sao_frame
        return sao_frame(f, sh, self.sps, rec_y, rec_cb, rec_cr)

    def _rdo_native(self, rec_y, rec_cb, rec_cr) -> bool:
        """Run rdoSaoUnitAll in the native core; returns False when the
        native library is unavailable (Python fallback runs instead)."""
        import os
        if os.environ.get("THEVC_NATIVE", "1") == "0":
            return False
        from .. import native
        lib = native.get_lib()
        if lib is None:
            return False
        import ctypes
        from ..decoder.native_parse import fill_frame_arrays

        f = self.f
        depth = self.gop_depth
        self.bsao = [True, True]
        if depth > 0 and self.depth_sao_rate[0][depth - 1] > \
                SAO_ENCODING_RATE:
            self.bsao[0] = False
        if depth > 0 and self.depth_sao_rate[1][depth - 1] > \
                SAO_ENCODING_RATE_CHROMA:
            self.bsao[1] = False

        fa = fill_frame_arrays(f)
        init = np.ascontiguousarray(self.go.ctx, np.uint8)  # slice-init copy
        rec_y = np.ascontiguousarray(rec_y, np.int16)
        rec_cb = np.ascontiguousarray(rec_cb, np.int16)
        rec_cr = np.ascontiguousarray(rec_cr, np.int16)
        org_y = np.ascontiguousarray(self.org_y, np.int16)
        org_cb = np.ascontiguousarray(self.org_cb, np.int16)
        org_cr = np.ascontiguousarray(self.org_cr, np.int16)
        out_no_sao = np.zeros(2, np.int64)
        lib.sao_rdo(
            ctypes.byref(fa), ctypes.byref(native.ctx_offsets()),
            rec_y.ctypes.data, rec_cb.ctypes.data, rec_cr.ctypes.data,
            org_y.ctypes.data, org_cb.ctypes.data,
            org_cr.ctypes.data,
            rec_y.shape[1], self.sps.internal_bit_depth, self.bit_increment,
            self.lambda_luma, self.lambda_chroma,
            int(self.bsao[0]), int(self.bsao[1]),
            init.ctypes.data, cc.NUM_CTX, self.go.frac_bits,
            out_no_sao.ctypes.data)
        n = float(f.num_ctus)
        self.depth_sao_rate[0][depth] = int(out_no_sao[0]) / n
        self.depth_sao_rate[1][depth] = int(out_no_sao[1]) / (n * 2)
        return True

    # ==================================================================
    # statistics (calcSaoStatsCuOrg)
    # ==================================================================
    def _calc_stats_cu(self, ctu: int, comp: int, rec, org):
        """Fill self.count/offset_org[comp] for one CTU (numpy-vectorized,
        same truncation/skip geometry as the reference)."""
        f = self.f
        chroma = comp != 0
        lcu = f.ctu_size >> (1 if chroma else 0)
        pic_w = f.width >> (1 if chroma else 0)
        pic_h = f.height >> (1 if chroma else 0)
        rx, ry = ctu % f.ctus_w, ctu // f.ctus_w
        lx, ty = rx * lcu, ry * lcu
        rpel = min(lx + lcu, pic_w)
        bpel = min(ty + lcu, pic_h)
        width = rpel - lx
        height = bpel - ty
        skip_n = 2 if chroma else 4
        skip_r = 3 if chroma else 5

        cnt = self.count[comp]
        sums = self.offset_org[comp]
        cnt[:] = 0
        sums[:] = 0
        r = rec.astype(np.int64)
        o = org.astype(np.int64)
        diff_full = o - r

        def acc(type_idx, ys, ye, xs, xe, et):
            d = diff_full[ty + ys:ty + ye, lx + xs:lx + xe].reshape(-1)
            cls = EO_TABLE[et.reshape(-1)]
            np.add.at(sums[type_idx], cls, d)
            np.add.at(cnt[type_idx], cls, 1)

        # ---- BO ----
        end_x = width if rpel == pic_w else width - skip_r
        end_y = height if bpel == pic_h else height - skip_n
        if end_x > 0 and end_y > 0:
            blk_r = r[ty:ty + end_y, lx:lx + end_x]
            cls = 1 + (blk_r >> self.bo_shift)
            d = diff_full[ty:ty + end_y, lx:lx + end_x]
            np.add.at(sums[4], cls.reshape(-1), d.reshape(-1))
            np.add.at(cnt[4], cls.reshape(-1), 1)

        sgn = np.sign

        # ---- EO_0 (horizontal) ----
        xs = 1 if lx == 0 else 0
        xe = (width - 1) if rpel == pic_w else width - skip_r
        ye = height - skip_n
        if xe > xs and ye > 0:
            c = r[ty:ty + ye, lx + xs:lx + xe]
            left = r[ty:ty + ye, lx + xs - 1:lx + xe - 1]
            right = r[ty:ty + ye, lx + xs + 1:lx + xe + 1]
            et = (sgn(c - left) + sgn(c - right) + 2).astype(np.int64)
            acc(0, 0, ye, xs, xe, et)

        # ---- EO_1 (vertical) ----
        ys = 1 if ty == 0 else 0
        ye = (height - 1) if bpel == pic_h else height - skip_n
        xe = width if rpel == pic_w else width - skip_r
        if ye > ys and xe > 0:
            c = r[ty + ys:ty + ye, lx:lx + xe]
            up = r[ty + ys - 1:ty + ye - 1, lx:lx + xe]
            dn = r[ty + ys + 1:ty + ye + 1, lx:lx + xe]
            et = (sgn(c - up) + sgn(c - dn) + 2).astype(np.int64)
            acc(1, ys, ye, 0, xe, et)

        # ---- EO_2 (135 degrees) ----
        xs = 1 if lx == 0 else 0
        xe = (width - 1) if rpel == pic_w else width - skip_r
        ys = 1 if ty == 0 else 0
        ye = (height - 1) if bpel == pic_h else height - skip_n
        if xe > xs and ye > ys:
            c = r[ty + ys:ty + ye, lx + xs:lx + xe]
            ul = r[ty + ys - 1:ty + ye - 1, lx + xs - 1:lx + xe - 1]
            dr = r[ty + ys + 1:ty + ye + 1, lx + xs + 1:lx + xe + 1]
            et = (sgn(c - ul) + sgn(c - dr) + 2).astype(np.int64)
            acc(2, ys, ye, xs, xe, et)

        # ---- EO_3 (45 degrees) ----
        if xe > xs and ye > ys:
            c = r[ty + ys:ty + ye, lx + xs:lx + xe]
            ur = r[ty + ys - 1:ty + ye - 1, lx + xs + 1:lx + xe + 1]
            dl = r[ty + ys + 1:ty + ye + 1, lx + xs - 1:lx + xe - 1]
            et = (sgn(c - ur) + sgn(c - dl) + 2).astype(np.int64)
            acc(3, ys, ye, xs, xe, et)

    # ==================================================================
    # offset estimation (estSaoTypeDist / estIterOffset / estSaoDist)
    # ==================================================================
    @staticmethod
    def _est_sao_dist(count, offset, offset_org, shift):
        return (count * offset * offset - offset_org * offset * 2) >> shift

    def _est_iter_offset(self, type_idx, class_idx, lam, offset_input, count,
                         offset_org, dist_bo, cost_bo):
        iter_offset = int(offset_input)
        offset_output = 0
        temp_min_cost = lam
        while iter_offset != 0:
            temp_rate = (abs(iter_offset) + 2) if type_idx == 4 \
                else (abs(iter_offset) + 1)
            if abs(iter_offset) == self.offset_th - 1:
                temp_rate -= 1
            temp_offset = iter_offset << self.sao_bit_increase
            temp_dist = self._est_sao_dist(count, temp_offset, offset_org,
                                           self.shift)
            temp_cost = float(temp_dist) + lam * float(temp_rate)
            if temp_cost < temp_min_cost:
                temp_min_cost = temp_cost
                offset_output = iter_offset
                if type_idx == 4:
                    dist_bo[class_idx - 1] = int(temp_dist)
                    cost_bo[class_idx - 1] = temp_cost
            iter_offset = iter_offset - 1 if iter_offset > 0 else iter_offset + 1
        return offset_output

    def _est_sao_type_dist(self, comp, type_idx, lam, dist_bo, cost_bo):
        est_dist = 0
        n = (4 + 1) if type_idx < 4 else (BO_CLASSES + 1)
        for class_idx in range(1, n):
            if type_idx == 4:
                dist_bo[class_idx - 1] = 0
                cost_bo[class_idx - 1] = lam
            cnt = int(self.count[comp][type_idx][class_idx])
            if cnt:
                num = float(int(self.offset_org[comp][type_idx][class_idx])
                            << self.bit_increment)
                den = float(cnt << self.sao_bit_increase)
                off = _round_ibdi(num / den, self.bit_increment)
                off = max(-self.offset_th + 1, min(self.offset_th - 1, off))
                if type_idx < 4:
                    if off < 0 and class_idx < 3:
                        off = 0
                    if off > 0 and class_idx >= 3:
                        off = 0
                off = self._est_iter_offset(
                    type_idx, class_idx, lam, off, cnt,
                    int(self.offset_org[comp][type_idx][class_idx]),
                    dist_bo, cost_bo)
                self.offset[comp][type_idx][class_idx] = off
            else:
                self.offset_org[comp][type_idx][class_idx] = 0
                self.offset[comp][type_idx][class_idx] = 0
            if type_idx != 4:
                est_dist += self._est_sao_dist(
                    int(self.count[comp][type_idx][class_idx]),
                    int(self.offset[comp][type_idx][class_idx])
                    << self.sao_bit_increase,
                    int(self.offset_org[comp][type_idx][class_idx]),
                    self.shift)
        return int(est_dist)

    # -- rate helper --------------------------------------------------------
    def _code_unit(self, unit: SaoUnit, comp: int) -> None:
        self.w.code_sao_offset(comp, unit.type_idx, unit.sub_type,
                               unit.offsets, self.sps.internal_bit_depth)

    # ==================================================================
    # per-component RDO (saoComponentParamDist / sao2ChromaParamDist)
    # ==================================================================
    def _component_param_dist(self, allow_l, allow_u, ctu, comp, lam,
                              merge_units, comp_distortion):
        f = self.f
        best_unit = self.units[comp][ctu]
        best_unit.reset()
        merge_units[0].reset()
        merge_units[1].reset()

        dist_bo = [0] * (N_CLASSES - 1)
        cost_bo = [0.0] * (N_CLASSES - 1)
        best_rd_bo = MAX_DOUBLE
        best_class_bo = 0

        rdo = SaoUnit()
        self._load(self.temp_best)
        self.go.reset_bits()
        self._code_unit(rdo, comp)
        cost_best = self.go.num_written_bits * lam
        best_unit.copy_from(rdo)
        best_dist = 0

        for type_idx in range(N_TYPES):
            est_dist = self._est_sao_type_dist(comp, type_idx, lam,
                                               dist_bo, cost_bo)
            if type_idx == 4:
                for i in range(BO_CLASSES - BO_LEN + 1):
                    cur = _fsum4(cost_bo, i)
                    if cur < best_rd_bo:
                        best_rd_bo = cur
                        best_class_bo = i
                est_dist = sum(dist_bo[best_class_bo:best_class_bo + BO_LEN])
            rdo.reset()
            rdo.length = 4
            rdo.type_idx = type_idx
            rdo.sub_type = best_class_bo if type_idx == 4 else type_idx
            for ci in range(4):
                rdo.offsets[ci] = int(
                    self.offset[comp][type_idx]
                    [ci + (best_class_bo if type_idx == 4 else 0) + 1])
            self._load(self.temp_best)
            self.go.reset_bits()
            self._code_unit(rdo, comp)
            est_rate = self.go.num_written_bits
            cost = float(est_dist) + lam * float(est_rate)
            if cost < cost_best:
                cost_best = cost
                best_unit.copy_from(rdo)
                best_dist = est_dist

        comp_distortion[0] += float(best_dist) / lam
        self._load(self.temp_best)
        self._code_unit(best_unit, comp)
        self.temp_best = self._snap()

        # merge candidates
        for idx_neighbor in range(2):
            nb = None
            if allow_l and idx_neighbor == 0 and ctu % f.ctus_w > 0:
                nb = self.units[comp][ctu - 1]
            elif allow_u and idx_neighbor == 1 and ctu >= f.ctus_w:
                nb = self.units[comp][ctu - f.ctus_w]
            if nb is None:
                continue
            est_dist = 0
            if nb.type_idx >= 0:
                band = nb.sub_type if nb.type_idx == 4 else 0
                for ci in range(4):
                    est_dist += self._est_sao_dist(
                        int(self.count[comp][nb.type_idx][ci + band + 1]),
                        nb.offsets[ci],
                        int(self.offset_org[comp][nb.type_idx][ci + band + 1]),
                        self.shift)
            merge_units[idx_neighbor].copy_from(nb)
            merge_units[idx_neighbor].merge_up = idx_neighbor
            merge_units[idx_neighbor].merge_left = 1 - idx_neighbor
            comp_distortion[idx_neighbor + 1] += float(est_dist) / lam

    def _chroma2_param_dist(self, allow_l, allow_u, ctu, lam,
                            merge_cb, merge_cr, distortion):
        f = self.f
        best = [self.units[1][ctu], self.units[2][ctu]]
        best[0].reset()
        best[1].reset()
        merge_param = [[merge_cb[0], merge_cb[1]], [merge_cr[0], merge_cr[1]]]
        for cu in (merge_cb + merge_cr):
            cu.reset()

        dist_bo = [0] * (N_CLASSES - 1)
        cost_bo = [0.0] * (N_CLASSES - 1)
        best_class_bo = [0, 0]
        est_dist = [0, 0]

        rdo = [SaoUnit(), SaoUnit()]
        self._load(self.temp_best)
        self.go.reset_bits()
        self._code_unit(rdo[0], 1)
        self._code_unit(rdo[1], 2)
        cost_best = self.go.num_written_bits * lam
        best[0].copy_from(rdo[0])
        best[1].copy_from(rdo[1])
        best_dist = 0

        for type_idx in range(N_TYPES):
            if type_idx == 4:
                for ci in range(2):
                    best_rd_bo = MAX_DOUBLE
                    est_dist[ci] = self._est_sao_type_dist(
                        ci + 1, type_idx, lam, dist_bo, cost_bo)
                    for i in range(BO_CLASSES - BO_LEN + 1):
                        cur = _fsum4(cost_bo, i)
                        if cur < best_rd_bo:
                            best_rd_bo = cur
                            best_class_bo[ci] = i
                    est_dist[ci] = sum(
                        dist_bo[best_class_bo[ci]:best_class_bo[ci] + BO_LEN])
            else:
                est_dist[0] = self._est_sao_type_dist(1, type_idx, lam,
                                                      dist_bo, cost_bo)
                est_dist[1] = self._est_sao_type_dist(2, type_idx, lam,
                                                      dist_bo, cost_bo)

            self._load(self.temp_best)
            self.go.reset_bits()
            for ci in range(2):
                rdo[ci].reset()
                rdo[ci].length = 4
                rdo[ci].type_idx = type_idx
                rdo[ci].sub_type = best_class_bo[ci] if type_idx == 4 \
                    else type_idx
                for k in range(4):
                    rdo[ci].offsets[k] = int(
                        self.offset[ci + 1][type_idx]
                        [k + (best_class_bo[ci] if type_idx == 4 else 0) + 1])
                self._code_unit(rdo[ci], ci + 1)
            est_rate = self.go.num_written_bits
            cost = float(est_dist[0] + est_dist[1]) + lam * float(est_rate)
            if cost < cost_best:
                cost_best = cost
                best[0].copy_from(rdo[0])
                best[1].copy_from(rdo[1])
                best_dist = est_dist[0] + est_dist[1]

        distortion[0] += float(best_dist) / lam
        self._load(self.temp_best)
        self._code_unit(best[0], 1)
        self._code_unit(best[1], 2)
        self.temp_best = self._snap()

        for idx_neighbor in range(2):
            for ci in range(2):
                nb = None
                if allow_l and idx_neighbor == 0 and ctu % f.ctus_w > 0:
                    nb = self.units[ci + 1][ctu - 1]
                elif allow_u and idx_neighbor == 1 and ctu >= f.ctus_w:
                    nb = self.units[ci + 1][ctu - f.ctus_w]
                if nb is None:
                    continue
                dist_c = 0
                if nb.type_idx >= 0:
                    band = nb.sub_type if nb.type_idx == 4 else 0
                    for k in range(4):
                        dist_c += self._est_sao_dist(
                            int(self.count[ci + 1][nb.type_idx][k + band + 1]),
                            nb.offsets[k],
                            int(self.offset_org[ci + 1][nb.type_idx]
                                [k + band + 1]),
                            self.shift)
                merge_param[ci][idx_neighbor].copy_from(nb)
                merge_param[ci][idx_neighbor].merge_up = idx_neighbor
                merge_param[ci][idx_neighbor].merge_left = 1 - idx_neighbor
                distortion[idx_neighbor + 1] += float(dist_c) / lam

    # ==================================================================
    # rdoSaoUnitAll
    # ==================================================================
    def _rdo_sao_unit_all(self, rec_y, rec_cb, rec_cr) -> None:
        f = self.f
        depth = self.gop_depth
        self.bsao = [True, True]
        if depth > 0 and self.depth_sao_rate[0][depth - 1] > SAO_ENCODING_RATE:
            self.bsao[0] = False
        if depth > 0 and self.depth_sao_rate[1][depth - 1] > \
                SAO_ENCODING_RATE_CHROMA:
            self.bsao[1] = False
        num_no_sao = [0, 0]

        rec = [rec_y, rec_cb, rec_cr]
        org = [self.org_y, self.org_cb, self.org_cr]

        # per-CTU tile and slice indices for merge allowances
        # (rdoSaoUnitAll: "check tile id and slice id")
        upr = f.units_per_row
        ctu_tile = f.tile_idx[::upr, ::upr].reshape(-1)
        ctu_slice = f.slice_idx[::upr, ::upr].reshape(-1)

        for ctu in range(f.num_ctus):
            rx, ry = ctu % f.ctus_w, ctu // f.ctus_w
            allow_l = rx != 0 and ctu_tile[ctu - 1] == ctu_tile[ctu] and \
                ctu_slice[ctu - 1] == ctu_slice[ctu]
            allow_u = ry != 0 and \
                ctu_tile[ctu - f.ctus_w] == ctu_tile[ctu] and \
                ctu_slice[ctu - f.ctus_w] == ctu_slice[ctu]

            comp_distortion = [0.0, 0.0, 0.0]
            self._load(self.curr_best)
            if allow_l:
                self.w.code_sao_merge(0)
            if allow_u:
                self.w.code_sao_merge(0)
            self.temp_best = self._snap()

            self.count[:] = 0
            self.offset_org[:] = 0
            for comp in range(3):
                u = self.units[comp][ctu]
                u.type_idx = -1
                u.merge_up = 0
                u.merge_left = 0
                u.sub_type = 0
                if (comp == 0 and self.bsao[0]) or (comp > 0 and self.bsao[1]):
                    self._calc_stats_cu(ctu, comp, rec[comp], org[comp])

            merge_units = [[SaoUnit(), SaoUnit()] for _ in range(3)]
            self._component_param_dist(allow_l, allow_u, ctu, 0,
                                       self.lambda_luma, merge_units[0],
                                       comp_distortion)
            self._chroma2_param_dist(allow_l, allow_u, ctu,
                                     self.lambda_chroma, merge_units[1],
                                     merge_units[2], comp_distortion)

            if self.bsao[0] or self.bsao[1]:
                # cost of new params
                self._load(self.curr_best)
                self.go.reset_bits()
                if allow_l:
                    self.w.code_sao_merge(0)
                if allow_u:
                    self.w.code_sao_merge(0)
                for comp in range(3):
                    if (comp == 0 and self.bsao[0]) or \
                            (comp > 0 and self.bsao[1]):
                        self._code_unit(self.units[comp][ctu], comp)
                rate = self.go.num_written_bits
                best_cost = comp_distortion[0] + float(rate)
                self.temp_best = self._snap()

                # cost of merge
                for merge_up in range(2):
                    if not ((allow_l and merge_up == 0) or
                            (allow_u and merge_up == 1)):
                        continue
                    self._load(self.curr_best)
                    self.go.reset_bits()
                    if allow_l:
                        self.w.code_sao_merge(1 - merge_up)
                    if allow_u and merge_up == 1:
                        self.w.code_sao_merge(1)
                    rate = self.go.num_written_bits
                    merge_cost = comp_distortion[merge_up + 1] + float(rate)
                    if merge_cost < best_cost:
                        best_cost = merge_cost
                        self.temp_best = self._snap()
                        for comp in range(3):
                            merge_units[comp][merge_up].merge_left = \
                                1 - merge_up
                            merge_units[comp][merge_up].merge_up = merge_up
                            if (comp == 0 and self.bsao[0]) or \
                                    (comp > 0 and self.bsao[1]):
                                self.units[comp][ctu].copy_from(
                                    merge_units[comp][merge_up])

                if self.units[0][ctu].type_idx == -1:
                    num_no_sao[0] += 1
                if self.units[1][ctu].type_idx == -1:
                    num_no_sao[1] += 2
                self._load(self.temp_best)
                self.curr_best = self._snap()

        n = float(f.num_ctus)
        self.depth_sao_rate[0][depth] = num_no_sao[0] / n
        self.depth_sao_rate[1][depth] = num_no_sao[1] / (n * 2)

    # ==================================================================
    # encodeSlice-side writer (TEncSlice.cpp:1241-1332)
    # ==================================================================
    def make_writer(self):
        f = self.f
        bsao = self.bsao

        def sao_write(w: SbacWriter, ctu: int, cu_in_slice: int = None,
                      tile_ok_l: bool = True, tile_ok_u: bool = True) -> None:
            """Final-pass SAO syntax for one CTU (TEncSlice.cpp:1241-1332).
            cu_in_slice is the raster distance from the slice start;
            tile_ok_* gate merges across tile boundaries."""
            rx, ry = ctu % f.ctus_w, ctu // f.ctus_w
            if cu_in_slice is None:
                cu_in_slice = ctu
            cu_up_in_slice = cu_in_slice - f.ctus_w
            allow_l = tile_ok_l and rx > 0 and cu_in_slice != 0
            allow_u = tile_ok_u and ry > 0 and cu_up_in_slice >= 0
            if not bsao[0]:
                return   # per-CTU SAO writes gated on the LUMA flag only
            merge_left = int(f.sao_merge_left[0, ctu]) if allow_l else 0
            if allow_l:
                w.code_sao_merge(merge_left)
            if merge_left == 0:
                merge_up = int(f.sao_merge_up[0, ctu]) if allow_u else 0
                if allow_u:
                    w.code_sao_merge(merge_up)
                if merge_up == 0:
                    for comp in range(3):
                        if (comp == 0 and bsao[0]) or (comp > 0 and bsao[1]):
                            w.code_sao_offset(
                                comp, int(f.sao_type[comp, ctu]),
                                int(f.sao_sub_type[comp, ctu]),
                                [int(v) for v in f.sao_offsets[comp, ctu]],
                                self.sps.internal_bit_depth)

        return sao_write
