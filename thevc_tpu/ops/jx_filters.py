"""JAX/TPU in-loop filters: whole-frame deblocking + SAO in one launch.

Behavioral reference: TComLoopFilter.cpp xPelFilterLuma (:799) /
xPelFilterChroma (:870) / loopFilterPic ordering (:153, all vertical edges
then all horizontal); TComSampleAdaptiveOffset.cpp processSaoCuOrg (:781),
SAOProcess (:1005).  The numpy modules ops.deblock / ops.sao are the
bit-exact host mirrors; this module expresses the same integer math as
static-shape batched gathers + elementwise ops so the whole post-recon
filter chain of a picture (deblock VER, deblock HOR, SAO, all three
planes) is ONE jit launch — the host<->device round-trip latency
(~30 ms through an axon tunnel) is paid once per frame, not per stage.

Every edge on the 8-pel deblocking grid is independent within a direction
(the filter touches +-4 pels around an edge, edges are >=8 apart), so each
direction is a single [n_rows, n_edges, lines, taps] tensor op.  SAO reads
only pre-SAO samples (HM's line-buffer dance made functional), so it is a
pure per-pixel gather + table lookup.

All normative math stays in int32 with explicit shifts — no float path
(SURVEY.md section 7 hard part d).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..common.rom import CHROMA_SCALE
from .deblock import BETA_TABLE, DEFAULT_INTRA_TC_OFFSET, TC_TABLE

_TC = jnp.asarray(TC_TABLE, jnp.int32)
_BETA = jnp.asarray(BETA_TABLE, jnp.int32)
_CHROMA_SCALE = jnp.asarray(np.asarray(CHROMA_SCALE, np.int32), jnp.int32)


def _clip3(lo, hi, v):
    return jnp.minimum(hi, jnp.maximum(lo, v))


# ---------------------------------------------------------------------------
# Deblocking
# ---------------------------------------------------------------------------

def _luma_dir(plane, flags, bs, qp_p, qp_q, no_p, no_q,
              beta_offset, tc_offset, bit_depth):
    """One direction of luma deblocking (vertical edges of `plane`).

    plane: [H, W] int32, H % 4 == 0, W % 8 == 0.
    flags/bs/...: per 4x4 unit [H//4, W//4] (edge on the LEFT of the unit).
    Mirrors ops.deblock.filter_luma_edges column loop, all edges at once.
    """
    h, w = plane.shape
    n_rows = h // 4
    n_edges = w // 8 - 1          # edges at x = 8, 16, ..., W-8
    if n_edges <= 0:
        return plane
    scale = 1 << (bit_depth - 8)
    max_val = (1 << bit_depth) - 1

    ucols = 2 + 2 * jnp.arange(n_edges)            # unit col of each edge
    sel = lambda a: a[:, ucols]                    # [n_rows_u, n_edges]
    active = sel(flags) & (sel(bs) > 0)            # [uh, nE] -> slice rows
    active = active[:n_rows]
    b = sel(bs)[:n_rows].astype(jnp.int32)
    qp = (sel(qp_p)[:n_rows].astype(jnp.int32) + sel(qp_q)[:n_rows] + 1) >> 1
    idx_tc = _clip3(0, 53, qp + DEFAULT_INTRA_TC_OFFSET * (b - 1)
                    + (tc_offset << 1))
    idx_b = _clip3(0, 51, qp + (beta_offset << 1))
    tc = _TC[idx_tc] * scale                       # [n_rows, nE]
    beta = _BETA[idx_b] * scale
    side_thresh = (beta + (beta >> 1)) >> 3
    thr_cut = tc * 10
    no_pv = sel(no_p)[:n_rows].astype(bool)
    no_qv = sel(no_q)[:n_rows].astype(bool)

    # stripes [n_rows, 4, nE, 8]: rows 4y..4y+4, cols 8(j+1)-4..8(j+1)+4
    mid = plane[:, 4:w - 4].reshape(n_rows, 4, n_edges, 8)
    m = [mid[:, :, :, k].transpose(0, 2, 1) for k in range(8)]
    # m[k]: [n_rows, nE, 4 lines]

    dp0 = jnp.abs(m[1][..., 0] - 2 * m[2][..., 0] + m[3][..., 0])
    dq0 = jnp.abs(m[4][..., 0] - 2 * m[5][..., 0] + m[6][..., 0])
    dp3 = jnp.abs(m[1][..., 3] - 2 * m[2][..., 3] + m[3][..., 3])
    dq3 = jnp.abs(m[4][..., 3] - 2 * m[5][..., 3] + m[6][..., 3])
    d0 = dp0 + dq0
    d3 = dp3 + dq3
    d = d0 + d3

    do_filter = active & (d < beta)
    filter_p = (dp0 + dp3) < side_thresh
    filter_q = (dq0 + dq3) < side_thresh

    def strong_check(line, dd):
        ds = (jnp.abs(m[0][..., line] - m[3][..., line])
              + jnp.abs(m[7][..., line] - m[4][..., line]))
        return ((ds < (beta >> 3)) & (2 * dd < (beta >> 2))
                & (jnp.abs(m[3][..., line] - m[4][..., line])
                   < ((tc * 5 + 1) >> 1)))

    sw = strong_check(0, d0) & strong_check(3, d3)

    tcv = tc[..., None]
    s_m3 = _clip3(m[3] - 2 * tcv, m[3] + 2 * tcv,
                  (m[1] + 2 * m[2] + 2 * m[3] + 2 * m[4] + m[5] + 4) >> 3)
    s_m4 = _clip3(m[4] - 2 * tcv, m[4] + 2 * tcv,
                  (m[2] + 2 * m[3] + 2 * m[4] + 2 * m[5] + m[6] + 4) >> 3)
    s_m2 = _clip3(m[2] - 2 * tcv, m[2] + 2 * tcv,
                  (m[1] + m[2] + m[3] + m[4] + 2) >> 2)
    s_m5 = _clip3(m[5] - 2 * tcv, m[5] + 2 * tcv,
                  (m[3] + m[4] + m[5] + m[6] + 2) >> 2)
    s_m1 = _clip3(m[1] - 2 * tcv, m[1] + 2 * tcv,
                  (2 * m[0] + 3 * m[1] + m[2] + m[3] + m[4] + 4) >> 3)
    s_m6 = _clip3(m[6] - 2 * tcv, m[6] + 2 * tcv,
                  (m[3] + m[4] + m[5] + 3 * m[6] + 2 * m[7] + 4) >> 3)

    delta = (9 * (m[4] - m[3]) - 3 * (m[5] - m[2]) + 8) >> 4
    weak_ok = jnp.abs(delta) < thr_cut[..., None]
    delta_c = _clip3(-tcv, tcv, delta)
    w_m3 = jnp.clip(m[3] + delta_c, 0, max_val)
    w_m4 = jnp.clip(m[4] - delta_c, 0, max_val)
    tc2 = (tc >> 1)[..., None]
    delta1 = _clip3(-tc2, tc2,
                    (((m[1] + m[3] + 1) >> 1) - m[2] + delta_c) >> 1)
    w_m2 = jnp.clip(m[2] + delta1, 0, max_val)
    delta2 = _clip3(-tc2, tc2,
                    (((m[6] + m[4] + 1) >> 1) - m[5] - delta_c) >> 1)
    w_m5 = jnp.clip(m[5] + delta2, 0, max_val)

    swv = (do_filter & sw)[..., None]
    wsel = (do_filter & ~sw)[..., None] & weak_ok
    fpv = filter_p[..., None]
    fqv = filter_q[..., None]
    npv = no_pv[..., None]
    nqv = no_qv[..., None]

    out = list(m)
    out[3] = jnp.where(swv, s_m3, jnp.where(wsel, w_m3, m[3]))
    out[4] = jnp.where(swv, s_m4, jnp.where(wsel, w_m4, m[4]))
    out[2] = jnp.where(swv, s_m2, jnp.where(wsel & fpv, w_m2, m[2]))
    out[5] = jnp.where(swv, s_m5, jnp.where(wsel & fqv, w_m5, m[5]))
    out[1] = jnp.where(swv, s_m1, m[1])
    out[6] = jnp.where(swv, s_m6, m[6])
    for k in (1, 2, 3):
        out[k] = jnp.where(npv, m[k], out[k])
    for k in (4, 5, 6):
        out[k] = jnp.where(nqv, m[k], out[k])

    new_mid = jnp.stack(out, axis=-1)              # [n_rows, nE, 4, 8]
    new_mid = new_mid.transpose(0, 2, 1, 3).reshape(h, w - 8)
    return jnp.concatenate([plane[:, :4], new_mid, plane[:, w - 4:]], axis=1)


def _chroma_dir(cb, cr, flags, bs, qp_p, qp_q, no_p, no_q,
                tc_offset, bit_depth):
    """One direction of chroma deblocking (vertical edges, BS > 1 only,
    every 16 luma pels = every 8 chroma pels)."""
    h, w = cb.shape                                # chroma dims
    n_rows = h // 2                                # 2 chroma lines per unit
    n_edges = (w - 2) // 8                         # edges at xc = 8,16,...
    if n_edges <= 0:
        return cb, cr
    scale = 1 << (bit_depth - 8)
    max_val = (1 << bit_depth) - 1

    ucols = 4 + 4 * jnp.arange(n_edges)            # luma unit col per edge
    sel = lambda a: a[:n_rows, ucols]
    active = sel(flags) & (sel(bs) > 1)
    qp_avg = (sel(qp_p).astype(jnp.int32) + sel(qp_q) + 1) >> 1
    qp = _CHROMA_SCALE[_clip3(0, 51, qp_avg)]
    b = sel(bs).astype(jnp.int32)
    idx_tc = _clip3(0, 53, qp + DEFAULT_INTRA_TC_OFFSET * (b - 1)
                    + (tc_offset << 1))
    tc = (_TC[idx_tc] * scale)[..., None]
    npv = sel(no_p).astype(bool)[..., None]
    nqv = sel(no_q).astype(bool)[..., None]
    activev = active[..., None]

    # stripes [n_rows, 2, nE, 4]: cols 8(j+1)-2 .. 8(j+1)+2
    cols = (8 * (jnp.arange(n_edges) + 1))[:, None] + jnp.arange(-2, 2)[None]

    def one(plane):
        stripes = plane[:, cols]                   # [h, nE, 4]
        stripes = stripes.reshape(n_rows, 2, n_edges, 4)
        m2, m3, m4, m5 = (stripes[:, :, :, k].transpose(0, 2, 1)
                          for k in range(4))      # [n_rows, nE, 2]
        delta = _clip3(-tc, tc, ((((m4 - m3) << 2) + m2 - m5 + 4) >> 3))
        o3 = jnp.clip(m3 + delta, 0, max_val)
        o4 = jnp.clip(m4 - delta, 0, max_val)
        o3 = jnp.where(activev & ~npv, o3, m3)
        o4 = jnp.where(activev & ~nqv, o4, m4)
        new = jnp.stack([m2, o3, o4, m5], axis=-1)     # [n_rows, nE, 2, 4]
        new = new.transpose(0, 2, 1, 3).reshape(h, n_edges, 4)
        return plane.at[:, cols].set(new)

    return one(cb), one(cr)


# ---------------------------------------------------------------------------
# SAO
# ---------------------------------------------------------------------------

def _sao_plane(src, sao_type, band_pos, offsets,
               ctu_size, ctus_w, ctus_h, bit_depth):
    """SAO for one plane — gather-free: per-CTU parameters are expanded
    to per-pixel planes by repeat (a broadcast reshape the TPU streams at
    HBM speed) and offsets are picked with arithmetic selects, not 2D
    gathers (a gather-based formulation measured ~5x slower on v5e).

    src: [H, W] int32 (pre-SAO); sao_type: [nctu] (-1 off, 0-3 EO class,
    4 BO); band_pos: [nctu]; offsets: [nctu, 4] (already << saoBitIncrease).
    """
    h, w = src.shape
    max_val = (1 << bit_depth) - 1
    s = src

    def expand(v):
        g = v.reshape(ctus_h, ctus_w).astype(jnp.int32)
        g = jnp.repeat(g, ctu_size, axis=0)[:h]
        return jnp.repeat(g, ctu_size, axis=1)[:, :w]

    t_px = expand(sao_type)
    bp_px = expand(band_pos)
    off_px = [expand(offsets[:, i]) for i in range(4)]

    def sign(x):
        return jnp.sign(x).astype(jnp.int32)

    pad = jnp.pad(s, 1)                            # pad values masked out

    def shifted(dy, dx):
        return jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx), (h, w))

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    out = s
    neigh = {0: ((0, -1), (0, 1)), 1: ((-1, 0), (1, 0)),
             2: ((-1, -1), (1, 1)), 3: ((1, -1), (-1, 1))}
    # m_iOffsetEo: et0->off[0], et1->off[1], et2->0, et3->off[2], et4->off[3]
    et_to_off = (0, 1, None, 2, 3)
    for c in range(4):
        (d1y, d1x), (d2y, d2x) = neigh[c]
        et = sign(s - shifted(d1y, d1x)) + sign(s - shifted(d2y, d2x)) + 2
        off = jnp.zeros_like(s)
        for et_val, oi in enumerate(et_to_off):
            if oi is not None:
                off = jnp.where(et == et_val, off_px[oi], off)
        # picture-boundary exclusions (processSaoCuOrg)
        mask = t_px == c
        if c in (0, 2, 3):
            mask &= (xx > 0) & (xx < w - 1)
        if c in (1, 2, 3):
            mask &= (yy > 0) & (yy < h - 1)
        out = jnp.where(mask, jnp.clip(s + off, 0, max_val), out)
    # BO: band table 1+(v>>(bd-5)) hits offsets[i] iff
    # (band-1-band_pos) mod 32 == i for some i < 4
    band = 1 + (s >> (bit_depth - 5))
    idx = (band - 1 - bp_px) & 31
    off_bo = jnp.zeros_like(s)
    for i in range(4):
        off_bo = jnp.where(idx == i, off_px[i], off_bo)
    out = jnp.where(t_px == 4, jnp.clip(s + off_bo, 0, max_val), out)
    return out


# ---------------------------------------------------------------------------
# Fused per-picture filter pipeline
# ---------------------------------------------------------------------------

def _filter_core(rec_y, rec_cb, rec_cr,
                 dbk_ver, dbk_hor,
                 sao_types, sao_band_pos, sao_offsets,
                 beta_offset, tc_offset, bit_depth,
                 ctu_size, ctus_w, ctus_h,
                 do_deblock, do_sao, do_sao_chroma):
    """One picture's deblock VER + HOR + SAO, all planes, int32 math."""
    y = rec_y.astype(jnp.int32)
    cb = rec_cb.astype(jnp.int32)
    cr = rec_cr.astype(jnp.int32)
    if do_deblock:
        fl, bs, qpp, qpq, nop, noq = dbk_ver
        y = _luma_dir(y, fl, bs, qpp, qpq, nop, noq,
                      beta_offset, tc_offset, bit_depth)
        cb, cr = _chroma_dir(cb, cr, fl, bs, qpp, qpq, nop, noq,
                             tc_offset, bit_depth)
        fl, bs, qpp, qpq, nop, noq = dbk_hor
        yt = _luma_dir(y.T, fl.T, bs.T, qpp.T, qpq.T, nop.T, noq.T,
                       beta_offset, tc_offset, bit_depth)
        y = yt.T
        cbt, crt = _chroma_dir(cb.T, cr.T, fl.T, bs.T, qpp.T, qpq.T,
                               nop.T, noq.T, tc_offset, bit_depth)
        cb, cr = cbt.T, crt.T
    if do_sao:
        y = _sao_plane(y, sao_types[0], sao_band_pos[0], sao_offsets[0],
                       ctu_size, ctus_w, ctus_h, bit_depth)
        if do_sao_chroma:
            cb = _sao_plane(cb, sao_types[1], sao_band_pos[1],
                            sao_offsets[1], ctu_size // 2, ctus_w, ctus_h,
                            bit_depth)
            cr = _sao_plane(cr, sao_types[2], sao_band_pos[2],
                            sao_offsets[2], ctu_size // 2, ctus_w, ctus_h,
                            bit_depth)
    return y, cb, cr


@partial(jax.jit, static_argnames=("beta_offset", "tc_offset", "bit_depth",
                                   "ctu_size", "ctus_w", "ctus_h",
                                   "do_deblock", "do_sao", "do_sao_chroma"))
def filter_picture(rec_y, rec_cb, rec_cr,
                   dbk_ver, dbk_hor,
                   sao_types, sao_band_pos, sao_offsets,
                   beta_offset=0, tc_offset=0, bit_depth=8,
                   ctu_size=64, ctus_w=1, ctus_h=1,
                   do_deblock=True, do_sao=False, do_sao_chroma=False):
    """The decoder's whole in-loop filter stage as one device launch.

    dbk_ver/dbk_hor: tuples (flags u8, bs u8, qp_p i8, qp_q i8,
    no_p u8, no_q u8) per 4x4 unit, one per direction (host-built edge
    maps — TComLoopFilter xDeblockCU equivalents).
    sao_types/sao_band_pos: per-component [3, nctu]; sao_offsets:
    [3, nctu, 4] (pre-shifted).  Returns filtered (y, cb, cr).

    Pixel values fit int16 (clipped to [0, 2^bd-1]); the narrow output
    dtype halves the device->host transfer on tunneled chips.
    """
    y, cb, cr = _filter_core(rec_y, rec_cb, rec_cr, dbk_ver, dbk_hor,
                             sao_types, sao_band_pos, sao_offsets,
                             beta_offset, tc_offset, bit_depth,
                             ctu_size, ctus_w, ctus_h,
                             do_deblock, do_sao, do_sao_chroma)
    return (y.astype(jnp.int16), cb.astype(jnp.int16),
            cr.astype(jnp.int16))


@partial(jax.jit, static_argnames=("beta_offset", "tc_offset", "bit_depth",
                                   "ctu_size", "ctus_w", "ctus_h",
                                   "do_deblock", "do_sao", "do_sao_chroma",
                                   "out_u8"))
def filter_pictures(rec_y, rec_cb, rec_cr,
                    dbk_ver, dbk_hor,
                    sao_types, sao_band_pos, sao_offsets,
                    beta_offset=0, tc_offset=0, bit_depth=8,
                    ctu_size=64, ctus_w=1, ctus_h=1,
                    do_deblock=True, do_sao=False, do_sao_chroma=False,
                    out_u8=False):
    """The in-loop filter stage for a BATCH of pictures as ONE device
    launch (multi-frame launch batching over a tunneled chip: one RTT
    for N frames).  Every array gains a leading [N] picture axis; the
    per-picture math is _filter_core vmapped, so it is bit-identical to
    filter_picture.  out_u8 returns uint8 planes (lossless for 8-bit
    streams; halves the D2H transfer again)."""

    def one(ry, rcb, rcr, dv, dh, st, sbp, so):
        return _filter_core(ry, rcb, rcr, dv, dh, st, sbp, so,
                            beta_offset, tc_offset, bit_depth,
                            ctu_size, ctus_w, ctus_h,
                            do_deblock, do_sao, do_sao_chroma)

    y, cb, cr = jax.vmap(one)(rec_y, rec_cb, rec_cr, dbk_ver, dbk_hor,
                              sao_types, sao_band_pos, sao_offsets)
    dt = jnp.uint8 if out_u8 else jnp.int16
    return y.astype(dt), cb.astype(dt), cr.astype(dt)
