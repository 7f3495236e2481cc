"""In-jit loop filters: deblock + SAO (stats, decide, apply) as traced jnp
code, so the whole normative filter chain runs inside the frame's device
program and the reconstruction never leaves the device (the device-resident
DPB; reference analog: framefilter.cpp:564 row-pipelined deblock->SAO as
part of the frame, sao.cpp:735/1225/274).

Semantics mirror the host path exactly (ops/deblock.py qt2 branch +
ops/sao.py stats/decide/apply): all arithmetic is integer-valued, so f32
sums are exact and decisions are backend-reproducible.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import deblock as DB
from . import sao as SAO

SAO_OFF, SAO_BO, SAO_EO = SAO.SAO_OFF, SAO.SAO_BO, SAO.SAO_EO


# ---------------------------------------------------------------------------
# decoder-effective per-CTU QP (encoder_top.effective_qp_map, on device):
# a CTU with no coded residual signals no cu_qp_delta, so its QpY stays the
# previous coded QG's QP (spec 8.6.1) — forward fill in raster order.
# ---------------------------------------------------------------------------

def effective_qp_dev(qp_cu, cbf_cu, slice_qp):
    """qp_cu [ncu] int32 (intended map), cbf_cu [ncu] bool, slice_qp scalar.
    Returns [ncu] int32 decoder-side QP."""
    q = jnp.concatenate([jnp.asarray(slice_qp, jnp.int32).reshape(1),
                         qp_cu.astype(jnp.int32)])
    v = jnp.concatenate([jnp.ones((1,), bool), cbf_cu.astype(bool)])

    def op(a, b):
        qa, va = a
        qb, vb = b
        return jnp.where(vb, qb, qa), va | vb

    qf, _ = jax.lax.associative_scan(op, (q, v))
    return qf[1:]


# ---------------------------------------------------------------------------
# BS derivation on the 8-pel cell grid (compute_bs_qt2, traced)
# ---------------------------------------------------------------------------

def compute_bs_dev(maps):
    ii = maps["is_intra"]
    cbf = maps["cbf"]
    mvx, mvy = maps["mvx"], maps["mvy"]
    mv1x, mv1y = maps["mv1x"], maps["mv1y"]
    pdir = maps["pdir"]
    cid = maps["cu_id"]

    def pair(sa, sb):
        intra = ii[sa] | ii[sb]
        coded = cbf[sa] | cbf[sb]
        mis = ((pdir[sa] != pdir[sb])
               | (jnp.abs(mvx[sa] - mvx[sb]) >= 4)
               | (jnp.abs(mvy[sa] - mvy[sb]) >= 4)
               | (jnp.abs(mv1x[sa] - mv1x[sb]) >= 4)
               | (jnp.abs(mv1y[sa] - mv1y[sb]) >= 4))
        bs = jnp.where(intra, 2, jnp.where(coded | mis, 1, 0))
        return jnp.where(cid[sa] != cid[sb], bs, 0)

    bs_v = pair(np.s_[:, :-1], np.s_[:, 1:])
    bs_h = pair(np.s_[:-1, :], np.s_[1:, :])
    return bs_v, bs_h


# ---------------------------------------------------------------------------
# deblock (qt2 semantics: luma edges on the 8-pel grid, chroma on the
# 16-luma grid at BS==2) — deblock_frame_qt2's per-CU branch, traced
# ---------------------------------------------------------------------------

def _tc_seg_dev(bs_seg, qp, tc_offset, shift):
    idx = jnp.clip(qp + DB.DEFAULT_INTRA_TC_OFFSET * (bs_seg - 1) + tc_offset,
                   0, 53)
    tc = jnp.asarray(DB.TC_TABLE)[idx] << shift
    return jnp.where(bs_seg > 0, tc, 0).astype(jnp.int32)


def deblock_qt2_dev(rec3, cell_q, bs_v, bs_h, bit_depth=8,
                    beta_offset=0, tc_offset=0):
    """rec3: (y, u, v) int32 planes; cell_q: [H/8, W/8] int32 decoder-side
    luma QP per 8-pel cell; bs_v/bs_h from compute_bs_dev."""
    y, u, v = rec3
    H, W = y.shape
    maxv = (1 << bit_depth) - 1
    shift = bit_depth - 8

    q = cell_q.astype(jnp.int32)
    qv = (q[:, :-1] + q[:, 1:] + 1) >> 1
    qh = (q[:-1, :] + q[1:, :] + 1) >> 1
    BT = jnp.asarray(DB.BETA_TABLE)
    CQ = jnp.asarray(DB._CHROMA_QP)
    TT = jnp.asarray(DB.TC_TABLE)
    beta_v = (BT[jnp.clip(qv + beta_offset, 0, 51)] << shift).astype(jnp.int32)
    beta_h = (BT[jnp.clip(qh + beta_offset, 0, 51)] << shift).astype(jnp.int32)
    cv = CQ[jnp.clip(qv, 0, 51)]
    ch = CQ[jnp.clip(qh, 0, 51)]
    tcv = (TT[jnp.clip(cv + DB.DEFAULT_INTRA_TC_OFFSET + tc_offset, 0, 53)]
           << shift).astype(jnp.int32)
    tch = (TT[jnp.clip(ch + DB.DEFAULT_INTRA_TC_OFFSET + tc_offset, 0, 53)]
           << shift).astype(jnp.int32)

    beta = jnp.repeat(beta_v, 2, axis=0)               # [H/4, E_v]
    beta_h_arr = jnp.repeat(beta_h.T, 2, axis=0)       # [W/4, E_h]
    tc_c_v = jnp.repeat(tcv[:, 1::2], 4, axis=0)       # [Hc/?..]
    tc_c_h = jnp.repeat(tch[1::2, :].T, 4, axis=0)

    vcols = list(range(8, W, 8))
    hrows = list(range(8, H, 8))
    tc_v = jnp.repeat(_tc_seg_dev(bs_v, qv, tc_offset, shift), 2, axis=0)
    tc_h = jnp.repeat(_tc_seg_dev(bs_h, qh, tc_offset, shift).T, 2, axis=0)
    y = DB._filter_vertical_edges(y, vcols, beta, tc_v, maxv, jnp)
    y = jnp.swapaxes(
        DB._filter_vertical_edges(jnp.swapaxes(y, 0, 1), hrows, beta_h_arr,
                                  tc_h, maxv, jnp), 0, 1)

    vcols_c = list(range(8, W // 2, 8))
    hrows_c = list(range(8, H // 2, 8))
    bs_v_c = bs_v[:, 1::2]
    bs_h_c = bs_h[1::2, :]
    mask_v = jnp.repeat(bs_v_c == 2, 4, axis=0)
    mask_h = jnp.repeat((bs_h_c == 2).T, 4, axis=0)
    u = DB._filter_vertical_edges_chroma(u, vcols_c, tc_c_v, maxv, jnp, mask_v)
    u = jnp.swapaxes(
        DB._filter_vertical_edges_chroma(jnp.swapaxes(u, 0, 1), hrows_c,
                                         tc_c_h, maxv, jnp, mask_h), 0, 1)
    v = DB._filter_vertical_edges_chroma(v, vcols_c, tc_c_v, maxv, jnp, mask_v)
    v = jnp.swapaxes(
        DB._filter_vertical_edges_chroma(jnp.swapaxes(v, 0, 1), hrows_c,
                                         tc_c_h, maxv, jnp, mask_h), 0, 1)
    return y, u, v


# ---------------------------------------------------------------------------
# SAO: stats + decide + apply, traced (sao.py *_all / *_vec analogs)
# ---------------------------------------------------------------------------

def _sao_stats_dev(rec, src, n):
    """Per-CTU (sum, count) for the 4 EO classes x 5 cats and 32 BO bands.
    All values integer-valued f32 (exact)."""
    H, W = rec.shape
    rows, cols = H // n, W // n

    def tile_sum(x):
        return x.reshape(rows, n, cols, n).sum(axis=(1, 3))

    d = (src - rec).astype(jnp.float32)
    eo_s, eo_c = [], []
    for cls in range(4):
        cat = SAO.eo_category(rec, cls, xp=jnp)
        ss, cc = [], []
        for k in range(5):
            m = (cat == k).astype(jnp.float32)
            ss.append(tile_sum(m * d))
            cc.append(tile_sum(m))
        eo_s.append(jnp.stack(ss))
        eo_c.append(jnp.stack(cc))
    return jnp.stack(eo_s), jnp.stack(eo_c)      # [4, 5, rows, cols]


def _sao_bo_stats_dev(rec, src, n, bit_depth):
    H, W = rec.shape
    rows, cols = H // n, W // n

    def tile_sum(x):
        return x.reshape(rows, n, cols, n).sum(axis=(1, 3))

    d = (src - rec).astype(jnp.float32)
    bands = jnp.right_shift(rec, bit_depth - 5)
    bs, bc = [], []
    for b in range(32):
        m = (bands == b).astype(jnp.float32)
        bs.append(tile_sum(m * d))
        bc.append(tile_sum(m))
    return jnp.stack(bs), jnp.stack(bc)          # [32, rows, cols]


def _best_offsets_dev(s, c, max_abs, sign=None):
    h0 = jnp.rint(s / jnp.maximum(c, 1.0))
    h0 = jnp.clip(h0, -max_abs, max_abs)
    if sign == "pos":
        h0 = jnp.maximum(h0, 0.0)
    elif sign == "neg":
        h0 = jnp.minimum(h0, 0.0)
    sgn = jnp.sign(h0)
    mag = jnp.abs(h0)
    cands = jnp.arange(max_abs + 1, dtype=jnp.float32)
    d = (c[..., None] * cands * cands - 2.0 * cands * (s * sgn)[..., None])
    d = jnp.where(cands <= mag[..., None], d, 0.0)
    k = jnp.argmin(d, axis=-1)
    best_d = jnp.take_along_axis(d, k[..., None], -1)[..., 0]
    return (k * sgn).astype(jnp.int32), best_d


def _decide_luma_dev(eo_s, eo_c, bo_s, bo_c, bit_depth, lam):
    """lam: SSD-per-bit lambda2 of the slice QP. Candidate cost =
    delta-SSD + lam * estimated syntax bits (type/class/offset TR bins —
    the reference rdoSaoUnitCu shape, sao.cpp:1225). The round-3 flat
    lambda_bits=60 made SAO fire on nearly every CTU at high QP."""
    max_abs = (1 << (min(bit_depth, 10) - 5)) - 1
    s = eo_s[:, 1:5]
    c = eo_c[:, 1:5]
    h_pos, d_pos = _best_offsets_dev(s, c, max_abs, "pos")
    h_neg, d_neg = _best_offsets_dev(s, c, max_abs, "neg")
    sel_pos = (jnp.arange(4) < 2)[None, :, None, None]
    h = jnp.where(sel_pos, h_pos, h_neg)
    d = jnp.where(sel_pos, d_pos, d_neg)
    dtot = d.sum(axis=1)                               # [4, r, c]
    cls = jnp.argmin(dtot, axis=0)
    eo_d = jnp.take_along_axis(dtot, cls[None], 0)[0]
    eo_offs = jnp.take_along_axis(
        h, cls[None, None], 0)[0].transpose(1, 2, 0)   # [r, c, 4]

    hb, db = _best_offsets_dev(bo_s, bo_c, max_abs)
    wins = jnp.stack([db[b:b + 4].sum(axis=0) for b in range(29)])
    wb = jnp.argmin(wins, axis=0)
    bo_d = jnp.take_along_axis(wins, wb[None], 0)[0]
    bi = wb[None] + jnp.arange(4)[:, None, None]
    bo_offs = jnp.take_along_axis(hb, bi, 0).transpose(1, 2, 0)

    eo_bits = 3.0 + jnp.sum(jnp.abs(eo_offs) + 1, axis=-1).astype(jnp.float32)
    bo_bits = 6.0 + jnp.sum(jnp.abs(bo_offs) + 1
                            + (bo_offs != 0), axis=-1).astype(jnp.float32)
    eo_cost = eo_d + lam * eo_bits
    bo_cost = bo_d + lam * bo_bits
    use_eo = (eo_cost < 0) & (eo_cost <= bo_cost)
    use_bo = (bo_cost < 0) & ~use_eo
    t = jnp.where(use_eo, SAO_EO, jnp.where(use_bo, SAO_BO, SAO_OFF))
    aux = jnp.where(use_eo, cls, wb).astype(jnp.int32)
    offs = jnp.where(use_eo[..., None], eo_offs,
                     jnp.where(use_bo[..., None], bo_offs, 0)).astype(jnp.int32)
    return t.astype(jnp.int32), aux, offs


def _decide_chroma_dev(st_cb, st_cr, bit_depth, lam):
    max_abs = (1 << (min(bit_depth, 10) - 5)) - 1
    hs, ds = [], []
    for (eo_s, eo_c, _, _) in (st_cb, st_cr):
        s = eo_s[:, 1:5]
        c = eo_c[:, 1:5]
        h_pos, d_pos = _best_offsets_dev(s, c, max_abs, "pos")
        h_neg, d_neg = _best_offsets_dev(s, c, max_abs, "neg")
        sel_pos = (jnp.arange(4) < 2)[None, :, None, None]
        hs.append(jnp.where(sel_pos, h_pos, h_neg))
        ds.append(jnp.where(sel_pos, d_pos, d_neg))
    dtot = ds[0].sum(axis=1) + ds[1].sum(axis=1)
    cls = jnp.argmin(dtot, axis=0)
    eo_d = jnp.take_along_axis(dtot, cls[None], 0)[0]
    eo_offs = [jnp.take_along_axis(h, cls[None, None], 0)[0].transpose(1, 2, 0)
               for h in hs]

    bo_d = 0.0
    wbs, bo_offs = [], []
    for (_, _, bo_s, bo_c) in (st_cb, st_cr):
        hb, db = _best_offsets_dev(bo_s, bo_c, max_abs)
        wins = jnp.stack([db[b:b + 4].sum(axis=0) for b in range(29)])
        wb = jnp.argmin(wins, axis=0)
        bo_d = bo_d + jnp.take_along_axis(wins, wb[None], 0)[0]
        bi = wb[None] + jnp.arange(4)[:, None, None]
        wbs.append(wb.astype(jnp.int32))
        bo_offs.append(jnp.take_along_axis(hb, bi, 0).transpose(1, 2, 0))

    eo_bits = 3.0 + sum(
        jnp.sum(jnp.abs(o) + 1, axis=-1) for o in eo_offs).astype(jnp.float32)
    bo_bits = 11.0 + sum(
        jnp.sum(jnp.abs(o) + 1 + (o != 0), axis=-1)
        for o in bo_offs).astype(jnp.float32)
    eo_cost = eo_d + lam * eo_bits
    bo_cost = bo_d + lam * bo_bits
    use_eo = (eo_cost < 0) & (eo_cost <= bo_cost)
    use_bo = (bo_cost < 0) & ~use_eo
    t = jnp.where(use_eo, SAO_EO, jnp.where(use_bo, SAO_BO, SAO_OFF))
    aux_cb = jnp.where(use_eo, cls, wbs[0]).astype(jnp.int32)
    aux_cr = jnp.where(use_eo, cls, wbs[1]).astype(jnp.int32)
    z = jnp.zeros_like(eo_offs[0])
    offs_cb = jnp.where(use_eo[..., None], eo_offs[0],
                        jnp.where(use_bo[..., None], bo_offs[0], z))
    offs_cr = jnp.where(use_eo[..., None], eo_offs[1],
                        jnp.where(use_bo[..., None], bo_offs[1], z))
    return (t.astype(jnp.int32), aux_cb, aux_cr,
            offs_cb.astype(jnp.int32), offs_cr.astype(jnp.int32))


def _apply_sao_dev(rec, t, aux, offs, n, bit_depth):
    """apply_sao_component_vec, traced. rec int32 [H, W]."""
    H, W = rec.shape
    rows, cols = H // n, W // n
    maxv = (1 << bit_depth) - 1
    tr = jnp.arange(H) // n
    tc = jnp.arange(W) // n
    TR, TC = tr[:, None], tc[None, :]
    out = rec
    for cls in range(4):
        m = (t == SAO_EO) & (aux == cls)
        cat = SAO.eo_category(rec, cls, xp=jnp)
        lut = jnp.zeros((rows, cols, 5), jnp.int32)
        lut = lut.at[..., 1:].set(jnp.where(m[..., None], offs, 0))
        out = out + lut[TR, TC, cat]
    mbo = (t == SAO_BO)
    bands = jnp.right_shift(rec, bit_depth - 5)
    lut32 = jnp.zeros((rows, cols, 32), jnp.int32)
    moffs = jnp.where(mbo[..., None], offs, 0)
    for j in range(4):
        oh = jax.nn.one_hot((aux + j) % 32, 32, dtype=jnp.int32)
        lut32 = lut32 + oh * moffs[..., j:j + 1]
    out = out + lut32[TR, TC, bands]
    return jnp.clip(out, 0, maxv)


def qt_loopfilter_dev(rec3, src3, qp_cu, slice_qp, split, split16,
                      ui_sizes, mv_sizes, pdir_sizes, lv3, rows, cols,
                      depth2, deblock, sao, bit_depth, sao_lambda=60.0):
    """Full in-jit loop-filter chain for a CTU32 quadtree frame.

    rec3/src3: full int32 planes (y [H,W], u/v [H/2,W/2]).
    qp_cu: [ncu] int32 intended per-CTU QP; slice_qp: scalar int32.
    split: [ncu] bool; split16: [n16] bool (frame-raster 16-grid) or None.
    ui_sizes: (ui32 [ncu], ui16 [n16], ui8 [n8] or None) bools, or None for
      an all-intra frame.
    mv_sizes: ((mv0x, mv0y, mv1x, mv1y) per size) qpel MVs, or None (intra).
    pdir_sizes: (pdir32, pdir16, pdir8) or None (P slices -> pdir 1).
    lv3: committed (lv_y [ncu,n,n], lv_cb, lv_cr) CTU-blocked level tensors.
    Returns (rec3_filtered, sao_param_arrays_or_None)."""
    H, W = rec3[0].shape
    n = 32
    ncu = rows * cols
    gr, gc = H // 8, W // 8
    lv_y, lv_cb, lv_cr = lv3

    def up4(a):
        return jnp.repeat(jnp.repeat(a.reshape(rows, cols), 4, 0), 4, 1)

    def up2(a):
        return jnp.repeat(jnp.repeat(a.reshape(H // 16, W // 16), 2, 0), 2, 1)

    # depth level per 8-cell: 0 = CU32, 1 = CU16, 2 = CU8
    split_up = up4(split)
    if depth2 and split16 is not None:
        sp16_up = up2(split16)
        lvl8 = jnp.where(split_up, jnp.where(sp16_up, 2, 1), 0)
    else:
        lvl8 = split_up.astype(jnp.int32)

    def sel8(a32, a16, a8):
        m = jnp.where(lvl8 == 1, up2(a16), up4(a32))
        if a8 is not None:
            m = jnp.where(lvl8 == 2, a8.reshape(gr, gc), m)
        return m

    if ui_sizes is None:
        ui_m = jnp.ones((gr, gc), bool)
    else:
        ui_m = sel8(*[a if a is None else a.astype(jnp.int32)
                      for a in ui_sizes]).astype(bool)
    z = jnp.zeros((gr, gc), jnp.int32)
    if mv_sizes is None:
        mvx_m = mvy_m = mv1x_m = mv1y_m = z
    else:
        (m32, m16, m8) = mv_sizes
        mvx_m = sel8(m32[0], m16[0], None if m8 is None else m8[0])
        mvy_m = sel8(m32[1], m16[1], None if m8 is None else m8[1])
        mv1x_m = sel8(m32[2], m16[2], None if m8 is None else m8[2])
        mv1y_m = sel8(m32[3], m16[3], None if m8 is None else m8[3])
    if pdir_sizes is None:
        pdir_m = jnp.ones((gr, gc), jnp.int32)
    else:
        (p32, p16, p8) = pdir_sizes
        pdir_m = sel8(p32, p16, p8)
    pdir_m = jnp.where(ui_m, 0, pdir_m)
    mvx_m = jnp.where(ui_m | ((pdir_m & 1) == 0), 0, mvx_m)
    mvy_m = jnp.where(ui_m | ((pdir_m & 1) == 0), 0, mvy_m)
    mv1x_m = jnp.where(ui_m | ((pdir_m & 2) == 0), 0, mv1x_m)
    mv1y_m = jnp.where(ui_m | ((pdir_m & 2) == 0), 0, mv1y_m)

    # cbf per cell = any nonzero LUMA level in the containing CU
    # (expand_qt_maps8 semantics)
    lvf = (jnp.reshape(
        jnp.transpose(lv_y.reshape(rows, cols, n, n), (0, 2, 1, 3)),
        (H, W)) != 0)
    A8 = lvf.reshape(gr, 8, gc, 8).any(axis=(1, 3))
    A16 = A8.reshape(gr // 2, 2, gc // 2, 2).any(axis=(1, 3))
    A32 = A8.reshape(rows, 4, cols, 4).any(axis=(1, 3))
    cbf_m = jnp.where(lvl8 == 2, A8,
                      jnp.where(lvl8 == 1, up2(A16), up4(A32)))

    # CU-id per cell (distinctness only)
    cr = jnp.arange(gr) % 4
    cc = jnp.arange(gc) % 4
    ctu_i = ((jnp.arange(gr) // 4)[:, None] * cols
             + (jnp.arange(gc) // 4)[None, :])
    q_i = (cr[:, None] // 2) * 2 + (cc[None, :] // 2)
    s_i = cr[:, None] * 4 + cc[None, :]
    kk = jnp.where(lvl8 == 0, 0, jnp.where(lvl8 == 1, 1 + q_i, 5 + s_i))
    cu_id = ctu_i * 21 + kk

    out3 = rec3
    if deblock:
        maps = {"is_intra": ui_m, "cbf": cbf_m,
                "mvx": mvx_m, "mvy": mvy_m, "mv1x": mv1x_m, "mv1y": mv1y_m,
                "pdir": pdir_m, "cu_id": cu_id}
        bs_v, bs_h = compute_bs_dev(maps)
        cbf_ctu = ((lv_y != 0).any(axis=(1, 2))
                   | (lv_cb != 0).any(axis=(1, 2))
                   | (lv_cr != 0).any(axis=(1, 2)))
        qp_eff = effective_qp_dev(qp_cu, cbf_ctu, slice_qp)
        cell_q = up4(qp_eff)
        out3 = deblock_qt2_dev(out3, cell_q, bs_v, bs_h, bit_depth)
    sao_arrs = None
    if sao:
        # SSD-per-bit lambda2 at the slice QP (rdcost.h x265_lambda2_tab
        # shape) — SAO candidates pay their real syntax bits
        lam = (0.85 * jnp.exp2((slice_qp.astype(jnp.float32) - 12.0) / 3.0)
               ).astype(jnp.float32)
        out3, sao_arrs = sao_dev(out3, src3, n, bit_depth, lam)
    return out3, sao_arrs


def sao_dev(rec3, src3, n, bit_depth, lam):
    """Full SAO on device: stats on the (deblocked) recon vs source,
    decide per CTU at SSD + lam*bits, apply. Returns (rec3_out, params)
    where params = (t_y, aux_y, off_y, t_c, aux_cb, aux_cr, off_cb,
    off_cr) int32."""
    ry, ru, rv = rec3
    sy, su, sv = src3
    nc = n // 2
    st_y = _sao_stats_dev(ry, sy, n) + _sao_bo_stats_dev(ry, sy, n, bit_depth)
    st_cb = _sao_stats_dev(ru, su, nc) + _sao_bo_stats_dev(ru, su, nc,
                                                           bit_depth)
    st_cr = _sao_stats_dev(rv, sv, nc) + _sao_bo_stats_dev(rv, sv, nc,
                                                           bit_depth)
    t_y, aux_y, off_y = _decide_luma_dev(*st_y, bit_depth, lam)
    t_c, aux_cb, aux_cr, off_cb, off_cr = _decide_chroma_dev(
        st_cb, st_cr, bit_depth, lam)
    oy = _apply_sao_dev(ry, t_y, aux_y, off_y, n, bit_depth)
    ou = _apply_sao_dev(ru, t_c, aux_cb, off_cb, nc, bit_depth)
    ov = _apply_sao_dev(rv, t_c, aux_cr, off_cr, nc, bit_depth)
    return (oy, ou, ov), (t_y, aux_y, off_y, t_c, aux_cb, aux_cr,
                          off_cb, off_cr)


def pack_sao_params(sao_arrs):
    """Pack the 8 per-CTU SAO decision grids into ONE [ncu, 18] int32
    device array (the native serializer's layout). One output = one host
    fetch: each fetch through the device tunnel costs ~23 ms of round-trip
    latency, so eight separate arrays cost ~190 ms/frame of pure latency
    (round-5 measurement)."""
    import jax.numpy as jnp
    t_y, aux_y, off_y, t_c, acb, acr, ocb, ocr = sao_arrs
    g = lambda a: a.reshape(-1, 1).astype(jnp.int32)
    g4 = lambda a: a.reshape(-1, 4).astype(jnp.int32)
    return jnp.concatenate([
        g(t_y), g(aux_y), g4(off_y),
        g(t_c), g(acb), g4(ocb),
        g(t_c), g(acr), g4(ocr)], axis=1)
