"""HEVC deblocking filter (spec 8.7.2), vectorized over all edges.

Reference behavior (studied, not copied): /root/reference/source/common/
deblock.cpp (tables are spec constants, Table 8-12).

TPU-first design: instead of per-edge scalar loops, every vertical edge
column in the picture is filtered in one batched elementwise pass (VPU),
then every horizontal edge (on the vertically-filtered output, per spec
ordering). For the round-1 uniform intra grid all CU-boundary edges have
boundary strength 2 and a single QP, so thresholds are scalars; the API
accepts per-edge BS/QP arrays for the general case later.

Decoder-normative: output must be bit-exact (validated by FFmpeg decode in
tests/test_conformance.py).
"""

from __future__ import annotations

import numpy as np

# Table 8-12 (spec constants)
TC_TABLE = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 8, 9, 10, 11,
    13, 14, 16, 18, 20, 22, 24], dtype=np.int32)
BETA_TABLE = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10, 11, 12,
    13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32, 34, 36, 38, 40, 42,
    44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64], dtype=np.int32)

DEFAULT_INTRA_TC_OFFSET = 2


def luma_thresholds(qp: int, beta_offset: int = 0, tc_offset: int = 0,
                    bs: int = 2, bit_depth: int = 8):
    shift = bit_depth - 8
    idx_b = int(np.clip(qp + beta_offset, 0, 51))
    idx_tc = int(np.clip(qp + DEFAULT_INTRA_TC_OFFSET * (bs - 1) + tc_offset, 0, 53))
    return int(BETA_TABLE[idx_b]) << shift, int(TC_TABLE[idx_tc]) << shift


def _filter_vertical_edges(plane, edge_cols, beta, tc, maxv, xp):
    """Filter the vertical edges at columns `edge_cols` (static python list).
    plane: int32 [H, W]. Returns the filtered plane.

    Layout: for an edge at x0, p_i = plane[:, x0-1-i], q_i = plane[:, x0+i].
    Decisions are made per 4-row segment from rows 0 and 3 (spec 8.7.2.5.3).

    `tc` may be a scalar (uniform BS) or an [H/4, E] per-segment array
    (inter frames: BS varies per block pair; tc == 0 disables a segment).
    """
    if not edge_cols:
        return plane
    tc_is_arr = not np.isscalar(tc)
    if not tc_is_arr and tc == 0:
        return plane
    H = plane.shape[0]
    E = len(edge_cols)
    if tc_is_arr:
        tc_seg = tc                                    # [H/4, E]
        tc = xp.repeat(tc_seg, 4, axis=0)              # [H, E] row-broadcast
    else:
        tc_seg = tc
    x0 = np.asarray(edge_cols, dtype=np.int32)          # [E]
    # gather p3..p0, q0..q3: [H, E]
    cols_p = x0[None, :] - 1 - np.arange(4)[:, None]    # [4, E] p0..p3 cols
    cols_q = x0[None, :] + np.arange(4)[:, None]
    if xp is not np:
        cols_p, cols_q = xp.asarray(cols_p), xp.asarray(cols_q)
    p = plane[:, cols_p]                                # [H, 4, E]
    q = plane[:, cols_q]
    p0, p1, p2, p3 = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
    q0, q1, q2, q3 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]

    # segment decisions on rows 0 and 3 of each 4-row group
    def seg(v):
        return v.reshape(H // 4, 4, E)

    dp = xp.abs(p2 - 2 * p1 + p0)                       # [H, E]
    dq = xp.abs(q2 - 2 * q1 + q0)
    dp_s, dq_s = seg(dp), seg(dq)
    dp0, dp3 = dp_s[:, 0], dp_s[:, 3]                   # [H/4, E]
    dq0, dq3 = dq_s[:, 0], dq_s[:, 3]
    dpq0 = dp0 + dq0
    dpq3 = dp3 + dq3
    d = dpq0 + dpq3
    filter_on = d < beta                                # [H/4, E]

    side_p = (dp0 + dp3) < ((beta + (beta >> 1)) >> 3)
    side_q = (dq0 + dq3) < ((beta + (beta >> 1)) >> 3)

    # strong decision needs per-line tests at rows 0 and 3
    sdist = xp.abs(seg(p3 - p0)) + xp.abs(seg(q0 - q3))
    pq = xp.abs(seg(p0 - q0))
    def strong_line(i, dpq):
        return ((2 * dpq < (beta >> 2)) &
                (sdist[:, i] < (beta >> 3)) &
                (pq[:, i] < ((5 * tc_seg + 1) >> 1)))
    strong = strong_line(0, dpq0) & strong_line(3, dpq3)   # [H/4, E]

    # broadcast segment decisions to rows
    def bseg(m):
        return xp.repeat(m, 4, axis=0)                  # [H, E]
    filter_on_r = bseg(filter_on)
    strong_r = bseg(strong)
    side_p_r = bseg(side_p)
    side_q_r = bseg(side_q)

    # ---- strong filter ----
    def clip_tc2(v, ref):
        return xp.clip(v, ref - 2 * tc, ref + 2 * tc)
    sp0 = clip_tc2((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3, p0)
    sp1 = clip_tc2((p2 + p1 + p0 + q0 + 2) >> 2, p1)
    sp2 = clip_tc2((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq0 = clip_tc2((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3, q0)
    sq1 = clip_tc2((q2 + q1 + q0 + p0 + 2) >> 2, q1)
    sq2 = clip_tc2((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)

    # ---- weak filter ----
    delta0 = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    weak_on = xp.abs(delta0) < (10 * tc)
    delta = xp.clip(delta0, -tc, tc)
    wp0 = xp.clip(p0 + delta, 0, maxv)
    wq0 = xp.clip(q0 - delta, 0, maxv)
    half_tc = tc >> 1
    dp1 = xp.clip((((p2 + p0 + 1) >> 1) - p1 + delta) >> 1, -half_tc, half_tc)
    wp1 = xp.clip(p1 + dp1, 0, maxv)
    dq1 = xp.clip((((q2 + q0 + 1) >> 1) - q1 - delta) >> 1, -half_tc, half_tc)
    wq1 = xp.clip(q1 + dq1, 0, maxv)

    weak = filter_on_r & ~strong_r & weak_on
    strong_m = filter_on_r & strong_r

    np0 = xp.where(strong_m, sp0, xp.where(weak, wp0, p0))
    nq0 = xp.where(strong_m, sq0, xp.where(weak, wq0, q0))
    np1 = xp.where(strong_m, sp1, xp.where(weak & side_p_r, wp1, p1))
    nq1 = xp.where(strong_m, sq1, xp.where(weak & side_q_r, wq1, q1))
    np2 = xp.where(strong_m, sp2, p2)
    nq2 = xp.where(strong_m, sq2, q2)

    # scatter back
    if xp is np:
        out = plane.copy()
        out[:, cols_p[0]] = np0
        out[:, cols_p[1]] = np1
        out[:, cols_p[2]] = np2
        out[:, cols_q[0]] = nq0
        out[:, cols_q[1]] = nq1
        out[:, cols_q[2]] = nq2
        return out
    out = plane
    out = out.at[:, cols_p[0]].set(np0)
    out = out.at[:, cols_p[1]].set(np1)
    out = out.at[:, cols_p[2]].set(np2)
    out = out.at[:, cols_q[0]].set(nq0)
    out = out.at[:, cols_q[1]].set(nq1)
    out = out.at[:, cols_q[2]].set(nq2)
    return out


def _filter_vertical_edges_chroma(plane, edge_cols, tc, maxv, xp, mask=None):
    """Chroma deblock (BS==2 edges only): 1 pixel each side (spec 8.7.2.5.5).
    mask: optional [Hc, E] bool — rows where the edge has BS==2."""
    if not edge_cols or (np.isscalar(tc) and tc == 0):
        return plane
    x0 = np.asarray(edge_cols, dtype=np.int32)
    cols_p = x0[None, :] - 1 - np.arange(2)[:, None]
    cols_q = x0[None, :] + np.arange(2)[:, None]
    if xp is not np:
        cols_p, cols_q = xp.asarray(cols_p), xp.asarray(cols_q)
    p = plane[:, cols_p]
    q = plane[:, cols_q]
    p0, p1 = p[:, 0], p[:, 1]
    q0, q1 = q[:, 0], q[:, 1]
    delta = xp.clip((((q0 - p0) * 4) + p1 - q1 + 4) >> 3, -tc, tc)
    np0 = xp.clip(p0 + delta, 0, maxv)
    nq0 = xp.clip(q0 - delta, 0, maxv)
    if mask is not None:
        np0 = xp.where(mask, np0, p0)
        nq0 = xp.where(mask, nq0, q0)
    if xp is np:
        out = plane.copy()
        out[:, cols_p[0]] = np0
        out[:, cols_q[0]] = nq0
        return out
    out = plane.at[:, cols_p[0]].set(np0)
    out = out.at[:, cols_q[0]].set(nq0)
    return out


def deblock_frame_uniform(recon_y, recon_u, recon_v, cu_size: int, qp_y: int,
                          qp_c: int, bit_depth: int = 8,
                          beta_offset: int = 0, tc_offset: int = 0, xp=np):
    """Deblock an all-intra uniform-CU-grid frame (all CU edges BS=2).

    Ordering per spec: all vertical edges (whole picture), then all
    horizontal edges using the vertically-filtered samples.
    """
    H, W = recon_y.shape
    maxv = (1 << bit_depth) - 1
    shift = bit_depth - 8
    n = cu_size
    if np.ndim(qp_y) == 2:
        # per-CU QP (AQ/cuTree): per-edge averaged thresholds
        e = _edge_qps(qp_y, beta_offset, tc_offset, shift)
        beta_v = np.repeat(e["beta_v"], n // 4, axis=0)
        beta_h = np.repeat(e["beta_h"].T, n // 4, axis=0)
        idx_v = np.clip(e["qv"] + DEFAULT_INTRA_TC_OFFSET + tc_offset, 0, 53)
        idx_h = np.clip(e["qh"] + DEFAULT_INTRA_TC_OFFSET + tc_offset, 0, 53)
        tc_v = np.repeat((TC_TABLE[idx_v] << shift).astype(np.int32),
                         n // 4, axis=0)
        tc_h = np.repeat((TC_TABLE[idx_h] << shift).astype(np.int32).T,
                         n // 4, axis=0)
        tc_c_v = np.repeat(e["tc_c_v"], n // 2, axis=0)
        tc_c_h = np.repeat(e["tc_c_h"].T, n // 2, axis=0)
    else:
        beta_v, tc_v = luma_thresholds(qp_y, beta_offset, tc_offset, 2,
                                       bit_depth)
        beta_h, tc_h = beta_v, tc_v
        _, tc_c = luma_thresholds(qp_c, beta_offset, tc_offset, 2, bit_depth)
        tc_c_v = tc_c_h = tc_c

    y = recon_y.astype(xp.int32)
    u = recon_u.astype(xp.int32)
    v = recon_v.astype(xp.int32)

    vcols = [x for x in range(cu_size, W, cu_size)]
    hrows = [yv for yv in range(cu_size, H, cu_size)]
    # chroma edges on the 16-luma grid -> every multiple of 8 in chroma coords
    c_step = max(cu_size // 2, 8)
    vcols_c = [x for x in range(c_step, W // 2, c_step)]
    hrows_c = [yv for yv in range(c_step, H // 2, c_step)]

    y = _filter_vertical_edges(y, vcols, beta_v, tc_v, maxv, xp)
    y = xp.swapaxes(
        _filter_vertical_edges(xp.swapaxes(y, 0, 1), hrows, beta_h, tc_h,
                               maxv, xp), 0, 1)

    u = _filter_vertical_edges_chroma(u, vcols_c, tc_c_v, maxv, xp)
    u = xp.swapaxes(
        _filter_vertical_edges_chroma(xp.swapaxes(u, 0, 1), hrows_c, tc_c_h,
                                      maxv, xp), 0, 1)
    v = _filter_vertical_edges_chroma(v, vcols_c, tc_c_v, maxv, xp)
    v = xp.swapaxes(
        _filter_vertical_edges_chroma(xp.swapaxes(v, 0, 1), hrows_c, tc_c_h,
                                      maxv, xp), 0, 1)
    return y, u, v


# ---------------------------------------------------------------------------
# Inter-frame deblocking: per-edge boundary strength (spec 8.7.2.4).
# Uniform CU grid (CU == PU == TU), so the only filtered edges are CU
# boundaries and every 4-sample segment along one edge shares the BS of
# its block pair.
# ---------------------------------------------------------------------------

def compute_bs_uniform(is_intra, cbf, pdir, mv0x, mv0y, mv1x=None, mv1y=None):
    """Boundary strengths for the uniform grid.

    is_intra/cbf: [rows, cols] bool; pdir: [rows, cols] int (1/2/3, or None
    for a P frame = all L0); mv*: quarter-pel MVs, unused lists zeroed.
    Returns (bs_v [rows, cols-1], bs_h [rows-1, cols]) int arrays.
    """
    is_intra = np.asarray(is_intra, bool)
    cbf = np.asarray(cbf, bool)
    if pdir is None:
        pdir = np.ones(is_intra.shape, np.int32)
    if mv1x is None:
        mv1x = np.zeros_like(mv0x)
        mv1y = np.zeros_like(mv0y)

    def pair(a, b):
        """BS between block tuples a=(ia,ca,da,x0,y0,x1,y1) and b."""
        ia, ca, da, ax0, ay0, ax1, ay1 = a
        ib, cb, db, bx0, by0, bx1, by1 = b
        intra = ia | ib
        coded = ca | cb
        # different prediction direction counts as different refs/mv count;
        # equal dirs compare per-list MVs (unused lists are zeroed on both
        # sides, so they never trigger)
        mis = ((da != db) |
               (np.abs(ax0 - bx0) >= 4) | (np.abs(ay0 - by0) >= 4) |
               (np.abs(ax1 - bx1) >= 4) | (np.abs(ay1 - by1) >= 4))
        return np.where(intra, 2, np.where(coded | mis, 1, 0))

    def blocks(sl):
        return (is_intra[sl], cbf[sl], pdir[sl], mv0x[sl], mv0y[sl],
                mv1x[sl], mv1y[sl])

    bs_v = pair(blocks(np.s_[:, :-1]), blocks(np.s_[:, 1:]))
    bs_h = pair(blocks(np.s_[:-1, :]), blocks(np.s_[1:, :]))
    return bs_v, bs_h


def _tc_seg_from_bs(bs_seg, qp, tc_offset, shift):
    """Per-segment tc from BS (0 disables the segment). qp may be a scalar
    or an array shaped like bs_seg (per-edge averaged QP)."""
    idx = np.clip(qp + DEFAULT_INTRA_TC_OFFSET * (bs_seg - 1) + tc_offset, 0, 53)
    return np.where(bs_seg > 0, TC_TABLE[idx] << shift, 0).astype(np.int32)


# spec table 8-10 (4:2:0) — also in models/intra_encoder.py; the loop filter
# maps the per-edge AVERAGED luma QP through it (8.7.2.5.5)
_CHROMA_QP = np.array(
    list(range(30)) + [29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37,
                       37] + list(range(38, 52)), np.int32)


def _edge_qps(qp_map, beta_offset, tc_offset, shift):
    """Per-edge averaged QPs from a per-CU map (spec 8.7.2.5.3: qPL =
    (QpQ + QpP + 1) >> 1). qp_map: [rows, cols] luma signaling QP.
    Returns dict with per-edge luma QP and beta arrays at the CU-pair
    granularity: v [rows, cols-1], h [rows-1, cols]."""
    q = np.asarray(qp_map, np.int32)
    qv = (q[:, :-1] + q[:, 1:] + 1) >> 1
    qh = (q[:-1, :] + q[1:, :] + 1) >> 1
    bv = (BETA_TABLE[np.clip(qv + beta_offset, 0, 51)] << shift).astype(np.int32)
    bh = (BETA_TABLE[np.clip(qh + beta_offset, 0, 51)] << shift).astype(np.int32)
    cv = _CHROMA_QP[np.clip(qv, 0, 51)]
    ch = _CHROMA_QP[np.clip(qh, 0, 51)]
    tcv = (TC_TABLE[np.clip(cv + DEFAULT_INTRA_TC_OFFSET + tc_offset, 0, 53)]
           << shift).astype(np.int32)
    tch = (TC_TABLE[np.clip(ch + DEFAULT_INTRA_TC_OFFSET + tc_offset, 0, 53)]
           << shift).astype(np.int32)
    return {"qv": qv, "qh": qh, "beta_v": bv, "beta_h": bh,
            "tc_c_v": tcv, "tc_c_h": tch}


def deblock_frame_inter(recon_y, recon_u, recon_v, cu_size: int, qp_y: int,
                        qp_c: int, bs_v, bs_h, bit_depth: int = 8,
                        beta_offset: int = 0, tc_offset: int = 0, xp=np):
    """Deblock an inter frame on the uniform grid with per-edge BS.

    bs_v: [rows, cols-1] vertical-edge strengths; bs_h: [rows-1, cols].
    Chroma is filtered only on BS==2 segments (spec 8.7.2.5.5)."""
    H, W = recon_y.shape
    n = cu_size
    nc = n // 2
    maxv = (1 << bit_depth) - 1
    shift = bit_depth - 8
    per_cu = np.ndim(qp_y) == 2
    if per_cu:
        e = _edge_qps(qp_y, beta_offset, tc_offset, shift)
        beta_v = np.repeat(e["beta_v"], n // 4, axis=0)      # [H/4, cols-1]
        beta_h = np.repeat(e["beta_h"].T, n // 4, axis=0)    # [W/4, rows-1]
        qp_v, qp_h = e["qv"], e["qh"]
        tc_c_v = np.repeat(e["tc_c_v"], nc, axis=0)          # [Hc, cols-1]
        tc_c_h = np.repeat(e["tc_c_h"].T, nc, axis=0)        # [Wc, rows-1]
    else:
        beta_v = beta_h = \
            int(BETA_TABLE[int(np.clip(qp_y + beta_offset, 0, 51))]) << shift
        qp_v = qp_h = qp_y
        tc_c_v = tc_c_h = int(TC_TABLE[int(np.clip(
            qp_c + DEFAULT_INTRA_TC_OFFSET + tc_offset, 0, 53))]) << shift

    y = recon_y.astype(xp.int32)
    u = recon_u.astype(xp.int32)
    v = recon_v.astype(xp.int32)

    vcols = list(range(n, W, n))
    hrows = list(range(n, H, n))
    vcols_c = list(range(nc, W // 2, nc))
    hrows_c = list(range(nc, H // 2, nc))

    # vertical edges: per-segment tc [H/4, cols-1]
    tc_v = np.repeat(_tc_seg_from_bs(bs_v, qp_v, tc_offset, shift),
                     n // 4, axis=0)
    tc_h = np.repeat(_tc_seg_from_bs(bs_h, qp_h, tc_offset, shift).T,
                     n // 4, axis=0)          # transposed pass: [W/4, rows-1]
    if xp is not np:
        tc_v, tc_h = xp.asarray(tc_v), xp.asarray(tc_h)
    y = _filter_vertical_edges(y, vcols, beta_v, tc_v, maxv, xp)
    y = xp.swapaxes(
        _filter_vertical_edges(xp.swapaxes(y, 0, 1), hrows, beta_h, tc_h,
                               maxv, xp), 0, 1)

    mask_v = np.repeat(bs_v == 2, nc, axis=0)            # [Hc, cols-1]
    mask_h = np.repeat((bs_h == 2).T, nc, axis=0)        # [Wc, rows-1]
    if xp is not np:
        mask_v, mask_h = xp.asarray(mask_v), xp.asarray(mask_h)
    for pl in ("u", "v"):
        p = u if pl == "u" else v
        p = _filter_vertical_edges_chroma(p, vcols_c, tc_c_v, maxv, xp,
                                          mask_v)
        p = xp.swapaxes(
            _filter_vertical_edges_chroma(xp.swapaxes(p, 0, 1), hrows_c,
                                          tc_c_h, maxv, xp, mask_h), 0, 1)
        if pl == "u":
            u = p
        else:
            v = p
    return y, u, v


# ---------------------------------------------------------------------------
# Quadtree (CTU32, depth-1) deblocking: the filtered edges are the CU
# boundaries on the 16-pel grid. Mid-CTU edges of an UNSPLIT CTU are TU/CU
# interior (TU == CU) -> not filtered (BS 0). Cell attributes at 16-pel
# granularity come from expanding the quadtree decisions.
# ---------------------------------------------------------------------------

def expand_qt_maps(out):
    """Expand quadtree decision tensors to 16-pel-granular maps.

    Returns dict of [2*rows, 2*cols] arrays: is_intra, cbf (of the TU
    containing each cell), mvx, mvy — plus the split map itself."""
    split = np.asarray(out["split"], bool)
    rows, cols = split.shape
    n = out["levels_y"].shape[2]               # 32
    h = n // 2

    def cellize(a4, a32):
        """a4: [r, c, 4] per-quadrant (z-order), a32: [r, c] whole-CTU."""
        a4 = np.asarray(a4)
        a32 = np.asarray(a32)
        sel = np.where(split[..., None], a4, a32[..., None])  # [r, c, 4]
        return (sel.reshape(rows, cols, 2, 2)
                .transpose(0, 2, 1, 3).reshape(2 * rows, 2 * cols))

    lv = np.asarray(out["levels_y"])
    cbf32 = lv.any(axis=(2, 3))
    cbf4 = (lv.reshape(rows, cols, 2, h, 2, h).any(axis=(3, 5))
            .reshape(rows, cols, 4))
    ui32 = np.asarray(out.get("use_intra",
                              np.ones((rows, cols), bool)), bool)
    ui4 = np.asarray(out.get("use_intra4",
                             np.ones((rows, cols, 4), bool)), bool)
    z = np.zeros((rows, cols), np.int32)
    z4 = np.zeros((rows, cols, 4), np.int32)
    g = lambda k, d: np.asarray(out[k]) if out.get(k) is not None else d
    mvx32 = g("mvx", z)
    mvy32 = g("mvy", z)
    mv4x = g("mv4x", z4)
    mv4y = g("mv4y", z4)
    # B slices: second-list MVs and prediction direction (P: all-L0)
    mv1x32, mv1y32 = g("mv1x", z), g("mv1y", z)
    mv41x, mv41y = g("mv41x", z4), g("mv41y", z4)
    pdir32 = g("pdir", np.ones((rows, cols), np.int32))
    pdir4 = g("pdir4", np.ones((rows, cols, 4), np.int32))
    # zero MVs on intra cells so pair comparison is well-defined
    ii = cellize(ui4, ui32).astype(bool)
    mvx = np.where(ii, 0, cellize(mv4x, mvx32))
    mvy = np.where(ii, 0, cellize(mv4y, mvy32))
    mv1x = np.where(ii, 0, cellize(mv41x, mv1x32))
    mv1y = np.where(ii, 0, cellize(mv41y, mv1y32))
    pdir = np.where(ii, 0, cellize(pdir4, pdir32))
    # unused-list MVs are zeroed by the encoder; keep them zero here too
    mvx = np.where((pdir & 1) != 0, mvx, 0)
    mvy = np.where((pdir & 1) != 0, mvy, 0)
    mv1x = np.where((pdir & 2) != 0, mv1x, 0)
    mv1y = np.where((pdir & 2) != 0, mv1y, 0)
    return {
        "split": split,
        "is_intra": ii,
        "cbf": cellize(cbf4, cbf32).astype(bool),
        "mvx": mvx,
        "mvy": mvy,
        "mv1x": mv1x,
        "mv1y": mv1y,
        "pdir": pdir,
    }


def compute_bs_qt(maps):
    """Boundary strengths on the 16-pel grid with interior-edge masking.

    maps: output of expand_qt_maps. Returns (bs_v [gr, gc-1],
    bs_h [gr-1, gc])."""
    ii = maps["is_intra"]
    cbf = maps["cbf"]
    mvx, mvy = maps["mvx"], maps["mvy"]
    mv1x = maps.get("mv1x", np.zeros_like(mvx))
    mv1y = maps.get("mv1y", np.zeros_like(mvy))
    pdir = maps.get("pdir", np.ones_like(mvx))
    split = maps["split"]
    gr, gc = ii.shape

    def pair(sa, sb):
        intra = ii[sa] | ii[sb]
        coded = cbf[sa] | cbf[sb]
        mis = ((pdir[sa] != pdir[sb])
               | (np.abs(mvx[sa] - mvx[sb]) >= 4)
               | (np.abs(mvy[sa] - mvy[sb]) >= 4)
               | (np.abs(mv1x[sa] - mv1x[sb]) >= 4)
               | (np.abs(mv1y[sa] - mv1y[sb]) >= 4))
        return np.where(intra, 2, np.where(coded | mis, 1, 0))

    bs_v = pair(np.s_[:, :-1], np.s_[:, 1:])        # [gr, gc-1]
    bs_h = pair(np.s_[:-1, :], np.s_[1:, :])        # [gr-1, gc]

    # interior edges of unsplit CTUs are not CU/TU boundaries
    split_rows = np.repeat(split, 2, axis=0)        # [gr, cols]
    split_cols = np.repeat(split, 2, axis=1)        # [rows, gc]
    for i in range(0, gc - 1, 2):                   # edge i: mid-CTU (x odd)
        bs_v[:, i] = np.where(split_rows[:, i // 2], bs_v[:, i], 0)
    for i in range(0, gr - 1, 2):
        bs_h[i, :] = np.where(split_cols[i // 2, :], bs_h[i, :], 0)
    return bs_v, bs_h


# ---------------------------------------------------------------------------
# Depth-2 quadtree deblocking: edges on the 8-pel grid, masked to true CU
# boundaries; chroma stays on the 16-luma-pel grid (8 chroma samples).
# ---------------------------------------------------------------------------

def _z_to_raster(a8):
    """[r, c, 4(q z-order), 4(sq z-order)] -> [r, c, 4(by), 4(bx)] raster."""
    r, c = a8.shape[:2]
    z = a8.reshape(r, c, 2, 2, 2, 2)          # (qy, qx, sy, sx)
    return z.transpose(0, 1, 2, 4, 3, 5).reshape(r, c, 4, 4)


def expand_qt_maps8(out):
    """8-pel-granular attribute maps + CU-id map for a depth-2 frame."""
    split = np.asarray(out["split"], bool)
    split16 = np.asarray(out["split16"], bool)
    rows, cols = split.shape
    s32 = split[:, :, None, None]
    # split16 is z-ordered over quadrants == raster for 2x2
    s16r = split16.reshape(rows, cols, 2, 2)
    s16 = np.repeat(np.repeat(s16r, 2, axis=2), 2, axis=3)    # [r,c,4,4] raster

    def sel(a32, a16, a8_z):
        """a32 [r,c]; a16 [r,c,4] (q z-order); a8_z [r,c,4,4] (z-order)."""
        a8 = _z_to_raster(np.asarray(a8_z))
        a16r = np.asarray(a16).reshape(rows, cols, 2, 2)
        a16f = np.repeat(np.repeat(a16r, 2, axis=2), 2, axis=3)
        a32f = np.broadcast_to(np.asarray(a32)[:, :, None, None], a8.shape)
        return np.where(s32 & s16, a8, np.where(s32, a16f, a32f))

    def to_grid(a):
        return (a.reshape(rows, cols, 4, 4).transpose(0, 2, 1, 3)
                .reshape(4 * rows, 4 * cols))

    lv = np.asarray(out["levels_y"])
    cbf32 = lv.any(axis=(2, 3))
    cbf16 = lv.reshape(rows, cols, 2, 16, 2, 16).any(axis=(3, 5)) \
        .reshape(rows, cols, 4)
    cbf8_r = lv.reshape(rows, cols, 4, 8, 4, 8).any(axis=(3, 5))  # raster
    # convert raster cbf8 to z-order for sel()'s a8_z argument
    cbf8_z = (cbf8_r.reshape(rows, cols, 2, 2, 2, 2)
              .transpose(0, 1, 2, 4, 3, 5).reshape(rows, cols, 4, 4))

    ones8 = np.ones((rows, cols, 4, 4), np.int32)
    zeros8 = np.zeros((rows, cols, 4, 4), np.int32)
    g = lambda k, d: np.asarray(out[k]) if out.get(k) is not None else d
    z2 = np.zeros((rows, cols), np.int32)
    z4 = np.zeros((rows, cols, 4), np.int32)
    ui = sel(g("use_intra", np.ones((rows, cols), bool)),
             g("use_intra4", np.ones((rows, cols, 4), bool)),
             g("use_intra8", ones8.astype(bool))).astype(bool)
    mvx = sel(g("mvx", z2), g("mv4x", z4), g("mv8x", zeros8))
    mvy = sel(g("mvy", z2), g("mv4y", z4), g("mv8y", zeros8))
    mv1x = sel(g("mv1x", z2), g("mv41x", z4), g("mv81x", zeros8))
    mv1y = sel(g("mv1y", z2), g("mv41y", z4), g("mv81y", zeros8))
    pdir = sel(g("pdir", np.ones((rows, cols), np.int32)),
               g("pdir4", np.ones((rows, cols, 4), np.int32)),
               g("pdir8", ones8))
    cbf = sel(cbf32, cbf16, cbf8_z).astype(bool)
    mvx = np.where(ui, 0, mvx)
    mvy = np.where(ui, 0, mvy)
    mv1x = np.where(ui, 0, mv1x)
    mv1y = np.where(ui, 0, mv1y)
    pdir = np.where(ui, 0, pdir)
    mvx = np.where((pdir & 1) != 0, mvx, 0)
    mvy = np.where((pdir & 1) != 0, mvy, 0)
    mv1x = np.where((pdir & 2) != 0, mv1x, 0)
    mv1y = np.where((pdir & 2) != 0, mv1y, 0)

    # CU id per cell: same id <=> same CU (masks interior edges)
    q_idx = np.arange(4)
    qmap = np.repeat(np.repeat(q_idx.reshape(2, 2), 2, 0), 2, 1)  # [4,4] by,bx
    # sq index within quadrant, raster layout
    sq_idx = np.zeros((4, 4), np.int32)
    for by in range(4):
        for bx in range(4):
            sq_idx[by, bx] = (by % 2) * 2 + (bx % 2)
    kmap = np.where(~s32[..., 0, 0][:, :, None, None],
                    0,
                    np.where(~s16, 1 + qmap[None, None],
                             5 + 4 * qmap[None, None] + sq_idx[None, None]))
    ctu_id = (np.arange(rows * cols).reshape(rows, cols) * 21)
    idm = ctu_id[:, :, None, None] + kmap

    return {
        "is_intra": to_grid(ui),
        "cbf": to_grid(cbf),
        "mvx": to_grid(mvx), "mvy": to_grid(mvy),
        "mv1x": to_grid(mv1x), "mv1y": to_grid(mv1y),
        "pdir": to_grid(pdir),
        "cu_id": to_grid(idm),
    }


def compute_bs_qt2(maps):
    """BS on the 8-pel grid, masked to CU boundaries via the id map."""
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
               | (np.abs(mvx[sa] - mvx[sb]) >= 4)
               | (np.abs(mvy[sa] - mvy[sb]) >= 4)
               | (np.abs(mv1x[sa] - mv1x[sb]) >= 4)
               | (np.abs(mv1y[sa] - mv1y[sb]) >= 4))
        bs = np.where(intra, 2, np.where(coded | mis, 1, 0))
        return np.where(cid[sa] != cid[sb], bs, 0)

    bs_v = pair(np.s_[:, :-1], np.s_[:, 1:])
    bs_h = pair(np.s_[:-1, :], np.s_[1:, :])
    return bs_v, bs_h


def deblock_frame_qt2(recon_y, recon_u, recon_v, qp_y: int, qp_c: int,
                      bs_v, bs_h, bit_depth: int = 8,
                      beta_offset: int = 0, tc_offset: int = 0,
                      cells: int = 4, xp=np):
    """Deblock with luma edges on the 8-pel grid (bs arrays at that
    granularity) and chroma edges on the 16-luma grid (spec: chroma is
    filtered on the 8-chroma-sample grid only)."""
    H, W = recon_y.shape
    maxv = (1 << bit_depth) - 1
    shift = bit_depth - 8
    per_cu = np.ndim(qp_y) == 2
    if per_cu:
        # per-CTU QP: expand the [rows, cols] map to the 8-pel cell grid
        # (QG == CTU), then per-edge average
        rows, cols = np.asarray(qp_y).shape
        cell_q = np.repeat(np.repeat(np.asarray(qp_y, np.int32), cells, 0),
                           cells, 1)
        e = _edge_qps(cell_q, beta_offset, tc_offset, shift)
        beta = np.repeat(e["beta_v"], 2, axis=0)
        beta_h_arr = np.repeat(e["beta_h"].T, 2, axis=0)
        qp_v_arr, qp_h_arr = e["qv"], e["qh"]
        tc_c_v = np.repeat(e["tc_c_v"][:, 1::2], 4, axis=0)
        tc_c_h = np.repeat(e["tc_c_h"][1::2, :].T, 4, axis=0)
    else:
        beta = int(BETA_TABLE[int(np.clip(qp_y + beta_offset, 0, 51))]) << shift
        beta_h_arr = beta
        qp_v_arr = qp_h_arr = qp_y
        tc_c_v = tc_c_h = int(TC_TABLE[int(np.clip(
            qp_c + DEFAULT_INTRA_TC_OFFSET + tc_offset, 0, 53))]) << shift

    y = recon_y.astype(xp.int32)
    u = recon_u.astype(xp.int32)
    v = recon_v.astype(xp.int32)

    vcols = list(range(8, W, 8))
    hrows = list(range(8, H, 8))
    tc_v = np.repeat(_tc_seg_from_bs(bs_v, qp_v_arr, tc_offset, shift), 2,
                     axis=0)
    tc_h = np.repeat(_tc_seg_from_bs(bs_h, qp_h_arr, tc_offset, shift).T, 2,
                     axis=0)
    if xp is not np:
        tc_v, tc_h = xp.asarray(tc_v), xp.asarray(tc_h)
    y = _filter_vertical_edges(y, vcols, beta, tc_v, maxv, xp)
    y = xp.swapaxes(
        _filter_vertical_edges(xp.swapaxes(y, 0, 1), hrows, beta_h_arr, tc_h,
                               maxv, xp), 0, 1)

    # chroma: edges every 8 chroma px (= 16 luma); BS from odd 8-grid edges
    vcols_c = list(range(8, W // 2, 8))
    hrows_c = list(range(8, H // 2, 8))
    bs_v_c = bs_v[:, 1::2]               # luma x = 16, 32, ...
    bs_h_c = bs_h[1::2, :]
    mask_v = np.repeat(bs_v_c == 2, 4, axis=0)       # 8-cell -> 4 chroma rows
    mask_h = np.repeat((bs_h_c == 2).T, 4, axis=0)
    if xp is not np:
        mask_v, mask_h = xp.asarray(mask_v), xp.asarray(mask_h)
    for pl in ("u", "v"):
        p = u if pl == "u" else v
        p = _filter_vertical_edges_chroma(p, vcols_c, tc_c_v, maxv, xp,
                                          mask_v)
        p = xp.swapaxes(
            _filter_vertical_edges_chroma(xp.swapaxes(p, 0, 1), hrows_c,
                                          tc_c_h, maxv, xp, mask_h), 0, 1)
        if pl == "u":
            u = p
        else:
            v = p
    return y, u, v


# ---------------------------------------------------------------------------
# CTU64 intra quadtree deblocking: CU-id map on the 8-pel cell grid; every
# CU-boundary edge is intra (BS 2), interior edges are not filtered.
# ---------------------------------------------------------------------------

def compute_bs_qt64_intra(split32, split16, max_depth: int):
    """split32: [rows, cols, 4] bool (z-order); split16: [rows, cols, 4, 4];
    returns (bs_v [gr, gc-1], bs_h [gr-1, gc]) on the 8px cell grid."""
    split32 = np.asarray(split32, bool)
    split16 = np.asarray(split16, bool)
    rows, cols = split32.shape[:2]
    gr, gc = 8 * rows, 8 * cols
    cu_id = np.zeros((gr, gc), np.int64)
    nid = 1
    qoff = ((0, 0), (0, 1), (1, 0), (1, 1))
    for r in range(rows):
        for c in range(cols):
            gy, gx = 8 * r, 8 * c
            for q, (qy, qx) in enumerate(qoff):
                y32, x32 = gy + 4 * qy, gx + 4 * qx
                if not split32[r, c, q]:
                    cu_id[y32:y32 + 4, x32:x32 + 4] = nid; nid += 1
                    continue
                for sq, (sy, sx) in enumerate(qoff):
                    y16, x16 = y32 + 2 * sy, x32 + 2 * sx
                    if max_depth == 2 or not split16[r, c, q, sq]:
                        cu_id[y16:y16 + 2, x16:x16 + 2] = nid; nid += 1
                        continue
                    for uy, ux in qoff:
                        cu_id[y16 + uy, x16 + ux] = nid; nid += 1
    bs_v = np.where(cu_id[:, :-1] != cu_id[:, 1:], 2, 0).astype(np.int32)
    bs_h = np.where(cu_id[:-1, :] != cu_id[1:, :], 2, 0).astype(np.int32)
    return bs_v, bs_h
