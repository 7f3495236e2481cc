"""Sample Adaptive Offset: classification, statistics, decision, application.

Spec: H.265 8.7.3 (decoding process), 7.3.8.3 (syntax feeds in ctu_syntax).
Reference behavior studied (not copied): encoder/sao.cpp (calcSaoStatsCTU,
rdoSaoUnitCu, applyPixelOffsets).

Vectorized picture-at-once: EO category maps are whole-plane shifts/compares,
per-CTU statistics are reshape-reductions — the K11 "classify + histogram"
kernels in dense form.
"""

from __future__ import annotations

import numpy as np

SAO_OFF = 0
SAO_BO = 1
SAO_EO = 2

# EO neighbor offsets per class: 0=horizontal, 1=vertical, 2=135deg, 3=45deg
EO_NEIGHBORS = {
    0: ((0, -1), (0, 1)),
    1: ((-1, 0), (1, 0)),
    2: ((-1, -1), (1, 1)),
    3: ((-1, 1), (1, -1)),
}


def eo_category(plane: np.ndarray, eo_class: int) -> np.ndarray:
    """Per-pixel EO category (0 = unfiltered/flat, 1..4) with picture-border
    pixels (missing neighbor) forced to category 0."""
    H, W = plane.shape
    p = plane.astype(np.int32)
    (dy0, dx0), (dy1, dx1) = EO_NEIGHBORS[eo_class]

    def shifted(dy, dx):
        out = np.full((H, W), 1 << 30, np.int32)   # sentinel: unavailable
        ys = slice(max(dy, 0), H + min(dy, 0))
        xs = slice(max(dx, 0), W + min(dx, 0))
        yd = slice(max(-dy, 0), H + min(-dy, 0))
        xd = slice(max(-dx, 0), W + min(-dx, 0))
        out[yd, xd] = p[ys, xs]
        return out

    n0 = shifted(dy0, dx0)
    n1 = shifted(dy1, dx1)
    valid = (n0 != (1 << 30)) & (n1 != (1 << 30))
    raw = 2 + np.sign(p - np.where(valid, n0, p)) + \
        np.sign(p - np.where(valid, n1, p))
    cat = np.select([raw == 0, raw == 1, raw == 2, raw == 3, raw == 4],
                    [1, 2, 0, 3, 4])
    return np.where(valid, cat, 0).astype(np.int32)


def bo_band(plane: np.ndarray, bit_depth: int = 8) -> np.ndarray:
    return (plane.astype(np.int32) >> (bit_depth - 5))


def _ctu_reduce(values: np.ndarray, mask: np.ndarray, n: int):
    """Sum `values*mask` and `mask` per n x n CTU tile -> [rows, cols]."""
    H, W = values.shape
    r = (values * mask).reshape(H // n, n, W // n, n).sum(axis=(1, 3))
    c = mask.reshape(H // n, n, W // n, n).sum(axis=(1, 3))
    return r, c


def _tile_bincount(tile_id, idx, diff, ntiles, nbins):
    """Per-tile histogram: (sum of diff, count) for each bin of idx.
    One bincount pass instead of nbins masked reductions."""
    key = (tile_id * nbins + idx).ravel()
    cnt = np.bincount(key, minlength=ntiles * nbins)
    s = np.bincount(key, weights=diff.ravel(), minlength=ntiles * nbins)
    return (s.astype(np.int64).reshape(ntiles, nbins),
            cnt.astype(np.int64).reshape(ntiles, nbins))


def sao_stats(recon: np.ndarray, src: np.ndarray, n: int, bit_depth: int = 8):
    """Per-CTU statistics: for each EO class & category and each BO band:
    (sum of (src-recon), count). Returns dict."""
    diff = (src.astype(np.int64) - recon.astype(np.int64)).astype(np.float64)
    H, W = recon.shape
    rows, cols = H // n, W // n
    ntiles = rows * cols
    tile = ((np.arange(H) // n)[:, None] * cols
            + (np.arange(W) // n)[None, :]).astype(np.int64)
    eo = np.zeros((4, 5, rows, cols, 2), np.int64)    # [class, cat, r, c, (sum,count)]
    for cls in range(4):
        cat = eo_category(recon, cls)
        s, c = _tile_bincount(tile, cat, diff, ntiles, 5)
        eo[cls, :, :, :, 0] = s.T.reshape(5, rows, cols)
        eo[cls, :, :, :, 1] = c.T.reshape(5, rows, cols)
    bands = bo_band(recon, bit_depth)
    s, c = _tile_bincount(tile, bands, diff, ntiles, 32)
    bo = np.zeros((32, rows, cols, 2), np.int64)
    bo[:, :, :, 0] = s.T.reshape(32, rows, cols)
    bo[:, :, :, 1] = c.T.reshape(32, rows, cols)
    return {"eo": eo, "bo": bo}


def _best_offset(s, c, max_abs, positive_only=None):
    """Optimal integer offset and its distortion delta (negative = gain).
    delta_D for offset h on (sum s, count c): c*h^2 - 2*h*s."""
    if c == 0:
        return 0, 0
    h = int(np.clip(round(s / c), -max_abs, max_abs))
    if positive_only is True:
        h = max(h, 0)
    elif positive_only is False:
        h = min(h, 0)
    best, bd = 0, 0
    step = 1 if h >= 0 else -1
    for cand in range(0, h + step, step):
        d = c * cand * cand - 2 * cand * s
        if d < bd:
            best, bd = cand, d
    return best, bd


def decide_sao_ctu(stats, r, c, bit_depth: int = 8, lambda_bits: float = 60.0):
    """Choose (type, class_or_band, offsets[4]) for one CTU/component.
    Returns (type, aux, offsets, dist_delta)."""
    max_abs = (1 << (min(bit_depth, 10) - 5)) - 1
    best = (SAO_OFF, 0, [0, 0, 0, 0], 0.0)
    best_cost = 0.0
    for cls in range(4):
        offs = []
        dtot = 0
        for k in range(1, 5):
            s = int(stats["eo"][cls, k, r, c, 0])
            cnt = int(stats["eo"][cls, k, r, c, 1])
            # EO sign rule: cats 1,2 offsets >= 0; cats 3,4 <= 0
            h, d = _best_offset(s, cnt, max_abs, positive_only=(k <= 2))
            offs.append(h)
            dtot += d
        cost = dtot + lambda_bits
        if cost < best_cost:
            best_cost = cost
            best = (SAO_EO, cls, offs, dtot)
    # band offset: best 4 consecutive bands
    sums = stats["bo"][:, r, c, 0]
    cnts = stats["bo"][:, r, c, 1]
    band_off = []
    band_d = np.zeros(32)
    for b in range(32):
        h, d = _best_offset(int(sums[b]), int(cnts[b]), max_abs)
        band_off.append(h)
        band_d[b] = d
    # windows of 4
    wins = [band_d[b:b + 4].sum() for b in range(29)]
    wb = int(np.argmin(wins))
    cost = wins[wb] + lambda_bits
    if cost < best_cost:
        best = (SAO_BO, wb, [band_off[wb + i] for i in range(4)], wins[wb])
    return best


def apply_sao_component(recon: np.ndarray, params, n: int, bit_depth: int = 8):
    """params: [rows][cols] of (type, aux, offsets). Returns filtered plane."""
    H, W = recon.shape
    rows, cols = H // n, W // n
    out = recon.astype(np.int32).copy()
    maxv = (1 << bit_depth) - 1
    # group CTUs by (type, aux) for vectorized application
    cat_cache = {}
    bands = bo_band(recon, bit_depth)
    for r in range(rows):
        for c in range(cols):
            t, aux, offs = params[r][c][:3]
            if t == SAO_OFF or all(o == 0 for o in offs):
                continue
            ys, xs = slice(r * n, (r + 1) * n), slice(c * n, (c + 1) * n)
            if t == SAO_EO:
                if aux not in cat_cache:
                    cat_cache[aux] = eo_category(recon, aux)
                cat = cat_cache[aux][ys, xs]
                lut = np.array([0, offs[0], offs[1], offs[2], offs[3]], np.int32)
                out[ys, xs] = np.clip(recon[ys, xs].astype(np.int32) + lut[cat],
                                      0, maxv)
            else:
                band = bands[ys, xs]
                lut = np.zeros(32, np.int32)
                for i in range(4):
                    lut[(aux + i) % 32] = offs[i]
                out[ys, xs] = np.clip(recon[ys, xs].astype(np.int32)
                                      + lut[band], 0, maxv)
    return out


def decide_sao_chroma(stats_cb, stats_cr, r, c, bit_depth: int = 8,
                      lambda_bits: float = 60.0):
    """Joint chroma decision: cb/cr share type and EO class (spec), offsets
    and BO band positions are per-component. Returns
    (type, aux_cb, aux_cr, offs_cb, offs_cr)."""
    max_abs = (1 << (min(bit_depth, 10) - 5)) - 1
    best = (SAO_OFF, 0, 0, [0] * 4, [0] * 4)
    best_cost = 0.0
    for cls in range(4):
        offs = {0: [], 1: []}
        dtot = 0
        for i, st in enumerate((stats_cb, stats_cr)):
            for k in range(1, 5):
                s = int(st["eo"][cls, k, r, c, 0])
                cnt = int(st["eo"][cls, k, r, c, 1])
                h, d = _best_offset(s, cnt, max_abs, positive_only=(k <= 2))
                offs[i].append(h)
                dtot += d
        cost = dtot + lambda_bits
        if cost < best_cost:
            best_cost = cost
            best = (SAO_EO, cls, cls, offs[0], offs[1])
    # BO with independent band positions
    tot_d = 0
    auxs, offses = [], []
    for st in (stats_cb, stats_cr):
        band_off, band_d = [], np.zeros(32)
        for b in range(32):
            h, d = _best_offset(int(st["bo"][b, r, c, 0]),
                                int(st["bo"][b, r, c, 1]), max_abs)
            band_off.append(h)
            band_d[b] = d
        wins = [band_d[b:b + 4].sum() for b in range(29)]
        wb = int(np.argmin(wins))
        auxs.append(wb)
        offses.append([band_off[wb + i] for i in range(4)])
        tot_d += wins[wb]
    if tot_d + lambda_bits < best_cost:
        best = (SAO_BO, auxs[0], auxs[1], offses[0], offses[1])
    return best
