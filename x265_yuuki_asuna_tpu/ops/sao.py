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


def eo_category(plane, eo_class: int, xp=np):
    """Per-pixel EO category (0 = unfiltered/flat, 1..4) with picture-border
    pixels (missing neighbor) forced to category 0. xp-generic (K11 device
    form uses jnp: pad+slice shifts fuse into the stats reduction)."""
    H, W = plane.shape
    p = plane.astype(xp.int32)
    (dy0, dx0), (dy1, dx1) = EO_NEIGHBORS[eo_class]
    sent = xp.int32(1 << 30)
    pp = xp.pad(p, ((1, 1), (1, 1)), mode="constant",
                constant_values=1 << 30)

    def shifted(dy, dx):
        return pp[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]

    n0 = shifted(dy0, dx0)
    n1 = shifted(dy1, dx1)
    valid = (n0 != sent) & (n1 != sent)
    raw = 2 + xp.sign(p - xp.where(valid, n0, p)) + \
        xp.sign(p - xp.where(valid, n1, p))
    cat = xp.where(raw == 0, 1,
                   xp.where(raw == 1, 2,
                            xp.where(raw == 2, 0,
                                     xp.where(raw == 3, 3, 4))))
    return xp.where(valid, cat, 0).astype(xp.int32)


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


_STATS_JIT = {}
_STATS3_JIT = {}


def _stats_fn(H, W, n, bit_depth):
    """Build the per-plane stats body (shared by the 1- and 3-plane jits)."""
    import jax.numpy as jnp
    rows, cols = H // n, W // n

    def tile_sum(x):
        return x.reshape(rows, n, cols, n).sum(axis=(1, 3))

    def f(rec, sr):
        rec32 = rec.astype(jnp.int32)
        d = sr.astype(jnp.float32) - rec32.astype(jnp.float32)
        eo_s = []
        eo_c = []
        for cls in range(4):
            cat = eo_category(rec32, cls, xp=jnp)
            ss = []
            cc = []
            for k in range(5):
                m = (cat == k).astype(jnp.float32)
                ss.append(tile_sum(m * d))
                cc.append(tile_sum(m))
            eo_s.append(jnp.stack(ss))
            eo_c.append(jnp.stack(cc))
        bands = jnp.right_shift(rec32, bit_depth - 5)
        bs = []
        bc = []
        for b in range(32):
            m = (bands == b).astype(jnp.float32)
            bs.append(tile_sum(m * d))
            bc.append(tile_sum(m))
        return (jnp.stack(eo_s), jnp.stack(eo_c),
                jnp.stack(bs), jnp.stack(bc))

    return f


def _to_stats_dict(eo_s, eo_c, bo_s, bo_c):
    eo = np.zeros(eo_s.shape + (2,), np.int64)
    eo[..., 0] = np.rint(eo_s).astype(np.int64)
    eo[..., 1] = np.rint(eo_c).astype(np.int64)
    bo = np.zeros(bo_s.shape + (2,), np.int64)
    bo[..., 0] = np.rint(bo_s).astype(np.int64)
    bo[..., 1] = np.rint(bo_c).astype(np.int64)
    return {"eo": eo, "bo": bo}


def sao_stats_dev3(rec3, src3, n: int, bit_depth: int = 8):
    """All three planes' SAO statistics in ONE device dispatch (one tunnel
    round trip instead of three) with minimal-dtype uploads."""
    import jax
    import jax.numpy as jnp
    pdt = np.uint16 if bit_depth > 8 else np.uint8
    Hy, Wy = rec3[0].shape
    Hc, Wc = rec3[1].shape
    nc = n // 2
    key = (Hy, Wy, n, bit_depth)
    if key not in _STATS3_JIT:
        fy = _stats_fn(Hy, Wy, n, bit_depth)
        fc = _stats_fn(Hc, Wc, nc, bit_depth)

        def f3(ry, sy, ru, su, rv, sv):
            return fy(ry, sy), fc(ru, su), fc(rv, sv)

        _STATS3_JIT[key] = jax.jit(f3)
    args = []
    for r, s in zip(rec3, src3):
        args += [jnp_arr(np.asarray(r).astype(pdt)),
                 jnp_arr(np.asarray(s).astype(pdt))]
    outs = _STATS3_JIT[key](*args)
    return tuple(_to_stats_dict(*(np.asarray(a) for a in o)) for o in outs)


def sao_stats_dev(recon, src, n: int, bit_depth: int = 8):
    """K11 device form of sao_stats: per-CTU (sum, count) for every EO
    class/category and BO band, computed as fused mask+tile reductions in
    ONE jitted program (no host full-resolution pass — the round-2
    host-numpy bincount ran per frame on the flagship path).

    Sums fit f32 exactly: |diff| <= 1023, tile count <= 64^2."""
    import jax
    import jax.numpy as jnp
    H, W = recon.shape
    key = (H, W, n, bit_depth)
    if key not in _STATS_JIT:
        rows, cols = H // n, W // n

        def tile_sum(x):
            return x.reshape(rows, n, cols, n).sum(axis=(1, 3))

        def f(rec, sr):
            rec32 = rec.astype(jnp.int32)
            d = sr.astype(jnp.float32) - rec32.astype(jnp.float32)
            eo_s = []
            eo_c = []
            for cls in range(4):
                cat = eo_category(rec32, cls, xp=jnp)
                ss = []
                cc = []
                for k in range(5):
                    m = (cat == k).astype(jnp.float32)
                    ss.append(tile_sum(m * d))
                    cc.append(tile_sum(m))
                eo_s.append(jnp.stack(ss))
                eo_c.append(jnp.stack(cc))
            bands = jnp.right_shift(rec32, bit_depth - 5)
            bs = []
            bc = []
            for b in range(32):
                m = (bands == b).astype(jnp.float32)
                bs.append(tile_sum(m * d))
                bc.append(tile_sum(m))
            return (jnp.stack(eo_s), jnp.stack(eo_c),
                    jnp.stack(bs), jnp.stack(bc))

        _STATS_JIT[key] = jax.jit(f)
    eo_s, eo_c, bo_s, bo_c = (np.asarray(a) for a in _STATS_JIT[key](
        jnp_arr(recon), jnp_arr(src)))
    rows, cols = H // n, W // n
    eo = np.zeros((4, 5, rows, cols, 2), np.int64)
    eo[..., 0] = np.rint(eo_s).astype(np.int64)
    eo[..., 1] = np.rint(eo_c).astype(np.int64)
    bo = np.zeros((32, rows, cols, 2), np.int64)
    bo[..., 0] = np.rint(bo_s).astype(np.int64)
    bo[..., 1] = np.rint(bo_c).astype(np.int64)
    return {"eo": eo, "bo": bo}


def jnp_arr(x):
    import jax.numpy as jnp
    return jnp.asarray(np.ascontiguousarray(x))


def _best_offsets_vec(s, c, max_abs: int, sign=None):
    """Vectorized _best_offset over arbitrary leading axes.
    sign: None | 'pos' | 'neg' (EO category sign rule).
    Returns (h, delta_d) with delta_d <= 0."""
    s = s.astype(np.float64)
    c = c.astype(np.float64)
    h0 = np.rint(np.divide(s, np.maximum(c, 1.0)))
    h0 = np.clip(h0, -max_abs, max_abs)
    if sign == "pos":
        h0 = np.maximum(h0, 0)
    elif sign == "neg":
        h0 = np.minimum(h0, 0)
    sgn = np.sign(h0)
    mag = np.abs(h0)
    cands = np.arange(max_abs + 1, dtype=np.float64)
    d = (c[..., None] * cands * cands
         - 2.0 * cands * (s * sgn)[..., None])
    d = np.where(cands <= mag[..., None], d, 0.0)
    k = np.argmin(d, axis=-1)
    best_d = np.take_along_axis(d, k[..., None], -1)[..., 0]
    return (k * sgn).astype(np.int32), best_d


def sao_lambda(qp) -> np.float32:
    """SSD-per-bit lambda2 at the slice QP (x265_lambda2_tab shape);
    float32 to match the in-jit decide bit-for-bit."""
    return np.float32(np.float32(0.85)
                      * np.exp2((np.float32(qp) - np.float32(12.0))
                                / np.float32(3.0), dtype=np.float32))


def decide_sao_luma_all(stats, bit_depth: int = 8,
                        lam: float = 60.0):
    """Vectorized decide_sao_ctu over the whole CTU grid; candidate cost =
    delta-SSD + lam * estimated syntax bits (rdoSaoUnitCu analog).
    Returns (t [r,c], aux [r,c], offs [r,c,4])."""
    max_abs = (1 << (min(bit_depth, 10) - 5)) - 1
    s = stats["eo"][:, 1:5, :, :, 0]
    c = stats["eo"][:, 1:5, :, :, 1]
    h_pos, d_pos = _best_offsets_vec(s, c, max_abs, "pos")
    h_neg, d_neg = _best_offsets_vec(s, c, max_abs, "neg")
    sel_pos = np.arange(4)[None, :, None, None] < 2
    h = np.where(sel_pos, h_pos, h_neg)            # [4, 4, r, c]
    d = np.where(sel_pos, d_pos, d_neg)
    dtot = d.sum(axis=1)                           # [4, r, c]
    cls = np.argmin(dtot, axis=0)                  # [r, c]
    eo_d = np.take_along_axis(dtot, cls[None], 0)[0]
    eo_offs = np.take_along_axis(
        h, cls[None, None], 0)[0].transpose(1, 2, 0)   # [r, c, 4]

    hb, db = _best_offsets_vec(stats["bo"][..., 0], stats["bo"][..., 1],
                               max_abs)            # [32, r, c]
    wins = np.stack([db[b:b + 4].sum(axis=0) for b in range(29)])
    wb = np.argmin(wins, axis=0)                   # [r, c]
    bo_d = np.take_along_axis(wins, wb[None], 0)[0]
    bi = wb[None] + np.arange(4)[:, None, None]
    bo_offs = np.take_along_axis(hb, bi, 0).transpose(1, 2, 0)

    lam = np.float32(lam)
    eo_bits = np.float32(3.0) + np.sum(np.abs(eo_offs) + 1,
                                       axis=-1).astype(np.float32)
    bo_bits = np.float32(6.0) + np.sum(np.abs(bo_offs) + 1 + (bo_offs != 0),
                                       axis=-1).astype(np.float32)
    eo_cost = eo_d.astype(np.float32) + lam * eo_bits
    bo_cost = bo_d.astype(np.float32) + lam * bo_bits
    use_eo = (eo_cost < 0) & (eo_cost <= bo_cost)
    use_bo = (bo_cost < 0) & ~use_eo
    t = np.where(use_eo, SAO_EO, np.where(use_bo, SAO_BO, SAO_OFF))
    aux = np.where(use_eo, cls, wb).astype(np.int32)
    offs = np.where(use_eo[..., None], eo_offs,
                    np.where(use_bo[..., None], bo_offs, 0)).astype(np.int32)
    return t.astype(np.int32), aux, offs


def decide_sao_chroma_all(stats_cb, stats_cr, bit_depth: int = 8,
                          lam: float = 60.0):
    """Vectorized decide_sao_chroma: cb/cr share the type and EO class.
    Returns (t, aux_cb, aux_cr, offs_cb, offs_cr)."""
    max_abs = (1 << (min(bit_depth, 10) - 5)) - 1
    hs, ds = [], []
    for st in (stats_cb, stats_cr):
        s = st["eo"][:, 1:5, :, :, 0]
        c = st["eo"][:, 1:5, :, :, 1]
        h_pos, d_pos = _best_offsets_vec(s, c, max_abs, "pos")
        h_neg, d_neg = _best_offsets_vec(s, c, max_abs, "neg")
        sel_pos = np.arange(4)[None, :, None, None] < 2
        hs.append(np.where(sel_pos, h_pos, h_neg))
        ds.append(np.where(sel_pos, d_pos, d_neg))
    dtot = ds[0].sum(axis=1) + ds[1].sum(axis=1)   # [4, r, c]
    cls = np.argmin(dtot, axis=0)
    eo_d = np.take_along_axis(dtot, cls[None], 0)[0]
    eo_offs = [np.take_along_axis(h, cls[None, None], 0)[0]
               .transpose(1, 2, 0) for h in hs]

    bo_d = 0.0
    wbs, bo_offs = [], []
    for st in (stats_cb, stats_cr):
        hb, db = _best_offsets_vec(st["bo"][..., 0], st["bo"][..., 1],
                                   max_abs)
        wins = np.stack([db[b:b + 4].sum(axis=0) for b in range(29)])
        wb = np.argmin(wins, axis=0)
        bo_d = bo_d + np.take_along_axis(wins, wb[None], 0)[0]
        bi = wb[None] + np.arange(4)[:, None, None]
        wbs.append(wb.astype(np.int32))
        bo_offs.append(np.take_along_axis(hb, bi, 0).transpose(1, 2, 0))

    lam = np.float32(lam)
    eo_bits = np.float32(3.0) + sum(
        np.sum(np.abs(o) + 1, axis=-1) for o in eo_offs).astype(np.float32)
    bo_bits = np.float32(11.0) + sum(
        np.sum(np.abs(o) + 1 + (o != 0), axis=-1)
        for o in bo_offs).astype(np.float32)
    eo_cost = np.asarray(eo_d, np.float32) + lam * eo_bits
    bo_cost = np.asarray(bo_d, np.float32) + lam * bo_bits
    use_eo = (eo_cost < 0) & (eo_cost <= bo_cost)
    use_bo = (bo_cost < 0) & ~use_eo
    t = np.where(use_eo, SAO_EO, np.where(use_bo, SAO_BO, SAO_OFF))
    aux_cb = np.where(use_eo, cls, wbs[0]).astype(np.int32)
    aux_cr = np.where(use_eo, cls, wbs[1]).astype(np.int32)
    z = np.zeros_like(eo_offs[0])
    offs_cb = np.where(use_eo[..., None], eo_offs[0],
                       np.where(use_bo[..., None], bo_offs[0], z))
    offs_cr = np.where(use_eo[..., None], eo_offs[1],
                       np.where(use_bo[..., None], bo_offs[1], z))
    return (t.astype(np.int32), aux_cb, aux_cr,
            offs_cb.astype(np.int32), offs_cr.astype(np.int32))


def apply_sao_component_vec(recon, t, aux, offs, n: int,
                            bit_depth: int = 8):
    """Vectorized apply: whole-plane gathers instead of per-CTU loops.
    t/aux: [rows, cols]; offs: [rows, cols, 4]."""
    H, W = recon.shape
    rows, cols = H // n, W // n
    rec32 = recon.astype(np.int32)
    out = rec32.copy()
    maxv = (1 << bit_depth) - 1
    tr = np.arange(H) // n
    tc = np.arange(W) // n
    TR, TC = tr[:, None], tc[None, :]
    for cls in range(4):
        m = (t == SAO_EO) & (aux == cls)
        if not m.any():
            continue
        cat = eo_category(recon, cls)
        lut = np.zeros((rows, cols, 5), np.int32)
        lut[..., 1:] = np.where(m[..., None], offs, 0)
        out = out + lut[TR, TC, cat]
    mbo = (t == SAO_BO)
    if mbo.any():
        bands = bo_band(recon, bit_depth)
        lut32 = np.zeros((rows, cols, 32), np.int32)
        ii = (aux[..., None] + np.arange(4)) % 32
        np.put_along_axis(lut32, ii,
                          np.where(mbo[..., None], offs, 0), axis=-1)
        out = out + lut32[TR, TC, bands]
    return np.clip(out, 0, maxv)


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
