"""HEVC intra prediction: all 35 modes, batched over blocks ("allangs" style).

Reference behavior (studied, not copied):
  - C reference:      /root/reference/source/common/intrapred.cpp
  - asm counterpart:  intrapred8_allangs.asm etc. (SURVEY.md K5) — predicts all
    33 angles at once for the fast-intra SATD scan; here that batching is the
    *only* mode: predictions for every mode of every block in a batch are
    produced together as dense gathers/matmuls (MXU/VPU-friendly).
Spec: ITU-T H.265 sec 8.4.4.2 (reference substitution, [1 2 1] smoothing,
strong smoothing, planar/DC/angular prediction, boundary filters).

Reference sample layout used throughout ("v vector"):
    v[k], k in [0, 4N]:  k=0..2N-1   -> left[2N-1-k]   (bottom-left .. left-top)
                         k=2N        -> top-left corner
                         k=2N+1..4N  -> top[0..2N-1]   (left .. top-right)
i.e. v is the decoded boundary walked from bottom-left to top-right — the
spec's substitution scan order, making forward-fill substitution a 1D scan and
the [1 2 1] reference filter a 1D convolution along v.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

# intraPredAngle per mode 2..34 (H.265 table 8-5)
ANGLES = np.array([32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17, -21,
                   -26, -32, -26, -21, -17, -13, -9, -5, -2, 0, 2, 5, 9, 13,
                   17, 21, 26, 32], dtype=np.int32)
# invAngle per mode 11..25 (H.265 table 8-6): Round(8192 / angle)
INV_ANGLES = {-2: -4096, -5: -1638, -9: -910, -13: -630, -17: -482,
              -21: -390, -26: -315, -32: -256}

PLANAR_IDX = 0
DC_IDX = 1
HOR_IDX = 10
VER_IDX = 26


def angle_of(mode: int) -> int:
    return int(ANGLES[mode - 2])


# ---------------------------------------------------------------------------
# Per-(mode, N) static gather tables into the v vector.
# ---------------------------------------------------------------------------

def _ref_index_to_v(t: int, n: int, vertical: bool, inv_angle: int) -> int:
    """Map spec ref[] index t to a v index, projecting t<0 via invAngle."""
    two_n = 2 * n
    if t >= 0:
        if vertical:
            # ref[t] = p[t-1][-1]: t=0 corner, else top[t-1]
            return two_n if t == 0 else two_n + t
        # horizontal: ref[t] = p[-1][t-1]: t=0 corner, else left[t-1]
        return two_n if t == 0 else two_n - t
    # projected negative extension
    proj = -1 + ((t * inv_angle + 128) >> 8)
    if vertical:
        # comes from left[proj]
        return two_n - 1 - proj
    # comes from top[proj]
    return two_n + 1 + proj


@lru_cache(maxsize=None)
def angular_tables(n: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For all 33 angular modes (2..34) at size n, return
    (idx1 [33,n,n], idx2 [33,n,n], frac [33,n,n]) where
    pred = ((32-frac)*v[idx1] + frac*v[idx2] + 16) >> 5.
    """
    idx1 = np.zeros((33, n, n), dtype=np.int32)
    idx2 = np.zeros((33, n, n), dtype=np.int32)
    frac = np.zeros((33, n, n), dtype=np.int32)
    for mi, mode in enumerate(range(2, 35)):
        a = angle_of(mode)
        vertical = mode >= 18
        inv = INV_ANGLES.get(a, 0)
        for q in range(n):          # q: the "stride" coordinate (y for V, x for H)
            i = ((q + 1) * a) >> 5
            f = ((q + 1) * a) & 31
            for p_ in range(n):     # p_: the coordinate along the main reference
                t1 = p_ + i + 1
                t2 = p_ + i + 2
                # For f == 0 the second tap is unused; point it at t1 to keep
                # gathers in range.
                vt1 = _ref_index_to_v(t1, n, vertical, inv)
                vt2 = _ref_index_to_v(t2, n, vertical, inv) if f else vt1
                if vertical:
                    y, x = q, p_
                else:
                    y, x = p_, q
                idx1[mi, y, x] = vt1
                idx2[mi, y, x] = vt2
                frac[mi, y, x] = f
    return idx1, idx2, frac


@lru_cache(maxsize=None)
def mode_filter_flags(n: int) -> np.ndarray:
    """filterFlag per mode (35,) for luma at size n (H.265 8.4.4.2.3)."""
    flags = np.zeros(35, dtype=bool)
    if n == 4:
        return flags
    thresh = {8: 7, 16: 1, 32: 0}[n]
    for mode in range(35):
        if mode == DC_IDX:
            continue
        if mode == PLANAR_IDX:
            flags[mode] = True
            continue
        min_dist = min(abs(mode - VER_IDX), abs(mode - HOR_IDX))
        flags[mode] = min_dist > thresh
    return flags


# ---------------------------------------------------------------------------
# Reference construction (picture-level code gathers the raw boundary; here we
# substitute unavailable samples and filter).
# ---------------------------------------------------------------------------

def substitute_references(v_raw, avail, bit_depth: int = 8, xp=np):
    """Spec 8.4.4.2.2 substitution, vectorized.

    v_raw:  [..., 4N+1] boundary samples (garbage where unavailable)
    avail:  [..., 4N+1] bool availability in the same scan order
    Returns substituted v. If nothing is available, fills 1 << (bd-1).
    """
    L = v_raw.shape[-1]
    idx = xp.arange(L, dtype=xp.int32)
    # forward fill: each position takes the nearest available at or before it
    marked = xp.where(avail, idx, xp.int32(-1))
    ffill = _cummax(marked, xp)
    # positions before the first available copy the first available
    first_avail = xp.argmax(avail.astype(xp.int32), axis=-1)
    src = xp.where(ffill >= 0, ffill, first_avail[..., None].astype(xp.int32))
    out = xp.take_along_axis(v_raw, src.astype(int) if xp is np else src, axis=-1)
    none_avail = ~xp.any(avail, axis=-1, keepdims=True)
    return xp.where(none_avail, xp.full_like(out, 1 << (bit_depth - 1)), out)


def _cummax(x, xp):
    if xp is np:
        return np.maximum.accumulate(x, axis=-1)
    import jax
    return jax.lax.cummax(x, axis=x.ndim - 1)


def filter_references(v, n: int, bit_depth: int = 8, strong_enabled: bool = False, xp=np):
    """[1 2 1]/4 reference smoothing along v; endpoints unchanged
    (spec 8.4.4.2.3). Strong smoothing for n==32 applied where the flatness
    conditions hold (per-block predicate)."""
    vi = v.astype(xp.int32)
    mid = xp.right_shift(vi[..., :-2] + 2 * vi[..., 1:-1] + vi[..., 2:] + 2, 2)
    filt = xp.concatenate([vi[..., :1], mid, vi[..., -1:]], axis=-1)
    if strong_enabled and n == 32:
        filt = _strong_smooth(vi, filt, n, bit_depth, xp)
    return filt


def _strong_smooth(vi, filt, n: int, bit_depth: int, xp):
    """Strong intra smoothing (bilinear) for 32x32 when boundary is flat."""
    two_n = 2 * n
    corner = vi[..., two_n]
    top0 = vi[..., two_n + 1]
    top_mid = vi[..., two_n + n]        # p[N-1][-1] is top[n-1] = v[2N+n]
    top_end = vi[..., 4 * n]            # p[2N-1][-1]
    left0 = vi[..., two_n - 1]
    left_mid = vi[..., n]               # left[n-1] = v[2N-1-(n-1)] = v[n+? ] -> v[2n-1-(n-1)] = v[n]
    left_end = vi[..., 0]               # left[2N-1]
    th = 1 << (bit_depth - 5)
    flat_top = xp.abs(corner + top_end - 2 * top_mid) < th
    flat_left = xp.abs(corner + left_end - 2 * left_mid) < th
    use_strong = (flat_top & flat_left)[..., None]
    # bilinear: left run v[0..2N] from left_end..corner; top run v[2N..4N]
    i = xp.arange(2 * n + 1, dtype=xp.int32)
    left_lin = xp.right_shift(
        (i[None, :]) * corner[..., None] + (two_n - i[None, :]) * left_end[..., None] + n,
        int(np.log2(two_n)))
    top_lin = xp.right_shift(
        (two_n - i[None, :]) * corner[..., None] + i[None, :] * top_end[..., None] + n,
        int(np.log2(two_n)))
    strong = xp.concatenate([left_lin[..., :-1], top_lin], axis=-1)
    return xp.where(use_strong, strong, filt)


# ---------------------------------------------------------------------------
# All-modes prediction
# ---------------------------------------------------------------------------

def predict_all_modes(v, n: int, bit_depth: int = 8, luma: bool = True,
                      strong_smoothing: bool = False, xp=np):
    """Predict all 35 modes for a batch of blocks.

    v: [..., 4N+1] substituted (unfiltered) reference vector.
    Returns [..., 35, N, N] predictions (int32), spec-exact including the
    DC/H/V boundary filters for luma N<32.
    """
    vi = v.astype(xp.int32)
    batch = vi.shape[:-1]
    two_n = 2 * n

    if luma and n > 4:
        vf = filter_references(vi, n, bit_depth, strong_smoothing, xp=xp)
        fflags = mode_filter_flags(n)
    else:
        vf = vi
        fflags = np.zeros(35, dtype=bool)

    # named slices
    left = vi[..., two_n - 1::-1][..., :2 * n]        # left[0..2N-1]
    top = vi[..., two_n + 1:]                          # top[0..2N-1]
    corner = vi[..., two_n]

    # ---- angular modes (2..34): two-tap gathers off v (or filtered v) ----
    idx1, idx2, frac = angular_tables(n)
    if xp is not np:
        idx1, idx2, frac = xp.asarray(idx1), xp.asarray(idx2), xp.asarray(frac)
    use_filt = fflags[2:35]  # np bool (static)
    # select per-mode source vector: build [.., 33, 4N+1]
    sel = np.where(use_filt, 1, 0).astype(np.int32)  # static
    if xp is np:
        src = np.where(sel[:, None].astype(bool), vf[..., None, :], vi[..., None, :])
    else:
        sel_x = xp.asarray(sel).reshape((1,) * len(batch) + (33, 1))
        src = xp.where(sel_x.astype(bool), vf[..., None, :], vi[..., None, :])
    g1 = xp.take_along_axis(src, _bcast_idx(idx1, batch, n, xp), axis=-1)
    g2 = xp.take_along_axis(src, _bcast_idx(idx2, batch, n, xp), axis=-1)
    fr = frac.reshape((33, n, n))
    fr = fr.reshape((1,) * len(batch) + (33, n * n))
    if xp is not np:
        fr = xp.asarray(fr)
    ang = xp.right_shift((32 - fr) * g1 + fr * g2 + 16, 5)
    ang = ang.reshape(batch + (33, n, n))

    # ---- pure H (10) and V (26) boundary filters (luma, N<32) ----
    if luma and n < 32:
        # mode 26 (index 24 in ang): first column adjusted with left deltas
        v26 = ang[..., 24, :, :]
        col = xp.clip(top[..., :1] + xp.right_shift(left[..., :n] - corner[..., None], 1),
                      0, (1 << bit_depth) - 1)
        v26 = xp.concatenate([col[..., :, None], v26[..., :, 1:]], axis=-1)
        # mode 10 (index 8): first row adjusted with top deltas
        v10 = ang[..., 8, :, :]
        row = xp.clip(left[..., :1] + xp.right_shift(top[..., :n] - corner[..., None], 1),
                      0, (1 << bit_depth) - 1)
        v10 = xp.concatenate([row[..., None, :], v10[..., 1:, :]], axis=-2)
        ang = xp.concatenate([ang[..., :8, :, :], v10[..., None, :, :],
                              ang[..., 9:24, :, :], v26[..., None, :, :],
                              ang[..., 25:, :, :]], axis=-3)

    # ---- planar (mode 0), spec 8.4.4.2.4; uses filtered refs when flagged --
    pv = vf if fflags[PLANAR_IDX] else vi
    p_left = pv[..., two_n - 1::-1][..., :n]
    p_top = pv[..., two_n + 1:two_n + 1 + n]
    p_tr = pv[..., two_n + 1 + n]          # top[N]
    p_bl = pv[..., two_n - 1 - n]          # left[N] -> v[2N-1-N]
    xs = np.arange(n, dtype=np.int32)
    ys = np.arange(n, dtype=np.int32)
    X = xs[None, :] * np.ones((n, 1), np.int32)
    Y = ys[:, None] * np.ones((1, n), np.int32)
    if xp is not np:
        X, Y = xp.asarray(X), xp.asarray(Y)
    log2n = int(np.log2(n))
    planar = xp.right_shift(
        (n - 1 - X) * p_left[..., :, None]      # left[y] weighted across x
        + (X + 1) * p_tr[..., None, None]
        + (n - 1 - Y) * p_top[..., None, :]
        + (Y + 1) * p_bl[..., None, None]
        + n, log2n + 1)

    # ---- DC (mode 1), spec 8.4.4.2.5 ----
    dc = xp.right_shift(xp.sum(left[..., :n], axis=-1) + xp.sum(top[..., :n], axis=-1) + n,
                        log2n + 1)
    dc_blk = dc[..., None, None] * xp.ones((1,) * len(batch) + (n, n), dtype=xp.int32)
    if luma and n < 32:
        row0 = xp.right_shift(top[..., :n] + 3 * dc[..., None] + 2, 2)
        col0 = xp.right_shift(left[..., :n] + 3 * dc[..., None] + 2, 2)
        c00 = xp.right_shift(left[..., 0] + 2 * dc + top[..., 0] + 2, 2)
        dc_blk = xp.concatenate([row0[..., None, :], dc_blk[..., 1:, :]], axis=-2)
        col0 = xp.concatenate([c00[..., None], col0[..., 1:]], axis=-1)
        dc_blk = xp.concatenate([col0[..., :, None], dc_blk[..., :, 1:]], axis=-1)

    out = xp.concatenate([planar[..., None, :, :], dc_blk[..., None, :, :], ang], axis=-3)
    return out


def _bcast_idx(idx: np.ndarray, batch: tuple, n: int, xp):
    """Reshape static [33,n,n] index table to broadcast over batch dims for
    take_along_axis: -> [*1s, 33, n*n]."""
    flat = idx.reshape(33, n * n)
    flat = flat.reshape((1,) * len(batch) + (33, n * n))
    if xp is not np:
        flat = xp.asarray(flat)
        flat = xp.broadcast_to(flat, batch + (33, n * n))
    else:
        flat = np.broadcast_to(flat, batch + (33, n * n))
    return flat


def predict_one_mode(v, mode: int, n: int, bit_depth: int = 8, luma: bool = True,
                     strong_smoothing: bool = False, xp=np):
    """Single-mode convenience wrapper (uses the all-modes path)."""
    allm = predict_all_modes(v, n, bit_depth, luma, strong_smoothing, xp=xp)
    return allm[..., mode, :, :]


# ---------------------------------------------------------------------------
# Matmul ("allangs") formulation: all 35 modes as ONE weight matrix applied to
# the concatenated [unfiltered | filtered] reference vector — MXU-friendly,
# bit-exact with the gather path (verified by tests). Planar/DC/angular are
# all linear in the references; weights are pre-scaled to a common shift so a
# single rounding shift finishes the prediction. DC/H/V boundary fixups are
# applied as masked elementwise ops afterwards.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def allangs_matrix(n: int, luma: bool) -> Tuple[np.ndarray, int]:
    """Weight matrix [35*n*n, 2*(4n+1)] (float32) and the common shift T.
    Row layout: mode-major, raster within mode. Column layout:
    [0 .. 4n] unfiltered v, [4n+1 .. 8n+1] filtered v."""
    L = 4 * n + 1
    log2n = n.bit_length() - 1
    T = max(5, log2n + 1)
    W = np.zeros((35, n * n, 2 * L), dtype=np.float64)
    fflags = mode_filter_flags(n) if (luma and n > 4) else np.zeros(35, bool)

    two_n = 2 * n
    def vcol(k, filt):
        return k + (L if filt else 0)

    # planar (mode 0): shift log2n+1, scale by 2^(T-(log2n+1))
    sc = 1 << (T - (log2n + 1))
    f = bool(fflags[PLANAR_IDX])
    for y in range(n):
        for x in range(n):
            r = 0 * n * n + y * n + x
            W[0, y * n + x, vcol(two_n - 1 - y, f)] += (n - 1 - x) * sc   # left[y]
            W[0, y * n + x, vcol(two_n + 1 + n, f)] += (x + 1) * sc      # top[n]
            W[0, y * n + x, vcol(two_n + 1 + x, f)] += (n - 1 - y) * sc  # top[x]
            W[0, y * n + x, vcol(two_n - 1 - n, f)] += (y + 1) * sc      # left[n]
    # DC (mode 1): average of left[0..n-1], top[0..n-1]; shift log2n+1
    for k in range(n):
        for p in range(n * n):
            W[1, p, vcol(two_n - 1 - k, False)] += sc    # left[k]
            W[1, p, vcol(two_n + 1 + k, False)] += sc    # top[k]
    # angular
    idx1, idx2, frac = angular_tables(n)
    asc = 1 << (T - 5)
    for mi in range(33):
        mode = mi + 2
        f = bool(fflags[mode])
        for y in range(n):
            for x in range(n):
                p = y * n + x
                fr = int(frac[mi, y, x])
                W[mode, p, vcol(int(idx1[mi, y, x]), f)] += (32 - fr) * asc
                if fr:
                    W[mode, p, vcol(int(idx2[mi, y, x]), f)] += fr * asc
    return W.reshape(35 * n * n, 2 * L).astype(np.float32), T


def predict_all_modes_matmul(v, n: int, bit_depth: int = 8, luma: bool = True,
                             strong_smoothing: bool = False,
                             chroma444: bool = False, xp=np):
    """MXU formulation of predict_all_modes; bit-exact with the gather path.
    v: [B, 4n+1] substituted references. Returns [B, 35, n, n] int32.
    chroma444: 4:4:4 chroma uses luma-style reference filtering
    (spec 8.4.4.2.3 applies when cIdx==0 or ChromaArrayType==3) but NOT
    the DC/V/H edge fixups (cIdx==0 only)."""
    W, T = allangs_matrix(n, luma or chroma444)
    vi = v.astype(xp.int32)
    B = vi.shape[0]
    two_n = 2 * n
    if (luma or chroma444) and n > 4:
        vf = filter_references(vi, n, bit_depth, strong_smoothing, xp=xp)
    else:
        vf = vi
    vcat = xp.concatenate([vi, vf], axis=-1).astype(xp.float32)  # [B, 2L]
    if xp is not np:
        import jax
        Wx = xp.asarray(W)
        # HIGHEST precision: exact f32 accumulate (all values < 2^24);
        # TPU default bf16 multiplies would break bit-exactness
        acc = xp.matmul(vcat, Wx.T, precision=jax.lax.Precision.HIGHEST)
    else:
        Wx = W
        acc = vcat @ Wx.T
    acc = acc.astype(xp.int32)
    pred = xp.right_shift(acc + (1 << (T - 1)), T).reshape(B, 35, n, n)

    # --- boundary fixups (masked elementwise) ---
    left = vi[..., two_n - 1::-1][..., :n]
    top = vi[..., two_n + 1:two_n + 1 + n]
    corner = vi[..., two_n]
    maxv = (1 << bit_depth) - 1
    modes = xp.asarray(np.arange(35).reshape(1, 35, 1, 1)) if xp is not np \
        else np.arange(35).reshape(1, 35, 1, 1)
    row0 = (xp.asarray(np.arange(n).reshape(1, 1, n, 1)) if xp is not np
            else np.arange(n).reshape(1, 1, n, 1)) == 0       # y == 0 mask
    col0 = (xp.asarray(np.arange(n).reshape(1, 1, 1, n)) if xp is not np
            else np.arange(n).reshape(1, 1, 1, n)) == 0       # x == 0 mask

    if luma and n < 32:
        # DC (mode 1) edge filtering
        dc = xp.right_shift(xp.sum(left, axis=-1) + xp.sum(top, axis=-1) + n,
                            (n.bit_length() - 1) + 1)
        dcr = xp.right_shift(top + 3 * dc[..., None] + 2, 2)       # [B, n]
        dcc = xp.right_shift(left + 3 * dc[..., None] + 2, 2)
        dc00 = xp.right_shift(left[..., 0] + 2 * dc + top[..., 0] + 2, 2)
        fix = pred
        m_dc = (modes == DC_IDX)
        fix = xp.where(m_dc & row0, dcr[:, None, None, :], fix)
        fix = xp.where(m_dc & col0, dcc[:, None, :, None], fix)
        fix = xp.where(m_dc & row0 & col0, dc00[:, None, None, None], fix)
        # mode 26 (V): first column adjusted
        v26c = xp.clip(top[..., :1] + xp.right_shift(left - corner[..., None], 1),
                       0, maxv)                                    # [B, n]
        fix = xp.where((modes == VER_IDX) & col0, v26c[:, None, :, None], fix)
        # mode 10 (H): first row adjusted
        v10r = xp.clip(left[..., :1] + xp.right_shift(top - corner[..., None], 1),
                       0, maxv)
        fix = xp.where((modes == HOR_IDX) & row0, v10r[:, None, None, :], fix)
        pred = fix
    return pred


def predict_mode_matmul(v, modes, n: int, bit_depth: int = 8,
                        luma: bool = True, strong_smoothing: bool = False,
                        chroma444: bool = False, xp=np):
    """Single-mode variant of predict_all_modes_matmul. v: [B, 4n+1];
    modes: [B] int32. Bit-exact with the all-modes path.

    Device (jnp) formulation: ONE dense [B, 2L] x [2L, 35*n*n] MXU matmul
    followed by take_along_axis on the mode axis. MXU FLOPs are cheap on
    TPU; the per-sample gathered-weights alternative (take(Wm, modes) ->
    [B, n*n, 2L] then a batched matvec) moves 7-60x more bytes through HBM
    and runs on gathers instead of the systolic array — it profiled as the
    dominant cost of the 1080p commit scan (round-3 finding). numpy keeps
    the gathered form (no MXU to feed, memory is cheaper than FLOPs)."""
    W, T = allangs_matrix(n, luma or chroma444)
    vi = v.astype(xp.int32)
    B = vi.shape[0]
    two_n = 2 * n
    if xp is not np:
        allp = predict_all_modes_matmul(v, n, bit_depth, luma=luma,
                                        strong_smoothing=strong_smoothing,
                                        chroma444=chroma444, xp=xp)
        return xp.take_along_axis(
            allp, modes.astype(xp.int32)[:, None, None, None], axis=1)[:, 0]
    if (luma or chroma444) and n > 4:
        vf = filter_references(vi, n, bit_depth, strong_smoothing, xp=xp)
    else:
        vf = vi
    vcat = xp.concatenate([vi, vf], axis=-1).astype(xp.float32)   # [B, 2L]
    Wm = W.reshape(35, n * n, -1)
    Wsel = Wm[np.asarray(modes)]
    acc = np.einsum("bl,bpl->bp", vcat, Wsel)
    acc = acc.astype(xp.int32)
    pred = xp.right_shift(acc + (1 << (T - 1)), T).reshape(B, n, n)

    # boundary fixups for the rows/cols of DC / V / H predictions
    left = vi[..., two_n - 1::-1][..., :n]
    top = vi[..., two_n + 1:two_n + 1 + n]
    corner = vi[..., two_n]
    maxv = (1 << bit_depth) - 1
    m = modes.reshape(B, 1, 1)
    row0 = (np.arange(n).reshape(1, n, 1) == 0)
    col0 = (np.arange(n).reshape(1, 1, n) == 0)
    if xp is not np:
        row0, col0 = xp.asarray(row0), xp.asarray(col0)
    if luma and n < 32:
        dc = xp.right_shift(xp.sum(left, axis=-1) + xp.sum(top, axis=-1) + n,
                            (n.bit_length() - 1) + 1)
        dcr = xp.right_shift(top + 3 * dc[..., None] + 2, 2)
        dcc = xp.right_shift(left + 3 * dc[..., None] + 2, 2)
        dc00 = xp.right_shift(left[..., 0] + 2 * dc + top[..., 0] + 2, 2)
        m_dc = (m == DC_IDX)
        pred = xp.where(m_dc & row0, dcr[:, None, :], pred)
        pred = xp.where(m_dc & col0, dcc[:, :, None], pred)
        pred = xp.where(m_dc & row0 & col0, dc00[:, None, None], pred)
        v26c = xp.clip(top[..., :1] + xp.right_shift(left - corner[..., None],
                                                     1), 0, maxv)
        pred = xp.where((m == VER_IDX) & col0, v26c[:, :, None], pred)
        v10r = xp.clip(left[..., :1] + xp.right_shift(top - corner[..., None],
                                                      1), 0, maxv)
        pred = xp.where((m == HOR_IDX) & row0, v10r[:, None, :], pred)
    return pred
