"""Motion-compensation interpolation (K6): 8-tap luma / 4-tap chroma,
batched over blocks with per-block fractional MVs.

Reference behavior (studied, not copied): /root/reference/source/common/
ipfilter.cpp. Filter taps are spec constants (H.265 tables 8-11/8-13).

Exactness: the unified two-stage path (horizontal pixel->short with
-IF_INTERNAL_OFFS bias, then vertical short->pixel with shift 12 for 8-bit)
produces results identical to the dedicated pure-horizontal/vertical/copy
paths for zero fractions, so a single code path serves all 16 (fx, fy)
combinations — TPU-friendly (no data-dependent branches).

Out-of-picture reference samples use index clamping == the decoder's
reference border extension.
"""

from __future__ import annotations

import numpy as np

LUMA_FILTERS = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1]], dtype=np.int32)

CHROMA_FILTERS = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2]], dtype=np.int32)

IF_INTERNAL_OFFS = 1 << 13   # 8192


def mc_block_batch(ref_plane, px, py, mv_int_x, mv_int_y, frac_x, frac_y,
                   n: int, luma: bool = True, bit_depth: int = 8, xp=np):
    """Motion-compensate a batch of n×n blocks.

    ref_plane: [H, W] int; px/py: [B] block top-left; mv_int_*: [B] integer
    offsets; frac_*: [B] fraction (0..3 luma, 0..7 chroma).
    Returns [B, n, n] predicted pixels (int32).
    """
    taps = 8 if luma else 4
    half = taps // 2 - 1          # 3 luma, 1 chroma
    filters = LUMA_FILTERS if luma else CHROMA_FILTERS
    if xp is not np:
        filters = xp.asarray(filters)
    H, W = ref_plane.shape
    B = px.shape[0]
    ext = n + taps - 1

    # gather extended window [B, ext, ext] with clamped indices
    rows = (py + mv_int_y)[:, None] + (xp.arange(ext) - half)[None, :]
    cols = (px + mv_int_x)[:, None] + (xp.arange(ext) - half)[None, :]
    rows = xp.clip(rows, 0, H - 1)
    cols = xp.clip(cols, 0, W - 1)
    flat = ref_plane.reshape(-1)
    win = xp.take(flat, rows[:, :, None] * W + cols[:, None, :], axis=0)
    win = win.astype(xp.int32)                      # [B, ext, ext]

    cfx = filters[frac_x]                           # [B, taps]
    cfy = filters[frac_y]

    headroom = 14 - bit_depth                       # IF_INTERNAL_PREC - bd
    shift1 = 6 - headroom                           # horiz ps shift
    offset1 = -IF_INTERNAL_OFFS * (1 << shift1) if shift1 >= 0 else None
    # horizontal: [B, ext, n]
    acc = xp.zeros((B, ext, n), xp.int32)
    for k in range(taps):
        acc = acc + cfx[:, k, None, None] * win[:, :, k:k + n]
    if shift1 >= 0:
        mid = xp.right_shift(acc + offset1, shift1) if shift1 else acc + offset1
    else:
        mid = xp.left_shift(acc, -shift1) - (IF_INTERNAL_OFFS)
    # vertical: [B, n, n]
    acc2 = xp.zeros((B, n, n), xp.int32)
    for k in range(taps):
        acc2 = acc2 + cfy[:, k, None, None] * mid[:, k:k + n, :]
    shift2 = 6 + headroom
    offset2 = (1 << (shift2 - 1)) + (IF_INTERNAL_OFFS << 6)
    out = xp.right_shift(acc2 + offset2, shift2)
    return xp.clip(out, 0, (1 << bit_depth) - 1)


def gather_luma_window(ref_plane, px, py, mv_int_x, mv_int_y, n: int, xp=np):
    """Gather one [B, n+8, n+8] reference window per block, centered so that
    win[:, 4, 4] is the sample at the integer MV. One gather serves every
    qpel offset in [-3, 3]^2 — subpel refinement then runs on local slices
    instead of re-gathering the full plane per candidate (the compile-time
    and HBM hot spot of the old per-eval path)."""
    H, W = ref_plane.shape
    ext = n + 8
    rows = (py + mv_int_y)[:, None] + (xp.arange(ext) - 4)[None, :]
    cols = (px + mv_int_x)[:, None] + (xp.arange(ext) - 4)[None, :]
    rows = xp.clip(rows, 0, H - 1)
    cols = xp.clip(cols, 0, W - 1)
    win = xp.take(ref_plane.reshape(-1),
                  rows[:, :, None] * W + cols[:, None, :], axis=0)
    return win.astype(xp.int32)


def subpel_refine_win(win, src_blocks, n: int, bit_depth: int = 8, xp=np,
                      satd_fn=None):
    """Half- then quarter-pel SATD refinement on a pre-gathered window
    (gather_luma_window). Returns (dqx, dqy, best_satd) with dq* in
    [-3, 3] qpel relative to the window's integer center.

    Reference behavior: motion.cpp subpel iterations (2 rounds of 8
    neighbors, SATD-costed); here the half-pel round uses static offsets
    and the quarter-pel round per-block dynamic offsets, all on the same
    local window."""
    from . import pixel as _pixel
    if satd_fn is None:
        satd_fn = lambda a, b: _pixel.satd(a, b, xp=xp)
    filters = xp.asarray(LUMA_FILTERS) if xp is not np else LUMA_FILTERS
    B = win.shape[0]
    headroom = 14 - bit_depth
    shift1 = 6 - headroom
    shift2 = 6 + headroom
    offset2 = (1 << (shift2 - 1)) + (IF_INTERNAL_OFFS << 6)
    maxv = (1 << bit_depth) - 1
    src = src_blocks.astype(xp.int32)

    def filt(sub, cfx, cfy):
        # sub: [K, n+7, n+7] local windows; cf*: [K, 8] per-row taps
        K = sub.shape[0]
        acc = xp.zeros((K, n + 7, n), xp.int32)
        for k in range(8):
            acc = acc + cfx[:, k, None, None] * sub[:, :, k:k + n]
        if shift1 >= 0:
            mid = xp.right_shift(acc - (IF_INTERNAL_OFFS << shift1), shift1) \
                if shift1 else acc - IF_INTERNAL_OFFS
        else:
            mid = xp.left_shift(acc, -shift1) - IF_INTERNAL_OFFS
        acc2 = xp.zeros((K, n, n), xp.int32)
        for k in range(8):
            acc2 = acc2 + cfy[:, k, None, None] * mid[:, k:k + n, :]
        out = xp.right_shift(acc2 + offset2, shift2)
        return xp.clip(out, 0, maxv)

    NBR = ((-1, 0), (1, 0), (0, -1), (0, 1),
           (-1, -1), (1, -1), (-1, 1), (1, 1))

    # ---- half-pel round: ALL 9 candidates (center first) in ONE batched
    # filt + SATD — 17 separate eval chains measured ~0.2 ms/op of issue
    # overhead each on the tunnel backend; batching turns ~340 ops into
    # ~40. Tie-break identical to the sequential form: candidates are
    # stacked in the original evaluation order and argmin takes the first
    # minimum (center, then the 8 neighbors).
    cand_h = [(0, 0)] + [(2 * dx_, 2 * dy_) for dx_, dy_ in NBR]
    K = len(cand_h)
    subs = [win[:, (dy_ >> 2) + 1:(dy_ >> 2) + 1 + n + 7,
                (dx_ >> 2) + 1:(dx_ >> 2) + 1 + n + 7]
            for dx_, dy_ in cand_h]
    sub_b = xp.concatenate(subs, axis=0).astype(xp.int16)  # [K*B, n+7, n+7]
    cfx_b = xp.concatenate(
        [xp.broadcast_to(filters[dx_ & 3][None], (B, 8))
         for dx_, dy_ in cand_h], axis=0)
    cfy_b = xp.concatenate(
        [xp.broadcast_to(filters[dy_ & 3][None], (B, 8))
         for dx_, dy_ in cand_h], axis=0)
    src_b = xp.broadcast_to(src[None], (K, B, n, n)).reshape(K * B, n, n)
    c_h = satd_fn(src_b, filt(sub_b, cfx_b, cfy_b)).reshape(K, B)
    a_h = xp.argmin(c_h, axis=0)
    best = xp.take_along_axis(c_h, a_h[None], axis=0)[0]
    hx = xp.asarray(np.asarray([d[0] for d in cand_h], np.int32))
    hy = xp.asarray(np.asarray([d[1] for d in cand_h], np.int32))
    bx = xp.take(hx, a_h)
    by = xp.take(hy, a_h)

    # ---- quarter-pel round: 8 dynamic candidates in ONE batched eval;
    # incumbent stacked first so ties keep the half-pel winner.
    dxq = xp.concatenate([bx + dd for dd, _ in NBR])     # [8*B]
    dyq = xp.concatenate([by + dd for _, dd in NBR])
    winq = xp.concatenate([win.astype(xp.int16)] * len(NBR), axis=0)
    oyq = xp.right_shift(dyq, 2)
    oxq = xp.right_shift(dxq, 2)
    # quarter-pel integer offsets are only ever -1 or 0 (half-pel winner
    # in [-2,2] +/- 1 quarter): the window extraction is a 4-way SELECT of
    # static slices, not a gather — per-element gathers at [8B, n+7, n+7]
    # were the single largest gather family in the device profile
    oy_m = (oyq < 0)[:, None, None]
    ox_m = (oxq < 0)[:, None, None]
    w00 = winq[:, 0:n + 7, 0:n + 7]      # oy=-1, ox=-1
    w01 = winq[:, 0:n + 7, 1:n + 8]      # oy=-1, ox=0
    w10 = winq[:, 1:n + 8, 0:n + 7]      # oy=0,  ox=-1
    w11 = winq[:, 1:n + 8, 1:n + 8]      # oy=0,  ox=0
    sub_q = xp.where(oy_m, xp.where(ox_m, w00, w01),
                     xp.where(ox_m, w10, w11))
    src_q = xp.broadcast_to(src[None], (len(NBR), B, n, n)
                            ).reshape(len(NBR) * B, n, n)
    c_q = satd_fn(src_q, filt(sub_q, filters[dxq & 3], filters[dyq & 3])
                  ).reshape(len(NBR), B)
    c_all = xp.concatenate([best[None], c_q], axis=0)    # incumbent first
    dx_all = xp.concatenate([bx[None], dxq.reshape(len(NBR), B)], axis=0)
    dy_all = xp.concatenate([by[None], dyq.reshape(len(NBR), B)], axis=0)
    a_q = xp.argmin(c_all, axis=0)
    nbx = xp.take_along_axis(dx_all, a_q[None], axis=0)[0]
    nby = xp.take_along_axis(dy_all, a_q[None], axis=0)[0]
    cand_best = xp.take_along_axis(c_all, a_q[None], axis=0)[0]
    return nbx, nby, cand_best


def mc_luma_qpel(ref_plane, px, py, mv_qpel_x, mv_qpel_y, n: int,
                 bit_depth: int = 8, xp=np):
    """Luma MC with quarter-pel MVs [B]."""
    return mc_block_batch(ref_plane, px, py,
                          xp.right_shift(mv_qpel_x, 2),
                          xp.right_shift(mv_qpel_y, 2),
                          mv_qpel_x & 3, mv_qpel_y & 3,
                          n, True, bit_depth, xp)


def mc_chroma_qpel(ref_plane, px_c, py_c, mv_qpel_x, mv_qpel_y, n: int,
                   bit_depth: int = 8, xp=np):
    """Chroma MC for 4:2:0: luma quarter-pel MV = chroma eighth-pel.
    px_c/py_c are chroma-plane coordinates."""
    return mc_block_batch(ref_plane, px_c, py_c,
                          xp.right_shift(mv_qpel_x, 3),
                          xp.right_shift(mv_qpel_y, 3),
                          mv_qpel_x & 7, mv_qpel_y & 7,
                          n, False, bit_depth, xp)


def mc_block_batch_ps(ref_plane, px, py, mv_int_x, mv_int_y, frac_x, frac_y,
                      n: int, luma: bool = True, bit_depth: int = 8, xp=np):
    """MC to the 14-bit "short" intermediate domain (for bi-prediction):
    horizontal pixel->short stage then vertical short->short (shift 6, no
    rounding/clipping) — reference interp_*_ps + interp_*_ss semantics."""
    taps = 8 if luma else 4
    half = taps // 2 - 1
    filters = LUMA_FILTERS if luma else CHROMA_FILTERS
    if xp is not np:
        filters = xp.asarray(filters)
    H, W = ref_plane.shape
    B = px.shape[0]
    ext = n + taps - 1
    rows = (py + mv_int_y)[:, None] + (xp.arange(ext) - half)[None, :]
    cols = (px + mv_int_x)[:, None] + (xp.arange(ext) - half)[None, :]
    rows = xp.clip(rows, 0, H - 1)
    cols = xp.clip(cols, 0, W - 1)
    win = xp.take(ref_plane.reshape(-1),
                  rows[:, :, None] * W + cols[:, None, :], axis=0).astype(xp.int32)
    cfx = filters[frac_x]
    cfy = filters[frac_y]
    headroom = 14 - bit_depth
    shift1 = 6 - headroom
    acc = xp.zeros((B, ext, n), xp.int32)
    for k in range(taps):
        acc = acc + cfx[:, k, None, None] * win[:, :, k:k + n]
    if shift1 >= 0:
        mid = xp.right_shift(acc - (IF_INTERNAL_OFFS << shift1), shift1)
    else:
        mid = xp.left_shift(acc, -shift1) - IF_INTERNAL_OFFS
    acc2 = xp.zeros((B, n, n), xp.int32)
    for k in range(taps):
        acc2 = acc2 + cfy[:, k, None, None] * mid[:, k:k + n, :]
    return xp.right_shift(acc2, 6)      # ss-domain output (no offset/clip)


def add_avg(ps0, ps1, bit_depth: int = 8, xp=np):
    """Default bi-prediction combine (reference addAvg): clip-rounded mean of
    two short-domain predictions."""
    shift = 15 - bit_depth
    offset = (1 << (shift - 1)) + 2 * IF_INTERNAL_OFFS
    return xp.clip(xp.right_shift(ps0 + ps1 + offset, shift), 0,
                   (1 << bit_depth) - 1)


def mc_luma_qpel_ps(ref_plane, px, py, mvq_x, mvq_y, n, bit_depth=8, xp=np):
    return mc_block_batch_ps(ref_plane, px, py, xp.right_shift(mvq_x, 2),
                             xp.right_shift(mvq_y, 2), mvq_x & 3, mvq_y & 3,
                             n, True, bit_depth, xp)


def mc_chroma_qpel_ps(ref_plane, px_c, py_c, mvq_x, mvq_y, n, bit_depth=8, xp=np):
    return mc_block_batch_ps(ref_plane, px_c, py_c, xp.right_shift(mvq_x, 3),
                             xp.right_shift(mvq_y, 3), mvq_x & 7, mvq_y & 7,
                             n, False, bit_depth, xp)


def weight_uni(ps, w, o, denom: int, bit_depth: int = 8, xp=np):
    """Explicit weighted uni-prediction combine (spec 8.5.3.3.4.3; reference
    weight_pp adds back the internal offset): ps is the biased short-domain
    prediction, w/o the signaled weight/offset, denom the log2 denominator.
    log2WD = denom + (14 - bit_depth); offset is scaled by 2^(bd-8)."""
    shift1 = 14 - bit_depth
    log2wd = denom + shift1
    rnd = 1 << (log2wd - 1)
    return xp.clip(
        xp.right_shift((ps + IF_INTERNAL_OFFS) * w + rnd, log2wd)
        + (o << (bit_depth - 8)),
        0, (1 << bit_depth) - 1)
