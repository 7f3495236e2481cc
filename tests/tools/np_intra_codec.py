"""Numpy-only intra encoder/decoder used for conformance fuzzing against
FFmpeg (no JAX involved — fast path for bitstream debugging).

Encodes a uniform-CU-grid intra frame exactly like models/intra_encoder but
scalar/numpy, reusing the same ops; useful to fuzz syntax bit-exactness.
"""

import numpy as np

from x265_yuuki_asuna_tpu.ops import intra, pixel, quant, transforms
from x265_yuuki_asuna_tpu.models.intra_encoder import chroma_qp_from_luma


def build_v(plane, py, px, n, avail_l, avail_t, avail_tr, avail_tl, bd=8):
    H, W = plane.shape
    v_raw = np.zeros(4 * n + 1, np.int32)
    av = np.zeros(4 * n + 1, bool)
    for k in range(2 * n):         # v[0..2n-1] = left[2n-1-k]
        yy = py + (2 * n - 1 - k)
        if px - 1 >= 0 and yy < H:
            v_raw[k] = plane[yy, px - 1]
    av[n:2 * n] = avail_l
    v_raw[2 * n] = plane[py - 1, px - 1] if (py > 0 and px > 0) else 0
    av[2 * n] = avail_tl
    for k in range(2 * n):
        xx = px + k
        if py - 1 >= 0 and xx < W:
            v_raw[2 * n + 1 + k] = plane[py - 1, xx]
    av[2 * n + 1:3 * n + 1] = avail_t
    av[3 * n + 1:] = avail_tr
    return v_raw, av


def encode_frame_np(y, u, v, cu, qp, bd=8, mode_override=None):
    """Returns (modes, levels_y/cb/cr [rows, cols, ...], recon planes)."""
    H, W = y.shape
    rows, cols = H // cu, W // cu
    log2n = cu.bit_length() - 1
    qp_c = chroma_qp_from_luma(qp)
    maxv = (1 << bd) - 1
    ry = np.zeros_like(y, np.int32)
    ru = np.zeros_like(u, np.int32)
    rv = np.zeros_like(v, np.int32)
    modes = np.zeros((rows, cols), np.int32)
    nc = cu // 2
    lv_y = np.zeros((rows, cols, cu, cu), np.int32)
    lv_cb = np.zeros((rows, cols, nc, nc), np.int32)
    lv_cr = np.zeros((rows, cols, nc, nc), np.int32)

    def process(plane_src, plane_rec, py, px, n, log2nn, qpp, luma, mode, avail):
        v_raw, av = build_v(plane_rec, py, px, n, *avail, bd)
        vv = intra.substitute_references(v_raw[None], av[None], bd)[0]
        preds = intra.predict_all_modes(vv[None], n, bd, luma=luma)[0]
        src = plane_src[py:py + n, px:px + n].astype(np.int32)
        if mode is None:
            costs = pixel.satd(src[None], preds)
            mode = int(np.argmin(costs))
        pred = preds[mode]
        coef = transforms.forward_transform((src - pred)[None], bd)[0]
        levels, _ = quant.quant(coef[None], qpp, log2nn, bd, True)
        dq = quant.dequant(levels, qpp, log2nn, bd)
        rr = transforms.inverse_transform(dq, bd)[0]
        recon = np.clip(pred + rr, 0, maxv)
        plane_rec[py:py + n, px:px + n] = recon
        return mode, levels[0]

    for r in range(rows):
        for c in range(cols):
            avail = (c > 0, r > 0, r > 0 and c < cols - 1, r > 0 and c > 0)
            ov = None if mode_override is None else mode_override[r][c]
            m, lv = process(y, ry, r * cu, c * cu, cu, log2n, qp, True, ov, avail)
            modes[r, c] = m
            lv_y[r, c] = lv
            _, lcb = process(u, ru, r * nc, c * nc, nc, log2n - 1, qp_c, False, m, avail)
            _, lcr = process(v, rv, r * nc, c * nc, nc, log2n - 1, qp_c, False, m, avail)
            lv_cb[r, c] = lcb
            lv_cr[r, c] = lcr
    return modes, lv_y, lv_cb, lv_cr, ry, ru, rv
