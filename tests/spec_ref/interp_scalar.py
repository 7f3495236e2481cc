"""Scalar spec-literal HEVC fractional interpolation (H.265 8.5.4.2.2) for
cross-checking the batched implementation."""

import numpy as np

LUMA = [[0, 0, 0, 64, 0, 0, 0, 0],
        [-1, 4, -10, 58, 17, -5, 1, 0],
        [-1, 4, -11, 40, 40, -11, 4, -1],
        [0, 1, -5, 17, 58, -10, 4, -1]]
CHROMA = [[0, 64, 0, 0], [-2, 58, 10, -2], [-4, 54, 16, -2], [-6, 46, 28, -4],
          [-4, 36, 36, -4], [-4, 28, 46, -6], [-2, 16, 54, -4], [-2, 10, 58, -2]]


def _sample(plane, y, x):
    h, w = plane.shape
    return int(plane[min(max(y, 0), h - 1), min(max(x, 0), w - 1)])


def mc_scalar(plane, px, py, mvx_i, mvy_i, fx, fy, n, luma=True, bd=8):
    taps = 8 if luma else 4
    half = taps // 2 - 1
    filt = LUMA if luma else CHROMA
    cfx, cfy = filt[fx], filt[fy]
    offs = 1 << 13
    headroom = 14 - bd
    maxv = (1 << bd) - 1
    out = np.zeros((n, n), np.int64)
    # horizontal pass into "short" domain over extended rows
    mid = np.zeros((n + taps - 1, n), np.int64)
    for ry in range(n + taps - 1):
        sy = py + mvy_i + ry - half
        for rx in range(n):
            s = 0
            for k in range(taps):
                s += cfx[k] * _sample(plane, sy, px + mvx_i + rx + k - half)
            shift1 = 6 - headroom
            if shift1 >= 0:
                mid[ry, rx] = (s - (offs << shift1)) >> shift1
            else:
                mid[ry, rx] = (s << -shift1) - offs
    # vertical pass
    shift2 = 6 + headroom
    off2 = (1 << (shift2 - 1)) + (offs << 6)
    for ry in range(n):
        for rx in range(n):
            s = 0
            for k in range(taps):
                s += cfy[k] * mid[ry + k, rx]
            out[ry, rx] = min(max((s + off2) >> shift2, 0), maxv)
    return out
