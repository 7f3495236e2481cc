"""Scalar, spec-literal HEVC intra prediction (ITU-T H.265 sec 8.4.4.2).

Written directly from the standard's pseudo-code as an independent check of
x265_yuuki_asuna_tpu.ops.intra (which is a batched re-formulation). Uses the
spec's p[x][y] coordinate convention: x = column, y = row, p[-1][*] = left
column, p[*][-1] = top row.
"""

import numpy as np

ANGLE_TABLE = {2: 32, 3: 26, 4: 21, 5: 17, 6: 13, 7: 9, 8: 5, 9: 2, 10: 0,
               11: -2, 12: -5, 13: -9, 14: -13, 15: -17, 16: -21, 17: -26,
               18: -32, 19: -26, 20: -21, 21: -17, 22: -13, 23: -9, 24: -5,
               25: -2, 26: 0, 27: 2, 28: 5, 29: 9, 30: 13, 31: 17, 32: 21,
               33: 26, 34: 32}
INV_ANGLE_TABLE = {11: -4096, 12: -1638, 13: -910, 14: -630, 15: -482,
                   16: -390, 17: -315, 18: -256, 19: -315, 20: -390, 21: -482,
                   22: -630, 23: -910, 24: -1638, 25: -4096}


class RefSamples:
    """Holds p[x][y] for x,y in [-1, 2N-1]."""

    def __init__(self, n):
        self.n = n
        self.left = np.zeros(2 * n, dtype=np.int64)   # p[-1][0..2N-1]
        self.top = np.zeros(2 * n, dtype=np.int64)    # p[0..2N-1][-1]
        self.corner = 0                                # p[-1][-1]

    def p(self, x, y):
        if x == -1 and y == -1:
            return self.corner
        if x == -1:
            return self.left[y]
        assert y == -1
        return self.top[x]


def substitute(left_vals, top_vals, corner_val, left_avail, top_avail,
               corner_avail, bit_depth=8):
    """Spec 8.4.4.2.2: scan p[-1][2N-1] .. p[-1][-1] .. p[2N-1][-1]."""
    n = len(left_vals) // 2
    r = RefSamples(n)
    seq = []     # (value, available) in scan order
    for y in range(2 * n - 1, -1, -1):
        seq.append([int(left_vals[y]), bool(left_avail[y])])
    seq.append([int(corner_val), bool(corner_avail)])
    for x in range(2 * n):
        seq.append([int(top_vals[x]), bool(top_avail[x])])
    if not any(s[1] for s in seq):
        fill = 1 << (bit_depth - 1)
        for s in seq:
            s[0] = fill
    else:
        # first available fills everything before it
        first = next(i for i, s in enumerate(seq) if s[1])
        for i in range(first):
            seq[i][0] = seq[first][0]
        # forward fill the rest
        for i in range(first + 1, len(seq)):
            if not seq[i][1]:
                seq[i][0] = seq[i - 1][0]
    for idx, y in enumerate(range(2 * n - 1, -1, -1)):
        r.left[y] = seq[idx][0]
    r.corner = seq[2 * n][0]
    for x in range(2 * n):
        r.top[x] = seq[2 * n + 1 + x][0]
    return r


def filter_refs(r: RefSamples, bit_depth=8, strong=False):
    """Spec 8.4.4.2.3 [1 2 1] filtering (and optional strong smoothing)."""
    n = r.n
    f = RefSamples(n)
    if strong and n == 32:
        th = 1 << (bit_depth - 5)
        flat_top = abs(r.corner + r.top[2 * n - 1] - 2 * r.top[n - 1]) < th
        flat_left = abs(r.corner + r.left[2 * n - 1] - 2 * r.left[n - 1]) < th
        if flat_top and flat_left:
            f.corner = r.corner
            for y in range(2 * n - 1):
                f.left[y] = ((63 - y) * r.corner + (y + 1) * r.left[2 * n - 1] + 32) >> 6
            f.left[2 * n - 1] = r.left[2 * n - 1]
            for x in range(2 * n - 1):
                f.top[x] = ((63 - x) * r.corner + (x + 1) * r.top[2 * n - 1] + 32) >> 6
            f.top[2 * n - 1] = r.top[2 * n - 1]
            return f
    f.corner = (r.left[0] + 2 * r.corner + r.top[0] + 2) >> 2
    for y in range(2 * n):
        below = r.left[y + 1] if y + 1 < 2 * n else r.left[2 * n - 1]
        above = r.left[y - 1] if y > 0 else r.corner
        f.left[y] = (below + 2 * r.left[y] + above + 2) >> 2 if y < 2 * n - 1 else r.left[y]
    for x in range(2 * n):
        right = r.top[x + 1] if x + 1 < 2 * n else r.top[2 * n - 1]
        lft = r.top[x - 1] if x > 0 else r.corner
        f.top[x] = (right + 2 * r.top[x] + lft + 2) >> 2 if x < 2 * n - 1 else r.top[x]
    return f


def use_filtered(mode, n, luma):
    if not luma or n == 4:
        return False
    if mode == 1:
        return False
    if mode == 0:
        return True
    thresh = {8: 7, 16: 1, 32: 0}[n]
    return min(abs(mode - 26), abs(mode - 10)) > thresh


def predict(r: RefSamples, mode, bit_depth=8, luma=True):
    """Predict one mode; r must already be the correctly-filtered variant.
    Returns pred[y][x] (row-major)."""
    n = r.n
    out = np.zeros((n, n), dtype=np.int64)
    maxv = (1 << bit_depth) - 1
    if mode == 0:  # planar 8.4.4.2.4
        for y in range(n):
            for x in range(n):
                out[y][x] = ((n - 1 - x) * r.p(-1, y) + (x + 1) * r.p(n, -1)
                             + (n - 1 - y) * r.p(x, -1) + (y + 1) * r.p(-1, n)
                             + n) >> (int(np.log2(n)) + 1)
        return out
    if mode == 1:  # DC 8.4.4.2.5
        dc = (sum(r.top[x] for x in range(n)) + sum(r.left[y] for y in range(n))
              + n) >> (int(np.log2(n)) + 1)
        out[:, :] = dc
        if luma and n < 32:
            out[0][0] = (r.p(-1, 0) + 2 * dc + r.p(0, -1) + 2) >> 2
            for x in range(1, n):
                out[0][x] = (r.p(x, -1) + 3 * dc + 2) >> 2
            for y in range(1, n):
                out[y][0] = (r.p(-1, y) + 3 * dc + 2) >> 2
        return out
    # angular 8.4.4.2.6
    a = ANGLE_TABLE[mode]
    if mode >= 18:
        ref = {}
        for x in range(0, 2 * n + 1):
            ref[x] = r.p(-1 + x, -1)
        if a < 0:
            inv = INV_ANGLE_TABLE[mode]
            if ((n * a) >> 5) < -1:
                for x in range(-1, ((n * a) >> 5) - 1, -1):
                    ref[x] = r.p(-1, -1 + ((x * inv + 128) >> 8))
        for y in range(n):
            i = ((y + 1) * a) >> 5
            f = ((y + 1) * a) & 31
            for x in range(n):
                if f:
                    out[y][x] = ((32 - f) * ref[x + i + 1] + f * ref[x + i + 2] + 16) >> 5
                else:
                    out[y][x] = ref[x + i + 1]
        if mode == 26 and luma and n < 32:
            for y in range(n):
                out[y][0] = np.clip(r.p(0, -1) + ((r.p(-1, y) - r.p(-1, -1)) >> 1), 0, maxv)
    else:
        ref = {}
        for x in range(0, 2 * n + 1):
            ref[x] = r.p(-1, -1 + x)
        if a < 0:
            inv = INV_ANGLE_TABLE[mode]
            if ((n * a) >> 5) < -1:
                for x in range(-1, ((n * a) >> 5) - 1, -1):
                    ref[x] = r.p(-1 + ((x * inv + 128) >> 8), -1)
        for x in range(n):
            i = ((x + 1) * a) >> 5
            f = ((x + 1) * a) & 31
            for y in range(n):
                if f:
                    out[y][x] = ((32 - f) * ref[y + i + 1] + f * ref[y + i + 2] + 16) >> 5
                else:
                    out[y][x] = ref[y + i + 1]
        if mode == 10 and luma and n < 32:
            for x in range(n):
                out[0][x] = np.clip(r.p(-1, 0) + ((r.p(x, -1) - r.p(-1, -1)) >> 1), 0, maxv)
    return out
