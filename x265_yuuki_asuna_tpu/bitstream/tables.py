"""CABAC spec constant tables and scan orders (ITU-T H.265).

All numeric tables here are constants defined by the HEVC standard:
  - LPS_TABLE:      Table 9-46 (rangeTabLps)
  - TRANS_IDX_LPS:  Table 9-47 (transIdxLps); MPS transition is min(s+1, 62)
  - context init values: Tables 9-5..9-32 (per-syntax initValue by init type)
Scan orders are generated from the spec's 6.5.3 diagonal up-right scan.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

LPS_TABLE = np.array([
    (128, 176, 208, 240), (128, 167, 197, 227), (128, 158, 187, 216), (123, 150, 178, 205),
    (116, 142, 169, 195), (111, 135, 160, 185), (105, 128, 152, 175), (100, 122, 144, 166),
    (95, 116, 137, 158), (90, 110, 130, 150), (85, 104, 123, 142), (81, 99, 117, 135),
    (77, 94, 111, 128), (73, 89, 105, 122), (69, 85, 100, 116), (66, 80, 95, 110),
    (62, 76, 90, 104), (59, 72, 86, 99), (56, 69, 81, 94), (53, 65, 77, 89),
    (51, 62, 73, 85), (48, 59, 69, 80), (46, 56, 66, 76), (43, 53, 63, 72),
    (41, 50, 59, 69), (39, 48, 56, 65), (37, 45, 54, 62), (35, 43, 51, 59),
    (33, 41, 48, 56), (32, 39, 46, 53), (30, 37, 43, 50), (29, 35, 41, 48),
    (27, 33, 39, 45), (26, 31, 37, 43), (24, 30, 35, 41), (23, 28, 33, 39),
    (22, 27, 32, 37), (21, 26, 30, 35), (20, 24, 29, 33), (19, 23, 27, 31),
    (18, 22, 26, 30), (17, 21, 25, 28), (16, 20, 23, 27), (15, 19, 22, 25),
    (14, 18, 21, 24), (14, 17, 20, 23), (13, 16, 19, 22), (12, 15, 18, 21),
    (12, 14, 17, 20), (11, 14, 16, 19), (11, 13, 15, 18), (10, 12, 15, 17),
    (10, 12, 14, 16), (9, 11, 13, 15), (9, 11, 12, 14), (8, 10, 12, 14),
    (8, 9, 11, 13), (7, 9, 11, 12), (7, 9, 10, 12), (7, 8, 10, 11),
    (6, 8, 9, 11), (6, 7, 9, 10), (6, 7, 8, 9), (2, 2, 2, 2),
], dtype=np.int32)

TRANS_IDX_LPS = np.array([
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63,
], dtype=np.int32)

TRANS_IDX_MPS = np.minimum(np.arange(64) + 1, 62).astype(np.int32)
TRANS_IDX_MPS[63] = 63   # terminal state self-loops (never reached by ctx coding)


def init_context(init_value: int, qp: int) -> int:
    """Spec 9.3.2.2: initValue + sliceQp -> packed state ((pStateIdx<<1)|MPS)."""
    slope = (init_value >> 4) * 5 - 45
    offset = ((init_value & 15) << 3) - 16
    pre = min(max(1, ((slope * min(max(0, qp), 51)) >> 4) + offset), 126)
    if pre <= 63:
        return ((63 - pre) << 1) | 0
    return ((pre - 64) << 1) | 1


# ---------------------------------------------------------------------------
# Context layout (ours; self-consistent between encoder, estimator, decoder).
# Init rows ordered [B, P, I] like the spec's initType 0/1/2 grouping.
# ---------------------------------------------------------------------------

CNU = 154

_CTX_DEFS = [
    # (name, count, [B init], [P init], [I init])   — spec tables 9-5..9-32
    ("split_cu",        3, [107, 139, 126], [107, 139, 126], [139, 141, 157]),
    ("skip",            3, [197, 185, 201], [197, 185, 201], [CNU, CNU, CNU]),
    ("merge_flag",      1, [154], [110], [CNU]),
    ("merge_idx",       1, [137], [122], [CNU]),
    ("part_size",       4, [154, 139, 154, 154], [154, 139, 154, 154], [184, CNU, CNU, CNU]),
    ("pred_mode",       1, [134], [149], [CNU]),
    ("intra_luma",      1, [183], [154], [184]),
    ("intra_chroma",    2, [152, 139], [152, 139], [63, 139]),
    ("delta_qp",        3, [154]*3, [154]*3, [154]*3),
    ("inter_dir",       5, [95, 79, 63, 31, 31], [95, 79, 63, 31, 31], [CNU]*5),
    ("ref_idx",         2, [153, 153], [153, 153], [CNU, CNU]),
    ("mvd",             2, [169, 198], [140, 198], [CNU, CNU]),
    ("qt_cbf",          7, [153, 111, 149, 92, 167, 154, 154],
                           [153, 111, 149, 107, 167, 154, 154],
                           [111, 141, 94, 138, 182, 154, 154]),
    ("trans_subdiv",    3, [224, 167, 122], [124, 138, 94], [153, 138, 138]),
    ("qt_root_cbf",     1, [79], [79], [CNU]),
    ("sig_cg",          4, [121, 140, 61, 154], [121, 140, 61, 154], [91, 171, 134, 141]),
    ("sig",            42,
     [170, 154, 139, 153, 139, 123, 123, 63, 124, 166, 183, 140, 136, 153, 154,
      166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 170, 153, 138,
      138, 122, 121, 122, 121, 167, 151, 183, 140, 151, 183, 140],
     [155, 154, 139, 153, 139, 123, 123, 63, 153, 166, 183, 140, 136, 153, 154,
      166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 170, 153, 123,
      123, 107, 121, 107, 121, 167, 151, 183, 140, 151, 183, 140],
     [111, 111, 125, 110, 110, 94, 124, 108, 124, 107, 125, 141, 179, 153, 125,
      107, 125, 141, 179, 153, 125, 107, 125, 141, 179, 153, 125, 140, 139, 182,
      182, 152, 136, 152, 136, 153, 136, 139, 111, 136, 139, 111]),
    ("last_x",         18,
     [125, 110, 124, 110, 95, 94, 125, 111, 111, 79, 125, 126, 111, 111, 79, 108, 123, 93],
     [125, 110, 94, 110, 95, 79, 125, 111, 110, 78, 110, 111, 111, 95, 94, 108, 123, 108],
     [110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111, 79, 108, 123, 63]),
    ("last_y",         18,
     [125, 110, 124, 110, 95, 94, 125, 111, 111, 79, 125, 126, 111, 111, 79, 108, 123, 93],
     [125, 110, 94, 110, 95, 79, 125, 111, 110, 78, 110, 111, 111, 95, 94, 108, 123, 108],
     [110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111, 79, 108, 123, 63]),
    ("one",            24,
     [154, 196, 167, 167, 154, 152, 167, 182, 182, 134, 149, 136, 153, 121, 136,
      122, 169, 208, 166, 167, 154, 152, 167, 182],
     [154, 196, 196, 167, 154, 152, 167, 182, 182, 134, 149, 136, 153, 121, 136,
      137, 169, 194, 166, 167, 154, 167, 137, 182],
     [140, 92, 137, 138, 140, 152, 138, 139, 153, 74, 149, 92, 139, 107, 122,
      152, 140, 179, 166, 182, 140, 227, 122, 197]),
    ("abs",             6, [107, 167, 91, 107, 107, 167], [107, 167, 91, 122, 107, 167],
                           [138, 153, 136, 167, 152, 152]),
    ("mvp_idx",         1, [168], [168], [CNU]),
    ("sao_merge",       1, [153], [153], [153]),
    ("sao_type",        1, [160], [185], [200]),
    ("transform_skip",  2, [139, 139], [139, 139], [139, 139]),
    ("tq_bypass",       1, [154], [154], [154]),
]

CTX_OFFSET = {}
_off = 0
for _name, _cnt, _b, _p, _i in _CTX_DEFS:
    CTX_OFFSET[_name] = _off
    _off += _cnt
NUM_CTX = _off

_INIT_ROWS = np.zeros((3, NUM_CTX), dtype=np.int32)
_off = 0
for _name, _cnt, _b, _p, _i in _CTX_DEFS:
    assert len(_b) == len(_p) == len(_i) == _cnt, _name
    _INIT_ROWS[0, _off:_off + _cnt] = _b
    _INIT_ROWS[1, _off:_off + _cnt] = _p
    _INIT_ROWS[2, _off:_off + _cnt] = _i
    _off += _cnt


def init_all_contexts(slice_type: int, qp: int) -> np.ndarray:
    """slice_type: 0=B, 1=P, 2=I (matching the x265 SliceType enum used by
    the init tables). Returns packed context states [NUM_CTX]."""
    vals = _INIT_ROWS[slice_type]
    return np.array([init_context(int(v), qp) for v in vals], dtype=np.uint8)


# ---------------------------------------------------------------------------
# Scan orders (spec 6.5.3/6.5.4): 0=diag up-right, 1=horizontal, 2=vertical
# ---------------------------------------------------------------------------

SCAN_DIAG = 0
SCAN_HOR = 1
SCAN_VER = 2


@lru_cache(maxsize=None)
def scan_order(scan_type: int, log2_size: int) -> np.ndarray:
    """Positions in scan order as raster indices for a (2^n x 2^n) block.
    For blocks >4x4 the scan is hierarchical: 4x4 subblocks in CG scan order,
    each CG scanned internally (spec 7.4.9.11 scan derivation)."""
    n = 1 << log2_size
    if log2_size == 2:
        return _scan_block(scan_type, 4, 4)
    cg = _scan_block(scan_type, n // 4, n // 4)   # CG raster indices
    inner = _scan_block(scan_type, 4, 4)
    out = np.zeros(n * n, dtype=np.int32)
    k = 0
    for cgi in cg:
        cy, cx = divmod(int(cgi), n // 4)
        base = (cy * 4) * n + cx * 4
        for pi in inner:
            py, px = divmod(int(pi), 4)
            out[k] = base + py * n + px
            k += 1
    return out


@lru_cache(maxsize=None)
def scan_order_cg(scan_type: int, log2_size_cg: int) -> np.ndarray:
    return _scan_block(scan_type, 1 << log2_size_cg, 1 << log2_size_cg)


def _scan_block(scan_type: int, h: int, w: int) -> np.ndarray:
    out = []
    if scan_type == SCAN_HOR:
        for y in range(h):
            for x in range(w):
                out.append(y * w + x)
    elif scan_type == SCAN_VER:
        for x in range(w):
            for y in range(h):
                out.append(y * w + x)
    else:  # diagonal up-right (spec 6.5.3)
        for d in range(h + w - 1):
            y = min(d, h - 1)
            x = d - y
            while y >= 0 and x < w:
                out.append(y * w + x)
                y -= 1
                x += 1
    return np.array(out, dtype=np.int32)


@lru_cache(maxsize=None)
def scan4x4(scan_type: int) -> np.ndarray:
    return _scan_block(scan_type, 4, 4)


# last_sig_coeff position binarization (spec 9.3.3.1.2):
# prefix = GROUP_IDX[pos] (truncated unary), suffix = fixed-length remainder.
def _min_in_group(g: int) -> int:
    if g < 4:
        return g
    return (2 + (g & 1)) << ((g >> 1) - 1)


MIN_IN_GROUP = np.array([_min_in_group(g) for g in range(10)], dtype=np.int32)

GROUP_IDX = np.zeros(32, dtype=np.int32)
for _pos in range(32):
    _g = 0
    while _g < 9 and _min_in_group(_g + 1) <= _pos:
        _g += 1
    GROUP_IDX[_pos] = _g

# sig_coeff_flag position context patterns (spec 9.3.4.2.5), indexed
# [patternSigCtx][posInSubblock raster]; row 4 is the dedicated 4x4 map.
SIG_CTX_PATTERN = np.array([
    [2, 1, 1, 0, 1, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0],
    [2, 2, 2, 2, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0],
    [2, 1, 0, 0, 2, 1, 0, 0, 2, 1, 0, 0, 2, 1, 0, 0],
    [2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2],
    [0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8],
], dtype=np.int32)

# chroma-from-luma intra angle mapping for 4:2:2 (spec table 8-3)
CHROMA422_ANGLE_MAP = np.array(
    [0, 1, 2, 2, 2, 2, 3, 5, 7, 8, 10, 12, 13, 15, 17, 18, 19, 20, 21, 22, 23,
     23, 24, 24, 25, 25, 26, 27, 27, 28, 28, 29, 29, 30, 31], dtype=np.int32)
