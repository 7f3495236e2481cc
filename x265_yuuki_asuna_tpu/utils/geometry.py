"""Picture / CTU / CU geometry.

Reference behavior studied (not copied):
  - CTU geometry tables: /root/reference/source/common/cudata.cpp:2104 (calcCTUGeoms)
  - Padding rules:       /root/reference/source/common/picyuv.cpp (PicYuv::create)
  - Z-order scan:        /root/reference/source/common/common.cpp (g_zscanToRaster)

TPU-first redesign: instead of per-CTU pointer tables, geometry is a set of
static numpy index arrays computed once per (width, height, ctu_size) and
reused by every jitted function — all shapes static, edge CTUs handled by
padding the picture to whole-CTU multiples and masking costs outside the
conformance window.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from typing import Tuple

import numpy as np


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclass(frozen=True)
class FrameGeometry:
    """Static geometry of one encode session."""
    width: int                # conformance (source) luma width
    height: int
    ctu_size: int
    csp_hshift: int           # chroma height shift (1 for 420)
    csp_wshift: int           # chroma width shift

    @property
    def width_in_ctus(self) -> int:
        return cdiv(self.width, self.ctu_size)

    @property
    def height_in_ctus(self) -> int:
        return cdiv(self.height, self.ctu_size)

    @property
    def num_ctus(self) -> int:
        return self.width_in_ctus * self.height_in_ctus

    @property
    def padded_width(self) -> int:
        """Luma width padded up to a whole number of CTUs."""
        return self.width_in_ctus * self.ctu_size

    @property
    def padded_height(self) -> int:
        return self.height_in_ctus * self.ctu_size

    @property
    def chroma_width(self) -> int:
        return self.width >> self.csp_wshift

    @property
    def chroma_height(self) -> int:
        return self.height >> self.csp_hshift

    @property
    def padded_chroma_width(self) -> int:
        return self.padded_width >> self.csp_wshift

    @property
    def padded_chroma_height(self) -> int:
        return self.padded_height >> self.csp_hshift

    def ctu_xy(self, ctu_addr: int) -> Tuple[int, int]:
        """Raster CTU address → (x_pixel, y_pixel) of its top-left luma sample."""
        return ((ctu_addr % self.width_in_ctus) * self.ctu_size,
                (ctu_addr // self.width_in_ctus) * self.ctu_size)


def make_geometry(width: int, height: int, ctu_size: int = 64,
                  csp: int = 1) -> FrameGeometry:
    from .param import CSP_I400, CSP_I420, CSP_I422, CSP_I444
    hs, ws = {CSP_I400: (0, 0), CSP_I420: (1, 1),
              CSP_I422: (0, 1), CSP_I444: (0, 0)}[csp]
    return FrameGeometry(width, height, ctu_size, hs, ws)


# ---------------------------------------------------------------------------
# Z-order (Morton) scan within a CTU, at 4x4-partition granularity.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def zscan_to_raster(log2_parts_per_side: int) -> np.ndarray:
    """zscan index → raster index for a (2^n x 2^n) grid of partitions."""
    n = 1 << log2_parts_per_side
    out = np.zeros(n * n, dtype=np.int32)

    def fill(zi, x0, y0, size):
        if size == 1:
            out[zi] = y0 * n + x0
            return zi + 1
        h = size // 2
        zi = fill(zi, x0, y0, h)
        zi = fill(zi, x0 + h, y0, h)
        zi = fill(zi, x0, y0 + h, h)
        zi = fill(zi, x0 + h, y0 + h, h)
        return zi

    fill(0, 0, 0, n)
    return out


@lru_cache(maxsize=None)
def raster_to_zscan(log2_parts_per_side: int) -> np.ndarray:
    z2r = zscan_to_raster(log2_parts_per_side)
    out = np.zeros_like(z2r)
    out[z2r] = np.arange(len(z2r), dtype=np.int32)
    return out


# ---------------------------------------------------------------------------
# Wavefront diagonals: CU-grid scheduling for the intra dependency pattern.
# ---------------------------------------------------------------------------

def wavefront_diagonals(rows: int, cols: int, slope: int = 2):
    """Yield lists of (row, col) such that each block's left neighbor, top
    neighbor, and top-right neighbor are in strictly earlier diagonals.

    A block (r, c) is on diagonal d = slope*r + c. With slope>=2 the top-right
    neighbor (r-1, c+1) has d' = d - slope + 1 < d, satisfying the HEVC intra
    reference dependency (left, top, top-left, top-right all available).
    This is the standard WPP "2 CTUs ahead" stagger (SURVEY.md §2c).
    """
    ndiag = slope * (rows - 1) + cols
    for d in range(ndiag):
        blocks = []
        for r in range(rows):
            c = d - slope * r
            if 0 <= c < cols:
                blocks.append((r, c))
        if blocks:
            yield blocks


def wavefront_schedule(rows: int, cols: int, slope: int = 2):
    """Dense schedule arrays for lax.scan-based wavefront execution.

    Returns (num_diagonals, max_active, block_rc, block_valid):
      block_rc   : int32 [num_diagonals, max_active, 2] — (row, col) per slot
      block_valid: bool  [num_diagonals, max_active]
    Slots beyond the active count are masked out.
    """
    diags = list(wavefront_diagonals(rows, cols, slope))
    max_active = max(len(d) for d in diags)
    nd = len(diags)
    rc = np.zeros((nd, max_active, 2), dtype=np.int32)
    valid = np.zeros((nd, max_active), dtype=bool)
    for i, blocks in enumerate(diags):
        for j, (r, c) in enumerate(blocks):
            rc[i, j] = (r, c)
            valid[i, j] = True
    return nd, max_active, rc, valid


# ---------------------------------------------------------------------------
# Picture padding / conformance window
# ---------------------------------------------------------------------------

def pad_plane(plane: np.ndarray, padded_h: int, padded_w: int) -> np.ndarray:
    """Pad a plane to CTU-multiple size by edge replication (matches the
    reference's conformance-window extension semantics)."""
    h, w = plane.shape
    return np.pad(plane, ((0, padded_h - h), (0, padded_w - w)), mode="edge")


def conformance_window(width: int, height: int, csp_wshift: int,
                       csp_hshift: int, min_cu: int = 8):
    """HEVC SPS conformance window offsets when coding padded dimensions.

    The coded picture size must be a multiple of min CB size; the window
    crops back to the true source dimensions. Offsets are in chroma units
    (HEVC spec 7.4.3.2: SubWidthC/SubHeightC units)."""
    coded_w = cdiv(width, min_cu) * min_cu
    coded_h = cdiv(height, min_cu) * min_cu
    sub_w = 1 << csp_wshift
    sub_h = 1 << csp_hshift
    right = (coded_w - width) // sub_w
    bottom = (coded_h - height) // sub_h
    return coded_w, coded_h, right, bottom
