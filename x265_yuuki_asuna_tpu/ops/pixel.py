"""Pixel cost metrics: SAD, SATD (4x4/8x8 Hadamard), SSE, variance, SSIM.

Reference behavior (studied, not copied):
  - C reference: /root/reference/source/common/pixel.cpp (sad/satd/sa8d/ssd/var)
  - asm: sad-a.asm, pixel-a.asm, ssd-a.asm (SURVEY.md K1/K2/K4)

TPU-first: every metric takes [..., H, W] batches and reduces on the VPU; the
Hadamard transforms are expressed as two small matmuls so large batches can
ride the MXU. Normalization constants match the reference (satd = sum/2,
sa8d = (satd8x8+2)/4 halving) so RD decisions line up.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def hadamard_matrix(n: int) -> np.ndarray:
    h = np.array([[1]], dtype=np.int32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def sad(a, b, xp=np):
    """Sum of absolute differences over the last two axes."""
    d = a.astype(xp.int32) - b.astype(xp.int32)
    return xp.sum(xp.abs(d), axis=(-2, -1))


def sse(a, b, xp=np):
    """Sum of squared errors (sse_pp) over the last two axes."""
    d = a.astype(xp.int32) - b.astype(xp.int32)
    return xp.sum(d * d, axis=(-2, -1))


def _hadamard2d(blocks, n: int, xp):
    H = hadamard_matrix(n)
    if xp is not np:
        H = xp.asarray(H)
    t = xp.einsum("ij,...jk->...ik", H, blocks.astype(xp.int32))
    return xp.einsum("...ik,kj->...ij", t, H)


def satd4(a, b, xp=np):
    """SATD over 4x4 blocks: blocks [..., 4, 4] -> [...]. Matches the
    reference's satd_4x4 normalization (sum(|H d H|) / 2)."""
    d = a.astype(xp.int32) - b.astype(xp.int32)
    h = _hadamard2d(d, 4, xp)
    return xp.right_shift(xp.sum(xp.abs(h), axis=(-2, -1)) + 1, 1)


def sa8d8(a, b, xp=np):
    """8x8 Hadamard SATD (sa8d): blocks [..., 8, 8] -> [...].
    Reference normalization: (sum + 2) >> 2."""
    d = a.astype(xp.int32) - b.astype(xp.int32)
    h = _hadamard2d(d, 8, xp)
    return xp.right_shift(xp.sum(xp.abs(h), axis=(-2, -1)) + 2, 2)


def _tile(blocks, th, tw, xp):
    """[..., H, W] -> [..., H//th, W//tw, th, tw]"""
    shp = blocks.shape
    H, W = shp[-2], shp[-1]
    r = blocks.reshape(shp[:-2] + (H // th, th, W // tw, tw))
    return xp.swapaxes(r, -3, -2)


def satd(a, b, xp=np):
    """SATD of arbitrary [..., H, W] blocks, H,W multiples of 4: sum of
    4x4-subblock SATDs (8x8+ use 8x8 Hadamard like the reference's sa8d-based
    satd for intra costing uses 4x4 satd; we use 4x4 tiling = satd_NxM)."""
    H, W = int(a.shape[-2]), int(a.shape[-1])
    ta = _tile(a, 4, 4, xp)
    tb = _tile(b, 4, 4, xp)
    per = satd4(ta, tb, xp=xp)
    return xp.sum(per, axis=(-2, -1))


def sa8d(a, b, xp=np):
    """sa8d of [..., H, W] blocks with H,W multiples of 8."""
    ta = _tile(a, 8, 8, xp)
    tb = _tile(b, 8, 8, xp)
    per = sa8d8(ta, tb, xp=xp)
    return xp.sum(per, axis=(-2, -1))


def variance(a, xp=np):
    """Block variance as (sum, sum_sq) based var like the reference's var_c."""
    x = a.astype(xp.int32)
    n = int(a.shape[-1]) * int(a.shape[-2])
    s = xp.sum(x, axis=(-2, -1))
    ss = xp.sum(x * x, axis=(-2, -1))
    return ss - (s * s) // n


def psnr(mse: float, max_val: int = 255) -> float:
    if mse <= 0:
        return 99.99
    return 10.0 * np.log10((max_val * max_val) / mse)


def ssim_plane(a: np.ndarray, b: np.ndarray, bit_depth: int = 8) -> float:
    """Global SSIM over a plane using 8x8 windows with stride 4, matching the
    reference's ssim accumulation granularity (pixel.cpp ssim_4x4x2_core).
    Vectorized with integral images (the python window loop measured
    8 s/frame at 1080p — dominating the whole encode)."""
    L = (1 << bit_depth) - 1
    c1 = (0.01 * L) ** 2
    c2 = (0.03 * L) ** 2
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    H, W = a.shape
    if H < 8 or W < 8:
        return 1.0

    def win_sums(x):
        ii = np.zeros((H + 1, W + 1))
        np.cumsum(np.cumsum(x, 0), 1, out=ii[1:, 1:])
        s = (ii[8:H + 1:4, 8:W + 1:4] - ii[8:H + 1:4, 0:W - 7:4]
             - ii[0:H - 7:4, 8:W + 1:4] + ii[0:H - 7:4, 0:W - 7:4])
        return s

    n = 64.0
    sa = win_sums(a)
    sb = win_sums(b)
    saa = win_sums(a * a)
    sbb = win_sums(b * b)
    sab = win_sums(a * b)
    ma = sa / n
    mb = sb / n
    va = saa / n - ma * ma
    vb = sbb / n - mb * mb
    cov = sab / n - ma * mb
    vals = (((2 * ma * mb + c1) * (2 * cov + c2))
            / ((ma * ma + mb * mb + c1) * (va + vb + c2)))
    return float(vals.mean())


def psy_energy(a, xp=np):
    """Psycho-visual energy of [..., N, N] blocks: AC energy measured as
    sa8d against the block DC (reference psyCost shape, rdcost.h:34 —
    energy = sa8d(block) - |block DC|; here computed as sa8d vs the DC
    plane, which is the same AC measure)."""
    ai = a.astype(xp.int32)
    dc = xp.mean(ai.reshape(ai.shape[:-2] + (-1,)), axis=-1,
                 keepdims=True).astype(xp.int32)
    flat_dc = xp.broadcast_to(dc[..., None], ai.shape)
    return sa8d(ai, flat_dc, xp=xp)
