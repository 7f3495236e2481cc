"""HEVC core transforms (DCT-II 4/8/16/32 + DST-VII 4x4) as batched matmuls.

Reference behavior (studied, not copied): /root/reference/source/common/dct.cpp
  - forward shifts:  shift1 = log2N - 1 + (bitDepth - 8), shift2 = log2N + 5
    (dct.cpp:444-524)
  - inverse shifts:  shift1 = 7, shift2 = 12 - (bitDepth - 8), int16 clamp after
    each stage (dct.cpp:242-415, 528-600)

TPU-first design: the reference's per-block partial-butterfly scalar code
becomes two dense matrix multiplies over a batch axis of blocks:
    stage(A) = (T @ A^T + round) >> shift
applied twice, which is exactly the spec's separable integer transform. The
matmuls run on the MXU; batching over [B, N, N] blocks keeps it fed
(SURVEY.md K7: "fixed 4/8/16/32 integer transform matrices -> MXU matmul
pairs"). All arithmetic is exact int32 — HEVC transforms are integer-exact and
conformance requires it.

The transform matrices are constants defined by the HEVC spec (ITU-T H.265
sec 8.6.4); they are generated here from the cosine formula and snapped to the
spec's integer set, then verified by tests against hardcoded spec rows.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

# The complete set of coefficient magnitudes appearing in the HEVC DCT
# matrices (H.265 sec 8.6.4.2).
_SPEC_MAGNITUDES = np.array(
    [4, 9, 13, 18, 22, 25, 31, 36, 38, 43, 46, 50, 54, 57, 61, 64,
     67, 70, 73, 75, 78, 80, 82, 83, 85, 87, 88, 89, 90], dtype=np.float64)


@lru_cache(maxsize=None)
def dct_matrix(n: int) -> np.ndarray:
    """The n-point HEVC integer DCT matrix (n in 4/8/16/32), int32 [n, n]."""
    assert n in (4, 8, 16, 32)
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    ideal = 64.0 * math.sqrt(2.0) * np.cos(np.pi * k * (2 * m + 1) / (2 * n))
    signs = np.sign(ideal)
    signs[np.abs(ideal) < 1e-9] = 0.0
    mags = np.abs(ideal)
    snapped = _SPEC_MAGNITUDES[np.argmin(
        np.abs(mags[..., None] - _SPEC_MAGNITUDES[None, None, :]), axis=-1)]
    out = (signs * snapped).astype(np.int32)
    out[0, :] = 64  # DC row is exactly 64
    return out


# DST-VII 4x4 used for intra 4x4 luma TUs (H.265 sec 8.6.4.1).
DST4 = np.array([[29, 55, 74, 84],
                 [74, 74, 0, -74],
                 [84, -29, -74, 55],
                 [55, -84, 74, -29]], dtype=np.int32)


def _stage(xp, T, blocks, shift):
    """One butterfly stage: out[..., k, j] = (sum_n T[k,n]*in[..., j, n] + add) >> shift.

    Equivalent to the reference's partialButterflyN over `line` rows
    (dct.cpp:418+): transforms along the last axis and transposes.
    """
    add = 1 << (shift - 1)
    prod = xp.einsum("kn,...jn->...kj", T, blocks)
    return xp.right_shift(prod + add, shift)


def _istage(xp, T, blocks, shift):
    """Inverse stage: out[..., j, n] = clip16((sum_k T[k,n]*in[..., k, j] + add) >> shift).

    (matches partialButterflyInverseN's output layout, dct.cpp:242+)"""
    add = 1 << (shift - 1)
    prod = xp.einsum("kn,...kj->...jn", T, blocks)
    return xp.clip(xp.right_shift(prod + add, shift), -32768, 32767)


def forward_transform(blocks, bit_depth: int = 8, dst: bool = False, xp=np):
    """Forward 2D transform of residual blocks.

    blocks: int array [..., N, N] of residuals; returns int32 coeffs [..., N, N].
    dst=True selects the 4x4 DST-VII (intra luma 4x4 only).
    """
    n = int(blocks.shape[-1])
    T = DST4 if dst else dct_matrix(n)
    if xp is not np:
        T = xp.asarray(T)
    log2n = n.bit_length() - 1
    shift1 = log2n - 1 + (bit_depth - 8)
    shift2 = log2n + 6
    blocks = blocks.astype(xp.int32) if hasattr(blocks, "astype") else blocks
    t = _stage(xp, T, blocks, shift1)
    return _stage(xp, T, t, shift2)


def inverse_transform(coeffs, bit_depth: int = 8, dst: bool = False, xp=np):
    """Inverse 2D transform: int coeffs [..., N, N] -> residual int32 [..., N, N]."""
    n = int(coeffs.shape[-1])
    T = DST4 if dst else dct_matrix(n)
    if xp is not np:
        T = xp.asarray(T)
    shift1 = 7
    shift2 = 12 - (bit_depth - 8)
    coeffs = coeffs.astype(xp.int32) if hasattr(coeffs, "astype") else coeffs
    # Two _istage applications compose the separable inverse directly:
    # stage1 output is [hfreq, row], stage2 output is [row, col].
    t = _istage(xp, T, coeffs, shift1)
    return _istage(xp, T, t, shift2)


def transform_skip(resid, bit_depth: int = 8, xp=np):
    """Transform-skip forward: coeff = resid << tsShift (dct.cpp copy path,
    quant.cpp:430-447). tsShift = 15 - bd - log2N, N is 4 only in HEVC v1."""
    n = int(resid.shape[-1])
    log2n = n.bit_length() - 1
    ts_shift = 15 - bit_depth - log2n
    r = resid.astype(xp.int32)
    if ts_shift >= 0:
        return xp.left_shift(r, ts_shift)
    return xp.right_shift(r, -ts_shift)


def inv_transform_skip(coeff, bit_depth: int = 8, xp=np):
    n = int(coeff.shape[-1])
    log2n = n.bit_length() - 1
    ts_shift = 15 - bit_depth - log2n
    c = coeff.astype(xp.int32)
    if ts_shift > 0:
        add = 1 << (ts_shift - 1)
        return xp.right_shift(c + add, ts_shift)
    return xp.left_shift(c, -ts_shift)
