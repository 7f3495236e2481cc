"""Quantization / dequantization (flat scaling list), batched.

Reference behavior (studied, not copied):
  - quant_c / nquant_c:      /root/reference/source/common/dct.cpp:664,688
  - dequant_normal_c:        /root/reference/source/common/dct.cpp:612
  - shift derivations:       /root/reference/source/common/quant.cpp:465,556
      transformShift = 15 - bitDepth - log2N   (MAX_TR_DYNAMIC_RANGE = 15)
      qbits  = 14 + qp//6 + transformShift     (QUANT_SHIFT = 14)
      dqshift = 20 - 14 - transformShift       (QUANT_IQUANT_SHIFT = 20)
  - quant scale tables:      scalinglist.cpp:129 (spec constants)
  - sign-bit hiding:         /root/reference/source/common/quant.cpp:247
    (signBitHidingHDQ) — implemented here as vectorized per-CG adjustment.

All elementwise integer math — VPU work on TPU; shared by numpy reference and
jnp jitted paths through the `xp` namespace argument.
"""

from __future__ import annotations

import numpy as np

# Spec constants (H.265 sec 8.6.3)
QUANT_SCALES = np.array([26214, 23302, 20560, 18396, 16384, 14564], dtype=np.int32)
INV_QUANT_SCALES = np.array([40, 45, 51, 57, 64, 72], dtype=np.int32)


def transform_shift(log2_tr_size: int, bit_depth: int) -> int:
    return 15 - bit_depth - log2_tr_size


def quant(coef, qp, log2_tr_size: int, bit_depth: int = 8,
          is_intra_slice: bool = True, xp=np):
    """Forward quant with the reference's RDO-less rounding offset.

    coef: int32 [..., N, N] transform coefficients. qp may be a Python int or
    a traced scalar (runtime QP — needed for rate control without recompiles).
    Returns (levels int32 [..., N, N] signed, delta_u int32 for sign hiding).
    """
    tshift = transform_shift(log2_tr_size, bit_depth)
    if isinstance(qp, (int, np.integer)):
        per, rem = qp // 6, qp % 6
        scale = int(QUANT_SCALES[rem])
        qbits = 14 + per + tshift
        add = (171 if is_intra_slice else 85) << (qbits - 9)
    else:
        qp = qp.astype(xp.int32)
        if qp.ndim == 1:     # per-block QP vector -> broadcast over [B, N, N]
            qp = qp[:, None, None]
        per, rem = qp // 6, qp % 6
        scale = xp.take(xp.asarray(QUANT_SCALES), rem)
        qbits = 14 + per + tshift
        add = xp.left_shift((171 if is_intra_slice else 85) + 0 * per, qbits - 9)
    c = coef.astype(xp.int32)
    sign = xp.sign(c)
    tmp = xp.abs(c) * scale
    level = xp.right_shift(tmp + add, qbits)
    delta_u = xp.right_shift(tmp - xp.left_shift(level, qbits), qbits - 8)
    level = xp.clip(level * sign, -32768, 32767)
    return level, delta_u


def dequant(levels, qp, log2_tr_size: int, bit_depth: int = 8, xp=np):
    """Flat-list dequant (dequant_normal): int levels -> int32 coefficients.
    qp may be a Python int or a traced scalar."""
    shift = 20 - 14 - transform_shift(log2_tr_size, bit_depth)
    if isinstance(qp, (int, np.integer)):
        per, rem = qp // 6, qp % 6
        scale = int(INV_QUANT_SCALES[rem]) << per
    else:
        qp = qp.astype(xp.int32)
        if qp.ndim == 1:
            qp = qp[:, None, None]
        per, rem = qp // 6, qp % 6
        scale = xp.left_shift(xp.take(xp.asarray(INV_QUANT_SCALES), rem), per)
    add = 1 << (shift - 1)
    c = xp.right_shift(levels.astype(xp.int32) * scale + add, shift)
    return xp.clip(c, -32768, 32767)


# ---------------------------------------------------------------------------
# Sign-bit hiding (SBH). The reference hides the sign of the first nonzero
# coefficient of each 4x4 coefficient group when the scan distance between
# first and last nonzero in the group is >= 4 (SBH_THRESHOLD), adjusting the
# coefficient with the best delta_u to fix parity (quant.cpp:247-395).
# ---------------------------------------------------------------------------

SBH_THRESHOLD = 4


def sign_bit_hiding_np(levels: np.ndarray, delta_u: np.ndarray,
                       scan: np.ndarray) -> np.ndarray:
    """Numpy reference SBH for one block. levels [N,N] signed, scan is the
    coefficient scan order (array of raster indices, CG-by-CG), returns
    adjusted levels. Mirrors signBitHidingHDQ semantics."""
    n = levels.shape[-1]
    flat = levels.reshape(-1).copy()
    du = delta_u.reshape(-1)
    num_cg = (n * n) // 16
    for cg in range(num_cg):
        idx = scan[cg * 16:(cg + 1) * 16]
        vals = flat[idx]
        nz = np.nonzero(vals)[0]
        if len(nz) == 0:
            continue
        first, last = nz[0], nz[-1]
        if last - first < SBH_THRESHOLD:
            continue
        abs_sum = int(np.abs(vals[first:last + 1]).sum())
        sign_first = 1 if vals[first] >= 0 else -1
        if (abs_sum & 1) == (0 if sign_first > 0 else 1):
            continue  # parity already encodes the sign
        # parity mismatch: +/-1 the coefficient with max |delta_u| benefit,
        # preferring to change a nonzero coefficient (simplified cost model:
        # the reference scans for min rate cost; we pick the largest
        # rounding-residual position like its fast path).
        cand = np.arange(first, last + 1)
        costs = np.where(vals[cand] != 0, -np.abs(du[idx[cand]]),
                         -np.abs(du[idx[cand]]) + 1)
        pick = cand[int(np.argmin(costs))]
        v = vals[pick]
        if v == 0:
            adj = 1 if du[idx[pick]] >= 0 else -1
        else:
            adj = 1 if du[idx[pick]] >= 0 else -1
            if v == -1 and adj == -1:
                adj = 1
            elif v == 1 and adj == 1 and pick == last and len(nz) == 1:
                adj = -1
        flat[idx[pick]] = np.clip(v + adj, -32768, 32767)
    return flat.reshape(n, n)
