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
# Scaling-list (quant matrix) variants. qtab/dqtab are [6, N, N] per-rem
# per-coefficient tables from ScalingListData.quant_tables — the reference's
# m_quantCoef/m_dequantCoef (scalinglist.cpp:342 setupQuantMatrices).
# ---------------------------------------------------------------------------


def quant_matrix(coef, qp, log2_tr_size: int, qtab, bit_depth: int = 8,
                 is_intra_slice: bool = True, xp=np):
    """Forward quant with a quant matrix. Returns (levels, delta_u)."""
    tshift = transform_shift(log2_tr_size, bit_depth)
    if isinstance(qp, (int, np.integer)):
        per, rem = qp // 6, qp % 6
        scale = xp.asarray(qtab)[rem]
        qbits = 14 + per + tshift
        add = (171 if is_intra_slice else 85) << (qbits - 9)
    else:
        qp = qp.astype(xp.int32)
        if qp.ndim == 1:
            qp = qp[:, None, None]
        per, rem = qp // 6, qp % 6
        scale = xp.asarray(qtab)[rem[..., 0, 0] if rem.ndim else rem]
        qbits = 14 + per + tshift
        add = xp.left_shift((171 if is_intra_slice else 85) + 0 * per,
                            qbits - 9)
    c = coef.astype(xp.int32)
    sign = xp.sign(c)
    tmp = xp.abs(c) * scale
    level = xp.right_shift(tmp + add, qbits)
    delta_u = xp.right_shift(tmp - xp.left_shift(level, qbits), qbits - 8)
    return xp.clip(level * sign, -32768, 32767), delta_u


def dequant_matrix(levels, qp, log2_tr_size: int, dqtab, bit_depth: int = 8,
                   xp=np):
    """Scaling-list dequant (dequant_scaling_c, dct.cpp): normative."""
    shift = 20 - 14 - transform_shift(log2_tr_size, bit_depth) + 4
    if isinstance(qp, (int, np.integer)):
        per, rem = qp // 6, qp % 6
        dq = xp.asarray(dqtab)[rem]
    else:
        qp = qp.astype(xp.int32)
        if qp.ndim == 1:
            qp = qp[:, None, None]
        per, rem = qp // 6, qp % 6
        dq = xp.asarray(dqtab)[rem[..., 0, 0] if rem.ndim else rem]
    lv = levels.astype(xp.int32)
    # shift > per branch (dct.cpp): coef = (lv*dq + 1<<(shift-per-1)) >>
    # (shift-per); else coef = clip(lv*dq) << (per-shift)
    sp = shift - per
    if isinstance(sp, (int, np.integer)):
        if sp > 0:
            out = (lv * dq + (1 << (sp - 1))) >> sp
        else:
            out = xp.clip(lv * dq, -32768, 32767) << (-sp)
    else:
        sp_pos = xp.maximum(sp, 1)
        hi = xp.right_shift(lv * dq + xp.left_shift(1, sp_pos - 1), sp_pos)
        lo = xp.left_shift(xp.clip(lv * dq, -32768, 32767),
                           xp.maximum(-sp, 0))
        out = xp.where(sp > 0, hi, lo)
    return xp.clip(out, -32768, 32767)


# ---------------------------------------------------------------------------
# Sign-bit hiding (SBH). The reference hides the sign of the first nonzero
# coefficient of each 4x4 coefficient group when the scan distance between
# first and last nonzero in the group is >= 4 (SBH_THRESHOLD), adjusting the
# coefficient with the best delta_u to fix parity (quant.cpp:247-395).
# ---------------------------------------------------------------------------

SBH_THRESHOLD = 4


# ---------------------------------------------------------------------------
# Noise reduction (K8 denoiseDct). The reference subtracts a per-coefficient
# offset from |dctCoef| before quant (dct.cpp:744 denoiseDct_c) and adapts
# the offsets from running |coef| averages per TU category
# (frameencoder.cpp:2100 noiseReductionUpdate).
# ---------------------------------------------------------------------------


def denoise_dct(coef, offset, xp=np):
    """Subtract `offset` (>=0, [N,N] or broadcastable) from |coef|, clamp at
    0, restore sign. Returns (denoised coef int32, |coef| pre-denoise)."""
    c = coef.astype(xp.int32)
    sign = xp.sign(c)
    a = xp.abs(c)
    return xp.maximum(a - offset, 0) * sign, a


def nr_update_offsets(res_sum: np.ndarray, count: int, strength: int,
                      max_blocks: int):
    """Host-side offset adaptation. res_sum: int64 [ncoef] running |coef|
    sums; count: blocks accumulated. Returns (offsets int32 [ncoef],
    new res_sum, new count) — with the reference's halving once count
    exceeds max_blocks and a zero DC offset."""
    if count > max_blocks:
        res_sum = res_sum >> 1
        count >>= 1
    scaled = int(strength) * int(count)
    off = (scaled + res_sum // 2) // (res_sum + 1)
    off = off.astype(np.int32)
    off[0] = 0          # never denoise DC
    return off, res_sum, count


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


# ---------------------------------------------------------------------------
# RDOQ: rate-distortion optimized quantization (vectorized approximation of
# reference quant.cpp rdoQuant, cost model RDCOST(d,bits) =
# (d^2 << (15 - 2*transformShift)) + lambda2*bits with d measured through the
# actual dequantizer). Per-coefficient level choice {round, round-1, 0} plus
# coefficient-group zeroing. Encoder-side only — any level map stays
# decodable, so this carries no conformance risk.
# ---------------------------------------------------------------------------

def _level_bits(l, xp):
    """Approximate CABAC bits for coding abs level l>0 in residual_coding:
    sig + greater1 + (greater2 + Golomb-Rice remainder) + EP sign."""
    lf = l.astype(xp.float32)
    rem = xp.maximum(lf - 2.0, 0.0)
    # EG0-style remainder length ~ 2*log2(rem+1)+1
    rem_bits = xp.where(rem > 0, 2.0 * xp.log2(rem + 1.0) + 1.0, 0.0)
    return xp.where(
        l <= 0, 1.0,                               # sig flag only
        3.0 + xp.where(l > 1, 1.0, 0.0) + rem_bits)


def est_tu_bits(levels, xp=np):
    """Approximate CABAC bits for one TU's levels [..., N, N] -> [...] f32.

    Static per-level estimate (same model as quant_rdoq) plus a small
    per-TU overhead when any coefficient is coded (last-position + CG
    flags). Used for in-scan RD split decisions; the real CABAC pass on
    the host produces the actual bits."""
    a = xp.abs(levels).astype(xp.int32)
    bits = xp.sum(xp.where(a > 0, _level_bits(a, xp), 0.0), axis=(-2, -1))
    any_nz = xp.any(a > 0, axis=(-2, -1))
    return bits + xp.where(any_nz, 6.0, 0.0)


def quant_rdoq(coef, qp, log2_tr_size: int, bit_depth: int = 8,
               lambda_scale: float = 0.25, psy_scale: float = 0.0, xp=np):
    """RD-optimized quantization. Returns int32 signed levels.

    Approximate: bit costs are static estimates, not CABAC-state-derived
    (the reference reads estBitsSbac tables) — gains are content-dependent;
    r2 work item: context-aware bit tables. lambda_scale tunes the
    rate-distortion tradeoff around the x265 lambda2 curve.

    psy_scale > 0 enables psy-RDOQ (reference --psy-rdoq, quant.cpp:631):
    the reconstructed coefficient energy is SUBTRACTED from the cost of
    non-DC luma positions, biasing level choices toward keeping AC energy."""
    tshift = transform_shift(log2_tr_size, bit_depth)
    if isinstance(qp, (int, np.integer)):
        per, rem = qp // 6, qp % 6
        scale = int(QUANT_SCALES[rem])
        iscale = int(INV_QUANT_SCALES[rem]) << per
        qbits = 14 + per + tshift
        lam2 = 9.728 * float(2.0 ** ((qp - 12) / 3.0)) * lambda_scale
    else:
        qpv = qp.astype(xp.int32)
        if qpv.ndim == 1:
            qpv = qpv[:, None, None]
        per, rem = qpv // 6, qpv % 6
        scale = xp.take(xp.asarray(QUANT_SCALES), rem)
        iscale = xp.left_shift(xp.take(xp.asarray(INV_QUANT_SCALES), rem), per)
        qbits = 14 + per + tshift
        lam2 = 9.728 * xp.exp2((qpv - 12).astype(xp.float32) / 3.0) * lambda_scale
    dqshift = 20 - 14 - tshift          # dequant shift (no per here: folded
    dqadd = 1 << (dqshift - 1)          # into iscale per dequant_normal)

    c = coef.astype(xp.int32)
    sign = xp.sign(c)
    a = xp.abs(c)
    tmp = a * scale
    lmax = xp.right_shift(tmp + (1 << (qbits - 1))
                          if isinstance(qbits, int)
                          else tmp + xp.left_shift(1 + 0 * qbits, qbits - 1),
                          qbits)
    lmax = xp.clip(lmax, 0, 32767)
    llow = xp.maximum(lmax - 1, 0)

    def unq(l):
        return xp.right_shift(l * iscale + dqadd, dqshift)

    # real-valued cost: d^2 * 2^(-2*tshift) + lambda2 * bits (the reference's
    # Q15 bit scale cancels against its SCALE_BITS=15 distortion shift)
    sfac = np.float32(2.0 ** (-2 * tshift))
    if psy_scale > 0:
        # psy energy credit per non-DC position (PSYVALUE, quant.cpp:643:
        # psyScale * lambda * recon >> (2*tshift + 1))
        n_ = 1 << log2_tr_size
        ac_mask = np.ones((n_, n_), np.float32)
        ac_mask[0, 0] = 0.0
        if xp is not np:
            ac_mask = xp.asarray(ac_mask)
        # lambda (not lambda2): 2^((qp-12)/6) == sqrt(lam2 / (9.728*scale)),
        # which is already shaped right for scalar or per-block traced QP
        lam1 = (lam2 / (9.728 * lambda_scale)) ** 0.5
        psy_w = psy_scale * lam1 * np.float32(2.0 ** (-(2 * tshift + 1)))

    def cost(l):
        d = (a - unq(l)).astype(xp.float32)
        c = d * d * sfac + lam2 * _level_bits(l, xp)
        if psy_scale > 0:
            c = c - psy_w * ac_mask * unq(l).astype(xp.float32)
        return c

    c0 = cost(xp.zeros_like(a))
    cmax = cost(lmax)
    clow = cost(llow)
    # choose per-coefficient argmin over {lmax, llow, 0}
    best = xp.where(clow < cmax, llow, lmax)
    bc = xp.minimum(clow, cmax)
    best = xp.where(c0 < bc, 0, best)
    bc = xp.minimum(c0, bc)

    n = 1 << log2_tr_size
    if n >= 8:
        # coefficient-group zeroing: drop a 4x4 CG when coding it costs more
        # than the uncoded distortion (+ ~2 bits for the coded-sub-block flag)
        shp = best.shape[:-2]
        g = lambda x: x.reshape(shp + (n // 4, 4, n // 4, 4))
        cg_coded = g(bc).sum(axis=(-3, -1))
        cg_zero = g(c0).sum(axis=(-3, -1))
        # lam2 is float / scalar array / [B,1,1] — all broadcast with the
        # [..., n/4, n/4] per-CG sums directly
        drop = (cg_zero < cg_coded + 2.0 * lam2)[..., :, None, :, None]
        best = xp.where(drop, 0, g(best)).reshape(best.shape)
    return xp.clip(best * sign, -32768, 32767)


def sign_bit_hiding(levels, delta_u, log2n: int, xp=np, scan_type: int = 0):
    """Vectorized sign-bit-hiding parity adjustment (decoder infers the sign
    of each CG's first-in-scan significant coefficient from the parity of the
    CG's absolute sum — spec 7.4.9.11 signHidden). scan_type selects the
    coefficient scan (tables.SCAN_DIAG/HOR/VER): the signHidden condition
    (last - first >= 4 in SCAN order) and the hidden-sign position are
    scan-dependent, so SBH must run under the SAME scan the serializer will
    use (mode-dependent for <=8x8 intra luma / 4x4 intra chroma TUs,
    residual.py select_scan).

    levels/delta_u: [..., N, N]. Adjusts the max-|delta_u| coefficient inside
    the CG's significant span by +1 magnitude when the parity disagrees —
    never creating/removing the first/last significant coefficient, so the
    signHidden condition is stable under the adjustment.
    """
    from ..bitstream import tables as T
    n = 1 << log2n
    scan = T.scan_order(scan_type, log2n)            # scan pos -> raster
    inv = np.argsort(scan)
    if xp is not np:
        scan_x, inv_x = xp.asarray(scan), xp.asarray(inv)
    else:
        scan_x, inv_x = scan, inv
    shp = levels.shape[:-2]
    flat = levels.reshape(shp + (n * n,))
    du = delta_u.reshape(shp + (n * n,))
    sl = xp.take(flat, scan_x, axis=-1)
    sdu = xp.take(du, scan_x, axis=-1)
    ncg = (n * n) // 16
    rs = sl.reshape(shp + (ncg, 16))
    rdu = sdu.reshape(shp + (ncg, 16))

    nz = rs != 0
    pos = xp.arange(16, dtype=xp.int32)
    first = xp.min(xp.where(nz, pos, 99), axis=-1)           # [..., ncg]
    last = xp.max(xp.where(nz, pos, -1), axis=-1)
    hide = (last - first) >= SBH_THRESHOLD
    abs_sum = xp.abs(rs).sum(axis=-1)
    vfirst = xp.take_along_axis(rs, xp.minimum(first, 15)[..., None],
                                axis=-1)[..., 0]
    target = xp.where(vfirst < 0, 1, 0)
    need = hide & ((abs_sum & 1) != target)

    in_range = (pos >= first[..., None]) & (pos <= last[..., None])
    score = xp.where(in_range, xp.abs(rdu), -1)
    pick = xp.argmax(score, axis=-1)                          # [..., ncg]
    pv = xp.take_along_axis(rs, pick[..., None], axis=-1)[..., 0]
    newv = xp.where(pv > 0, pv + 1, xp.where(pv < 0, pv - 1, 1))
    delta = xp.where(need, newv - pv, 0)
    rs = rs + (pos == pick[..., None]) * delta[..., None]

    out = rs.reshape(shp + (n * n,))
    return xp.take(out, inv_x, axis=-1).reshape(levels.shape)


def sign_bit_hiding_mdcs(levels, delta_u, log2n: int, modes, is_luma: bool,
                         xp=np, is_intra=None, csp420: bool = True):
    """Sign-bit hiding with the mode-dependent coefficient scan (MDCS,
    residual.py select_scan / reference cudata.cpp
    getTUEntropyCodingParameters): intra TUs of size <= 8x8 luma
    (<= 4x4 chroma in 4:2:0) scan horizontally for modes 22-30 and
    vertically for modes 6-14; everything else scans diagonally.

    modes: per-block intra mode [...]; is_intra: optional per-block bool
    (None = all intra). Blocks that are inter (or TUs too large for MDCS)
    use the diagonal scan.
    """
    from ..bitstream import tables as T
    max_log2 = 3 if is_luma else (3 - (1 if csp420 else 0))
    if log2n > max_log2:
        return sign_bit_hiding(levels, delta_u, log2n, xp=xp)
    lv_d = sign_bit_hiding(levels, delta_u, log2n, xp=xp,
                           scan_type=T.SCAN_DIAG)
    lv_h = sign_bit_hiding(levels, delta_u, log2n, xp=xp,
                           scan_type=T.SCAN_HOR)
    lv_v = sign_bit_hiding(levels, delta_u, log2n, xp=xp,
                           scan_type=T.SCAN_VER)
    m = modes
    hor = (m >= 22) & (m <= 30)
    ver = (m >= 6) & (m <= 14)
    if is_intra is not None:
        hor = hor & is_intra
        ver = ver & is_intra
    hor = hor[..., None, None]
    ver = ver[..., None, None]
    return xp.where(hor, lv_h, xp.where(ver, lv_v, lv_d))


def quant_rdoq_ctx(coef, qp, log2_tr_size: int, bit_depth: int,
                   states, is_luma: bool, psy_scale: float = 0.0,
                   lambda_scale: float = 1.0, xp=np):
    """RDOQ with CABAC-context bit costs (round 5).

    The round-4 static-bit RDOQ measured -1 dB and shipped OFF; the
    reference's rdoLevels loop reads estBitsSbac tables derived from the
    live context states (quant.cpp:688,820-843). This version prices every
    candidate level with the SAME frozen-at-slice-init context model K9
    uses for mode RD (ops/bitcost):

      * sig_coeff_flag: exact spec context per position, with the CG
        neighbor pattern derived from the pre-RDOQ levels;
      * greater1/greater2 flags: per-CG ctx_set (cg>0, luma) at the c1=1
        entry (the dominant state on the first significant coefficients);
      * abs remainder: Golomb-Rice length at a per-CG rice parameter
        bounded by the CG's pre-RDOQ magnitudes; sign: 1 EP bit;
      * last-position selection: one cumulative pass over the scan order
        evaluates EVERY candidate last position with the real
        last_sig_coeff prefix cost (the reference's best-last search,
        quant.cpp:1003);
      * CG zeroing at the real coded_sub_block_flag context cost.

    coef: [B, N, N] int32. states: packed [NUM_CTX] (bitcost
    init_states_dev). Returns int32 signed levels [B, N, N].
    """
    from . import bitcost as BC
    from ..bitstream import tables as T

    n = 1 << log2_tr_size
    nn = n * n
    ncg = max(1, (n // 4) * (n // 4))
    st = BC._tu_static(log2_tr_size, bool(is_luma))
    scan = st["scan"]
    inv_scan = np.argsort(scan).astype(np.int32)
    scan_x = xp.asarray(scan) if xp is not np else scan
    inv_x = xp.asarray(inv_scan) if xp is not np else inv_scan

    tshift = transform_shift(log2_tr_size, bit_depth)
    if isinstance(qp, (int, np.integer)):
        per, rem = qp // 6, qp % 6
        scale = int(QUANT_SCALES[rem])
        iscale = int(INV_QUANT_SCALES[rem]) << per
        qbits = 14 + per + tshift
        # the mode-RD lambda2 (x265_lambda2_tab shape, rdcost.h): the
        # first ctx-RDOQ cut used 9.728x this value and over-zeroed ~3 dB
        # below the encoder's own RD curve (round-5 BDRATE probe)
        lam2 = 0.85 * float(2.0 ** ((qp - 12) / 3.0)) * lambda_scale
    else:
        qpv = qp.astype(xp.int32)
        if qpv.ndim == 1:
            qpv = qpv[:, None, None]
        per, rem = qpv // 6, qpv % 6
        scale = xp.take(xp.asarray(QUANT_SCALES), rem)
        iscale = xp.left_shift(xp.take(xp.asarray(INV_QUANT_SCALES), rem),
                               per)
        qbits = 14 + per + tshift
        lam2 = (0.85 * xp.exp2((qpv - 12).astype(xp.float32) / 3.0)
                * lambda_scale)
    dqshift = 20 - 14 - tshift
    dqadd = 1 << (dqshift - 1)

    c = coef.astype(xp.int32)
    shp = c.shape[:-2]
    B = int(np.prod(shp)) if shp else 1
    cf = c.reshape((B, nn))
    sign = xp.sign(cf)
    a = xp.abs(cf)
    if not isinstance(qp, (int, np.integer)):
        scale = scale.reshape((-1, 1)) if scale.ndim else scale
        iscale = iscale.reshape((-1, 1)) if hasattr(iscale, "ndim") and iscale.ndim else iscale
        qbits = qbits.reshape((-1, 1)) if hasattr(qbits, "ndim") and qbits.ndim else qbits
        lam2 = lam2.reshape((-1, 1)) if hasattr(lam2, "ndim") and lam2.ndim else lam2
    tmp = a * scale
    if isinstance(qbits, int):
        lmax = xp.right_shift(tmp + (1 << (qbits - 1)), qbits)
    else:
        lmax = xp.right_shift(tmp + xp.left_shift(1 + 0 * qbits, qbits - 1),
                              qbits)
    lmax = xp.clip(lmax, 0, 32767)
    llow = xp.maximum(lmax - 1, 0)

    def unq(l):
        return xp.right_shift(l * iscale + dqadd, dqshift)

    sfac = np.float32(2.0 ** (-2 * tshift))

    # ---- scan-order views ------------------------------------------------
    asc = xp.take(a, scan_x, axis=-1)              # [B, nn] scan order
    lmax_sc = xp.take(lmax, scan_x, axis=-1)
    llow_sc = xp.take(llow, scan_x, axis=-1)
    tmp_sc = xp.take(tmp, scan_x, axis=-1)

    # ---- context cost tables at the frozen states ------------------------
    b0v, b1v = BC.state_bit_luts(states, xp=xp)
    # CG neighbor pattern from the pre-RDOQ significance (the reference
    # reads the live pattern in its loop; lmax is the superset of every
    # candidate outcome)
    cg_nz = xp.any(lmax_sc.reshape(B, ncg, 16) > 0, axis=-1)
    if ncg > 1:
        ncs = n // 4
        cg_scan = st["cg_scan"]
        cg_scan_t = xp.asarray(cg_scan) if xp is not np else cg_scan
        grid = xp.zeros((B, ncg), xp.int32)
        if xp is np:
            grid[np.arange(B)[:, None], cg_scan[None, :]] = \
                cg_nz.astype(np.int32)
        else:
            grid = grid.at[:, cg_scan_t].set(cg_nz.astype(xp.int32))
        g2d = grid.reshape(B, ncs, ncs)
        right = xp.pad(g2d[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
        below = xp.pad(g2d[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
        rightf = xp.take(right.reshape(B, ncg), cg_scan_t, axis=-1)
        belowf = xp.take(below.reshape(B, ncg), cg_scan_t, axis=-1)
    else:
        rightf = belowf = xp.zeros((B, 1), xp.int32)
    pattern = rightf + 2 * belowf                   # [B, ncg]
    rep16 = lambda t: xp.repeat(t, 16, axis=-1)

    sig_ctx_tab = st["sig_ctx"]
    if xp is not np:
        sig_ctx_tab = xp.asarray(sig_ctx_tab)
    pat_pos = rep16(pattern)                        # [B, nn]
    ctx_rel = None
    for p4 in range(4):
        term = xp.where(pat_pos == p4, sig_ctx_tab[p4][None, :], 0)
        ctx_rel = term if ctx_rel is None else ctx_rel + term
    sig_bank = BC.CTX["sig"] + (0 if is_luma else 27)
    nsigc = 27 if is_luma else 15
    sig0 = BC.chain_lookup(b0v[sig_bank:sig_bank + nsigc], ctx_rel, nsigc, xp)
    sig1 = BC.chain_lookup(b1v[sig_bank:sig_bank + nsigc], ctx_rel, nsigc, xp)

    cg_idx = xp.arange(ncg, dtype=xp.int32)
    ctx_set = (2 if is_luma else 0) * (cg_idx > 0).astype(xp.int32) + 1
    one_bank = BC.CTX["one"] + (0 if is_luma else 16)
    abs_bank = BC.CTX["abs"] + (0 if is_luma else 4)
    g1rel = 4 * ctx_set + 1                         # c1 = 1 entry, [ncg]
    ng1 = 16 if is_luma else 8
    ng2 = 4 if is_luma else 2
    g1c0 = rep16(BC.chain_lookup(b0v[one_bank:one_bank + ng1], g1rel[None],
                                 ng1, xp))          # [1, nn]
    g1c1 = rep16(BC.chain_lookup(b1v[one_bank:one_bank + ng1], g1rel[None],
                                 ng1, xp))
    g2c0 = rep16(BC.chain_lookup(b0v[abs_bank:abs_bank + ng2],
                                 ctx_set[None], ng2, xp))
    g2c1 = rep16(BC.chain_lookup(b1v[abs_bank:abs_bank + ng2],
                                 ctx_set[None], ng2, xp))

    # per-CG rice parameter bounded by the pre-RDOQ magnitudes
    maxcg = xp.max(lmax_sc.reshape(B, ncg, 16), axis=-1)
    rice = xp.clip(
        xp.floor(xp.log2(xp.maximum(maxcg, 1).astype(xp.float32) / 3.0)
                 ).astype(xp.int32) + 1, 0, 4)
    rice_pos = rep16(rice)                          # [B, nn]

    def level_bits(l):
        """Bits of coding abs level l (scan-order array), sig INCLUDED."""
        lf = l
        g1b = xp.where(lf > 1, g1c1, g1c0)
        g2b = xp.where(lf > 2, g2c1, g2c0)
        rem = xp.maximum(lf - 3, 0)
        remb = BC._rice_len(rem, rice_pos, xp)
        b = sig1 + g1b + 1.0                        # sig + g1 + sign
        b = b + xp.where(lf > 1, g2b, 0.0)
        b = b + xp.where(lf > 2, remb, 0.0)
        return xp.where(lf > 0, b, sig0)

    # ---- per-coefficient candidate choice --------------------------------
    dist = lambda l: ((asc - unq(l)).astype(xp.float32) ** 2) * sfac
    lam2b = lam2 if isinstance(lam2, float) else lam2.reshape((B, 1))
    if psy_scale > 0:
        ac = np.ones(nn, np.float32)
        ac[0] = 0.0                                 # scan slot 0 == DC
        ac_mask = xp.asarray(ac)[None] if xp is not np else ac[None]
        if isinstance(lam2, float):
            lam1 = (lam2 / (0.85 * lambda_scale)) ** 0.5
        else:
            lam1 = (lam2b / (0.85 * lambda_scale)) ** 0.5
        psy_w = psy_scale * lam1 * np.float32(2.0 ** (-(2 * tshift + 1)))

    def cost(l):
        cc = dist(l) + lam2b * level_bits(l)
        if psy_scale > 0 and is_luma:
            cc = cc - psy_w * ac_mask * unq(l).astype(xp.float32)
        return cc

    czer = cost(xp.zeros_like(asc))
    cmax = cost(lmax_sc)
    clow = cost(llow_sc)
    best = xp.where(clow < cmax, llow_sc, lmax_sc)
    bc = xp.minimum(clow, cmax)
    best = xp.where(czer < bc, 0, best)
    bc = xp.minimum(czer, bc)

    # ---- best-last search (quant.cpp:1003 analog) ------------------------
    # cost model per candidate last position k (scan order):
    #   prefix: coefficients j < k pay their chosen cost (sig included)
    #   k itself pays its level cost MINUS the sig flag (last implies sig)
    #   suffix: j > k uncoded, pay only distortion of level 0
    #   + the last_sig_coeff_x/y prefix bits of position k
    lo32 = st["last_ones"].astype(np.float32)
    lz32 = st["last_zeros"].astype(np.float32)
    lep = st["last_ep"].astype(np.float32)
    b0x = b0v[BC.CTX["last_x"]:BC.CTX["last_x"] + 18]
    b1x = b1v[BC.CTX["last_x"]:BC.CTX["last_x"] + 18]
    b0y = b0v[BC.CTX["last_y"]:BC.CTX["last_y"] + 18]
    b1y = b1v[BC.CTX["last_y"]:BC.CTX["last_y"] + 18]
    if xp is np:
        valx = lo32 @ b1x + lz32 @ b0x + lep
        valy = lo32 @ b1y + lz32 @ b0y + lep
    else:
        valx = xp.asarray(lo32) @ b1x + xp.asarray(lz32) @ b0x \
            + xp.asarray(lep)
        valy = xp.asarray(lo32) @ b1y + xp.asarray(lz32) @ b0y \
            + xp.asarray(lep)
    lx_of = scan & (n - 1)
    ly_of = scan >> log2_tr_size
    lastbits_np = np.zeros(nn, np.float32)
    # static per-slot last-position cost: fold the (traced) val vectors
    # with one-hot position masks — small [nn, n] matmuls
    ohx = np.zeros((nn, n), np.float32)
    ohy = np.zeros((nn, n), np.float32)
    ohx[np.arange(nn), lx_of] = 1.0
    ohy[np.arange(nn), ly_of] = 1.0
    if xp is np:
        lastbits = ohx @ valx + ohy @ valy          # [nn]
    else:
        lastbits = xp.asarray(ohx) @ valx + xp.asarray(ohy) @ valy
    cost_in = bc                                    # chosen, sig included
    lvl_b = level_bits(best)
    cost_k = dist(best) + lam2b * (lvl_b - sig1) \
        + lam2b * lastbits[None, :]                 # as last
    if psy_scale > 0 and is_luma:
        cost_k = cost_k - psy_w * ac_mask * unq(best).astype(xp.float32)
    cost_sfx = dist(xp.zeros_like(best))
    pre = xp.cumsum(cost_in, axis=-1) - cost_in     # exclusive prefix
    sfx_r = xp.cumsum(cost_sfx[:, ::-1], axis=-1)[:, ::-1]
    sfx = xp.concatenate([sfx_r[:, 1:],
                          xp.zeros((B, 1), xp.float32)], axis=-1)
    total_k = pre + cost_k + sfx
    total_k = xp.where(best > 0, total_k, np.float32(1e30))
    all_zero_cost = xp.sum(cost_sfx, axis=-1)       # cbf=0 handled by caller
    k_best = xp.argmin(total_k, axis=-1)            # [B]
    keep = xp.arange(nn, dtype=xp.int32)[None, :] <= k_best[:, None]
    use_zero = xp.min(total_k, axis=-1) >= all_zero_cost
    best = xp.where(keep & ~use_zero[:, None], best, 0)

    # ---- CG zeroing at the real csbf context cost ------------------------
    if ncg > 1:
        cbase = BC.CTX["sig_cg"] + (0 if is_luma else 2)
        rb = (rightf | belowf)
        csbf1 = xp.where(rb > 0, b1v[cbase + 1], b1v[cbase])
        bcg = xp.where(best > 0, cost(best), czer).reshape(B, ncg, 16)
        zcg = czer.reshape(B, ncg, 16)
        coded_cost = bcg.sum(-1)
        zero_cost = zcg.sum(-1)
        has_nz = xp.any(best.reshape(B, ncg, 16) > 0, axis=-1)
        # never drop the CG holding the chosen last coefficient
        is_last_cg = (cg_idx[None, :] == (k_best[:, None] // 16))
        drop = (zero_cost < coded_cost + lam2b * csbf1[None]) \
            & has_nz & ~is_last_cg
        best = xp.where(rep16(drop.astype(xp.int32)) > 0, 0, best)

    # back to raster order, signed
    out = xp.take(best * sign_at_scan(sign, scan_x, xp), inv_x, axis=-1)
    return xp.clip(out, -32768, 32767).reshape(c.shape)


def sign_at_scan(sign, scan_x, xp):
    return xp.take(sign, scan_x, axis=-1)
