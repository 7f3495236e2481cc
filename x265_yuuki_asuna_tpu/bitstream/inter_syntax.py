"""Inter (P-slice) CU syntax + merge/AMVP candidate derivation.

Spec: ITU-T H.265 7.3.8.5-7.3.8.6 (coding_unit/prediction_unit),
8.5.3.2.2-8.5.3.2.7 (merge + MVP derivation). Reference behavior studied
(not copied): entropy.cpp codePredInfo/codeMvd, cudata.cpp getInterMergeCandidates/
getPUMVPredictors — specialised here to the round-1 uniform 2Nx2N CU grid
with one L0 reference (so no scaling, no ref-idx coding, no temporal MVP).

Decoder-normative: the encoder must signal merge_idx/mvp flags against the
exact candidate lists the decoder derives; both sides are implemented here
and exercised by the FFmpeg conformance tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from . import tables as T
from .cabac import CabacEncoder, CabacDecoder
from .ctu_syntax import (derive_mpm, encode_intra_luma_mode,
                         decode_intra_luma_mode, encode_intra_chroma_mode,
                         decode_intra_chroma_mode, encode_cu_qp_delta,
                         decode_cu_qp_delta)
from .residual import encode_residual, decode_residual

CTX = T.CTX_OFFSET
DC_MODE = 1


@dataclass
class CUInfo:
    """Final per-CU state as the decoder sees it (uniform 2Nx2N grid)."""
    is_intra: bool
    mv: Tuple[int, int] = (0, 0)       # quarter-pel, L0
    intra_mode: int = DC_MODE
    skip: bool = False
    ref: int = 0                       # L0 reference index


def merge_candidates(grid: List[List[Optional[CUInfo]]], r: int, c: int,
                     max_cands: int, n_refs: int = 1
                     ) -> List[Tuple[int, int]]:
    """Merge candidate MV list for CU (r, c) of a uniform 2Nx2N grid
    (spec 8.5.3.2.3 specialised: A1=left, B1=above, B0=above-right,
    A0=below-left (never decoded yet -> absent), B2=above-left; then
    zero-MV fill. Single L0 reference."""
    return [mv for mv, _ in merge_candidates_ref(grid, r, c, max_cands,
                                                n_refs)]


def temporal_candidate(col, r: int, c: int, target_tb: int
                       ) -> Optional[Tuple[int, int]]:
    """TMVP candidate (spec 8.5.3.2.5 specialised to the uniform CTU==CU
    16-grid): with CtbLog2SizeY == 4 the bottom-right position always
    falls into the next CTU row and is unavailable, so the CENTER position
    applies — the co-located block itself. HEVC stores collocated motion on
    a 16x16 grid, which IS this grid, so no compression step is needed.

    col: collocated picture's motion field
    {mvx, mvy, ref, intra: [rows][cols], ref_deltas: [int]} or None.
    Returns the mv scaled to the target reference distance, or None."""
    if col is None:
        return None
    if col["intra"][r][c]:
        return None
    mv = (int(col["mvx"][r][c]), int(col["mvy"][r][c]))
    ref = int(col["ref"][r][c]) if col.get("ref") is not None else 0
    td = col["ref_deltas"][ref]
    if td == target_tb:
        return mv
    return _scale_mv(mv, target_tb, td)


def merge_candidates_ref(grid: List[List[Optional[CUInfo]]], r: int, c: int,
                         max_cands: int, n_refs: int = 1, col=None,
                         ref_deltas=None
                         ) -> List[Tuple[Tuple[int, int], int]]:
    """Merge candidates as (mv, refIdx) pairs (spec 8.5.3.2.3): spatial
    candidates inherit the neighbor's reference; pruning compares full
    motion (mv AND ref); then the TEMPORAL candidate (refIdx 0, appended
    without pruning, 8.5.3.2.1); zero fill walks refIdx 0..n_refs-1 then 0
    (8.5.3.2.4 zeroIdx behavior)."""
    rows = len(grid)
    cols = len(grid[0])

    def inter_mi(rr, cc):
        if 0 <= rr < rows and 0 <= cc < cols:
            cu = grid[rr][cc]
            if cu is not None and not cu.is_intra:
                return (cu.mv, cu.ref)
        return None

    a1 = inter_mi(r, c - 1)
    b1 = inter_mi(r - 1, c)
    b0 = inter_mi(r - 1, c + 1)
    b2 = inter_mi(r - 1, c - 1)

    cands: List[Tuple[Tuple[int, int], int]] = []
    if a1 is not None:
        cands.append(a1)
    if b1 is not None and b1 != a1:
        cands.append(b1)
    if b0 is not None and b0 != b1:
        cands.append(b0)
    # A0 is below-left: not yet decoded in raster order -> unavailable
    if len(cands) < 4 and b2 is not None and b2 != a1 and b2 != b1:
        cands.append(b2)
    if col is not None and len(cands) < max_cands:
        tb = (ref_deltas or [1])[0]
        t = temporal_candidate(col, r, c, tb)
        if t is not None:
            cands.append((t, 0))     # appended WITHOUT pruning (8.5.3.2.1)
    zero_idx = 0
    while len(cands) < max_cands:
        ref = zero_idx if zero_idx < n_refs else 0
        cands.append(((0, 0), ref))
        zero_idx += 1
    return cands[:max_cands]


def amvp_candidates(grid: List[List[Optional[CUInfo]]], r: int, c: int,
                    target_ref: int = 0, ref_deltas=None, col=None
                    ) -> List[Tuple[int, int]]:
    """AMVP predictor list (2 entries) — spec 8.5.3.2.6 specialised to the
    uniform raster grid (A0 undecoded, no temporal candidate).

    ref_deltas: POC distances of the L0 references from the current
    picture (e.g. [1, 2]); None = single reference (no scaling paths).

    Derivation order (8.5.3.2.7): A = left (A1) — same-ref first, else
    scaled; isScaledFlag = left PU exists and is inter. B = first of
    B0/B1/B2 with the SAME reference; when isScaledFlag is 0, A takes B's
    value and B is re-derived over B0/B1/B2 with scaling. Prune equal
    pair, zero-fill to 2."""
    rows = len(grid)
    cols = len(grid[0])

    def inter_mi(rr, cc):
        if 0 <= rr < rows and 0 <= cc < cols:
            cu = grid[rr][cc]
            if cu is not None and not cu.is_intra:
                return (cu.mv, cu.ref)
        return None

    if ref_deltas is None:
        ref_deltas = [1]
    tb = ref_deltas[target_ref]

    a = inter_mi(r, c - 1)
    is_scaled = a is not None
    cand_a = None
    if a is not None:
        if a[1] == target_ref:
            cand_a = a[0]
        else:
            cand_a = _scale_mv(a[0], tb, ref_deltas[a[1]])

    bs = [inter_mi(rr, cc) for rr, cc in
          ((r - 1, c + 1), (r - 1, c), (r - 1, c - 1))]
    cand_b = None
    for mi in bs:
        if mi is not None and mi[1] == target_ref:
            cand_b = mi[0]
            break
    if not is_scaled:
        # A inherits B's same-ref candidate; B re-derives with scaling
        cand_a = cand_b
        cand_b = None
        for mi in bs:
            if mi is not None:
                cand_b = (mi[0] if mi[1] == target_ref
                          else _scale_mv(mi[0], tb, ref_deltas[mi[1]]))
                break

    out: List[Tuple[int, int]] = []
    if cand_a is not None:
        out.append(cand_a)
    if cand_b is not None and cand_b != cand_a:
        out.append(cand_b)
    if len(out) < 2 and col is not None:
        # temporal AMVP candidate, scaled to the target reference
        # (8.5.3.2.6: appended when fewer than 2 spatial candidates,
        # no pruning against them)
        t = temporal_candidate(col, r, c, tb)
        if t is not None:
            out.append(t)
    while len(out) < 2:
        out.append((0, 0))
    return out[:2]


def encode_ref_idx(enc: CabacEncoder, ref: int, n_refs: int):
    """ref_idx_l0 (spec 9.3.3.x truncated-rice): first two bins
    context-coded (CTX ref_idx +0, +1), rest bypass."""
    if n_refs <= 1:
        return
    enc.encode_bin(1 if ref > 0 else 0, CTX["ref_idx"])
    if ref > 0 and n_refs > 2:
        enc.encode_bin(1 if ref > 1 else 0, CTX["ref_idx"] + 1)
        for i in range(2, ref):
            enc.encode_bin_ep(1)
        if 2 <= ref < n_refs - 1:
            enc.encode_bin_ep(0)


def decode_ref_idx(dec: CabacDecoder, n_refs: int) -> int:
    if n_refs <= 1:
        return 0
    if not dec.decode_bin(CTX["ref_idx"]):
        return 0
    if n_refs == 2:
        return 1
    if not dec.decode_bin(CTX["ref_idx"] + 1):
        return 1
    ref = 2
    while ref < n_refs - 1 and dec.decode_bin_ep():
        ref += 1
    return ref


# ---------------------------------------------------------------------------
# bin coding
# ---------------------------------------------------------------------------

def encode_merge_idx(enc: CabacEncoder, idx: int, max_cands: int):
    if max_cands <= 1:
        return
    enc.encode_bin(1 if idx > 0 else 0, CTX["merge_idx"])
    if idx > 0:
        for i in range(1, idx):
            enc.encode_bin_ep(1)
        if idx < max_cands - 1:
            enc.encode_bin_ep(0)


def decode_merge_idx(dec: CabacDecoder, max_cands: int) -> int:
    if max_cands <= 1:
        return 0
    if not dec.decode_bin(CTX["merge_idx"]):
        return 0
    idx = 1
    while idx < max_cands - 1 and dec.decode_bin_ep():
        idx += 1
    return idx


def encode_mvd(enc: CabacEncoder, mvd_x: int, mvd_y: int):
    """Spec 7.3.8.9 mvd_coding."""
    gx0, gy0 = abs(mvd_x) > 0, abs(mvd_y) > 0
    enc.encode_bin(1 if gx0 else 0, CTX["mvd"])
    enc.encode_bin(1 if gy0 else 0, CTX["mvd"])
    if gx0:
        enc.encode_bin(1 if abs(mvd_x) > 1 else 0, CTX["mvd"] + 1)
    if gy0:
        enc.encode_bin(1 if abs(mvd_y) > 1 else 0, CTX["mvd"] + 1)
    for v in (mvd_x, mvd_y):
        if abs(v) > 0:
            if abs(v) > 1:
                _write_eg1(enc, abs(v) - 2)
            enc.encode_bin_ep(1 if v < 0 else 0)


def decode_mvd(dec: CabacDecoder) -> Tuple[int, int]:
    gx0 = dec.decode_bin(CTX["mvd"])
    gy0 = dec.decode_bin(CTX["mvd"])
    gx1 = dec.decode_bin(CTX["mvd"] + 1) if gx0 else 0
    gy1 = dec.decode_bin(CTX["mvd"] + 1) if gy0 else 0
    out = []
    for g0, g1 in ((gx0, gx1), (gy0, gy1)):
        if not g0:
            out.append(0)
            continue
        mag = 1
        if g1:
            mag = 2 + _read_eg1(dec)
        sign = dec.decode_bin_ep()
        out.append(-mag if sign else mag)
    return out[0], out[1]


def _write_eg1(enc: CabacEncoder, value: int):
    """1st-order Exp-Golomb, bypass (spec 9.3.3.3)."""
    k = 1
    while value >= (1 << k):
        enc.encode_bin_ep(1)
        value -= 1 << k
        k += 1
    enc.encode_bin_ep(0)
    enc.encode_bins_ep(value, k)


def _read_eg1(dec: CabacDecoder) -> int:
    k = 1
    base = 0
    while dec.decode_bin_ep():
        base += 1 << k
        k += 1
    return base + dec.decode_bins_ep(k)


@dataclass
class InterCTUDecision:
    """Signaling decision for one CU in a P slice (uniform grid)."""
    is_intra: bool
    intra_mode: int = DC_MODE
    mv: Tuple[int, int] = (0, 0)
    merge_idx: int = -1            # >= 0: merge mode with this index
    mvp_flag: int = 0              # AMVP predictor choice when not merge
    mvd: Tuple[int, int] = (0, 0)
    ref: int = 0                   # L0 reference index
    luma_levels: Optional[np.ndarray] = None
    cb_levels: Optional[np.ndarray] = None
    cr_levels: Optional[np.ndarray] = None

    @property
    def has_residual(self) -> bool:
        return (np.any(self.luma_levels) or np.any(self.cb_levels)
                or np.any(self.cr_levels))


def skip_ctx(grid: List[List[Optional[CUInfo]]], r: int, c: int) -> int:
    left = grid[r][c - 1] if c > 0 else None
    above = grid[r - 1][c] if r > 0 else None
    return (1 if (left is not None and left.skip) else 0) + \
           (1 if (above is not None and above.skip) else 0)


def encode_inter_ctu(enc: CabacEncoder, d: InterCTUDecision,
                     grid: List[List[Optional[CUInfo]]], r: int, c: int,
                     log2_cu: int, max_merge: int, sign_hiding: bool = False,
                     cu_qp_delta=None, n_refs: int = 1, col=None,
                     ref_deltas=None):
    """coding_unit() for a P slice, uniform 2Nx2N grid. cu_qp_delta: int to
    signal (only coded when the CU has a coded cbf — spec transform_unit).
    n_refs: active L0 references (ref_idx coded when > 1); col: collocated
    motion field when TMVP is enabled."""
    is_skip = (not d.is_intra and d.merge_idx >= 0 and not d.has_residual)
    enc.encode_bin(1 if is_skip else 0, CTX["skip"] + skip_ctx(grid, r, c))
    if is_skip:
        encode_merge_idx(enc, d.merge_idx, max_merge)
        grid[r][c] = CUInfo(False, d.mv, skip=True, ref=d.ref)
        return
    enc.encode_bin(0 if not d.is_intra else 1, CTX["pred_mode"])
    if d.is_intra:
        # part_mode 2Nx2N for intra in P slice (CU == minCB so coded)
        enc.encode_bin(1, CTX["part_size"])
        cand_left = grid[r][c - 1] if c > 0 else None
        cl = cand_left.intra_mode if (cand_left is not None and cand_left.is_intra) else DC_MODE
        mpm = derive_mpm(cl, DC_MODE)
        encode_intra_luma_mode(enc, d.intra_mode, mpm)
        enc.encode_bin(0, CTX["intra_chroma"])       # DM chroma
        cbf_cb = 1 if np.any(d.cb_levels) else 0
        cbf_cr = 1 if np.any(d.cr_levels) else 0
        enc.encode_bin(cbf_cb, CTX["qt_cbf"] + 2)
        enc.encode_bin(cbf_cr, CTX["qt_cbf"] + 2)
        cbf_y = 1 if np.any(d.luma_levels) else 0
        enc.encode_bin(cbf_y, CTX["qt_cbf"] + 1)
        if cu_qp_delta is not None and (cbf_y or cbf_cb or cbf_cr):
            encode_cu_qp_delta(enc, cu_qp_delta)
        if cbf_y:
            encode_residual(enc, d.luma_levels, log2_cu, True, d.intra_mode,
                            sign_hiding)
        if cbf_cb:
            encode_residual(enc, d.cb_levels, log2_cu - 1, False, d.intra_mode,
                            sign_hiding)
        if cbf_cr:
            encode_residual(enc, d.cr_levels, log2_cu - 1, False, d.intra_mode,
                            sign_hiding)
        grid[r][c] = CUInfo(True, (0, 0), d.intra_mode)
        return

    # inter, 2Nx2N: part_mode bin '1' (ctx 0)
    enc.encode_bin(1, CTX["part_size"])
    if d.merge_idx >= 0:
        enc.encode_bin(1, CTX["merge_flag"])
        encode_merge_idx(enc, d.merge_idx, max_merge)
        # rqt_root_cbf NOT coded for 2Nx2N merge (spec 7.3.8.5): inferred 1,
        # which is why residual-less merge must be coded as skip
        rqt_root_cbf = 1
        assert d.has_residual, "2Nx2N merge without residual must be skip"
    else:
        enc.encode_bin(0, CTX["merge_flag"])
        # P slice: no inter_pred_idc; ref_idx_l0 coded when active refs > 1
        encode_ref_idx(enc, d.ref, n_refs)
        encode_mvd(enc, d.mvd[0], d.mvd[1])
        enc.encode_bin(d.mvp_flag, CTX["mvp_idx"])
        rqt_root_cbf = 1 if d.has_residual else 0
        enc.encode_bin(rqt_root_cbf, CTX["qt_root_cbf"])
    if rqt_root_cbf:
        cbf_cb = 1 if np.any(d.cb_levels) else 0
        cbf_cr = 1 if np.any(d.cr_levels) else 0
        enc.encode_bin(cbf_cb, CTX["qt_cbf"] + 2)
        enc.encode_bin(cbf_cr, CTX["qt_cbf"] + 2)
        cbf_y = 1 if np.any(d.luma_levels) else 0
        if cbf_cb or cbf_cr:
            enc.encode_bin(cbf_y, CTX["qt_cbf"] + 1)
        else:
            assert cbf_y, "rqt_root_cbf=1 with no coded cbf"
        if cu_qp_delta is not None and (cbf_y or cbf_cb or cbf_cr):
            encode_cu_qp_delta(enc, cu_qp_delta)
        if cbf_y:
            encode_residual(enc, d.luma_levels, log2_cu, True, -1, sign_hiding)
        if cbf_cb:
            encode_residual(enc, d.cb_levels, log2_cu - 1, False, -1, sign_hiding)
        if cbf_cr:
            encode_residual(enc, d.cr_levels, log2_cu - 1, False, -1, sign_hiding)
    grid[r][c] = CUInfo(False, d.mv, skip=False, ref=d.ref)


def decode_inter_ctu(dec: CabacDecoder, grid: List[List[Optional[CUInfo]]],
                     r: int, c: int, log2_cu: int, max_merge: int,
                     sign_hiding: bool = False, n_refs: int = 1,
                     ref_deltas=None, col=None):
    """Decoder mirror; returns (CUInfo, luma, cb, cr level arrays)."""
    n = 1 << log2_cu
    nc = n // 2
    z = lambda k: np.zeros((k, k), np.int32)
    if dec.decode_bin(CTX["skip"] + skip_ctx(grid, r, c)):
        idx = decode_merge_idx(dec, max_merge)
        cands = merge_candidates_ref(grid, r, c, max_merge, n_refs,
                                     col=col, ref_deltas=ref_deltas)
        cu = CUInfo(False, cands[idx][0], skip=True, ref=cands[idx][1])
        grid[r][c] = cu
        return cu, z(n), z(nc), z(nc)
    if dec.decode_bin(CTX["pred_mode"]):
        # intra
        part = dec.decode_bin(CTX["part_size"])
        assert part == 1
        left = grid[r][c - 1] if c > 0 else None
        cl = left.intra_mode if (left is not None and left.is_intra) else DC_MODE
        mpm = derive_mpm(cl, DC_MODE)
        mode = decode_intra_luma_mode(dec, mpm)
        cmode = decode_intra_chroma_mode(dec, mode)
        cbf_cb = dec.decode_bin(CTX["qt_cbf"] + 2)
        cbf_cr = dec.decode_bin(CTX["qt_cbf"] + 2)
        cbf_y = dec.decode_bin(CTX["qt_cbf"] + 1)
        ly = decode_residual(dec, log2_cu, True, mode, sign_hiding) if cbf_y else z(n)
        cb = decode_residual(dec, log2_cu - 1, False, cmode, sign_hiding) if cbf_cb else z(nc)
        cr = decode_residual(dec, log2_cu - 1, False, cmode, sign_hiding) if cbf_cr else z(nc)
        cu = CUInfo(True, (0, 0), mode)
        grid[r][c] = cu
        return cu, ly, cb, cr
    part = dec.decode_bin(CTX["part_size"])
    assert part == 1
    if dec.decode_bin(CTX["merge_flag"]):
        idx = decode_merge_idx(dec, max_merge)
        cands = merge_candidates_ref(grid, r, c, max_merge, n_refs,
                                     col=col, ref_deltas=ref_deltas)
        mv, ref = cands[idx]
        rqt_root_cbf = 1           # inferred for 2Nx2N merge
    else:
        ref = decode_ref_idx(dec, n_refs)
        mvd = decode_mvd(dec)
        mvp = dec.decode_bin(CTX["mvp_idx"])
        preds = amvp_candidates(grid, r, c, target_ref=ref,
                                ref_deltas=ref_deltas, col=col)
        mv = (preds[mvp][0] + mvd[0], preds[mvp][1] + mvd[1])
        rqt_root_cbf = dec.decode_bin(CTX["qt_root_cbf"])
    ly, cb, cr = z(n), z(nc), z(nc)
    if rqt_root_cbf:
        cbf_cb = dec.decode_bin(CTX["qt_cbf"] + 2)
        cbf_cr = dec.decode_bin(CTX["qt_cbf"] + 2)
        cbf_y = dec.decode_bin(CTX["qt_cbf"] + 1) if (cbf_cb or cbf_cr) else 1
        if cbf_y:
            ly = decode_residual(dec, log2_cu, True, -1, sign_hiding)
        if cbf_cb:
            cb = decode_residual(dec, log2_cu - 1, False, -1, sign_hiding)
        if cbf_cr:
            cr = decode_residual(dec, log2_cu - 1, False, -1, sign_hiding)
    cu = CUInfo(False, mv, skip=False, ref=ref)
    grid[r][c] = cu
    return cu, ly, cb, cr


# ---------------------------------------------------------------------------
# B-slice extensions: bi-directional motion (dir 1=L0, 2=L1, 3=BI), merge
# with full-motion copy, AMVP with POC scaling (spec 8.5.3.2.7), and the
# B coding_unit syntax (inter_pred_idc etc.). Uniform 2Nx2N grid; one
# reference per list; TMVP off.
# ---------------------------------------------------------------------------

@dataclass
class BMotion:
    dir: int = 1                       # 1=L0, 2=L1, 3=BI
    mv0: Tuple[int, int] = (0, 0)
    mv1: Tuple[int, int] = (0, 0)

    def key(self):
        return (self.dir,
                self.mv0 if self.dir & 1 else None,
                self.mv1 if self.dir & 2 else None)


@dataclass
class BCUState:
    is_intra: bool
    motion: Optional[BMotion] = None
    intra_mode: int = DC_MODE
    skip: bool = False


def merge_candidates_b(grid, r, c, max_cands) -> List[BMotion]:
    rows, cols = len(grid), len(grid[0])

    def nb(rr, cc):
        if 0 <= rr < rows and 0 <= cc < cols:
            s = grid[rr][cc]
            if s is not None and not s.is_intra:
                return s.motion
        return None

    a1 = nb(r, c - 1)
    b1 = nb(r - 1, c)
    b0 = nb(r - 1, c + 1)
    b2 = nb(r - 1, c - 1)
    cands: List[BMotion] = []
    if a1 is not None:
        cands.append(a1)
    if b1 is not None and (a1 is None or b1.key() != a1.key()):
        cands.append(b1)
    if b0 is not None and (b1 is None or b0.key() != b1.key()):
        cands.append(b0)
    if len(cands) < 4 and b2 is not None and \
            (a1 is None or b2.key() != a1.key()) and \
            (b1 is None or b2.key() != b1.key()):
        cands.append(b2)
    # combined bi-predictive candidates (spec 8.5.3.2.3): ordered index pairs
    # in priority order, L0 motion of one spatial candidate + L1 of another.
    # Our L0/L1 reference pictures always differ (different POCs), so the
    # "different picture or different MV" condition is always met. Not pruned.
    n_orig = len(cands)
    PAIRS = ((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1),
             (0, 3), (3, 0), (1, 3), (3, 1), (2, 3), (3, 2))
    for i, j in PAIRS[:n_orig * (n_orig - 1)]:
        if len(cands) >= max_cands:
            break
        if (cands[i].dir & 1) and (cands[j].dir & 2):
            cands.append(BMotion(3, cands[i].mv0, cands[j].mv1))
    while len(cands) < max_cands:
        cands.append(BMotion(3, (0, 0), (0, 0)))   # bi zero fill (B slice)
    return cands[:max_cands]


def _scale_mv(mv, tb, td):
    """Spec 8.5.3.2.7 POC-distance motion scaling."""
    tx = (16384 + (abs(td) >> 1)) // td if td > 0 else -((16384 + (abs(td) >> 1)) // -td)
    dsf = min(max((tb * tx + 32) >> 6, -4096), 4095)
    def s(v):
        val = dsf * v
        sign = 1 if val >= 0 else -1
        return min(max(sign * ((abs(val) + 127) >> 8), -32768), 32767)
    return (s(mv[0]), s(mv[1]))


def amvp_candidates_b(grid, r, c, lx: int, poc_cur: int, poc_l0: int,
                      poc_l1: int) -> List[Tuple[int, int]]:
    """AMVP for list lx (0/1). Single ref per list; A0 undecoded; TMVP off.
    Implements the no-scale checks then the scaled fallback with the
    isScaledFlag rule (scaled B only when the left is unavailable)."""
    rows, cols = len(grid), len(grid[0])
    poc_target = poc_l0 if lx == 0 else poc_l1

    def nb(rr, cc):
        if 0 <= rr < rows and 0 <= cc < cols:
            s = grid[rr][cc]
            if s is not None and not s.is_intra:
                return s.motion
        return None

    def mv_of(m: BMotion, which: int):
        return m.mv0 if which == 0 else m.mv1

    def poc_of_list(which: int):
        return poc_l0 if which == 0 else poc_l1

    def noscale(m: BMotion):
        # 1) same list, same ref; 2) other list with same target POC
        if m.dir & (1 << lx):
            return mv_of(m, lx)
        oy = 1 - lx
        if (m.dir & (1 << oy)) and poc_of_list(oy) == poc_target:
            return mv_of(m, oy)
        return None

    def scaled(m: BMotion):
        # prefer same list, else the other list; scale by POC distances
        for which in (lx, 1 - lx):
            if m.dir & (1 << which):
                tb = poc_cur - poc_target
                td = poc_cur - poc_of_list(which)
                if td == 0:
                    return None
                if tb == td:
                    return mv_of(m, which)
                return _scale_mv(mv_of(m, which), tb, td)
        return None

    # Left slot: no-scale then scaled from A1 (A0 is undecoded in raster
    # order). If neither exists, the above no-scale candidate takes the first
    # slot and a SECOND, independently scaled above candidate fills slot two
    # (spec: when isScaledFlagLX == 0, mvpLXA := mvpLXB and the B candidate
    # is re-derived with scaling; reference getPMV's bAddedSmvp gate).
    a1 = nb(r, c - 1)
    cand_a = None
    if a1 is not None:
        cand_a = noscale(a1)
        if cand_a is None:
            cand_a = scaled(a1)
    left_added = cand_a is not None

    ABOVE = ((r - 1, c + 1), (r - 1, c), (r - 1, c - 1))   # B0, B1, B2
    out = []
    if left_added:
        out.append(cand_a)
    for rr, cc in ABOVE:                 # direct (no-scale) above candidate
        m = nb(rr, cc)
        if m is not None:
            v = noscale(m)
            if v is not None:
                out.append(v)
                break
    if not left_added and len(out) < 2:  # indirect (scaled) above candidate
        for rr, cc in ABOVE:
            m = nb(rr, cc)
            if m is not None:
                v = scaled(m)
                if v is not None:
                    out.append(v)
                    break
    if len(out) == 2 and out[0] == out[1]:
        out.pop()
    while len(out) < 2:
        out.append((0, 0))
    return out[:2]


@dataclass
class BCTUDecision:
    is_intra: bool
    intra_mode: int = DC_MODE
    motion: Optional[BMotion] = None
    merge_idx: int = -1
    mvp_flag0: int = 0
    mvp_flag1: int = 0
    mvd0: Tuple[int, int] = (0, 0)
    mvd1: Tuple[int, int] = (0, 0)
    luma_levels: Optional[np.ndarray] = None
    cb_levels: Optional[np.ndarray] = None
    cr_levels: Optional[np.ndarray] = None

    @property
    def has_residual(self) -> bool:
        return (np.any(self.luma_levels) or np.any(self.cb_levels)
                or np.any(self.cr_levels))


def _skip_ctx_b(grid, r, c):
    left = grid[r][c - 1] if c > 0 else None
    above = grid[r - 1][c] if r > 0 else None
    return (1 if (left is not None and left.skip) else 0) + \
           (1 if (above is not None and above.skip) else 0)


def encode_b_ctu(enc: CabacEncoder, d: BCTUDecision, grid, r, c,
                 log2_cu: int, max_merge: int, sign_hiding: bool = False,
                 cu_qp_delta=None):
    is_skip = (not d.is_intra and d.merge_idx >= 0 and not d.has_residual)
    enc.encode_bin(1 if is_skip else 0, CTX["skip"] + _skip_ctx_b(grid, r, c))
    if is_skip:
        encode_merge_idx(enc, d.merge_idx, max_merge)
        grid[r][c] = BCUState(False, d.motion, skip=True)
        return
    enc.encode_bin(1 if d.is_intra else 0, CTX["pred_mode"])
    if d.is_intra:
        enc.encode_bin(1, CTX["part_size"])
        left = grid[r][c - 1] if c > 0 else None
        cl = left.intra_mode if (left is not None and left.is_intra) else DC_MODE
        mpm = derive_mpm(cl, DC_MODE)
        encode_intra_luma_mode(enc, d.intra_mode, mpm)
        enc.encode_bin(0, CTX["intra_chroma"])
        cbf_cb = 1 if np.any(d.cb_levels) else 0
        cbf_cr = 1 if np.any(d.cr_levels) else 0
        cbf_y = 1 if np.any(d.luma_levels) else 0
        enc.encode_bin(cbf_cb, CTX["qt_cbf"] + 2)
        enc.encode_bin(cbf_cr, CTX["qt_cbf"] + 2)
        enc.encode_bin(cbf_y, CTX["qt_cbf"] + 1)
        if cu_qp_delta is not None and (cbf_y or cbf_cb or cbf_cr):
            encode_cu_qp_delta(enc, cu_qp_delta)
        if cbf_y:
            encode_residual(enc, d.luma_levels, log2_cu, True, d.intra_mode, sign_hiding)
        if cbf_cb:
            encode_residual(enc, d.cb_levels, log2_cu - 1, False, d.intra_mode, sign_hiding)
        if cbf_cr:
            encode_residual(enc, d.cr_levels, log2_cu - 1, False, d.intra_mode, sign_hiding)
        grid[r][c] = BCUState(True, None, d.intra_mode)
        return

    enc.encode_bin(1, CTX["part_size"])       # 2Nx2N
    if d.merge_idx >= 0:
        enc.encode_bin(1, CTX["merge_flag"])
        encode_merge_idx(enc, d.merge_idx, max_merge)
        rqt = 1
        assert d.has_residual, "residual-less merge must be skip"
    else:
        enc.encode_bin(0, CTX["merge_flag"])
        m = d.motion
        # inter_pred_idc: bin0 (ctx depth 0) = BI?; else bin1 (ctx 4) = L1?
        enc.encode_bin(1 if m.dir == 3 else 0, CTX["inter_dir"] + 0)
        if m.dir != 3:
            enc.encode_bin(0 if m.dir == 1 else 1, CTX["inter_dir"] + 4)
        if m.dir & 1:
            encode_mvd(enc, d.mvd0[0], d.mvd0[1])
            enc.encode_bin(d.mvp_flag0, CTX["mvp_idx"])
        if m.dir & 2:
            encode_mvd(enc, d.mvd1[0], d.mvd1[1])
            enc.encode_bin(d.mvp_flag1, CTX["mvp_idx"])
        rqt = 1 if d.has_residual else 0
        enc.encode_bin(rqt, CTX["qt_root_cbf"])
    if rqt:
        cbf_cb = 1 if np.any(d.cb_levels) else 0
        cbf_cr = 1 if np.any(d.cr_levels) else 0
        cbf_y = 1 if np.any(d.luma_levels) else 0
        enc.encode_bin(cbf_cb, CTX["qt_cbf"] + 2)
        enc.encode_bin(cbf_cr, CTX["qt_cbf"] + 2)
        if cbf_cb or cbf_cr:
            enc.encode_bin(cbf_y, CTX["qt_cbf"] + 1)
        else:
            assert cbf_y
        if cu_qp_delta is not None and (cbf_y or cbf_cb or cbf_cr):
            encode_cu_qp_delta(enc, cu_qp_delta)
        if cbf_y:
            encode_residual(enc, d.luma_levels, log2_cu, True, -1, sign_hiding)
        if cbf_cb:
            encode_residual(enc, d.cb_levels, log2_cu - 1, False, -1, sign_hiding)
        if cbf_cr:
            encode_residual(enc, d.cr_levels, log2_cu - 1, False, -1, sign_hiding)
    grid[r][c] = BCUState(False, d.motion, skip=False)


def decode_b_ctu(dec: CabacDecoder, grid, r, c, log2_cu: int, max_merge: int,
                 poc_cur: int, poc_l0: int, poc_l1: int,
                 sign_hiding: bool = False):
    n = 1 << log2_cu
    nc = n // 2
    z = lambda k: np.zeros((k, k), np.int32)
    if dec.decode_bin(CTX["skip"] + _skip_ctx_b(grid, r, c)):
        idx = decode_merge_idx(dec, max_merge)
        cands = merge_candidates_b(grid, r, c, max_merge)
        cu = BCUState(False, cands[idx], skip=True)
        grid[r][c] = cu
        return cu, z(n), z(nc), z(nc)
    if dec.decode_bin(CTX["pred_mode"]):
        part = dec.decode_bin(CTX["part_size"])
        assert part == 1
        left = grid[r][c - 1] if c > 0 else None
        cl = left.intra_mode if (left is not None and left.is_intra) else DC_MODE
        mpm = derive_mpm(cl, DC_MODE)
        mode = decode_intra_luma_mode(dec, mpm)
        cmode = decode_intra_chroma_mode(dec, mode)
        cbf_cb = dec.decode_bin(CTX["qt_cbf"] + 2)
        cbf_cr = dec.decode_bin(CTX["qt_cbf"] + 2)
        cbf_y = dec.decode_bin(CTX["qt_cbf"] + 1)
        ly = decode_residual(dec, log2_cu, True, mode, sign_hiding) if cbf_y else z(n)
        cb = decode_residual(dec, log2_cu - 1, False, cmode, sign_hiding) if cbf_cb else z(nc)
        cr = decode_residual(dec, log2_cu - 1, False, cmode, sign_hiding) if cbf_cr else z(nc)
        cu = BCUState(True, None, mode)
        grid[r][c] = cu
        return cu, ly, cb, cr
    part = dec.decode_bin(CTX["part_size"])
    assert part == 1
    if dec.decode_bin(CTX["merge_flag"]):
        idx = decode_merge_idx(dec, max_merge)
        cands = merge_candidates_b(grid, r, c, max_merge)
        motion = cands[idx]
        rqt = 1
    else:
        if dec.decode_bin(CTX["inter_dir"] + 0):
            dirv = 3
        else:
            dirv = 2 if dec.decode_bin(CTX["inter_dir"] + 4) else 1
        mv0 = mv1 = (0, 0)
        if dirv & 1:
            mvd = decode_mvd(dec)
            f = dec.decode_bin(CTX["mvp_idx"])
            preds = amvp_candidates_b(grid, r, c, 0, poc_cur, poc_l0, poc_l1)
            mv0 = (preds[f][0] + mvd[0], preds[f][1] + mvd[1])
        if dirv & 2:
            mvd = decode_mvd(dec)
            f = dec.decode_bin(CTX["mvp_idx"])
            preds = amvp_candidates_b(grid, r, c, 1, poc_cur, poc_l0, poc_l1)
            mv1 = (preds[f][0] + mvd[0], preds[f][1] + mvd[1])
        motion = BMotion(dirv, mv0, mv1)
        rqt = dec.decode_bin(CTX["qt_root_cbf"])
    ly, cb, cr = z(n), z(nc), z(nc)
    if rqt:
        cbf_cb = dec.decode_bin(CTX["qt_cbf"] + 2)
        cbf_cr = dec.decode_bin(CTX["qt_cbf"] + 2)
        cbf_y = dec.decode_bin(CTX["qt_cbf"] + 1) if (cbf_cb or cbf_cr) else 1
        if cbf_y:
            ly = decode_residual(dec, log2_cu, True, -1, sign_hiding)
        if cbf_cb:
            cb = decode_residual(dec, log2_cu - 1, False, -1, sign_hiding)
        if cbf_cr:
            cr = decode_residual(dec, log2_cu - 1, False, -1, sign_hiding)
    cu = BCUState(False, motion, skip=False)
    grid[r][c] = cu
    return cu, ly, cb, cr


# ---------------------------------------------------------------------------
# Quadtree P slices: position-based candidate derivation on a 16-pel-granular
# cell grid (spec 8.5.3.2.3 / 8.5.3.2.6 at true neighbor positions — with
# mixed CU sizes the CU-granular shortcuts above no longer coincide with the
# spec positions). Cells hold decoded-CU state; s = CU size in cells (1=16px,
# 2=32px).
# ---------------------------------------------------------------------------

def _cell_mv(cells, yy, xx):
    if 0 <= yy < len(cells) and 0 <= xx < len(cells[0]):
        cu = cells[yy][xx]
        if cu is not None and not cu.is_intra:
            return cu.mv
    return None


def merge_candidates_pos(cells, gy: int, gx: int, s: int,
                         max_cands: int) -> List[Tuple[int, int]]:
    """Spatial merge list at spec positions: A1, B1, B0, A0, B2 (B2 only
    when fewer than 4 precede), pairwise pruning, zero-MV fill. Single L0
    reference, TMVP off."""
    a1 = _cell_mv(cells, gy + s - 1, gx - 1)
    b1 = _cell_mv(cells, gy - 1, gx + s - 1)
    b0 = _cell_mv(cells, gy - 1, gx + s)
    a0 = _cell_mv(cells, gy + s, gx - 1)
    b2 = _cell_mv(cells, gy - 1, gx - 1)
    cands: List[Tuple[int, int]] = []
    if a1 is not None:
        cands.append(a1)
    if b1 is not None and b1 != a1:
        cands.append(b1)
    if b0 is not None and b0 != b1:
        cands.append(b0)
    if a0 is not None and a0 != a1:
        cands.append(a0)
    if len(cands) < 4 and b2 is not None and b2 != a1 and b2 != b1:
        cands.append(b2)
    while len(cands) < max_cands:
        cands.append((0, 0))
    return cands[:max_cands]


def amvp_candidates_pos(cells, gy: int, gx: int, s: int
                        ) -> List[Tuple[int, int]]:
    """AMVP list at spec positions: A = first of (A0, A1); B = first of
    (B0, B1, B2); dedupe; zero fill (single ref, no scaling, TMVP off)."""
    cand_a = None
    for yy, xx in ((gy + s, gx - 1), (gy + s - 1, gx - 1)):
        cand_a = _cell_mv(cells, yy, xx)
        if cand_a is not None:
            break
    cand_b = None
    for yy, xx in ((gy - 1, gx + s), (gy - 1, gx + s - 1), (gy - 1, gx - 1)):
        cand_b = _cell_mv(cells, yy, xx)
        if cand_b is not None:
            break
    out: List[Tuple[int, int]] = []
    if cand_a is not None:
        out.append(cand_a)
    if cand_b is not None and cand_b != cand_a:
        out.append(cand_b)
    while len(out) < 2:
        out.append((0, 0))
    return out[:2]


def skip_ctx_pos(cells, gy: int, gx: int) -> int:
    def sk(yy, xx):
        if 0 <= yy < len(cells) and 0 <= xx < len(cells[0]):
            cu = cells[yy][xx]
            return 1 if (cu is not None and cu.skip) else 0
        return 0
    return sk(gy, gx - 1) + sk(gy - 1, gx)


def _quad(a, q):
    h = a.shape[0] // 2
    qy, qx = divmod(q, 2)
    return a[qy * h:(qy + 1) * h, qx * h:(qx + 1) * h]


def code_inter_transform_tree(enc, lv_y, lv_cb, lv_cr, log2_cu: int,
                              sign_hiding: bool, cu_qp_delta,
                              tu_split: bool = False, max_tt: int = 0):
    """transform_tree + transform_unit for an inter 2Nx2N CU
    (spec 7.3.8.8/7.3.8.10). max_tt = max_transform_hierarchy_depth_inter:
    when >= 1 the split_transform_flag is CODED for every inter TU root in
    [MinTb+1, MaxTb], and tu_split=True codes the residual as 4 half-size
    TUs in z-order (the round-3 RQT path — estimateResidualQT analog,
    search.cpp:3178). Split levels live in quadrant layout in lv_*.
    Returns True if a cu_qp_delta was consumed."""
    cbf_cb0 = 1 if np.any(lv_cb) else 0
    cbf_cr0 = 1 if np.any(lv_cr) else 0
    if max_tt >= 1 and 2 < log2_cu <= 5:
        enc.encode_bin(1 if tu_split else 0,
                       CTX["trans_subdiv"] + 5 - log2_cu)
    enc.encode_bin(cbf_cb0, CTX["qt_cbf"] + 2)
    enc.encode_bin(cbf_cr0, CTX["qt_cbf"] + 2)
    sent_delta = False
    if not tu_split:
        cbf_y = 1 if np.any(lv_y) else 0
        if cbf_cb0 or cbf_cr0:
            enc.encode_bin(cbf_y, CTX["qt_cbf"] + 1)
        else:
            assert cbf_y, "rqt_root_cbf=1 with no coded cbf"
        if cu_qp_delta is not None and (cbf_y or cbf_cb0 or cbf_cr0):
            encode_cu_qp_delta(enc, cu_qp_delta)
            sent_delta = True
        if cbf_y:
            encode_residual(enc, lv_y, log2_cu, True, -1, sign_hiding)
        if cbf_cb0:
            encode_residual(enc, lv_cb, log2_cu - 1, False, -1, sign_hiding)
        if cbf_cr0:
            encode_residual(enc, lv_cr, log2_cu - 1, False, -1, sign_hiding)
        return sent_delta
    # split: 4 z-order sub-TUs at trafoDepth 1 (== MaxTrafoDepth: no
    # further split flags); chroma follows the luma split (4:2:0,
    # sub-TU chroma is log2_cu - 2 >= 2)
    for q in range(4):
        ly = _quad(lv_y, q)
        lcb = _quad(lv_cb, q)
        lcr = _quad(lv_cr, q)
        cbf_cb = 1 if (cbf_cb0 and np.any(lcb)) else 0
        cbf_cr = 1 if (cbf_cr0 and np.any(lcr)) else 0
        if cbf_cb0:
            enc.encode_bin(cbf_cb, CTX["qt_cbf"] + 2 + 1)
        if cbf_cr0:
            enc.encode_bin(cbf_cr, CTX["qt_cbf"] + 2 + 1)
        cbf_y = 1 if np.any(ly) else 0
        enc.encode_bin(cbf_y, CTX["qt_cbf"] + 0)     # trafoDepth != 0
        if (cu_qp_delta is not None and not sent_delta
                and (cbf_y or cbf_cb or cbf_cr)):
            encode_cu_qp_delta(enc, cu_qp_delta)
            sent_delta = True
        if cbf_y:
            encode_residual(enc, ly, log2_cu - 1, True, -1, sign_hiding)
        if cbf_cb:
            encode_residual(enc, lcb, log2_cu - 2, False, -1, sign_hiding)
        if cbf_cr:
            encode_residual(enc, lcr, log2_cu - 2, False, -1, sign_hiding)
    return sent_delta


def encode_inter_cu_qt(enc: CabacEncoder, d: InterCTUDecision, cells,
                       gy: int, gx: int, s: int, max_merge: int,
                       sign_hiding: bool = False, cu_qp_delta=None,
                       cell_px: int = 16, min_log2: int = 4,
                       tu_split: bool = False, max_tt: int = 0):
    """coding_unit() for a P slice at cell (gy, gx), size s cells
    (cell_px*s px). Mirrors encode_inter_ctu but with position-based
    contexts/candidates and size-dependent part_mode presence (intra
    part_mode only at min CB)."""
    log2_cu = (s * cell_px).bit_length() - 1
    is_skip = (not d.is_intra and d.merge_idx >= 0 and not d.has_residual)
    enc.encode_bin(1 if is_skip else 0,
                   CTX["skip"] + skip_ctx_pos(cells, gy, gx))
    def fill(cu):
        for yy in range(gy, gy + s):
            for xx in range(gx, gx + s):
                cells[yy][xx] = cu
    if is_skip:
        encode_merge_idx(enc, d.merge_idx, max_merge)
        fill(CUInfo(False, d.mv, skip=True))
        return
    enc.encode_bin(0 if not d.is_intra else 1, CTX["pred_mode"])
    if d.is_intra:
        if log2_cu == min_log2:          # part_mode only at min CB size
            enc.encode_bin(1, CTX["part_size"])
        left = cells[gy][gx - 1] if gx > 0 else None
        cl = left.intra_mode if (left is not None and left.is_intra) \
            else DC_MODE
        # above candidate: forced DC when outside the current CTB row
        if (gy % (32 // cell_px)) != 0:
            above = cells[gy - 1][gx]
            ca = above.intra_mode if (above is not None and above.is_intra) \
                else DC_MODE
        else:
            ca = DC_MODE
        mpm = derive_mpm(cl, ca)
        encode_intra_luma_mode(enc, d.intra_mode, mpm)
        enc.encode_bin(0, CTX["intra_chroma"])       # DM chroma
        cbf_cb = 1 if np.any(d.cb_levels) else 0
        cbf_cr = 1 if np.any(d.cr_levels) else 0
        enc.encode_bin(cbf_cb, CTX["qt_cbf"] + 2)
        enc.encode_bin(cbf_cr, CTX["qt_cbf"] + 2)
        cbf_y = 1 if np.any(d.luma_levels) else 0
        enc.encode_bin(cbf_y, CTX["qt_cbf"] + 1)
        if cu_qp_delta is not None and (cbf_y or cbf_cb or cbf_cr):
            encode_cu_qp_delta(enc, cu_qp_delta)
        if cbf_y:
            encode_residual(enc, d.luma_levels, log2_cu, True, d.intra_mode,
                            sign_hiding)
        if cbf_cb:
            encode_residual(enc, d.cb_levels, log2_cu - 1, False,
                            d.intra_mode, sign_hiding)
        if cbf_cr:
            encode_residual(enc, d.cr_levels, log2_cu - 1, False,
                            d.intra_mode, sign_hiding)
        fill(CUInfo(True, (0, 0), d.intra_mode))
        return

    enc.encode_bin(1, CTX["part_size"])              # inter 2Nx2N
    if d.merge_idx >= 0:
        enc.encode_bin(1, CTX["merge_flag"])
        encode_merge_idx(enc, d.merge_idx, max_merge)
        rqt_root_cbf = 1
        assert d.has_residual, "2Nx2N merge without residual must be skip"
    else:
        enc.encode_bin(0, CTX["merge_flag"])
        encode_mvd(enc, d.mvd[0], d.mvd[1])
        enc.encode_bin(d.mvp_flag, CTX["mvp_idx"])
        rqt_root_cbf = 1 if d.has_residual else 0
        enc.encode_bin(rqt_root_cbf, CTX["qt_root_cbf"])
    if rqt_root_cbf:
        code_inter_transform_tree(enc, d.luma_levels, d.cb_levels,
                                  d.cr_levels, log2_cu, sign_hiding,
                                  cu_qp_delta, tu_split=tu_split,
                                  max_tt=max_tt)
    fill(CUInfo(False, d.mv, skip=False))


# ---------------------------------------------------------------------------
# Quadtree B slices: position-based candidate derivation on the 16-pel cell
# grid (BCUState cells). Same spec positions as the P variants above, with
# B motion (two lists), combined-bi merge candidates and POC-scaled AMVP.
# ---------------------------------------------------------------------------

def _cell_bmotion(cells, yy, xx):
    if 0 <= yy < len(cells) and 0 <= xx < len(cells[0]):
        cu = cells[yy][xx]
        if cu is not None and not cu.is_intra:
            return cu.motion
    return None


def merge_candidates_b_pos(cells, gy: int, gx: int, s: int,
                           max_cands: int) -> List[BMotion]:
    a1 = _cell_bmotion(cells, gy + s - 1, gx - 1)
    b1 = _cell_bmotion(cells, gy - 1, gx + s - 1)
    b0 = _cell_bmotion(cells, gy - 1, gx + s)
    a0 = _cell_bmotion(cells, gy + s, gx - 1)
    b2 = _cell_bmotion(cells, gy - 1, gx - 1)
    cands: List[BMotion] = []
    if a1 is not None:
        cands.append(a1)
    if b1 is not None and (a1 is None or b1.key() != a1.key()):
        cands.append(b1)
    if b0 is not None and (b1 is None or b0.key() != b1.key()):
        cands.append(b0)
    if a0 is not None and (a1 is None or a0.key() != a1.key()):
        cands.append(a0)
    if len(cands) < 4 and b2 is not None and \
            (a1 is None or b2.key() != a1.key()) and \
            (b1 is None or b2.key() != b1.key()):
        cands.append(b2)
    n_orig = len(cands)
    PAIRS = ((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1),
             (0, 3), (3, 0), (1, 3), (3, 1), (2, 3), (3, 2))
    for i, j in PAIRS[:n_orig * (n_orig - 1)]:
        if len(cands) >= max_cands:
            break
        if (cands[i].dir & 1) and (cands[j].dir & 2):
            cands.append(BMotion(3, cands[i].mv0, cands[j].mv1))
    while len(cands) < max_cands:
        cands.append(BMotion(3, (0, 0), (0, 0)))
    return cands[:max_cands]


def amvp_candidates_b_pos(cells, gy: int, gx: int, s: int, lx: int,
                          poc_cur: int, poc_l0: int, poc_l1: int
                          ) -> List[Tuple[int, int]]:
    """AMVP for list lx at spec positions A0/A1 then B0/B1/B2, with the
    isScaledFlag rule (scaled above candidate only when no left neighbor
    exists at A0/A1; spec 8.5.3.2.6)."""
    poc_target = poc_l0 if lx == 0 else poc_l1

    def mv_of(m: BMotion, which: int):
        return m.mv0 if which == 0 else m.mv1

    def poc_of_list(which: int):
        return poc_l0 if which == 0 else poc_l1

    def noscale(m: BMotion):
        if m.dir & (1 << lx):
            return mv_of(m, lx)
        oy = 1 - lx
        if (m.dir & (1 << oy)) and poc_of_list(oy) == poc_target:
            return mv_of(m, oy)
        return None

    def scaled(m: BMotion):
        for which in (lx, 1 - lx):
            if m.dir & (1 << which):
                tb = poc_cur - poc_target
                td = poc_cur - poc_of_list(which)
                if td == 0:
                    return None
                if tb == td:
                    return mv_of(m, which)
                return _scale_mv(mv_of(m, which), tb, td)
        return None

    A_POS = ((gy + s, gx - 1), (gy + s - 1, gx - 1))          # A0, A1
    B_POS = ((gy - 1, gx + s), (gy - 1, gx + s - 1), (gy - 1, gx - 1))
    cand_a = None
    left_avail = False
    for yy, xx in A_POS:
        m = _cell_bmotion(cells, yy, xx)
        if m is not None:
            left_avail = True
            cand_a = noscale(m)
            if cand_a is not None:
                break
    if left_avail and cand_a is None:
        for yy, xx in A_POS:
            m = _cell_bmotion(cells, yy, xx)
            if m is not None:
                cand_a = scaled(m)
                if cand_a is not None:
                    break
    out = []
    if cand_a is not None:
        out.append(cand_a)
    for yy, xx in B_POS:
        m = _cell_bmotion(cells, yy, xx)
        if m is not None:
            v = noscale(m)
            if v is not None:
                out.append(v)
                break
    if not left_avail and len(out) < 2:
        for yy, xx in B_POS:
            m = _cell_bmotion(cells, yy, xx)
            if m is not None:
                v = scaled(m)
                if v is not None:
                    out.append(v)
                    break
    if len(out) == 2 and out[0] == out[1]:
        out.pop()
    while len(out) < 2:
        out.append((0, 0))
    return out[:2]


def _skip_ctx_pos_b(cells, gy, gx):
    def sk(yy, xx):
        if 0 <= yy < len(cells) and 0 <= xx < len(cells[0]):
            cu = cells[yy][xx]
            return 1 if (cu is not None and cu.skip) else 0
        return 0
    return sk(gy, gx - 1) + sk(gy - 1, gx)


def encode_b_cu_qt(enc: CabacEncoder, d: BCTUDecision, cells,
                   gy: int, gx: int, s: int, max_merge: int,
                   sign_hiding: bool = False, cu_qp_delta=None,
                   cell_px: int = 16, min_log2: int = 4,
                   tu_split: bool = False, max_tt: int = 0):
    """coding_unit() for a B slice at cell (gy, gx), size s cells."""
    log2_cu = (s * cell_px).bit_length() - 1
    is_skip = (not d.is_intra and d.merge_idx >= 0 and not d.has_residual)
    enc.encode_bin(1 if is_skip else 0,
                   CTX["skip"] + _skip_ctx_pos_b(cells, gy, gx))

    def fill(cu):
        for yy in range(gy, gy + s):
            for xx in range(gx, gx + s):
                cells[yy][xx] = cu
    if is_skip:
        encode_merge_idx(enc, d.merge_idx, max_merge)
        fill(BCUState(False, d.motion, skip=True))
        return
    enc.encode_bin(1 if d.is_intra else 0, CTX["pred_mode"])
    if d.is_intra:
        if log2_cu == min_log2:
            enc.encode_bin(1, CTX["part_size"])
        left = cells[gy][gx - 1] if gx > 0 else None
        cl = left.intra_mode if (left is not None and left.is_intra) \
            else DC_MODE
        if (gy % (32 // cell_px)) != 0:
            above = cells[gy - 1][gx]
            ca = above.intra_mode if (above is not None and above.is_intra) \
                else DC_MODE
        else:
            ca = DC_MODE
        mpm = derive_mpm(cl, ca)
        encode_intra_luma_mode(enc, d.intra_mode, mpm)
        enc.encode_bin(0, CTX["intra_chroma"])
        cbf_cb = 1 if np.any(d.cb_levels) else 0
        cbf_cr = 1 if np.any(d.cr_levels) else 0
        cbf_y = 1 if np.any(d.luma_levels) else 0
        enc.encode_bin(cbf_cb, CTX["qt_cbf"] + 2)
        enc.encode_bin(cbf_cr, CTX["qt_cbf"] + 2)
        enc.encode_bin(cbf_y, CTX["qt_cbf"] + 1)
        if cu_qp_delta is not None and (cbf_y or cbf_cb or cbf_cr):
            encode_cu_qp_delta(enc, cu_qp_delta)
        if cbf_y:
            encode_residual(enc, d.luma_levels, log2_cu, True, d.intra_mode,
                            sign_hiding)
        if cbf_cb:
            encode_residual(enc, d.cb_levels, log2_cu - 1, False,
                            d.intra_mode, sign_hiding)
        if cbf_cr:
            encode_residual(enc, d.cr_levels, log2_cu - 1, False,
                            d.intra_mode, sign_hiding)
        fill(BCUState(True, None, d.intra_mode))
        return

    enc.encode_bin(1, CTX["part_size"])
    if d.merge_idx >= 0:
        enc.encode_bin(1, CTX["merge_flag"])
        encode_merge_idx(enc, d.merge_idx, max_merge)
        rqt = 1
        assert d.has_residual, "residual-less merge must be skip"
    else:
        enc.encode_bin(0, CTX["merge_flag"])
        m = d.motion
        # inter_pred_idc ctx: bin0 uses CtDepth
        depth_ctx = 5 - log2_cu
        enc.encode_bin(1 if m.dir == 3 else 0, CTX["inter_dir"] + depth_ctx)
        if m.dir != 3:
            enc.encode_bin(0 if m.dir == 1 else 1, CTX["inter_dir"] + 4)
        if m.dir & 1:
            encode_mvd(enc, d.mvd0[0], d.mvd0[1])
            enc.encode_bin(d.mvp_flag0, CTX["mvp_idx"])
        if m.dir & 2:
            encode_mvd(enc, d.mvd1[0], d.mvd1[1])
            enc.encode_bin(d.mvp_flag1, CTX["mvp_idx"])
        rqt = 1 if d.has_residual else 0
        enc.encode_bin(rqt, CTX["qt_root_cbf"])
    if rqt:
        code_inter_transform_tree(enc, d.luma_levels, d.cb_levels,
                                  d.cr_levels, log2_cu, sign_hiding,
                                  cu_qp_delta, tu_split=tu_split,
                                  max_tt=max_tt)
    fill(BCUState(False, d.motion, skip=False))
