"""CTU-level slice-data syntax for intra slices (spec 7.3.8.x).

Round-1 scope: uniform CU grid (CTU == CU == one luma TU, chroma TU = half),
deblocking/SAO off, DM chroma, 2Nx2N partitions. The encoder/decoder pair here
is the behavioral reference; the C++ native mirror is the production path.

Reference behavior studied (not copied): entropy.cpp encodeCTU/codeIntraDirLumaAng/
codeIntraDirChroma/codeTransformUnit (/root/reference/source/encoder/entropy.cpp:765+).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from . import tables as T
from .cabac import CabacEncoder, CabacDecoder
from .residual import encode_residual, decode_residual

CTX = T.CTX_OFFSET
DC_MODE = 1
PLANAR_MODE = 0
VER_MODE = 26


def derive_mpm(cand_left: int, cand_above: int) -> List[int]:
    """Spec 8.4.2 most-probable-mode list. Unavailable neighbors must be
    passed as DC (1)."""
    a, b = cand_left, cand_above
    if a == b:
        if a < 2:
            return [PLANAR_MODE, DC_MODE, VER_MODE]
        return [a, 2 + ((a + 29) % 32), 2 + ((a - 2 + 1) % 32)]
    mpm = [a, b]
    if PLANAR_MODE not in mpm:
        mpm.append(PLANAR_MODE)
    elif DC_MODE not in mpm:
        mpm.append(DC_MODE)
    else:
        mpm.append(VER_MODE)
    return mpm


def encode_intra_luma_mode(enc: CabacEncoder, mode: int, mpm: List[int]):
    if mode in mpm:
        enc.encode_bin(1, CTX["intra_luma"])
        idx = mpm.index(mode)
        enc.encode_bin_ep(0 if idx == 0 else 1)
        if idx:
            enc.encode_bin_ep(idx - 1)
    else:
        enc.encode_bin(0, CTX["intra_luma"])
        rem = mode
        for m in sorted(mpm, reverse=True):
            if rem > m:
                rem -= 1
        enc.encode_bins_ep(rem, 5)


def decode_intra_luma_mode(dec: CabacDecoder, mpm: List[int]) -> int:
    if dec.decode_bin(CTX["intra_luma"]):
        idx = 0
        if dec.decode_bin_ep():
            idx = 1 + dec.decode_bin_ep()
        return mpm[idx]
    rem = dec.decode_bins_ep(5)
    for m in sorted(mpm):
        if rem >= m:
            rem += 1
    return rem


def encode_intra_chroma_mode(enc: CabacEncoder, chroma_mode: int, luma_mode: int):
    """DM (derived-from-luma) is the single-bin 0 case; otherwise bin 1 + 2
    bypass bits indexing {planar, ver, hor, dc} with 34-substitution."""
    if chroma_mode == luma_mode:
        enc.encode_bin(0, CTX["intra_chroma"])
        return
    allowed = [PLANAR_MODE, VER_MODE, 10, DC_MODE]
    table = [(34 if m == luma_mode else m) for m in allowed]
    idx = table.index(chroma_mode)
    enc.encode_bin(1, CTX["intra_chroma"])
    enc.encode_bins_ep(idx, 2)


def decode_intra_chroma_mode(dec: CabacDecoder, luma_mode: int) -> int:
    if not dec.decode_bin(CTX["intra_chroma"]):
        return luma_mode
    idx = dec.decode_bins_ep(2)
    allowed = [PLANAR_MODE, VER_MODE, 10, DC_MODE]
    return 34 if allowed[idx] == luma_mode else allowed[idx]


@dataclass
class CTUDecisions:
    """Per-CTU decision data for the uniform-grid intra case."""
    luma_mode: int
    luma_levels: np.ndarray              # [N, N] int quantized levels
    cb_levels: np.ndarray                # [N/2, N/2]
    cr_levels: np.ndarray


def encode_intra_ctu_full(enc: CabacEncoder, d: CTUDecisions, log2_cu: int,
                          cand_left: int, cand_above: int,
                          chroma_present: bool = True,
                          part_mode_coded: bool = True,
                          sign_hiding: bool = False,
                          tq_bypass: bool = False,
                          bypass_enabled: bool = False,
                          cu_qp_delta=None, chroma_log2: int = None):
    if chroma_log2 is None:
        chroma_log2 = log2_cu - 1
    if bypass_enabled:
        enc.encode_bin(1 if tq_bypass else 0, CTX["tq_bypass"])
    if part_mode_coded:
        enc.encode_bin(1, CTX["part_size"])   # PART_2Nx2N
    mpm = derive_mpm(cand_left, cand_above)
    encode_intra_luma_mode(enc, d.luma_mode, mpm)
    if chroma_present:
        encode_intra_chroma_mode(enc, d.luma_mode, d.luma_mode)  # DM chroma

    cbf_luma = 1 if np.any(d.luma_levels) else 0
    cbf_cb = 1 if (chroma_present and np.any(d.cb_levels)) else 0
    cbf_cr = 1 if (chroma_present and np.any(d.cr_levels)) else 0

    # transform_tree depth 0: chroma cbfs first, then transform_unit
    if chroma_present:
        enc.encode_bin(cbf_cb, CTX["qt_cbf"] + 2)   # chroma ctx at depth 0
        enc.encode_bin(cbf_cr, CTX["qt_cbf"] + 2)
    # cbf_luma: always coded for intra; ctx 1 at depth 0
    enc.encode_bin(cbf_luma, CTX["qt_cbf"] + 1)

    if cu_qp_delta is not None and (cbf_luma or cbf_cb or cbf_cr):
        encode_cu_qp_delta(enc, cu_qp_delta)

    if cbf_luma:
        encode_residual(enc, d.luma_levels, log2_cu, True, d.luma_mode,
                        sign_hiding)
    if cbf_cb:
        encode_residual(enc, d.cb_levels, chroma_log2, False, d.luma_mode,
                        sign_hiding)
    if cbf_cr:
        encode_residual(enc, d.cr_levels, chroma_log2, False, d.luma_mode,
                        sign_hiding)


def decode_intra_ctu_full(dec: CabacDecoder, log2_cu: int, cand_left: int,
                          cand_above: int, chroma_present: bool = True,
                          part_mode_coded: bool = True,
                          sign_hiding: bool = False,
                          bypass_enabled: bool = False,
                          qp_delta_enabled: bool = False):
    if bypass_enabled:
        dec.decode_bin(CTX["tq_bypass"])
    if part_mode_coded:
        part = dec.decode_bin(CTX["part_size"])
        assert part == 1, "NxN partitions not supported yet"
    mpm = derive_mpm(cand_left, cand_above)
    luma_mode = decode_intra_luma_mode(dec, mpm)
    if chroma_present:
        chroma_mode = decode_intra_chroma_mode(dec, luma_mode)
    else:
        chroma_mode = luma_mode

    n = 1 << log2_cu
    if chroma_present:
        cbf_cb = dec.decode_bin(CTX["qt_cbf"] + 2)
        cbf_cr = dec.decode_bin(CTX["qt_cbf"] + 2)
    else:
        cbf_cb = cbf_cr = 0
    cbf_luma = dec.decode_bin(CTX["qt_cbf"] + 1)

    qp_delta = 0
    if qp_delta_enabled and (cbf_luma or cbf_cb or cbf_cr):
        qp_delta = decode_cu_qp_delta(dec)

    luma = (decode_residual(dec, log2_cu, True, luma_mode, sign_hiding)
            if cbf_luma else np.zeros((n, n), np.int32))
    cb = (decode_residual(dec, log2_cu - 1, False, chroma_mode, sign_hiding)
          if cbf_cb else np.zeros((n // 2, n // 2), np.int32))
    cr = (decode_residual(dec, log2_cu - 1, False, chroma_mode, sign_hiding)
          if cbf_cr else np.zeros((n // 2, n // 2), np.int32))
    return luma_mode, chroma_mode, luma, cb, cr


# ---------------------------------------------------------------------------
# SAO per-CTU syntax (spec 7.3.8.3). params per CTU:
#   {"luma": (type, aux, offs), "cb": (type, aux, offs), "cr": (type, aux, offs)}
# with chroma sharing type and EO class (cb's aux when EO).
# ---------------------------------------------------------------------------

SAO_OFF, SAO_BO, SAO_EO = 0, 1, 2


def _enc_offsets_abs(enc, offs, cmax):
    for o in offs:
        a = abs(int(o))
        for _ in range(a):
            enc.encode_bin_ep(1)
        if a < cmax:
            enc.encode_bin_ep(0)


def _dec_offsets_abs(dec, cmax):
    out = []
    for _ in range(4):
        a = 0
        while a < cmax and dec.decode_bin_ep():
            a += 1
        out.append(a)
    return out


def _enc_type(enc, t):
    enc.encode_bin(0 if t == SAO_OFF else 1, CTX["sao_type"])
    if t != SAO_OFF:
        enc.encode_bin_ep(1 if t == SAO_EO else 0)


def _dec_type(dec):
    if not dec.decode_bin(CTX["sao_type"]):
        return SAO_OFF
    return SAO_EO if dec.decode_bin_ep() else SAO_BO


def encode_sao_ctu(enc: CabacEncoder, params, left_params, up_params,
                   luma_on: bool, chroma_on: bool, bit_depth: int = 8):
    cmax = (1 << (min(bit_depth, 10) - 5)) - 1
    if left_params is not None:
        merge_left = params == left_params
        enc.encode_bin(1 if merge_left else 0, CTX["sao_merge"])
        if merge_left:
            return
    if up_params is not None:
        merge_up = params == up_params
        enc.encode_bin(1 if merge_up else 0, CTX["sao_merge"])
        if merge_up:
            return
    comps = ([("luma",)] if luma_on else []) + ([("cb", "cr")] if chroma_on else [])
    for group in comps:
        t = params[group[0]][0]
        _enc_type(enc, t)
        if t == SAO_OFF:
            continue
        for name in group:
            typ, aux, offs = params[name]
            _enc_offsets_abs(enc, offs, cmax)
            if typ == SAO_BO:
                for o in offs:
                    if o != 0:
                        enc.encode_bin_ep(1 if o < 0 else 0)
                enc.encode_bins_ep(aux, 5)
            elif name in ("luma", "cb"):
                enc.encode_bins_ep(aux, 2)     # eo_class (cr inherits)


def decode_sao_ctu(dec: CabacDecoder, left_params, up_params,
                   luma_on: bool, chroma_on: bool, bit_depth: int = 8):
    cmax = (1 << (min(bit_depth, 10) - 5)) - 1
    if left_params is not None and dec.decode_bin(CTX["sao_merge"]):
        return dict(left_params)
    if up_params is not None and dec.decode_bin(CTX["sao_merge"]):
        return dict(up_params)
    out = {}
    groups = ([("luma",)] if luma_on else []) + ([("cb", "cr")] if chroma_on else [])
    for group in groups:
        t = _dec_type(dec)
        if t == SAO_OFF:
            for name in group:
                out[name] = (SAO_OFF, 0, [0, 0, 0, 0])
            continue
        shared_cls = None
        for name in group:
            absv = _dec_offsets_abs(dec, cmax)
            if t == SAO_BO:
                offs = []
                for a in absv:
                    if a != 0:
                        offs.append(-a if dec.decode_bin_ep() else a)
                    else:
                        offs.append(0)
                band = dec.decode_bins_ep(5)
                out[name] = (SAO_BO, band, offs)
            else:
                if name in ("luma", "cb"):
                    shared_cls = dec.decode_bins_ep(2)
                # EO sign inference: cats 1,2 positive; 3,4 negative
                offs = [absv[0], absv[1], -absv[2], -absv[3]]
                out[name] = (SAO_EO, shared_cls, offs)
    for name in ("luma", "cb", "cr"):
        if name not in out:
            out[name] = (SAO_OFF, 0, [0, 0, 0, 0])
    return out


# ---------------------------------------------------------------------------
# cu_qp_delta (spec 7.3.8.10 / 9.3.3.8): TU prefix (cMax 5, ctx bin0 then
# ctx bin1+) + EG0 bypass suffix + sign.
# ---------------------------------------------------------------------------

def encode_cu_qp_delta(enc: CabacEncoder, delta: int):
    a = abs(delta)
    prefix = min(a, 5)
    for i in range(prefix):
        enc.encode_bin(1, CTX["delta_qp"] + (0 if i == 0 else 1))
    if prefix < 5:
        enc.encode_bin(0, CTX["delta_qp"] + (0 if prefix == 0 else 1))
    else:
        # EG0 suffix for a - 5
        v = a - 5
        k = 0
        while v >= (1 << k):
            enc.encode_bin_ep(1)
            v -= 1 << k
            k += 1
        enc.encode_bin_ep(0)
        if k:
            enc.encode_bins_ep(v, k)
    if a:
        enc.encode_bin_ep(1 if delta < 0 else 0)


def decode_cu_qp_delta(dec: CabacDecoder) -> int:
    prefix = 0
    while prefix < 5 and dec.decode_bin(CTX["delta_qp"] + (0 if prefix == 0 else 1)):
        prefix += 1
    a = prefix
    if prefix == 5:
        k = 0
        base = 0
        while dec.decode_bin_ep():
            base += 1 << k
            k += 1
        a = 5 + base + (dec.decode_bins_ep(k) if k else 0)
    if a and dec.decode_bin_ep():
        return -a
    return a
