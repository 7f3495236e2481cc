"""ctypes binding for the native C++ CABAC/syntax runtime (auto-built on
first use; falls back to the Python reference implementation if g++ fails)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "native", "asuna_native.cpp")
_SO = os.path.join(_HERE, "..", "native", "libasuna.so")

_lib = None
_lock = threading.Lock()


def _build() -> bool:
    try:
        r = subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
            capture_output=True, text=True, timeout=300)
        return r.returncode == 0
    except Exception:
        return False


def load():
    """Returns the loaded library or None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib or None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _lib = False
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _lib = False
            return None
        _extras = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        _out = [ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int)]
        lib.asuna_encode_intra_slice.restype = ctypes.c_int
        lib.asuna_encode_intra_slice.argtypes = (
            [ctypes.c_void_p] * 4 + [ctypes.c_int] * 7
            + _extras + [ctypes.c_int] * 2 + _out)
        lib.asuna_encode_p_slice.restype = ctypes.c_int
        lib.asuna_encode_p_slice.argtypes = (
            [ctypes.c_void_p] * 7 + [ctypes.c_int] * 6 + _extras + _out)
        lib.asuna_encode_b_slice.restype = ctypes.c_int
        lib.asuna_encode_b_slice.argtypes = (
            [ctypes.c_void_p] * 10 + [ctypes.c_int] * 9 + _extras + _out)
        try:
            lib.asuna_encode_intra_slice_qt.restype = ctypes.c_int
            lib.asuna_encode_intra_slice_qt.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int)]
        except AttributeError:
            pass    # stale .so without the qt entry point
        try:
            lib.asuna_encode_slice_qt2.restype = ctypes.c_int
            lib.asuna_encode_slice_qt2.argtypes = (
                [ctypes.c_int, ctypes.c_int]
                + [ctypes.c_void_p] * 26
                + [ctypes.c_int] * 8
                + _extras
                + [ctypes.c_void_p, ctypes.c_int]   # tuSplit32, maxTt (RQT)
                + _out)
        except AttributeError:
            pass
        try:
            lib.asuna_encode_slice_qt64.restype = ctypes.c_int
            lib.asuna_encode_slice_qt64.argtypes = (
                [ctypes.c_int]                       # sliceType
                + [ctypes.c_void_p] * 6              # split64 + motion64
                + [ctypes.c_void_p] * 26             # qt2 arrays
                + [ctypes.c_int] * 8                 # geom/qp/poc...
                + _extras
                + [ctypes.c_void_p, ctypes.c_int]    # tuSplit32, maxTt
                + _out)
        except AttributeError:
            pass    # stale .so without the qt64 inter entry
        try:
            lib.asuna_encode_p_slice_qt.restype = ctypes.c_int
            lib.asuna_encode_p_slice_qt.argtypes = (
                [ctypes.c_void_p] * 12
                + [ctypes.c_int] * 5
                + [ctypes.c_void_p, ctypes.c_int,
                   ctypes.POINTER(ctypes.c_uint32),
                   ctypes.POINTER(ctypes.c_int)])
        except AttributeError:
            pass
        try:
            lib.asuna_encode_intra_slice_qt64.restype = ctypes.c_int
            lib.asuna_encode_intra_slice_qt64.argtypes = (
                [ctypes.c_void_p] * 8 + [ctypes.c_int] * 5 + _extras + _out)
        except AttributeError:
            pass
        try:
            lib.asuna_crc16.restype = ctypes.c_uint32
            lib.asuna_crc16.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                                        ctypes.c_uint32]
        except AttributeError:
            pass
        lib.asuna_encode_residual_test.restype = ctypes.c_int
        lib.asuna_encode_residual_test.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return lib


def available() -> bool:
    return load() is not None


def pack_sao(sao_params, rows: int, cols: int):
    """Pack per-CTU SAO params (list-of-rows of dicts, see encoder_top
    _sao_decide) into the native int32 [ncu, 18] layout:
    [comp(luma,cb,cr)] x [type, aux, o0..o3]. Returns None for None."""
    if sao_params is None:
        return None
    arr = np.zeros((rows * cols, 18), np.int32)
    for r in range(rows):
        for c in range(cols):
            p = sao_params[r][c]
            base = arr[r * cols + c]
            for k, name in enumerate(("luma", "cb", "cr")):
                t, a, offs = p[name]
                base[k * 6] = t
                base[k * 6 + 1] = a
                base[k * 6 + 2:k * 6 + 6] = offs
    return arr


def unpack_sao(arr, rows: int, cols: int):
    """Inverse of pack_sao: [ncu, 18] int32 -> list-of-rows of dicts (the
    python serializers' format)."""
    out = []
    for r in range(rows):
        row = []
        for c in range(cols):
            b = arr[r * cols + c]
            row.append({name: (int(b[k * 6]), int(b[k * 6 + 1]),
                               [int(x) for x in b[k * 6 + 2:k * 6 + 6]])
                        for k, name in enumerate(("luma", "cb", "cr"))})
        out.append(row)
    return out


def _sao_qp_args(sao, qp_map, rows, cols, bit_depth, keep):
    """Common (sao_ptr, qp_ptr, bit_depth) tail for the extended entries."""
    sao_ptr = qp_ptr = None
    if sao is not None:
        s = np.ascontiguousarray(pack_sao(sao, rows, cols)
                                 if not isinstance(sao, np.ndarray) else sao,
                                 np.int32)
        keep.append(s)
        sao_ptr = s.ctypes.data
    if qp_map is not None:
        q = np.ascontiguousarray(np.asarray(qp_map).reshape(-1), np.int32)
        keep.append(q)
        qp_ptr = q.ctypes.data
    return sao_ptr, qp_ptr, int(bit_depth)


def encode_intra_slice(modes: np.ndarray, levels_y: np.ndarray,
                       levels_cb: np.ndarray, levels_cr: np.ndarray,
                       log2cu: int, qp: int, part_mode_coded: bool = True,
                       chroma_present: bool = True, sign_hiding: bool = False,
                       sao=None, qp_map=None, bit_depth: int = 8,
                       lossless: bool = False, chroma444: bool = False):
    """Native slice-data CABAC. Returns (payload_bytes, tail_value, tail_bits)
    or None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    rows, cols = modes.shape
    m = np.ascontiguousarray(modes, np.int32)
    ly = np.ascontiguousarray(levels_y, np.int32)
    lcb = np.ascontiguousarray(levels_cb, np.int32)
    lcr = np.ascontiguousarray(levels_cr, np.int32)
    keep = []
    sao_p, qp_p, bd = _sao_qp_args(sao, qp_map, rows, cols, bit_depth, keep)
    cap = int(ly.nbytes + lcb.nbytes + lcr.nbytes + 65536)
    out = np.empty(cap, np.uint8)
    tail = ctypes.c_uint32()
    tail_bits = ctypes.c_int()
    nbytes = lib.asuna_encode_intra_slice(
        m.ctypes.data, ly.ctypes.data, lcb.ctypes.data, lcr.ctypes.data,
        rows, cols, log2cu, qp,
        1 if part_mode_coded else 0, 1 if chroma_present else 0,
        1 if sign_hiding else 0,
        sao_p, qp_p, bd, 1 if lossless else 0, 1 if chroma444 else 0,
        out.ctypes.data, cap, ctypes.byref(tail), ctypes.byref(tail_bits))
    if nbytes < 0:
        return None
    return bytes(out[:nbytes]), int(tail.value), int(tail_bits.value)


def encode_intra_slice_qt(split, mode32, modes4, levels_y, levels_cb,
                          levels_cr, qp: int, sign_hiding: bool = False):
    """Native quadtree I-slice CABAC (CTU32, depth-1 split). Returns
    (payload, tail, tail_bits) or None when unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "asuna_encode_intra_slice_qt"):
        return None
    rows, cols = split.shape
    sp = np.ascontiguousarray(split, np.uint8)
    m32 = np.ascontiguousarray(mode32, np.int32)
    m4 = np.ascontiguousarray(modes4, np.int32)
    ly = np.ascontiguousarray(levels_y, np.int32)
    lcb = np.ascontiguousarray(levels_cb, np.int32)
    lcr = np.ascontiguousarray(levels_cr, np.int32)
    cap = int(ly.nbytes + lcb.nbytes + lcr.nbytes + 65536)
    out = np.empty(cap, np.uint8)
    tail = ctypes.c_uint32()
    tail_bits = ctypes.c_int()
    nbytes = lib.asuna_encode_intra_slice_qt(
        sp.ctypes.data, m32.ctypes.data, m4.ctypes.data,
        ly.ctypes.data, lcb.ctypes.data, lcr.ctypes.data,
        rows, cols, qp, 1 if sign_hiding else 0,
        out.ctypes.data, cap, ctypes.byref(tail), ctypes.byref(tail_bits))
    if nbytes < 0:
        return None
    return bytes(out[:nbytes]), int(tail.value), int(tail_bits.value)


def encode_residual_test(levels: np.ndarray, log2: int, is_luma: bool,
                         intra_mode: int, qp: int):
    lib = load()
    if lib is None:
        return None
    lv = np.ascontiguousarray(levels, np.int32)
    cap = lv.nbytes + 4096
    out = np.empty(cap, np.uint8)
    tail = ctypes.c_uint32()
    tail_bits = ctypes.c_int()
    nbytes = lib.asuna_encode_residual_test(
        lv.ctypes.data, log2, 1 if is_luma else 0, intra_mode, qp,
        out.ctypes.data, cap, ctypes.byref(tail), ctypes.byref(tail_bits))
    if nbytes < 0:
        return None
    return bytes(out[:nbytes]), int(tail.value), int(tail_bits.value)


def encode_p_slice(use_intra: np.ndarray, intra_modes: np.ndarray,
                   mvx_q: np.ndarray, mvy_q: np.ndarray,
                   levels_y: np.ndarray, levels_cb: np.ndarray,
                   levels_cr: np.ndarray, log2cu: int, qp: int,
                   max_merge: int = 3, sign_hiding: bool = False,
                   sao=None, qp_map=None, bit_depth: int = 8):
    """Native P-slice CABAC incl. merge/AMVP/skip decisions.
    Returns (payload, tail, tail_bits) or None if unavailable."""
    lib = load()
    if lib is None:
        return None
    rows, cols = use_intra.shape
    ui = np.ascontiguousarray(use_intra, np.uint8)
    im = np.ascontiguousarray(intra_modes, np.int32)
    mx = np.ascontiguousarray(mvx_q, np.int32)
    my = np.ascontiguousarray(mvy_q, np.int32)
    ly = np.ascontiguousarray(levels_y, np.int32)
    lcb = np.ascontiguousarray(levels_cb, np.int32)
    lcr = np.ascontiguousarray(levels_cr, np.int32)
    keep = []
    sao_p, qp_p, bd = _sao_qp_args(sao, qp_map, rows, cols, bit_depth, keep)
    cap = int(ly.nbytes + lcb.nbytes + lcr.nbytes + 65536)
    out = np.empty(cap, np.uint8)
    tail = ctypes.c_uint32()
    tail_bits = ctypes.c_int()
    nbytes = lib.asuna_encode_p_slice(
        ui.ctypes.data, im.ctypes.data, mx.ctypes.data, my.ctypes.data,
        ly.ctypes.data, lcb.ctypes.data, lcr.ctypes.data,
        rows, cols, log2cu, qp, max_merge, 1 if sign_hiding else 0,
        sao_p, qp_p, bd,
        out.ctypes.data, cap, ctypes.byref(tail), ctypes.byref(tail_bits))
    if nbytes < 0:
        return None
    return bytes(out[:nbytes]), int(tail.value), int(tail_bits.value)


def encode_b_slice(use_intra: np.ndarray, intra_modes: np.ndarray,
                   pdir: np.ndarray, mv0x_q: np.ndarray, mv0y_q: np.ndarray,
                   mv1x_q: np.ndarray, mv1y_q: np.ndarray,
                   levels_y: np.ndarray, levels_cb: np.ndarray,
                   levels_cr: np.ndarray, log2cu: int, qp: int,
                   max_merge: int, poc_cur: int, poc_l0: int, poc_l1: int,
                   sign_hiding: bool = False,
                   sao=None, qp_map=None, bit_depth: int = 8):
    """Native B-slice CABAC incl. bi merge/AMVP decisions (unused-list MVs
    must be zeroed). Returns (payload, tail, tail_bits) or None."""
    lib = load()
    if lib is None or not hasattr(lib, "asuna_encode_b_slice"):
        return None
    rows, cols = use_intra.shape
    c = lambda a, dt: np.ascontiguousarray(a, dt)
    ui = c(use_intra, np.uint8)
    im = c(intra_modes, np.int32)
    pd = c(pdir, np.int32)
    m0x, m0y = c(mv0x_q, np.int32), c(mv0y_q, np.int32)
    m1x, m1y = c(mv1x_q, np.int32), c(mv1y_q, np.int32)
    ly = c(levels_y, np.int32)
    lcb = c(levels_cb, np.int32)
    lcr = c(levels_cr, np.int32)
    keep = []
    sao_p, qp_p, bd = _sao_qp_args(sao, qp_map, rows, cols, bit_depth, keep)
    cap = int(ly.nbytes + lcb.nbytes + lcr.nbytes + 65536)
    out = np.empty(cap, np.uint8)
    tail = ctypes.c_uint32()
    tail_bits = ctypes.c_int()
    nbytes = lib.asuna_encode_b_slice(
        ui.ctypes.data, im.ctypes.data, pd.ctypes.data,
        m0x.ctypes.data, m0y.ctypes.data, m1x.ctypes.data, m1y.ctypes.data,
        ly.ctypes.data, lcb.ctypes.data, lcr.ctypes.data,
        rows, cols, log2cu, qp, max_merge, poc_cur, poc_l0, poc_l1,
        1 if sign_hiding else 0, sao_p, qp_p, bd,
        out.ctypes.data, cap, ctypes.byref(tail), ctypes.byref(tail_bits))
    if nbytes < 0:
        return None
    return bytes(out[:nbytes]), int(tail.value), int(tail_bits.value)


def encode_p_slice_qt(split, use_intra32, modes32, mv32x, mv32y,
                      use_intra4, modes4, mv4x, mv4y,
                      levels_y, levels_cb, levels_cr,
                      qp: int, max_merge: int, sign_hiding: bool = False):
    """Native quadtree P-slice CABAC (CTU32, depth-1; position-based
    merge/AMVP). Returns (payload, tail, tail_bits) or None."""
    lib = load()
    if lib is None or not hasattr(lib, "asuna_encode_p_slice_qt"):
        return None
    rows, cols = split.shape
    c8 = lambda a: np.ascontiguousarray(a, np.uint8)
    c32 = lambda a: np.ascontiguousarray(a, np.int32)
    sp, ui32 = c8(split), c8(use_intra32)
    m32, x32, y32 = c32(modes32), c32(mv32x), c32(mv32y)
    ui4 = c8(use_intra4)
    m4, x4, y4 = c32(modes4), c32(mv4x), c32(mv4y)
    ly, lcb, lcr = c32(levels_y), c32(levels_cb), c32(levels_cr)
    cap = int(ly.nbytes + lcb.nbytes + lcr.nbytes + 65536)
    out = np.empty(cap, np.uint8)
    tail = ctypes.c_uint32()
    tail_bits = ctypes.c_int()
    nbytes = lib.asuna_encode_p_slice_qt(
        sp.ctypes.data, ui32.ctypes.data, m32.ctypes.data,
        x32.ctypes.data, y32.ctypes.data, ui4.ctypes.data, m4.ctypes.data,
        x4.ctypes.data, y4.ctypes.data,
        ly.ctypes.data, lcb.ctypes.data, lcr.ctypes.data,
        rows, cols, qp, max_merge, 1 if sign_hiding else 0,
        out.ctypes.data, cap, ctypes.byref(tail), ctypes.byref(tail_bits))
    if nbytes < 0:
        return None
    return bytes(out[:nbytes]), int(tail.value), int(tail_bits.value)


def encode_slice_qt2(slice_type: int, max_depth: int, out: dict, qp: int,
                     max_merge: int = 3, sign_hiding: bool = False,
                     poc: int = 0, poc_l0: int = 0, poc_l1: int = 0,
                     sao=None, qp_map=None, bit_depth: int = 8,
                     max_tt: int = 0):
    """Unified native quadtree slice CABAC (I/P/B, depth 1-2). out: the
    device decision dict; out["tu_split32"] + max_tt >= 1 enable the RQT
    transform tree. Returns (payload, tail, tail_bits) or None."""
    lib = load()
    if lib is None or not hasattr(lib, "asuna_encode_slice_qt2"):
        return None
    split = out["split"]
    rows, cols = split.shape
    keep = []     # keep ndarray refs alive until after the call

    def ptr(a, dt):
        if a is None:
            return None
        a = np.ascontiguousarray(a, dt)
        keep.append(a)
        return a.ctypes.data

    sp = ptr(split, np.uint8)
    sp16 = ptr(out.get("split16"), np.uint8) if max_depth >= 2 else None
    ui32 = ptr(out.get("use_intra"), np.uint8)
    m32 = ptr(out["modes"], np.int32)
    pd32 = ptr(out.get("pdir"), np.int32)
    x32, y32 = ptr(out.get("mvx"), np.int32), ptr(out.get("mvy"), np.int32)
    x321 = ptr(out.get("mv1x"), np.int32)
    y321 = ptr(out.get("mv1y"), np.int32)
    ui4 = ptr(out.get("use_intra4"), np.uint8)
    m4 = ptr(out["modes4"], np.int32)
    pd4 = ptr(out.get("pdir4"), np.int32)
    x4, y4 = ptr(out.get("mv4x"), np.int32), ptr(out.get("mv4y"), np.int32)
    x41 = ptr(out.get("mv41x"), np.int32)
    y41 = ptr(out.get("mv41y"), np.int32)
    ui8 = ptr(out.get("use_intra8"), np.uint8) if max_depth >= 2 else None
    m8 = ptr(out.get("modes8"), np.int32) if max_depth >= 2 else None
    pd8 = ptr(out.get("pdir8"), np.int32) if max_depth >= 2 else None
    x8 = ptr(out.get("mv8x"), np.int32) if max_depth >= 2 else None
    y8 = ptr(out.get("mv8y"), np.int32) if max_depth >= 2 else None
    x81 = ptr(out.get("mv81x"), np.int32) if max_depth >= 2 else None
    y81 = ptr(out.get("mv81y"), np.int32) if max_depth >= 2 else None
    ly = ptr(out["levels_y"], np.int32)
    lcb = ptr(out["levels_cb"], np.int32)
    lcr = ptr(out["levels_cr"], np.int32)
    cap = int(rows * cols * (32 * 32 + 2 * 16 * 16) * 4 + 65536)
    buf = np.empty(cap, np.uint8)
    tail = ctypes.c_uint32()
    tail_bits = ctypes.c_int()
    sao_p, qp_p, bd = _sao_qp_args(sao, qp_map, rows, cols, bit_depth, keep)
    ts32 = ptr(out.get("tu_split32"), np.uint8) if max_tt >= 1 else None
    nbytes = lib.asuna_encode_slice_qt2(
        slice_type, max_depth, sp, sp16, ui32, m32, pd32, x32, y32,
        x321, y321, ui4, m4, pd4, x4, y4, x41, y41,
        ui8, m8, pd8, x8, y8, x81, y81,
        ly, lcb, lcr, rows, cols, qp, max_merge,
        1 if sign_hiding else 0, poc, poc_l0, poc_l1, sao_p, qp_p, bd,
        ts32, max_tt,
        buf.ctypes.data, cap, ctypes.byref(tail), ctypes.byref(tail_bits))
    if nbytes < 0:
        return None
    return bytes(buf[:nbytes]), int(tail.value), int(tail_bits.value)


def encode_slice_qt64(slice_type: int, out: dict, split64, mot64,
                      rows64: int, cols64: int, qp: int,
                      max_merge: int = 3, sign_hiding: bool = False,
                      poc: int = 0, poc_l0: int = 0, poc_l1: int = 0,
                      sao=None, qp_map=None, bit_depth: int = 8,
                      max_tt: int = 0):
    """CTU64 P/B slice CABAC (round 5): split64 [rows64*cols64] selects
    per CTU64 between ONE CU64 (motion from mot64 = (pdir, mv0x, mv0y,
    mv1x, mv1y) arrays, TU32 levels from the 4 quadrant CTU32 slots) and
    the 4 constituent CTU32 trees from the qt2 decision dict. sao/qp_map
    are per CTU64. Returns (payload, tail, tail_bits) or None."""
    lib = load()
    if lib is None or not hasattr(lib, "asuna_encode_slice_qt64"):
        return None
    split = out["split"]
    rows, cols = split.shape
    assert rows == 2 * rows64 and cols == 2 * cols64
    keep = []

    def ptr(a, dt):
        if a is None:
            return None
        a = np.ascontiguousarray(a, dt)
        keep.append(a)
        return a.ctypes.data

    p64 = ptr(split64, np.uint8)
    pd64 = ptr(mot64[0], np.int32)
    x64, y64 = ptr(mot64[1], np.int32), ptr(mot64[2], np.int32)
    x641, y641 = ptr(mot64[3], np.int32), ptr(mot64[4], np.int32)
    sp = ptr(split, np.uint8)
    sp16 = ptr(out.get("split16"), np.uint8)
    ui32 = ptr(out.get("use_intra"), np.uint8)
    m32 = ptr(out["modes"], np.int32)
    pd32 = ptr(out.get("pdir"), np.int32)
    x32, y32 = ptr(out.get("mvx"), np.int32), ptr(out.get("mvy"), np.int32)
    x321 = ptr(out.get("mv1x"), np.int32)
    y321 = ptr(out.get("mv1y"), np.int32)
    ui4 = ptr(out.get("use_intra4"), np.uint8)
    m4 = ptr(out["modes4"], np.int32)
    pd4 = ptr(out.get("pdir4"), np.int32)
    x4, y4 = ptr(out.get("mv4x"), np.int32), ptr(out.get("mv4y"), np.int32)
    x41 = ptr(out.get("mv41x"), np.int32)
    y41 = ptr(out.get("mv41y"), np.int32)
    ui8 = ptr(out.get("use_intra8"), np.uint8)
    m8 = ptr(out.get("modes8"), np.int32)
    pd8 = ptr(out.get("pdir8"), np.int32)
    x8 = ptr(out.get("mv8x"), np.int32)
    y8 = ptr(out.get("mv8y"), np.int32)
    x81 = ptr(out.get("mv81x"), np.int32)
    y81 = ptr(out.get("mv81y"), np.int32)
    ly = ptr(out["levels_y"], np.int32)
    lcb = ptr(out["levels_cb"], np.int32)
    lcr = ptr(out["levels_cr"], np.int32)
    cap = int(rows * cols * (32 * 32 + 2 * 16 * 16) * 4 + 65536)
    buf = np.empty(cap, np.uint8)
    tail = ctypes.c_uint32()
    tail_bits = ctypes.c_int()
    sao_p, qp_p, bd = _sao_qp_args(sao, qp_map, rows64, cols64, bit_depth,
                                   keep)
    ts32 = ptr(out.get("tu_split32"), np.uint8) if max_tt >= 1 else None
    nbytes = lib.asuna_encode_slice_qt64(
        slice_type, p64, pd64, x64, y64, x641, y641,
        sp, sp16, ui32, m32, pd32, x32, y32,
        x321, y321, ui4, m4, pd4, x4, y4, x41, y41,
        ui8, m8, pd8, x8, y8, x81, y81,
        ly, lcb, lcr, rows64, cols64, qp, max_merge,
        1 if sign_hiding else 0, poc, poc_l0, poc_l1, sao_p, qp_p, bd,
        ts32, max_tt,
        buf.ctypes.data, cap, ctypes.byref(tail), ctypes.byref(tail_bits))
    if nbytes < 0:
        return None
    return bytes(buf[:nbytes]), int(tail.value), int(tail_bits.value)


def crc16(data: bytes, init: int = 0xffff) -> int:
    """CRC-16 (poly 0x1021, MSB-first) over raw bytes + 16 zero-bit finish —
    the reference's decoded-picture-hash CRC (picyuv.cpp:507,542). Uses the
    native lib when available, else a table-driven Python fallback."""
    lib = load()
    if lib is not None and hasattr(lib, "asuna_crc16"):
        arr = np.frombuffer(data, np.uint8)
        crc = lib.asuna_crc16(arr.ctypes.data, len(arr), init)
        # crcFinish: clock through 16 zero bits
        for _ in range(16):
            msb = (crc >> 15) & 1
            crc = ((crc << 1) & 0xffff) ^ (msb * 0x1021)
        return crc
    # augmented table form: data bits enter at the LSB (like the reference's
    # bitwise loop), one byte per step
    global _CRC_TABLE
    if "_CRC_TABLE" not in globals():
        tb = []
        for b in range(256):
            c = b << 8
            for _ in range(8):
                c = ((c << 1) ^ 0x1021) & 0xffff if c & 0x8000 \
                    else (c << 1) & 0xffff
            tb.append(c)
        _CRC_TABLE = tb
    crc = init
    for b in data:
        crc = (((crc << 8) | b) & 0xffff) ^ _CRC_TABLE[(crc >> 8) & 0xff]
    for _ in range(16):
        msb = (crc >> 15) & 1
        crc = ((crc << 1) & 0xffff) ^ (msb * 0x1021)
    return crc


def encode_intra_slice_qt64(out: dict, rows: int, cols: int, qp: int,
                            max_depth: int, sign_hiding: bool = False,
                            sao=None, qp_map=None, bit_depth: int = 8):
    """Native CTU64 intra quadtree CABAC. Returns (payload, tail, tail_bits)
    or None when unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "asuna_encode_intra_slice_qt64"):
        return None

    ly = np.ascontiguousarray(out["levels_y"], np.int32)
    lcb = np.ascontiguousarray(out["levels_cb"], np.int32)
    lcr = np.ascontiguousarray(out["levels_cr"], np.int32)
    sp32 = np.ascontiguousarray(out["split32"], np.uint8)
    m32 = np.ascontiguousarray(out["modes32"], np.int32)
    sp16 = np.ascontiguousarray(out["split16"], np.uint8)
    m16 = np.ascontiguousarray(out["modes16"], np.int32)
    m8 = np.ascontiguousarray(out["modes8"], np.int32)
    keep = []
    sao_p, qp_p, bd = _sao_qp_args(sao, qp_map, rows, cols, bit_depth, keep)
    cap = int(ly.nbytes + lcb.nbytes + lcr.nbytes + 65536)
    buf = np.empty(cap, np.uint8)
    tail = ctypes.c_uint32()
    tail_bits = ctypes.c_int()
    nbytes = lib.asuna_encode_intra_slice_qt64(
        sp32.ctypes.data, m32.ctypes.data, sp16.ctypes.data, m16.ctypes.data,
        m8.ctypes.data, ly.ctypes.data, lcb.ctypes.data, lcr.ctypes.data,
        rows, cols, qp, max_depth, 1 if sign_hiding else 0, sao_p, qp_p, bd,
        buf.ctypes.data, cap, ctypes.byref(tail), ctypes.byref(tail_bits))
    if nbytes < 0:
        return None
    return bytes(buf[:nbytes]), int(tail.value), int(tail_bits.value)
