"""Golden tests: native C++ CABAC runtime must be byte-identical to the
Python reference implementation."""

import numpy as np
import pytest

from x265_yuuki_asuna_tpu.bitstream import native
from x265_yuuki_asuna_tpu.bitstream.cabac import CabacEncoder
from x265_yuuki_asuna_tpu.bitstream import residual as R
from x265_yuuki_asuna_tpu.bitstream import ctu_syntax as CS

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib build failed")

RNG = np.random.default_rng(77)


def test_native_residual_golden():
    for trial in range(60):
        log2 = int(RNG.integers(2, 6))
        n = 1 << log2
        is_luma = True if log2 == 5 else bool(RNG.integers(0, 2))
        mode = int(RNG.integers(0, 35))
        qp = int(RNG.integers(0, 52))
        dens = [0.05, 0.4, 0.9][trial % 3]
        mag = [2, 10, 2000][trial % 3]
        lv = (RNG.integers(-mag, mag + 1, (n, n)) *
              (RNG.random((n, n)) < dens)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 1
        enc = CabacEncoder()
        enc.init_contexts(2, qp)
        R.encode_residual(enc, lv, log2, is_luma, mode)
        enc.encode_bin_trm(1)
        pdata, ptail, ptb = enc.finish()
        ndata, ntail, ntb = native.encode_residual_test(lv, log2, is_luma, mode, qp)
        assert (pdata, ptail, ptb) == (ndata, ntail, ntb), trial


def test_native_slice_golden():
    rows, cols, log2cu = 3, 4, 4
    n, nc = 16, 8
    for trial in range(8):
        qp = int(RNG.integers(10, 48))
        modes = RNG.integers(0, 35, (rows, cols)).astype(np.int32)
        dens = 0.3 if trial % 2 else 0.05
        lv_y = (RNG.integers(-9, 10, (rows, cols, n, n)) *
                (RNG.random((rows, cols, n, n)) < dens)).astype(np.int32)
        lv_cb = (RNG.integers(-5, 6, (rows, cols, nc, nc)) *
                 (RNG.random((rows, cols, nc, nc)) < dens)).astype(np.int32)
        lv_cr = (RNG.integers(-5, 6, (rows, cols, nc, nc)) *
                 (RNG.random((rows, cols, nc, nc)) < dens)).astype(np.int32)

        enc = CabacEncoder()
        enc.init_contexts(2, qp)
        last = rows * cols - 1
        for r in range(rows):
            for c in range(cols):
                d = CS.CTUDecisions(int(modes[r, c]), lv_y[r, c],
                                    lv_cb[r, c], lv_cr[r, c])
                CS.encode_intra_ctu_full(
                    enc, d, log2cu, int(modes[r, c - 1]) if c else 1, 1)
                enc.encode_bin_trm(1 if r * cols + c == last else 0)
        pdata, ptail, ptb = enc.finish()
        res = native.encode_intra_slice(modes, lv_y, lv_cb, lv_cr, log2cu, qp)
        assert res is not None
        assert res == (pdata, ptail, ptb), trial


def test_native_p_slice_golden():
    """Native P-slice (incl. merge/AMVP/skip decisions) must be byte-identical
    to the Python reference path."""
    from x265_yuuki_asuna_tpu.bitstream import inter_syntax as IS

    rows, cols, log2cu = 3, 4, 4
    n, nc = 16, 8
    for trial in range(6):
        qp = int(RNG.integers(15, 45))
        use_intra = (RNG.random((rows, cols)) < 0.25)
        modes = RNG.integers(0, 35, (rows, cols)).astype(np.int32)
        mvx = (RNG.integers(-16, 17, (rows, cols)) * 4).astype(np.int32)
        mvy = (RNG.integers(-16, 17, (rows, cols)) * 4).astype(np.int32)
        # create merge/skip opportunities: copy some neighbors' MVs / zero resid
        for r in range(rows):
            for c in range(1, cols):
                if RNG.random() < 0.4:
                    mvx[r, c], mvy[r, c] = mvx[r, c - 1], mvy[r, c - 1]
        dens = 0.15
        lv_y = (RNG.integers(-6, 7, (rows, cols, n, n)) *
                (RNG.random((rows, cols, n, n)) < dens)).astype(np.int32)
        lv_cb = (RNG.integers(-4, 5, (rows, cols, nc, nc)) *
                 (RNG.random((rows, cols, nc, nc)) < dens)).astype(np.int32)
        lv_cr = (RNG.integers(-4, 5, (rows, cols, nc, nc)) *
                 (RNG.random((rows, cols, nc, nc)) < dens)).astype(np.int32)
        for r in range(rows):
            for c in range(cols):
                if RNG.random() < 0.4:   # skip candidates
                    lv_y[r, c] = 0
                    lv_cb[r, c] = 0
                    lv_cr[r, c] = 0

        out = {"use_intra": use_intra, "modes": modes, "mvx": mvx, "mvy": mvy,
               "levels_y": lv_y, "levels_cb": lv_cb, "levels_cr": lv_cr}

        # python reference path (mirrors VideoEncoderSession._decide_cu)
        enc = CabacEncoder()
        enc.init_contexts(1, qp)
        grid = [[None] * cols for _ in range(rows)]
        last = rows * cols - 1
        for r in range(rows):
            for c in range(cols):
                if use_intra[r, c]:
                    d = IS.InterCTUDecision(
                        is_intra=True, intra_mode=int(modes[r, c]),
                        luma_levels=lv_y[r, c], cb_levels=lv_cb[r, c],
                        cr_levels=lv_cr[r, c])
                else:
                    mv = (int(mvx[r, c]), int(mvy[r, c]))
                    cands = IS.merge_candidates(grid, r, c, 3)
                    if mv in cands:
                        d = IS.InterCTUDecision(
                            is_intra=False, mv=mv, merge_idx=cands.index(mv),
                            luma_levels=lv_y[r, c], cb_levels=lv_cb[r, c],
                            cr_levels=lv_cr[r, c])
                    else:
                        preds = IS.amvp_candidates(grid, r, c)
                        costs = [abs(mv[0] - p[0]) + abs(mv[1] - p[1]) for p in preds]
                        f = 0 if costs[0] <= costs[1] else 1
                        d = IS.InterCTUDecision(
                            is_intra=False, mv=mv, merge_idx=-1, mvp_flag=f,
                            mvd=(mv[0] - preds[f][0], mv[1] - preds[f][1]),
                            luma_levels=lv_y[r, c], cb_levels=lv_cb[r, c],
                            cr_levels=lv_cr[r, c])
                IS.encode_inter_ctu(enc, d, grid, r, c, log2cu, 3)
                enc.encode_bin_trm(1 if r * cols + c == last else 0)
        ref = enc.finish()
        got = native.encode_p_slice(use_intra, modes, mvx, mvy,
                                    lv_y, lv_cb, lv_cr, log2cu, qp, 3)
        assert got == ref, trial


def test_native_b_slice_golden():
    """Native B-slice writer byte-identical to the Python reference
    (bi merge with combined candidates, per-list AMVP with POC scaling)."""
    import numpy as np
    from x265_yuuki_asuna_tpu.bitstream import native
    from x265_yuuki_asuna_tpu.bitstream import inter_syntax as IS
    from x265_yuuki_asuna_tpu.bitstream.cabac import CabacEncoder

    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(11)
    rows, cols, n, nc = 3, 4, 16, 8
    ncu = rows * cols
    qp, max_merge = 30, 3
    poc, poc0, poc1 = 1, 0, 2
    for trial in range(4):
        use_intra = (rng.random((rows, cols)) < 0.2)
        modes = rng.integers(0, 35, (rows, cols)).astype(np.int32)
        pdir = rng.integers(1, 4, (rows, cols)).astype(np.int32)
        mvx = (rng.integers(-32, 33, (rows, cols)) * rng.integers(0, 2, (rows, cols))).astype(np.int32)
        mvy = (rng.integers(-32, 33, (rows, cols)) * rng.integers(0, 2, (rows, cols))).astype(np.int32)
        mv1x = (rng.integers(-32, 33, (rows, cols)) * rng.integers(0, 2, (rows, cols))).astype(np.int32)
        mv1y = rng.integers(-32, 33, (rows, cols)).astype(np.int32)
        m0 = (pdir & 1).astype(bool)
        m1 = (pdir & 2).astype(bool)
        mvx, mvy = np.where(m0, mvx, 0), np.where(m0, mvy, 0)
        mv1x, mv1y = np.where(m1, mv1x, 0), np.where(m1, mv1y, 0)
        lv_y = (rng.integers(-4, 5, (rows, cols, n, n))
                * (rng.random((rows, cols, n, n)) < 0.05)).astype(np.int32)
        lv_cb = (rng.integers(-3, 4, (rows, cols, nc, nc))
                 * (rng.random((rows, cols, nc, nc)) < 0.05)).astype(np.int32)
        lv_cr = (rng.integers(-3, 4, (rows, cols, nc, nc))
                 * (rng.random((rows, cols, nc, nc)) < 0.05)).astype(np.int32)

        res = native.encode_b_slice(use_intra, modes, pdir, mvx, mvy,
                                    mv1x, mv1y, lv_y, lv_cb, lv_cr,
                                    4, qp, max_merge, poc, poc0, poc1)
        assert res is not None

        out = {"use_intra": use_intra, "modes": modes, "pdir": pdir,
               "mvx": mvx, "mvy": mvy, "mv1x": mv1x, "mv1y": mv1y,
               "levels_y": lv_y, "levels_cb": lv_cb, "levels_cr": lv_cr}
        enc = CabacEncoder()
        enc.init_contexts(0, qp)
        grid = [[None] * cols for _ in range(rows)]

        from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
        sess = VideoEncoderSession.__new__(VideoEncoderSession)
        sess.rows, sess.cols, sess.max_merge = rows, cols, max_merge
        last = ncu - 1
        for r in range(rows):
            for c in range(cols):
                d = VideoEncoderSession._decide_cu_b(sess, out, grid, r, c,
                                                     poc, poc0, poc1)
                IS.encode_b_ctu(enc, d, grid, r, c, 4, max_merge)
                enc.encode_bin_trm(1 if r * cols + c == last else 0)
        data, tail, tail_bits = enc.finish()
        assert res == (data, tail, tail_bits), f"trial {trial} mismatch"


def test_native_qt2_matches_python_all_slice_types():
    """Unified native quadtree writer (I/P/B, depth 1-2) must be
    byte-identical to the Python reference writers."""
    import numpy as np
    from x265_yuuki_asuna_tpu.bitstream import native
    from x265_yuuki_asuna_tpu.models.encoder_top import (
        IntraEncoderSession, VideoEncoderSession)
    lib = native.load()
    if lib is None or not hasattr(lib, "asuna_encode_slice_qt2"):
        import pytest
        pytest.skip("native qt2 unavailable")
    rng = np.random.default_rng(7)
    frames = []
    base = rng.integers(0, 256, (96 + 16, 160 + 16)).astype(np.uint8)
    for i in range(4):
        y = base[i:i + 96, 2 * i:2 * i + 160].copy()
        u = rng.integers(0, 256, (48, 80)).astype(np.uint8) if i == 0 \
            else frames[-1][1]
        v = np.full((48, 80), 128, np.uint8)
        frames.append((y, u, v))

    def diff(run):
        s_native = run()
        orig = native.encode_slice_qt2
        try:
            native.encode_slice_qt2 = lambda *a, **k: None
            s_python = run()
        finally:
            native.encode_slice_qt2 = orig
        assert s_native == s_python

    for md in (1, 2):
        diff(lambda md=md: IntraEncoderSession(
            160, 96, qp=30, max_depth=md, hash_sei=False, info_sei=False
            ).encode_frame(*frames[0]).nals)

        def run_p(md=md):
            sess = VideoEncoderSession(160, 96, qp=31, keyint=25,
                                       max_depth=md, hash_sei=False)
            return b"".join(sess.encode_frame(*f).nals for f in frames[:3])
        diff(run_p)

        def run_b(md=md):
            sess = VideoEncoderSession(160, 96, qp=31, keyint=25,
                                       max_depth=md, bframes=2,
                                       hash_sei=False)
            res = []
            for f in frames:
                res += sess.push_frame(*f)
            res += sess.flush()
            return b"".join(fr.nals for fr in res)
        diff(run_b)
