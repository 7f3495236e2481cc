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
