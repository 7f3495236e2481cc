"""Differential tests vs the reference x265 entropy coder (skipped unless
tests/oracle/resid_oracle has been built — see tests/oracle/README.md)."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.path.join(os.path.dirname(__file__), "oracle", "resid_oracle")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="reference oracle not built")

from x265_yuuki_asuna_tpu.bitstream.cabac import CabacEncoder
from x265_yuuki_asuna_tpu.bitstream import residual as R


def _mine(lv, log2, is_luma, mode, qp):
    enc = CabacEncoder()
    enc.init_contexts(2, qp)
    R.encode_residual(enc, lv, log2, bool(is_luma), mode)
    enc.encode_bin_trm(1)
    data, tail, tb = enc.finish()
    return data.hex(), len(data) * 8 + tb


def _oracle(lv, log2, is_luma, mode, qp):
    inp = " ".join(str(int(x)) for x in lv.reshape(-1))
    r = subprocess.run([ORACLE, str(log2), str(int(is_luma)), str(mode), str(qp)],
                       input=inp, capture_output=True, text=True)
    by = bits = None
    for line in r.stdout.splitlines():
        if line.startswith("BYTES"):
            by = line.split()[1] if len(line.split()) > 1 else ""
        if line.startswith("BITS"):
            bits = int(line.split()[1])
    return by, bits


def test_residual_matches_reference_bytes():
    rng = np.random.default_rng(42)
    for trial in range(120):
        log2 = int(rng.integers(2, 6))
        n = 1 << log2
        is_luma = 1 if log2 == 5 else int(rng.integers(0, 2))
        mode = int(rng.integers(0, 35))
        qp = int(rng.integers(0, 52))
        dens = [0.05, 0.3, 0.8][trial % 3]
        mag = [2, 8, 1000][trial % 3]
        lv = (rng.integers(-mag, mag + 1, (n, n)) *
              (rng.random((n, n)) < dens)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 1
        m, mbits = _mine(lv, log2, is_luma, mode, qp)
        o, obits = _oracle(lv, log2, is_luma, mode, qp)
        assert obits == mbits, (trial, mbits, obits)
        k = min(len(m), len(o))
        assert m[:k] == o[:k], trial
