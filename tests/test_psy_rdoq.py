"""psy-RDOQ: energy-preserving bias in the RDOQ level decision."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.ops import quant
from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_psy_rdoq_keeps_more_energy():
    rng = np.random.default_rng(0)
    coef = rng.integers(-200, 200, (32, 16, 16)).astype(np.int32)
    lv0 = quant.quant_rdoq(coef, 32, 4, 8)
    lv1 = quant.quant_rdoq(coef, 32, 4, 8, psy_scale=4.0)
    assert np.abs(lv1).sum() >= np.abs(lv0).sum()
    # DC must not be biased
    assert np.array_equal(lv0[:, 0, 0], lv1[:, 0, 0])


def test_psy_rdoq_stream_conformance():
    rng = np.random.default_rng(1)
    W, H = 64, 48
    sess = IntraEncoderSession(W, H, qp=30, cu_size=16, hash_sei=False,
                               rdoq=True, psy_rdoq=2.0)
    y = rng.integers(0, 256, (H, W)).astype(np.uint8)
    u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    fr = sess.encode_frame(y, u, v)
    dec = decode_hevc(sess.headers() + fr.nals, W, H)
    for p in range(3):
        assert np.array_equal(dec[0][p].astype(np.uint8), fr.recon[p])
