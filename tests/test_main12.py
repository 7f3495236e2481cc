"""Main12 (12-bit) conformance."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import (IntraEncoderSession,
                                                     VideoEncoderSession)
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_main12_intra_conformance():
    rng = np.random.default_rng(6)
    W, H = 64, 48
    sess = IntraEncoderSession(W, H, qp=30, cu_size=16, bit_depth=12,
                               hash_sei=False)
    y = rng.integers(0, 4096, (H, W)).astype(np.uint16)
    u = rng.integers(0, 4096, (H // 2, W // 2)).astype(np.uint16)
    v = rng.integers(0, 4096, (H // 2, W // 2)).astype(np.uint16)
    fr = sess.encode_frame(y, u, v)
    dec = decode_hevc(sess.headers() + fr.nals, W, H, bit_depth=12)
    for p in range(3):
        assert np.array_equal(dec[0][p].astype(np.uint16), fr.recon[p])


def test_main12_inter_conformance():
    rng = np.random.default_rng(8)
    W, H = 64, 48
    sess = VideoEncoderSession(W, H, qp=30, cu_size=16, bit_depth=12,
                               keyint=4, hash_sei=False)
    base = rng.integers(0, 4096, (H, W))
    stream = sess.headers()
    recons = []
    for i in range(4):
        y = np.roll(base, i, axis=1).astype(np.uint16)
        u = np.full((H // 2, W // 2), 2000 + i, np.uint16)
        v = np.full((H // 2, W // 2), 1000 - i, np.uint16)
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    dec = decode_hevc(stream, W, H, bit_depth=12)
    assert len(dec) == 4
    for d, r in zip(dec, recons):
        for p in range(3):
            assert np.array_equal(d[p].astype(np.uint16), r[p])
