"""4:4:4 intra conformance (Main 4:4:4 RExt profile)."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_i444_intra_conformance():
    rng = np.random.default_rng(11)
    W, H = 64, 48
    sess = IntraEncoderSession(W, H, qp=30, cu_size=16, hash_sei=False,
                               csp="i444")
    y = rng.integers(0, 256, (H, W)).astype(np.uint8)
    u = rng.integers(0, 256, (H, W)).astype(np.uint8)
    v = rng.integers(0, 256, (H, W)).astype(np.uint8)
    fr = sess.encode_frame(y, u, v)
    stream = sess.headers() + fr.nals
    dec = decode_hevc(stream, W, H, csp_shifts=(0, 0))
    assert len(dec) == 1
    for p in range(3):
        assert np.array_equal(dec[0][p].astype(np.uint8), fr.recon[p])


def test_i444_multiframe_aq():
    rng = np.random.default_rng(12)
    W, H = 48, 32
    sess = IntraEncoderSession(W, H, qp=32, cu_size=16, hash_sei=False,
                               csp="i444", aq_mode=0)
    stream = sess.headers()
    recons = []
    for i in range(2):
        y = rng.integers(0, 256, (H, W)).astype(np.uint8)
        u = np.full((H, W), 80 + i, np.uint8)
        v = rng.integers(0, 256, (H, W)).astype(np.uint8)
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    dec = decode_hevc(stream, W, H, csp_shifts=(0, 0))
    assert len(dec) == 2
    for d, r in zip(dec, recons):
        for p in range(3):
            assert np.array_equal(d[p].astype(np.uint8), r[p])
