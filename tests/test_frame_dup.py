"""Frame duplication (reference --frame-dup/--dup-threshold,
encoder.cpp:1613): near-identical consecutive frames encode as ALL-SKIP
P slices (no device pass); decoders reproduce the reference picture."""
import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_frame_dup_all_skip():
    rng = np.random.default_rng(9)
    y = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    u = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    v = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    y2 = np.roll(y, 2, axis=1)
    frames = [(y, u, v), (y, u, v), (y, u, v), (y2, u, v), (y2, u, v)]
    sess = VideoEncoderSession(64, 48, qp=30, cu_size=16, keyint=100,
                               hash_sei=False, frame_dup=True)
    res = [sess.encode_frame(*f) for f in frames]
    # frames 1, 2 and 4 are duplicates: tiny all-skip slices
    assert res[1].bits < res[0].bits // 10
    assert res[2].bits < res[0].bits // 10
    assert res[3].bits > res[1].bits          # real motion re-encodes
    assert res[4].bits < res[3].bits // 5
    stream = sess.headers() + b"".join(r.nals for r in res)
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(dec) == len(frames)
    for i, (d, r) in enumerate(zip(dec, res)):
        for p in range(3):
            assert np.array_equal(
                d[p][:r.recon[p].shape[0], :r.recon[p].shape[1]]
                .astype(np.uint8), r.recon[p]), f"frame {i} plane {p}"
