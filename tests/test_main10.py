"""Main10 (10-bit) conformance."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_main10_intra_conformance():
    rng = np.random.default_rng(7)
    W, H = 64, 48
    sess = IntraEncoderSession(W, H, qp=27, cu_size=16, bit_depth=10,
                               hash_sei=False)
    stream = sess.headers()
    recons = []
    for i in range(2):
        y = rng.integers(0, 1024, (H, W)).astype(np.uint16)
        u = rng.integers(0, 1024, (H // 2, W // 2)).astype(np.uint16)
        v = rng.integers(0, 1024, (H // 2, W // 2)).astype(np.uint16)
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    for d, r in zip(decode_hevc(stream, W, H, bit_depth=10), recons):
        for p in range(3):
            assert np.array_equal(d[p].astype(np.uint16), r[p])


def test_main10_video_sessions():
    """10-bit inter: IPPP uniform, quadtree+deblock, and B quadtree."""
    from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
    rng = np.random.default_rng(0)
    base = rng.integers(0, 1024, (64 + 16, 96 + 16)).astype(np.uint16)
    frames = []
    for i in range(3):
        y = base[i:i + 64, 2 * i:2 * i + 96].copy()
        u = rng.integers(0, 1024, (32, 48)).astype(np.uint16) if i == 0 \
            else frames[-1][1]
        v = np.full((32, 48), 512, np.uint16)
        frames.append((y, u, v))
    for kw in (dict(cu_size=16), dict(max_depth=1, deblock=True)):
        sess = VideoEncoderSession(96, 64, qp=31, keyint=25, bit_depth=10,
                                   **kw)
        stream = sess.headers()
        recons = []
        for f in frames:
            fr = sess.encode_frame(*f)
            stream += fr.nals
            recons.append(fr.recon)
        dec = decode_hevc(stream, sess.coded_w, sess.coded_h, bit_depth=10)
        assert len(dec) == len(frames)
        for d, r in zip(dec, recons):
            assert np.array_equal(d[0][:64, :96].astype(np.uint16), r[0])
            assert np.array_equal(d[1][:32, :48].astype(np.uint16), r[1])
            assert np.array_equal(d[2][:32, :48].astype(np.uint16), r[2])
