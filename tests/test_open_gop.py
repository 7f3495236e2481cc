"""Open GOP: CRA keyframes with RASL leading pictures (--open-gop)."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _nal_types(stream):
    types = []
    i = 0
    while True:
        j = stream.find(b"\x00\x00\x01", i)
        if j < 0:
            return types
        types.append((stream[j + 3] >> 1) & 0x3f)
        i = j + 3


def test_open_gop_cra_rasl_conformance():
    W, H = 64, 48
    rng = np.random.default_rng(4)
    base = rng.integers(0, 256, (H, W))
    sess = VideoEncoderSession(W, H, qp=32, cu_size=16, keyint=3, bframes=3,
                               hash_sei=False, open_gop=True)
    N = 10
    stream = sess.headers()
    recons = []
    results = []
    for i in range(N):
        y = np.roll(base, i * 2, axis=1).astype(np.uint8)
        u = np.full((H // 2, W // 2), 100 + 3 * i, np.uint8)
        v = np.full((H // 2, W // 2), 200 - 3 * i, np.uint8)
        results += sess.push_frame(y, u, v)
    results += sess.flush()
    for fr in results:
        stream += fr.nals
        recons.append(fr.recon)
    types = _nal_types(stream)
    assert 21 in types, "no CRA emitted"   # CRA_NUT
    assert 8 in types, "no RASL leading picture"  # RASL_N
    assert 19 in types, "first keyframe must stay IDR"
    dec = decode_hevc(stream, W, H)
    assert len(dec) == N
    # every decoded frame must equal one of the recons exactly
    for d in dec:
        ok = any(all(np.array_equal(d[p].astype(np.uint8), r[p])
                     for p in range(3)) for r in recons)
        assert ok
