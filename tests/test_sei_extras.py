"""HDR10+ dynamic metadata (ST 2094-40 T.35 SEI), intra refresh, CSV."""

import json

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.bitstream import sei as SEI
from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _frames(n, w, h, seed=0):
    rng = np.random.default_rng(seed)
    return [(rng.integers(0, 256, (h, w)).astype(np.uint8),
             rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
             rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
            for _ in range(n)]


def test_hdr10plus_t35_per_frame(tmp_path):
    recs = [{"TargetedSystemDisplayMaximumLuminance": 400,
             "LuminanceParameters": {"MaxScl": [1, 2, 3], "AverageRGB": 7,
                                     "LuminanceDistributions": {
                                         "DistributionIndex": [50],
                                         "DistributionValues": [100]}},
             "BezierCurveData": {"KneePointX": 1, "KneePointY": 2,
                                 "Anchors": [3, 4]}}] * 3
    path = tmp_path / "d.json"
    json.dump({"SceneInfo": recs}, open(path, "w"))
    loaded = SEI.load_hdr10plus_json(str(path))
    assert len(loaded) == 3
    frames = _frames(3, 64, 48)
    sess = VideoEncoderSession(64, 48, qp=32, keyint=10)
    sess.sei_provider = lambda i: SEI.hdr10plus_sei_for_frame(loaded, i)
    stream = sess.headers()
    recons = []
    for f in frames:
        fr = sess.encode_frame(*f)
        stream += fr.nals
        recons.append(fr.recon)
    # T.35 header: country 0xB5, provider 0x003C, code 0x0001, app 4 ver 1
    assert stream.count(b"\xb5\x00\x3c\x00\x01\x04\x01") >= 3
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(dec) == 3
    for d, r in zip(dec, recons):
        assert np.array_equal(d[0][:48, :64], r[0])


def test_intra_refresh_forces_idr():
    frames = _frames(4, 64, 48, seed=1)
    sess = VideoEncoderSession(64, 48, qp=32, keyint=100)
    types = []
    for i, f in enumerate(frames):
        if i == 2:
            sess.intra_refresh()
        types.append(sess.encode_frame(*f).frame_type)
    assert types == ["I", "P", "I", "P"]
