"""Temporal MVP (reference --tmvp, cudata.cpp temporal candidate; VERDICT
r2 item 4): temporal merge + AMVP candidates from the collocated frame's
16x16 motion field, SPS/slice signaling, spec 8.5.3.2.8 scaling.
Conformance: libavcodec must reproduce the recon bit-exactly."""
import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _pan_clip(w, h, n):
    rng = np.random.default_rng(13)
    big = rng.integers(0, 256, (h, w + 4 * n)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    return [(big[:, 4 * i:4 * i + w].copy(), u.copy(), v.copy())
            for i in range(n)]


def _encode(frames, **kw):
    sess = VideoEncoderSession(64, 48, qp=32, cu_size=16, keyint=100,
                               hash_sei=False, **kw)
    stream = sess.headers()
    results = [sess.encode_frame(*f) for f in frames]
    for r in results:
        stream += r.nals
    return sess, stream, results


@pytest.mark.parametrize("n_refs", [1, 2])
def test_tmvp_conformance(n_refs):
    frames = _pan_clip(64, 48, 7)
    sess, stream, res = _encode(frames, tmvp=True, n_refs=n_refs)
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(dec) == len(frames)
    for i, (d, r) in enumerate(zip(dec, res)):
        for p in range(3):
            assert np.array_equal(
                d[p][:r.recon[p].shape[0], :r.recon[p].shape[1]]
                .astype(np.uint8), r.recon[p]), f"frame {i} plane {p}"


def test_tmvp_changes_stream():
    """Steady pan: the temporal candidate predicts the global motion, so
    merge/skip selection must differ from the TMVP-off encode."""
    frames = _pan_clip(64, 48, 7)
    _, s_on, _ = _encode(frames, tmvp=True)
    _, s_off, _ = _encode(frames, tmvp=False)
    assert s_on != s_off
