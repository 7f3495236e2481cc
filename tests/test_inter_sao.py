"""SAO on inter sessions (P and B slices): per-CTU SAO syntax + decoder-exact
application after deblocking — conformance vs libavcodec."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc
from tests.test_inter_deblock import _moving_scene


def _check(sess, frames, use_push):
    stream = sess.headers()
    results = []
    if use_push:
        for f in frames:
            results += sess.push_frame(*f)
        results += sess.flush()
    else:
        results = [sess.encode_frame(*f) for f in frames]
        for i, fr in enumerate(results):
            fr.poc = i
    for fr in results:
        stream += fr.nals
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(decoded) == len(frames)
    display = sorted(results, key=lambda f: f.poc) if use_push else results
    for i, (d, fr) in enumerate(zip(decoded, display)):
        for p in range(3):
            r = fr.recon[p]
            assert np.array_equal(
                d[p][:r.shape[0], :r.shape[1]].astype(np.uint8), r), \
                f"frame {i} plane {p}"


def test_p_slice_sao_conformance():
    sess = VideoEncoderSession(64, 48, qp=40, cu_size=16, keyint=100,
                               hash_sei=False, sao=True)
    _check(sess, _moving_scene(64, 48, 4), use_push=False)


def test_p_slice_sao_plus_deblock_conformance():
    sess = VideoEncoderSession(64, 48, qp=40, cu_size=16, keyint=100,
                               hash_sei=False, sao=True, deblock=True)
    _check(sess, _moving_scene(64, 48, 4, seed=1), use_push=False)


def test_b_slice_sao_deblock_conformance():
    sess = VideoEncoderSession(64, 48, qp=38, cu_size=16, keyint=100,
                               hash_sei=False, sao=True, deblock=True,
                               bframes=1)
    _check(sess, _moving_scene(64, 48, 5, seed=2), use_push=True)


def test_rdoq_stream_conformance():
    """RDOQ is encoder-side only: any level map must stay decodable."""
    sess = VideoEncoderSession(64, 48, qp=32, cu_size=16, keyint=100,
                               hash_sei=False, deblock=True, rdoq=True)
    _check(sess, _moving_scene(64, 48, 3, seed=3), use_push=False)
