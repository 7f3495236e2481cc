"""Inter AQ (per-CU QP in P slices via cu_qp_delta) and cuTree
(lookahead cost propagation -> negative offsets on referenced areas)."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc
from tests.test_inter_deblock import _moving_scene


def _roundtrip(sess, frames):
    stream = sess.headers()
    recons = []
    for f in frames:
        fr = sess.encode_frame(*f)
        stream += fr.nals
        recons.append(fr.recon)
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(decoded) == len(frames)
    for i, (d, r) in enumerate(zip(decoded, recons)):
        for p in range(3):
            assert np.array_equal(
                d[p][:r[p].shape[0], :r[p].shape[1]].astype(np.uint8), r[p]), \
                f"frame {i} plane {p}"


def test_inter_aq_conformance():
    """aq-mode 2 on an IPPP session: per-CU cu_qp_delta in P slices."""
    sess = VideoEncoderSession(64, 48, qp=32, cu_size=16, keyint=100,
                               hash_sei=False, aq_mode=2, aq_strength=1.5)
    _roundtrip(sess, _moving_scene(64, 48, 4))


def test_cutree_conformance_and_offsets():
    sess = VideoEncoderSession(64, 48, qp=35, cu_size=16, keyint=100,
                               hash_sei=False, cutree=True)
    frames = _moving_scene(64, 48, 5)
    _roundtrip(sess, frames)
    # after several well-predicted frames the accumulator must produce
    # negative offsets somewhere (referenced areas get better quality)
    off = sess._cutree_offsets()
    assert off.min() <= -1, off
