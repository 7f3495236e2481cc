"""WPP (entropy_coding_sync): per-CTU-row CABAC substreams with context
inheritance + entry point offsets — conformance vs libavcodec (which
exercises the entry points with its own wavefront threading)."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _frames(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        y = (np.add.outer(np.arange(h) * 2, np.arange(w) * 3) + i * 7
             ).astype(np.uint8)
        y[:, ::9] = rng.integers(0, 256, (h, (w + 8) // 9)).astype(np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, u, v))
    return out


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


def test_wpp_conformance():
    sess = IntraEncoderSession(64, 64, qp=30, cu_size=16, hash_sei=False,
                               wpp=True)
    _roundtrip(sess, _frames(64, 64, 3))


def test_wpp_with_sao_deblock():
    sess = IntraEncoderSession(64, 48, qp=37, cu_size=16, hash_sei=False,
                               wpp=True, sao=True, deblock=True)
    _roundtrip(sess, _frames(64, 48, 2, seed=2))


def test_wpp_single_column():
    """Degenerate geometry: one CTU per row (sync point == first CTU)."""
    sess = IntraEncoderSession(16, 64, qp=30, cu_size=16, hash_sei=False,
                               wpp=True)
    _roundtrip(sess, _frames(16, 64, 2, seed=3))
