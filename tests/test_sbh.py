"""Sign-bit hiding conformance: the decoder infers each CG's first sign from
the abs-sum parity; our device-side parity adjustment + recon must match
libavcodec exactly, and SBH should save bits."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import (IntraEncoderSession,
                                                     VideoEncoderSession)
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc
from tests.test_inter_deblock import _moving_scene


def _frames(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, u, v))
    return out


def _roundtrip(sess, frames, use_intra_api=True):
    stream = sess.headers()
    bits = 0
    recons = []
    for f in frames:
        fr = sess.encode_frame(*f)
        stream += fr.nals
        bits += fr.bits
        recons.append(fr.recon)
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(decoded) == len(frames)
    for i, (d, r) in enumerate(zip(decoded, recons)):
        for p in range(3):
            assert np.array_equal(
                d[p][:r[p].shape[0], :r[p].shape[1]].astype(np.uint8), r[p]), \
                f"frame {i} plane {p}"
    return bits


def test_sbh_intra_conformance_and_gain():
    frames = _frames(64, 48, 2)      # noisy content = dense CGs, SBH active
    b_sbh = _roundtrip(IntraEncoderSession(64, 48, qp=22, cu_size=16,
                                           hash_sei=False, sbh=True), frames)
    b_ref = _roundtrip(IntraEncoderSession(64, 48, qp=22, cu_size=16,
                                           hash_sei=False), frames)
    assert b_sbh < b_ref, f"SBH should save bits: {b_sbh} vs {b_ref}"


def test_sbh_inter_conformance():
    sess = VideoEncoderSession(64, 48, qp=28, cu_size=16, keyint=100,
                               hash_sei=False, deblock=True, sbh=True)
    frames = _moving_scene(64, 48, 4)
    stream = sess.headers()
    recons = []
    for f in frames:
        fr = sess.encode_frame(*f)
        stream += fr.nals
        recons.append(fr.recon)
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    for i, (d, r) in enumerate(zip(decoded, recons)):
        for p in range(3):
            assert np.array_equal(
                d[p][:r[p].shape[0], :r[p].shape[1]].astype(np.uint8), r[p]), \
                f"frame {i} plane {p}"


def test_sbh_bframes_conformance():
    sess = VideoEncoderSession(64, 48, qp=30, cu_size=16, keyint=100,
                               hash_sei=False, sbh=True, bframes=1)
    frames = _moving_scene(64, 48, 4, seed=5)
    stream = sess.headers()
    results = []
    for f in frames:
        results += sess.push_frame(*f)
    results += sess.flush()
    for fr in results:
        stream += fr.nals
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    display = sorted(results, key=lambda f: f.poc)
    for i, (d, fr) in enumerate(zip(decoded, display)):
        for p in range(3):
            r = fr.recon[p]
            assert np.array_equal(
                d[p][:r.shape[0], :r.shape[1]].astype(np.uint8), r), \
                f"frame {i} plane {p}"
