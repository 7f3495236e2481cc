"""Weighted prediction (P slices): pred_weight_table syntax + normative
MC->weight pipeline, verified bit-exact vs libavcodec on a fade."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _fade(w, h, n, seed=0):
    """Smooth moving scene with a global brightness ramp (classic weightp
    content: uni-pred against the unweighted reference fails badly)."""
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for i in range(n):
        gain = 1.0 - 0.12 * i
        y = np.clip((((xs * 1.7 + ys + i * 4) % 256) * gain), 0, 255)
        u = np.clip(((xs[:h // 2, :w // 2] + 64) % 256) * gain, 0, 255)
        v = np.clip(((ys[:h // 2, :w // 2] + 128) % 256) * gain, 0, 255)
        out.append((y.astype(np.uint8), u.astype(np.uint8),
                    v.astype(np.uint8)))
    return out


def _run(weightp):
    frames = _fade(64, 48, 5)
    sess = VideoEncoderSession(64, 48, qp=32, cu_size=16, keyint=100,
                               hash_sei=False, weightp=weightp)
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


def test_weightp_conformance_and_gain():
    b_w = _run(True)
    b_p = _run(False)
    assert b_w < b_p, f"weightp should win on a fade: {b_w} vs {b_p}"


def test_weightp_identity_weights_conformant():
    """weightp enabled but static content -> analysis picks no weights;
    the always-present pred_weight_table must still decode."""
    rng = np.random.default_rng(3)
    frames = []
    base = rng.integers(0, 256, (80, 96)).astype(np.uint8)
    for i in range(3):
        frames.append((base[i:i + 48, i:i + 64].copy(),
                       rng.integers(0, 256, (24, 32)).astype(np.uint8),
                       rng.integers(0, 256, (24, 32)).astype(np.uint8)))
    sess = VideoEncoderSession(64, 48, qp=32, cu_size=16, keyint=100,
                               hash_sei=False, weightp=True)
    stream = sess.headers()
    recons = []
    for f in frames:
        fr = sess.encode_frame(*f)
        stream += fr.nals
        recons.append(fr.recon)
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    for d, r in zip(decoded, recons):
        for p in range(3):
            assert np.array_equal(
                d[p][:r[p].shape[0], :r[p].shape[1]].astype(np.uint8), r[p])
