"""AQ (per-CU QP) composed with the in-loop filters: the loop filter must
derive thresholds from per-edge AVERAGED QPs (spec 8.7.2.5.3), matching the
decoder bit-exactly."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import (IntraEncoderSession,
                                                     VideoEncoderSession)
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _frames(n, W, H, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (H, W))
    out = []
    for i in range(n):
        y = np.zeros((H, W), np.uint8)
        y[:, :W // 2] = 100                          # flat: low AQ QP
        y[:, W // 2:] = np.roll(base, i, 1)[:, W // 2:]  # noisy: high AQ QP
        u = np.full((H // 2, W // 2), 90 + i, np.uint8)
        v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        out.append((y, u, v))
    return out


def _check(sess, frames, W, H):
    stream = sess.headers()
    recons = []
    if hasattr(sess, "push_frame") and getattr(sess, "bframes", 0):
        results = []
        for y, u, v in frames:
            results += sess.push_frame(y, u, v)
        results += sess.flush()
    else:
        results = [sess.encode_frame(*f) for f in frames]
    for fr in results:
        stream += fr.nals
        recons.append(fr.recon)
    dec = decode_hevc(stream, W, H)
    assert len(dec) == len(frames)
    # compare in coding order against results order only for all-intra;
    # for video sessions just require full decode + match by search
    if len(recons) and not getattr(sess, "bframes", 0):
        order = dec if not hasattr(sess, "push_frame") else dec
        for d, r in zip(order, recons):
            for p in range(3):
                assert np.array_equal(d[p].astype(np.uint8), r[p])


def test_intra_uniform_aq_deblock():
    W, H = 64, 48
    sess = IntraEncoderSession(W, H, qp=32, cu_size=16, hash_sei=False,
                               aq_mode=2, aq_strength=2.0, deblock=True)
    assert sess.deblock and sess.aq_mode
    _check(sess, _frames(2, W, H), W, H)


def test_intra_qt_aq_deblock():
    W, H = 64, 64
    sess = IntraEncoderSession(W, H, qp=32, cu_size=32, max_depth=2,
                               hash_sei=False, aq_mode=1, aq_strength=2.0,
                               deblock=True)
    _check(sess, _frames(2, W, H, seed=5), W, H)


def test_video_ippp_aq_deblock_sao():
    W, H = 64, 48
    sess = VideoEncoderSession(W, H, qp=32, cu_size=16, keyint=8,
                               hash_sei=False, aq_mode=2, aq_strength=2.0,
                               deblock=True, sao=True)
    assert sess.deblock and sess.sao and sess.aq_mode
    _check(sess, _frames(5, W, H, seed=7), W, H)


def test_aq_deblock_with_skipped_ctus():
    """CTUs with no coded residual keep the PREDICTED QP on the decoder
    side; the loop filter must use that, not the AQ-intended QP (found by
    construction: one flat CTU that codes nothing at a very different AQ
    offset than its neighbors)."""
    W, H = 64, 48
    rng = np.random.default_rng(21)
    sess = VideoEncoderSession(W, H, qp=37, cu_size=16, keyint=8,
                               hash_sei=False, aq_mode=1, aq_strength=3.0,
                               deblock=True)
    base = rng.integers(0, 256, (H, W))
    stream = sess.headers()
    recons = []
    for i in range(4):
        y = np.roll(base, i, axis=1).astype(np.uint8)
        y[:16, :16] = 128                      # dead-flat CTU: likely no cbf
        u = np.full((H // 2, W // 2), 128, np.uint8)
        v = np.full((H // 2, W // 2), 128, np.uint8)
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    dec = decode_hevc(stream, W, H)
    assert len(dec) == 4
    for d, r in zip(dec, recons):
        for p in range(3):
            assert np.array_equal(d[p].astype(np.uint8), r[p])


def test_b_frames_per_cu_qp():
    """AQ per-CU QP on B frames (uniform grid) with deblock."""
    W, H = 64, 48
    rng = np.random.default_rng(31)
    sess = VideoEncoderSession(W, H, qp=35, cu_size=16, keyint=20,
                               bframes=2, hash_sei=False, aq_mode=2,
                               aq_strength=2.5, deblock=True)
    base = rng.integers(0, 256, (H, W))
    stream = sess.headers()
    results = []
    for i in range(7):
        y = np.roll(base, i, axis=1).astype(np.uint8)
        y[:, :32] = 100                       # flat half: AQ spread
        u = np.full((H // 2, W // 2), 128, np.uint8)
        v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        results += sess.push_frame(y, u, v)
    results += sess.flush()
    recons = []
    for fr in results:
        stream += fr.nals
        recons.append(fr.recon)
    assert any(fr.frame_type in ("B", "b") for fr in results)
    dec = decode_hevc(stream, W, H)
    assert len(dec) == 7
    for d in dec:
        ok = any(all(np.array_equal(d[p].astype(np.uint8), r[p])
                     for p in range(3)) for r in recons)
        assert ok
