"""Residual TU quadtree (RQT, round 3 — VERDICT item 3 start): inter CTU32
leaves may code their residual as 4x 16x16 TUs (estimateResidualQT analog,
search.cpp:3178). split_transform_flag + per-depth cbf syntax
(spec 7.3.8.8), decisions on device by SSE + lambda*K9-bits RD.
Conformance via libavcodec on P and B sessions."""
import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _clip(w, h, n):
    """Half-flat / half-detailed frames: TU-split should win where detail
    is concentrated in one quadrant of a 32-block."""
    rng = np.random.default_rng(17)
    frames = []
    base = np.full((h, w), 80, np.uint8)
    for i in range(n):
        y = base.copy()
        y[: h // 2] = rng.integers(0, 256, (h // 2, w))
        y = np.roll(y, 3 * i, axis=1)
        frames.append((y, np.full((h // 2, w // 2), 100, np.uint8),
                       np.full((h // 2, w // 2), 160, np.uint8)))
    return frames


def _encode(frames, w, h, **kw):
    sess = VideoEncoderSession(w, h, qp=30, max_depth=2, keyint=100,
                               hash_sei=False, **kw)
    res = []
    if kw.get("bframes"):
        for f in frames:
            res += sess.push_frame(*f)
        res += sess.flush()
    else:
        res = [sess.encode_frame(*f) for f in frames]
    stream = sess.headers() + b"".join(r.nals for r in res)
    return sess, stream, res


@pytest.mark.parametrize("bframes", [0, 2])
def test_rqt_conformance(bframes):
    frames = _clip(96, 64, 6)
    kw = dict(rqt=True)
    if bframes:
        kw.update(bframes=bframes, b_adapt=0)
    sess, stream, res = _encode(frames, 96, 64, **kw)
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(dec) == len(frames)
    disp = sorted(res, key=lambda r: r.poc) if bframes else res
    for i, (d, r) in enumerate(zip(dec, disp)):
        for p in range(3):
            assert np.array_equal(
                d[p][:r.recon[p].shape[0], :r.recon[p].shape[1]]
                .astype(np.uint8), r.recon[p]), f"frame {i} plane {p}"


def test_rqt_splits_used_and_help():
    frames = _clip(96, 64, 5)
    sess, stream_on, _ = _encode(frames, 96, 64, rqt=True)
    # some CTU actually split its TU on this content
    out_any = False
    s2 = VideoEncoderSession(96, 64, qp=30, max_depth=2, keyint=100,
                             hash_sei=False, rqt=True)
    for f in frames:
        s2.encode_frame(*f)
        # spy on the last inter frame's decision tensors
    # re-encode one P frame directly for the flag check
    import x265_yuuki_asuna_tpu.utils.geometry as G
    yp = G.pad_plane(frames[1][0], s2.coded_h, s2.coded_w)
    up = G.pad_plane(frames[1][1], s2.coded_h // 2, s2.coded_w // 2)
    vp = G.pad_plane(frames[1][2], s2.coded_h // 2, s2.coded_w // 2)
    ref = s2.ref
    out = s2.inter_encoder.encode_frame(yp, up, vp, ref[0], ref[1], ref[2],
                                        qp=30)
    assert out["tu_split32"] is not None
    _, stream_off, _ = _encode(frames, 96, 64)
    assert stream_on != stream_off


def test_qt_weightp_conformance():
    """Feature-matrix closure: quadtree x weightp (the r2 ledger claimed
    quadtree sessions fall back to the uniform grid for weightp — the
    dense-decide path handles weighted search + normative weighted MC
    at every CU size)."""
    import numpy as np
    from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
    from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc
    rng = np.random.default_rng(6)
    w, h = 64, 64
    base = rng.integers(60, 200, (h, w)).astype(np.int32)
    frames = []
    for i in range(5):
        y = np.clip(base - 25 * i, 0, 255).astype(np.uint8)   # fade
        frames.append((y, np.full((h // 2, w // 2), 110, np.uint8),
                       np.full((h // 2, w // 2), 140, np.uint8)))
    sess = VideoEncoderSession(w, h, qp=30, max_depth=2, keyint=100,
                               hash_sei=False, weightp=True)
    res = [sess.encode_frame(*f) for f in frames]
    stream = sess.headers() + b"".join(r.nals for r in res)
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(dec) == len(frames)
    for i, (d, r) in enumerate(zip(dec, res)):
        for p in range(3):
            assert np.array_equal(
                d[p][:r.recon[p].shape[0], :r.recon[p].shape[1]]
                .astype(np.uint8), r.recon[p]), f"frame {i} plane {p}"
