"""Depth-1 CU quadtree on P slices (CTU32 -> 4x16, in-scan RD decision,
position-based merge/AMVP derivation at 16-pel granularity).

Conformance: libavcodec decode must reproduce the encoder recon bit-exactly
across an IPPP GOP with mixed split/unsplit CTUs; RD must not lose to the
uniform grid (reference analog: compressInterCU_rd0_4, analysis.cpp:1146)."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _moving_clip(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 64, w + 64)).astype(np.uint8)
    base[0:h // 2] = (np.add.outer(np.arange(h // 2),
                                   np.arange(w + 64)) % 256).astype(np.uint8)
    out = []
    for i in range(n):
        dx, dy = 2 * i, i
        y = base[dy:dy + h, dx:dx + w].copy()
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8) if i == 0 \
            else out[-1][1]
        v = np.full((h // 2, w // 2), 100 + 5 * i, np.uint8)
        out.append((y, u, v))
    return out


def test_quadtree_p_conformance():
    w, h = 176, 144
    frames = _moving_clip(w, h, 4, seed=5)
    sess = VideoEncoderSession(w, h, qp=31, keyint=10, max_depth=1)
    stream = sess.headers()
    recons = []
    for (y, u, v) in frames:
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(dec) == len(frames)
    for (dy, du, dv), (ry, ru, rv) in zip(dec, recons):
        assert np.array_equal(dy[:h, :w], ry)
        assert np.array_equal(du[:h // 2, :w // 2], ru)
        assert np.array_equal(dv[:h // 2, :w // 2], rv)


def test_quadtree_p_mixed_depths_and_modes():
    w, h = 160, 96
    frames = _moving_clip(w, h, 3, seed=9)
    sess = VideoEncoderSession(w, h, qp=32, keyint=10, max_depth=1,
                               hash_sei=False)
    sess.encode_frame(*frames[0])
    out = None
    import x265_yuuki_asuna_tpu.utils.geometry as G
    yp = G.pad_plane(frames[1][0], sess.coded_h, sess.coded_w)
    up = G.pad_plane(frames[1][1], sess.coded_h // 2, sess.coded_w // 2)
    vp = G.pad_plane(frames[1][2], sess.coded_h // 2, sess.coded_w // 2)
    out = sess.inter_encoder.encode_frame(yp, up, vp, *sess.ref, qp=32)
    # mixed content: both depths used, and inter CUs dominate a pan
    assert out["split"].any()
    n_inter = np.sum(~out["use_intra"][~out["split"]])
    assert n_inter > 0


def test_quadtree_p_native_matches_python():
    from x265_yuuki_asuna_tpu.bitstream import native
    if not native.available():
        pytest.skip("native lib unavailable")
    w, h = 160, 96
    frames = _moving_clip(w, h, 3, seed=2)
    def run():
        sess = VideoEncoderSession(w, h, qp=30, keyint=10, max_depth=1,
                                   hash_sei=False)
        return b"".join(sess.encode_frame(*f).nals for f in frames)
    s_native = run()
    orig = native.encode_p_slice_qt
    try:
        native.encode_p_slice_qt = lambda *a, **k: None
        s_python = run()
    finally:
        native.encode_p_slice_qt = orig
    assert s_native == s_python


def test_quadtree_deblock_conformance():
    # QT + in-loop deblocking (16-pel edge grid, interior edges of unsplit
    # CTUs off) must stay decoder-exact across an IPPP GOP
    w, h = 176, 144
    frames = _moving_clip(w, h, 3, seed=13)
    sess = VideoEncoderSession(w, h, qp=30, keyint=10, max_depth=1,
                               deblock=True)
    stream = sess.headers()
    recons = []
    for (y, u, v) in frames:
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(dec) == len(frames)
    for (dy, du, dv), (ry, ru, rv) in zip(dec, recons):
        assert np.array_equal(dy[:h, :w], ry)
        assert np.array_equal(du[:h // 2, :w // 2], ru)
        assert np.array_equal(dv[:h // 2, :w // 2], rv)


def test_quadtree_deblock_sao_conformance():
    # full in-loop filter chain (deblock -> SAO) on quadtree frames
    w, h = 176, 144
    frames = _moving_clip(w, h, 3, seed=21)
    sess = VideoEncoderSession(w, h, qp=30, keyint=10, max_depth=1,
                               deblock=True, sao=True)
    stream = sess.headers()
    recons = []
    for (y, u, v) in frames:
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(dec) == len(frames)
    for (dy, du, dv), (ry, ru, rv) in zip(dec, recons):
        assert np.array_equal(dy[:h, :w], ry)
        assert np.array_equal(du[:h // 2, :w // 2], ru)
        assert np.array_equal(dv[:h // 2, :w // 2], rv)


def test_quadtree_aq_cutree_conformance():
    # per-CTU QP (QG == CTU) with the quadtree: cu_qp_delta at the first
    # coded cbf of each CTU
    w, h = 176, 144
    frames = _moving_clip(w, h, 3, seed=31)
    for kw in (dict(aq_mode=2), dict(cutree=True)):
        sess = VideoEncoderSession(w, h, qp=32, keyint=10, max_depth=1, **kw)
        stream = sess.headers()
        recons = []
        for (y, u, v) in frames:
            fr = sess.encode_frame(y, u, v)
            stream += fr.nals
            recons.append(fr.recon)
        dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
        assert len(dec) == len(frames)
        for (dy, du, dv), (ry, ru, rv) in zip(dec, recons):
            assert np.array_equal(dy[:h, :w], ry)
            assert np.array_equal(du[:h // 2, :w // 2], ru)
            assert np.array_equal(dv[:h // 2, :w // 2], rv)


def _run_b_qt(w, h, frames, qp=30, bframes=3, **kw):
    sess = VideoEncoderSession(w, h, qp=qp, keyint=100, hash_sei=False,
                               bframes=bframes, max_depth=1, **kw)
    stream = sess.headers()
    results = []
    for (y, u, v) in frames:
        results += sess.push_frame(y, u, v)
    results += sess.flush()
    for fr in results:
        stream += fr.nals
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(decoded) == len(frames)
    segments, cur = [], []
    for fr in results:
        if fr.poc == 0 and cur:
            segments.append(cur)
            cur = []
        cur.append(fr)
    segments.append(cur)
    display = [fr for seg in segments for fr in sorted(seg, key=lambda f: f.poc)]
    for i, (d, fr) in enumerate(zip(decoded, display)):
        for p in range(3):
            got = d[p][:fr.recon[p].shape[0], :fr.recon[p].shape[1]]
            assert np.array_equal(got.astype(np.uint8), fr.recon[p]), \
                f"frame {i} plane {p} mismatch"


def test_quadtree_b_conformance():
    # B slices with quadtree: bi/uni per CU at both depths, POC-scaled AMVP,
    # combined-bi merge, B-pyramid reordering
    frames = _moving_clip(176, 144, 7, seed=41)
    _run_b_qt(176, 144, frames)


def test_quadtree_b_filters_conformance():
    frames = _moving_clip(160, 96, 6, seed=43)
    _run_b_qt(160, 96, frames, deblock=True, sao=True)


def test_quadtree_depth2_conformance():
    # depth-2 (8x8 CUs): I, P and B slices, bit-exact vs libavcodec
    w, h = 160, 96
    frames = _moving_clip(w, h, 5, seed=51)
    sess = VideoEncoderSession(w, h, qp=31, keyint=25, max_depth=2,
                               bframes=2)
    stream = sess.headers()
    results = []
    for (y, u, v) in frames:
        results += sess.push_frame(y, u, v)
    results += sess.flush()
    for fr in results:
        stream += fr.nals
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(decoded) == len(frames)
    display = sorted(results, key=lambda f: f.poc)
    for i, (d, fr) in enumerate(zip(decoded, display)):
        for p in range(3):
            got = d[p][:fr.recon[p].shape[0], :fr.recon[p].shape[1]]
            assert np.array_equal(got.astype(np.uint8), fr.recon[p]), \
                f"frame {i} plane {p}"


def test_quadtree_depth2_filters_conformance():
    # depth-2 with full loop filters: BS on the 8-pel grid masked to true
    # CU boundaries (cu_id map); chroma stays on the 16-luma grid
    w, h = 160, 96
    frames = _moving_clip(w, h, 4, seed=61)
    sess = VideoEncoderSession(w, h, qp=30, keyint=10, max_depth=2,
                               deblock=True, sao=True)
    stream = sess.headers()
    recons = []
    for (y, u, v) in frames:
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(dec) == len(frames)
    for (dy, du, dv), (ry, ru, rv) in zip(dec, recons):
        assert np.array_equal(dy[:h, :w], ry)
        assert np.array_equal(du[:h // 2, :w // 2], ru)
        assert np.array_equal(dv[:h // 2, :w // 2], rv)


def test_hme_tracks_fast_pan():
    # 24 px/frame pan exceeds the +-16 fine search; the half-res coarse
    # search must recenter it (reference --hme)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (120, 360)).astype(np.uint8)
    frames = []
    for i in range(3):
        y = base[8:8 + 96, 24 * i:24 * i + 160].copy()
        u = np.full((48, 80), 100, np.uint8)
        v = np.full((48, 80), 140, np.uint8)
        frames.append((y, u, v))
    bits = {}
    for label, kw in (("plain", {}), ("hme", dict(hme=True))):
        sess = VideoEncoderSession(160, 96, qp=32, keyint=25, max_depth=1,
                                   hash_sei=False, **kw)
        stream = sess.headers()
        recons = []
        total = 0
        for f in frames:
            fr = sess.encode_frame(*f)
            stream += fr.nals
            total += fr.bits
            recons.append(fr.recon)
        dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
        assert len(dec) == 3
        for d, r in zip(dec, recons):
            assert np.array_equal(d[0][:96, :160], r[0])
        bits[label] = total
    assert bits["hme"] < 0.7 * bits["plain"], bits


def test_weightp_quadtree_conformance():
    # explicit weighted prediction with quadtree P slices on a fade
    rng = np.random.default_rng(0)
    base = rng.integers(40, 200, (96, 160)).astype(np.int32)
    frames = []
    for i in range(3):
        y = np.clip(base * (1.0 - 0.2 * i), 0, 255).astype(np.uint8)
        u = np.full((48, 80), 110, np.uint8)
        v = np.full((48, 80), 130, np.uint8)
        frames.append((y, u, v))
    sess = VideoEncoderSession(160, 96, qp=30, keyint=25, max_depth=1,
                               weightp=True, hash_sei=False)
    stream = sess.headers()
    recons = []
    for f in frames:
        fr = sess.encode_frame(*f)
        stream += fr.nals
        recons.append(fr.recon)
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(dec) == 3
    for d, r in zip(dec, recons):
        assert np.array_equal(d[0][:96, :160], r[0])
        assert np.array_equal(d[1][:48, :80], r[1])
        assert np.array_equal(d[2][:48, :80], r[2])


def test_qt_compact_levels_overflow_fallback():
    """The QT paths transfer levels as packed int8 pairs (halves the
    device->host bytes); frames with |level| > 127 must transparently
    rerun through the lazily compiled int16 variant. QP 4 + harsh content
    forces the overflow."""
    rng = np.random.default_rng(3)
    w = h = 64
    y0 = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u0 = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v0 = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    y1 = (255 - y0)                        # violent change -> huge residual
    sess = VideoEncoderSession(w, h, qp=4, max_depth=2, keyint=100,
                               hash_sei=False)
    sess.scenecut_enabled = False
    r0 = sess.encode_frame(y0, u0, v0)
    r1 = sess.encode_frame(y1, u0, v0)
    assert sess.inter_encoder._full_qt is not None, \
        "expected the int16 overflow fallback to trigger at QP 4"
    stream = sess.headers() + r0.nals + r1.nals
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(dec) == 2
    for d, r in zip(dec, (r0, r1)):
        for p in range(3):
            assert np.array_equal(
                d[p][:r.recon[p].shape[0], :r.recon[p].shape[1]]
                .astype(np.uint8), r.recon[p])
