"""Depth-1 CU quadtree (CTU32 -> 4x16) intra encoding.

The in-scan RD decision must produce conformant streams (libavcodec decode
== encoder recon, bit-exact) and should strictly improve rate-distortion
over both uniform grids on mixed content (the reference's compressIntraCU
quadtree analog, analysis.cpp:514)."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _mixed_frame(w, h, seed=0):
    rng = np.random.default_rng(seed)
    y = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8)
    y[h // 4:3 * h // 4, w // 3:] = rng.integers(0, 256,
                                                 (h // 2, w - w // 3))
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = (np.add.outer(np.arange(h // 2) * 3, np.arange(w // 2)) % 256
         ).astype(np.uint8)
    return y, u, v


def test_quadtree_intra_conformance():
    w, h = 96, 64
    sess = IntraEncoderSession(w, h, qp=30, max_depth=1)
    stream = sess.headers()
    recons = []
    for i in range(2):
        y, u, v = _mixed_frame(w, h, seed=i)
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(decoded) == 2
    for (dy, du, dv), (ry, ru, rv) in zip(decoded, recons):
        assert np.array_equal(dy[:h, :w], ry)
        assert np.array_equal(du[:h // 2, :w // 2], ru)
        assert np.array_equal(dv[:h // 2, :w // 2], rv)


def test_quadtree_uses_both_depths():
    # mixed content must produce a mixture of split and unsplit CTUs
    w, h = 128, 96
    y, u, v = _mixed_frame(w, h, seed=7)
    sess = IntraEncoderSession(w, h, qp=32, max_depth=1, hash_sei=False)
    yp = np.pad(y, ((0, sess.coded_h - h), (0, sess.coded_w - w)), mode="edge")
    up = np.pad(u, ((0, (sess.coded_h - h) // 2), (0, (sess.coded_w - w) // 2)),
                mode="edge")
    vp = np.pad(v, ((0, (sess.coded_h - h) // 2), (0, (sess.coded_w - w) // 2)),
                mode="edge")
    out = sess.frame_encoder.encode_frame(yp, up, vp)
    split = out["split"]
    assert split.any() and not split.all()


def test_quadtree_beats_uniform_rd():
    # lambda-RD split choice should not lose to either uniform grid in
    # bits at (approximately) equal PSNR on mixed content
    w, h = 160, 96
    y, u, v = _mixed_frame(w, h, seed=3)
    results = {}
    for label, kw in (("u16", dict(cu_size=16)), ("u32", dict(cu_size=32)),
                      ("qt", dict(max_depth=1))):
        sess = IntraEncoderSession(w, h, qp=32, hash_sei=False,
                                   info_sei=False, **kw)
        fr = sess.encode_frame(y, u, v)
        results[label] = (fr.bits, fr.psnr_y)
    bits_qt, psnr_qt = results["qt"]
    for other in ("u16", "u32"):
        b, p = results[other]
        # allow tiny PSNR drift; demand bit savings OR better PSNR
        assert bits_qt <= b * 1.01 and psnr_qt >= p - 0.15, (results,)


def test_quadtree_native_matches_python():
    # production C++ writer must be byte-identical to the Python reference
    from x265_yuuki_asuna_tpu.bitstream import native
    if not native.available():
        pytest.skip("native lib unavailable")
    w, h = 96, 64
    y, u, v = _mixed_frame(w, h, seed=11)
    sess = IntraEncoderSession(w, h, qp=28, max_depth=1, hash_sei=False,
                               info_sei=False)
    fr_native = sess.encode_frame(y, u, v)
    orig = native.encode_intra_slice_qt
    try:
        native.encode_intra_slice_qt = lambda *a, **k: None
        fr_python = sess.encode_frame(y, u, v)
    finally:
        native.encode_intra_slice_qt = orig
    assert fr_native.nals == fr_python.nals


def test_quadtree_depth2_intra_conformance():
    w, h = 128, 96
    y, u, v = _mixed_frame(w, h, seed=17)
    sess = IntraEncoderSession(w, h, qp=30, max_depth=2)
    stream = sess.headers()
    fr = sess.encode_frame(y, u, v)
    stream += fr.nals
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    dy, du, dv = dec[0]
    assert np.array_equal(dy[:h, :w], fr.recon[0])
    assert np.array_equal(du[:h // 2, :w // 2], fr.recon[1])
    assert np.array_equal(dv[:h // 2, :w // 2], fr.recon[2])


def test_quadtree_depth2_beats_depth1_rd():
    w, h = 160, 96
    y, u, v = _mixed_frame(w, h, seed=23)
    res = {}
    for d in (1, 2):
        sess = IntraEncoderSession(w, h, qp=32, max_depth=d, hash_sei=False,
                                   info_sei=False)
        fr = sess.encode_frame(y, u, v)
        res[d] = (fr.bits, fr.psnr_y)
    b1, p1 = res[1]
    b2, p2 = res[2]
    assert b2 <= b1 * 1.02 and p2 >= p1 - 0.1, res


def test_psy_rd_conformance():
    # psy-rd biases the split decision; streams must stay decoder-exact
    w, h = 128, 96
    y, u, v = _mixed_frame(w, h, seed=29)
    sess = IntraEncoderSession(w, h, qp=30, max_depth=2, psy_rd=2.0,
                               hash_sei=False)
    stream = sess.headers()
    fr = sess.encode_frame(y, u, v)
    stream += fr.nals
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert np.array_equal(dec[0][0][:h, :w], fr.recon[0])
