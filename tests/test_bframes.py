"""B-frame conformance: IBPBP mini-GOP streams (bi-prediction, two reference
lists, display reordering) must decode bit-exactly in libavcodec."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _moving_scene(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 64, w + 64)).astype(np.uint8)
    bu = rng.integers(0, 256, (h // 2 + 32, w // 2 + 32)).astype(np.uint8)
    bv = rng.integers(0, 256, (h // 2 + 32, w // 2 + 32)).astype(np.uint8)
    frames = []
    for i in range(n):
        dx, dy = 2 * i, i
        y = base[dy:dy + h, dx:dx + w].copy()
        u = bu[dy // 2:dy // 2 + h // 2, dx // 2:dx // 2 + w // 2].copy()
        v = bv[dy // 2:dy // 2 + h // 2, dx // 2:dx // 2 + w // 2].copy()
        frames.append((y, u, v))
    return frames


def _run(w, h, frames, qp=30, bframes=1, keyint=100, max_merge=3):
    sess = VideoEncoderSession(w, h, qp=qp, cu_size=16, keyint=keyint,
                               hash_sei=False, bframes=bframes,
                               max_merge=max_merge)
    stream = sess.headers()
    results = []
    for (y, u, v) in frames:
        results += sess.push_frame(y, u, v)
    results += sess.flush()
    for fr in results:
        stream += fr.nals
    # libavcodec outputs in display order; our results carry GOP poc.
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(decoded) == len(frames)
    # poc restarts at each IDR: sort per GOP segment, concatenate segments
    segments, cur = [], []
    for fr in results:
        if fr.poc == 0 and cur:        # IDR starts a new segment
            segments.append(cur)
            cur = []
        cur.append(fr)
    segments.append(cur)
    display = [fr for seg in segments for fr in sorted(seg, key=lambda f: f.poc)]
    assert len(display) == len(frames)
    for i, (d, fr) in enumerate(zip(decoded, display)):
        for p in range(3):
            got = d[p][:fr.recon[p].shape[0], :fr.recon[p].shape[1]]
            assert np.array_equal(got.astype(np.uint8), fr.recon[p]), \
                f"frame {i} plane {p} mismatch"
    return results


def test_bframe_ibpb_conformance():
    _run(64, 48, _moving_scene(64, 48, 5), qp=30, bframes=1)


def test_bframe_b2_conformance():
    """Two consecutive B pictures per mini-GOP."""
    _run(64, 48, _moving_scene(64, 48, 7, seed=2), qp=32, bframes=2)


def test_bframe_tail_flush():
    """Stream ends mid-mini-GOP: flush closes it with a P anchor."""
    _run(48, 32, _moving_scene(48, 32, 4, seed=3), qp=28, bframes=2)


def test_bframe_keyint_idr():
    """IDR inside the sequence forces the open mini-GOP closed."""
    _run(48, 32, _moving_scene(48, 32, 6, seed=4), qp=30, bframes=1, keyint=4)


def test_b_adapt_closes_on_motion_break():
    """A motion discontinuity mid-GOP should make b-adapt emit an early P
    anchor (fewer TRAIL_N Bs than the static IBBP pattern would give)."""
    from x265_yuuki_asuna_tpu.bitstream.bitio import split_annexb
    rng = np.random.default_rng(9)
    smooth = _moving_scene(64, 48, 4)
    jolt = []           # independent noise: motion-unpredictable
    for i in range(3):
        jolt.append((rng.integers(0, 256, (48, 64)).astype(np.uint8),
                     rng.integers(0, 256, (24, 32)).astype(np.uint8),
                     rng.integers(0, 256, (24, 32)).astype(np.uint8)))
    frames = smooth + jolt
    sess = VideoEncoderSession(64, 48, qp=32, cu_size=16, keyint=100,
                               hash_sei=False, bframes=2)
    sess.scenecut_enabled = False     # isolate b-adapt from scenecut IDRs
    stream = sess.headers()
    results = []
    for f in frames:
        results += sess.push_frame(*f)
    results += sess.flush()
    for fr in results:
        stream += fr.nals
    types = [(n[0] >> 1) & 0x3F for n in split_annexb(stream)]
    n_b = types.count(0)          # TRAIL_N
    assert n_b < len(frames) - 1 - (len(frames) - 1) // 3, \
        f"expected early-closed mini-GOPs, got {n_b} B frames in {types}"
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(decoded) == len(frames)


def test_zones_qp_override():
    frames = _moving_scene(64, 48, 6)
    def run(zones):
        s = VideoEncoderSession(64, 48, qp=32, cu_size=16, keyint=100,
                                hash_sei=False, zones=zones)
        return [s.encode_frame(*f).bits for f in frames]
    plain = run(None)
    zoned = run("3,5,q=45")
    assert zoned[0] == plain[0]                 # outside the zone: unchanged
    assert sum(zoned[3:]) < 0.6 * sum(plain[3:])  # QP45 zone much smaller


def test_b_pyramid_conformance():
    """bframes=3 with b-pyramid: middle B is TRAIL_R and referenced by the
    outer Bs; RPS retains exactly the needed pictures."""
    from x265_yuuki_asuna_tpu.bitstream.bitio import split_annexb
    frames = _moving_scene(64, 48, 9, seed=6)
    sess = VideoEncoderSession(64, 48, qp=30, cu_size=16, keyint=100,
                               hash_sei=False, bframes=3)
    sess.b_adapt = False          # force full mini-GOPs for the structure check
    assert sess.b_pyramid
    stream = sess.headers()
    results = []
    for f in frames:
        results += sess.push_frame(*f)
    results += sess.flush()
    for fr in results:
        stream += fr.nals
    types = [(n[0] >> 1) & 0x3F for n in split_annexb(stream)
             if ((n[0] >> 1) & 0x3F) < 32]
    # IDR, then per full mini-GOP: P(1), Bref(1), B(0), B(0)
    assert types[0] == 19
    assert types.count(0) >= 2 and types.count(1) >= 3, types
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(decoded) == len(frames)
    display = sorted(results, key=lambda f: f.poc)
    for i, (d, fr) in enumerate(zip(decoded, display)):
        for p in range(3):
            r = fr.recon[p]
            assert np.array_equal(
                d[p][:r.shape[0], :r.shape[1]].astype(np.uint8), r), \
                f"frame {i} plane {p}"


def test_b_pyramid_gain():
    """The referenced middle B should reduce total bits vs flat Bs (closer
    references for the outer Bs)."""
    frames = _moving_scene(64, 48, 9, seed=7)

    def run(pyr):
        s = VideoEncoderSession(64, 48, qp=30, cu_size=16, keyint=100,
                                hash_sei=False, bframes=3, b_pyramid=pyr)
        s.b_adapt = False
        res = []
        for f in frames:
            res += s.push_frame(*f)
        res += s.flush()
        return sum(fr.bits for fr in res)

    assert run(True) < run(False) * 1.02   # allow parity, expect a win
