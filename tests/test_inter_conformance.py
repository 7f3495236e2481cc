"""IPPP (P-slice) end-to-end conformance vs libavcodec (BASELINE config[1]
scope: inter path with merge/skip/AMVP, intra fallback, GOP with IDRs)."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _run(w, h, qp, keyint, frames):
    sess = VideoEncoderSession(w, h, qp=qp, cu_size=16, keyint=keyint,
                               hash_sei=False)
    stream = sess.headers()
    recons = []
    for (y, u, v) in frames:
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(decoded) == len(frames)
    for i, (d, r) in enumerate(zip(decoded, recons)):
        for p in range(3):
            assert np.array_equal(d[p][:r[p].shape[0], :r[p].shape[1]]
                                  .astype(np.int32), r[p].astype(np.int32)), \
                f"frame {i} plane {p}"


def _motion_clip(w, h, n, seed=0, noise=6):
    rng = np.random.default_rng(seed)
    base = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8)
    tex = rng.integers(0, 40, (h, w)).astype(np.uint8)
    out = []
    for t in range(n):
        y = (np.roll(base + tex, t * 3, axis=1) + t
             + rng.integers(0, noise, (h, w))).astype(np.uint8)
        u = (np.roll(base[::2, ::2], t, axis=0) // 2 + 60).astype(np.uint8)
        v = rng.integers(100, 160, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, u, v))
    return out


def test_ippp_motion():
    _run(64, 48, 30, 8, _motion_clip(64, 48, 5))


def test_ippp_mid_idr_and_noise():
    frames = _motion_clip(64, 48, 6, seed=3, noise=40)
    _run(64, 48, 34, 3, frames)   # IDR every 3 frames


def test_ippp_static_scene_skips():
    """Static content should produce mostly skip CUs and stay conformant."""
    rng = np.random.default_rng(9)
    y = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    u = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    v = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    frames = [(y, u, v)] * 4
    _run(64, 48, 30, 100, frames)


def test_ippp_odd_size():
    _run(52, 36, 32, 10, _motion_clip(52, 36, 3, seed=5))


def test_ippp_subpel_motion():
    """Fractional-pel MVs exercise the 8-tap/4-tap interpolators in-loop."""
    rng = np.random.default_rng(11)
    W, H = 64, 48
    base = np.add.outer(np.arange(H) * 3, np.arange(W) * 2).astype(np.float64)
    frames = []
    for t in range(4):
        # non-integer shift => encoder should pick subpel MVs
        yy = np.clip(base + t * 1.5 + rng.integers(0, 5, (H, W)), 0, 255)
        frames.append((yy.astype(np.uint8),
                       np.full((H // 2, W // 2), 100, np.uint8),
                       np.full((H // 2, W // 2), 150, np.uint8)))
    _run(W, H, 28, 8, frames)


def test_inter_ctu32_conformance():
    """IPPP with 32x32 CTUs (TU32 luma / TU16 chroma on the inter path)."""
    import numpy as np
    from tests.test_inter_deblock import _moving_scene
    from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
    from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc
    frames = _moving_scene(96, 64, 3, seed=8)
    sess = VideoEncoderSession(96, 64, qp=32, cu_size=32, keyint=100,
                               hash_sei=False)
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


def test_bframes_ctu32_conformance():
    import numpy as np
    from tests.test_inter_deblock import _moving_scene
    from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
    from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc
    frames = _moving_scene(96, 64, 4, seed=9)
    sess = VideoEncoderSession(96, 64, qp=34, cu_size=32, keyint=100,
                               hash_sei=False, bframes=1)
    stream = sess.headers()
    results = []
    for f in frames:
        results += sess.push_frame(*f)
    results += sess.flush()
    for fr in results:
        stream += fr.nals
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(decoded) == len(frames)
    for d, fr in zip(decoded, sorted(results, key=lambda f: f.poc)):
        for p in range(3):
            r = fr.recon[p]
            assert np.array_equal(
                d[p][:r.shape[0], :r.shape[1]].astype(np.uint8), r)
