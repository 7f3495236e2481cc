"""Inter-frame deblocking conformance: per-edge boundary strength (BS 0/1/2
from intra/cbf/motion) — recon must match libavcodec's deblocked output."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _moving_scene(w, h, n, seed=0):
    """Smooth gradients + moving blocks: at QP 30+ this produces blocking
    artifacts that pass the d<beta activation test, so the deblocking filter
    genuinely fires (random noise would disable it everywhere)."""
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for i in range(n):
        y = ((xs * 1.5 + ys * 0.8 + i * 6 + seed * 11) % 256).astype(np.uint8)
        y[(ys // 8 + xs // 8 + i) % 7 == 0] = 200
        u = ((xs[:h // 2, :w // 2] * 0.5 + i * 3) % 256).astype(np.uint8)
        v = ((ys[:h // 2, :w // 2] * 0.7 + 128 - i * 2) % 256).astype(np.uint8)
        out.append((y, u, v))
    return out


def test_p_slice_deblock_conformance():
    frames = _moving_scene(64, 48, 4)
    sess = VideoEncoderSession(64, 48, qp=40, cu_size=16, keyint=100,
                               hash_sei=False, deblock=True)
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
            assert np.array_equal(
                d[p][:r[p].shape[0], :r[p].shape[1]].astype(np.uint8), r[p]), \
                f"frame {i} plane {p}"


def test_b_slice_deblock_conformance():
    frames = _moving_scene(64, 48, 5, seed=2)
    sess = VideoEncoderSession(64, 48, qp=38, cu_size=16, keyint=100,
                               hash_sei=False, deblock=True, bframes=1)
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
            r = fr.recon[p]
            assert np.array_equal(d[p][:r.shape[0], :r.shape[1]].astype(np.uint8), r), \
                f"frame {i} plane {p}"
