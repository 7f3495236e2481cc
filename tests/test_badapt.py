"""b-adapt path search (reference slicetypePath analog)."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _run(frames, b_adapt, W=64, H=48):
    sess = VideoEncoderSession(W, H, qp=32, cu_size=16, keyint=100,
                               bframes=3, hash_sei=False, b_adapt=b_adapt)
    types = []
    stream = sess.headers()
    results = []
    for y, u, v in frames:
        results += sess.push_frame(y, u, v)
    results += sess.flush()
    for fr in results:
        types.append(fr.frame_type)
        stream += fr.nals
    return types, stream, sess


def test_trellis_static_content_uses_full_minigops():
    rng = np.random.default_rng(2)
    base_y = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    u = np.full((24, 32), 128, np.uint8)
    frames = [(base_y, u, u) for _ in range(9)]
    types, stream, _ = _run(frames, b_adapt=2)
    # static content: trellis should keep maximal mini-GOPs (3 Bs per P)
    assert types[0] == "I"
    assert types.count("B") + types.count("b") >= 4
    dec = decode_hevc(stream, 64, 48)
    assert len(dec) == 9


def test_trellis_closes_on_jump_cut():
    """Frames 1.. alternate between two unrelated patterns: B frames can't
    bridge them, so the path search should prefer short mini-GOPs (more P,
    fewer B) than on static content."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    u = np.full((24, 32), 128, np.uint8)
    frames = []
    for i in range(9):
        y = np.roll(a, i * 17, axis=1) if i % 2 else a
        frames.append((y.astype(np.uint8), u, u))
    types_j, stream, _ = _run(frames, b_adapt=2)
    b_j = types_j.count("B") + types_j.count("b")
    static = [(a, u, u) for _ in range(9)]
    types_s, _, _ = _run(static, b_adapt=2)
    b_s = types_s.count("B") + types_s.count("b")
    assert b_j <= b_s
    dec = decode_hevc(stream, 64, 48)
    assert len(dec) == 9
