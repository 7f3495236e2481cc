"""End-to-end conformance: our streams must decode bit-exactly in FFmpeg's
independent HEVC decoder (SURVEY.md §4 tier 2 analog — the reference uses
golden-bitstream + decoded-picture-hash; we verify against libavcodec)."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _roundtrip(w, h, qp, cu, frames):
    sess = IntraEncoderSession(w, h, qp=qp, cu_size=cu)
    stream = sess.headers()
    recons = []
    for (y, u, v) in frames:
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(decoded) == len(frames)
    for (dy, du, dv), (ry, ru, rv) in zip(decoded, recons):
        assert np.array_equal(dy[:h, :w], ry)
        assert np.array_equal(du[:h // 2, :w // 2], ru)
        assert np.array_equal(dv[:h // 2, :w // 2], rv)
    return recons


def _mk_frames(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        kind = i % 3
        if kind == 0:
            y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        elif kind == 1:
            y = (np.add.outer(np.arange(h) * 2, np.arange(w) * 3) + i * 7).astype(np.uint8)
        else:
            y = np.full((h, w), int(rng.integers(0, 256)), np.uint8)
            y[h // 4:h // 2, w // 4:w // 2] = 255 - y[0, 0]
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, u, v))
    return out


def test_conformance_cu16_multi_frame():
    _roundtrip(64, 48, 30, 16, _mk_frames(64, 48, 3))


def test_conformance_odd_size_conf_window():
    # 50x38 needs padding to 64x48 + conformance window cropping
    _roundtrip(50, 38, 35, 16, _mk_frames(50, 38, 2, seed=3))


def test_conformance_qp_sweep():
    frames = _mk_frames(48, 32, 1, seed=1)
    for qp in (0, 17, 37, 51):
        _roundtrip(48, 32, qp, 16, frames)


@pytest.mark.slow
def test_conformance_cu32():
    _roundtrip(96, 64, 30, 32, _mk_frames(96, 64, 2, seed=2))


def test_multi_slice_conformance():
    """Independent slice bands (the --slices / row-tile-sharding analog)."""
    import numpy as np
    rng = np.random.default_rng(5)
    W, H = 64, 96
    sess = IntraEncoderSession(W, H, qp=30, cu_size=16, hash_sei=False,
                               slices=3)
    stream = sess.headers()
    recons = []
    for _ in range(2):
        y = rng.integers(0, 256, (H, W)).astype(np.uint8)
        u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    decoded = decode_hevc(stream, W, H)
    assert len(decoded) == 2
    for d, r in zip(decoded, recons):
        for p in range(3):
            assert np.array_equal(d[p].astype(np.uint8), r[p])
