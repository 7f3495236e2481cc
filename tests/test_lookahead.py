"""Lookahead: scenecut detection and RC complexity feed."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.models.lookahead import Lookahead, downscale_half
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_downscale_half_box():
    p = np.arange(16).reshape(4, 4)
    lo = downscale_half(p)
    assert lo[0, 0] == (0 + 1 + 4 + 5 + 2) >> 2


def test_scenecut_places_idr():
    rng = np.random.default_rng(4)
    W, H = 64, 48
    sess = VideoEncoderSession(W, H, qp=30, cu_size=16, keyint=100,
                               hash_sei=False)
    base = (np.add.outer(np.arange(H), np.arange(W)) % 256).astype(np.uint8)
    alt = (np.add.outer(np.arange(H) * 7, 255 - np.arange(W) * 3) % 256).astype(np.uint8)
    stream = sess.headers()
    recons, types = [], []
    for t in range(8):
        src = np.roll(base, t * 2, axis=1) if t < 4 else np.roll(alt, t, axis=0)
        y = (src + rng.integers(0, 8 if t < 4 else 30, (H, W))).astype(np.uint8)
        fr = sess.encode_frame(y, np.full((H // 2, W // 2), 90, np.uint8),
                               np.full((H // 2, W // 2), 160, np.uint8))
        stream += fr.nals
        recons.append(fr.recon)
        types.append("IDR" if ((fr.nals[4] >> 1) & 0x3F) == 19 else "P")
    assert types[0] == "IDR" and types[4] == "IDR"
    assert types[1:4] == ["P"] * 3 and types[5:] == ["P"] * 3
    decoded = decode_hevc(stream, W, H)
    for d, r in zip(decoded, recons):
        assert np.array_equal(d[0][:H, :W].astype(np.uint8), r[0])


def test_static_content_no_scenecut():
    rng = np.random.default_rng(1)
    W, H = 64, 48
    la = Lookahead(W, H)
    y = rng.integers(0, 256, (H, W)).astype(np.int32)
    la.push(y)
    for _ in range(3):
        _, _, sc = la.push(y)
        assert not sc
