"""Adaptive quantization (cu_qp_delta) conformance."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.models.ratecontrol import compute_aq_offsets
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_aq_offsets_track_variance():
    y = np.zeros((48, 64), np.uint8)
    y[:, 32:] = np.random.default_rng(0).integers(0, 256, (48, 32))
    offs = compute_aq_offsets(y, 16, 1.0)
    assert offs[:, :2].mean() < offs[:, 2:].mean()   # flat CUs get lower QP


def test_aq_stream_conformance():
    rng = np.random.default_rng(5)
    W, H = 64, 48
    sess = IntraEncoderSession(W, H, qp=32, cu_size=16, hash_sei=False,
                               aq_mode=2)
    stream = sess.headers()
    recons = []
    for t in range(2):
        y = np.zeros((H, W), np.uint8)
        y[:, :32] = 100 + t
        y[:, 32:] = rng.integers(0, 256, (H, 32))
        u = rng.integers(60, 200, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(60, 200, (H // 2, W // 2)).astype(np.uint8)
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    for d, r in zip(decode_hevc(stream, W, H), recons):
        for p in range(3):
            assert np.array_equal(d[p].astype(np.uint8), r[p])
