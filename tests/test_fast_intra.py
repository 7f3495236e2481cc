"""Fast-intra: dense source-based mode decision + single-mode scan."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_fast_intra_conformance_and_quality():
    rng = np.random.default_rng(2)
    W, H = 96, 64
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256)
    y = np.clip(base + rng.integers(-10, 10, (H, W)), 0, 255).astype(np.uint8)
    u = rng.integers(60, 200, (H // 2, W // 2)).astype(np.uint8)
    v = rng.integers(60, 200, (H // 2, W // 2)).astype(np.uint8)

    ref_sess = IntraEncoderSession(W, H, qp=30, cu_size=16, hash_sei=False)
    fr_ref = ref_sess.encode_frame(y, u, v)
    sess = IntraEncoderSession(W, H, qp=30, cu_size=16, hash_sei=False,
                               fast_intra=True)
    fr = sess.encode_frame(y, u, v)
    dec = decode_hevc(sess.headers() + fr.nals, W, H)
    for p in range(3):
        assert np.array_equal(dec[0][p].astype(np.uint8), fr.recon[p])
    # decisions from source neighbors should stay close in RD terms
    assert fr.psnr_y > fr_ref.psnr_y - 0.5
    assert fr.bits < fr_ref.bits * 1.10
