"""Main10 (10-bit) conformance."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_main10_intra_conformance():
    rng = np.random.default_rng(7)
    W, H = 64, 48
    sess = IntraEncoderSession(W, H, qp=27, cu_size=16, bit_depth=10,
                               hash_sei=False)
    stream = sess.headers()
    recons = []
    for i in range(2):
        y = rng.integers(0, 1024, (H, W)).astype(np.uint16)
        u = rng.integers(0, 1024, (H // 2, W // 2)).astype(np.uint16)
        v = rng.integers(0, 1024, (H // 2, W // 2)).astype(np.uint16)
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    for d, r in zip(decode_hevc(stream, W, H, bit_depth=10), recons):
        for p in range(3):
            assert np.array_equal(d[p].astype(np.uint16), r[p])
