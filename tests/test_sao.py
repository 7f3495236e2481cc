"""SAO conformance + unit behavior."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.ops import sao as SAO
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_eo_category_rules():
    p = np.array([[10, 20, 10], [20, 20, 20], [30, 20, 30]], np.int32)
    cat = SAO.eo_category(p, 0)   # horizontal
    assert cat[0, 1] == 4         # peak vs both neighbors
    assert cat[1, 1] == 0         # flat
    assert cat[2, 1] == 1         # valley
    assert cat[0, 0] == 0         # border -> unfiltered


@pytest.mark.parametrize("deblock", [False, True])
def test_sao_conformance(deblock):
    rng = np.random.default_rng(5)
    W, H = 64, 48
    sess = IntraEncoderSession(W, H, qp=34, cu_size=16, hash_sei=False,
                               sao=True, deblock=deblock)
    stream = sess.headers()
    recons = []
    base = (np.add.outer(np.arange(H) * 2, np.arange(W)) % 256).astype(np.uint8)
    for t in range(2):
        y = (base + rng.integers(0, 30, (H, W))).astype(np.uint8)
        u = rng.integers(80, 180, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(80, 180, (H // 2, W // 2)).astype(np.uint8)
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    for d, r in zip(decode_hevc(stream, W, H), recons):
        for p in range(3):
            assert np.array_equal(d[p].astype(np.uint8), r[p])


def test_sao_improves_psnr():
    rng = np.random.default_rng(8)
    W, H = 64, 48
    base = (np.add.outer(np.arange(H) * 2, np.arange(W)) % 256).astype(np.uint8)
    y = (base + rng.integers(0, 30, (H, W))).astype(np.uint8)
    u = np.full((H // 2, W // 2), 100, np.uint8)
    v = np.full((H // 2, W // 2), 150, np.uint8)
    p_off = IntraEncoderSession(W, H, qp=37, cu_size=16, hash_sei=False
                                ).encode_frame(y, u, v).psnr_y
    p_on = IntraEncoderSession(W, H, qp=37, cu_size=16, hash_sei=False,
                               sao=True).encode_frame(y, u, v).psnr_y
    assert p_on >= p_off
