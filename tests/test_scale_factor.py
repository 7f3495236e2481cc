"""Cross-resolution analysis reuse (--scale-factor): pass 1 at half
resolution, pass 2 at full resolution reusing scaled MV hints."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.ops.scaler import resize_plane
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_scale_factor_reuse(tmp_path):
    rng = np.random.default_rng(3)
    W, H, N = 128, 96, 4
    base = rng.integers(0, 256, (H, W))
    frames = []
    for i in range(N):
        y = np.roll(base, 2 * i, axis=1).astype(np.uint8)
        u = np.full((H // 2, W // 2), 90, np.uint8)
        v = np.full((H // 2, W // 2), 170, np.uint8)
        frames.append((y, u, v))
    # pass 1: half resolution, save analysis
    dat = str(tmp_path / "an.dat")
    s1 = VideoEncoderSession(W // 2, H // 2, qp=32, cu_size=16, keyint=N + 1,
                             hash_sei=False, analysis_save=dat)
    for y, u, v in frames:
        s1.encode_frame(resize_plane(y, H // 2, W // 2).astype(np.uint8),
                        resize_plane(u, H // 4, W // 4).astype(np.uint8),
                        resize_plane(v, H // 4, W // 4).astype(np.uint8))
    s1.analysis_save.close()
    # pass 2: full resolution, reuse with scale factor 2
    s2 = VideoEncoderSession(W, H, qp=32, cu_size=16, keyint=N + 1,
                             hash_sei=False, analysis_load=dat,
                             scale_factor=2)
    assert s2.analysis_data is not None
    assert s2.analysis_data[1]["mvx"].shape == (s2.rows, s2.cols)
    stream = s2.headers()
    recons = []
    for y, u, v in frames:
        fr = s2.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    dec = decode_hevc(stream, W, H)
    assert len(dec) == N
    for d, r in zip(dec, recons):
        for p in range(3):
            assert np.array_equal(d[p].astype(np.uint8), r[p])
