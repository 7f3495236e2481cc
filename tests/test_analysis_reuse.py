"""Analysis save/load (--analysis-save/--analysis-load analog): pass 1 saves
per-CU motion; pass 2 skips the full search and refines around the hints.
The reused-analysis stream must stay conformant and near pass-1 quality."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc
from tests.test_inter_deblock import _moving_scene


def test_analysis_save_load(tmp_path):
    frames = _moving_scene(64, 48, 5)
    dat = str(tmp_path / "analysis.dat")

    s1 = VideoEncoderSession(64, 48, qp=32, cu_size=16, keyint=100,
                             hash_sei=False, analysis_save=dat)
    bits1 = psnr1 = 0
    for f in frames:
        fr = s1.encode_frame(*f)
        bits1 += fr.bits
        psnr1 += fr.psnr_y

    s2 = VideoEncoderSession(64, 48, qp=32, cu_size=16, keyint=100,
                             hash_sei=False, analysis_load=dat)
    stream = s2.headers()
    bits2 = psnr2 = 0
    recons = []
    for f in frames:
        fr = s2.encode_frame(*f)
        stream += fr.nals
        bits2 += fr.bits
        psnr2 += fr.psnr_y
        recons.append(fr.recon)
    decoded = decode_hevc(stream, s2.coded_w, s2.coded_h)
    assert len(decoded) == len(frames)
    for d, r in zip(decoded, recons):
        for p in range(3):
            assert np.array_equal(
                d[p][:r[p].shape[0], :r[p].shape[1]].astype(np.uint8), r[p])
    # hint-refined pass should land within 2% bits / 0.1 dB of the full pass
    assert abs(bits2 - bits1) / bits1 < 0.02, (bits1, bits2)
    assert abs(psnr2 - psnr1) / len(frames) < 0.1
