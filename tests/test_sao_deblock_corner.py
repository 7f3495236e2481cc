"""KNOWN ISSUE (pre-existing, found in round 3): with deblock+SAO both on,
libavcodec's chroma EO classification at 4-CTB junction pixels can differ
from our whole-picture post-deblock classification — observed as 2 chroma
pixels per frame at 96x64/seed 7 (frame recon off by one SAO offset step).
Luma always matches; deblock-only and sao-only match everywhere. The
decoder-side model for those neighbors is still undiagnosed (neither
pre-deblock, post-deblock, nor later-CTB-pre-deblock classification
explains all pixels). Tracked here as xfail so the corner stays visible."""
import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


@pytest.mark.xfail(reason="chroma EO classification at CTB junctions "
                          "diverges from libavcodec by <=2 px/frame "
                          "(pre-existing; see docstring)", strict=False)
def test_sao_deblock_chroma_junction():
    rng = np.random.default_rng(7)
    w, h = 96, 64
    base = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8)
    tex = rng.integers(0, 40, (h, w)).astype(np.uint8)
    frames = [((base + np.roll(tex, (i, 2 * i), (0, 1)) + i).astype(np.uint8),
               (base[::2, ::2] // 2 + i).astype(np.uint8),
               ((255 - base[::2, ::2]) // 2).astype(np.uint8))
              for i in range(2)]
    sess = VideoEncoderSession(96, 64, qp=32, cu_size=16, keyint=100,
                               hash_sei=False, sao=True, deblock=True)
    res = [sess.encode_frame(*f) for f in frames]
    stream = sess.headers() + b"".join(r.nals for r in res)
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    for d, r in zip(dec, res):
        for p in range(3):
            assert np.array_equal(
                d[p][:r.recon[p].shape[0], :r.recon[p].shape[1]]
                .astype(np.uint8), r.recon[p])
