"""HRD signaling (reference --hrd; spec Annex E hrd_parameters + D.2.2/3
SEI): VUI carries NAL HRD rates, IRAPs get buffering_period, every AU a
pic_timing. Streams must stay third-party decodable."""
import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_hrd_stream_decodes_and_signals():
    rng = np.random.default_rng(4)
    frames = [(rng.integers(0, 256, (48, 64)).astype(np.uint8),
               rng.integers(0, 256, (24, 32)).astype(np.uint8),
               rng.integers(0, 256, (24, 32)).astype(np.uint8))
              for _ in range(5)]
    sess = VideoEncoderSession(64, 48, cu_size=16, keyint=100,
                               hash_sei=False, rc_mode="abr",
                               bitrate_kbps=400, vbv_maxrate_kbps=500,
                               vbv_bufsize_kbps=500, hrd=True)
    assert sess.hrd
    res = [sess.encode_frame(*f) for f in frames]
    stream = sess.headers() + b"".join(r.nals for r in res)
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(dec) == len(frames)
    for d, r in zip(dec, res):
        assert np.array_equal(d[0][:48, :64].astype(np.uint8), r.recon[0])
    # every frame carries a prefix SEI (pic_timing); the IDR also a
    # buffering period (payload type 0 then 1)
    for i, r in enumerate(res):
        assert r.nals[:5] == b"\x00\x00\x00\x01\x4e", f"frame {i} no SEI"
    # VUI signals hrd: hrd flag bit is buried, but the headers must still
    # parse -> decoding above already proves it; check sps.hrd config
    assert sess.intra_sess.sps.hrd == (500000, 500000, 0)


def test_hrd_off_without_vbv():
    sess = VideoEncoderSession(64, 48, cu_size=16, hash_sei=False, hrd=True)
    assert not sess.hrd
