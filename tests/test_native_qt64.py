"""Native CTU64 I-slice writer: byte-identical to the Python reference."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.bitstream import native
from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc
import x265_yuuki_asuna_tpu.utils.geometry as G


@pytest.mark.parametrize("depth", [2, 3])
def test_native_qt64_matches_python(depth, monkeypatch):
    rng = np.random.default_rng(13 + depth)
    W, H = 128, 64
    sess = IntraEncoderSession(W, H, qp=30, cu_size=64, max_depth=depth,
                               hash_sei=False)
    y = np.full((H, W), 100, np.uint8)
    y[:, W // 2:] = rng.integers(0, 256, (H, W // 2))
    u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    yp = G.pad_plane(y, sess.coded_h, sess.coded_w)
    up = G.pad_plane(u, sess.coded_h // 2, sess.coded_w // 2)
    vp = G.pad_plane(v, sess.coded_h // 2, sess.coded_w // 2)
    out = sess.frame_encoder.encode_frame(yp, up, vp)
    nat = sess._assemble_slice_qt64(dict(out))
    assert native.encode_intra_slice_qt64(
        out, sess.rows, sess.cols, 30, depth) is not None, \
        "native qt64 writer did not engage"
    # force the Python fallback path
    monkeypatch.setattr(native, "encode_intra_slice_qt64",
                        lambda *a, **k: None)
    py = sess._assemble_slice_qt64(dict(out))
    assert nat == py
    # and the stream decodes bit-exactly
    dec = decode_hevc(sess.headers() + nat, W, H)
    for p in range(3):
        assert np.array_equal(
            dec[0][p].astype(np.uint8),
            out["recon_" + "yuv"[p]][:([H, H // 2, H // 2][p]),
                                     :([W, W // 2, W // 2][p])].astype(np.uint8))
