"""Quantization scaling lists: SPS syntax + normative dequant conformance."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.bitstream.scaling import (
    ScalingListData, plain_diag_scan, DEFAULT_INTRA_8x8)
from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_diag_scan_4x4_matches_spec():
    # H.265 6.5.3 up-right diagonal scan order for a 4x4 block
    assert plain_diag_scan(4).tolist() == [
        0, 4, 1, 8, 5, 2, 12, 9, 6, 3, 13, 10, 7, 14, 11, 15]


def test_matrix_upsampling():
    sld = ScalingListData.default()
    m16 = sld.matrix(4, 0)
    assert m16.shape == (16, 16)
    # 2x2 repetition of the 8x8 default, DC overridden to 16
    assert m16[0, 0] == 16
    assert m16[15, 15] == DEFAULT_INTRA_8x8[63]
    assert m16[2, 2] == DEFAULT_INTRA_8x8[9]   # (1,1) repeated


def _clip(n, w=64, h=48, seed=11):
    rng = np.random.default_rng(seed)
    base = (np.add.outer(np.arange(h), np.arange(w)) * 2 % 256)
    out = []
    for i in range(n):
        y = ((base + 7 * i) % 256).astype(np.uint8)
        u = rng.integers(40, 216, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(40, 216, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, u, v))
    return out


def _roundtrip(sess, frames, W, H):
    stream = sess.headers()
    recons = []
    for y, u, v in frames:
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    dec = decode_hevc(stream, W, H)
    assert len(dec) == len(frames)
    for d, r in zip(dec, recons):
        for p in range(3):
            assert np.array_equal(d[p].astype(np.uint8), r[p])


def test_default_scaling_lists_conformance():
    W, H = 64, 48
    sess = IntraEncoderSession(W, H, qp=28, cu_size=16, hash_sei=False,
                               scaling_lists="default")
    _roundtrip(sess, _clip(2), W, H)


def test_custom_scaling_list_file_conformance(tmp_path):
    # a custom file: default everywhere except INTRA16X16 luma slightly
    # flattened (tests the DPCM syntax path + 16x16 DC signaling)
    vals = (DEFAULT_INTRA_8x8 // 2 + 8).tolist()
    f = tmp_path / "custom.txt"
    lines = []
    from x265_yuuki_asuna_tpu.bitstream import scaling as SC
    for s in range(4):
        count = 16 if s == 0 else 64
        step = 3 if s == 3 else 1
        for l in range(0, 6, step):
            name = SC.MATRIX_NAMES[s][l]
            src = (vals if (s, l) == (2, 0)
                   else SC.default_coef(s, l).tolist())
            lines.append(name)
            lines.append(",".join(str(x) for x in src) + ",")
            if s >= 2:
                lines.append(SC.DC_NAMES[s][l])
                lines.append("14," if (s, l) == (2, 0) else "16,")
    f.write_text("\n".join(lines) + "\n")
    W, H = 64, 48
    sess = IntraEncoderSession(W, H, qp=28, cu_size=16, hash_sei=False,
                               scaling_lists=str(f))
    assert not sess.scaling.is_default(2, 0)
    _roundtrip(sess, _clip(2, seed=12), W, H)
