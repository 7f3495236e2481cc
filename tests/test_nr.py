"""Noise reduction (denoise DCT, reference --nr-intra)."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.ops.quant import (denoise_dct, nr_update_offsets)
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_denoise_dct_kernel():
    coef = np.array([[100, -5], [3, 0]], np.int32)
    off = np.array([[10, 10], [10, 10]], np.int32)
    out, a = denoise_dct(coef, off)
    assert out.tolist() == [[90, 0], [0, 0]]
    assert a.tolist() == [[100, 5], [3, 0]]


def test_nr_update_matches_reference_formula():
    rs = np.array([1000, 0, 50], np.int64)
    off, rs2, cnt = nr_update_offsets(rs, 10, 500, 1 << 14)
    # value = strength*count + rs/2; denom = rs+1; DC forced 0
    assert off[0] == 0
    assert off[1] == (500 * 10 + 0) // 1
    assert off[2] == (500 * 10 + 25) // 51
    # halving branch
    off, rs3, cnt3 = nr_update_offsets(rs, 1 << 15, 500, 1 << 14)
    assert cnt3 == (1 << 14) and rs3[0] == 500


def test_nr_stream_conformance_and_bit_reduction():
    """Noisy clip: NR streams stay decodable (recon == decode) and frames
    after the first spend fewer bits than without NR."""
    rng = np.random.default_rng(7)
    W, H, N = 64, 48, 6
    frames = []
    base = rng.integers(0, 200, (H, W))
    for i in range(N):
        y = np.clip(base + rng.integers(-20, 21, (H, W)), 0, 255).astype(np.uint8)
        u = np.clip(128 + rng.integers(-15, 16, (H // 2, W // 2)), 0, 255).astype(np.uint8)
        v = np.clip(128 + rng.integers(-15, 16, (H // 2, W // 2)), 0, 255).astype(np.uint8)
        frames.append((y, u, v))

    def run(nr):
        sess = IntraEncoderSession(W, H, qp=30, cu_size=16, hash_sei=False,
                                   nr_intra=nr)
        stream = sess.headers()
        bits = []
        recons = []
        for y, u, v in frames:
            fr = sess.encode_frame(y, u, v)
            stream += fr.nals
            bits.append(fr.bits)
            recons.append(fr.recon)
        return stream, bits, recons

    s0, b0, _ = run(0)
    s1, b1, r1 = run(1000)
    dec = decode_hevc(s1, W, H)
    assert len(dec) == N
    for d, r in zip(dec, r1):
        for p in range(3):
            assert np.array_equal(d[p].astype(np.uint8), r[p])
    # frame 0 has no accumulated stats (offsets all zero) -> identical bits;
    # later frames should denoise and save bits
    assert b1[0] == b0[0]
    assert sum(b1[1:]) < sum(b0[1:])
