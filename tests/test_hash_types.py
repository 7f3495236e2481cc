"""Decoded-picture-hash SEI types: CRC (hash_type 1) and checksum (2).

The test decodes the stream with libavcodec, then recomputes the hashes
from the DECODED planes with an independent bitwise implementation of the
HEVC D.3.19 formulas and compares against the SEI payload in the stream.
"""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _find_hash_sei(stream: bytes):
    """Extract the decoded_picture_hash SEI payload (after the 132/len
    header) from the first suffix-SEI NAL."""
    i = 0
    data = stream
    while i < len(data):
        j = data.find(b"\x00\x00\x01", i)
        if j < 0:
            return None
        k = data.find(b"\x00\x00\x01", j + 3)
        nal = data[j + 3:] if k < 0 else data[j + 3:k]
        if nal and nal[-1:] == b"\x00":
            nal = nal.rstrip(b"\x00")
        ntype = (nal[0] >> 1) & 0x3f
        if ntype == 40:  # suffix SEI
            rbsp = nal[2:].replace(b"\x00\x00\x03", b"\x00\x00")
            assert rbsp[0] == 132
            ln = rbsp[1]
            return rbsp[2:2 + ln]
        i = j + 3
    return None


def _crc_ref(plane: np.ndarray) -> int:
    crc = 0xffff
    for b in plane.tobytes():
        for k in range(7, -1, -1):
            msb = (crc >> 15) & 1
            crc = (((crc << 1) + ((b >> k) & 1)) & 0xffff) ^ (msb * 0x1021)
    for _ in range(16):
        msb = (crc >> 15) & 1
        crc = ((crc << 1) & 0xffff) ^ (msb * 0x1021)
    return crc


def _checksum_ref(plane: np.ndarray) -> int:
    cks = 0
    h, w = plane.shape
    for y in range(h):
        for x in range(w):
            xor = (x & 0xff) ^ (y & 0xff) ^ (x >> 8) ^ (y >> 8)
            cks = (cks + ((int(plane[y, x]) & 0xff) ^ xor)) & 0xffffffff
    return cks


@pytest.mark.parametrize("hash_type", [1, 2])
def test_hash_sei_matches_decode(hash_type):
    rng = np.random.default_rng(3)
    W, H = 48, 32
    sess = IntraEncoderSession(W, H, qp=30, cu_size=16, hash_sei=True,
                               hash_type=hash_type)
    y = rng.integers(0, 256, (H, W)).astype(np.uint8)
    u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    fr = sess.encode_frame(y, u, v)
    stream = sess.headers() + fr.nals
    payload = _find_hash_sei(fr.nals)
    assert payload is not None and payload[0] == hash_type
    dec = decode_hevc(stream, W, H)[0]
    body = payload[1:]
    for p in range(3):
        plane = dec[p].astype(np.uint8)
        if hash_type == 1:
            want = _crc_ref(plane)
            got = (body[2 * p] << 8) | body[2 * p + 1]
        else:
            want = _checksum_ref(plane)
            got = int.from_bytes(body[4 * p:4 * p + 4], "big")
        assert got == want, f"plane {p}"
