"""Multi-reference P slices (reference --ref N, search.cpp:2181 per-ref
searches; VERDICT r2 item 4): 2 L0 references on the uniform IPPP path —
ref_idx_l0 syntax, refIdx-aware merge candidates, AMVP with spec
8.5.3.2.8 MV scaling. Conformance: libavcodec must reproduce the recon."""
import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _flicker_clip(w, h, n):
    """Alternating content: even frames share texture A, odd frames B —
    the 2-frame-back reference predicts far better every other frame."""
    rng = np.random.default_rng(21)
    a = rng.integers(0, 256, (h, w)).astype(np.uint8)
    b = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    out = []
    for i in range(n):
        base = a if i % 2 == 0 else b
        y = np.roll(base, i // 2, axis=1)
        out.append((y.copy(), u.copy(), v.copy()))
    return out


def _encode(frames, n_refs):
    sess = VideoEncoderSession(64, 48, qp=32, cu_size=16, keyint=100,
                               hash_sei=False, n_refs=n_refs)
    stream = sess.headers()
    results = [sess.encode_frame(*f) for f in frames]
    for r in results:
        stream += r.nals
    return sess, stream, results


def test_multiref_conformance_and_gain():
    frames = _flicker_clip(64, 48, 8)
    sess2, stream2, res2 = _encode(frames, 2)
    dec = decode_hevc(stream2, sess2.coded_w, sess2.coded_h)
    assert len(dec) == len(frames)
    for i, (d, r) in enumerate(zip(dec, res2)):
        for p in range(3):
            assert np.array_equal(
                d[p][:r.recon[p].shape[0], :r.recon[p].shape[1]]
                .astype(np.uint8), r.recon[p]), f"frame {i} plane {p}"
    # the second reference must actually be used and must help on this clip
    sess1, stream1, res1 = _encode(frames, 1)
    bits1 = sum(r.bits for r in res1)
    bits2 = sum(r.bits for r in res2)
    psnr1 = np.mean([r.psnr_y for r in res1[1:]])
    psnr2 = np.mean([r.psnr_y for r in res2[1:]])
    assert stream1 != stream2
    # flicker content: 2-back reference is a near-perfect predictor
    assert bits2 < bits1 * 0.8 or psnr2 > psnr1 + 1.0, \
        (bits1, bits2, psnr1, psnr2)


def test_multiref_first_p_single_ref():
    """The first P after an IDR has one reference: its slice must code
    num_ref_idx_active = 1 and no ref_idx bins (decodable stream)."""
    frames = _flicker_clip(64, 48, 3)
    sess, stream, res = _encode(frames, 2)
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(dec) == 3
