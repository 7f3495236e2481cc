"""Lossless-mode and rate-control conformance tests."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import (IntraEncoderSession,
                                                     VideoEncoderSession)
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_lossless_bit_exact_source():
    rng = np.random.default_rng(7)
    W, H = 64, 48
    sess = IntraEncoderSession(W, H, cu_size=16, lossless=True, hash_sei=False)
    stream = sess.headers()
    srcs = []
    for _ in range(2):
        y = rng.integers(0, 256, (H, W)).astype(np.uint8)
        u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        srcs.append((y, u, v))
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        assert np.array_equal(fr.recon[0], y)          # encoder-side lossless
    for d, s in zip(decode_hevc(stream, W, H), srcs):
        for p in range(3):
            assert np.array_equal(d[p].astype(np.uint8), s[p])


def _clip(n, W=64, H=48, seed=4):
    rng = np.random.default_rng(seed)
    base = (np.add.outer(np.arange(H), np.arange(W)) % 256).astype(np.uint8)
    out = []
    for t in range(n):
        y = (np.roll(base, t * 2, axis=1) + rng.integers(0, 12, (H, W))).astype(np.uint8)
        out.append((y, np.full((H // 2, W // 2), 90, np.uint8),
                    np.full((H // 2, W // 2), 160, np.uint8)))
    return out


@pytest.mark.parametrize("mode,kw", [
    ("abr", dict(bitrate_kbps=150)),
    ("crf", dict(crf=30.0)),
])
def test_rate_control_conformance(mode, kw):
    W, H = 64, 48
    sess = VideoEncoderSession(W, H, cu_size=16, keyint=6, hash_sei=False,
                               rc_mode=mode, **kw)
    stream = sess.headers()
    recons = []
    for (y, u, v) in _clip(8):
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    decoded = decode_hevc(stream, W, H)
    assert len(decoded) == 8
    for d, r in zip(decoded, recons):
        assert np.array_equal(d[0][:H, :W].astype(np.uint8), r[0])


def test_abr_tracks_target_direction():
    """Higher targets must produce more bits (sanity of the feedback loop)."""
    W, H = 64, 48
    totals = []
    for rate in (60, 400):
        sess = VideoEncoderSession(W, H, cu_size=16, keyint=8, hash_sei=False,
                                   rc_mode="abr", bitrate_kbps=rate)
        bits = 0
        for (y, u, v) in _clip(8, seed=9):
            bits += sess.encode_frame(y, u, v).bits
        totals.append(bits)
    assert totals[1] > totals[0] * 1.3


def test_two_pass_improves_target_accuracy(tmp_path):
    import numpy as np
    rng = np.random.default_rng(4)
    W, H = 64, 48
    base = (np.add.outer(np.arange(H), np.arange(W)) % 256).astype(np.uint8)
    frames = [((np.roll(base, t * 2, axis=1)
                + rng.integers(0, 15, (H, W))).astype(np.uint8),
               np.full((H // 2, W // 2), 90, np.uint8),
               np.full((H // 2, W // 2), 160, np.uint8)) for t in range(10)]
    stats = str(tmp_path / "2p.log")
    s1 = VideoEncoderSession(W, H, cu_size=16, keyint=5, hash_sei=False,
                             rc_mode="abr", bitrate_kbps=150,
                             stats_write=stats)
    b1 = sum(s1.encode_frame(*f).bits for f in frames)
    s1.stats_writer.close()
    s2 = VideoEncoderSession(W, H, cu_size=16, keyint=5, hash_sei=False,
                             rc_mode="abr", bitrate_kbps=150,
                             stats_read=stats)
    b2 = sum(s2.encode_frame(*f).bits for f in frames)
    target = 150 * 1000 / 25 * 10
    assert abs(b2 - target) < abs(b1 - target)


def test_vbv_constrains_bitstream():
    """CRF + VBV: the decoder-buffer simulation over actual frame sizes must
    never underflow (reference VBV invariant). Compare against an
    unconstrained CRF run to confirm the cap actually binds."""
    import numpy as np
    from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession

    rng = np.random.default_rng(7)
    W, H, N = 64, 48, 12
    frames = []
    base = rng.integers(0, 256, (H + 32, W + 32)).astype(np.uint8)
    for i in range(N):
        y = base[i:i + H, 2 * i:2 * i + W].copy()
        u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
        frames.append((y, u, v))

    def run(**kw):
        s = VideoEncoderSession(W, H, qp=30, cu_size=16, keyint=6,
                                hash_sei=False, rc_mode="crf", crf=20.0, **kw)
        return [s.encode_frame(*f).bits for f in frames]

    maxrate, bufsize = 120, 60           # kbit/s, kbit — tight for this clip
    bits_vbv = run(vbv_maxrate_kbps=maxrate, vbv_bufsize_kbps=bufsize)
    bits_free = run()

    # decoder buffer simulation at 25 fps
    fill = bufsize * 1000 * 0.9
    rate = maxrate * 1000 / 25.0
    worst = fill
    for b in bits_vbv[1:]:   # first I frame fills from init credit
        fill = min(fill - b + rate, bufsize * 1000)
        worst = min(worst, fill)
    assert worst > -rate, f"VBV underflow: worst fill {worst}"
    assert sum(bits_vbv) < sum(bits_free), "VBV cap did not bind"


def test_vbv_reencode_retry():
    # forced overshoot must trigger a same-frame higher-QP re-encode
    # (reference row-level VBV re-encode analog) and stay conformant
    import numpy as np
    from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
    from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc
    rng = np.random.default_rng(3)
    frames = [(rng.integers(0, 256, (48, 64)).astype(np.uint8),
               rng.integers(0, 256, (24, 32)).astype(np.uint8),
               rng.integers(0, 256, (24, 32)).astype(np.uint8))
              for _ in range(2)]
    sess = VideoEncoderSession(64, 48, qp=24, keyint=100, rc_mode="cqp",
                               vbv_maxrate_kbps=500, vbv_bufsize_kbps=250,
                               hash_sei=False)
    calls = [0]
    orig = sess.rc.vbv_overshoot
    def spy(bits):
        calls[0] += 1
        return 2.0 if calls[0] == 1 else orig(bits)
    sess.rc.vbv_overshoot = spy
    stream = sess.headers()
    recons = []
    for f in frames:
        fr = sess.encode_frame(*f)
        stream += fr.nals
        recons.append(fr.recon)
    assert calls[0] >= 2          # the first frame was re-encoded
    dec = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(dec) == 2
    for d, r in zip(dec, recons):
        assert np.array_equal(d[0][:48, :64], r[0])
