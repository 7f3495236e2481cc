"""One-pass ABR accuracy (reference tolerance: rate-control-tests.txt:8-9
accepts <= 1% bitrate drift). The self-normalizing rateFactor =
wantedBitsWindow / cplxrSum form (ratecontrol.cpp:1748) plus overflow
feedback must land a 100-frame clip on target."""
import numpy as np
import pytest

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession


@pytest.mark.parametrize("target_kbps", [300, 800])
def test_abr_hits_target_100_frames(target_kbps):
    rng = np.random.default_rng(5)
    W, H, N = 176, 144, 100
    base = (np.add.outer(np.arange(H), np.arange(W)) % 256).astype(np.uint8)
    tex = rng.integers(0, 40, (H, W)).astype(np.uint8)
    frames = []
    for i in range(N):
        y = (base + np.roll(tex, (i, 2 * i), (0, 1)) + i).astype(np.uint8)
        frames.append((y, (base[::2, ::2] // 2 + i).astype(np.uint8),
                       ((255 - base[::2, ::2]) // 2).astype(np.uint8)))
    s = VideoEncoderSession(W, H, cu_size=16, keyint=250, hash_sei=False,
                            rc_mode="abr", bitrate_kbps=target_kbps)
    tot = 0
    for f in frames:
        tot += s.encode_frame(*f).bits
    kbps = tot * 25.0 / N / 1000.0
    err = kbps / target_kbps - 1.0
    assert abs(err) <= 0.012, f"ABR {target_kbps}: {kbps:.1f} ({err:+.1%})"
