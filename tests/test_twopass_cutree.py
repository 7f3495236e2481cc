"""2-pass with cuTree: pass-1 writes per-CU offsets to the stat file;
pass-2 applies them instead of recomputing (cuTreeReadFor2Pass analog)."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_twopass_cutree_offsets(tmp_path):
    rng = np.random.default_rng(5)
    W, H, N = 64, 48, 6
    base = rng.integers(0, 256, (H, W))
    frames = []
    for i in range(N):
        y = np.roll(base, i, axis=1).astype(np.uint8)
        u = np.full((H // 2, W // 2), 100, np.uint8)
        v = np.full((H // 2, W // 2), 150, np.uint8)
        frames.append((y, u, v))
    stats = str(tmp_path / "2p.log")
    s1 = VideoEncoderSession(W, H, qp=32, cu_size=16, keyint=N + 1,
                             hash_sei=False, rc_mode="abr",
                             bitrate_kbps=300, cutree=True,
                             stats_write=stats)
    for f in frames:
        s1.encode_frame(*f)
    s1.stats_writer.close()
    # round 3: the stat file is the reference's x265_2pass.log text format
    # with a .cutree fix8 sidecar (ratecontrol.cpp:2998,3050)
    import os
    text = open(stats).read()
    assert text.startswith("#options:")
    assert " in:0 out:0 type:I ".replace(" in", "in") in text or \
        "in:0 out:0 type:I" in text
    assert os.path.exists(stats + ".cutree")
    from x265_yuuki_asuna_tpu.models.ratecontrol import TwoPassRC
    tp = TwoPassRC(stats, 300, 25.0)
    assert any(r.get("cuoff") is not None for r in tp.records)
    s2 = VideoEncoderSession(W, H, qp=32, cu_size=16, keyint=N + 1,
                             hash_sei=False, rc_mode="abr",
                             bitrate_kbps=300, stats_read=stats)
    stream = s2.headers()
    recons = []
    for f in frames:
        fr = s2.encode_frame(*f)
        stream += fr.nals
        recons.append(fr.recon)
    dec = decode_hevc(stream, W, H)
    assert len(dec) == N
    for d, r in zip(dec, recons):
        for p in range(3):
            assert np.array_equal(d[p].astype(np.uint8), r[p])


def test_stats_file_parses_in_real_x265(tmp_path):
    """Interop: the reference binary must accept our pass-1 stat file
    (header validation + per-frame parse — ratecontrol.cpp:444-676). The
    run is capped at a few seconds: we assert x265 gets PAST stat parsing
    (no 'not valid' / 'statistics are damaged' / 'Malformed' errors),
    not that its full pass-2 encode completes."""
    import os
    import subprocess
    ref = os.path.join(os.path.dirname(__file__), "..", ".ref_build", "x265")
    if not os.path.exists(ref):
        pytest.skip("reference binary not built (tests/tools/build_reference.sh)")
    rng = np.random.default_rng(5)
    W, H, N = 64, 48, 6
    frames = [(rng.integers(0, 256, (H, W)).astype(np.uint8),
               np.full((H // 2, W // 2), 100, np.uint8),
               np.full((H // 2, W // 2), 150, np.uint8)) for _ in range(N)]
    stats = str(tmp_path / "x2p.log")
    s1 = VideoEncoderSession(W, H, qp=32, cu_size=16, keyint=250,
                             hash_sei=False, rc_mode="abr",
                             bitrate_kbps=200, stats_write=stats)
    yuv = tmp_path / "in.yuv"
    with open(yuv, "wb") as f:
        for y, u, v in frames:
            s1.encode_frame(y, u, v)
            f.write(y.tobytes()); f.write(u.tobytes()); f.write(v.tobytes())
    s1.stats_writer.close()
    try:
        r = subprocess.run(
            [ref, "--input", str(yuv), "--input-res", "64x48",
             "--fps", "25/1", "--pass", "2", "--stats", stats,
             "--bitrate", "200", "--keyint", "250", "--bframes", "0",
             "--no-cutree", "--frame-threads", "1", "--pools", "2",
             "-o", str(tmp_path / "o.hevc")],
            capture_output=True, text=True, timeout=20)
        err = r.stderr + r.stdout
    except subprocess.TimeoutExpired as e:
        err = (e.stderr or b"").decode() + (e.stdout or b"").decode()
    for bad in ("not valid", "statistics are damaged", "Malformed",
                "bad frame number", "mismatch with 1st pass"):
        assert bad not in err, err
