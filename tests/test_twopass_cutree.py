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
