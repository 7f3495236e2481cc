"""Histogram-based scene cut (reference bHistBasedSceneCut,
encoder.cpp:1613): a luma-histogram SAD rule replaces the cost-based cut
when enabled — a hard content change restarts the GOP with an IDR."""
import numpy as np

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession


def test_hist_scenecut_triggers_idr():
    rng = np.random.default_rng(12)
    dark = (rng.integers(0, 40, (48, 64))).astype(np.uint8)
    brite = (rng.integers(200, 256, (48, 64))).astype(np.uint8)
    u = np.full((24, 32), 128, np.uint8)
    frames = [(dark, u, u)] * 3 + [(brite, u, u)] * 2
    sess = VideoEncoderSession(64, 48, qp=32, cu_size=16, keyint=100,
                               hash_sei=False, hist_scenecut=True)
    types = [sess.encode_frame(*f).frame_type for f in frames]
    assert types[0] == "I"
    assert types[3] == "I", types        # the cut frame
    assert types[1] == types[2] == types[4] == "P"
