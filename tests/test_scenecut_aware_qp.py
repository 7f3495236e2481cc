"""Scene-cut-aware QP (reference bEnableSceneCutAwareQp, x265.h:1561+):
frames right after a cut are perceptually masked, so their QP is raised
with a decaying 3-step window."""
import numpy as np

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession


def test_scenecut_aware_qp_window():
    rng = np.random.default_rng(8)
    a = rng.integers(0, 80, (48, 64)).astype(np.uint8)
    b = rng.integers(150, 256, (48, 64)).astype(np.uint8)
    u = np.full((24, 32), 128, np.uint8)
    frames = [(a, u, u)] * 2 + [(b, u, u)] * 8
    on = VideoEncoderSession(64, 48, qp=30, cu_size=16, keyint=100,
                             hash_sei=False, scenecut_aware_qp=True,
                             scenecut_qp_delta=6, scenecut_window=6)
    off = VideoEncoderSession(64, 48, qp=30, cu_size=16, keyint=100,
                              hash_sei=False)
    q_on = [on.encode_frame(*f).qp for f in frames]
    q_off = [off.encode_frame(*f).qp for f in frames]
    # the cut at frame 2 starts the masked window: QP above baseline,
    # decaying back to it
    assert q_on[2] > q_off[2]
    assert q_on[3] > q_off[3]
    assert q_on[-1] == q_off[-1]
