"""CTU64 quadtree (the reference's default CTU size): conformance."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _mixed_frame(W, H, seed):
    """Flat left half (favors big CUs) + noisy right half (favors splits)."""
    rng = np.random.default_rng(seed)
    y = np.full((H, W), 120, np.uint8)
    y[:, W // 2:] = rng.integers(0, 256, (H, W // 2))
    u = np.full((H // 2, W // 2), 128, np.uint8)
    u[:, W // 4:] = rng.integers(0, 256, (H // 2, W // 4))
    v = 255 - u
    return y, u, v


@pytest.mark.parametrize("depth", [2, 3])
def test_ctu64_intra_conformance(depth):
    W, H = 128, 64        # 2x1 CTU64s
    sess = IntraEncoderSession(W, H, qp=30, cu_size=64, max_depth=depth,
                               hash_sei=False, deblock=(depth == 3))
    assert sess.cu == 64 and sess.rows == 1 and sess.cols == 2
    y, u, v = _mixed_frame(W, H, 3)
    fr = sess.encode_frame(y, u, v)
    stream = sess.headers() + fr.nals
    dec = decode_hevc(stream, W, H)
    assert len(dec) == 1
    for p in range(3):
        assert np.array_equal(dec[0][p].astype(np.uint8), fr.recon[p])


def test_ctu64_splits_track_content():
    """The noisy half should split more than the flat half."""
    W, H = 128, 64
    sess = IntraEncoderSession(W, H, qp=30, cu_size=64, max_depth=3,
                               hash_sei=False)
    y, u, v = _mixed_frame(W, H, 4)
    # run the device encode directly to see decisions
    import x265_yuuki_asuna_tpu.utils.geometry as G
    yp = G.pad_plane(y, sess.coded_h, sess.coded_w)
    up = G.pad_plane(u, sess.coded_h // 2, sess.coded_w // 2)
    vp = G.pad_plane(v, sess.coded_h // 2, sess.coded_w // 2)
    out = sess.frame_encoder.encode_frame(yp, up, vp)
    flat_splits = out["split32"][0, 0].sum() + out["split16"][0, 0].sum()
    noisy_splits = out["split32"][0, 1].sum() + out["split16"][0, 1].sum()
    assert noisy_splits >= flat_splits


def test_ctu64_conformance_cropped_with_aq():
    """Non-multiple-of-64 frame (conformance window) + AQ per-CTU QP."""
    W, H = 96, 80
    sess = IntraEncoderSession(W, H, qp=32, cu_size=64, max_depth=2,
                               hash_sei=False, aq_mode=2)
    rng = np.random.default_rng(9)
    y = rng.integers(0, 256, (H, W)).astype(np.uint8)
    u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    fr = sess.encode_frame(y, u, v)
    stream = sess.headers() + fr.nals
    dec = decode_hevc(stream, W, H)
    for p in range(3):
        assert np.array_equal(dec[0][p].astype(np.uint8), fr.recon[p])
