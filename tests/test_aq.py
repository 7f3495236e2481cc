"""Adaptive quantization (cu_qp_delta) conformance."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.models.ratecontrol import compute_aq_offsets
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def test_aq_offsets_track_variance():
    y = np.zeros((48, 64), np.uint8)
    y[:, 32:] = np.random.default_rng(0).integers(0, 256, (48, 32))
    offs = compute_aq_offsets(y, 16, 1.0)
    assert offs[:, :2].mean() < offs[:, 2:].mean()   # flat CUs get lower QP


def test_aq_modes_shapes_and_direction():
    """All four reference AQ modes produce per-CU maps that raise QP on
    complex blocks relative to flat ones (slicetype.cpp:444 semantics)."""
    rng = np.random.default_rng(1)
    y = np.zeros((64, 96), np.uint8)
    y[:, 48:] = rng.integers(0, 256, (64, 48))
    u = np.full((32, 48), 128, np.uint8)
    v = np.full((32, 48), 128, np.uint8)
    for mode in (1, 2, 3, 4):
        offs = compute_aq_offsets(y, 16, 1.0, mode=mode, u_plane=u, v_plane=v)
        assert offs.shape == (4, 6)
        assert offs[:, :3].mean() < offs[:, 3:].mean(), f"mode {mode}"
    # CTU32 aggregation
    offs32 = compute_aq_offsets(y, 32, 1.0, mode=2)
    assert offs32.shape == (2, 3)


def test_aq_mode1_scale_matches_reference_formula():
    """Mode 1 on a uniform-variance frame: offset = 1.0397*s*(log2 E - 14.427)
    to within rounding (all blocks equal => no relative spread)."""
    rng = np.random.default_rng(2)
    y = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    offs = compute_aq_offsets(y, 16, 1.0, mode=1)
    e = y.reshape(4, 16, 4, 16).astype(np.int64)
    s = e.sum(axis=(1, 3)); ssd = (e * e).sum(axis=(1, 3))
    energy = ssd - ((s * s) >> 8)
    expect = 1.0397 * (np.log2(np.maximum(energy, 1)) - 14.427)
    assert np.all(np.abs(offs - np.clip(np.round(expect), -6, 6)) <= 0)


def test_aq_stream_conformance():
    rng = np.random.default_rng(5)
    W, H = 64, 48
    sess = IntraEncoderSession(W, H, qp=32, cu_size=16, hash_sei=False,
                               aq_mode=2)
    stream = sess.headers()
    recons = []
    for t in range(2):
        y = np.zeros((H, W), np.uint8)
        y[:, :32] = 100 + t
        y[:, 32:] = rng.integers(0, 256, (H, 32))
        u = rng.integers(60, 200, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(60, 200, (H // 2, W // 2)).astype(np.uint8)
        fr = sess.encode_frame(y, u, v)
        stream += fr.nals
        recons.append(fr.recon)
    for d, r in zip(decode_hevc(stream, W, H), recons):
        for p in range(3):
            assert np.array_equal(d[p].astype(np.uint8), r[p])
