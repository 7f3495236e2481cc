"""Scaler (K22) + ABR ladder (abrEncApp analog)."""

import numpy as np
import pytest

from x265_yuuki_asuna_tpu.ops import scaler as SC


def test_resize_dc_preservation():
    flat = np.full((64, 96), 137, np.uint8)
    out = SC.resize_plane(flat, 32, 48)
    assert np.all(out == 137)          # exact DC: coefficients sum to 1


def test_resize_np_jnp_parity():
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    p = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    a = SC.resize_plane(p, 36, 44)
    b = np.asarray(SC.resize_plane(jnp.asarray(p), 36, 44, xp=jnp))
    assert np.array_equal(a, b)


def test_resize_quality_roundtrip():
    """Down+up of a smooth gradient stays close (sanity on tap alignment)."""
    xs, ys = np.meshgrid(np.arange(64), np.arange(48))
    p = ((xs * 2 + ys) % 250).astype(np.uint8)
    down = SC.resize_plane(p, 24, 32)
    up = SC.resize_plane(down.astype(np.uint8), 48, 64)
    err = np.abs(up.astype(int) - p.astype(int)).mean()
    assert err < 12.0, err


def test_ladder_two_rungs():
    pytest.importorskip("cv2")
    from x265_yuuki_asuna_tpu.models.ladder import LadderEncoder, parse_ladder
    from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc

    rungs = parse_ladder("64x48:300,32x32:100")
    assert rungs[0].width == 64 and rungs[1].bitrate_kbps == 100
    rng = np.random.default_rng(1)
    lad = LadderEncoder(64, 48, rungs, qp=32, keyint=10, hash_sei=False)
    streams = lad.headers()
    for i in range(3):
        y = rng.integers(0, 256, (48, 64)).astype(np.uint8)
        u = rng.integers(0, 256, (24, 32)).astype(np.uint8)
        v = rng.integers(0, 256, (24, 32)).astype(np.uint8)
        for k, fr in enumerate(lad.encode_frame(y, u, v)):
            streams[k] += fr.nals
    for k, r in enumerate(rungs):
        dec = decode_hevc(streams[k], lad.sessions[k].coded_w,
                          lad.sessions[k].coded_h)
        assert len(dec) == 3, f"rung {k}"


def test_ladder_analysis_handoff():
    """The smallest rung donates scaled MV hints to 2x rungs (AbrEncoder
    cross-pass analysis handoff analog) and the streams stay conformant."""
    import numpy as np
    from x265_yuuki_asuna_tpu.models.ladder import LadderEncoder, Rung
    from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc
    rng = np.random.default_rng(4)
    W, H = 128, 96
    lad = LadderEncoder(W, H, [Rung(128, 96, 400), Rung(64, 48, 120)],
                        keyint=9, hash_sei=False)
    assert lad.donor == 1 and lad.consumer_sf == {0: 2}
    base = rng.integers(0, 256, (H, W))
    streams = [h for h in lad.headers()]
    recons = [[], []]
    N = 4
    for i in range(N):
        y = np.roll(base, i, axis=1).astype(np.uint8)
        u = np.full((H // 2, W // 2), 100, np.uint8)
        v = np.full((H // 2, W // 2), 150, np.uint8)
        for j, fr in enumerate(lad.encode_frame(y, u, v)):
            streams[j] += fr.nals
            recons[j].append(fr.recon)
    # donor produced records; consumer consumed them
    assert len(lad.sessions[1].shared_analysis) == N
    for j, (w, h) in enumerate(((128, 96), (64, 48))):
        dec = decode_hevc(streams[j], w, h)
        assert len(dec) == N
        for d, r in zip(dec, recons[j]):
            for p in range(3):
                assert np.array_equal(d[p].astype(np.uint8), r[p])
