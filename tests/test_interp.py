"""MC interpolation (K6) tests vs scalar spec reference."""

import numpy as np
import pytest

from x265_yuuki_asuna_tpu.ops import interp
from tests.spec_ref.interp_scalar import mc_scalar

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("luma", [True, False])
def test_mc_all_fractions_vs_scalar(luma):
    H, W, n = 64, 64, 8
    plane = RNG.integers(0, 256, (H, W)).astype(np.int32)
    nf = 4 if luma else 8
    B = nf * nf
    fx = np.repeat(np.arange(nf), nf).astype(np.int32)
    fy = np.tile(np.arange(nf), nf).astype(np.int32)
    px = RNG.integers(8, W - 16, B).astype(np.int32)
    py = RNG.integers(8, H - 16, B).astype(np.int32)
    mvx = RNG.integers(-4, 5, B).astype(np.int32)
    mvy = RNG.integers(-4, 5, B).astype(np.int32)
    got = interp.mc_block_batch(plane, px, py, mvx, mvy, fx, fy, n, luma)
    for b in range(B):
        exp = mc_scalar(plane, int(px[b]), int(py[b]), int(mvx[b]), int(mvy[b]),
                        int(fx[b]), int(fy[b]), n, luma)
        assert np.array_equal(got[b], exp), (luma, b, fx[b], fy[b])


def test_mc_border_extension():
    """MVs pointing outside the picture must replicate borders like the
    decoder's reference extension."""
    H = W = 32
    n = 8
    plane = RNG.integers(0, 256, (H, W)).astype(np.int32)
    cases = [(-20, -20), (40, 40), (-20, 10), (10, 40)]
    px = np.zeros(len(cases), np.int32)
    py = np.zeros(len(cases), np.int32)
    mvx = np.array([c[0] for c in cases], np.int32)
    mvy = np.array([c[1] for c in cases], np.int32)
    fx = np.array([1, 2, 3, 0], np.int32)
    fy = np.array([3, 1, 0, 2], np.int32)
    got = interp.mc_block_batch(plane, px, py, mvx, mvy, fx, fy, n, True)
    for b in range(len(cases)):
        exp = mc_scalar(plane, 0, 0, int(mvx[b]), int(mvy[b]),
                        int(fx[b]), int(fy[b]), n, True)
        assert np.array_equal(got[b], exp), b


def test_mc_integer_is_copy():
    H = W = 32
    plane = RNG.integers(0, 256, (H, W)).astype(np.int32)
    px = np.array([8], np.int32)
    py = np.array([4], np.int32)
    got = interp.mc_luma_qpel(plane, px, py, np.array([8], np.int32),
                              np.array([-8], np.int32), 8)
    assert np.array_equal(got[0], plane[2:10, 10:18])


def test_mc_jax_matches_numpy():
    import jax.numpy as jnp
    H = W = 48
    n = 16
    plane = RNG.integers(0, 256, (H, W)).astype(np.int32)
    B = 6
    px = RNG.integers(0, W - n, B).astype(np.int32)
    py = RNG.integers(0, H - n, B).astype(np.int32)
    mvx = RNG.integers(-16, 17, B).astype(np.int32)
    mvy = RNG.integers(-16, 17, B).astype(np.int32)
    ref = interp.mc_luma_qpel(plane, px, py, mvx, mvy, n)
    got = np.asarray(interp.mc_luma_qpel(
        jnp.asarray(plane), jnp.asarray(px), jnp.asarray(py),
        jnp.asarray(mvx), jnp.asarray(mvy), n, xp=jnp))
    assert np.array_equal(ref, got)
