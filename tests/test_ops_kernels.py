"""Checkasm-analog kernel tests: batched ops vs scalar spec references
(SURVEY.md §4 tier 1)."""

import numpy as np
import pytest

from x265_yuuki_asuna_tpu.ops import transforms, quant, pixel, intra
from tests.spec_ref import intra_scalar


RNG = np.random.default_rng(1234)


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------

def _scalar_butterfly(T, src, shift):
    n = T.shape[0]
    add = 1 << (shift - 1)
    dst = np.zeros((n, n), np.int64)
    for j in range(n):
        for k in range(n):
            dst[k][j] = (int(np.dot(T[k].astype(np.int64), src[j].astype(np.int64))) + add) >> shift
    return dst


def _scalar_ibutterfly(T, src, shift):
    n = T.shape[0]
    add = 1 << (shift - 1)
    dst = np.zeros((n, n), np.int64)
    for j in range(n):
        for nn in range(n):
            v = (int(np.dot(T[:, nn].astype(np.int64), src[:, j].astype(np.int64))) + add) >> shift
            dst[j][nn] = np.clip(v, -32768, 32767)
    return dst


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("bd", [8, 10])
def test_forward_dct_matches_scalar(n, bd):
    T = transforms.dct_matrix(n)
    log2n = int(np.log2(n))
    maxr = (1 << bd) - 1
    x = RNG.integers(-maxr, maxr + 1, size=(4, n, n))
    got = transforms.forward_transform(x, bd)
    for b in range(4):
        s1 = _scalar_butterfly(T, x[b], log2n - 1 + bd - 8)
        s2 = _scalar_butterfly(T, s1, log2n + 6)
        assert np.array_equal(got[b], s2), f"fwd dct{n} mismatch"


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("bd", [8, 10])
def test_inverse_dct_matches_scalar(n, bd):
    T = transforms.dct_matrix(n)
    x = RNG.integers(-32768, 32767, size=(4, n, n))
    got = transforms.inverse_transform(x, bd)
    for b in range(4):
        s1 = _scalar_ibutterfly(T, x[b], 7)
        s2 = _scalar_ibutterfly(T, s1, 12 - (bd - 8))
        assert np.array_equal(got[b], s2), f"inv dct{n} mismatch"


def test_dst4_matches_scalar():
    x = RNG.integers(-255, 256, size=(8, 4, 4))
    got = transforms.forward_transform(x, 8, dst=True)
    T = transforms.DST4
    for b in range(8):
        s1 = _scalar_butterfly(T, x[b], 1)
        s2 = _scalar_butterfly(T, s1, 8)
        assert np.array_equal(got[b], s2)
    # inverse roundtrip error stays tiny
    r = transforms.inverse_transform(got, 8, dst=True)
    assert np.abs(r - x).max() <= 1


def test_transforms_jax_bitexact():
    import jax.numpy as jnp
    for n in (4, 8, 32):
        x = RNG.integers(-255, 256, size=(6, n, n))
        ref = transforms.forward_transform(x, 8)
        got = np.asarray(transforms.forward_transform(jnp.asarray(x), 8, xp=jnp))
        assert np.array_equal(ref, got)
        ref_i = transforms.inverse_transform(ref, 8)
        got_i = np.asarray(transforms.inverse_transform(jnp.asarray(ref), 8, xp=jnp))
        assert np.array_equal(ref_i, got_i)


# ---------------------------------------------------------------------------
# Quant
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("qp", [0, 22, 32, 37, 51])
@pytest.mark.parametrize("log2n", [2, 3, 4, 5])
def test_quant_dequant_scalar_parity(qp, log2n):
    n = 1 << log2n
    coef = RNG.integers(-20000, 20000, size=(3, n, n))
    lv, du = quant.quant(coef, qp, log2n, 8, True)
    # scalar reference (dct.cpp:664 quant_c semantics)
    per, rem = qp // 6, qp % 6
    tshift = 15 - 8 - log2n
    qbits = 14 + per + tshift
    add = 171 << (qbits - 9)
    scale = int(quant.QUANT_SCALES[rem])
    for b in range(3):
        for i in range(n):
            for j in range(n):
                c = int(coef[b, i, j])
                sign = -1 if c < 0 else 1
                tmp = abs(c) * scale
                level = (tmp + add) >> qbits
                exp_du = (tmp - (level << qbits)) >> (qbits - 8)
                level = int(np.clip(level * sign, -32768, 32767))
                assert lv[b, i, j] == level
                assert du[b, i, j] == exp_du
    # dequant scalar parity
    dq = quant.dequant(lv, qp, log2n, 8)
    dqshift = 6 - tshift
    dscale = int(quant.INV_QUANT_SCALES[rem]) << per
    dadd = 1 << (dqshift - 1)
    for b in range(3):
        for i in range(n):
            for j in range(n):
                expect = int(np.clip((int(lv[b, i, j]) * dscale + dadd) >> dqshift,
                                     -32768, 32767))
                assert dq[b, i, j] == expect


def test_quant_roundtrip_monotone():
    # higher qp must not increase reconstructed magnitude fidelity
    x = RNG.integers(-255, 256, size=(16, 8, 8))
    c = transforms.forward_transform(x, 8)
    errs = []
    for qp in (10, 30, 45):
        lv, _ = quant.quant(c, qp, 3, 8, True)
        dq = quant.dequant(lv, qp, 3, 8)
        r = transforms.inverse_transform(dq, 8)
        errs.append(float(np.abs(r - x).mean()))
    assert errs[0] <= errs[1] <= errs[2]


# ---------------------------------------------------------------------------
# Pixel metrics
# ---------------------------------------------------------------------------

def test_sad_sse():
    a = RNG.integers(0, 256, size=(5, 16, 16))
    b = RNG.integers(0, 256, size=(5, 16, 16))
    assert np.array_equal(pixel.sad(a, b),
                          np.abs(a.astype(int) - b).sum(axis=(1, 2)))
    assert np.array_equal(pixel.sse(a, b),
                          ((a.astype(int) - b) ** 2).sum(axis=(1, 2)))


def test_satd_properties():
    a = RNG.integers(0, 256, size=(5, 8, 8))
    assert np.all(pixel.satd(a, a) == 0)
    b = a.copy()
    b[:, 0, 0] += 4
    s = pixel.satd(a, b)
    assert np.all(s > 0)
    # satd is invariant under constant offsets only in DC; sanity vs sad scale
    b2 = RNG.integers(0, 256, size=(5, 8, 8))
    assert np.all(pixel.satd(a, b2) > 0)


def test_hadamard_orthogonality():
    for n in (4, 8):
        H = pixel.hadamard_matrix(n)
        assert np.array_equal(H @ H.T, n * np.eye(n, dtype=np.int64))


# ---------------------------------------------------------------------------
# Intra prediction vs scalar spec implementation
# ---------------------------------------------------------------------------

def _build_v(left, top, corner):
    n = len(left) // 2
    v = np.concatenate([left[::-1], [corner], top])
    return v


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_intra_all_modes_vs_spec(n):
    B = 3
    left = RNG.integers(0, 256, size=(B, 2 * n))
    top = RNG.integers(0, 256, size=(B, 2 * n))
    corner = RNG.integers(0, 256, size=(B,))
    v = np.stack([_build_v(left[b], top[b], corner[b]) for b in range(B)])
    got = intra.predict_all_modes(v, n, 8, luma=True)
    for b in range(B):
        r = intra_scalar.RefSamples(n)
        r.left[:] = left[b]
        r.top[:] = top[b]
        r.corner = int(corner[b])
        rf = intra_scalar.filter_refs(r, 8)
        for mode in range(35):
            use_f = intra_scalar.use_filtered(mode, n, True)
            expect = intra_scalar.predict(rf if use_f else r, mode, 8, luma=True)
            assert np.array_equal(got[b, mode], expect), \
                f"n={n} mode={mode} mismatch\n{got[b, mode]}\n{expect}"


@pytest.mark.parametrize("n", [4, 8, 16])
def test_intra_chroma_modes_vs_spec(n):
    B = 2
    left = RNG.integers(0, 256, size=(B, 2 * n))
    top = RNG.integers(0, 256, size=(B, 2 * n))
    corner = RNG.integers(0, 256, size=(B,))
    v = np.stack([_build_v(left[b], top[b], corner[b]) for b in range(B)])
    got = intra.predict_all_modes(v, n, 8, luma=False)
    for b in range(B):
        r = intra_scalar.RefSamples(n)
        r.left[:] = left[b]
        r.top[:] = top[b]
        r.corner = int(corner[b])
        for mode in (0, 1, 10, 26, 2, 18, 34):
            expect = intra_scalar.predict(r, mode, 8, luma=False)
            assert np.array_equal(got[b, mode], expect), f"chroma n={n} mode={mode}"


def test_substitution_vs_spec():
    n = 8
    for trial in range(20):
        left = RNG.integers(0, 256, size=2 * n)
        top = RNG.integers(0, 256, size=2 * n)
        corner = int(RNG.integers(0, 256))
        la = RNG.random(2 * n) < 0.5
        ta = RNG.random(2 * n) < 0.5
        ca = bool(RNG.random() < 0.5)
        ref = intra_scalar.substitute(left, top, corner, la, ta, ca)
        v_raw = _build_v(left, top, corner)
        avail = np.concatenate([la[::-1], [ca], ta])
        got = intra.substitute_references(v_raw[None], avail[None], 8)[0]
        expect = _build_v(ref.left, ref.top, ref.corner)
        assert np.array_equal(got, expect), f"trial {trial}"


def test_intra_jax_matches_numpy():
    import jax.numpy as jnp
    n = 8
    B = 4
    v = RNG.integers(0, 256, size=(B, 4 * n + 1))
    ref = intra.predict_all_modes(v, n, 8, luma=True)
    got = np.asarray(intra.predict_all_modes(jnp.asarray(v), n, 8, luma=True, xp=jnp))
    assert np.array_equal(ref, got)
