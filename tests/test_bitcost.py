"""K9 bit-cost estimator validation: the on-device residual_coding() cost
estimate (ops/bitcost.py) must track the REAL CABAC bit count (Python
reference engine, fresh init contexts) closely across TU sizes, QPs and
sparsity levels — the reference's estBitsSbac/counting-mode analog
(entropy.h:196-202, quant.cpp:610)."""

import numpy as np
import pytest

from x265_yuuki_asuna_tpu.bitstream.cabac import CabacEncoder
from x265_yuuki_asuna_tpu.bitstream.residual import encode_residual
from x265_yuuki_asuna_tpu.ops import bitcost as BC
from x265_yuuki_asuna_tpu.ops import quant as Q
from x265_yuuki_asuna_tpu.ops import transforms as TR


def _actual_bits(levels, log2n, is_luma, qp, slice_type=1):
    enc = CabacEncoder()
    enc.init_contexts(slice_type, qp)
    encode_residual(enc, levels, log2n, is_luma, -1)
    data, _, tail_bits = enc.finish()
    # subtract the arithmetic coder's flush overhead (~9.7 bits: low has
    # 10 spare bits at start; measured empirically on an empty encode)
    return len(data) * 8 + tail_bits


def _make_tus(rng, n, qp, count, scale):
    """Plausible quantized TUs: transform of random residual, quantized."""
    resid = (rng.standard_normal((count, n, n)) * scale).astype(np.int32)
    coef = TR.forward_transform(resid, 8)
    lv, _ = Q.quant(coef, qp, n.bit_length() - 1, 8, False)
    return lv


@pytest.mark.parametrize("log2n,is_luma", [(2, True), (3, True), (4, True),
                                           (5, True), (3, False), (2, False)])
def test_estimate_tracks_real_bits(log2n, is_luma):
    rng = np.random.default_rng(42 + log2n)
    n = 1 << log2n
    est_all, act_all = [], []
    for qp in (22, 32, 40):
        states = BC.init_states_dev(1, qp)
        for scale in (2.0, 8.0, 30.0):
            lvs = _make_tus(rng, n, qp, 8, scale)
            est = BC.est_tu_bits_ctx(lvs, log2n, is_luma, states)
            for i in range(lvs.shape[0]):
                if not np.any(lvs[i]):
                    assert est[i] == 0.0
                    continue
                act = _actual_bits(lvs[i], log2n, is_luma, qp)
                est_all.append(float(est[i]))
                act_all.append(float(act))
    est_all = np.array(est_all)
    act_all = np.array(act_all)
    assert len(act_all) >= 20
    # strong rank correlation and bounded relative error on nontrivial TUs
    corr = np.corrcoef(est_all, act_all)[0, 1]
    assert corr > 0.98, f"corr {corr}"
    big = act_all > 40
    if big.any():
        rel = np.abs(est_all[big] - act_all[big]) / act_all[big]
        assert np.median(rel) < 0.20, f"median rel err {np.median(rel)}"


def test_estimator_jit_matches_numpy():
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    lvs = _make_tus(rng, 16, 30, 4, 10.0)
    states = BC.init_states_dev(1, 30)
    ref = BC.est_tu_bits_ctx(lvs, 4, True, states)
    f = jax.jit(lambda l, q: BC.est_tu_bits_ctx(
        l, 4, True, BC.init_states_dev(1, q, xp=jnp), xp=jnp))
    got = np.asarray(f(jnp.asarray(lvs), jnp.int32(30)))
    assert np.allclose(ref, got, rtol=1e-4, atol=0.5)


def test_init_states_dev_matches_table():
    from x265_yuuki_asuna_tpu.bitstream.tables import init_all_contexts
    for st in (0, 1, 2):
        for qp in (0, 17, 32, 51):
            a = BC.init_states_dev(st, qp)
            b = init_all_contexts(st, qp)
            assert np.array_equal(np.asarray(a, np.uint8), b)


def test_mvd_bits_monotone():
    states = BC.init_states_dev(1, 30)
    vals = np.array([0, 1, 2, 4, 16, 64, 256])
    bits = BC.mvd_bits(vals, states)
    assert np.all(np.diff(bits) > 0)
    assert bits[0] < 1.5  # a zero mvd costs ~one flag
