"""Context-cost RDOQ (round 5): quant_rdoq_ctx must dominate plain quant
under the model it optimizes — D + lambda2 * est_tu_bits_ctx at the same
frozen slice-init states (the reference's estBitsSbac-driven rdoLevels,
quant.cpp:688,820-843) — and stay decode-consistent (levels are plain
levels; serialization is unchanged)."""
import numpy as np
import pytest

from x265_yuuki_asuna_tpu.ops import bitcost as BC
from x265_yuuki_asuna_tpu.ops import quant as Q
from x265_yuuki_asuna_tpu.ops import transforms as TR


@pytest.mark.parametrize("log2n,is_luma", [(2, True), (3, True), (4, True),
                                           (5, True), (3, False)])
def test_rdoq_ctx_beats_plain_quant(log2n, is_luma):
    rng = np.random.default_rng(11 + log2n)
    states = BC.init_states_dev(1, 32)
    n = 1 << log2n
    B = 48
    res = rng.normal(0, 10, (B, n, n)).astype(np.int32)
    coef = TR.forward_transform(res, 8, xp=np)
    qp = 32
    lam2 = 0.85 * 2.0 ** ((qp - 12) / 3.0)

    def rd(lv):
        dq = Q.dequant(lv, qp, log2n, 8, xp=np)
        rr = TR.inverse_transform(dq, 8, xp=np)
        d = ((rr - res).astype(np.float64) ** 2).sum(axis=(1, 2))
        bits = BC.est_tu_bits_ctx(lv, log2n, is_luma, states, xp=np)
        return d + lam2 * bits

    lv_q, _ = Q.quant(coef, qp, log2n, 8, False, xp=np)
    lv_r = Q.quant_rdoq_ctx(coef, qp, log2n, 8, states, is_luma, xp=np)
    # per-TU average: the RDOQ objective is an estimate (ctx-set proxy,
    # rice bound), so require a clear aggregate win, not per-TU dominance
    assert rd(lv_r).mean() <= rd(lv_q).mean(), \
        "ctx RDOQ lost to plain quant under its own metric"
    # levels must stay in range and keep signs consistent with the coeffs
    assert np.all(np.abs(lv_r) <= np.abs(lv_q) + 1)
    assert np.all((lv_r == 0) | (np.sign(lv_r) == np.sign(coef)))


def test_rdoq_ctx_jnp_matches_np():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    states_np = BC.init_states_dev(0, 35)
    states_j = BC.init_states_dev(0, 35, xp=jnp)
    coef = TR.forward_transform(
        rng.normal(0, 14, (17, 16, 16)).astype(np.int32), 8, xp=np)
    a = Q.quant_rdoq_ctx(coef, 35, 4, 8, states_np, True, xp=np)
    b = np.asarray(Q.quant_rdoq_ctx(jnp.asarray(coef), 35, 4, 8, states_j,
                                    True, xp=jnp))
    assert np.array_equal(a, b)
