"""CABAC engine + syntax roundtrip tests: everything the encoder writes must
decode back identically through the spec-defined decoder."""

import numpy as np
import pytest

from x265_yuuki_asuna_tpu.bitstream import tables as T
from x265_yuuki_asuna_tpu.bitstream.bitio import (BitWriter, BitReader,
                                                  anti_emulation, strip_emulation,
                                                  split_annexb, wrap_nal)
from x265_yuuki_asuna_tpu.bitstream.cabac import CabacEncoder, CabacDecoder
from x265_yuuki_asuna_tpu.bitstream import residual as R
from x265_yuuki_asuna_tpu.bitstream import ctu_syntax as CS

RNG = np.random.default_rng(99)


def finish_to_bytes(enc: CabacEncoder) -> bytes:
    data, tail, tail_bits = enc.finish()
    bw = BitWriter()
    for b in data:
        bw.write_byte(b)
    bw.write_bits(tail, tail_bits)
    bw.rbsp_trailing_bits()
    return bw.get_bytes()


def test_bitio_expgolomb_roundtrip():
    bw = BitWriter()
    vals = [0, 1, 2, 3, 7, 100, 255, 1000]
    svals = [0, 1, -1, 5, -7, 200, -200]
    for v in vals:
        bw.write_ue(v)
    for v in svals:
        bw.write_se(v)
    bw.write_align_zero()
    br = BitReader(bw.get_bytes())
    assert [br.read_ue() for _ in vals] == vals
    assert [br.read_se() for _ in svals] == svals


def test_emulation_prevention():
    payloads = [b"\x00\x00\x00", b"\x00\x00\x01\x02", b"\x00\x00\x02",
                b"\xff\x00\x00\x03\x00\x00", bytes(64)]
    for p in payloads:
        enc = anti_emulation(p)
        # no start-code emulation in encoded payload (00 00 03 is the escape)
        for i in range(len(enc) - 2):
            assert not (enc[i] == 0 and enc[i + 1] == 0 and enc[i + 2] <= 2), enc
        assert strip_emulation(enc) == p


def test_annexb_split():
    nal1 = wrap_nal(33, b"\x42\x00\x00\x00\x01\x99")
    nal2 = wrap_nal(34, b"\x43", long_start_code=False)
    nals = split_annexb(nal1 + nal2)
    assert len(nals) == 2
    assert nals[0][0] >> 1 == 33
    assert nals[1][0] >> 1 == 34
    assert strip_emulation(nals[0][2:]) == b"\x42\x00\x00\x00\x01\x99"


def test_context_init_spec_ranges():
    for st in (0, 1, 2):
        for qp in (0, 20, 37, 51):
            ctx = T.init_all_contexts(st, qp)
            assert ctx.shape == (T.NUM_CTX,)
            assert ((ctx >> 1) <= 63).all()


@pytest.mark.parametrize("trial", range(8))
def test_engine_roundtrip_random_bins(trial):
    """Random mix of context, bypass, and terminate bins must roundtrip."""
    rng = np.random.default_rng(trial)
    n = 600
    kinds = rng.integers(0, 3, n)      # 0=ctx, 1=ep, 2=8-bit ep burst
    ctxs = rng.integers(0, T.NUM_CTX, n)
    bins = rng.integers(0, 2, n)
    bursts = rng.integers(0, 256, n)

    enc = CabacEncoder()
    enc.init_contexts(2, 30)
    for i in range(n):
        if kinds[i] == 0:
            enc.encode_bin(int(bins[i]), int(ctxs[i]))
        elif kinds[i] == 1:
            enc.encode_bin_ep(int(bins[i]))
        else:
            enc.encode_bins_ep(int(bursts[i]), 8)
    enc.encode_bin_trm(1)
    data = finish_to_bytes(enc)

    dec = CabacDecoder(data)
    dec.init_contexts(2, 30)
    for i in range(n):
        if kinds[i] == 0:
            assert dec.decode_bin(int(ctxs[i])) == bins[i], f"ctx bin {i}"
        elif kinds[i] == 1:
            assert dec.decode_bin_ep() == bins[i], f"ep bin {i}"
        else:
            assert dec.decode_bins_ep(8) == bursts[i], f"ep burst {i}"
    assert dec.decode_bin_trm() == 1


def test_engine_trm_zero_path():
    enc = CabacEncoder()
    enc.init_contexts(2, 30)
    for i in range(50):
        enc.encode_bin(i & 1, 0)
        enc.encode_bin_trm(0)
    enc.encode_bin_trm(1)
    data = finish_to_bytes(enc)
    dec = CabacDecoder(data)
    dec.init_contexts(2, 30)
    for i in range(50):
        assert dec.decode_bin(0) == (i & 1)
        assert dec.decode_bin_trm() == 0
    assert dec.decode_bin_trm() == 1


def _random_levels(n, density, mag):
    lv = RNG.integers(-mag, mag + 1, size=(n, n))
    mask = RNG.random((n, n)) < density
    lv = lv * mask
    if not np.any(lv):
        lv[RNG.integers(0, n), RNG.integers(0, n)] = 1
    return lv.astype(np.int32)


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("is_luma", [True, False])
@pytest.mark.parametrize("density,mag", [(0.05, 3), (0.3, 10), (0.9, 200),
                                         (0.02, 30000)])
def test_residual_roundtrip(log2, is_luma, density, mag):
    if not is_luma and log2 == 5:
        pytest.skip("32x32 chroma TUs don't occur in 4:2:0")
    n = 1 << log2
    for mode in (0, 1, 7, 10, 26, 30):   # covers diag/hor/ver scans
        lv = _random_levels(n, density, mag)
        enc = CabacEncoder()
        enc.init_contexts(2, 32)
        R.encode_residual(enc, lv, log2, is_luma, mode)
        enc.encode_bin_trm(1)
        data = finish_to_bytes(enc)
        dec = CabacDecoder(data)
        dec.init_contexts(2, 32)
        got = R.decode_residual(dec, log2, is_luma, mode)
        assert np.array_equal(got, lv), f"log2={log2} luma={is_luma} mode={mode}\n{lv}\n{got}"


def test_residual_single_coeff_positions():
    for log2 in (2, 3, 4):
        n = 1 << log2
        for pos in [0, 1, n - 1, n * (n - 1), n * n - 1, (n // 2) * n + n // 2]:
            lv = np.zeros((n, n), np.int32)
            lv.flat[pos] = -5
            enc = CabacEncoder()
            enc.init_contexts(2, 32)
            R.encode_residual(enc, lv, log2, True, 0)
            enc.encode_bin_trm(1)
            dec = CabacDecoder(finish_to_bytes(enc))
            dec.init_contexts(2, 32)
            got = R.decode_residual(dec, log2, True, 0)
            assert np.array_equal(got, lv), (log2, pos)


def test_mpm_derivation():
    assert CS.derive_mpm(1, 1) == [0, 1, 26]
    assert CS.derive_mpm(0, 0) == [0, 1, 26]
    m = CS.derive_mpm(20, 20)
    assert m[0] == 20 and len(set(m)) == 3
    assert all(2 <= x <= 34 for x in m[1:])
    assert CS.derive_mpm(5, 9) == [5, 9, 0]
    assert CS.derive_mpm(0, 9) == [0, 9, 1]
    assert CS.derive_mpm(0, 1) == [0, 1, 26]


def test_intra_mode_coding_roundtrip():
    for cand in [(1, 1), (0, 1), (17, 1), (33, 5)]:
        for mode in range(35):
            enc = CabacEncoder()
            enc.init_contexts(2, 30)
            mpm = CS.derive_mpm(*cand)
            CS.encode_intra_luma_mode(enc, mode, mpm)
            CS.encode_intra_chroma_mode(enc, mode, mode)
            enc.encode_bin_trm(1)
            dec = CabacDecoder(finish_to_bytes(enc))
            dec.init_contexts(2, 30)
            assert CS.decode_intra_luma_mode(dec, mpm) == mode
            assert CS.decode_intra_chroma_mode(dec, mode) == mode


def test_full_ctu_roundtrip():
    log2 = 4
    n = 1 << log2
    for trial in range(5):
        ds = []
        enc = CabacEncoder()
        enc.init_contexts(2, 32)
        left = 1
        for i in range(4):
            d = CS.CTUDecisions(
                luma_mode=int(RNG.integers(0, 35)),
                luma_levels=_random_levels(n, 0.2, 20),
                cb_levels=_random_levels(n // 2, 0.2, 8),
                cr_levels=_random_levels(n // 2, 0.2, 8))
            ds.append(d)
            CS.encode_intra_ctu_full(enc, d, log2, left, 1)
            enc.encode_bin_trm(1 if i == 3 else 0)
            left = d.luma_mode
        data = finish_to_bytes(enc)
        dec = CabacDecoder(data)
        dec.init_contexts(2, 32)
        left = 1
        for i in range(4):
            lm, cm, ly, cb, cr = CS.decode_intra_ctu_full(dec, log2, left, 1)
            assert lm == ds[i].luma_mode
            assert np.array_equal(ly, ds[i].luma_levels)
            assert np.array_equal(cb, ds[i].cb_levels)
            assert np.array_equal(cr, ds[i].cr_levels)
            assert dec.decode_bin_trm() == (1 if i == 3 else 0)
            left = lm


def test_scan_orders_match_spec_shape():
    s = T.scan_order(T.SCAN_DIAG, 2)
    assert list(s[:6]) == [0, 4, 1, 8, 5, 2]
    for log2 in (2, 3, 4, 5):
        for st in (0, 1, 2):
            sc = T.scan_order(st, log2)
            assert sorted(sc) == list(range(4 ** log2))
