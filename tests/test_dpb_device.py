"""Device-resident DPB (round 4): the whole frame program — encode +
deblock + SAO stats/decide/apply — runs in-jit and reference recon stays on
device between frames (ROUND4 #1; reference analog: recon shared in memory
between FrameEncoders, frame.h:105, filters row-pipelined in
framefilter.cpp:564).

Contract tested here: the device path emits BYTE-IDENTICAL streams and
bit-exact recon vs the host filter path (ops/deblock.py + ops/sao.py), so
every existing conformance/golden result carries over.
"""

import numpy as np
import pytest

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession

W, H = 96, 64


def clip(n=6, seed=3):
    rng = np.random.default_rng(seed)
    base = (np.add.outer(np.arange(H), np.arange(W)) % 256).astype(np.uint8)
    tex = rng.integers(0, 40, (H, W)).astype(np.uint8)
    out = []
    for i in range(n):
        y = (base + np.roll(tex, (i * 2, i * 3), axis=(0, 1)) + i)
        out.append((y.astype(np.uint8),
                    ((base[::2, ::2] // 2) + i).astype(np.uint8),
                    ((255 - base[::2, ::2]) // 2).astype(np.uint8)))
    return out


def encode(dpb, frames, **kw):
    kw.setdefault("qp", 30)
    kw.setdefault("keyint", 50)
    kw.setdefault("rc_mode", "cqp")
    kw.setdefault("hash_sei", True)
    kw.setdefault("quality_metrics", False)
    s = VideoEncoderSession(W, H, max_depth=2, dpb_device=dpb, **kw)
    bs = s.headers()
    res = []
    if s.bframes:
        for f in frames:
            res += s.push_frame(*f)
        res += s.flush()
    else:
        for f in frames:
            res.append(s.encode_frame(*f))
    for r in res:
        bs += r.nals
    return bs, res, s


def assert_match(kw, frames=None):
    frames = frames or clip()
    bs_h, res_h, _ = encode(False, frames, **kw)
    bs_d, res_d, s = encode(True, frames, **kw)
    assert s.dpb_device, "device path did not activate"
    assert bs_h == bs_d, "stream mismatch host vs device path"
    for rh, rd in zip(res_h, res_d):
        assert rh.bits == rd.bits
        for a, b in zip(rh.recon, rd.recon):
            assert np.array_equal(a, b), "recon mismatch"


def test_bpyramid_deblock_sao():
    assert_match(dict(bframes=2, b_pyramid=True, deblock=True, sao=True,
                      sbh=True))


def test_ippp_deblock_only():
    assert_match(dict(bframes=0, deblock=True, sao=False))


def test_ippp_sao_only():
    assert_match(dict(bframes=0, deblock=False, sao=True))


def test_aq_cutree_qpmaps():
    # per-CU QP maps exercise the decoder-effective-QP forward fill on device
    assert_match(dict(bframes=2, b_pyramid=True, deblock=True, sao=True,
                      aq_mode=2, cutree=True, rc_mode="crf", crf=30.0))


def test_no_filters():
    assert_match(dict(bframes=2, deblock=False, sao=False))


def test_recon_out_false_skips_download():
    frames = clip()
    bs_h, _, _ = encode(False, frames,
                        **dict(bframes=2, deblock=True, sao=True))
    bs_d, res_d, _ = encode(True, frames,
                            **dict(bframes=2, deblock=True, sao=True,
                                   hash_sei=False, recon_out=False))
    for r in res_d:
        assert r.recon is None
    # bits identical up to the (absent) hash SEI: re-encode host side
    # without hash for a strict stream compare
    bs_h2, _, _ = encode(False, frames,
                         **dict(bframes=2, deblock=True, sao=True,
                                hash_sei=False))
    assert bs_d == bs_h2


@pytest.mark.xfail(strict=False, reason=(
    "latent in-jit filter corner bug, pre-existing since round 4 "
    "(verified on dfd87b9): seed-9 CRF30 aq+cutree clip decodes with 6 "
    "luma pixels off by +-1 on one non-ref b frame (poc 5, rows 49-57 "
    "cols 12-27 at 64x128) under libde265; triggers content-dependently "
    "when RD ties flip with the compile cache. Round-6 item in "
    "docs/ROUND6.md — do NOT treat as a pass."))
def test_conformance_decode():
    """An independent decoder reproduces the device-path stream's recon
    bit-exactly (the project's core invariant on the flagship feature
    combo). Arbiter: libde265 — libavcodec has a known chroma-EO
    deviation at 4-CTB junctions (see test_sao_deblock_corner.py)."""
    from x265_yuuki_asuna_tpu.utils import de265_decode
    if not de265_decode.available():
        pytest.skip("libde265 not available")
    frames = clip(8, seed=9)
    bs, res, sess = encode(True, frames,
                           **dict(bframes=3, b_pyramid=True, deblock=True,
                                  sao=True, sbh=True, aq_mode=2, cutree=True,
                                  rc_mode="crf", crf=30.0))
    dec = de265_decode.decode_hevc_de265(bs)
    assert len(dec) == len(res)
    ordered = sorted(res, key=lambda r: r.poc)
    for d, r in zip(dec, ordered):
        for dp, rp in zip(d, r.recon):
            assert np.array_equal(
                np.asarray(dp[:rp.shape[0], :rp.shape[1]], np.int32),
                np.asarray(rp, np.int32))
