"""Native CTU64 P/B slice writer (round 5): conformance via libde265/avcodec.

Builds a 2-frame stream by hand — a CTU64 intra IDR (existing qt64 intra
machinery) followed by a B slice coded with asuna_encode_slice_qt64 — and
checks the decoder reproduces the exact expected reconstruction for BOTH
CTU64 shapes: split64=1 (the 4 constituent CTU32 trees nested at depth 1)
and split64=0 (ONE CU64: merge/skip or 2Nx2N with the spec's forced TU
split into 4 TU32s). Reference: analysis.cpp:514 depth-0 64x64 recursion,
7.3.8.8 inferred transform split at log2TrafoSize 6."""
import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.bitstream import native
from x265_yuuki_asuna_tpu.bitstream import headers as HDR
from x265_yuuki_asuna_tpu.bitstream.bitio import wrap_nal, NAL_TRAIL_N
from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.ops import interp
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc

W = H = 128
R64, C64 = H // 64, W // 64
R32, C32 = H // 32, W // 32


def _intra_ref(rng):
    """CTU64 intra IDR session: headers + first frame; returns (sess,
    idr_nals, recon3)."""
    sess = IntraEncoderSession(W, H, qp=30, cu_size=64, max_depth=3,
                               hash_sei=False, deblock=False, sao=False)
    y = rng.integers(0, 256, (H, W)).astype(np.uint8)
    u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    out = sess.frame_encoder.encode_frame(y, u, v)
    nals = sess._assemble_slice_qt64(dict(out))
    rec = (out["recon_y"].astype(np.int32), out["recon_u"].astype(np.int32),
           out["recon_v"].astype(np.int32))
    return sess, nals, rec


def _zero_qt_out():
    out = {
        "split": np.zeros((R32, C32), np.uint8),
        "split16": np.zeros((R32 * C32, 4), np.uint8),
        "tu_split32": np.zeros((R32, C32), np.uint8),
        "use_intra": np.zeros((R32, C32), np.uint8),
        "modes": np.zeros((R32, C32), np.int32),
        "pdir": np.full((R32, C32), 1, np.int32),
        "mvx": np.zeros((R32, C32), np.int32),
        "mvy": np.zeros((R32, C32), np.int32),
        "mv1x": np.zeros((R32, C32), np.int32),
        "mv1y": np.zeros((R32, C32), np.int32),
        "use_intra4": np.zeros((R32 * C32, 4), np.uint8),
        "modes4": np.zeros((R32 * C32, 4), np.int32),
        "pdir4": np.full((R32 * C32, 4), 1, np.int32),
        "mv4x": np.zeros((R32 * C32, 4), np.int32),
        "mv4y": np.zeros((R32 * C32, 4), np.int32),
        "mv41x": np.zeros((R32 * C32, 4), np.int32),
        "mv41y": np.zeros((R32 * C32, 4), np.int32),
        "use_intra8": np.zeros((R32 * C32, 16), np.uint8),
        "modes8": np.zeros((R32 * C32, 16), np.int32),
        "pdir8": np.full((R32 * C32, 16), 1, np.int32),
        "mv8x": np.zeros((R32 * C32, 16), np.int32),
        "mv8y": np.zeros((R32 * C32, 16), np.int32),
        "mv81x": np.zeros((R32 * C32, 16), np.int32),
        "mv81y": np.zeros((R32 * C32, 16), np.int32),
        "levels_y": np.zeros((R32, C32, 32, 32), np.int32),
        "levels_cb": np.zeros((R32, C32, 16, 16), np.int32),
        "levels_cr": np.zeros((R32, C32, 16, 16), np.int32),
    }
    return out


def _expected_mc(ref3, mvqx, mvqy, n):
    """Whole-frame uni prediction at one qpel MV via the exact MC ops."""
    cn = W // n
    nb = (H // n) * cn
    px = (np.arange(nb) % cn) * n
    py = (np.arange(nb) // cn) * n
    mvx = np.full(nb, mvqx, np.int32)
    mvy = np.full(nb, mvqy, np.int32)
    py_ = interp.mc_luma_qpel(ref3[0], px, py, mvx, mvy, n, 8, xp=np)
    pu_ = interp.mc_chroma_qpel(ref3[1], px // 2, py // 2, mvx, mvy,
                                n // 2, 8, xp=np)
    pv_ = interp.mc_chroma_qpel(ref3[2], px // 2, py // 2, mvx, mvy,
                                n // 2, 8, xp=np)

    def fb(blocks, nn, hh, ww):
        return (blocks.reshape(hh // nn, ww // nn, nn, nn)
                .transpose(0, 2, 1, 3).reshape(hh, ww))
    return (fb(py_, n, H, W), fb(pu_, n // 2, H // 2, W // 2),
            fb(pv_, n // 2, H // 2, W // 2))


@pytest.mark.parametrize("whole64", [False, True])
def test_qt64_inter_slice_decodes(whole64):
    rng = np.random.default_rng(99)
    sess, idr, ref3 = _intra_ref(rng)
    sess.sps.max_dec_pic_buffering = 2
    mvqx, mvqy = 6, -5                       # true qpel fractions
    out = _zero_qt_out()
    out["mvx"][:] = mvqx
    out["mvy"][:] = mvqy
    split64 = np.full((R64 * C64,), 0 if whole64 else 1, np.uint8)
    mot64 = (np.full((R64 * C64,), 1, np.int32),
             np.full((R64 * C64,), mvqx, np.int32),
             np.full((R64 * C64,), mvqy, np.int32),
             np.zeros((R64 * C64,), np.int32),
             np.zeros((R64 * C64,), np.int32))
    if whole64:
        # give one CU64 a residual so the forced 4xTU32 tree is exercised
        out["levels_y"][0, 0, 0, 0] = 3      # TL quadrant TU32, DC coeff
        out["levels_cb"][1, 1, 0, 0] = -2    # BR quadrant chroma TU16

    res = native.encode_slice_qt64(
        0, out, split64, mot64, R64, C64, qp=30, max_merge=3,
        sign_hiding=False, poc=1, poc_l0=0, poc_l1=0,
        sao=None, qp_map=None, bit_depth=8, max_tt=0)
    assert res is not None, "native qt64 inter writer did not engage"
    data, tail, tail_bits = res
    bw = HDR.write_slice_header(sess.sps, sess.pps, slice_type=0,
                                slice_qp=30, nal_type=NAL_TRAIL_N,
                                poc=1, max_merge=3,
                                ref_poc_delta=1, pos_poc_delta=0)
    for b in data:
        bw.write_byte(b)
    bw.write_bits(tail, tail_bits)
    bw.rbsp_trailing_bits()
    stream = sess.headers() + idr + wrap_nal(NAL_TRAIL_N, bw.get_bytes())

    frames = decode_hevc(stream, W, H)
    assert len(frames) == 2
    exp = [p.copy() for p in _expected_mc(ref3, mvqx, mvqy, 64)]
    if whole64:
        from x265_yuuki_asuna_tpu.ops import quant as Q, transforms as TR
        dq = Q.dequant(out["levels_y"][0, 0][None], 30, 5, 8, xp=np)
        ry = TR.inverse_transform(dq, 8, xp=np)[0]
        exp[0][0:32, 0:32] = np.clip(exp[0][0:32, 0:32] + ry, 0, 255)
        from x265_yuuki_asuna_tpu.models.intra_encoder import \
            chroma_qp_from_luma
        dqc = Q.dequant(out["levels_cb"][1, 1][None],
                        int(chroma_qp_from_luma(30)), 4, 8, xp=np)
        rc = TR.inverse_transform(dqc, 8, xp=np)[0]
        # CTU64 (0,0)'s BR quadrant chroma = [16:32, 16:32]
        exp[1][16:32, 16:32] = np.clip(exp[1][16:32, 16:32] + rc, 0, 255)
    for p in range(3):
        got = frames[1][p].astype(np.int32)
        want = exp[p]
        assert np.array_equal(got, want), (
            f"plane {p}: {np.sum(got != want)} mismatches "
            f"(max diff {np.max(np.abs(got - want))})")
