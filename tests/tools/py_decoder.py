"""Debug HEVC decoder for our round-1 stream subset (uniform CU grid,
IDR intra + P slices). Reconstructs pixels using the same ops library, but
driving everything from the BITSTREAM through the syntax decoder mirrors —
used to localize conformance divergences CU-by-CU.
"""

import numpy as np

from x265_yuuki_asuna_tpu.bitstream.bitio import (BitReader, split_annexb,
                                                  strip_emulation)
from x265_yuuki_asuna_tpu.bitstream.cabac import CabacDecoder
from x265_yuuki_asuna_tpu.bitstream import ctu_syntax as CS
from x265_yuuki_asuna_tpu.bitstream import inter_syntax as IS
from x265_yuuki_asuna_tpu.ops import intra, interp, quant, transforms
from x265_yuuki_asuna_tpu.models.intra_encoder import chroma_qp_from_luma

DC = 1


def _skip_slice_header(rbsp, slice_type_exp, sps, is_idr, max_merge):
    br = BitReader(rbsp)
    br.read_flag()                       # first_slice
    if is_idr or True:
        pass
    if is_idr:
        br.read_flag()                   # no_output_of_prior_pics (IRAP only)
    else:
        br.read_flag()                   # no_output (TRAIL has none!) -- see below
    return br


def decode_stream(stream, coded_w, coded_h, cu, qp, max_merge=3,
                  log2_max_poc=8):
    """Returns list of (y, u, v) recon planes. Assumes our encoder's header
    layout (no SAO, deblock off, temporal_mvp off)."""
    n = cu
    nc = cu // 2
    log2cu = cu.bit_length() - 1
    rows, cols = coded_h // cu, coded_w // cu
    qp_c = chroma_qp_from_luma(qp)
    frames = []
    ref = None
    for nal in split_annexb(stream):
        ntype = (nal[0] >> 1) & 0x3F
        if ntype >= 32 or ntype in (35, 39, 40):
            continue
        is_idr = ntype in (19, 20)
        rbsp = strip_emulation(nal[2:])
        br = BitReader(rbsp)
        br.read_flag()                                  # first_slice
        if 16 <= ntype <= 23:
            br.read_flag()                              # no_output_of_prior
        br.read_ue()                                    # pps id
        stype = br.read_ue()
        if not is_idr:
            br.read_bits(log2_max_poc)                  # poc lsb
            br.read_flag()                              # st_rps_sps_flag
            nneg = br.read_ue()
            npos = br.read_ue()
            for _ in range(nneg):
                br.read_ue()
                br.read_flag()
            for _ in range(npos):
                br.read_ue()
                br.read_flag()
        if stype != 2:
            br.read_flag()                              # num_ref_override
            br.read_ue()                                # five_minus_max_merge
        br.read_se()                                    # qp delta
        assert br.read_flag() == 1                      # byte_align one-bit
        while br.pos % 8:
            assert br.read_flag() == 0

        dec = CabacDecoder(rbsp, start_bitpos=br.pos)
        dec.init_contexts(2 if stype == 2 else 1, qp)

        ry = np.zeros((coded_h, coded_w), np.int32)
        ru = np.zeros((coded_h // 2, coded_w // 2), np.int32)
        rv = np.zeros((coded_h // 2, coded_w // 2), np.int32)
        grid = [[None] * cols for _ in range(rows)]
        imodes = [[None] * cols for _ in range(rows)]

        def intra_recon(r, c, mode, ly, cb, cr):
            from tests.tools.np_intra_codec import build_v
            for rec, nn, qpp, luma, lv in (
                    (ry, n, qp, True, ly), (ru, nc, qp_c, False, cb),
                    (rv, nc, qp_c, False, cr)):
                py, px = r * nn, c * nn
                avail = (c > 0, r > 0, r > 0 and c < cols - 1, r > 0 and c > 0)
                v_raw, av = build_v(rec, py, px, nn, *avail)
                vv = intra.substitute_references(v_raw[None], av[None], 8)[0]
                pred = intra.predict_all_modes(vv[None], nn, 8, luma=luma)[0][mode]
                if lv.any():
                    dq = quant.dequant(lv[None], qpp, nn.bit_length() - 1, 8)
                    rr = transforms.inverse_transform(dq, 8)[0]
                else:
                    rr = 0
                rec[py:py + nn, px:px + nn] = np.clip(pred + rr, 0, 255)

        def inter_recon(r, c, mv, ly, cb, cr):
            py, px = r * n, c * n
            pred_y = interp.mc_luma_qpel(ref[0], np.array([px]), np.array([py]),
                                         np.array([mv[0]]), np.array([mv[1]]), n)[0]
            pred_u = interp.mc_chroma_qpel(ref[1], np.array([px // 2]), np.array([py // 2]),
                                           np.array([mv[0]]), np.array([mv[1]]), nc)[0]
            pred_v = interp.mc_chroma_qpel(ref[2], np.array([px // 2]), np.array([py // 2]),
                                           np.array([mv[0]]), np.array([mv[1]]), nc)[0]
            for rec, nn, qpp, lv, pred in ((ry, n, qp, ly, pred_y),
                                           (ru, nc, qp_c, cb, pred_u),
                                           (rv, nc, qp_c, cr, pred_v)):
                ppy, ppx = r * nn, c * nn
                if lv.any():
                    dq = quant.dequant(lv[None], qpp, nn.bit_length() - 1, 8)
                    rr = transforms.inverse_transform(dq, 8)[0]
                else:
                    rr = 0
                rec[ppy:ppy + nn, ppx:ppx + nn] = np.clip(pred + rr, 0, 255)

        for r in range(rows):
            for c in range(cols):
                if stype == 2:
                    left_mode = imodes[r][c - 1] if c > 0 else None
                    cl = left_mode if left_mode is not None else DC
                    lm, cm, ly, cb, cr = CS.decode_intra_ctu_full(
                        dec, log2cu, cl, DC)
                    imodes[r][c] = lm
                    intra_recon(r, c, lm, ly, cb, cr)
                else:
                    cu_info, ly, cb, cr = IS.decode_inter_ctu(
                        dec, grid, r, c, log2cu, max_merge)
                    if cu_info.is_intra:
                        imodes[r][c] = cu_info.intra_mode
                        intra_recon(r, c, cu_info.intra_mode, ly, cb, cr)
                    else:
                        inter_recon(r, c, cu_info.mv, ly, cb, cr)
                trm = dec.decode_bin_trm()
                exp = 1 if (r, c) == (rows - 1, cols - 1) else 0
                assert trm == exp, (r, c, trm)
        frames.append((ry, ru, rv))
        ref = (ry, ru, rv)
    return frames
