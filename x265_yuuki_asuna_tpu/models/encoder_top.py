"""Top-level encoder session (round-1 scope: all-intra CQP).

Mirrors the reference's Encoder orchestration (encoder.cpp:1583) in shape:
device compute (wavefront analysis/recon) produces decision tensors, then a
host-side sequential entropy pass serializes each frame — the same
device/host split the reference uses for WPP+SAO (SURVEY.md §7).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from ..bitstream import headers as HDR
from ..bitstream.bitio import (BitWriter, wrap_nal, NAL_IDR_W_RADL,
                               NAL_SUFFIX_SEI)
from ..bitstream.cabac import CabacEncoder
from ..bitstream import ctu_syntax as CS
from ..bitstream import native
from ..utils import geometry as G
from ..utils.param import Param, RC_CQP
from ..utils.profiling import PROF
from .intra_encoder import IntraFrameEncoder, IntraFrameConfig, chroma_qp_from_luma
from ..ops import deblock as DB

DC_MODE = 1


@dataclass
class FrameResult:
    nals: bytes
    recon: Tuple[np.ndarray, np.ndarray, np.ndarray]   # cropped to source size
    bits: int
    psnr_y: float
    poc: int = 0           # display order within the GOP (B-frame pipeline)
    frame_type: str = ""   # I / P / B / b (x265 CSV naming)
    qp: int = 0
    psnr_u: float = 0.0
    psnr_v: float = 0.0
    ssim_y: float = 0.0


def effective_qp_map(out: dict, qp_map, slice_qp: int):
    """The DECODER-side per-CTU QP: a CTU with no coded residual signals no
    cu_qp_delta, so its QpY stays the predictor (previous coded QG's QP,
    spec 8.6.1) — the loop filter must use these values, not the encoder's
    intended map."""
    if qp_map is None:
        return None
    rows, cols = qp_map.shape
    has = (np.asarray(out["levels_y"]).reshape(rows, cols, -1).any(-1)
           | np.asarray(out["levels_cb"]).reshape(rows, cols, -1).any(-1)
           | np.asarray(out["levels_cr"]).reshape(rows, cols, -1).any(-1))
    eff = np.empty_like(qp_map)
    prev = slice_qp
    for r in range(rows):
        for c in range(cols):
            if has[r, c]:
                prev = int(qp_map[r, c])
            eff[r, c] = prev
    return eff


def scale_analysis_rec(rec: dict, sf: int, rows: int, cols: int) -> dict:
    """Upsample a saved analysis record's CU-grid MV hints by sf and scale
    the vectors (reference --scale-factor / scale1D/2D reuse)."""
    out = dict(rec)
    for k in ("mvx", "mvy"):
        if k in rec:
            g = np.repeat(np.repeat(rec[k], sf, 0), sf, 1)
            g = g[:rows, :cols]
            pr, pc = rows - g.shape[0], cols - g.shape[1]
            if pr > 0 or pc > 0:
                g = np.pad(g, ((0, max(pr, 0)), (0, max(pc, 0))),
                           mode="edge")
            out[k] = (g * sf).astype(np.int32)
    return out


def frame_quality(recon, y, u, v, bit_depth: int = 8):
    """Per-frame PSNR Y/U/V + SSIM(Y) vs the source (reference
    framefilter.cpp:654 processPostRow accumulation)."""
    from ..ops.pixel import ssim_plane
    pk = (1 << bit_depth) - 1

    def ps(a, b):
        mse = float(np.mean((np.asarray(a, np.float64) - b) ** 2))
        return 99.99 if mse == 0 else 10 * np.log10(pk * pk / mse)

    return (ps(recon[0], y), ps(recon[1], u), ps(recon[2], v),
            float(ssim_plane(np.asarray(recon[0]), np.asarray(y),
                             bit_depth)))


class IntraEncoderSession:
    """All-intra CQP encode session for 4:2:0 8-bit."""

    def __init__(self, width: int, height: int, qp: int = 32, cu_size: int = 16,
                 fps: Tuple[int, int] = (25, 1), hash_sei: bool = True,
                 deblock: bool = False, lossless: bool = False,
                 bit_depth: int = 8, sao: bool = False,
                 aq_mode: int = 0, aq_strength: float = 1.0,
                 slices: int = 1, rdoq: bool = False, wpp: bool = False,
                 sbh: bool = False, info_sei: bool = True,
                 master_display: str = None, max_cll: str = None,
                 max_depth: int = 0, psy_rd: float = 0.0,
                 hash_type: int = 0, nr_intra: int = 0,
                 scaling_lists: str = None, psy_rdoq: float = 0.0,
                 fast_intra: bool = False, csp: str = "i420",
                 dpb_device: bool = False):
        self.csp = csp
        self.c_shift = 0 if csp == "i444" else 1
        if csp == "i444":
            assert not (lossless or max_depth or slices > 1 or wpp
                        or sao or deblock), \
                "4:4:4: uniform-grid lossy path, no loop filters (v1)"
        self.hash_type = hash_type
        # quant matrices (--scaling-lists): "default" or a file path
        self.scaling = None
        if scaling_lists and not (lossless or rdoq or max_depth):
            from ..bitstream.scaling import ScalingListData
            self.scaling = (ScalingListData.default()
                            if scaling_lists == "default"
                            else ScalingListData.from_file(scaling_lists))
        # noise reduction (reference --nr-intra): uniform grid, lossy only
        self.nr_intra = 0 if (lossless or max_depth or slices > 1 or wpp)             else min(max(nr_intra, 0), 2000)
        if max_depth:
            if cu_size != 64:
                cu_size = 32
            assert not lossless, "quadtree + lossless unsupported (v1)"
            assert slices == 1, "quadtree + slices unsupported (v1)"
            if cu_size == 64:
                sao = False          # CTU64 SAO syntax wiring is r2 work
        self.max_depth = max_depth
        self.src_w = width
        self.src_h = height
        self.qp = qp
        self.cu = cu_size
        self.hash_sei = hash_sei
        self.deblock = deblock and not lossless
        self.lossless = lossless
        self.bit_depth = bit_depth
        self.sao = sao and not lossless
        self.aq_mode = 0 if lossless else aq_mode
        self.aq_strength = aq_strength
        rows_total = G.cdiv(height, cu_size)
        self.slices = max(1, min(slices, rows_total))
        if rows_total % self.slices != 0:
            self.slices = 1          # v1: equal bands only
        if lossless:
            qp = 4            # reference behavior: lossless forces QP4 signaling
            self.qp = qp
        self.coded_w = G.cdiv(width, cu_size) * cu_size
        self.coded_h = G.cdiv(height, cu_size) * cu_size
        self.rows = self.coded_h // cu_size
        self.cols = self.coded_w // cu_size
        log2cu = cu_size.bit_length() - 1

        band_h = self.coded_h // self.slices
        self.band_rows = band_h // cu_size
        self.sbh = sbh and not lossless and not rdoq and self.slices == 1
        # device-resident DPB (round 4): owned by VideoEncoderSession —
        # filters run inside the jitted program, recon never downloads
        self.dpb_device = bool(dpb_device) and max_depth > 0 and cu_size == 32
        self.frame_encoder = IntraFrameEncoder(IntraFrameConfig(
            width=self.coded_w, height=band_h if self.slices > 1 else self.coded_h,
            cu_size=cu_size, qp=qp, csp=csp,
            bit_depth=bit_depth, lossless=lossless,
            rdoq=rdoq and not lossless, sbh=self.sbh,
            max_depth=max_depth, psy_rd=psy_rd if max_depth else 0.0,
            psy_rdoq=psy_rdoq if rdoq else 0.0,
            fast_intra=fast_intra and not max_depth and not lossless,
            nr=bool(self.nr_intra),
            dpb=self.dpb_device, deblock=self.deblock and self.dpb_device,
            sao=self.sao and self.dpb_device), scaling=self.scaling)
        if self.nr_intra:
            n2, c2 = cu_size * cu_size, (cu_size // 2) ** 2
            self._nr = {"sum_y": np.zeros(n2, np.int64), "cnt_y": 0,
                        "sum_c": np.zeros(c2, np.int64), "cnt_c": 0}

        from ..bitstream import sei as SEI
        ptl = HDR.ProfileTierLevel(
            profile_idc=(4 if bit_depth > 10 else
                         2 if bit_depth > 8 else 1),
            bit_depth_constraint=bit_depth,
            level_idc=SEI.pick_level(self.coded_w, self.coded_h,
                                     fps[0] / max(fps[1], 1)))
        self.info_sei = info_sei
        self.master_display = master_display
        self.max_cll = max_cll
        if csp == "i444":
            ptl.profile_idc = 4          # RExt (Main 4:4:4)
            ptl.chroma_constraint = 3
        self.sps = HDR.SPSInfo(
            width=self.coded_w, height=self.coded_h,
            conf_win=(0, self.coded_w - width, 0, self.coded_h - height),
            ptl=ptl,
            chroma_format_idc=3 if csp == "i444" else 1,
            bit_depth=bit_depth,
            log2_min_cb=log2cu - max_depth, log2_diff_max_min_cb=max_depth,
            log2_min_tb=2, log2_diff_max_min_tb=min(log2cu, 5) - 2,
            max_transform_hierarchy_depth_inter=0,
            max_transform_hierarchy_depth_intra=0,
            sao_enabled=1 if (sao and not lossless) else 0,
            scaling_list=self.scaling,
            temporal_mvp=0, strong_intra_smoothing=0,
            timing_info=(fps[1], fps[0]),
        )
        self.wpp = wpp and self.slices == 1
        self.sei_provider = None      # callable(display_idx) -> prefix bytes
        self._display_counter = 0
        self.pps = HDR.PPSInfo(init_qp=26,
                               deblocking_disabled=0 if self.deblock else 1,
                               transquant_bypass=1 if lossless else 0,
                               cu_qp_delta=1 if self.aq_mode else 0,
                               entropy_coding_sync=1 if self.wpp else 0,
                               sign_hiding=1 if self.sbh else 0)

    # ------------------------------------------------------------------
    def headers(self) -> bytes:
        from ..bitstream import sei as SEI
        out = (HDR.write_vps(self.sps) + HDR.write_sps(self.sps)
               + HDR.write_pps(self.pps))
        msgs = []
        if self.info_sei:
            msgs.append(SEI.active_parameter_sets())
            msgs.append(SEI.user_data_unregistered(
                "x265-yuuki-asuna-tpu - TPU-native HEVC encoder - "
                f"{self.src_w}x{self.src_h} qp={self.qp} ctu={self.cu}"))
        if self.master_display:
            vals = SEI.parse_master_display(self.master_display)
            if vals:
                msgs.append(SEI.mastering_display(vals))
        if self.max_cll:
            try:
                cll, fall = (int(x) for x in self.max_cll.split(","))
                msgs.append(SEI.content_light_level(cll, fall))
            except ValueError:
                pass
        if msgs:
            out += SEI.wrap_sei(msgs)
        return out

    def _apply_deblock(self, out: dict, qp: int = None):
        """In-loop deblocking on the session recon (QT-aware: edges on the
        16-pel CU-boundary grid with interior edges of unsplit CTUs off)."""
        qp = self.qp if qp is None else qp
        # per-CU QP (AQ): the decoder derives thresholds from per-edge
        # averaged QPs, so the encoder must too (spec 8.7.2.5.3)
        qmap = effective_qp_map(out, out.get("qp_map"), qp)
        qarg = qmap if qmap is not None else qp
        if self.max_depth and self.cu == 64:
            bs_v, bs_h = DB.compute_bs_qt64_intra(out["split32"],
                                                  out["split16"],
                                                  self.max_depth)
            dy, du, dv = DB.deblock_frame_qt2(
                out["recon_y"], out["recon_u"], out["recon_v"],
                qarg, chroma_qp_from_luma(qp), bs_v, bs_h,
                bit_depth=self.bit_depth, cells=8)
        elif self.max_depth >= 2:
            maps = DB.expand_qt_maps8({"split": out["split"],
                                       "split16": out["split16"],
                                       "levels_y": out["levels_y"]})
            bs_v, bs_h = DB.compute_bs_qt2(maps)
            dy, du, dv = DB.deblock_frame_qt2(
                out["recon_y"], out["recon_u"], out["recon_v"],
                qarg, chroma_qp_from_luma(qp), bs_v, bs_h,
                bit_depth=self.bit_depth)
        elif self.max_depth:
            maps = DB.expand_qt_maps({"split": out["split"],
                                      "levels_y": out["levels_y"]})
            bs_v, bs_h = DB.compute_bs_qt(maps)
            q16 = qarg if qmap is None else \
                np.repeat(np.repeat(qmap, 2, 0), 2, 1)  # CTU map -> 16px grid
            dy, du, dv = DB.deblock_frame_inter(
                out["recon_y"], out["recon_u"], out["recon_v"], 16,
                q16, chroma_qp_from_luma(qp), bs_v, bs_h,
                bit_depth=self.bit_depth)
        else:
            dy, du, dv = DB.deblock_frame_uniform(
                out["recon_y"], out["recon_u"], out["recon_v"], self.cu,
                qarg, chroma_qp_from_luma(qp), bit_depth=self.bit_depth)
        out["recon_y"], out["recon_u"], out["recon_v"] = (
            np.asarray(dy), np.asarray(du), np.asarray(dv))

    # ------------------------------------------------------------------
    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                     poc: int = 0) -> FrameResult:
        # pad to coded size (edge replicate — conformance window crops back)
        yp = G.pad_plane(y, self.coded_h, self.coded_w)
        up = G.pad_plane(u, self.coded_h >> self.c_shift,
                         self.coded_w >> self.c_shift)
        vp = G.pad_plane(v, self.coded_h >> self.c_shift,
                         self.coded_w >> self.c_shift)

        if self.slices > 1:
            return self._encode_frame_sliced(y, yp, up, vp)
        qp_map = None
        if self.aq_mode:
            from .ratecontrol import compute_aq_offsets
            offs = compute_aq_offsets(yp, self.cu, self.aq_strength,
                                      mode=self.aq_mode, u_plane=up,
                                      v_plane=vp, bit_depth=self.bit_depth)
            qp_map = np.clip(self.qp + offs, 0, 51).astype(np.int32)
        nr_off = self._nr_offsets() if self.nr_intra else None
        out = self.frame_encoder.encode_frame(
            yp, up, vp, qp=qp_map.reshape(-1) if qp_map is not None else None,
            nr_off=nr_off)
        if self.nr_intra:
            self._nr_accumulate(out)
        if qp_map is not None:
            out["qp_map"] = qp_map
        if self.deblock:
            self._apply_deblock(out)
        sao_params = None
        if self.sao:
            sao_params = self._sao_decide(out, yp, up, vp)
        slice_nal = self._assemble_slice(out, sao_params=sao_params)
        nals = slice_nal
        if self.sei_provider is not None:
            nals = self.sei_provider(self._display_counter) + nals
        self._display_counter += 1
        if self.hash_sei:
            nals += self._hash_sei(out)
        bits = len(nals) * 8
        pdt = np.uint16 if self.bit_depth > 8 else np.uint8
        ch, cw = self.src_h >> self.c_shift, self.src_w >> self.c_shift
        recon = (out["recon_y"][:self.src_h, :self.src_w].astype(pdt),
                 out["recon_u"][:ch, :cw].astype(pdt),
                 out["recon_v"][:ch, :cw].astype(pdt))
        psnr, pu, pv, ssim = frame_quality(recon, y, u, v, self.bit_depth)
        return FrameResult(nals=nals, recon=recon, bits=bits, psnr_y=psnr,
                           frame_type="I", qp=self.qp, psnr_u=pu, psnr_v=pv,
                           ssim_y=ssim)

    # ------------------------------------------------------------------
    def _encode_frame_sliced(self, y, yp, up, vp):
        """Split the picture into independent horizontal-band slices (no
        cross-band prediction — the reference's --slices; SURVEY §2c) and
        encode every band as one device batch. Each band emits its own
        slice NAL with its slice_segment_address."""
        K = self.slices
        bh = self.coded_h // K
        ys = np.stack([yp[i * bh:(i + 1) * bh] for i in range(K)])
        us = np.stack([up[i * bh // 2:(i + 1) * bh // 2] for i in range(K)])
        vs = np.stack([vp[i * bh // 2:(i + 1) * bh // 2] for i in range(K)])
        outs = self.frame_encoder.encode_frames(ys, us, vs, with_recon=True)
        total_ctus = self.rows * self.cols
        addr_bits = max(1, (total_ctus - 1).bit_length())
        nals = b""
        for i, out in enumerate(outs):
            nals += self._assemble_band_slice(
                out, first=(i == 0),
                slice_addr=i * self.band_rows * self.cols,
                addr_bits=addr_bits)
        rec_y = np.concatenate([o["recon_y"] for o in outs], axis=0)
        rec_u = np.concatenate([o["recon_u"] for o in outs], axis=0)
        rec_v = np.concatenate([o["recon_v"] for o in outs], axis=0)
        out_all = {"recon_y": rec_y, "recon_u": rec_u, "recon_v": rec_v}
        if self.hash_sei:
            nals += self._hash_sei(out_all)
        mse = float(np.mean((rec_y[:self.src_h, :self.src_w]
                             .astype(np.float64) - y) ** 2))
        pk = (1 << self.bit_depth) - 1
        psnr = 99.99 if mse == 0 else 10 * np.log10(pk * pk / mse)
        pdt = np.uint16 if self.bit_depth > 8 else np.uint8
        recon = (rec_y[:self.src_h, :self.src_w].astype(pdt),
                 rec_u[:self.src_h // 2, :self.src_w // 2].astype(pdt),
                 rec_v[:self.src_h // 2, :self.src_w // 2].astype(pdt))
        return FrameResult(nals=nals, recon=recon, bits=len(nals) * 8,
                           psnr_y=psnr)

    def _assemble_band_slice(self, out, first, slice_addr, addr_bits):
        log2cu = self.cu.bit_length() - 1
        bw = HDR.write_slice_header(self.sps, self.pps, slice_type=2,
                                    slice_qp=self.qp, first_slice=first,
                                    slice_addr=slice_addr,
                                    slice_addr_bits=addr_bits)
        res = native.encode_intra_slice(
            out["modes"], out["levels_y"], out["levels_cb"], out["levels_cr"],
            log2cu, self.qp)
        data, tail, tail_bits = res
        for b in data:
            bw.write_byte(b)
        bw.write_bits(tail, tail_bits)
        bw.rbsp_trailing_bits()
        return wrap_nal(NAL_IDR_W_RADL, bw.get_bytes())

    # ------------------------------------------------------------------
    def submit_batch(self, frames, need_recon: bool = False):
        """Async: pad + submit a batch to the device; returns a handle for
        finish_batch(). Lets the caller overlap the next batch's device time
        with this batch's host entropy coding."""
        if self.slices > 1:
            # sliced sessions encode per-frame through the band pipeline
            return ("eager", [self.encode_frame(*f) for f in frames])
        need_recon = self.hash_sei or self.deblock or need_recon
        ys = np.stack([G.pad_plane(f[0], self.coded_h, self.coded_w) for f in frames])
        us = np.stack([G.pad_plane(f[1], self.coded_h >> self.c_shift,
                                   self.coded_w >> self.c_shift)
                       for f in frames])
        vs = np.stack([G.pad_plane(f[2], self.coded_h >> self.c_shift,
                                   self.coded_w >> self.c_shift)
                       for f in frames])
        fut = self.frame_encoder.submit_frames(ys, us, vs, with_recon=need_recon)
        # enqueue the device->host copy NOW, ahead of any later batch's
        # compute: the device link is a FIFO, so requesting the copy at
        # finish time would wait behind the next batch (head-of-line block)
        try:
            fut.copy_to_host_async()
        except AttributeError:
            pass
        return (fut, frames, need_recon, (ys, us, vs, None))

    def finish_batch(self, handle) -> List["FrameResult"]:
        if isinstance(handle[0], str) and handle[0] == "eager":
            return handle[1]
        fut, frames, need_recon, rerun = handle
        outs = self.frame_encoder.collect_frames(fut, with_recon=need_recon,
                                                 rerun_inputs=rerun)
        return self._serialize_outs(outs, frames)

    def _serialize_outs(self, outs, frames):
        results = []
        for i, (y, u, v) in enumerate(frames):
            out = outs[i]
            if self.deblock:
                self._apply_deblock(out)
            nals = self._assemble_slice(out)
            if self.sei_provider is not None:
                nals = self.sei_provider(self._display_counter) + nals
            self._display_counter += 1
            if self.hash_sei:
                nals += self._hash_sei(out)
            if out["recon_y"] is not None:
                pdt = np.uint16 if self.bit_depth > 8 else np.uint8
                ch = self.src_h >> self.c_shift
                cw = self.src_w >> self.c_shift
                recon = (out["recon_y"][:self.src_h, :self.src_w].astype(pdt),
                         out["recon_u"][:ch, :cw].astype(pdt),
                         out["recon_v"][:ch, :cw].astype(pdt))
                psnr, pu, pv, ssim = frame_quality(recon, y, u, v,
                                                   self.bit_depth)
            else:
                psnr = pu = pv = ssim = 0.0
                recon = None
            results.append(FrameResult(nals=nals, recon=recon,
                                       bits=len(nals) * 8, psnr_y=psnr,
                                       frame_type="I", qp=self.qp,
                                       psnr_u=pu, psnr_v=pv, ssim_y=ssim))
        return results

    def encode_batch(self, frames, need_recon: bool = False) -> List["FrameResult"]:
        """Encode a list of (y, u, v) frames through the device-batched
        wavefront (frame-parallelism), then serialize each on the host."""
        return self.finish_batch(self.submit_batch(frames, need_recon))

    # ------------------------------------------------------------------
    def _assemble_slice(self, out: dict, qp: int = None,
                        sao_params=None, nal_type: int = NAL_IDR_W_RADL,
                        poc: int = 0) -> bytes:
        if self.max_depth and self.cu == 64:
            return self._assemble_slice_qt64(out, qp, sao_params,
                                             nal_type=nal_type, poc=poc)
        if self.max_depth:
            if self.wpp:
                return self._assemble_slice_qt_wpp(
                    out, qp, sao_params, nal_type=nal_type, poc=poc)
            return self._assemble_slice_qt(out, qp, sao_params,
                                           nal_type=nal_type, poc=poc)
        if self.wpp:
            return self._assemble_slice_wpp(out, qp, sao_params,
                                            nal_type=nal_type, poc=poc)
        qp = self.qp if qp is None else qp
        log2cu = self.cu.bit_length() - 1
        modes = out["modes"]
        qp_map = out.get("qp_map")
        bw = HDR.write_slice_header(self.sps, self.pps, slice_type=2,
                                    slice_qp=qp, nal_type=nal_type, poc=poc,
                                    sao_luma=1 if sao_params is not None else 0,
                                    sao_chroma=1 if sao_params is not None else 0)
        i444 = self.csp == "i444"
        res = native.encode_intra_slice(
            modes, out["levels_y"], out["levels_cb"], out["levels_cr"],
            log2cu, qp, sign_hiding=self.sbh, sao=sao_params,
            qp_map=qp_map, bit_depth=self.bit_depth,
            lossless=self.lossless, chroma444=i444)
        if res is not None:   # production path: C++ CABAC runtime
            data, tail, tail_bits = res
        else:                 # Python reference fallback
            enc = CabacEncoder()
            enc.init_contexts(2, qp)   # I-slice init row
            last = self.rows * self.cols - 1
            qp_prev = qp          # decoder's qPY_PREV chain (QG == CTU:
                                  # left/above neighbors are outside the CTB)
            for r in range(self.rows):
                for c in range(self.cols):
                    if sao_params is not None:
                        CS.encode_sao_ctu(
                            enc, sao_params[r][c],
                            sao_params[r][c - 1] if c > 0 else None,
                            sao_params[r - 1][c] if r > 0 else None,
                            True, True, self.bit_depth)
                    d = CS.CTUDecisions(
                        luma_mode=int(modes[r, c]),
                        luma_levels=out["levels_y"][r, c],
                        cb_levels=out["levels_cb"][r, c],
                        cr_levels=out["levels_cr"][r, c])
                    cand_left = int(modes[r, c - 1]) if c > 0 else DC_MODE
                    cand_above = DC_MODE  # above CTU row: outside current CTU
                    delta = None
                    if qp_map is not None:
                        has_cbf = (np.any(d.luma_levels) or np.any(d.cb_levels)
                                   or np.any(d.cr_levels))
                        if has_cbf:
                            delta = int(qp_map[r, c]) - qp_prev
                            qp_prev = int(qp_map[r, c])
                        # else: no residual -> delta not signaled; effective
                        # QP for this QG stays qp_prev (prediction chain)
                    CS.encode_intra_ctu_full(enc, d, log2cu, cand_left,
                                             cand_above,
                                             sign_hiding=self.sbh,
                                             tq_bypass=self.lossless,
                                             bypass_enabled=self.lossless,
                                             cu_qp_delta=delta,
                                             chroma_log2=log2cu if i444
                                             else None)
                    enc.encode_bin_trm(1 if r * self.cols + c == last else 0)
            data, tail, tail_bits = enc.finish()
        for b in data:
            bw.write_byte(b)
        bw.write_bits(tail, tail_bits)
        bw.rbsp_trailing_bits()
        return wrap_nal(nal_type, bw.get_bytes())

    # ------------------------------------------------------------------
    def _assemble_slice_qt(self, out: dict, qp: int = None,
                           sao_params=None, nal_type: int = NAL_IDR_W_RADL,
                           poc: int = 0) -> bytes:
        """Quadtree I-slice (depth 1 or 2): per-CTU coding_quadtree with
        split_cu_flag contexts from neighbor depths (9.3.4.2.2), intra-mode
        MPMs from a cell-granular mode map (above candidates outside the
        current CTB row force DC, spec 8.4.2)."""
        qp = self.qp if qp is None else qp
        split = out["split"]
        mode32 = out["modes"]
        modes4 = out["modes4"]
        bw = HDR.write_slice_header(self.sps, self.pps, slice_type=2,
                                    slice_qp=qp, nal_type=nal_type, poc=poc,
                                    sao_luma=1 if sao_params is not None else 0,
                                    sao_chroma=1 if sao_params is not None else 0)
        qp_map = out.get("qp_map")
        res = native.encode_slice_qt2(2, self.max_depth, out, qp,
                                      sign_hiding=self.sbh, sao=sao_params,
                                      qp_map=qp_map,
                                      bit_depth=self.bit_depth)
        if res is not None:
            data, tail, tail_bits = res
        else:
            if isinstance(sao_params, np.ndarray):
                sao_params = native.unpack_sao(sao_params, self.rows, self.cols)
            enc = CabacEncoder()
            enc.init_contexts(2, qp)
            g = 1 << self.max_depth       # cells per CTU side
            gr, gc = g * self.rows, g * self.cols
            mode_map = np.full((gr, gc), DC_MODE, np.int32)
            depth_map = np.zeros((gr, gc), np.int32)
            last = self.rows * self.cols - 1
            qp_state = [qp]       # decoder qPY_PREV chain (QG == CTU)
            for r in range(self.rows):
                for c in range(self.cols):
                    if sao_params is not None:
                        CS.encode_sao_ctu(
                            enc, sao_params[r][c],
                            sao_params[r][c - 1] if c > 0 else None,
                            sao_params[r - 1][c] if r > 0 else None,
                            True, True, self.bit_depth)
                    ctu_qp = None if qp_map is None else int(qp_map[r, c])
                    self._write_ctu_qt(enc, out, r, c, mode_map, depth_map,
                                       ctu_qp, qp_state)
                    enc.encode_bin_trm(1 if r * self.cols + c == last else 0)
            data, tail, tail_bits = enc.finish()
        for b in data:
            bw.write_byte(b)
        bw.write_bits(tail, tail_bits)
        bw.rbsp_trailing_bits()
        return wrap_nal(nal_type, bw.get_bytes())

    # ------------------------------------------------------------------
    def _assemble_slice_qt64(self, out: dict, qp: int = None,
                             sao_params=None, nal_type: int = NAL_IDR_W_RADL,
                             poc: int = 0) -> bytes:
        """CTU64 I-slice: depth-0 always split (encoder choice), recursive
        coding_quadtree over the device's 32/16/8 decisions with split_cu
        contexts from an 8px-cell depth map."""
        from .qt_common import QOFF
        qp = self.qp if qp is None else qp
        bw = HDR.write_slice_header(self.sps, self.pps, slice_type=2,
                                    slice_qp=qp, nal_type=nal_type, poc=poc,
                                    sao_luma=1 if sao_params is not None else 0,
                                    sao_chroma=1 if sao_params is not None else 0)
        qp_map = out.get("qp_map")
        res = native.encode_intra_slice_qt64(
            out, self.rows, self.cols, qp, self.max_depth,
            sign_hiding=self.sbh, sao=sao_params, qp_map=qp_map,
            bit_depth=self.bit_depth)
        if res is not None:
            data, tail, tail_bits = res
            for b in data:
                bw.write_byte(b)
            bw.write_bits(tail, tail_bits)
            bw.rbsp_trailing_bits()
            return wrap_nal(nal_type, bw.get_bytes())
        enc = CabacEncoder()
        enc.init_contexts(2, qp)
        md = self.max_depth            # 2 or 3 (from CTU64)
        g = 8                          # 8px cells per CTU side: 64/8
        cell = 8
        gr, gc = g * self.rows, g * self.cols
        mode_map = np.full((gr, gc), DC_MODE, np.int32)
        depth_map = np.zeros((gr, gc), np.int32)
        last = self.rows * self.cols - 1
        qp_state = [qp]
        from ..bitstream.tables import CTX_OFFSET as CTX

        for r in range(self.rows):
            for c in range(self.cols):
                if sao_params is not None:
                    CS.encode_sao_ctu(
                        enc, sao_params[r][c],
                        sao_params[r][c - 1] if c > 0 else None,
                        sao_params[r - 1][c] if r > 0 else None,
                        True, True, self.bit_depth)
                ctu_qp = None if qp_map is None else int(qp_map[r, c])
                gy, gx = g * r, g * c
                lv_y = out["levels_y"][r, c]
                lv_cb = out["levels_cb"][r, c]
                lv_cr = out["levels_cr"][r, c]
                state = {"pending": ctu_qp is not None}

                def split_flag(cy, cx, d, sp):
                    ctx = ((1 if cx > 0 and depth_map[cy, cx - 1] > d else 0)
                           + (1 if cy > 0 and depth_map[cy - 1, cx] > d
                              else 0))
                    enc.encode_bin(1 if sp else 0, CTX["split_cu"] + ctx)

                def code_cu(cy, cx, sc, mode, depth):
                    px = sc * cell
                    log2 = px.bit_length() - 1
                    oy, ox = (cy - gy) * cell, (cx - gx) * cell
                    d = CS.CTUDecisions(
                        luma_mode=mode,
                        luma_levels=lv_y[oy:oy + px, ox:ox + px],
                        cb_levels=lv_cb[oy // 2:oy // 2 + px // 2,
                                        ox // 2:ox // 2 + px // 2],
                        cr_levels=lv_cr[oy // 2:oy // 2 + px // 2,
                                        ox // 2:ox // 2 + px // 2])
                    cand_left = int(mode_map[cy, cx - 1]) if cx > 0 \
                        else DC_MODE
                    cand_above = int(mode_map[cy - 1, cx]) if (cy % g) != 0 \
                        else DC_MODE
                    delta = None
                    if state["pending"] and (np.any(d.luma_levels)
                                             or np.any(d.cb_levels)
                                             or np.any(d.cr_levels)):
                        delta = ctu_qp - qp_state[0]
                        qp_state[0] = ctu_qp
                        state["pending"] = False
                    CS.encode_intra_ctu_full(
                        enc, d, log2, cand_left, cand_above,
                        part_mode_coded=(log2 == 6 - md),
                        sign_hiding=self.sbh, cu_qp_delta=delta)
                    mode_map[cy:cy + sc, cx:cx + sc] = mode
                    depth_map[cy:cy + sc, cx:cx + sc] = depth

                split_flag(gy, gx, 0, True)     # depth-0: always split
                for q, (qy, qx) in enumerate(QOFF):
                    cy32, cx32 = gy + 4 * qy, gx + 4 * qx
                    sp32 = bool(out["split32"][r, c, q])
                    split_flag(cy32, cx32, 1, sp32)
                    if not sp32:
                        code_cu(cy32, cx32, 4,
                                int(out["modes32"][r, c, q]), 1)
                        continue
                    for sq, (sy_, sx_) in enumerate(QOFF):
                        cy16, cx16 = cy32 + 2 * sy_, cx32 + 2 * sx_
                        if md == 2:
                            code_cu(cy16, cx16, 2,
                                    int(out["modes16"][r, c, q, sq]), 2)
                            continue
                        sp16 = bool(out["split16"][r, c, q, sq])
                        split_flag(cy16, cx16, 2, sp16)
                        if not sp16:
                            code_cu(cy16, cx16, 2,
                                    int(out["modes16"][r, c, q, sq]), 2)
                        else:
                            for uq, (uy, ux) in enumerate(QOFF):
                                code_cu(cy16 + uy, cx16 + ux, 1,
                                        int(out["modes8"][r, c, q, sq, uq]),
                                        3)
                enc.encode_bin_trm(1 if r * self.cols + c == last else 0)
        data, tail, tail_bits = enc.finish()
        for b in data:
            bw.write_byte(b)
        bw.write_bits(tail, tail_bits)
        bw.rbsp_trailing_bits()
        return wrap_nal(nal_type, bw.get_bytes())

    def _write_ctu_qt(self, enc, out, r, c, mode_map, depth_map,
                      ctu_qp=None, qp_state=None):
        from ..bitstream.tables import CTX_OFFSET as CTX
        from .qt_common import QOFF
        md = self.max_depth
        g = 1 << md                      # cells per CTU side
        cell = 32 // g                   # cell size in pixels
        gy, gx = g * r, g * c
        lv_y = out["levels_y"][r, c]
        lv_cb = out["levels_cb"][r, c]
        lv_cr = out["levels_cr"][r, c]
        state = {"pending": ctu_qp is not None}

        def split_flag(cy, cx, d, sp):
            ctx = ((1 if cx > 0 and depth_map[cy, cx - 1] > d else 0)
                   + (1 if cy > 0 and depth_map[cy - 1, cx] > d else 0))
            enc.encode_bin(1 if sp else 0, CTX["split_cu"] + ctx)

        def code_cu(cy, cx, sc, mode, depth):
            px = sc * cell
            log2 = px.bit_length() - 1
            oy, ox = (cy - gy) * cell, (cx - gx) * cell
            d = CS.CTUDecisions(
                luma_mode=mode,
                luma_levels=lv_y[oy:oy + px, ox:ox + px],
                cb_levels=lv_cb[oy // 2:oy // 2 + px // 2,
                                ox // 2:ox // 2 + px // 2],
                cr_levels=lv_cr[oy // 2:oy // 2 + px // 2,
                                ox // 2:ox // 2 + px // 2])
            cand_left = int(mode_map[cy, cx - 1]) if cx > 0 else DC_MODE
            cand_above = int(mode_map[cy - 1, cx]) if (cy % g) != 0 \
                else DC_MODE
            delta = None
            if state["pending"] and (np.any(d.luma_levels)
                                     or np.any(d.cb_levels)
                                     or np.any(d.cr_levels)):
                delta = ctu_qp - qp_state[0]
                qp_state[0] = ctu_qp
                state["pending"] = False     # one delta per QG (== CTU)
            CS.encode_intra_ctu_full(enc, d, log2, cand_left, cand_above,
                                     part_mode_coded=(log2 == 5 - md),
                                     sign_hiding=self.sbh,
                                     cu_qp_delta=delta)
            mode_map[cy:cy + sc, cx:cx + sc] = mode
            depth_map[cy:cy + sc, cx:cx + sc] = depth

        sp0 = bool(out["split"][r, c])
        split_flag(gy, gx, 0, sp0)
        if not sp0:
            code_cu(gy, gx, g, int(out["modes"][r, c]), 0)
            return
        half = g // 2
        for q, (qy, qx) in enumerate(QOFF):
            cy, cx = gy + qy * half, gx + qx * half
            if md == 1:
                code_cu(cy, cx, 1, int(out["modes4"][r, c, q]), 1)
                continue
            sp1 = bool(out["split16"][r, c, q])
            split_flag(cy, cx, 1, sp1)
            if not sp1:
                code_cu(cy, cx, 2, int(out["modes4"][r, c, q]), 1)
            else:
                for sq, (sy_, sx_) in enumerate(QOFF):
                    code_cu(cy + sy_, cx + sx_, 1,
                            int(out["modes8"][r, c, q, sq]), 2)

    # ------------------------------------------------------------------
    def _assemble_slice_wpp(self, out: dict, qp: int = None,
                            sao_params=None, nal_type: int = NAL_IDR_W_RADL,
                            poc: int = 0) -> bytes:
        """WPP slice: one CABAC substream per CTU row. Row r>0 inherits the
        context states saved after the second CTU of row r-1 (spec 9.3.1
        entropy sync); each row ends with end_of_subset_one_bit + byte
        alignment; entry_point_offsets index the substream boundaries.
        Mirrors the reference's wavefront entropy instances — and matches
        the device encoder's diagonal schedule (row r is encodable as soon
        as row r-1 is two CTUs ahead)."""
        qp = self.qp if qp is None else qp
        log2cu = self.cu.bit_length() - 1
        modes = out["modes"]
        # the sync source is the above-right CTB (second CTB of the row
        # above); with a single CTB column it is unavailable and every row
        # re-initializes (spec 9.3.2.2)
        sync_c = 1 if self.cols > 1 else None
        last_r = self.rows - 1
        blobs = []
        saved = None
        for r in range(self.rows):
            enc = CabacEncoder()
            if r == 0 or saved is None:
                enc.init_contexts(2, qp)
            else:
                enc.ctx = saved.copy()
            for c in range(self.cols):
                if sao_params is not None:
                    CS.encode_sao_ctu(
                        enc, sao_params[r][c],
                        sao_params[r][c - 1] if c > 0 else None,
                        sao_params[r - 1][c] if r > 0 else None,
                        True, True, self.bit_depth)
                d = CS.CTUDecisions(
                    luma_mode=int(modes[r, c]),
                    luma_levels=out["levels_y"][r, c],
                    cb_levels=out["levels_cb"][r, c],
                    cr_levels=out["levels_cr"][r, c])
                cand_left = int(modes[r, c - 1]) if c > 0 else DC_MODE
                CS.encode_intra_ctu_full(enc, d, log2cu, cand_left, DC_MODE,
                                         sign_hiding=self.sbh)
                if c == sync_c:
                    saved = enc.ctx.copy()
                is_last = (r == last_r and c == self.cols - 1)
                enc.encode_bin_trm(1 if is_last else 0)
            if r < last_r:
                enc.encode_bin_trm(1)            # end_of_subset_one_bit
            data, tail, tail_bits = enc.finish()
            sub = BitWriter()
            for b in data:
                sub.write_byte(b)
            sub.write_bits(tail, tail_bits)
            sub.write_bits(1, 1)                 # stop bit
            sub.write_align_zero()               # byte_alignment()
            blobs.append(sub.get_bytes())
        offsets = [len(b) for b in blobs[:-1]]
        bw = HDR.write_slice_header(self.sps, self.pps, slice_type=2,
                                    slice_qp=qp, nal_type=nal_type, poc=poc,
                                    sao_luma=1 if sao_params is not None else 0,
                                    sao_chroma=1 if sao_params is not None else 0,
                                    entry_point_offsets=offsets)
        for blob in blobs:
            for b in blob:
                bw.write_byte(b)
        return wrap_nal(nal_type, bw.get_bytes())

    def _assemble_slice_qt_wpp(self, out: dict, qp: int = None,
                               sao_params=None,
                               nal_type: int = NAL_IDR_W_RADL,
                               poc: int = 0) -> bytes:
        """Quadtree intra slice with WPP substreams (round 3: lifts the r1
        quadtree-x-wpp gate): one CABAC substream per CTU row with 9.3.1
        entropy sync; the per-CU QP predictor chain resets to the slice QP
        at each row start (spec 8.6.1)."""
        qp = self.qp if qp is None else qp
        qp_map = out.get("qp_map")
        g = 1 << self.max_depth
        mode_map = np.zeros((g * self.rows, g * self.cols), np.int32)
        depth_map = np.zeros((g * self.rows, g * self.cols), np.int32)
        sync_c = 1 if self.cols > 1 else None
        last_r = self.rows - 1
        blobs = []
        saved = None
        for r in range(self.rows):
            enc = CabacEncoder()
            if r == 0 or saved is None:
                enc.init_contexts(2, qp)
            else:
                enc.ctx = saved.copy()
            qp_state = [qp]              # qPY_PREV resets per CTU row
            for c in range(self.cols):
                if sao_params is not None:
                    CS.encode_sao_ctu(
                        enc, sao_params[r][c],
                        sao_params[r][c - 1] if c > 0 else None,
                        sao_params[r - 1][c] if r > 0 else None,
                        True, True, self.bit_depth)
                self._write_ctu_qt(enc, out, r, c, mode_map, depth_map,
                                   ctu_qp=None if qp_map is None
                                   else int(qp_map[r, c]),
                                   qp_state=qp_state)
                if c == sync_c:
                    saved = enc.ctx.copy()
                is_last = (r == last_r and c == self.cols - 1)
                enc.encode_bin_trm(1 if is_last else 0)
            if r < last_r:
                enc.encode_bin_trm(1)
            data, tail, tail_bits = enc.finish()
            sub = BitWriter()
            for b in data:
                sub.write_byte(b)
            sub.write_bits(tail, tail_bits)
            sub.write_bits(1, 1)
            sub.write_align_zero()
            blobs.append(sub.get_bytes())
        offsets = [len(b) for b in blobs[:-1]]
        bw = HDR.write_slice_header(self.sps, self.pps, slice_type=2,
                                    slice_qp=qp, nal_type=nal_type, poc=poc,
                                    sao_luma=1 if sao_params is not None else 0,
                                    sao_chroma=1 if sao_params is not None else 0,
                                    entry_point_offsets=offsets)
        for blob in blobs:
            for b in blob:
                bw.write_byte(b)
        return wrap_nal(nal_type, bw.get_bytes())

    # ------------------------------------------------------------------
    def _sao_decide(self, out: dict, yp, up, vp, qp=None):
        """Per-CTU SAO decision + recon update (decoder-exact application).

        K11 device form: statistics run as one jitted program of fused
        mask+tile reductions (sao.sao_stats_dev — the reference's
        calcSaoStatsCTU, sao.cpp:735); decisions and application are
        vectorized over the whole CTU grid (rdoSaoUnitCu analog,
        sao.cpp:1225) at SSD + lambda2(qp)*bits."""
        from ..ops import sao as SAO
        from ..utils.profiling import PROF
        bd = self.bit_depth
        n, nc = self.cu, self.cu // 2
        lam = SAO.sao_lambda(self.qp if qp is None else qp)
        with PROF("sao.stats_dev"):
            st_y, st_cb, st_cr = SAO.sao_stats_dev3(
                (out["recon_y"], out["recon_u"], out["recon_v"]),
                (yp, up, vp), n, bd)
        with PROF("sao.decide"):
            ty, ay, oy = SAO.decide_sao_luma_all(st_y, bd, lam)
            tc, acb, acr, ocb, ocr = SAO.decide_sao_chroma_all(st_cb,
                                                               st_cr, bd,
                                                               lam)
        params = [[{"luma": (int(ty[r, c]), int(ay[r, c]),
                             oy[r, c].tolist()),
                    "cb": (int(tc[r, c]), int(acb[r, c]),
                           ocb[r, c].tolist()),
                    "cr": (int(tc[r, c]), int(acr[r, c]),
                           ocr[r, c].tolist())}
                   for c in range(self.cols)] for r in range(self.rows)]
        with PROF("sao.apply"):
            out["recon_y"] = SAO.apply_sao_component_vec(
                out["recon_y"], ty, ay, oy, n, bd)
            out["recon_u"] = SAO.apply_sao_component_vec(
                out["recon_u"], tc, acb, ocb, nc, bd)
            out["recon_v"] = SAO.apply_sao_component_vec(
                out["recon_v"], tc, acr, ocr, nc, bd)
        return params

    # ------------------------------------------------------------------
    def _nr_offsets(self):
        """Denoise offsets for the next frame from running |coef| sums
        (reference noiseReductionUpdate, frameencoder.cpp:2100)."""
        from ..ops.quant import nr_update_offsets
        st = self._nr
        log2 = self.cu.bit_length() - 1
        offy, st["sum_y"], st["cnt_y"] = nr_update_offsets(
            st["sum_y"], st["cnt_y"], self.nr_intra,
            1 << (18 - 2 * (log2 - 2)))
        offc, st["sum_c"], st["cnt_c"] = nr_update_offsets(
            st["sum_c"], st["cnt_c"], self.nr_intra,
            1 << (18 - 2 * (log2 - 3)))
        nc = self.cu // 2
        return offy.reshape(self.cu, self.cu), offc.reshape(nc, nc)

    def _nr_accumulate(self, out: dict):
        st = self._nr
        st["sum_y"] = st["sum_y"] + out["nr_sum_y"]
        st["cnt_y"] += self.rows * self.cols
        st["sum_c"] = st["sum_c"] + out["nr_sum_c"]
        st["cnt_c"] += 2 * self.rows * self.cols

    # ------------------------------------------------------------------
    def _hash_sei(self, out: dict) -> bytes:
        """Decoded-picture-hash SEI. hash_type: 0=MD5, 1=CRC, 2=checksum
        (reference --hash 1/2/3, frameencoder.cpp:1169)."""
        bw = BitWriter()
        bw.write_bits(132, 8)          # payload type: decoded_picture_hash
        ht = getattr(self, "hash_type", 0)
        payload = bytearray([ht])
        pdt = np.uint16 if self.bit_depth > 8 else np.uint8
        for plane in ("recon_y", "recon_u", "recon_v"):
            pix = out[plane].astype(pdt)
            if ht == 1:                # CRC (picyuv.cpp:507)
                crc = native.crc16(pix.tobytes())
                payload += bytes([(crc >> 8) & 0xff, crc & 0xff])
            elif ht == 2:              # checksum (picyuv.cpp:556)
                h, w = pix.shape
                xs = np.arange(w, dtype=np.uint32)
                ys = np.arange(h, dtype=np.uint32)[:, None]
                xor = ((xs & 0xff) ^ (ys & 0xff) ^ (xs >> 8) ^ (ys >> 8))
                p32 = pix.astype(np.uint32)
                cks = int(((p32 & 0xff) ^ xor).sum(dtype=np.uint64)
                          & 0xffffffff)
                if self.bit_depth > 8:
                    cks = (cks + int(((p32 >> 8) ^ xor).sum(dtype=np.uint64))) \
                        & 0xffffffff
                payload += cks.to_bytes(4, "big")
            else:                      # MD5
                payload += hashlib.md5(pix.tobytes()).digest()
        bw.write_bits(len(payload), 8)
        for b in payload:
            bw.write_byte(b)
        bw.rbsp_trailing_bits()
        return wrap_nal(NAL_SUFFIX_SEI, bw.get_bytes())


class VideoEncoderSession:
    """GOP session: IDR + P frames (IPPP), CQP, one L0 reference
    (BASELINE config[1] scope). Extends the intra session with a DPB of one
    reference picture and P-slice assembly."""

    def __init__(self, width: int, height: int, qp: int = 32, cu_size: int = 16,
                 fps: Tuple[int, int] = (25, 1), keyint: int = 25,
                 search_range: int = 16, hash_sei: bool = True,
                 max_merge: int = 3, rc_mode: str = "cqp", crf: float = 28.0,
                 bitrate_kbps: int = 0, stats_write: str = None,
                 stats_read: str = None, bframes: int = 0,
                 deblock: bool = False, sao: bool = False,
                 vbv_maxrate_kbps: int = 0, vbv_bufsize_kbps: int = 0,
                 rdoq: bool = False, weightp: bool = False,
                 sbh: bool = False, zones: str = None,
                 analysis_save: str = None, analysis_load: str = None,
                 aq_mode: int = 0, aq_strength: float = 1.0,
                 cutree: bool = False, b_pyramid: bool = True,
                 max_depth: int = 0, psy_rd: float = 0.0,
                 bit_depth: int = 8, hme: bool = False, hme_range: int = 16,
                 hash_type: int = 0, b_adapt: int = 2,
                 psy_rdoq: float = 0.0, open_gop: bool = False,
                 scale_factor: int = 1, analysis_share=None,
                 qp_min: int = 4, qp_max: int = 51,
                 rc_lookahead: int = 0, n_refs: int = 1,
                 tmvp: bool = False, wpp: bool = False,
                 rqt: bool = False, hrd: bool = False,
                 frame_dup: bool = False, dup_threshold: int = 70,
                 hist_scenecut: bool = False,
                 quality_metrics: bool = True,
                 scenecut_aware_qp: bool = False,
                 scenecut_qp_delta: int = 5,
                 scenecut_window: int = 12,
                 dpb_device: bool = None, recon_out: bool = True,
                 b_intra: bool = False):
        from .inter_encoder import InterFrameEncoder, InterFrameConfig
        from .ratecontrol import RateControl, RCConfig
        # reference bIntraInBFrames (--b-intra): OFF at medium and faster
        # presets — B slices evaluate no intra candidates
        self.b_intra = bool(b_intra)
        # multi-ref (reference --ref): 2 L0 references on the uniform IPPP
        # path (round 3); quadtree/bframes keep 1 ref per list for now
        self.n_refs = max(1, min(n_refs, 2))
        # TMVP (reference --tmvp, cudata.cpp temporal candidate): uniform
        # IPPP sessions; the python serializer derives the temporal
        # candidates, so the native writer is bypassed when enabled
        self.tmvp = bool(tmvp) and not bframes and not max_depth
        self.col_field = None
        self._last_ref_deltas = [1]
        if self.n_refs > 1:
            assert not (bframes or max_depth or weightp or analysis_load
                        or analysis_save or analysis_share), \
                "multi-ref: uniform IPPP sessions (v1)"
        # residual TU quadtree (round 3): inter CTU32 leaves may split
        # their TU 32 -> 4x16 (reference estimateResidualQT,
        # search.cpp:3178); decisions on device, syntax via the python
        # writer (native RQT serialization pending)
        self.rqt = bool(rqt) and max_depth > 0
        if max_depth:
            cu_size = 32
            assert not analysis_load and not analysis_save, \
                "inter quadtree: no analysis reuse (v1)"
        self.max_depth = max_depth
        self.aq_mode = aq_mode
        self.aq_strength = aq_strength
        self.cutree = cutree
        # WPP bitstreams (round 3: P/B substreams too — the r2 intra-only
        # gate is gone); per-CU QP is off under WPP (qPY_PREV resets per
        # row, spec 8.6.1 — matching v1 writer scope)
        self.wpp = bool(wpp) and not max_depth
        if self.wpp:
            assert not (aq_mode or cutree), \
                "WPP inter sessions: no per-CU QP (v1)"
        # ---- device-resident DPB (round 4) ---------------------------------
        # When the whole frame program (encode + deblock + SAO) runs in-jit,
        # reference recon stays on device between frames: per-frame transfers
        # drop to src-upload + decision-download (ROUND4 #1; the reference
        # keeps recon in shared memory, frame.h:105).  Quadtree CTU32
        # sessions only; paths that read recon host-side opt out.
        dpb_ok = (max_depth >= 1 and not self.wpp and not weightp
                  and self.n_refs == 1 and not self.tmvp)
        self.dpb_device = dpb_ok if dpb_device is None \
            else bool(dpb_device) and dpb_ok
        self.recon_out = bool(recon_out)
        self.intra_sess = IntraEncoderSession(width, height, qp, cu_size, fps,
                                              hash_sei=False, deblock=deblock,
                                              sao=sao, rdoq=rdoq, sbh=sbh,
                                              max_depth=max_depth,
                                              psy_rd=psy_rd,
                                              bit_depth=bit_depth,
                                              hash_type=hash_type,
                                              wpp=self.wpp,
                                              psy_rdoq=psy_rdoq,
                                              dpb_device=self.dpb_device)
        self.bit_depth = bit_depth
        self.sbh = self.intra_sess.sbh
        if aq_mode or cutree:
            self.intra_sess.pps.cu_qp_delta = 1
        if self.tmvp:
            self.intra_sess.sps.temporal_mvp = 1
        if self.rqt:
            self.intra_sess.sps.max_transform_hierarchy_depth_inter = 1
        # HRD signaling (reference --hrd; spec Annex E/D): VUI
        # hrd_parameters + buffering_period at IRAPs + pic_timing per
        # AU. Requires VBV rates (the CPB is the VBV buffer).
        self.hrd = bool(hrd) and vbv_maxrate_kbps > 0 \
            and vbv_bufsize_kbps > 0
        if self.hrd:
            self.intra_sess.sps.hrd = (vbv_maxrate_kbps * 1000,
                                       vbv_bufsize_kbps * 1000, 0)
            self._au_count = 0
            self._enc_order = 0
        # frame duplication (reference --frame-dup + dupThreshold,
        # encoder.cpp:1613): near-identical consecutive frames encode
        # as an ALL-SKIP P slice (zero-MV merge, no residual) - no
        # device pass at all, recon == reference
        self.frame_dup = (bool(frame_dup) and not bframes
                          and self.n_refs == 1 and not tmvp)
        # scene-cut-aware QP (reference bEnableSceneCutAwareQp,
        # x265.h:1561+): frames in the forward window after a cut are
        # perceptually masked -> raise their QP with a 3-step decay
        # (the reference's full/2-3rds/1-3rd window split)
        self.scenecut_aware_qp = bool(scenecut_aware_qp)
        # full PSNR-YUV + SSIM per frame costs host time (SSIM ~0.9 s
        # at 1080p even vectorized); callers that don't read the CSV
        # metrics turn it off (the reference computes PSNR/SSIM only
        # under --psnr/--ssim too)
        self.quality_metrics = bool(quality_metrics)
        self.scenecut_qp_delta = scenecut_qp_delta
        self.scenecut_window = max(scenecut_window, 3)
        self._since_scenecut = 10 ** 9
        self.dup_threshold = min(max(dup_threshold, 1), 99)
        self._prev_src_y = None
        self.deblock = deblock
        self.sao = sao
        # share geometry/headers with the intra session but fix DPB size
        self.intra_sess.sps.max_dec_pic_buffering = 2
        self.src_w, self.src_h = width, height
        self.qp = qp
        self.cu = cu_size
        self.keyint = max(keyint, 1)
        # reference keyframeMin derivation (param.cpp/x265_check_params):
        # scenecut keyframes are suppressed closer than this to the last
        # one — without it, cost-rule false positives IDR-storm panning
        # content (round-4 pan640 finding)
        self.keyint_min = max(1, min(int(round(fps[0] / max(fps[1], 1))),
                                     self.keyint // 10))
        self._last_idr_didx = -10 ** 9
        self.hash_sei = hash_sei
        self.max_merge = max_merge
        self.coded_w = self.intra_sess.coded_w
        self.coded_h = self.intra_sess.coded_h
        self.rows, self.cols = self.intra_sess.rows, self.intra_sess.cols
        self.weightp = weightp
        if weightp:
            self.intra_sess.pps.weighted_pred = 1
        # ---- analysis reuse (reference --analysis-save/load) --------------
        self.analysis_save = open(analysis_save, "wb") if analysis_save else None
        self.analysis_data = None
        self.analysis_idx = 0
        # in-memory cross-session sharing (reference AbrEncoder handoff):
        # "save" keeps each frame's record in self.shared_analysis; a list
        # means records arrive from a donor session as encoding proceeds
        self.shared_analysis = [] if analysis_share == "save" else None
        if isinstance(analysis_share, list):
            self.analysis_data = analysis_share
        if analysis_load:
            import pickle
            recs = []
            with open(analysis_load, "rb") as f:
                try:
                    while True:
                        recs.append(pickle.load(f))
                except EOFError:
                    pass
            if scale_factor > 1:
                # cross-resolution reuse (reference --scale-factor +
                # scale1D/2D primitives, K19)
                recs = [scale_analysis_rec(r, scale_factor,
                                           self.rows, self.cols)
                        for r in recs]
            self.analysis_data = recs
        self.inter_encoder = InterFrameEncoder(InterFrameConfig(
            width=self.coded_w, height=self.coded_h, cu_size=cu_size, qp=qp,
            search_range=search_range, rdoq=rdoq, weightp=weightp,
            sbh=self.sbh, analysis_load=self.analysis_data is not None
            or isinstance(analysis_share, list),
            n_refs=self.n_refs, rqt=self.rqt,
            max_depth=max_depth, bit_depth=bit_depth,
            psy_rd=psy_rd if max_depth else 0.0,
            psy_rdoq=psy_rdoq if rdoq else 0.0,
            hme=hme and max_depth > 0, hme_range=hme_range,
            dpb=self.dpb_device, deblock=deblock and self.dpb_device,
            sao=sao and self.dpb_device))
        self.frame_idx = 0
        self.poc = 0
        self.ref = None   # (y, u, v) padded recon planes
        self.ref2 = None  # second L0 reference (n_refs == 2)
        self.rc = RateControl(RCConfig(
            mode=rc_mode, qp=qp, crf=crf, bitrate_kbps=bitrate_kbps,
            fps=fps[0] / max(fps[1], 1), width=width, height=height,
            qp_min=qp_min, qp_max=qp_max,
            vbv_maxrate_kbps=vbv_maxrate_kbps,
            vbv_bufsize_kbps=vbv_bufsize_kbps))
        from .lookahead import Lookahead
        self.lookahead = Lookahead(self.coded_w, self.coded_h,
                                   hist_scenecut=hist_scenecut)
        self.scenecut_enabled = True
        from .ratecontrol import StatsWriter, TwoPassRC
        # pass-1 #options header: the fields x265's --pass 2 parser
        # validates (ratecontrol.cpp:463-532)
        opts = (f"input-res={width}x{height} fps={fps[0]}/{fps[1]} "
                f"bitdepth={bit_depth} weightp={int(bool(weightp))} "
                f"bframes={max(0, bframes)} b-pyramid={int(bool(b_pyramid))} "
                f"open-gop={int(bool(open_gop))} keyint={keyint} "
                f"scenecut=40 intra-refresh=0 frame-dup=0 "
                f"b-adapt={b_adapt} rc-lookahead={rc_lookahead} "
                f"vbv-maxrate={vbv_maxrate_kbps} "
                f"vbv-bufsize={vbv_bufsize_kbps} ctu={cu_size} ref=1")
        self.stats_writer = (StatsWriter(stats_write, options=opts)
                             if stats_write else None)
        self.two_pass = TwoPassRC(stats_read, bitrate_kbps,
                                  fps[0] / max(fps[1], 1)) if stats_read else None
        # pass-1 cuTree offsets present -> signal cu_qp_delta and emit a QP
        # map on EVERY frame (PPS cu_qp_delta requires the delta syntax)
        self._tp_delta_on = bool(
            self.two_pass is not None
            and any("cuoff" in r for r in self.two_pass.records))
        if self._tp_delta_on:
            self.intra_sess.pps.cu_qp_delta = 1
        # ---- B-frame mini-GOP state (bframes > 0) -------------------------
        self.bframes = max(0, bframes)
        self.b_pyramid = b_pyramid and self.bframes >= 2
        self.bi_encoder = None
        if self.bframes:
            self.intra_sess.sps.max_dec_pic_buffering = \
                5 if self.b_pyramid else 4
            self.intra_sess.sps.num_reorder_pics = 2 if self.b_pyramid else 1
            self.bi_encoder = InterFrameEncoder(InterFrameConfig(
                width=self.coded_w, height=self.coded_h, cu_size=cu_size,
                qp=qp, search_range=search_range, bi=True, rdoq=rdoq,
                rqt=self.rqt,
                sbh=self.sbh, max_depth=max_depth, bit_depth=bit_depth,
                psy_rd=psy_rd if max_depth else 0.0,
                psy_rdoq=psy_rdoq if rdoq else 0.0,
                hme=hme and max_depth > 0, hme_range=hme_range,
                intra_in_b=self.b_intra,
                dpb=self.dpb_device, deblock=deblock and self.dpb_device,
                sao=sao and self.dpb_device))
        self.sei_provider = None    # callable(display_idx) -> prefix bytes
        self.pending = []           # buffered display-order frames (y, u, v)
        self.pending_lowres = []    # matching lowres planes (b-adapt)
        self.anchor_lowres = None   # lowres of the last coded anchor
        self.display_idx = 0
        self.anchor = None          # (recon planes, poc) of last I/P anchor
        # open GOP (reference --open-gop): keyframes after the first are
        # CRA pictures; frames pending at the keyframe become leading
        # pictures (RASL) referencing across it
        self.open_gop = open_gop
        # b-adapt level (reference --b-adapt): 0 = fixed mini-GOPs,
        # 1 = fast early-close heuristic, 2 = path search (default, like
        # the reference's medium-and-up presets)
        self.b_adapt = b_adapt
        # cuTree accumulator on the lowres 8x8 grid (causal EWMA of the
        # propagate-in amounts; see _cutree_update)
        self.cutree_acc = np.zeros((self.lookahead.lh // 8,
                                    self.lookahead.lw // 8))
        self.cutree_icost = np.maximum(self.cutree_acc, 1.0)
        self.cutree_strength = 2.0
        # ---- windowed lookahead (reference --rc-lookahead, slicetype.cpp
        # slicetypeAnalyse over a sliding window): frames are delayed by
        # la_depth display frames so cuTree can propagate REAL future costs
        # backwards (models/slicetype.py) instead of the causal EWMA.
        # P-only sessions drive it through push_la()/flush_la(); B sessions
        # (round 3) layer the window UNDER push_frame(): frames enter the
        # mini-GOP machinery only after la_depth future frames have been
        # analysed, and every encode's cuTree offsets propagate from its
        # own future-window snapshot (pending_windows).
        self.la_depth = max(0, rc_lookahead) if cutree else 0
        self.la_queue = []          # (y, u, v, icost, pcost, scenecut, detail, didx)
        self.pending_windows = []   # per-pending-frame future-window snapshots
        self._cutree_window = None  # details list while encoding a delayed frame
        # --- zones (reference --zones start,end,q=N|b=M[/...]) ------------
        self.zones = []
        self.gop_display_base = 0
        if zones:
            for part in zones.split("/"):
                s, e, opt = part.split(",", 2)
                zq = zb = None
                k, _, val = opt.partition("=")
                if k == "q":
                    zq = int(val)
                elif k == "b":
                    zb = float(val)
                self.zones.append((int(s), int(e), zq, zb))

    def _zone_qp(self, display_idx: int, qp: int) -> int:
        import math
        for s, e, zq, zb in self.zones:
            if s <= display_idx <= e:
                if zq is not None:
                    return zq
                if zb:
                    return int(round(min(max(qp - 6 * math.log2(zb), 0), 51)))
        return qp

    def headers(self) -> bytes:
        return self.intra_sess.headers()

    def intra_refresh(self):
        """x265_encoder_intra_refresh (x265.h:2161): force the next frame to
        be a recovery point (coded as IDR here — packet-loss recovery for
        streaming)."""
        self._force_idr = True

    def push_la(self, y, u, v) -> List["FrameResult"]:
        """Windowed-lookahead ingest (reference Lookahead::addPicture →
        slicetypeAnalyse over a sliding window, slicetype.cpp:1139,1879):
        buffer la_depth display frames; once the window is full, the oldest
        frame encodes with cuTree offsets back-propagated from the decided
        future window (models/slicetype.py). Returns 0 or 1 results."""
        assert self.la_depth > 0, "push_la requires rc_lookahead > 0"
        yp0 = G.pad_plane(y, self.coded_h, self.coded_w)
        icost, pcost, scenecut = self.lookahead.push(yp0)
        det = dict(self.lookahead.last_detail)
        det["scenecut"] = scenecut
        # per-frame overrides (qpfile / intra_refresh) are set by the caller
        # just before push; snapshot them so they apply to THIS frame when it
        # leaves the window, not to whichever frame encodes next
        force_idr = getattr(self, "_force_idr", False)
        self._force_idr = False
        self.la_queue.append((y, u, v, icost, pcost, scenecut, det,
                              self.display_idx, force_idr, self.rc.cfg.qp))
        self.display_idx += 1
        if len(self.la_queue) > self.la_depth:
            return [self._pop_la()]
        return []

    def flush_la(self) -> List["FrameResult"]:
        """Drain the lookahead window (end of stream)."""
        out = []
        while self.la_queue:
            out.append(self._pop_la())
        return out

    def _pop_la(self) -> "FrameResult":
        (y, u, v, icost, pcost, scenecut, det, didx,
         force_idr, qp_cfg) = self.la_queue.pop(0)
        window = [det] + [q[6] for q in self.la_queue]
        self.rc.cfg.qp = qp_cfg
        self.qp = qp_cfg
        if force_idr:
            self._force_idr = True
        return self.encode_frame(y, u, v,
                                 _la=(icost, pcost, scenecut, window, didx))

    def encode_frame(self, y, u, v, _la=None) -> FrameResult:
        yp0 = G.pad_plane(y, self.coded_h, self.coded_w)
        if _la is None:
            icost, pcost, scenecut = self.lookahead.push(yp0)
            didx = self.display_idx
            self.display_idx += 1
            self._cutree_window = None
        else:
            icost, pcost, scenecut, window, didx = _la
            self._cutree_window = window
        is_idr = (self.frame_idx % self.keyint == 0) or self.ref is None \
            or (self.scenecut_enabled and scenecut
                and self.frame_idx >= self.keyint_min) \
            or getattr(self, "_force_idr", False)
        self._force_idr = False
        la_cost = icost if is_idr else pcost
        self._tp_cuoff = None
        if self.two_pass is not None:
            qp = self.two_pass.frame_qp()
            off = self.two_pass.frame_cuoff()
            if off is not None and off.size == self.rows * self.cols:
                self._tp_cuoff = off.reshape(self.rows, self.cols)
        else:
            qp = self.rc.frame_qp(
                is_idr, lookahead_cost=la_cost,
                future_costs=[q[4] for q in self.la_queue])
        qp = self._zone_qp(didx, qp)
        if self.scenecut_aware_qp:
            if is_idr and (scenecut or self.frame_idx == 0):
                self._since_scenecut = 0
            else:
                self._since_scenecut += 1
            w3 = self.scenecut_window
            k = self._since_scenecut
            if k < w3 // 3:
                qp = min(qp + self.scenecut_qp_delta, 51)
            elif k < 2 * w3 // 3:
                qp = min(qp + (2 * self.scenecut_qp_delta) // 3, 51)
            elif k < w3:
                qp = min(qp + self.scenecut_qp_delta // 3, 51)
        if _la is None:
            self._cutree_update()
        yp = yp0
        up = G.pad_plane(u, self.coded_h // 2, self.coded_w // 2)
        vp = G.pad_plane(v, self.coded_h // 2, self.coded_w // 2)

        def encode_skip_frame(qp):
            """ALL-SKIP P slice: every CU is cu_skip with merge idx 0;
            with no spatial neighbors at (0,0) the first candidate is
            the zero-MV one, and every later CU inherits it, so the
            whole frame is a zero-motion copy of the reference (the
            reference's frame-duplication shape). No device work; no
            loop filtering occurs (BS 0 everywhere, SAO off in the
            slice header)."""
            n, nc = self.cu, self.cu // 2
            z = np.zeros((self.rows, self.cols, n, n), np.int32)
            zc = np.zeros((self.rows, self.cols, nc, nc), np.int32)
            out = {
                'use_intra': np.zeros((self.rows, self.cols), bool),
                'modes': np.zeros((self.rows, self.cols), np.int32),
                'mvx': np.zeros((self.rows, self.cols), np.int32),
                'mvy': np.zeros((self.rows, self.cols), np.int32),
                'ref': None, 'pdir': None,
                'levels_y': z, 'levels_cb': zc, 'levels_cr': zc,
                'recon_y': np.asarray(self.ref[0], np.int32),
                'recon_u': np.asarray(self.ref[1], np.int32),
                'recon_v': np.asarray(self.ref[2], np.int32),
            }
            nals = self._assemble_p_slice(out, qp)
            return out, nals

        def attempt(qp):
            """One full encode + serialize at the given frame QP. Re-run by
            the VBV guard below with a higher QP when the coded size would
            underflow the decoder buffer (the reference's row-level VBV
            re-encode, frameencoder.cpp:1655, as a frame-level retry —
            runtime QP costs no recompile)."""
            qp_map = self._frame_qp_map(yp0, qp)
            if is_idr:
                out = self.intra_sess.frame_encoder.encode_frame(
                    yp, up, vp,
                    qp=qp_map.reshape(-1) if qp_map is not None else qp,
                    slice_qp=qp)
                if qp_map is not None:
                    out["qp_map"] = qp_map
                sao_params = self._filter_frame(out, qp, True, yp, up, vp)
                nals = self.intra_sess._assemble_slice(out, qp=qp,
                                                       sao_params=sao_params)
            else:
                weights = self._decide_weights(yp, up, vp, self.ref)
                hx = hy = None
                if self.analysis_data is not None:
                    rec = self.analysis_data[min(self.analysis_idx,
                                                 len(self.analysis_data) - 1)]
                    ncu = self.rows * self.cols
                    hx = rec.get("mvx", np.zeros(ncu, np.int32)).reshape(-1)
                    hy = rec.get("mvy", np.zeros(ncu, np.int32)).reshape(-1)
                kw = {}
                n_active = 1
                if self.n_refs > 1:
                    r2 = self.ref2 if self.ref2 is not None else self.ref
                    kw = dict(ref1_y=r2[0], ref1_u=r2[1], ref1_v=r2[2])
                    n_active = 2 if self.ref2 is not None else 1
                with PROF("device_p"):
                    out = self.inter_encoder.encode_frame(
                        yp, up, vp, self.ref[0], self.ref[1], self.ref[2],
                        qp=qp_map.reshape(-1) if qp_map is not None else qp,
                        weights=weights, hint_mvx=hx, hint_mvy=hy,
                        slice_qp=qp, **kw)
                if qp_map is not None:
                    out["qp_map"] = qp_map
                if n_active == 1 and out.get("ref") is not None:
                    out["ref"] = np.zeros_like(out["ref"])
                sao_params = self._filter_frame(out, qp, False, yp, up, vp)
                with PROF("serialize"):
                    rps = None
                    if n_active == 2:
                        rps = ([(1, 1), (2, 1)], [])
                    self._last_ref_deltas = list(range(1, n_active + 1))
                    nals = self._assemble_p_slice(out, qp,
                                                  sao_params=sao_params,
                                                  weights=weights,
                                                  qp_map=qp_map, rps=rps,
                                                  n_refs=n_active)
            return out, nals

        if is_idr:
            self.poc = 0
            self.frame_idx = 0   # scenecut restarts the GOP
        else:
            self.poc += 1        # slice header reads self.poc in attempt()
        is_dup = False
        if (self.frame_dup and not is_idr
                and self._prev_src_y is not None):
            diff = np.abs(y.astype(np.int32)
                          - self._prev_src_y.astype(np.int32))
            mse = float(np.mean(diff.astype(np.float64) ** 2))
            psnr = 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
            is_dup = psnr >= self.dup_threshold
        self._prev_src_y = y
        if is_dup:
            out, nals = encode_skip_frame(qp)
        else:
            out, nals = attempt(qp)
        if self.hrd:
            from ..bitstream import sei as SEI
            cfgrc = self.rc.cfg
            msgs = []
            if is_idr:
                # initial CPB fullness -> 90 kHz removal delay
                init = (cfgrc.vbv_bufsize_kbps * cfgrc.vbv_init
                        / max(cfgrc.vbv_maxrate_kbps, 1))
                msgs.append(SEI.buffering_period(int(init * 90000)))
                self._au_count = 0
            msgs.append(SEI.pic_timing(
                max(self._au_count - 1, 0),
                self.intra_sess.sps.num_reorder_pics))
            self._au_count += 1
            nals = SEI.wrap_sei(msgs) + nals
        if self.sei_provider is not None:
            nals = self.sei_provider(didx) + nals
        import math as _math
        for _ in range(2):
            over = self.rc.vbv_overshoot(len(nals) * 8)
            if over <= 1.08 or qp >= 51:
                break
            qp = min(qp + max(1, int(round(6 * _math.log2(over)))), 51)
            out, nals = attempt(qp)
        if self.hash_sei:
            self._materialize_recon(out)
            nals += self.intra_sess._hash_sei(out)
        if self.analysis_save is not None or self.shared_analysis is not None:
            rec = {"t": "I" if is_idr else "P"}
            if not is_idr:
                rec["mvx"] = out["mvx"].astype(np.int32)
                rec["mvy"] = out["mvy"].astype(np.int32)
            if self.analysis_save is not None:
                import pickle
                pickle.dump(rec, self.analysis_save)
                self.analysis_save.flush()
            if self.shared_analysis is not None:
                self.shared_analysis.append(rec)
        self.analysis_idx += 1
        self.ref2 = None if is_idr else self.ref
        self.ref = self._recon_planes(out)
        if self.tmvp:
            # collocated motion field for the NEXT frame's TMVP (HEVC
            # stores col MVs on a 16x16 grid == this CU grid)
            if is_idr:
                self.col_field = {
                    "intra": np.ones((self.rows, self.cols), bool),
                    "mvx": np.zeros((self.rows, self.cols), np.int32),
                    "mvy": np.zeros((self.rows, self.cols), np.int32),
                    "ref": np.zeros((self.rows, self.cols), np.int32),
                    "ref_deltas": [1]}
            else:
                nref = out.get("ref")
                self.col_field = {
                    "intra": np.asarray(out["use_intra"], bool),
                    "mvx": np.asarray(out["mvx"], np.int32),
                    "mvy": np.asarray(out["mvy"], np.int32),
                    "ref": (np.zeros((self.rows, self.cols), np.int32)
                            if nref is None else np.asarray(nref, np.int32)),
                    "ref_deltas": self._last_ref_deltas}
        self.frame_idx += 1
        self.rc.frame_done(qp, len(nals) * 8,
                           slice_type="I" if is_idr else "P")
        if self.two_pass is not None:
            self.two_pass.frame_done(len(nals) * 8)
        if self.stats_writer is not None:
            co = None
            if self.cutree and self._cutree_window:
                from . import slicetype
                co = slicetype.pool_to_cu(
                    slicetype.cutree_propagate(self._cutree_window,
                                               strength=self.cutree_strength),
                    self.cu, self.rows, self.cols).reshape(-1).tolist()
            elif self.cutree:
                co = self._cutree_offsets().reshape(-1).tolist()
            self.stats_writer.add("I" if is_idr else "P", qp, len(nals) * 8,
                                  la_cost, cuoff=co)
        pk = (1 << getattr(self, "bit_depth", 8)) - 1
        pdt = np.uint16 if getattr(self, "bit_depth", 8) > 8 else np.uint8
        if self.recon_out or self.quality_metrics:
            self._materialize_recon(out)
        if out.get("recon_y") is None:
            return FrameResult(nals=nals, recon=None, bits=len(nals) * 8,
                               psnr_y=0.0,
                               frame_type="I" if is_idr else "P", qp=qp)
        mse = float(np.mean((out["recon_y"][:self.src_h, :self.src_w]
                             .astype(np.float64) - y) ** 2))
        psnr = 99.99 if mse == 0 else 10 * np.log10(pk * pk / mse)
        recon = (out["recon_y"][:self.src_h, :self.src_w].astype(pdt),
                 out["recon_u"][:self.src_h // 2, :self.src_w // 2].astype(pdt),
                 out["recon_v"][:self.src_h // 2, :self.src_w // 2].astype(pdt))
        return FrameResult(nals=nals, recon=recon, bits=len(nals) * 8,
                           psnr_y=psnr, frame_type="I" if is_idr else "P",
                           qp=qp)

    # ------------------------------------------------------------------
    # cuTree (reference slicetype.cpp cuTree/estimateCUPropagate): lowres
    # costs propagate along motion into the referenced frame's blocks;
    # heavily-referenced, well-predicted areas get a negative QP offset.
    # Causal variant: the propagation computed when frame t arrives (into
    # frame t-1's grid) feeds an EWMA applied to the NEXT encoded frame —
    # exploiting temporal coherence instead of a lookahead encode delay
    # (full delayed propagation is the r2 item).
    # ------------------------------------------------------------------

    def _cutree_update(self):
        d = getattr(self.lookahead, "last_detail", None)
        if d is None:
            return
        nbx, nby = d["nb_x"], d["nb_y"]
        if not d["has_prev"]:
            self.cutree_acc *= 0.5
            return
        icost = d["icost"].reshape(nby, nbx).astype(np.float64)
        sad = d["sad"].reshape(nby, nbx).astype(np.float64)
        frac = np.clip(1.0 - sad / np.maximum(icost, 1.0), 0.0, 1.0)
        amount = icost * frac
        mvx = d["mvx"].reshape(nby, nbx)
        mvy = d["mvy"].reshape(nby, nbx)
        # area-weighted scatter into the referenced (previous) frame's grid
        bx = np.arange(nbx) * 8
        by = np.arange(nby) * 8
        gx = (bx[None, :] + mvx) / 8.0
        gy = (by[:, None] + mvy) / 8.0
        x0 = np.floor(gx).astype(int)
        y0 = np.floor(gy).astype(int)
        fx = gx - x0
        fy = gy - y0
        acc = np.zeros_like(self.cutree_acc)
        for dx, dy, w in ((0, 0, (1 - fx) * (1 - fy)), (1, 0, fx * (1 - fy)),
                          (0, 1, (1 - fx) * fy), (1, 1, fx * fy)):
            np.add.at(acc, (np.clip(y0 + dy, 0, nby - 1),
                            np.clip(x0 + dx, 0, nbx - 1)), amount * w)
        self.cutree_acc = 0.5 * self.cutree_acc + acc
        self.cutree_icost = np.maximum(icost, 1.0)

    def _cutree_offsets(self) -> np.ndarray:
        """Per-CU integer QP offsets [rows, cols] from the accumulator."""
        ratio = (self.cutree_icost + self.cutree_acc) / self.cutree_icost
        off_blk = np.clip(-self.cutree_strength * np.log2(ratio), -6.0, 0.0)
        # lowres 8x8 block == fullres 16x16; pool to the CU grid
        s = self.cu // 16
        nby, nbx = off_blk.shape
        out = np.zeros((self.rows, self.cols))
        for r in range(self.rows):
            for c in range(self.cols):
                blk = off_blk[r * s:min((r + 1) * s, nby),
                              c * s:min((c + 1) * s, nbx)]
                if blk.size:
                    out[r, c] = blk.mean()
        return np.round(out).astype(np.int32)

    def _frame_qp_map(self, yp, qp):
        """Combined AQ + cuTree per-CU QP map, or None. In pass 2, cuTree
        offsets come from the pass-1 stat records instead of being
        recomputed (the reference's cuTreeReadFor2Pass)."""
        tp_off = getattr(self, "_tp_cuoff", None)
        ctu_info = getattr(self, "ctu_info_offsets", None)
        if not (self.aq_mode or self.cutree or tp_off is not None
                or ctu_info is not None
                or getattr(self, "_tp_delta_on", False)):
            return None
        off = np.zeros((self.rows, self.cols), np.int32)
        if ctu_info is not None:
            # externally supplied per-CTU offsets
            # (x265_encoder_ctu_info, x265.h:2168)
            off = off + ctu_info
        if self.aq_mode:
            from .ratecontrol import compute_aq_offsets
            off = off + compute_aq_offsets(yp, self.cu, self.aq_strength,
                                           mode=self.aq_mode,
                                           bit_depth=self.bit_depth)
        if tp_off is not None:
            off = off + tp_off
        elif self.cutree and self._cutree_window:
            # real backward propagation over the decided lookahead window
            from . import slicetype
            off_blk = slicetype.cutree_propagate(
                self._cutree_window, strength=self.cutree_strength)
            off = off + slicetype.pool_to_cu(off_blk, self.cu,
                                             self.rows, self.cols)
        elif self.cutree:
            off = off + self._cutree_offsets()
        return np.clip(qp + off, 0, 51).astype(np.int32)

    # ------------------------------------------------------------------
    def _decide_weights(self, yp, up, vp, ref):
        """Per-frame weighted-prediction analysis (reference weightAnalyse
        shape: scale guess from std ratio, offset from means, enabled only
        when it reduces subsampled SAD). Returns weights dict or None."""
        if not self.weightp:
            return None
        out = {}
        for comp, src, rp in (("luma", yp, ref[0]), ("cb", up, ref[1]),
                              ("cr", vp, ref[2])):
            s = src[::4, ::4].astype(np.float64)
            r = np.asarray(rp)[::4, ::4].astype(np.float64)
            sd_r = r.std()
            if sd_r < 0.5:
                continue
            w = int(round(64.0 * min(max(s.std() / sd_r, 0.1), 1.99)))
            w = min(max(w, 1), 127)
            o = int(round(s.mean() - w * r.mean() / 64.0))
            o = min(max(o, -128), 127)
            if (w, o) == (64, 0):
                continue
            wr = np.clip((r * w / 64.0) + o, 0, 255)
            if np.abs(s - wr).sum() < 0.99 * np.abs(s - r).sum():
                out[comp] = (w, o)
        return out or None

    # ------------------------------------------------------------------
    def _sao_frame(self, out: dict, yp, up, vp, qp=None):
        """SAO decision + decoder-exact application on the (deblocked)
        recon; returns per-CTU params for the slice syntax, or None."""
        if not self.sao:
            return None
        return self.intra_sess._sao_decide(out, yp, up, vp,
                                           qp=self.qp if qp is None else qp)

    # ------------------------------------------------------------------
    # device-resident DPB helpers (round 4)
    # ------------------------------------------------------------------
    def _finish_device_frame(self, out: dict):
        """dpb_device: the jitted program already ran deblock + SAO;
        fetch the (tiny) device SAO decisions directly into the native
        serializer's packed [ncu, 18] int32 layout (vectorized — the
        per-CTU dict build cost ~0.3 s/frame at 1080p)."""
        if not self.sao or out.get("sao_dev") is None:
            return None
        # ONE packed [ncu, 18] fetch: the program packs the 8 decision
        # grids in-jit (ops/filters_dev.pack_sao_params) because every
        # separate host fetch through the tunnel costs ~23 ms
        return np.asarray(out["sao_dev"])

    def _recon_planes(self, out: dict):
        """The DPB entry for this frame: device arrays under dpb_device,
        host planes otherwise."""
        if out.get("recon_dev") is not None:
            return out["recon_dev"]
        return (out["recon_y"], out["recon_u"], out["recon_v"])

    def _materialize_recon(self, out: dict):
        """Fetch device recon to host int32 planes (hash SEI / recon
        output / quality metrics)."""
        if out.get("recon_y") is None and out.get("recon_dev") is not None:
            ry, ru, rv = (np.asarray(p).astype(np.int32)
                          for p in out["recon_dev"])
            out["recon_y"], out["recon_u"], out["recon_v"] = ry, ru, rv

    def _filter_frame(self, out: dict, qp: int, is_idr: bool, yp, up, vp):
        """Loop filters + SAO for one frame: on-device (dpb_device) or the
        host path. Returns sao_params for the slice syntax."""
        if self.dpb_device:
            with PROF("sao.decide"):
                return self._finish_device_frame(out)
        with PROF("deblock"):
            self._deblock_frame(out, qp, is_idr=is_idr)
        with PROF("sao"):
            return self._sao_frame(out, yp, up, vp, qp=qp)

    # ------------------------------------------------------------------
    def _deblock_frame(self, out: dict, qp: int, is_idr: bool):
        """Apply the in-loop deblocking filter to the frame's recon (this is
        normative: the decoder does the same, and the filtered picture is the
        reference for subsequent frames)."""
        if not self.deblock:
            return
        qmap = effective_qp_map(out, out.get("qp_map"), qp)
        qarg = qmap if qmap is not None else qp
        if self.max_depth >= 2:
            src = out if not is_idr else {"split": out["split"],
                                          "split16": out["split16"],
                                          "levels_y": out["levels_y"]}
            maps = DB.expand_qt_maps8(src)
            bs_v, bs_h = DB.compute_bs_qt2(maps)
            dy, du, dv = DB.deblock_frame_qt2(
                out["recon_y"], out["recon_u"], out["recon_v"],
                qarg, chroma_qp_from_luma(qp), bs_v, bs_h,
                bit_depth=getattr(self, "bit_depth", 8))
        elif self.max_depth:
            maps = DB.expand_qt_maps(out) if not is_idr else \
                DB.expand_qt_maps({"split": out["split"],
                                   "levels_y": out["levels_y"]})
            bs_v, bs_h = DB.compute_bs_qt(maps)
            q16 = qarg if qmap is None else \
                np.repeat(np.repeat(qmap, 2, 0), 2, 1)
            dy, du, dv = DB.deblock_frame_inter(
                out["recon_y"], out["recon_u"], out["recon_v"], 16,
                q16, chroma_qp_from_luma(qp), bs_v, bs_h,
                bit_depth=getattr(self, "bit_depth", 8))
        elif is_idr:
            dy, du, dv = DB.deblock_frame_uniform(
                out["recon_y"], out["recon_u"], out["recon_v"], self.cu,
                qarg, chroma_qp_from_luma(qp))
        else:
            cbf = out["levels_y"].any(axis=(2, 3))
            pdir = out.get("pdir")
            mvx, mvy = out["mvx"], out["mvy"]
            mv1x = mv1y = None
            if pdir is not None:
                m0 = (pdir & 1).astype(bool)
                m1 = (pdir & 2).astype(bool)
                mvx = np.where(m0, mvx, 0)
                mvy = np.where(m0, mvy, 0)
                mv1x = np.where(m1, out["mv1x"], 0)
                mv1y = np.where(m1, out["mv1y"], 0)
            bs_v, bs_h = DB.compute_bs_uniform(
                out["use_intra"], cbf, pdir, mvx, mvy, mv1x, mv1y)
            dy, du, dv = DB.deblock_frame_inter(
                out["recon_y"], out["recon_u"], out["recon_v"], self.cu,
                qarg, chroma_qp_from_luma(qp), bs_v, bs_h)
        out["recon_y"], out["recon_u"], out["recon_v"] = (
            np.asarray(dy), np.asarray(du), np.asarray(dv))

    # ------------------------------------------------------------------
    # B-frame pipeline (bframes > 0): push display-order frames, receive
    # encode-order results in bursts per mini-GOP (anchor first, then its
    # leading B pictures). Reference structure: IDR/P anchors at mini-GOP
    # boundaries, non-reference B pictures between (no pyramid yet).
    # ------------------------------------------------------------------

    def push_frame(self, y, u, v) -> List["FrameResult"]:
        """Ingest one display-order frame. With rc_lookahead > 0 the frame
        first sits in the analysis window (lookahead costs computed at
        ingest); it reaches the mini-GOP machinery la_depth frames later
        with a snapshot of its decided future window for cuTree."""
        assert self.bframes, "push_frame requires push/flush (bframes > 0)"
        yp0 = G.pad_plane(y, self.coded_h, self.coded_w)
        with PROF("lookahead"):
            icost, pcost, scenecut = self.lookahead.push(yp0)
        det = dict(self.lookahead.last_detail)
        det["scenecut"] = scenecut
        # keep the lowres plane ON DEVICE: b-adapt's pair/bidir costs
        # consume it as jnp arrays, and the old np.asarray forced a
        # download + re-uploads per cost call over the tunnel
        cur_lowres = self.lookahead.prev_lowres
        # causal cuTree EWMA on B sessions: DISABLED pending a round-6 fix —
        # enabling it (self._cutree_update() here) produces time-varying
        # negative cuTree offsets whose streams fail libde265 conformance
        # on the device-DPB path (tests/test_dpb_device.py::
        # test_conformance_decode reproduces with the call restored);
        # rc-lookahead windows (backward propagation) are unaffected
        if self.la_depth > 0:
            self.la_queue.append((y, u, v, icost, pcost, scenecut, det,
                                  cur_lowres))
            if len(self.la_queue) > self.la_depth:
                return self._pop_la_b()
            return []
        return self._push_frame_now(y, u, v, icost, pcost, scenecut, det,
                                    cur_lowres)

    def _pop_la_b(self) -> List["FrameResult"]:
        (y, u, v, icost, pcost, scenecut, det, cur_lowres) = \
            self.la_queue.pop(0)
        window = [det] + [q[6] for q in self.la_queue]
        return self._push_frame_now(y, u, v, icost, pcost, scenecut, det,
                                    cur_lowres, window=window)

    def _push_frame_now(self, y, u, v, icost, pcost, scenecut, det,
                        cur_lowres, window=None) -> List["FrameResult"]:
        results: List[FrameResult] = []
        idr_due = (self.display_idx % self.keyint == 0) \
            or self.anchor is None \
            or (self.scenecut_enabled and scenecut
                and self.display_idx - self._last_idr_didx
                >= self.keyint_min)
        if idr_due:
            self._last_idr_didx = self.display_idx
            if self.open_gop and self.anchor is not None:
                results += self._encode_cra_gop(y, u, v)
            else:
                results += self._flush_minigop()
                self._cutree_window = window
                results.append(self._encode_anchor(y, u, v, idr=True))
            self.anchor_lowres = cur_lowres
        else:
            self.pending.append((y, u, v))
            self.pending_lowres.append(cur_lowres)
            self.pending_windows.append(window)
            if self.b_adapt >= 2:
                # full b-adapt (reference slicetypePath trellis,
                # slicetype.cpp:2378): once the window is full, score every
                # P placement k over the pending frames — cost(anchor->P at
                # distance k+1) plus the (p0, p1, b) bidir cost of each B in
                # between, normalized per frame — and close the mini-GOP at
                # the argmin. Remaining frames stay pending for the next
                # path decision.
                if (len(self.pending) == self.bframes + 1
                        and self.anchor_lowres is not None):
                    lows = self.pending_lowres
                    with PROF("b_adapt"):
                        # ONE fused device program for the whole trellis
                        # (replaces K + K(K-1)/2 pair/bidir dispatches)
                        costs = self.lookahead.badapt_path_costs(
                            self.anchor_lowres, lows)
                    best_k, best_cost = len(lows) - 1, None
                    for k in range(len(lows) - 1, -1, -1):
                        # strict <: ties keep the longest mini-GOP (B frames
                        # are cheaper at equal predicted cost)
                        if best_cost is None or costs[k] < best_cost:
                            best_k, best_cost = k, costs[k]
                    results += self._flush_minigop(best_k + 1)
                elif len(self.pending) == self.bframes + 1:
                    results += self._flush_minigop()
            else:
                # fast b-adapt: close the mini-GOP early when this frame
                # predicts poorly — distance-1 cost vs intra, then a
                # distance-aware check against the mini-GOP anchor.
                poorly_predicted = (self.b_adapt
                                    and pcost > 0.45 * max(icost, 1))
                if (self.b_adapt and not poorly_predicted
                        and self.anchor_lowres is not None
                        and len(self.pending) > 1):
                    far = self.lookahead.pair_cost(self.anchor_lowres,
                                                   cur_lowres)
                    poorly_predicted = far > 0.65 * max(icost, 1)
                if len(self.pending) == self.bframes + 1 or poorly_predicted:
                    results += self._flush_minigop()
        self.display_idx += 1
        return results

    def flush(self, count: int = None) -> List["FrameResult"]:
        """End-of-stream drain: empty the lookahead window (each frame runs
        through the mini-GOP machinery with its remaining future window),
        then close the open mini-GOP. flush(count) keeps the historical
        mini-GOP-close behavior for direct callers."""
        if count is not None:
            return self._flush_minigop(count)
        out: List[FrameResult] = []
        while self.la_queue:
            out += self._pop_la_b()
        out += self._flush_minigop()
        return out

    def _flush_minigop(self, count: int = None) -> List["FrameResult"]:
        """Close the open mini-GOP: last pending frame (or pending[count-1]
        when count is given) becomes the P anchor, earlier pending frames
        encode as B against (prev anchor, new anchor). With b_pyramid and
        >= 2 B positions, the middle frame becomes a REFERENCED B (TRAIL_R)
        and the outer Bs predict from it."""
        if not self.pending:
            return []
        if count is None or count >= len(self.pending):
            count = len(self.pending)
        frames = self.pending[:count]
        self.pending = self.pending[count:]
        windows = self.pending_windows[:count]
        self.pending_windows = self.pending_windows[count:]
        if len(windows) < len(frames):
            windows = windows + [None] * (len(frames) - len(windows))
        if self.pending_lowres:
            self.anchor_lowres = self.pending_lowres[count - 1]
            self.pending_lowres = self.pending_lowres[count:]
        prev_anchor, prev_poc = self.anchor
        out: List[FrameResult] = []
        anchor_poc = prev_poc + len(frames)
        y, u, v = frames[-1]
        self._cutree_window = windows[-1]
        # queue pipelining (frameencoder.cpp:429 frame-threads analog):
        # under the device DPB the anchor's filtered recon is a device
        # array available at dispatch, so the whole mini-GOP — anchor, Bref
        # and the leaf Bs — is submitted back-to-back and the decision
        # buffers are fetched afterwards in output order; the tunnel
        # overlaps each fetch with the next frame's device compute.
        pipe = self._can_pipeline_b() and not self.frame_dup
        ast = None
        if pipe:
            ast = self._encode_anchor_submit(y, u, v, anchor_poc,
                                             anchor_poc - prev_poc)
            new_anchor = ast["recon_dev"]
        else:
            out.append(self._encode_anchor(y, u, v, idr=False,
                                           poc=anchor_poc,
                                           ref_delta=anchor_poc - prev_poc))
            new_anchor = self.anchor[0]
        nb = len(frames) - 1
        bst = None
        pending_subs = []
        if self.b_pyramid and nb >= 2:
            m = nb // 2
            bref_poc = prev_poc + 1 + m
            y, u, v = frames[m]
            self._cutree_window = windows[m]
            # Bref retains both anchors; nothing else is in the DPB yet
            if pipe:
                bst = self._encode_b_submit(
                    y, u, v, bref_poc, prev_anchor, prev_poc, new_anchor,
                    anchor_poc, is_ref=True)
                bref = bst["handle"][1][1:4]
            else:
                fr, bref = self._encode_b(
                    y, u, v, bref_poc, prev_anchor, prev_poc, new_anchor,
                    anchor_poc, is_ref=True)
                out.append(fr)
            for i, (y, u, v) in enumerate(frames[:-1]):
                if i == m:
                    continue
                poc = prev_poc + 1 + i
                self._cutree_window = windows[i]
                if i < m:
                    # refs (prev anchor, Bref); later Bs still need the next
                    # anchor -> keep it in the RPS, unused by this picture
                    rps = ([(poc - prev_poc, 1)],
                           [(bref_poc - poc, 1), (anchor_poc - poc, 0)])
                    sub = (y, u, v, poc, prev_anchor, prev_poc, bref,
                           bref_poc, False, rps, None)
                else:
                    rps = ([(poc - bref_poc, 1)], [(anchor_poc - poc, 1)])
                    sub = (y, u, v, poc, bref, bref_poc, new_anchor,
                           anchor_poc, False, rps, None)
                if pipe:
                    pending_subs.append(self._encode_b_submit(*sub))
                else:
                    fr, _ = self._encode_b(*sub)
                    out.append(fr)
        else:
            for i, (y, u, v) in enumerate(frames[:-1]):
                poc = prev_poc + 1 + i
                self._cutree_window = windows[i]
                sub = (y, u, v, poc, prev_anchor, prev_poc, new_anchor,
                       anchor_poc)
                if pipe:
                    pending_subs.append(self._encode_b_submit(*sub))
                else:
                    fr, _ = self._encode_b(*sub)
                    out.append(fr)
        if pipe:
            out.append(self._encode_anchor_finish(ast))
            if bst is not None:
                fr, _ = self._encode_b_finish(bst)
                out.append(fr)
            for st in pending_subs:
                fr, _ = self._encode_b_finish(st)
                out.append(fr)
        return out

    def _pad(self, y, u, v):
        return (G.pad_plane(y, self.coded_h, self.coded_w),
                G.pad_plane(u, self.coded_h // 2, self.coded_w // 2),
                G.pad_plane(v, self.coded_h // 2, self.coded_w // 2))

    def _result(self, out, nals, qp, poc, src_y=None,
                frame_type: str = "") -> "FrameResult":
        pdt = np.uint16 if getattr(self, "bit_depth", 8) > 8 else np.uint8
        if self.recon_out or self.quality_metrics:
            self._materialize_recon(out)
        if out.get("recon_y") is None:
            return FrameResult(nals=nals, recon=None, bits=len(nals) * 8,
                               psnr_y=0.0, poc=poc, frame_type=frame_type,
                               qp=qp)
        recon = tuple(
            out[k][:h, :w].astype(pdt)
            for k, h, w in (("recon_y", self.src_h, self.src_w),
                            ("recon_u", self.src_h // 2, self.src_w // 2),
                            ("recon_v", self.src_h // 2, self.src_w // 2)))
        psnr = pu = pv = ssim = 0.0
        if src_y is not None:
            src_uv = getattr(self, "_cur_src_uv", None)
            if src_uv is not None and self.quality_metrics:
                with PROF("quality_stats"):
                    psnr, pu, pv, ssim = frame_quality(
                        recon, src_y, src_uv[0], src_uv[1],
                        getattr(self, "bit_depth", 8))
            else:
                pk = (1 << getattr(self, "bit_depth", 8)) - 1
                mse = float(np.mean((recon[0].astype(np.float64) - src_y) ** 2))
                psnr = 99.99 if mse == 0 else 10 * np.log10(pk * pk / mse)
        return FrameResult(nals=nals, recon=recon, bits=len(nals) * 8,
                           psnr_y=psnr, poc=poc, frame_type=frame_type,
                           qp=qp, psnr_u=pu, psnr_v=pv, ssim_y=ssim)

    def _encode_anchor(self, y, u, v, idr: bool, poc: int = 0,
                       ref_delta: int = 1) -> "FrameResult":
        if not idr:
            return self._encode_anchor_finish(self._encode_anchor_submit(
                y, u, v, poc, ref_delta))
        return self._encode_idr_anchor(y, u, v, poc, ref_delta)

    def _encode_anchor_submit(self, y, u, v, poc: int, ref_delta: int):
        """P-anchor phase 1: QP/AQ + async device dispatch. Under the
        device DPB the anchor's filtered recon is available to dependent
        B submissions straight from the dispatch handle — no fetch."""
        yp, up, vp = self._pad(y, u, v)
        qp = self.rc.frame_qp(False)
        qp = self._zone_qp(self.gop_display_base + poc, qp)
        with PROF("qp_map"):
            qp_map = self._frame_qp_map(yp, qp)
        weights = self._decide_weights(yp, up, vp, self.anchor[0])
        with PROF("device_p"):
            handle = self.inter_encoder.submit_frame(
                yp, up, vp, self.anchor[0][0], self.anchor[0][1],
                self.anchor[0][2],
                qp=qp_map.reshape(-1) if qp_map is not None else qp,
                weights=weights, slice_qp=qp)
        recon_dev = handle[1][1:4] if self.dpb_device else None
        return dict(handle=handle, yp=yp, up=up, vp=vp, qp=qp,
                    qp_map=qp_map, poc=poc, ref_delta=ref_delta,
                    weights=weights, recon_dev=recon_dev, y=y, u=u, v=v)

    def _encode_anchor_finish(self, st) -> "FrameResult":
        qp, poc = st["qp"], st["poc"]
        yp, up, vp = st["yp"], st["up"], st["vp"]
        with PROF("device_p"):
            out = self.inter_encoder.finish_frame(st["handle"])
        if st["qp_map"] is not None:
            out["qp_map"] = st["qp_map"]
        sao_params = self._filter_frame(out, qp, False, yp, up, vp)
        with PROF("serialize"):
            nals = self._assemble_p_slice(out, qp, poc=poc,
                                          ref_delta=st["ref_delta"],
                                          sao_params=sao_params,
                                          weights=st["weights"],
                                          qp_map=st["qp_map"])
        if self.sei_provider is not None:
            nals = self.sei_provider(self.gop_display_base + poc) + nals
        if self.hash_sei:
            self._materialize_recon(out)
            nals += self.intra_sess._hash_sei(out)
        self.anchor = (self._recon_planes(out), poc)
        self.rc.frame_done(qp, len(nals) * 8, slice_type="P")
        self._cur_src_uv = (st["u"], st["v"])
        return self._result(out, nals, qp, poc, src_y=st["y"],
                            frame_type="P")

    def _encode_idr_anchor(self, y, u, v, poc: int = 0,
                           ref_delta: int = 1) -> "FrameResult":
        yp, up, vp = self._pad(y, u, v)
        qp = self.rc.frame_qp(True)
        self.gop_display_base = self.display_idx
        qp = self._zone_qp(self.display_idx, qp)
        # per-CU QP (AQ/cuTree): the PPS signals cu_qp_delta for the whole
        # session, so EVERY slice must carry the delta syntax
        with PROF("qp_map"):
            qp_map = self._frame_qp_map(yp, qp)
        with PROF("device_intra"):
            out = self.intra_sess.frame_encoder.encode_frame(
                yp, up, vp,
                qp=qp_map.reshape(-1) if qp_map is not None else qp,
                slice_qp=qp)
        if qp_map is not None:
            out["qp_map"] = qp_map
        sao_params = self._filter_frame(out, qp, True, yp, up, vp)
        with PROF("serialize"):
            nals = self.intra_sess._assemble_slice(out, qp=qp,
                                                   sao_params=sao_params)
        poc = 0
        if self.sei_provider is not None:
            nals = self.sei_provider(self.gop_display_base + poc) + nals
        if self.hash_sei:
            self._materialize_recon(out)
            nals += self.intra_sess._hash_sei(out)
        self.anchor = (self._recon_planes(out), poc)
        self.rc.frame_done(qp, len(nals) * 8, slice_type="I")
        self._cur_src_uv = (u, v)
        return self._result(out, nals, qp, poc, src_y=y, frame_type="I")

    def _encode_cra_gop(self, y, u, v) -> List["FrameResult"]:
        """Open-GOP keyframe: code this frame as a CRA (POC continues),
        then the pending display-order frames as RASL leading pictures
        referencing (previous anchor, CRA) — decodable in sequence, dropped
        on random access at the CRA (reference bOpenGOP behavior)."""
        prev_anchor, prev_poc = self.anchor
        pending = self.pending
        pending_lowres = self.pending_lowres
        pending_windows = self.pending_windows
        self.pending, self.pending_lowres, self.pending_windows = [], [], []
        cra_poc = prev_poc + len(pending) + 1

        yp, up, vp = self._pad(y, u, v)
        qp = self.rc.frame_qp(True)
        qp = self._zone_qp(self.display_idx, qp)
        qp_map = self._frame_qp_map(yp, qp)
        out = self.intra_sess.frame_encoder.encode_frame(
            yp, up, vp, qp=qp_map.reshape(-1) if qp_map is not None else qp,
            slice_qp=qp)
        if qp_map is not None:
            out["qp_map"] = qp_map
        sao_params = self._filter_frame(out, qp, True, yp, up, vp)
        from ..bitstream.bitio import NAL_CRA
        nals = self.intra_sess._assemble_slice(out, qp=qp,
                                               sao_params=sao_params,
                                               nal_type=NAL_CRA, poc=cra_poc)
        if self.sei_provider is not None:
            nals = self.sei_provider(self.display_idx) + nals
        if self.hash_sei:
            self._materialize_recon(out)
            nals += self.intra_sess._hash_sei(out)
        cra_recon = self._recon_planes(out)
        self.rc.frame_done(qp, len(nals) * 8)
        self._cur_src_uv = (u, v)
        results = [self._result(out, nals, qp, cra_poc, src_y=y,
                                frame_type="I")]
        self.gop_display_base = self.display_idx - cra_poc
        # leading pictures (decode after the CRA, display before)
        from ..bitstream.bitio import NAL_RASL_N
        for i, (by, bu, bv) in enumerate(pending):
            poc = prev_poc + 1 + i
            self._cutree_window = (pending_windows[i]
                                   if i < len(pending_windows) else None)
            fr, _ = self._encode_b(by, bu, bv, poc, prev_anchor, prev_poc,
                                   cra_recon, cra_poc, nal_type=NAL_RASL_N)
            results.append(fr)
        self.anchor = (cra_recon, cra_poc)
        self.anchor_lowres = pending_lowres[-1] if pending_lowres else None
        return results

    def _encode_b(self, y, u, v, poc, ref0, poc0, ref1, poc1,
                  is_ref: bool = False, rps=None, nal_type=None):
        """Returns (FrameResult, padded recon planes). is_ref: referenced B
        (B-pyramid middle) — coded TRAIL_R with a smaller QP offset."""
        return self._encode_b_finish(self._encode_b_submit(
            y, u, v, poc, ref0, poc0, ref1, poc1, is_ref, rps, nal_type))

    def _encode_b_submit(self, y, u, v, poc, ref0, poc0, ref1, poc1,
                         is_ref: bool = False, rps=None, nal_type=None):
        """Phase 1: per-frame QP/AQ decisions + async device dispatch.
        Mutually-independent B pictures of a mini-GOP are submitted
        back-to-back so the device computes frame k+1 while frame k's
        decision buffer crosses the tunnel (frameencoder.cpp:429
        frame-threads overlap as queue pipelining). Safe for CRF/CQP
        without VBV: the B-frame QP does not read the in-flight frames'
        rc feedback on those paths."""
        yp, up, vp = self._pad(y, u, v)
        boff_ref, boff = getattr(self, "_b_qp_offsets", (1, 2))
        qp = min(self.rc.frame_qp(False) + (boff_ref if is_ref else boff), 51)
        qp = self._zone_qp(self.gop_display_base + poc, qp)
        # per-CU QP (AQ/cuTree) on B frames; the qt writers carry the
        # delta syntax per CTU
        with PROF("qp_map"):
            qp_map = self._frame_qp_map(yp, qp)
        with PROF("device_b"):
            handle = self.bi_encoder.submit_frame(
                yp, up, vp, ref0[0], ref0[1], ref0[2],
                qp=qp_map.reshape(-1) if qp_map is not None else qp,
                ref1_y=ref1[0], ref1_u=ref1[1], ref1_v=ref1[2],
                slice_qp=qp)
        return dict(handle=handle, yp=yp, up=up, vp=vp, qp=qp,
                    qp_map=qp_map, poc=poc, poc0=poc0, poc1=poc1,
                    is_ref=is_ref, rps=rps, nal_type=nal_type,
                    y=y, u=u, v=v)

    def _encode_b_finish(self, st):
        """Phase 2: fetch decisions, filter, serialize, rc feedback."""
        qp, poc = st["qp"], st["poc"]
        with PROF("device_b"):
            out = self.bi_encoder.finish_frame(st["handle"])
        if st["qp_map"] is not None:
            out["qp_map"] = st["qp_map"]
        sao_params = self._filter_frame(out, qp, False,
                                        st["yp"], st["up"], st["vp"])
        with PROF("serialize"):
            nals = self._assemble_b_slice(out, qp, poc, st["poc0"],
                                          st["poc1"],
                                          sao_params=sao_params,
                                          is_ref=st["is_ref"],
                                          rps=st["rps"],
                                          nal_type=st["nal_type"])
        if self.sei_provider is not None:
            nals = self.sei_provider(self.gop_display_base + poc) + nals
        if self.hash_sei:
            self._materialize_recon(out)
            nals += self.intra_sess._hash_sei(out)
        self.rc.frame_done(qp, len(nals) * 8, slice_type="B")
        recon = self._recon_planes(out)
        self._cur_src_uv = (st["u"], st["v"])
        return self._result(out, nals, qp, poc, src_y=st["y"],
                            frame_type="B" if st["is_ref"] else "b"), recon

    def _can_pipeline_b(self) -> bool:
        """Mini-GOP queue pipelining: frames in flight compute their QP
        from the at-submit rc state instead of waiting for the previous
        frame's coded bits — exactly the reference's frame-threads rc
        semantics (threading.rst:176-190: outputs vary with frame-thread
        count only under ABR/VBV). So: CQP is bit-identical, CRF takes
        the same rc lag the reference accepts, ABR/VBV stay sequential.
        Needs the device-resident DPB (recon handoff without a fetch).
        Restricted to CQP: under CRF the B QP reads short-term rc state
        that the sequential path updates between frames, so the pipelined
        dpb session would diverge from the host path (caught by
        test_dpb_device aq/cutree stream-equality)."""
        if not getattr(self, "dpb_device", False):
            return False
        if self.two_pass is not None:
            return False
        cfg = getattr(self.rc, "cfg", None)
        if cfg is None:
            return False
        if getattr(cfg, "vbv_maxrate", 0) or getattr(cfg, "vbv_bufsize", 0):
            return False
        return cfg.mode == "cqp"

    def _wpp_substreams(self, init_type: int, qp: int, code_ctu):
        """Per-CTU-row CABAC substreams with spec 9.3.1 entropy sync
        (context load from CTU 2 of the row above) — the WPP bitstream
        form for P/B slices (round 3; the reference emits these from
        frameencoder.cpp:1035-1062). code_ctu(enc, r, c) codes one CTU.
        Returns (blobs, entry_point_offsets)."""
        sync_c = 1 if self.cols > 1 else None
        last_r = self.rows - 1
        blobs = []
        saved = None
        for r in range(self.rows):
            enc = CabacEncoder()
            if r == 0 or saved is None:
                enc.init_contexts(init_type, qp)
            else:
                enc.ctx = saved.copy()
            for c in range(self.cols):
                code_ctu(enc, r, c)
                if c == sync_c:
                    saved = enc.ctx.copy()
                is_last = (r == last_r and c == self.cols - 1)
                enc.encode_bin_trm(1 if is_last else 0)
            if r < last_r:
                enc.encode_bin_trm(1)            # end_of_subset_one_bit
            data, tail, tail_bits = enc.finish()
            sub = BitWriter()
            for b in data:
                sub.write_byte(b)
            sub.write_bits(tail, tail_bits)
            sub.write_bits(1, 1)                 # stop bit
            sub.write_align_zero()               # byte_alignment()
            blobs.append(sub.get_bytes())
        return blobs, [len(b) for b in blobs[:-1]]

    def _assemble_p_slice_wpp(self, out: dict, qp: int, poc=None,
                              ref_delta: int = 1, sao_params=None,
                              rps=None, n_refs: int = 1) -> bytes:
        """P slice with WPP substreams (uniform grid; no per-CU QP —
        qPY_PREV would reset per CTU row, spec 8.6.1)."""
        from ..bitstream import inter_syntax as IS
        from ..bitstream.bitio import NAL_TRAIL_R
        sess = self.intra_sess
        log2cu = self.cu.bit_length() - 1
        grid = [[None] * self.cols for _ in range(self.rows)]

        def code_ctu(enc, r, c):
            if sao_params is not None:
                CS.encode_sao_ctu(
                    enc, sao_params[r][c],
                    sao_params[r][c - 1] if c > 0 else None,
                    sao_params[r - 1][c] if r > 0 else None,
                    True, True, sess.bit_depth)
            d = self._decide_cu(out, grid, r, c, n_refs=n_refs,
                                col=self.col_field if self.tmvp else None)
            IS.encode_inter_ctu(enc, d, grid, r, c, log2cu,
                                self.max_merge, sign_hiding=self.sbh,
                                n_refs=n_refs)

        blobs, offsets = self._wpp_substreams(1, qp, code_ctu)
        bw = HDR.write_slice_header(sess.sps, sess.pps, slice_type=1,
                                    slice_qp=qp, nal_type=NAL_TRAIL_R,
                                    poc=self.poc if poc is None else poc,
                                    ref_poc_delta=ref_delta,
                                    max_merge=self.max_merge,
                                    sao_luma=1 if sao_params is not None else 0,
                                    sao_chroma=1 if sao_params is not None else 0,
                                    rps=rps, num_ref_l0=n_refs,
                                    entry_point_offsets=offsets)
        for blob in blobs:
            for b in blob:
                bw.write_byte(b)
        return wrap_nal(NAL_TRAIL_R, bw.get_bytes())

    def _assemble_b_slice_wpp(self, out: dict, qp: int, poc: int, poc0: int,
                              poc1: int, sao_params=None,
                              is_ref: bool = False, rps=None,
                              nal_type=None) -> bytes:
        """B slice with WPP substreams (uniform grid, no per-CU QP)."""
        from ..bitstream import inter_syntax as IS
        from ..bitstream.bitio import NAL_TRAIL_N, NAL_TRAIL_R
        sess = self.intra_sess
        log2cu = self.cu.bit_length() - 1
        if nal_type is None:
            nal_type = NAL_TRAIL_R if is_ref else NAL_TRAIL_N
        grid = [[None] * self.cols for _ in range(self.rows)]

        def code_ctu(enc, r, c):
            if sao_params is not None:
                CS.encode_sao_ctu(
                    enc, sao_params[r][c],
                    sao_params[r][c - 1] if c > 0 else None,
                    sao_params[r - 1][c] if r > 0 else None,
                    True, True, sess.bit_depth)
            d = self._decide_cu_b(out, grid, r, c, poc, poc0, poc1)
            IS.encode_b_ctu(enc, d, grid, r, c, log2cu,
                            self.max_merge, sign_hiding=self.sbh)

        blobs, offsets = self._wpp_substreams(0, qp, code_ctu)
        bw = HDR.write_slice_header(sess.sps, sess.pps, slice_type=0,
                                    slice_qp=qp, nal_type=nal_type,
                                    poc=poc, max_merge=self.max_merge,
                                    ref_poc_delta=poc - poc0,
                                    pos_poc_delta=poc1 - poc,
                                    rps=rps,
                                    sao_luma=1 if sao_params is not None else 0,
                                    sao_chroma=1 if sao_params is not None else 0,
                                    entry_point_offsets=offsets)
        for blob in blobs:
            for b in blob:
                bw.write_byte(b)
        return wrap_nal(nal_type, bw.get_bytes())

    def _assemble_b_slice(self, out: dict, qp: int, poc: int, poc0: int,
                          poc1: int, sao_params=None, is_ref: bool = False,
                          rps=None, nal_type=None) -> bytes:
        from ..bitstream import inter_syntax as IS
        from ..bitstream.bitio import NAL_TRAIL_N, NAL_TRAIL_R
        if self.max_depth:
            return self._assemble_b_slice_qt(out, qp, poc, poc0, poc1,
                                             sao_params, is_ref, rps,
                                             nal_type=nal_type)
        if self.wpp:
            return self._assemble_b_slice_wpp(out, qp, poc, poc0, poc1,
                                              sao_params, is_ref, rps,
                                              nal_type)
        sess = self.intra_sess
        log2cu = self.cu.bit_length() - 1
        if nal_type is None:
            nal_type = NAL_TRAIL_R if is_ref else NAL_TRAIL_N
        bw = HDR.write_slice_header(sess.sps, sess.pps, slice_type=0,
                                    slice_qp=qp, nal_type=nal_type,
                                    poc=poc, max_merge=self.max_merge,
                                    ref_poc_delta=poc - poc0,
                                    pos_poc_delta=poc1 - poc,
                                    rps=rps,
                                    sao_luma=1 if sao_params is not None else 0,
                                    sao_chroma=1 if sao_params is not None else 0)
        qp_map = out.get("qp_map")
        pd = out["pdir"]
        m0 = (pd & 1).astype(bool)
        m1 = (pd & 2).astype(bool)
        res = native.encode_b_slice(
            out["use_intra"], out["modes"], pd,
            np.where(m0, out["mvx"], 0), np.where(m0, out["mvy"], 0),
            np.where(m1, out["mv1x"], 0), np.where(m1, out["mv1y"], 0),
            out["levels_y"], out["levels_cb"], out["levels_cr"],
            log2cu, qp, self.max_merge, poc, poc0, poc1,
            sign_hiding=self.sbh, sao=sao_params, qp_map=qp_map,
            bit_depth=self.bit_depth)
        if res is not None:       # production path: C++ CABAC runtime
            data, tail, tail_bits = res
        else:                     # Python reference fallback
            enc = CabacEncoder()
            enc.init_contexts(0, qp)        # B-slice context init row
            grid = [[None] * self.cols for _ in range(self.rows)]
            last = self.rows * self.cols - 1
            qp_prev = qp                    # decoder's qPY_PREV chain
            for r in range(self.rows):
                for c in range(self.cols):
                    if sao_params is not None:
                        CS.encode_sao_ctu(
                            enc, sao_params[r][c],
                            sao_params[r][c - 1] if c > 0 else None,
                            sao_params[r - 1][c] if r > 0 else None,
                            True, True, sess.bit_depth)
                    d = self._decide_cu_b(out, grid, r, c, poc, poc0, poc1)
                    delta = None
                    if qp_map is not None and d.has_residual:
                        delta = int(qp_map[r, c]) - qp_prev
                        qp_prev = int(qp_map[r, c])
                    IS.encode_b_ctu(enc, d, grid, r, c, log2cu,
                                    self.max_merge, sign_hiding=self.sbh,
                                    cu_qp_delta=delta)
                    enc.encode_bin_trm(1 if r * self.cols + c == last else 0)
            data, tail, tail_bits = enc.finish()
        for b in data:
            bw.write_byte(b)
        bw.write_bits(tail, tail_bits)
        bw.rbsp_trailing_bits()
        return wrap_nal(nal_type, bw.get_bytes())

    def _assemble_b_slice_qt(self, out: dict, qp: int, poc: int, poc0: int,
                             poc1: int, sao_params=None, is_ref: bool = False,
                             rps=None, nal_type=None) -> bytes:
        """Quadtree B slice (depth 1 or 2): coding_quadtree per CTU with
        position-based B merge/AMVP (POC-scaled) derivation."""
        from ..bitstream import inter_syntax as IS
        from ..bitstream.bitio import NAL_TRAIL_N, NAL_TRAIL_R
        from ..bitstream.tables import CTX_OFFSET as CTX
        from .qt_common import QOFF
        sess = self.intra_sess
        if nal_type is None:
            nal_type = NAL_TRAIL_R if is_ref else NAL_TRAIL_N
        bw = HDR.write_slice_header(sess.sps, sess.pps, slice_type=0,
                                    slice_qp=qp, nal_type=nal_type,
                                    poc=poc, max_merge=self.max_merge,
                                    ref_poc_delta=poc - poc0,
                                    pos_poc_delta=poc1 - poc,
                                    rps=rps,
                                    sao_luma=1 if sao_params is not None else 0,
                                    sao_chroma=1 if sao_params is not None else 0)
        res = native.encode_slice_qt2(0, self.max_depth, out, qp,
                                      self.max_merge,
                                      sign_hiding=self.sbh,
                                      poc=poc, poc_l0=poc0, poc_l1=poc1,
                                      sao=sao_params,
                                      qp_map=out.get("qp_map"),
                                      bit_depth=self.bit_depth,
                                      max_tt=1 if self.rqt else 0)
        if res is not None:
            data, tail, tail_bits = res
            for b in data:
                bw.write_byte(b)
            bw.write_bits(tail, tail_bits)
            bw.rbsp_trailing_bits()
            return wrap_nal(nal_type, bw.get_bytes())
        if isinstance(sao_params, np.ndarray):
            sao_params = native.unpack_sao(sao_params, self.rows, self.cols)
        enc = CabacEncoder()
        enc.init_contexts(0, qp)
        md = self.max_depth
        g = 1 << md
        cell_px = 32 // g
        min_log2 = 5 - md
        gr, gc = g * self.rows, g * self.cols
        cells = [[None] * gc for _ in range(gr)]
        depth = np.zeros((gr, gc), np.int32)
        last = self.rows * self.cols - 1

        def split_flag(cy, cx, d, sp):
            ctx = ((1 if cx > 0 and depth[cy, cx - 1] > d else 0)
                   + (1 if cy > 0 and depth[cy - 1, cx] > d else 0))
            enc.encode_bin(1 if sp else 0, CTX["split_cu"] + ctx)

        for r in range(self.rows):
            for c in range(self.cols):
                if sao_params is not None:
                    CS.encode_sao_ctu(
                        enc, sao_params[r][c],
                        sao_params[r][c - 1] if c > 0 else None,
                        sao_params[r - 1][c] if r > 0 else None,
                        True, True, sess.bit_depth)
                gy, gx = g * r, g * c

                def code(cy, cx, sc, is_intra, mode, pdir, mv0, mv1, dep):
                    px = sc * cell_px
                    oy, ox = (cy - gy) * cell_px, (cx - gx) * cell_px
                    d = self._decide_cu_b_pos(
                        IS, cells, cy, cx, sc, is_intra, mode, pdir, mv0,
                        mv1,
                        out["levels_y"][r, c][oy:oy + px, ox:ox + px],
                        out["levels_cb"][r, c][oy // 2:(oy + px) // 2,
                                               ox // 2:(ox + px) // 2],
                        out["levels_cr"][r, c][oy // 2:(oy + px) // 2,
                                               ox // 2:(ox + px) // 2],
                        poc, poc0, poc1)
                    ts = (sc == g and self.rqt
                          and bool(out["tu_split32"][r, c]))
                    IS.encode_b_cu_qt(enc, d, cells, cy, cx, sc,
                                      self.max_merge, sign_hiding=self.sbh,
                                      cell_px=cell_px, min_log2=min_log2,
                                      tu_split=ts,
                                      max_tt=1 if self.rqt else 0)
                    depth[cy:cy + sc, cx:cx + sc] = dep

                sp0 = bool(out["split"][r, c])
                split_flag(gy, gx, 0, sp0)
                if not sp0:
                    code(gy, gx, g, bool(out["use_intra"][r, c]),
                         int(out["modes"][r, c]), int(out["pdir"][r, c]),
                         (int(out["mvx"][r, c]), int(out["mvy"][r, c])),
                         (int(out["mv1x"][r, c]), int(out["mv1y"][r, c])),
                         0)
                else:
                    half = g // 2
                    for q, (qy, qx) in enumerate(QOFF):
                        cy, cx = gy + qy * half, gx + qx * half
                        sub = md >= 2 and bool(out["split16"][r, c, q])
                        if md >= 2:
                            split_flag(cy, cx, 1, sub)
                        if not sub:
                            code(cy, cx, half,
                                 bool(out["use_intra4"][r, c, q]),
                                 int(out["modes4"][r, c, q]),
                                 int(out["pdir4"][r, c, q]),
                                 (int(out["mv4x"][r, c, q]),
                                  int(out["mv4y"][r, c, q])),
                                 (int(out["mv41x"][r, c, q]),
                                  int(out["mv41y"][r, c, q])), 1)
                        else:
                            for sq, (sy_, sx_) in enumerate(QOFF):
                                code(cy + sy_, cx + sx_, 1,
                                     bool(out["use_intra8"][r, c, q, sq]),
                                     int(out["modes8"][r, c, q, sq]),
                                     int(out["pdir8"][r, c, q, sq]),
                                     (int(out["mv8x"][r, c, q, sq]),
                                      int(out["mv8y"][r, c, q, sq])),
                                     (int(out["mv81x"][r, c, q, sq]),
                                      int(out["mv81y"][r, c, q, sq])), 2)
                enc.encode_bin_trm(1 if r * self.cols + c == last else 0)
        data, tail, tail_bits = enc.finish()
        for b in data:
            bw.write_byte(b)
        bw.write_bits(tail, tail_bits)
        bw.rbsp_trailing_bits()
        return wrap_nal(nal_type, bw.get_bytes())

    def _decide_cu_b_pos(self, IS, cells, gy, gx, s, is_intra, mode, pdir,
                         mv0_in, mv1_in, lv_y, lv_cb, lv_cr,
                         poc, poc0, poc1):
        if is_intra:
            return IS.BCTUDecision(
                is_intra=True, intra_mode=mode,
                luma_levels=lv_y, cb_levels=lv_cb, cr_levels=lv_cr)
        mv0 = mv0_in if pdir & 1 else (0, 0)
        mv1 = mv1_in if pdir & 2 else (0, 0)
        motion = IS.BMotion(pdir, mv0, mv1)
        cands = IS.merge_candidates_b_pos(cells, gy, gx, s, self.max_merge)
        for i, cand in enumerate(cands):
            if cand.key() == motion.key():
                return IS.BCTUDecision(
                    is_intra=False, motion=motion, merge_idx=i,
                    luma_levels=lv_y, cb_levels=lv_cb, cr_levels=lv_cr)
        d = IS.BCTUDecision(is_intra=False, motion=motion, merge_idx=-1,
                            luma_levels=lv_y, cb_levels=lv_cb,
                            cr_levels=lv_cr)
        for lx, mv in ((0, mv0), (1, mv1)):
            if not (pdir & (1 << lx)):
                continue
            preds = IS.amvp_candidates_b_pos(cells, gy, gx, s, lx,
                                             poc, poc0, poc1)
            costs = [abs(mv[0] - p[0]) + abs(mv[1] - p[1]) for p in preds]
            flag = 0 if costs[0] <= costs[1] else 1
            mvd = (mv[0] - preds[flag][0], mv[1] - preds[flag][1])
            if lx == 0:
                d.mvp_flag0, d.mvd0 = flag, mvd
            else:
                d.mvp_flag1, d.mvd1 = flag, mvd
        return d

    def _decide_cu_b(self, out, grid, r, c, poc, poc0, poc1):
        from ..bitstream import inter_syntax as IS
        lv_y = out["levels_y"][r, c]
        lv_cb = out["levels_cb"][r, c]
        lv_cr = out["levels_cr"][r, c]
        if out["use_intra"][r, c]:
            return IS.BCTUDecision(
                is_intra=True, intra_mode=int(out["modes"][r, c]),
                luma_levels=lv_y, cb_levels=lv_cb, cr_levels=lv_cr)
        pdir = int(out["pdir"][r, c])
        mv0 = (int(out["mvx"][r, c]), int(out["mvy"][r, c])) if pdir & 1 else (0, 0)
        mv1 = (int(out["mv1x"][r, c]), int(out["mv1y"][r, c])) if pdir & 2 else (0, 0)
        motion = IS.BMotion(pdir, mv0, mv1)
        cands = IS.merge_candidates_b(grid, r, c, self.max_merge)
        for i, cand in enumerate(cands):
            if cand.key() == motion.key():
                return IS.BCTUDecision(
                    is_intra=False, motion=motion, merge_idx=i,
                    luma_levels=lv_y, cb_levels=lv_cb, cr_levels=lv_cr)
        d = IS.BCTUDecision(is_intra=False, motion=motion, merge_idx=-1,
                            luma_levels=lv_y, cb_levels=lv_cb, cr_levels=lv_cr)
        for lx, mv in ((0, mv0), (1, mv1)):
            if not (pdir & (1 << lx)):
                continue
            preds = IS.amvp_candidates_b(grid, r, c, lx, poc, poc0, poc1)
            costs = [abs(mv[0] - p[0]) + abs(mv[1] - p[1]) for p in preds]
            flag = 0 if costs[0] <= costs[1] else 1
            mvd = (mv[0] - preds[flag][0], mv[1] - preds[flag][1])
            if lx == 0:
                d.mvp_flag0, d.mvd0 = flag, mvd
            else:
                d.mvp_flag1, d.mvd1 = flag, mvd
        return d

    def _assemble_p_slice(self, out: dict, qp: int = None, poc: int = None,
                          ref_delta: int = 1, sao_params=None,
                          weights=None, qp_map=None, rps=None,
                          n_refs: int = 1) -> bytes:
        from ..bitstream import inter_syntax as IS
        from ..bitstream.bitio import NAL_TRAIL_R
        qp = self.qp if qp is None else qp
        if self.max_depth:
            return self._assemble_p_slice_qt(out, qp, poc, ref_delta,
                                             sao_params, qp_map, weights)
        sess = self.intra_sess
        log2cu = self.cu.bit_length() - 1
        bw = HDR.write_slice_header(sess.sps, sess.pps, slice_type=1,
                                    slice_qp=qp, nal_type=NAL_TRAIL_R,
                                    poc=self.poc if poc is None else poc,
                                    ref_poc_delta=ref_delta,
                                    max_merge=self.max_merge,
                                    sao_luma=1 if sao_params is not None else 0,
                                    sao_chroma=1 if sao_params is not None else 0,
                                    weights=weights, rps=rps,
                                    num_ref_l0=n_refs)
        if self.wpp:
            return self._assemble_p_slice_wpp(out, qp, poc, ref_delta,
                                              sao_params, rps, n_refs)
        res = None
        if n_refs == 1 and not self.tmvp:
            res = native.encode_p_slice(
                out["use_intra"], out["modes"], out["mvx"], out["mvy"],
                out["levels_y"], out["levels_cb"], out["levels_cr"],
                log2cu, qp, self.max_merge, sign_hiding=self.sbh,
                sao=sao_params, qp_map=qp_map, bit_depth=self.bit_depth)
        if res is not None:       # production path: C++ CABAC runtime
            data, tail, tail_bits = res
        else:                     # Python reference fallback
            enc = CabacEncoder()
            enc.init_contexts(1, qp)    # P-slice init row
            grid = [[None] * self.cols for _ in range(self.rows)]
            last = self.rows * self.cols - 1
            qp_prev = qp                # decoder's qPY_PREV chain
            for r in range(self.rows):
                for c in range(self.cols):
                    if sao_params is not None:
                        CS.encode_sao_ctu(
                            enc, sao_params[r][c],
                            sao_params[r][c - 1] if c > 0 else None,
                            sao_params[r - 1][c] if r > 0 else None,
                            True, True, sess.bit_depth)
                    d = self._decide_cu(out, grid, r, c, n_refs=n_refs,
                                        col=self.col_field
                                        if self.tmvp else None)
                    delta = None
                    if qp_map is not None and d.has_residual:
                        delta = int(qp_map[r, c]) - qp_prev
                        qp_prev = int(qp_map[r, c])
                    IS.encode_inter_ctu(enc, d, grid, r, c, log2cu,
                                        self.max_merge, sign_hiding=self.sbh,
                                        cu_qp_delta=delta, n_refs=n_refs)
                    enc.encode_bin_trm(1 if r * self.cols + c == last else 0)
            data, tail, tail_bits = enc.finish()
        for b in data:
            bw.write_byte(b)
        bw.write_bits(tail, tail_bits)
        bw.rbsp_trailing_bits()
        return wrap_nal(NAL_TRAIL_R, bw.get_bytes())

    def _assemble_p_slice_qt(self, out: dict, qp: int, poc=None,
                             ref_delta: int = 1, sao_params=None,
                             qp_map=None, weights=None) -> bytes:
        """Quadtree P slice (depth 1 or 2): coding_quadtree per CTU with
        position-based merge/AMVP derivation on the cell grid."""
        from ..bitstream import inter_syntax as IS
        from ..bitstream.bitio import NAL_TRAIL_R
        from ..bitstream.tables import CTX_OFFSET as CTX
        from .qt_common import QOFF
        sess = self.intra_sess
        bw = HDR.write_slice_header(sess.sps, sess.pps, slice_type=1,
                                    slice_qp=qp, nal_type=NAL_TRAIL_R,
                                    poc=self.poc if poc is None else poc,
                                    ref_poc_delta=ref_delta,
                                    max_merge=self.max_merge,
                                    sao_luma=1 if sao_params is not None else 0,
                                    sao_chroma=1 if sao_params is not None else 0,
                                    weights=weights)
        res = native.encode_slice_qt2(1, self.max_depth, out, qp,
                                      self.max_merge,
                                      sign_hiding=self.sbh,
                                      sao=sao_params, qp_map=qp_map,
                                      bit_depth=self.bit_depth,
                                      max_tt=1 if self.rqt else 0)
        if res is not None:
            data, tail, tail_bits = res
        else:
            if isinstance(sao_params, np.ndarray):
                sao_params = native.unpack_sao(sao_params, self.rows, self.cols)
            enc = CabacEncoder()
            enc.init_contexts(1, qp)
            md = self.max_depth
            g = 1 << md
            cell_px = 32 // g
            min_log2 = 5 - md
            gr, gc = g * self.rows, g * self.cols
            cells = [[None] * gc for _ in range(gr)]
            depth = np.zeros((gr, gc), np.int32)
            last = self.rows * self.cols - 1
            qp_prev = qp

            def split_flag(cy, cx, d, sp):
                ctx = ((1 if cx > 0 and depth[cy, cx - 1] > d else 0)
                       + (1 if cy > 0 and depth[cy - 1, cx] > d else 0))
                enc.encode_bin(1 if sp else 0, CTX["split_cu"] + ctx)

            for r in range(self.rows):
                for c in range(self.cols):
                    if sao_params is not None:
                        CS.encode_sao_ctu(
                            enc, sao_params[r][c],
                            sao_params[r][c - 1] if c > 0 else None,
                            sao_params[r - 1][c] if r > 0 else None,
                            True, True, sess.bit_depth)
                    gy, gx = g * r, g * c
                    state = {"pending": qp_map is not None}
                    ctu_qp = None if qp_map is None else int(qp_map[r, c])

                    def code(cy, cx, sc, is_intra, mode, mv, dep):
                        px = sc * cell_px
                        oy, ox = (cy - gy) * cell_px, (cx - gx) * cell_px
                        d = self._decide_cu_pos(
                            IS, cells, cy, cx, sc, is_intra, mode, mv,
                            out["levels_y"][r, c][oy:oy + px, ox:ox + px],
                            out["levels_cb"][r, c][oy // 2:(oy + px) // 2,
                                                   ox // 2:(ox + px) // 2],
                            out["levels_cr"][r, c][oy // 2:(oy + px) // 2,
                                                   ox // 2:(ox + px) // 2])
                        delta = None
                        if state["pending"] and d.has_residual:
                            delta = ctu_qp - qp_prev_holder[0]
                            qp_prev_holder[0] = ctu_qp
                            state["pending"] = False
                        ts = (sc == g and self.rqt
                              and bool(out["tu_split32"][r, c]))
                        IS.encode_inter_cu_qt(enc, d, cells, cy, cx, sc,
                                              self.max_merge,
                                              sign_hiding=self.sbh,
                                              cu_qp_delta=delta,
                                              cell_px=cell_px,
                                              min_log2=min_log2,
                                              tu_split=ts,
                                              max_tt=1 if self.rqt else 0)
                        depth[cy:cy + sc, cx:cx + sc] = dep

                    qp_prev_holder = [qp_prev]
                    sp0 = bool(out["split"][r, c])
                    split_flag(gy, gx, 0, sp0)
                    if not sp0:
                        code(gy, gx, g, bool(out["use_intra"][r, c]),
                             int(out["modes"][r, c]),
                             (int(out["mvx"][r, c]), int(out["mvy"][r, c])),
                             0)
                    else:
                        half = g // 2
                        for q, (qy, qx) in enumerate(QOFF):
                            cy, cx = gy + qy * half, gx + qx * half
                            sub = (md >= 2
                                   and bool(out["split16"][r, c, q]))
                            if md >= 2:
                                split_flag(cy, cx, 1, sub)
                            if not sub:
                                code(cy, cx, half,
                                     bool(out["use_intra4"][r, c, q]),
                                     int(out["modes4"][r, c, q]),
                                     (int(out["mv4x"][r, c, q]),
                                      int(out["mv4y"][r, c, q])), 1)
                            else:
                                for sq, (sy_, sx_) in enumerate(QOFF):
                                    code(cy + sy_, cx + sx_, 1,
                                         bool(out["use_intra8"][r, c, q, sq]),
                                         int(out["modes8"][r, c, q, sq]),
                                         (int(out["mv8x"][r, c, q, sq]),
                                          int(out["mv8y"][r, c, q, sq])), 2)
                    qp_prev = qp_prev_holder[0]
                    enc.encode_bin_trm(1 if r * self.cols + c == last else 0)
            data, tail, tail_bits = enc.finish()
        for b in data:
            bw.write_byte(b)
        bw.write_bits(tail, tail_bits)
        bw.rbsp_trailing_bits()
        return wrap_nal(NAL_TRAIL_R, bw.get_bytes())

    def _decide_cu_pos(self, IS, cells, gy, gx, s, is_intra, mode, mv,
                       lv_y, lv_cb, lv_cr):
        if is_intra:
            return IS.InterCTUDecision(
                is_intra=True, intra_mode=mode,
                luma_levels=lv_y, cb_levels=lv_cb, cr_levels=lv_cr)
        cands = IS.merge_candidates_pos(cells, gy, gx, s, self.max_merge)
        if mv in cands:
            return IS.InterCTUDecision(
                is_intra=False, mv=mv, merge_idx=cands.index(mv),
                luma_levels=lv_y, cb_levels=lv_cb, cr_levels=lv_cr)
        preds = IS.amvp_candidates_pos(cells, gy, gx, s)
        costs = [abs(mv[0] - p[0]) + abs(mv[1] - p[1]) for p in preds]
        flag = 0 if costs[0] <= costs[1] else 1
        mvd = (mv[0] - preds[flag][0], mv[1] - preds[flag][1])
        return IS.InterCTUDecision(
            is_intra=False, mv=mv, merge_idx=-1, mvp_flag=flag, mvd=mvd,
            luma_levels=lv_y, cb_levels=lv_cb, cr_levels=lv_cr)

    def _decide_cu(self, out, grid, r, c, n_refs: int = 1, col=None):
        """Map device decisions to signaling (merge/AMVP selection against
        the decoder-exact candidate lists)."""
        from ..bitstream import inter_syntax as IS
        lv_y = out["levels_y"][r, c]
        lv_cb = out["levels_cb"][r, c]
        lv_cr = out["levels_cr"][r, c]
        if out["use_intra"][r, c]:
            return IS.InterCTUDecision(
                is_intra=True, intra_mode=int(out["modes"][r, c]),
                luma_levels=lv_y, cb_levels=lv_cb, cr_levels=lv_cr)
        mv = (int(out["mvx"][r, c]), int(out["mvy"][r, c]))   # quarter-pel
        ref = int(out["ref"][r, c]) if (n_refs > 1
                                        and out.get("ref") is not None) else 0
        ref_deltas = list(range(1, n_refs + 1))
        cands = IS.merge_candidates_ref(grid, r, c, self.max_merge,
                                        n_refs=n_refs, col=col,
                                        ref_deltas=ref_deltas)
        if (mv, ref) in cands:
            return IS.InterCTUDecision(
                is_intra=False, mv=mv, ref=ref,
                merge_idx=cands.index((mv, ref)),
                luma_levels=lv_y, cb_levels=lv_cb, cr_levels=lv_cr)
        preds = IS.amvp_candidates(grid, r, c, target_ref=ref,
                                   ref_deltas=ref_deltas, col=col)
        costs = [abs(mv[0] - p[0]) + abs(mv[1] - p[1]) for p in preds]
        flag = 0 if costs[0] <= costs[1] else 1
        mvd = (mv[0] - preds[flag][0], mv[1] - preds[flag][1])
        return IS.InterCTUDecision(
            is_intra=False, mv=mv, ref=ref, merge_idx=-1, mvp_flag=flag,
            mvd=mvd,
            luma_levels=lv_y, cb_levels=lv_cb, cr_levels=lv_cr)
