"""Rate control: CQP / CRF / ABR (round-1 subset of the reference's model).

Reference behavior studied (not copied): encoder/ratecontrol.cpp —
  - qscale <-> qp mapping (x264 heritage): qscale = 0.85 * 2^((qp-12)/6)
  - base curve  qscale = blurredComplexity^(1 - qCompress) / rateFactor
    (ratecontrol.cpp:2718 getQScale)
  - ABR feedback via wanted-bits overflow on a sliding window
    (ratecontrol.cpp:1683 tuneAbrQScaleFromFeedback; SURVEY.md A.4)
  - complexity proxy: cplx ~= bits * qscale of recent frames
Round-1 scope: no lookahead/VBV/cuTree yet — complexity comes from encoded
history; I/P offsets via ipFactor.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

QP_TO_QSCALE = lambda qp: 0.85 * (2.0 ** ((qp - 12.0) / 6.0))


def qscale_to_qp(qscale: float) -> float:
    return 12.0 + 6.0 * math.log2(max(qscale, 1e-6) / 0.85)


@dataclass
class RCConfig:
    mode: str = "cqp"            # cqp | crf | abr
    qp: int = 32
    crf: float = 28.0
    bitrate_kbps: int = 0
    fps: float = 25.0
    width: int = 0
    height: int = 0
    q_compress: float = 0.6
    ip_factor: float = 1.4
    qp_min: int = 4
    qp_max: int = 51
    vbv_maxrate_kbps: int = 0    # 0 = VBV off
    vbv_bufsize_kbps: int = 0    # decoder buffer size (kbit)
    vbv_init: float = 0.9        # initial buffer fullness fraction


class RateControl:
    def __init__(self, cfg: RCConfig):
        self.cfg = cfg
        self.frame = 0
        self.total_bits = 0.0
        self.cplx_sum = 0.0
        self.cplx_count = 0.0
        self.short_term_cplx = 0.0
        self.short_term_count = 0.0
        self.last_qscale = QP_TO_QSCALE(cfg.qp)
        if cfg.mode == "abr":
            self.bits_per_frame = cfg.bitrate_kbps * 1000.0 / cfg.fps
            # initial rate factor from a blind complexity guess (reference
            # ratecontrol.cpp init: 0.04 * pixels heuristic class)
            guess_cplx = 0.01 * (cfg.width * cfg.height) ** 1.0 + 1
            self.rate_factor = (guess_cplx ** (1 - cfg.q_compress)) / \
                QP_TO_QSCALE(max(cfg.qp, 1))
        elif cfg.mode == "crf":
            base_cplx = (cfg.width * cfg.height) / 256.0 * 120.0
            self.rate_factor = (base_cplx ** (1 - cfg.q_compress)) / \
                QP_TO_QSCALE(cfg.crf)
        # ---- VBV decoder-buffer model (reference ratecontrol.cpp VBV:
        # bufferFill -= frame bits; += bufferRate; clip to bufferSize) ------
        self.vbv = cfg.vbv_maxrate_kbps > 0 and cfg.vbv_bufsize_kbps > 0
        if self.vbv:
            self.buffer_size = cfg.vbv_bufsize_kbps * 1000.0
            self.buffer_rate = cfg.vbv_maxrate_kbps * 1000.0 / cfg.fps
            self.buffer_fill = self.buffer_size * cfg.vbv_init

    # ------------------------------------------------------------------
    def frame_qp(self, is_intra: bool, lookahead_cost: float = None) -> int:
        """lookahead_cost: the frame's lowres SATD cost (real complexity);
        when absent, falls back to the encoded-history proxy."""
        cfg = self.cfg
        if cfg.mode == "cqp":
            qp = cfg.qp
        else:
            if lookahead_cost is not None and lookahead_cost > 0:
                # blur with history like the reference's complexity blur
                self.la_blur = getattr(self, "la_blur", lookahead_cost) * 0.6 \
                    + lookahead_cost * 0.4
                cplx = self.la_blur
            elif self.short_term_count > 0:
                cplx = self.short_term_cplx / self.short_term_count
            else:
                cplx = (cfg.width * cfg.height) / 256.0 * 120.0
            qscale = (cplx ** (1 - cfg.q_compress)) / self.rate_factor
            if cfg.mode == "abr" and self.frame > 0:
                wanted = self.bits_per_frame * self.frame
                abr_buffer = 2.0 * self.bits_per_frame * max(self.frame ** 0.5, 4)
                overflow = 1.0 + (self.total_bits - wanted) / abr_buffer
                overflow = min(max(overflow, 0.5), 2.0)
                qscale *= overflow
            # mild smoothing against oscillation
            qscale = min(max(qscale, self.last_qscale / 2.2),
                         self.last_qscale * 2.2)
            self.last_qscale = qscale
            qp = qscale_to_qp(qscale)
        if is_intra and cfg.mode != "cqp":
            qp -= 6.0 * math.log2(cfg.ip_factor)
        if self.vbv:
            qp = self._clip_qp_vbv(qp, is_intra)
        return int(round(min(max(qp, cfg.qp_min), cfg.qp_max)))

    # ------------------------------------------------------------------
    def _clip_qp_vbv(self, qp: float, is_intra: bool) -> float:
        """Frame-level VBV clip: predict this frame's bits from the
        complexity model and raise/lower QP so the decoder buffer neither
        underflows nor overflows (reference clipQscale, frame-level part)."""
        cfg = self.cfg
        if self.short_term_count > 0:
            cplx = self.short_term_cplx / self.short_term_count
        else:
            cplx = (cfg.width * cfg.height) / 256.0 * (400.0 if is_intra
                                                       else 120.0)
        if is_intra:
            cplx *= cfg.ip_factor * 2.0   # I-frames spend well above average
        qscale = QP_TO_QSCALE(qp)
        bits_pred = cplx / qscale
        # underflow guard: after removing this frame and adding one interval,
        # keep at least half an interval of margin in the buffer
        max_bits = self.buffer_fill + self.buffer_rate * 0.5
        if bits_pred > max_bits and max_bits > 0:
            qscale = cplx / max_bits
        # overflow guard: the buffer must absorb the incoming interval; if
        # even a big frame leaves it saturated, spend more bits (lower qp)
        min_bits = self.buffer_fill + self.buffer_rate - self.buffer_size
        if min_bits > 0 and bits_pred < min_bits:
            qscale = cplx / min_bits
        return qscale_to_qp(qscale)

    # ------------------------------------------------------------------
    def vbv_overshoot(self, bits: int) -> float:
        """How badly a coded frame overshoots the decoder buffer: >1 means
        the frame would underflow the buffer (the reference's row-level VBV
        triggers mid-frame re-encodes; the TPU analog re-runs the frame at a
        higher QP — runtime QP needs no recompile)."""
        if not self.vbv:
            return 0.0
        max_bits = self.buffer_fill + self.buffer_rate * 0.5
        return bits / max(max_bits, 1.0)

    # ------------------------------------------------------------------
    def frame_done(self, qp_used: int, bits: int):
        qscale = QP_TO_QSCALE(qp_used)
        cplx = bits * qscale
        self.cplx_sum = self.cplx_sum * 0.95 + cplx
        self.cplx_count = self.cplx_count * 0.95 + 1
        self.short_term_cplx = self.short_term_cplx * 0.6 + cplx
        self.short_term_count = self.short_term_count * 0.6 + 1
        self.total_bits += bits
        self.frame += 1
        if self.vbv:
            self.buffer_fill -= bits
            self.buffer_fill = max(self.buffer_fill, 0.0)   # underflow clamp
            self.buffer_fill = min(self.buffer_fill + self.buffer_rate,
                                   self.buffer_size)
        if self.cfg.mode == "abr" and self.frame >= 2:
            # renormalize rate factor toward hitting the target with the
            # observed complexity (slow adaptation)
            cplx_avg = self.cplx_sum / self.cplx_count
            ideal_qscale = (cplx_avg / max(self.bits_per_frame, 1.0))
            want_rf = (cplx_avg ** (1 - self.cfg.q_compress)) / max(ideal_qscale, 1e-6)
            self.rate_factor = 0.9 * self.rate_factor + 0.1 * want_rf


def _block_ac_energy(plane, bsz):
    """Per-block AC energy: ssd - sum^2 >> shift (the reference's
    acEnergyVar, slicetype.cpp:49 — integer semantics)."""
    import numpy as np
    H, W = plane.shape
    rows, cols = H // bsz, W // bsz
    blocks = (plane[:rows * bsz, :cols * bsz]
              .reshape(rows, bsz, cols, bsz).astype(np.int64))
    s = blocks.sum(axis=(1, 3))
    ssd = (blocks * blocks).sum(axis=(1, 3))
    shift = (2 * (bsz.bit_length() - 1))
    return (ssd - ((s * s) >> shift)).astype(np.float64)


def _ac_energy_cu(y, u, v):
    """AC energy of each 16x16 luma block incl. the co-sited 8x8 chroma
    blocks (reference acEnergyCu, slicetype.cpp:256)."""
    e = _block_ac_energy(y, 16)
    if u is not None:
        e = e + _block_ac_energy(u, 8) + _block_ac_energy(v, 8)
    return e


def _edge_maps(y):
    """Gaussian blur + Sobel-style gradient (reference edgeFilter /
    computeEdge, slicetype.cpp:151,100): returns (edge bitmap scaled like
    the reference's whitePixel, per-pixel angle in degrees 0..180)."""
    import numpy as np
    src = y.astype(np.float64)
    H, W = src.shape
    # 5x5 Gaussian, 1/159 kernel (slicetype.cpp:183-209)
    k = np.array([[2, 4, 5, 4, 2], [4, 9, 12, 9, 4], [5, 12, 15, 12, 5],
                  [4, 9, 12, 9, 4], [2, 4, 5, 4, 2]], np.float64)
    pad = np.pad(src, 2, mode="edge")
    sm = np.zeros_like(src)
    for dy in range(5):
        for dx in range(5):
            sm += k[dy, dx] * pad[dy:dy + H, dx:dx + W]
    ref = np.floor(sm / 159.0)
    # interior copies the source at borders like the reference
    ref[:2, :] = src[:2, :]; ref[-2:, :] = src[-2:, :]
    ref[:, :2] = src[:, :2]; ref[:, -2:] = src[:, -2:]
    # Scharr-like gradient (slicetype.cpp:119-133)
    p = np.pad(ref, 1, mode="edge")
    gh = (-3 * p[:-2, :-2] + 3 * p[:-2, 2:]
          - 10 * p[1:-1, :-2] + 10 * p[1:-1, 2:]
          - 3 * p[2:, :-2] + 3 * p[2:, 2:])
    gv = (-3 * p[:-2, :-2] - 10 * p[:-2, 1:-1] - 3 * p[:-2, 2:]
          + 3 * p[2:, :-2] + 10 * p[2:, 1:-1] + 3 * p[2:, 2:])
    mag = np.sqrt(gh * gh + gv * gv)
    theta = np.degrees(np.arctan2(gv, gh))
    theta = np.where(theta < 0, 180.0 + theta, theta)
    edge = np.where(mag >= 255.0, 255.0, 0.0)
    edge[:1, :] = 0; edge[-1:, :] = 0; edge[:, :1] = 0; edge[:, -1:] = 0
    return edge, theta


def compute_aq_offsets(y_plane, cu_size: int, strength: float = 1.0,
                       qp_range: int = 6, mode: int = 2,
                       u_plane=None, v_plane=None, bit_depth: int = 8):
    """Adaptive quantization per-16x16 offsets aggregated to the CU grid.

    Modes follow the reference calcAdaptiveQuantFrame (slicetype.cpp:444):
      1 variance:       strength*1.0397 * (log2 max(energy,1) - 14.427)
      2 auto-variance:  e=(energy*bdc+1)^0.1; s=strength*mean(e);
                        adj = s*(e - (mean - .5*(mean_sq - 11)/mean))
      3 auto-var-biased: mode2 + strength*(1 - 11/e^2) dark bias
      4 edge:           edge-density energy with 45-degree inclination bias
    Returns per-CU integer QP offsets [rows, cols]."""
    import numpy as np
    H, W = y_plane.shape
    rows16, cols16 = H // 16, W // 16
    if rows16 == 0 or cols16 == 0:
        return np.zeros((max(H // cu_size, 1), max(W // cu_size, 1)), np.int32)
    energy = _ac_energy_cu(y_plane, u_plane, v_plane)[:rows16, :cols16]
    bdc = 1.0 / (1 << (2 * (bit_depth - 8)))
    if mode in (2, 3, 4):
        if mode == 4:
            edge, theta = _edge_maps(y_plane)
            edens = _block_ac_energy(edge, 16)[:rows16, :cols16]
            # per-16x16 average angle (findAvgAngle, slicetype.cpp:221)
            ang = (theta[:rows16 * 16, :cols16 * 16]
                   .reshape(rows16, 16, cols16, 16).mean(axis=(1, 3)))
            inclined = (((ang >= 30) & (ang <= 60))
                        | ((ang >= 120) & (ang <= 150)))
            qa = np.where(edens > 0, np.power(edens * bdc + 1.0, 0.1),
                          np.power(energy * bdc + 1.0, 0.1))
            inclined = inclined & (edens > 0)
        else:
            qa = np.power(energy * bdc + 1.0, 0.1)
            inclined = None
        avg = qa.mean()
        avg_pow2 = (qa * qa).mean()
        s = strength * avg
        avg_adj = avg - 0.5 * (avg_pow2 - 11.0) / max(avg, 1e-9)
        adj = s * (qa - avg_adj)
        if mode == 3:
            adj = adj + strength * (1.0 - 11.0 / np.maximum(qa * qa, 1e-9))
        if mode == 4:
            adj = np.where(inclined & (qa - avg_adj > 0),
                           (s + 0.5) * (qa - avg_adj), adj)
    else:   # mode 1: plain variance
        s = strength * 1.0397
        adj = s * (np.log2(np.maximum(energy, 1.0))
                   - (14.427 + 2.0 * (bit_depth - 8)))
    # aggregate the 16x16 grid to the CU grid (mean, like invQscaleFactor
    # averaging for qgSize 8 — slicetype.cpp:648)
    f = cu_size // 16
    if f > 1:
        rcu, ccu = rows16 // f, cols16 // f
        adj = adj[:rcu * f, :ccu * f].reshape(rcu, f, ccu, f).mean(axis=(1, 3))
    return np.clip(np.round(adj), -qp_range, qp_range).astype(np.int32)


# ---------------------------------------------------------------------------
# Two-pass rate control (reference: x265_2pass.log flow, ratecontrol.cpp:819
# analyseABR2Pass — simplified to uniform qscale rescaling, which preserves
# pass-1 relative allocation while hitting the target exactly in expectation).
# ---------------------------------------------------------------------------

import json as _json


class StatsWriter:
    def __init__(self, path: str):
        self.path = path
        self.records = []

    def add(self, frame_type: str, qp: int, bits: int, cost: float,
            cuoff=None):
        rec = {"type": frame_type, "qp": qp, "bits": bits, "cost": cost}
        if cuoff is not None:
            # per-CU cuTree QP offsets (the reference's .cutree sidecar,
            # ratecontrol.cpp:2988 writes fix8-packed offsets per block)
            rec["cuoff"] = cuoff
        self.records.append(rec)

    def close(self):
        with open(self.path, "w") as f:
            for r in self.records:
                f.write(_json.dumps(r) + "\n")


class TwoPassRC:
    """Pass-2 QP assignment from pass-1 statistics."""

    def __init__(self, stats_path: str, bitrate_kbps: int, fps: float,
                 qp_min: int = 4, qp_max: int = 51):
        with open(stats_path) as f:
            self.records = [_json.loads(line) for line in f if line.strip()]
        target_total = bitrate_kbps * 1000.0 / fps * len(self.records)
        actual_total = sum(r["bits"] for r in self.records)
        # bits ~ cplx / qscale: scaling every qscale by K scales total by 1/K
        self.scale = actual_total / max(target_total, 1.0)
        self.qp_min, self.qp_max = qp_min, qp_max
        self.idx = 0

    def frame_qp(self) -> int:
        r = self.records[min(self.idx, len(self.records) - 1)]
        self.last_record = r
        self.idx += 1
        q = QP_TO_QSCALE(r["qp"]) * self.scale
        return int(round(min(max(qscale_to_qp(q), self.qp_min), self.qp_max)))

    def frame_cuoff(self):
        """Per-CU cuTree offsets saved by pass 1 for the frame just issued
        by frame_qp() (cuTreeReadFor2Pass analog), or None."""
        import numpy as np
        r = getattr(self, "last_record", None)
        if not r or "cuoff" not in r:
            return None
        return np.asarray(r["cuoff"], np.int32)
