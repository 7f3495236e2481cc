"""ABR-ladder encoding (reference abrEncApp.cpp analog): encode one input at
multiple resolutions/bitrates in a single pass over the source, scaling each
frame with the K22 scaler. Rungs run back-to-back per frame so the source is
read once (the reference runs one encoder thread per rung; here each rung is
one device session and frames pipeline through them).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from ..ops import scaler as SC
from .encoder_top import VideoEncoderSession, FrameResult


@dataclass
class Rung:
    width: int
    height: int
    bitrate_kbps: int


def parse_ladder(spec: str) -> List[Rung]:
    """Parse "1280x720:2000,640x360:800" into rungs."""
    rungs = []
    for part in spec.split(","):
        res, _, rate = part.strip().partition(":")
        w, h = (int(x) for x in res.lower().split("x"))
        rungs.append(Rung(w, h, int(rate) if rate else 0))
    return rungs


class LadderEncoder:
    """share_analysis: the smallest rung runs first and donates its MV
    field to rungs whose resolution is an integral 2x/4x multiple — the
    reference AbrEncoder's cross-pass analysis handoff (abrEncApp.cpp)."""

    def __init__(self, src_w: int, src_h: int, rungs: List[Rung],
                 fps: Tuple[int, int] = (25, 1), qp: int = 32,
                 keyint: int = 250, share_analysis: bool = True,
                 **session_kw):
        self.src_w, self.src_h = src_w, src_h
        self.rungs = rungs
        # donor = smallest rung; consumers = exact 2x/4x upscales of it
        areas = [r.width * r.height for r in rungs]
        self.donor = areas.index(min(areas)) if share_analysis else -1
        self.consumer_sf = {}
        if share_analysis:
            dw = rungs[self.donor].width
            dh = rungs[self.donor].height
            for i, r in enumerate(rungs):
                if i == self.donor:
                    continue
                if (r.width % dw == 0 and r.height % dh == 0
                        and r.width // dw == r.height // dh
                        and r.width // dw in (2, 4)):
                    self.consumer_sf[i] = r.width // dw
        self.sessions = []
        self._feeds = {}
        for i, r in enumerate(rungs):
            share = None
            if i == self.donor and self.consumer_sf:
                share = "save"
            elif i in self.consumer_sf:
                share = []
                self._feeds[i] = share
            self.sessions.append(VideoEncoderSession(
                r.width, r.height, qp=qp, fps=fps, keyint=keyint,
                rc_mode="abr" if r.bitrate_kbps else "cqp",
                bitrate_kbps=r.bitrate_kbps, analysis_share=share,
                **session_kw))

    def headers(self) -> List[bytes]:
        return [s.headers() for s in self.sessions]

    def encode_frame(self, y, u, v) -> List[FrameResult]:
        from .encoder_top import scale_analysis_rec
        out = [None] * len(self.rungs)
        order = list(range(len(self.rungs)))
        if self.donor >= 0 and self.consumer_sf:
            order.remove(self.donor)
            order.insert(0, self.donor)
        for i in order:
            r, sess = self.rungs[i], self.sessions[i]
            if (r.width, r.height) != (self.src_w, self.src_h):
                ys, us, vs = SC.resize_frame(y, u, v, r.width, r.height)
            else:
                ys, us, vs = y, u, v
            out[i] = sess.encode_frame(ys, us, vs)
            if i == self.donor and self.consumer_sf:
                rec = self.sessions[self.donor].shared_analysis[-1]
                for ci, sf in self.consumer_sf.items():
                    cs = self.sessions[ci]
                    self._feeds[ci].append(
                        scale_analysis_rec(rec, sf, cs.rows, cs.cols))
        return out
