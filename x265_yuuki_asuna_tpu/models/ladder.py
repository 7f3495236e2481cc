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
    def __init__(self, src_w: int, src_h: int, rungs: List[Rung],
                 fps: Tuple[int, int] = (25, 1), qp: int = 32,
                 keyint: int = 250, **session_kw):
        self.src_w, self.src_h = src_w, src_h
        self.rungs = rungs
        self.sessions = [
            VideoEncoderSession(
                r.width, r.height, qp=qp, fps=fps, keyint=keyint,
                rc_mode="abr" if r.bitrate_kbps else "cqp",
                bitrate_kbps=r.bitrate_kbps, **session_kw)
            for r in rungs]

    def headers(self) -> List[bytes]:
        return [s.headers() for s in self.sessions]

    def encode_frame(self, y, u, v) -> List[FrameResult]:
        out = []
        for r, sess in zip(self.rungs, self.sessions):
            if (r.width, r.height) != (self.src_w, self.src_h):
                ys, us, vs = SC.resize_frame(y, u, v, r.width, r.height)
            else:
                ys, us, vs = y, u, v
            out.append(sess.encode_frame(ys, us, vs))
        return out
