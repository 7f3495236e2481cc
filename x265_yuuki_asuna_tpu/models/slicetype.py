"""Windowed lookahead analysis: real cuTree backward propagation + plans.

Reference behavior studied (not copied): encoder/slicetype.cpp —
`cuTree` / `estimateCUPropagate` (slicetype.cpp:2538,2641) walk the decided
lookahead window BACKWARDS, pushing each frame's cost along its lowres
motion vectors into the frames it predicts from; the frame about to be
encoded then lowers QP where much future cost lands
(`computeCUTreeQpOffset`, slicetype.cpp:2749: offset =
-strength * log2((intra + propagate_in) / intra), strength =
5 * (1 - qCompress)).

TPU design notes: the per-frame lowres costs/MVs are produced by one dense
device pass at ingest time (models/lookahead.py); the propagation itself is
a small host-side scatter over the ~8k-block lowres grid per window frame
(1080p -> 120x67 blocks), far below device-dispatch granularity, and runs
once per encoded frame.
"""

from __future__ import annotations

from typing import List

import numpy as np


def _bilinear_scatter(acc: np.ndarray, amount: np.ndarray,
                      mvx: np.ndarray, mvy: np.ndarray):
    """Area-weighted scatter of per-block `amount` into `acc` displaced by
    the lowres MVs (reference estimateCUPropagate's 4-corner distribution,
    slicetype.cpp:2680-2730)."""
    nby, nbx = acc.shape
    bx = np.arange(nbx) * 8
    by = np.arange(nby) * 8
    gx = (bx[None, :] + mvx) / 8.0
    gy = (by[:, None] + mvy) / 8.0
    x0 = np.floor(gx).astype(int)
    y0 = np.floor(gy).astype(int)
    fx = gx - x0
    fy = gy - y0
    for dx, dy, w in ((0, 0, (1 - fx) * (1 - fy)), (1, 0, fx * (1 - fy)),
                      (0, 1, (1 - fx) * fy), (1, 1, fx * fy)):
        np.add.at(acc, (np.clip(y0 + dy, 0, nby - 1),
                        np.clip(x0 + dx, 0, nbx - 1)), amount * w)


def cutree_propagate(details: List[dict], strength: float = 2.0,
                     max_offset: float = 6.0) -> np.ndarray:
    """Backward cuTree propagation over a decided lookahead window.

    details[0] is the frame about to be encoded; details[i] predicts from
    details[i-1] (display-order chain; the windowed analog of the
    reference's per-slice-type reference links). Each detail dict carries
    the ingest-time lowres analysis: per-block `icost`, `sad` (inter cost
    vs the previous frame), `mvx`/`mvy` (lowres-pel MVs into the previous
    frame), `has_prev`, and optionally `scenecut` (True = no propagation
    across this boundary).

    Returns per-lowres-block QP offsets (nby, nbx), <= 0.
    """
    if not details:
        raise ValueError("empty lookahead window")
    nbx, nby = details[0]["nb_x"], details[0]["nb_y"]
    prop = np.zeros((nby, nbx), np.float64)   # propagate_in of frame i
    # walk backwards: frame i scatters into frame i-1's grid
    for i in range(len(details) - 1, 0, -1):
        d = details[i]
        nxt = np.zeros((nby, nbx), np.float64)
        if d.get("has_prev", True) and not d.get("scenecut", False):
            icost = np.maximum(
                d["icost"].reshape(nby, nbx).astype(np.float64), 1.0)
            sad = d["sad"].reshape(nby, nbx).astype(np.float64)
            # propagate fraction: how much of this block is explained by
            # its reference (1 - inter/intra), cf. slicetype.cpp:2655
            frac = np.clip(1.0 - sad / icost, 0.0, 1.0)
            amount = (icost + prop) * frac
            _bilinear_scatter(nxt, amount,
                              d["mvx"].reshape(nby, nbx),
                              d["mvy"].reshape(nby, nbx))
        prop = nxt
    d0 = details[0]
    icost0 = np.maximum(d0["icost"].reshape(nby, nbx).astype(np.float64), 1.0)
    off = -strength * np.log2((icost0 + prop) / icost0)
    return np.clip(off, -max_offset, 0.0)


def pool_to_cu(off_blk: np.ndarray, cu_size: int, rows: int,
               cols: int) -> np.ndarray:
    """Average per-lowres-block (== fullres 16x16) offsets onto the CU grid
    (reference cuTree offsets are consumed per quant group)."""
    s = max(cu_size // 16, 1)
    nby, nbx = off_blk.shape
    out = np.zeros((rows, cols))
    for r in range(rows):
        rs = off_blk[r * s:min((r + 1) * s, nby)]
        if rs.size == 0:
            continue
        for c in range(cols):
            blk = rs[:, c * s:min((c + 1) * s, nbx)]
            if blk.size:
                out[r, c] = blk.mean()
    return np.round(out).astype(np.int32)
