"""Motion estimation (K1): batched full-search SAD over a ± range window.

Reference behavior: encoder/motion.cpp implements dia/hex/umh/star patterns
sequentially per PU; on TPU the natural formulation is the exhaustive
candidate grid evaluated as one dense batch (SURVEY.md K1: "batched ME cost;
maps to VPU reductions over candidate grids") — a full search at the same
cost class as the reference's pattern searches, with better quality.
"""

from __future__ import annotations

import numpy as np


def full_search_sad(ref_plane, src_blocks, px, py, n: int, srange: int,
                    lambda_bits: int = 1, xp=np, center=None):
    """Integer full search: for each block b at (px, py) with source
    src_blocks[b], evaluate all (2R+1)^2 integer MVs in [-R, R]^2 on
    ref_plane (border-clamped) and return (mv_x, mv_y, sad) [B].

    Cost = SAD + lambda_bits * (|mvx| + |mvy|) — a cheap rate bias that
    prefers short MVs on ties (encoder-side choice only).

    center: optional ([B] cx, [B] cy) integer-pel window centers (HME:
    the coarse-level MV recenters the fine search — reference --hme,
    lowres.h:43); returned MVs include the center offset.
    """
    H, W = ref_plane.shape
    B = src_blocks.shape[0]
    R = srange
    ext = n + 2 * R

    cx = cy = 0
    if center is not None:
        cx, cy = center[0][:, None], center[1][:, None]
    rows = py[:, None] + cy + (xp.arange(ext) - R)[None, :]
    cols = px[:, None] + cx + (xp.arange(ext) - R)[None, :]
    rows = xp.clip(rows, 0, H - 1)
    cols = xp.clip(cols, 0, W - 1)
    flat = ref_plane.reshape(-1)
    win = xp.take(flat, rows[:, :, None] * W + cols[:, None, :], axis=0)
    win = win.astype(xp.int32)                     # [B, ext, ext]

    ncand = 2 * R + 1
    oy = xp.arange(ncand)
    ox = xp.arange(ncand)
    ar = xp.arange(n)
    # candidate windows [B, ncand, ncand, n, n] is large; fold one axis:
    # iterate dy as a scan-free reshape: build rows idx [ncand, n]
    ridx = oy[:, None] + ar[None, :]               # [ncand, n]
    cidx = ox[:, None] + ar[None, :]
    # gather rows then cols: [B, ncand, n, ext]
    t = xp.take(win, ridx, axis=1)                 # [B, ncand, n, ext]
    t = xp.take(t, cidx, axis=3)                   # [B, ncand, n, ncand, n]
    cand = xp.swapaxes(t, 2, 3)                    # [B, ncand, ncand, n, n]
    diff = xp.abs(cand - src_blocks[:, None, None].astype(xp.int32))
    sad = xp.sum(diff, axis=(-2, -1))              # [B, ncand, ncand]

    mvbias = (xp.abs(oy - R)[:, None] + xp.abs(ox - R)[None, :]) * lambda_bits
    cost = sad + mvbias[None]
    flat_cost = cost.reshape(B, -1)
    best = xp.argmin(flat_cost, axis=1)
    mvy = (best // ncand).astype(xp.int32) - R
    mvx = (best % ncand).astype(xp.int32) - R
    if center is not None:
        mvx = mvx + center[0]
        mvy = mvy + center[1]
    bsad = xp.take_along_axis(sad.reshape(B, -1), best[:, None], axis=1)[:, 0]
    return mvx, mvy, bsad
