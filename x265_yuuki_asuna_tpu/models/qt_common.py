"""Shared helpers for quadtree wavefront encoders (intra + inter).

`block_v` builds the intra reference vector for ANY sub-block position and
size inside a CTU from the CTU-local recon tile plus the carried neighbor
CTU boundaries, with spec z-order availability (8.4.4.2.1) decided
STATICALLY per position — positions are unrolled python constants, so the
whole derivation folds into gathers/concats at trace time.

v layout (length 4*nn+1): [below-left (bottom..top), left (bottom..top),
corner, top (left..right), top-right (left..right)].
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def morton(y: int, x: int) -> int:
    """Z-order index of a unit cell (y, x) — both < 256."""
    z = 0
    for b in range(8):
        z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
    return z


def _tr_available(y0: int, x0: int, nn: int, N: int) -> bool:
    """In-tile top-right samples (y0-1, x0+nn..) decoded before (y0, x0)?
    Compare z-order at the finest granularity that separates the blocks."""
    g = nn                     # compare at the current block's granularity
    return morton((y0 - 1) // g, (x0 + nn) // g) < morton(y0 // g, x0 // g)


def _bl_available(y0: int, x0: int, nn: int, N: int) -> bool:
    """In-tile below-left samples (y0+nn.., x0-1) decoded before (y0, x0)?
    (Possible across quadrant boundaries, e.g. the 8-block left-below of
    (0, 16) is (8, 15) in z-index 3 < 4.)"""
    g = nn
    return morton((y0 + nn) // g, (x0 - 1) // g) < morton(y0 // g, x0 // g)


def assemble_v(parts, S):
    vs, avs = [], []
    for t, a in parts:
        if t.ndim == 1:
            t = t[:, None]
        k = t.shape[1]
        vs.append(t)
        avs.append(jnp.broadcast_to(a[:, None], (S, k)))
    return jnp.concatenate(vs, axis=1), jnp.concatenate(avs, axis=1)


def block_v(tile, lrc, tbr, trbr, tlbr, al, at, atr, atl,
            y0: int, x0: int, nn: int):
    """Reference vector for the nn-sized block at (y0, x0) of the CTU tile.

    tile: [S, N, N] local recon (selected recon of all z-preceding blocks);
    lrc/tbr/trbr/tlbr: neighbor CTU right-column / bottom-rows [S, N];
    al/at/atr/atl: neighbor availability flags [S] bool.
    """
    S = tile.shape[0]
    N = tile.shape[1]
    F = jnp.ones((S,), bool)
    NO = jnp.zeros((S,), bool)
    zs = jnp.zeros((S, nn), jnp.int32)
    parts = []

    # below-left: (y0+nn .. y0+2nn-1, x0-1), bottom..top
    if x0 == 0 and y0 + 2 * nn <= N:
        parts.append((lrc[:, y0 + nn:y0 + 2 * nn][:, ::-1], al))
    elif (x0 > 0 and y0 + 2 * nn <= N
          and _bl_available(y0, x0, nn, N)):
        parts.append((tile[:, y0 + nn:y0 + 2 * nn, x0 - 1][:, ::-1], F))
    else:
        parts.append((zs, NO))

    # left: (y0 .. y0+nn-1, x0-1), bottom..top
    if x0 == 0:
        parts.append((lrc[:, y0:y0 + nn][:, ::-1], al))
    else:
        parts.append((tile[:, y0:y0 + nn, x0 - 1][:, ::-1], F))

    # corner: (y0-1, x0-1)
    if y0 == 0 and x0 == 0:
        parts.append((tlbr[:, N - 1], atl))
    elif y0 == 0:
        parts.append((tbr[:, x0 - 1], at))
    elif x0 == 0:
        parts.append((lrc[:, y0 - 1], al))
    else:
        parts.append((tile[:, y0 - 1, x0 - 1], F))

    # top: (y0-1, x0 .. x0+nn-1)
    if y0 == 0:
        parts.append((tbr[:, x0:x0 + nn], at))
    else:
        parts.append((tile[:, y0 - 1, x0:x0 + nn], F))

    # top-right: (y0-1, x0+nn .. x0+2nn-1)
    if y0 == 0:
        if x0 + 2 * nn <= N:
            parts.append((tbr[:, x0 + nn:x0 + 2 * nn], at))
        else:
            parts.append((trbr[:, 0:nn], atr))
    else:
        if x0 + 2 * nn <= N and _tr_available(y0, x0, nn, N):
            parts.append((tile[:, y0 - 1, x0 + nn:x0 + 2 * nn], F))
        else:
            parts.append((zs, NO))

    return assemble_v(parts, S)


# z-order offsets of the 4 quadrants of any block
QOFF = ((0, 0), (0, 1), (1, 0), (1, 1))


def source_v(plane, nn: int):
    """Boundary vectors [nblocks, 4nn+1] gathered from the edge-replicated
    SOURCE plane for every aligned nn-block — the fast-intra analog: mode
    decisions from source neighbors in one dense batch (no wavefront), with
    the exact recon produced later by the commit scan."""
    hh, ww = plane.shape
    p = jnp.pad(plane, 1, mode="edge")
    cn = ww // nn
    nb = (hh // nn) * cn
    y0 = (np.arange(nb) // cn) * nn + 1
    x0 = (np.arange(nb) % cn) * nn + 1
    ar = np.arange(nn)
    bl_rows = np.minimum(y0[:, None] + 2 * nn - 1 - ar[None, :], hh)
    lf_rows = y0[:, None] + nn - 1 - ar[None, :]
    top_cols = x0[:, None] + ar[None, :]
    tr_cols = np.minimum(x0[:, None] + nn + ar[None, :], ww + 1)
    coll = (x0 - 1)[:, None]
    rowt = (y0 - 1)[:, None]
    return jnp.concatenate([
        p[jnp.asarray(bl_rows), jnp.asarray(coll)],
        p[jnp.asarray(lf_rows), jnp.asarray(coll)],
        p[jnp.asarray(rowt), jnp.asarray(coll)],
        p[jnp.asarray(rowt), jnp.asarray(top_cols)],
        p[jnp.asarray(rowt), jnp.asarray(tr_cols)],
    ], axis=1)
