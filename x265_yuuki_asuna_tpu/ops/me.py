"""Motion estimation (K1): batched full-search SAD over a ± range window.

Reference behavior: encoder/motion.cpp implements dia/hex/umh/star patterns
sequentially per PU; on TPU the natural formulation is the exhaustive
candidate grid evaluated as one dense batch (SURVEY.md K1: "batched ME cost;
maps to VPU reductions over candidate grids") — a full search at the same
cost class as the reference's pattern searches, with better quality.
"""

from __future__ import annotations

import numpy as np


def sad_sweep_multi(ref_plane, src_plane, sizes, srange: int,
                    lambda_bits: int = 1, use_pallas: bool = None,
                    return_surface: bool = False):
    """Frame-level full-search ME for ALL aligned block sizes in one pass.

    TPU-first formulation of motion.cpp:739's per-PU pattern search: instead
    of gathering per-block candidate windows (which materialises a
    [B, (2R+1)^2, n, n] tensor), sweep the (2R+1)^2 global displacements of
    the whole reference plane. For each displacement the |ref(x+d) - src(x)|
    plane is reduced hierarchically: 8x8 block sums, then 2x2 sums of those
    for 16x16, then 32x32 — so the SADs for every size come from ONE abs-diff
    pass. dy is a lax.scan (33 steps at R=16); dx is vectorised.

    Cost = SAD + lambda_bits * (|dx| + |dy|), tie-break = smallest dy then
    smallest dx (identical to full_search_sad's flattened argmin).

    ref/src: [H, W] integer planes (H, W multiples of max(sizes)).
    Returns {n: (mvx, mvy, sad)} with flat row-major block arrays.

    return_surface: also return the full cost surface so merge-candidate
    RD can score ANY in-range integer MV for every block with a tiny
    [nblocks] gather instead of per-candidate window gathers + SATD
    (the round-4 merge loop's dominant cost). Returns (results, surface)
    where surface = {"ys": [D*D, sum nblocks] int32 SADs, "off": {n:
    column offset}, "nb": {n: nblocks}, "R": R} — or None on the paths
    that do not retain it (Pallas, >8-bit).
    """
    import os

    import jax
    import jax.numpy as jnp

    if use_pallas is None:
        use_pallas = os.environ.get("ASUNA_PALLAS") == "1"
    if use_pallas and min(sizes) >= 8:
        # Pallas K1 kernel (ops/pallas/me_sad) — bit-exact drop-in; opt-in
        # because the tunnel backend may not lower Pallas (gate + canary in
        # bench.py)
        from .pallas.me_sad import sad_sweep_multi_pallas
        out = sad_sweep_multi_pallas(ref_plane, src_plane, sizes, srange,
                                     lambda_bits)
        return (out, None) if return_surface else out

    H, W = src_plane.shape
    R = srange
    D = 2 * R + 1
    sizes = sorted(sizes)
    base = sizes[0]
    if src_plane.dtype == jnp.uint8:
        # 8-bit fast path: |d| <= 255 is exactly representable in bf16, so
        # the block sums ride the MXU (one big matmul per dy) and the
        # argmin happens ONCE after the scan — measured 4.2x faster than
        # the VPU reshape-sum form at 1080p R=16, bit-exact
        return _sad_sweep_mxu(ref_plane, src_plane, sizes, R, lambda_bits,
                              return_surface)
    src16 = src_plane.astype(jnp.int16)
    ref_pad = jnp.pad(ref_plane.astype(jnp.int16), R, mode="edge")
    dxs = jnp.arange(D, dtype=jnp.int32)
    bias_dx = lambda_bits * jnp.abs(dxs - R)            # [D]

    def block_sums(d_abs):
        """[D, H, W] -> {n: [D, H/n, W/n]} hierarchical block sums."""
        out = {}
        s = (d_abs.reshape(D, H // base, base, W // base, base)
             .astype(jnp.int32).sum(axis=(2, 4)))
        out[base] = s
        for n in sizes[1:]:
            hh, ww = H // n, W // n
            s = s.reshape(D, hh, 2, ww, 2).sum(axis=(2, 4))
            out[n] = s
        return out

    def body(carry, dy):
        rows = jax.lax.dynamic_slice(ref_pad, (dy, 0), (H, W + 2 * R))
        winds = jax.vmap(
            lambda dx: jax.lax.dynamic_slice(rows, (0, dx), (H, W)))(dxs)
        d_abs = jnp.abs(winds - src16[None])
        sums = block_sums(d_abs)
        bias_dy = lambda_bits * jnp.abs(dy - R)
        new_carry = []
        for n, (bc, bx, by, bs) in zip(sizes, carry):
            cost = sums[n] + (bias_dx + bias_dy)[:, None, None]
            a = jnp.argmin(cost, axis=0)                 # [hn, wn] first-min dx
            c = jnp.take_along_axis(cost, a[None], axis=0)[0]
            s = jnp.take_along_axis(sums[n], a[None], axis=0)[0]
            upd = c < bc                                 # strict: first dy wins
            new_carry.append((jnp.where(upd, c, bc),
                              jnp.where(upd, a.astype(jnp.int32) - R, bx),
                              jnp.where(upd, dy - R, by),
                              jnp.where(upd, s, bs)))
        return tuple(new_carry), None

    # derive the init from a traced input so the carry inherits the same
    # varying-axes type under shard_map (pvary/pcast requirement)
    z = (src16[0, 0] * 0).astype(jnp.int32)
    init = tuple((jnp.full((H // n, W // n), 2 ** 30, jnp.int32) + z,
                  jnp.zeros((H // n, W // n), jnp.int32) + z,
                  jnp.zeros((H // n, W // n), jnp.int32) + z,
                  jnp.zeros((H // n, W // n), jnp.int32) + z) for n in sizes)
    final, _ = jax.lax.scan(body, init, jnp.arange(D, dtype=jnp.int32))
    out = {n: (bx.reshape(-1), by.reshape(-1), bs.reshape(-1))
           for n, (bc, bx, by, bs) in zip(sizes, final)}
    return (out, None) if return_surface else out


def _sad_sweep_mxu(ref_plane, src_plane, sizes, R: int, lambda_bits: int,
                   return_surface: bool = False):
    """MXU formulation of the displacement sweep (8-bit planes).

    Per dy scan step the D shifted |ref - src| planes are reduced to
    base-level block sums by TWO matmuls — a [Hb, H] row-summing operand
    and a [W, Wb] column-summing operand — instead of strided reshape-sums
    (which the VPU handles poorly at this shape). All D x D x nblocks cost
    rows are stacked and the winner is picked by ONE argmin after the
    scan: per-step argmin/where chains were the dominant cost of the old
    form (small-op issue overhead on the tunnel backend).

    Exactness: |d| <= 255 < 256 is exact in bf16; the first dot
    accumulates in f32 (exact < 2^24); the second dot runs f32 HIGHEST on
    row sums <= base*255. Tie-break identical to the reference form:
    first (dy, dx) in lexicographic order wins (argmin of the flattened
    [dy, dx] axis returns the first minimum).
    """
    import jax
    import jax.numpy as jnp

    H, W = src_plane.shape
    D = 2 * R + 1
    base = sizes[0]
    Hb, Wb = H // base, W // base
    NB = [(H // n) * (W // n) for n in sizes]
    OFF = np.concatenate([[0], np.cumsum(NB)]).astype(np.int32)
    NBT = int(OFF[-1])

    Sr = np.kron(np.eye(Hb, dtype=np.float32), np.ones((1, base), np.float32))
    Sc = np.kron(np.eye(Wb, dtype=np.float32), np.ones((base, 1), np.float32))
    Sr_j = jnp.asarray(Sr, jnp.bfloat16)
    Sc_j = jnp.asarray(Sc)
    dxs = jnp.arange(D, dtype=jnp.int32)
    ref_pad = jnp.pad(ref_plane, R, mode="edge")

    def body(_, dy):
        rows = jax.lax.dynamic_slice(ref_pad, (dy, 0), (H, W + 2 * R))
        winds = jax.vmap(
            lambda dx: jax.lax.dynamic_slice(rows, (0, dx), (H, W)))(dxs)
        d_abs = (jnp.maximum(winds, src_plane[None])
                 - jnp.minimum(winds, src_plane[None]))
        dT = d_abs.transpose(1, 0, 2).astype(jnp.bfloat16).reshape(H, D * W)
        t = jax.lax.dot(Sr_j, dT, preferred_element_type=jnp.float32)
        s = jax.lax.dot(t.reshape(Hb * D, W), Sc_j,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        s = s.reshape(Hb, D, Wb).astype(jnp.int32)
        parts = []
        prev = base
        for n in sizes:
            if n != base:
                f = n // prev
                s = s.reshape(H // n, f, D, W // n, f).sum(axis=(1, 4))
                prev = n
            parts.append(s.transpose(1, 0, 2).reshape(D, -1))
        return None, jnp.concatenate(parts, axis=1)

    _, ys = jax.lax.scan(body, None, dxs)              # [Ddy, Ddx, NBT]
    bias = lambda_bits * (jnp.abs(dxs - R)[None, :] + jnp.abs(dxs - R)[:, None])
    cost = (ys + bias[:, :, None]).reshape(D * D, NBT)
    best = jnp.argmin(cost, axis=0)
    sad = jnp.take_along_axis(ys.reshape(D * D, NBT), best[None], axis=0)[0]
    bdy = best // D - R
    bdx = best % D - R
    out = {n: (bdx[OFF[i]:OFF[i + 1]], bdy[OFF[i]:OFF[i + 1]],
               sad[OFF[i]:OFF[i + 1]])
           for i, n in enumerate(sizes)}
    if return_surface:
        # per-size views sliced ONCE here: surface_query must not carve a
        # [D^2, NB] copy out of the concatenated tensor per candidate (36
        # queries/frame at 1080p would copy gigabytes)
        ysf = ys.reshape(D * D, NBT)
        surface = {"ys": {n: ysf[:, int(OFF[i]):int(OFF[i + 1])]
                          for i, n in enumerate(sizes)},
                   "R": R}
        return out, surface
    return out


def surface_query(surface, n: int, cx, cy):
    """SAD of every n-block at its per-block integer MV (cx, cy)
    [nblocks] int32, read from the retained sweep cost surface
    (sad_sweep_multi return_surface=True). Out-of-range MVs return
    2^29 so the candidate loses. This is a [nblocks]-element gather —
    the merge-candidate scoring form that replaces per-candidate window
    gathers + SATD (search.cpp:1891 mergeEstimation analog)."""
    import jax
    import jax.numpy as jnp

    R = surface["R"]
    D = 2 * R + 1
    ysn = surface["ys"][n]
    inr = (jnp.abs(cx) <= R) & (jnp.abs(cy) <= R)
    idx = ((jnp.clip(cy, -R, R) + R) * D + (jnp.clip(cx, -R, R) + R))
    sad = jnp.take_along_axis(ysn, idx[None, :], axis=0)[0]
    return jnp.where(inr, sad, jnp.int32(1 << 29))


def sad_at_mv(ref_plane, src_blocks, px, py, mvx, mvy, n: int, xp=np):
    """SAD of each block against the reference at a given integer MV
    (border-clamped) — used to score a handful of extra candidates (e.g.
    the upscaled coarse-HME vector) without a full sweep."""
    H, W = ref_plane.shape
    ar = xp.arange(n)
    rows = xp.clip((py + mvy)[:, None] + ar[None, :], 0, H - 1)
    cols = xp.clip((px + mvx)[:, None] + ar[None, :], 0, W - 1)
    win = xp.take(ref_plane.reshape(-1),
                  rows[:, :, None] * W + cols[:, None, :], axis=0)
    d = xp.abs(win.astype(xp.int32) - src_blocks.astype(xp.int32))
    return xp.sum(d, axis=(-2, -1))


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
