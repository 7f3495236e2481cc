"""K9 — on-device CABAC bit-cost estimation.

The reference drives every RD decision through a counting-mode Entropy
(`entropy.h:196-202` bitsCodeBin) plus precomputed estBitsSbac tables read
by RDOQ (`quant.cpp:610`). The TPU formulation here: model every context as
FROZEN at its slice-QP init state (spec 9.3.2.2) and cost bins with the
analytic entropy of the CABAC state's LPS probability,

    pLPS(sigma) = 0.5 * alpha^sigma,  alpha = (0.01875/0.5)^(1/63)

— the probability model that generated the spec's rangeTabLps (Table 9-46).
Everything becomes static lookup tables + gathers, so a full TU's
residual_coding() cost (last position, coded-sub-block flags, significance
map with exact spec context derivation, greater1/greater2 chains, sign and
Golomb-Rice remainder bits) evaluates as one vectorized pass over a batch
of TUs — the pmode/pme batch axis of SURVEY.md §7.

Approximations vs the reference's exact counting mode (all encoder-side
estimates; conformance is untouched):
  * context states do not adapt within the frame (frozen at init);
  * the Golomb-Rice parameter is tracked through a running-max bound
    instead of the exact per-coefficient threshold chain;
  * the estimate always uses the diagonal scan (MDCS only affects
    intra <=8x8 luma / 4x4 chroma, where the scan changes order but not
    the flag count).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..bitstream import tables as T

CTX = T.CTX_OFFSET

# --------------------------------------------------------------------------
# Per-(packed state, bin) fractional bit cost.
# --------------------------------------------------------------------------

_ALPHA = (0.01875 / 0.5) ** (1.0 / 63.0)


@lru_cache(maxsize=None)
def entropy_bits_table() -> np.ndarray:
    """[128, 2] float32: bits of coding bin b from packed state
    s = (sigma << 1) | MPS."""
    out = np.zeros((128, 2), np.float32)
    for s in range(128):
        sigma, mps = s >> 1, s & 1
        p_lps = 0.5 * (_ALPHA ** sigma)
        b_lps = -np.log2(p_lps)
        b_mps = -np.log2(1.0 - p_lps)
        out[s, mps] = b_mps
        out[s, 1 - mps] = b_lps
    return out


def init_states_dev(slice_type: int, qp, xp=np):
    """Vectorized spec 9.3.2.2 context init: returns packed states
    [NUM_CTX] int32 for a (possibly traced) slice QP scalar."""
    iv = T._INIT_ROWS[slice_type]
    if xp is not np:
        iv = xp.asarray(iv)
    slope = (iv >> 4) * 5 - 45
    offset = ((iv & 15) << 3) - 16
    qpc = xp.clip(qp, 0, 51)
    pre = xp.clip(((slope * qpc) >> 4) + offset, 1, 126)
    return xp.where(pre <= 63, (63 - pre) << 1, ((pre - 64) << 1) | 1)


def ctx_bits(states, ctx_idx, bins, xp=np):
    """bits[...]: cost of coding `bins` (0/1 int array) in contexts
    `ctx_idx` (absolute indices into the state vector)."""
    tab = entropy_bits_table()
    if xp is not np:
        tab = xp.asarray(tab)
    if xp is not np and np.ndim(ctx_idx) == 0:
        # scalar context + array bins: two scalar reads + select (TPU
        # element gathers with large index arrays are very slow)
        s = states[ctx_idx] if isinstance(ctx_idx, (int, np.integer)) \
            else xp.take(states, ctx_idx)
        f = tab.reshape(-1)
        return xp.where(bins > 0, f[s * 2 + 1], f[s * 2])
    s = xp.take(states, ctx_idx)
    return tab[s, bins] if xp is np else xp.take(
        tab.reshape(-1), s * 2 + bins)


def state_bit_luts(states, xp=np):
    """(b0, b1) [NUM_CTX] float32: bits of coding bin 0 / bin 1 in every
    context at the frozen slice-init state (a tiny one-time gather)."""
    tab = entropy_bits_table()
    if xp is not np:
        tab = xp.asarray(tab)
    f = tab.reshape(-1)
    return xp.take(f, states * 2), xp.take(f, states * 2 + 1)


def chain_lookup(vec, idx, K: int, xp=np):
    """vec[K] (possibly traced) indexed by an int array with values in
    [0, K): K-way select chain. TPU element gathers over a small table
    with millions of indices are an order of magnitude slower than these
    fused compares."""
    if xp is np:
        return np.asarray(vec)[idx]
    out = None
    for k in range(K):
        term = xp.where(idx == k, vec[k], 0.0)
        out = term if out is None else out + term
    return out


# --------------------------------------------------------------------------
# Static per-TU-geometry tables (host precomputed, baked as constants).
# --------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _tu_static(log2n: int, is_luma: bool):
    """Static geometry for one TU size: scan maps, per-position context
    bases, last-position prefix tables."""
    n = 1 << log2n
    nn = n * n
    scan = T.scan_order(T.SCAN_DIAG, log2n)          # scan slot -> raster
    ncg_side = max(1, n >> 2)
    ncg = ncg_side * ncg_side
    cg_scan = (T.scan_order_cg(T.SCAN_DIAG, max(0, log2n - 2))
               if ncg > 1 else np.zeros(1, np.int32))  # cg slot -> cg raster

    first_ctx = 0
    if log2n == 3:
        first_ctx = 9
    elif log2n >= 4:
        first_ctx = 21 if is_luma else 12

    # per scan-slot: position-in-CG raster index, in-first-CG flag, raster
    pos_in_cg = np.zeros(nn, np.int32)
    in_first_cg = np.zeros(nn, np.int32)
    is_dc = np.zeros(nn, np.int32)
    for sp in range(nn):
        p = int(scan[sp])
        x, y = p & (n - 1), p >> log2n
        pos_in_cg[sp] = ((y & 3) << 2) | (x & 3)
        in_first_cg[sp] = 1 if (x < 4 and y < 4) else 0
        is_dc[sp] = 1 if p == 0 else 0

    # sig ctx for every (pattern, scan slot): [4, nn]
    sig_ctx = np.zeros((4, nn), np.int32)
    for pat in range(4):
        for sp in range(nn):
            p = int(scan[sp])
            if log2n == 2:
                sig_ctx[pat, sp] = int(T.SIG_CTX_PATTERN[4][pos_in_cg[sp]])
            elif p == 0:
                sig_ctx[pat, sp] = 0
            else:
                cnt = int(T.SIG_CTX_PATTERN[pat][pos_in_cg[sp]])
                sig_ctx[pat, sp] = (cnt + first_ctx
                                    + (3 if (is_luma and not in_first_cg[sp])
                                       else 0))

    # last-position prefix cost templates: for each coordinate value v in
    # [0, n), the list of (ctx delta, bin) pairs is fixed — precompute the
    # per-context-bin incidence so cost(v) = sum_j inc[v, j] *
    # bits(base + j, bin_j). Encode as two matrices: ones[v, ctx_rel] =
    # number of 1-bins in ctx, zeros[v, ctx_rel] likewise for the 0 bin,
    # plus EP suffix length per v.
    max_group = (log2n << 1) - 1
    if is_luma:
        base_rel = 3 * (log2n - 2) + (1 if log2n == 5 else 0)
        shift = (log2n + 1) >> 2
    else:
        base_rel = 15
        shift = log2n - 2
    nctx_rel = 18
    last_ones = np.zeros((n, nctx_rel), np.float32)
    last_zeros = np.zeros((n, nctx_rel), np.float32)
    last_ep = np.zeros(n, np.float32)
    for v in range(n):
        g = int(T.GROUP_IDX[v])
        for i in range(g):
            last_ones[v, base_rel + (i >> shift)] += 1
        if g < max_group:
            last_zeros[v, base_rel + (g >> shift)] += 1
        if g > 3:
            last_ep[v] = (g >> 1) - 1

    cg_y = (cg_scan // max(ncg_side, 1)).astype(np.int32)
    cg_x = (cg_scan % max(ncg_side, 1)).astype(np.int32)
    return dict(n=n, nn=nn, scan=scan, ncg_side=ncg_side, ncg=ncg,
                cg_scan=cg_scan, cg_y=cg_y, cg_x=cg_x, sig_ctx=sig_ctx,
                last_ones=last_ones, last_zeros=last_zeros, last_ep=last_ep)


def _rice_len(code, rice, xp):
    """Golomb-Rice coeff_abs_level_remaining length in bits (entropy.cpp
    writeCoefRemainExGolomb behavior), vectorized; code >= 0."""
    codef = code.astype(xp.float32)
    q = xp.right_shift(code, rice)
    short = q + 1 + rice
    cn = xp.maximum(q - 3, 0)
    length = xp.floor(xp.log2(cn.astype(xp.float32) + 1.0)).astype(xp.int32)
    long_ = (3 + length + 1) + (length + rice)
    return xp.where(q < 3, short, long_).astype(xp.float32) + 0 * codef


def est_tu_bits_ctx(levels, log2n: int, is_luma: bool, states, xp=np,
                    sign_hiding: bool = False):
    """Estimated residual_coding() bits for a batch of TUs.

    levels: int [..., N, N] quantized levels (raster). states: [NUM_CTX]
    packed context states (init_states_dev). Returns float32 [...] bits;
    all-zero TUs cost 0 (cbf flags are costed by the caller)."""
    st = _tu_static(log2n, bool(is_luma))
    n, nn, ncg = st["n"], st["nn"], st["ncg"]
    ncg_side = st["ncg_side"]
    shp = levels.shape[:-2]
    B = int(np.prod(shp)) if shp else 1
    a = xp.abs(levels.reshape((B, nn)).astype(xp.int32))
    scan = st["scan"] if xp is np else xp.asarray(st["scan"])
    a = xp.take(a, scan, axis=-1)                     # [B, nn] scan order
    sig = (a > 0).astype(xp.int32)

    tab = entropy_bits_table()
    sig_ctx_tab = st["sig_ctx"]
    if xp is not np:
        tab = xp.asarray(tab)
        sig_ctx_tab = xp.asarray(sig_ctx_tab)

    # per-context bin-cost vectors at the frozen state (tiny one-time
    # gathers); all per-coefficient lookups below are select chains /
    # small matmuls — NO large-index-array element gathers (TPU-slow)
    b0v, b1v = state_bit_luts(states, xp=xp)

    def bits_at(ctx_abs, binv):
        """ctx_abs, binv broadcastable int arrays -> float bits."""
        s = xp.take(states, ctx_abs)
        return xp.take(tab.reshape(-1), s * 2 + binv)

    pos = xp.arange(nn, dtype=xp.int32)
    lastp = xp.max(xp.where(sig > 0, pos, -1), axis=-1)         # [B]
    any_nz = lastp >= 0
    lastp_c = xp.maximum(lastp, 0)

    # ---- last position prefix/suffix -------------------------------------
    last_raster = xp.take(scan, lastp_c)
    lx = last_raster & (n - 1)
    ly = xp.right_shift(last_raster, log2n)
    # bits(last coord = v) depends only on v (< n): fold the static
    # ones/zeros masks with the context-cost vectors into per-value
    # scalars, then chain-select per block
    lo32 = st["last_ones"].astype(np.float32)      # [n, 18] static
    lz32 = st["last_zeros"].astype(np.float32)
    lep = st["last_ep"].astype(np.float32)         # [n]
    b0x = b0v[CTX["last_x"]:CTX["last_x"] + 18]
    b1x = b1v[CTX["last_x"]:CTX["last_x"] + 18]
    b0y = b0v[CTX["last_y"]:CTX["last_y"] + 18]
    b1y = b1v[CTX["last_y"]:CTX["last_y"] + 18]
    if xp is np:
        valx = lo32 @ b1x + lz32 @ b0x + lep
        valy = lo32 @ b1y + lz32 @ b0y + lep
    else:
        lo_t = xp.asarray(lo32)
        lz_t = xp.asarray(lz32)
        valx = lo_t @ b1x + lz_t @ b0x + xp.asarray(lep)
        valy = lo_t @ b1y + lz_t @ b0y + xp.asarray(lep)
    bits_last = (chain_lookup(valx, lx, n, xp)
                 + chain_lookup(valy, ly, n, xp))

    # ---- CG-level maps ----------------------------------------------------
    acg = a.reshape(B, ncg, 16)
    sigcg = sig.reshape(B, ncg, 16)
    cg_nz = xp.any(acg > 0, axis=-1)                  # [B, ncg] scan order
    cg_idx = xp.arange(ncg, dtype=xp.int32)
    last_cg = xp.right_shift(lastp_c, 4)              # [B]

    # grid flags (cg raster) for right/below lookups
    cg_scan_t = st["cg_scan"] if xp is np else xp.asarray(st["cg_scan"])
    grid = xp.zeros((B, ncg), xp.int32)
    if ncg > 1:
        if xp is np:
            grid[np.arange(B)[:, None], st["cg_scan"][None, :]] = \
                cg_nz.astype(np.int32)
        else:
            grid = grid.at[:, cg_scan_t].set(cg_nz.astype(xp.int32))
        g2 = grid.reshape(B, ncg_side, ncg_side)
        right = xp.pad(g2[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
        below = xp.pad(g2[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
        # back to scan order per CG
        rightf = xp.take(right.reshape(B, ncg), cg_scan_t, axis=-1)
        belowf = xp.take(below.reshape(B, ncg), cg_scan_t, axis=-1)
    else:
        rightf = belowf = xp.zeros((B, 1), xp.int32)
    pattern = rightf + 2 * belowf                     # [B, ncg]

    # ---- coded_sub_block_flag --------------------------------------------
    mid = (cg_idx[None, :] > 0) & (cg_idx[None, :] < last_cg[:, None])
    cbase = CTX["sig_cg"] + (0 if is_luma else 2)
    rb = (rightf | belowf)
    csbf_cost = xp.where(cg_nz,
                         xp.where(rb > 0, b1v[cbase + 1], b1v[cbase]),
                         xp.where(rb > 0, b0v[cbase + 1], b0v[cbase]))
    bits_csbf = xp.sum(xp.where(mid, csbf_cost, 0.0), axis=-1)

    # ---- significance map -------------------------------------------------
    # coded positions: sp < lastp AND the CG is coded (implicit CG0/lastCG
    # or signalled nonzero), minus the inferred-DC case.
    k_in_cg = pos & 15
    cg_coded = (cg_nz | (cg_idx[None, :] == 0)
                | (cg_idx[None, :] == last_cg[:, None]))
    # scan positions fill CGs contiguously (pos >> 4 == cg scan index), so
    # per-position CG attributes are static 16x repeats — NOT gathers
    rep16 = lambda a: xp.repeat(a, 16, axis=-1)       # [B, ncg] -> [B, nn]
    sig_coded = ((pos[None, :] < lastp[:, None])
                 & (rep16(cg_coded.astype(xp.int32)) > 0))
    # inferSbDcSigCoeffFlag: DC of a signalled middle CG whose other 15
    # positions are all zero is not coded
    others_nz = (sigcg[:, :, 1:].sum(-1) > 0)
    infer_dc = (mid & cg_nz & ~others_nz)
    sig_coded = sig_coded & ~((k_in_cg[None, :] == 0)
                              & (rep16(infer_dc.astype(xp.int32)) > 0))

    pat_pos = rep16(pattern)                          # [B, nn], values 0..3
    # sig ctx per position: select the pattern row of the static table
    sct = sig_ctx_tab if xp is np else sig_ctx_tab
    ctx_rel = None
    for p4 in range(4):
        term = xp.where(pat_pos == p4, sct[p4][None, :], 0)
        ctx_rel = term if ctx_rel is None else ctx_rel + term
    sig_bank = CTX["sig"] + (0 if is_luma else 27)
    nsigc = 27 if is_luma else 15
    sig_cost = xp.where(
        sig > 0, chain_lookup(b1v[sig_bank:sig_bank + nsigc], ctx_rel,
                              nsigc, xp),
        chain_lookup(b0v[sig_bank:sig_bank + nsigc], ctx_rel, nsigc, xp))
    bits_sig = xp.sum(xp.where(sig_coded, sig_cost, 0.0), axis=-1)

    # ---- level flags (greater1 / greater2), reverse scan per CG ----------
    arev = acg[:, :, ::-1]                            # [B, ncg, 16]
    srev = (arev > 0).astype(xp.int32)
    rank = xp.cumsum(srev, axis=-1) - srev            # significant rank
    g1_coded = (srev > 0) & (rank < 8)
    g1val = (arev > 1).astype(xp.int32)
    prev_gt1 = xp.cumsum(g1val * g1_coded, axis=-1) - g1val * g1_coded
    c1 = xp.where(prev_gt1 > 0, 0, xp.minimum(1 + rank, 3))

    # ctx_set: depends on (cg > 0, luma) and whether the previously-coded
    # CG ended with c1 == 0 (i.e. it contained a >1 coeff among its first
    # 8 significants). Carry that flag down the CG scan with a short
    # unrolled chain (ncg <= 64).
    had_gt1 = xp.any(g1val * g1_coded > 0, axis=-1)   # [B, ncg]
    if xp is np or ncg <= 4:
        prev_flag = xp.zeros((B,), xp.int32)
        prev_cols = []
        for j in range(ncg - 1, -1, -1):
            prev_cols.append(prev_flag)
            sel = cg_nz[:, j]
            prev_flag = xp.where(sel, had_gt1[:, j].astype(xp.int32),
                                 prev_flag)
        prev_gt1_cg = xp.stack(prev_cols[::-1], axis=-1)  # [B, ncg]
    else:
        # "last had_gt1 among later coded CGs" = associative selection scan
        # over the reversed CG axis (keeps the traced graph O(log ncg)
        # instead of an ncg-step unrolled chain — XLA compile size)
        import jax
        vals = xp.where(cg_nz[:, ::-1], had_gt1[:, ::-1].astype(xp.int32),
                        -1)

        def comb(a, b):
            return xp.where(b >= 0, b, a)

        run = jax.lax.associative_scan(comb, vals, axis=-1)
        # exclusive: shift right by one (no "later CG" for the last CG)
        run = xp.concatenate(
            [xp.full((B, 1), -1, xp.int32), run[:, :-1]], axis=-1)
        prev_gt1_cg = xp.maximum(run, 0)[:, ::-1]
    ctx_set = ((2 if is_luma else 0) * (cg_idx[None, :] > 0).astype(xp.int32)
               + xp.where(prev_gt1_cg > 0, 0, 1))
    one_bank = CTX["one"] + (0 if is_luma else 16)
    abs_bank = CTX["abs"] + (0 if is_luma else 4)
    ng1 = 16 if is_luma else 8
    g1_rel = 4 * ctx_set[..., None] + c1               # [B, ncg, 16]
    g1_cost = xp.where(
        g1val > 0, chain_lookup(b1v[one_bank:one_bank + ng1], g1_rel,
                                ng1, xp),
        chain_lookup(b0v[one_bank:one_bank + ng1], g1_rel, ng1, xp))
    bits_g1 = xp.sum(xp.where(g1_coded, g1_cost, 0.0), axis=(-2, -1))

    first_c2 = (g1_coded & (g1val > 0) & (prev_gt1 == 0))
    g2val = (arev > 2).astype(xp.int32)
    ng2 = 4 if is_luma else 2
    g2_rel = xp.broadcast_to(ctx_set[..., None], g2val.shape)
    g2_cost = xp.where(
        g2val > 0, chain_lookup(b1v[abs_bank:abs_bank + ng2], g2_rel,
                                ng2, xp),
        chain_lookup(b0v[abs_bank:abs_bank + ng2], g2_rel, ng2, xp))
    bits_g2 = xp.sum(xp.where(first_c2, g2_cost, 0.0), axis=(-2, -1))

    # ---- signs ------------------------------------------------------------
    nsig_cg = srev.sum(-1)
    if sign_hiding:
        posk = xp.arange(16, dtype=xp.int32)
        firstk = xp.min(xp.where(sigcg > 0, posk, 99), axis=-1)
        lastk = xp.max(xp.where(sigcg > 0, posk, -1), axis=-1)
        hide = ((lastk - firstk) >= 4).astype(xp.int32)
        bits_sign = xp.sum(xp.maximum(nsig_cg - hide, 0), axis=-1)
    else:
        bits_sign = xp.sum(nsig_cg, axis=-1)
    bits_sign = bits_sign.astype(xp.float32)

    # ---- remaining levels (Golomb-Rice, running-max rice bound) ----------
    base_level = xp.where(rank >= 8, 1,
                          xp.where(first_c2, 3, 2)) * srev
    rem_coded = (srev > 0) & (arev >= base_level) & (base_level > 0)
    # rice after k doublings covers threshold 3<<k; bound the chain with the
    # running max of PREVIOUS coded remainders in the CG
    prevmax = xp.concatenate([
        xp.zeros((B, ncg, 1), xp.int32),
        xp.where(srev > 0, arev, 0)[..., :-1]], axis=-1)
    runmax = xp.cumsum(0 * prevmax, axis=-1)   # placeholder for cummax
    if xp is np:
        runmax = np.maximum.accumulate(prevmax, axis=-1)
    else:
        import jax
        runmax = jax.lax.associative_scan(
            lambda x, y: xp.maximum(x, y), prevmax, axis=-1)
    rice = xp.clip(
        xp.floor(xp.log2(xp.maximum(runmax, 1).astype(xp.float32) / 3.0)
                 ).astype(xp.int32) + 1, 0, 4)
    rem = xp.maximum(arev - base_level, 0)
    bits_rem = xp.sum(
        xp.where(rem_coded, _rice_len(rem, rice, xp), 0.0), axis=(-2, -1))

    total = (bits_last + bits_csbf + bits_sig + bits_g1 + bits_g2
             + bits_sign + bits_rem)
    total = xp.where(any_nz, total, 0.0)
    return total.reshape(shp) if shp else total[0]


# --------------------------------------------------------------------------
# Small syntax-element costs for mode decision (flags, mvd, merge idx).
# --------------------------------------------------------------------------


def flag_bits(states, name: str, binv, offset: int = 0, xp=np):
    """Cost of one context-coded flag by context name."""
    return ctx_bits(states, CTX[name] + offset, binv, xp=xp)


def mvd_bits(mvd, states, xp=np):
    """abs_mvd bits for one component (spec 7.3.8.9): greater0 +
    greater1 flags (ctx) + EG1 remainder + sign (EP)."""
    a = xp.abs(mvd).astype(xp.int32)
    b0 = ctx_bits(states, CTX["mvd"] + 0, (a > 0).astype(xp.int32), xp=xp)
    b1 = xp.where(a > 0,
                  ctx_bits(states, CTX["mvd"] + 1, (a > 1).astype(xp.int32),
                           xp=xp), 0.0)
    # EG1 of (a - 2) for a > 1: length = 2*floor(log2(v/2 + 1)) + 1 + 1
    v = xp.maximum(a - 2, 0).astype(xp.float32)
    k = xp.floor(xp.log2(v / 2.0 + 1.0))
    eg1 = xp.where(a > 1, 2.0 * k + 2.0, 0.0)
    sign = xp.where(a > 0, 1.0, 0.0)
    return b0 + b1 + eg1 + sign


def merge_idx_bits(idx, max_merge: int, states, xp=np):
    """merge_idx: first bin ctx-coded, rest EP truncated-unary."""
    first = ctx_bits(states, CTX["merge_idx"],
                     (idx > 0).astype(xp.int32), xp=xp)
    rest = xp.minimum(xp.maximum(idx, 0),
                      max_merge - 1).astype(xp.float32)
    rest = xp.where(idx > 0, rest - 1.0
                    + xp.where(idx < max_merge - 1, 1.0, 0.0), 0.0)
    return first + rest
