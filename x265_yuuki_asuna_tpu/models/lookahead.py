"""Lookahead: half-res cost estimation, scenecut detection, RC complexity.

Reference behavior studied (not copied): encoder/slicetype.cpp — lowres
pyramid (K16 frameInitLowres), 8x8 lowres ME (estimateCUCost), lowres intra
estimate, scenecut decision (slicetype.cpp:2229). Round-1 subset: no B-frame
trellis / cuTree yet; provides per-frame (intra_cost, inter_cost) and the
scenecut flag, feeding the rate-control complexity model.

TPU design: the whole lookahead for a frame is two batched device passes —
a box-filter downscale and dense 8x8 SATD/ME over all lowres blocks at once
(the reference's batch/coop worker modes collapse into one batch).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import me, pixel


def downscale_half(plane, xp=np):
    """Half-res box filter (reference frameInitLowres semantics)."""
    p = plane.astype(xp.int32)
    h2 = (p.shape[0] // 2) * 2
    w2 = (p.shape[1] // 2) * 2
    p = p[:h2, :w2]
    return xp.right_shift(p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
                          + p[1::2, 1::2] + 2, 2)


class Lookahead:
    """Incremental lookahead over a session's frames (one L0 reference)."""

    def __init__(self, width: int, height: int, bit_depth: int = 8,
                 scenecut_bias: float = 0.4,
                 hist_scenecut: bool = False):
        # histogram-based scene cut (reference bHistBasedSceneCut,
        # encoder.cpp:1613): normalized SAD of consecutive 64-bin luma
        # histograms; cheaper and more robust to global motion than
        # the cost-based rule (which it REPLACES when enabled)
        self.hist_scenecut = hist_scenecut
        self._prev_hist = None
        # lowres geometry, trimmed to whole 8x8 blocks
        self.lw = (width // 2) // 8 * 8
        self.lh = (height // 2) // 8 * 8
        self.bias = scenecut_bias
        self.prev_lowres = None
        self._fn = jax.jit(self._build())

    def _build(self):
        lw, lh = self.lw, self.lh
        nb_x, nb_y = lw // 8, lh // 8
        nblocks = nb_x * nb_y

        def run(y, prev_lowres, has_prev):
            low = downscale_half(y, xp=jnp)[:lh, :lw]
            blocks = (low.reshape(nb_y, 8, nb_x, 8)
                      .transpose(0, 2, 1, 3).reshape(nblocks, 8, 8))
            # lowres intra estimate: SATD against the DC predictor
            dc = jnp.mean(blocks.reshape(nblocks, 64), axis=1,
                          keepdims=True).astype(jnp.int32)
            icost = pixel.satd(blocks, dc[:, :, None] *
                               jnp.ones((1, 8, 8), jnp.int32), xp=jnp)
            # x265-style lowres intra cost includes a small flat bonus; keep raw
            intra_cost = jnp.sum(icost)
            # lowres inter: 8x8 full search +-16 on the previous lowres —
            # the displacement-sweep form (dynamic slices); the per-block
            # gather form is an order of magnitude slower on TPU
            mvx, mvy, sad = me.sad_sweep_multi(prev_lowres, low, (8,), 16,
                                               lambda_bits=1)[8]
            # half-pel refinement (reference lowresMC does full qpel,
            # lowres.h:67): a P-px full-res pan is P/2 at lowres, so
            # integer-only lowres ME misses it by half a pel on smooth
            # content, inflating pcost and firing false scenecuts
            px = (jnp.arange(nblocks, dtype=jnp.int32) % nb_x) * 8
            py = (jnp.arange(nblocks, dtype=jnp.int32) // nb_x) * 8
            ph = jnp.right_shift(
                prev_lowres + jnp.pad(prev_lowres, ((0, 0), (0, 1)),
                                      mode="edge")[:, 1:] + 1, 1)
            pv = jnp.right_shift(
                prev_lowres + jnp.pad(prev_lowres, ((0, 1), (0, 0)),
                                      mode="edge")[1:, :] + 1, 1)
            for pl, dx, dy in ((ph, 0, 0), (ph, -1, 0),
                               (pv, 0, 0), (pv, 0, -1)):
                sad = jnp.minimum(sad, me.sad_at_mv(pl, blocks, px, py,
                                                    mvx + dx, mvy + dy, 8,
                                                    xp=jnp))
            inter_cost = jnp.where(has_prev, jnp.sum(jnp.minimum(sad, icost)),
                                   intra_cost)
            # ONE packed f32 output buffer: a single device->host fetch per
            # push instead of six (each fetch pays a tunnel round trip)
            packed = jnp.concatenate([
                intra_cost.reshape(1).astype(jnp.float32),
                inter_cost.reshape(1).astype(jnp.float32),
                icost.astype(jnp.float32), sad.astype(jnp.float32),
                mvx.astype(jnp.float32), mvy.astype(jnp.float32)])
            return low, packed

        return run

    def _build_pair(self):
        lw, lh = self.lw, self.lh
        nb_x, nb_y = lw // 8, lh // 8
        nblocks = nb_x * nb_y

        def run(cur_low, ref_low):
            blocks = (cur_low.reshape(nb_y, 8, nb_x, 8)
                      .transpose(0, 2, 1, 3).reshape(nblocks, 8, 8))
            dc = jnp.mean(blocks.reshape(nblocks, 64), axis=1,
                          keepdims=True).astype(jnp.int32)
            icost = pixel.satd(blocks, dc[:, :, None] *
                               jnp.ones((1, 8, 8), jnp.int32), xp=jnp)
            _, _, sad = me.sad_sweep_multi(ref_low, cur_low, (8,), 16,
                                           lambda_bits=1)[8]
            return jnp.sum(jnp.minimum(sad, icost))

        return run

    def pair_cost(self, ref_low, cur_low) -> float:
        """Dense lowres ME cost of cur against an arbitrary reference
        (distance-aware b-adapt: the reference's slicetypeAnalyse estimates
        costs between arbitrary frame pairs, slicetype.cpp:3027)."""
        if not hasattr(self, "_fn_pair"):
            self._fn_pair = jax.jit(self._build_pair())
        return float(self._fn_pair(jnp.asarray(cur_low), jnp.asarray(ref_low)))

    def _build_bidir(self):
        lw, lh = self.lw, self.lh
        nb_x, nb_y = lw // 8, lh // 8
        nblocks = nb_x * nb_y

        def run(cur_low, ref0_low, ref1_low):
            blocks = (cur_low.reshape(nb_y, 8, nb_x, 8)
                      .transpose(0, 2, 1, 3).reshape(nblocks, 8, 8))
            dc = jnp.mean(blocks.reshape(nblocks, 64), axis=1,
                          keepdims=True).astype(jnp.int32)
            icost = pixel.satd(blocks, dc[:, :, None] *
                               jnp.ones((1, 8, 8), jnp.int32), xp=jnp)
            _, _, fwd = me.sad_sweep_multi(ref0_low, cur_low, (8,), 16,
                                           lambda_bits=1)[8]
            _, _, bwd = me.sad_sweep_multi(ref1_low, cur_low, (8,), 16,
                                           lambda_bits=1)[8]
            return jnp.sum(jnp.minimum(jnp.minimum(fwd, bwd), icost))

        return run

    def bidir_cost(self, ref0_low, ref1_low, cur_low) -> float:
        """Estimated cost of coding cur as a B between ref0 (past) and ref1
        (future): per-block min(fwd ME, bwd ME, intra) — the (p0, p1, b)
        estimateFrameCost of the reference's b-adapt path search
        (slicetype.cpp:2378 slicetypePath)."""
        if not hasattr(self, "_fn_bidir"):
            self._fn_bidir = jax.jit(self._build_bidir())
        return float(self._fn_bidir(jnp.asarray(cur_low),
                                    jnp.asarray(ref0_low),
                                    jnp.asarray(ref1_low)))

    def _build_badapt(self, K: int):
        """One fused program for the whole b-adapt path search over K
        pending frames (reference slicetypePath trellis, slicetype.cpp:2378):
        path cost of every P placement k = cost(anchor->P at lows[k]) +
        sum_{i<k} bidir cost of lows[i] between (anchor, lows[k]), per-frame
        normalized.  Replaces K + K(K-1)/2 separate pair/bidir dispatches
        (each a tunnel round trip) with ONE dispatch."""
        lw, lh = self.lw, self.lh
        nb_x, nb_y = lw // 8, lh // 8
        nblocks = nb_x * nb_y
        pairs = [(i, k) for k in range(K) for i in range(k)]
        I = np.asarray([p[0] for p in pairs], np.int32)
        Kk = np.asarray([p[1] for p in pairs], np.int32)

        def search(ref, cur):
            _, _, sad = me.sad_sweep_multi(ref, cur, (8,), 16,
                                           lambda_bits=1)[8]
            return sad

        def run(anchor, lows):                    # lows [K, lh, lw]
            blocks = (lows.reshape(K, nb_y, 8, nb_x, 8)
                      .transpose(0, 1, 3, 2, 4).reshape(K, nblocks, 8, 8))
            dc = jnp.mean(blocks.reshape(K, nblocks, 64), axis=2,
                          keepdims=True).astype(jnp.int32)
            icost = pixel.satd(blocks, dc[:, :, :, None] *
                               jnp.ones((1, 1, 8, 8), jnp.int32), xp=jnp)
            # lax.map (sequential, not vmap) keeps the peak memory at ONE
            # sweep while still being a single dispatch
            fwd = jax.lax.map(lambda c: search(anchor, c), lows)
            pair_k = jnp.sum(jnp.minimum(fwd, icost), axis=1)     # [K] int32
            if pairs:
                bwd = jax.lax.map(lambda rc: search(rc[0], rc[1]),
                                  (lows[Kk], lows[I]))            # [P, nb]
                bid = jnp.sum(jnp.minimum(jnp.minimum(fwd[I], bwd),
                                          icost[I]), axis=1)      # [P] int32
                return jnp.concatenate([pair_k, bid])
            return pair_k                 # per-term int sums; combine on host

        return run

    def badapt_path_costs(self, anchor_low, lows) -> np.ndarray:
        """Per-placement normalized path costs [len(lows)] (float64, exact
        parity with the pair_cost/bidir_cost loop)."""
        K = len(lows)
        cache = getattr(self, "_badapt_cache", None)
        if cache is None:
            cache = self._badapt_cache = {}
        if K not in cache:
            cache[K] = jax.jit(self._build_badapt(K))
        raw = np.asarray(cache[K](jnp.asarray(anchor_low),
                                  jnp.stack([jnp.asarray(l)
                                             for l in lows]))).astype(np.int64)
        cost = raw[:K].astype(np.float64)
        p = K
        for k in range(K):
            for _ in range(k):
                cost[k] += float(raw[p])
                p += 1
        return cost / (np.arange(K) + 1.0)

    def push(self, y: np.ndarray):
        """Returns (intra_cost, inter_cost, scenecut) for this frame."""
        prev = self.prev_lowres if self.prev_lowres is not None else \
            jnp.zeros((self.lh, self.lw), jnp.int32)
        has_prev = self.prev_lowres is not None
        low, packed = self._fn(jnp.asarray(y), prev, jnp.bool_(has_prev))
        self.prev_lowres = low
        packed = np.asarray(packed)
        nb = (self.lw // 8) * (self.lh // 8)
        icost, pcost = float(packed[0]), float(packed[1])
        # per-block detail for cuTree propagation (8x8 lowres block ==
        # 16x16 full-res CU): costs + the lowres MVs into the previous frame
        self.last_detail = {
            "icost": packed[2:2 + nb], "sad": packed[2 + nb:2 + 2 * nb],
            "mvx": packed[2 + 2 * nb:2 + 3 * nb].astype(np.int32),
            "mvy": packed[2 + 3 * nb:2 + 4 * nb].astype(np.int32),
            "has_prev": has_prev,
            "nb_x": self.lw // 8, "nb_y": self.lh // 8,
        }
        # scenecut rule (slicetype.cpp:2229 shape; default threshold 40 ->
        # bias 0.4): cut when inter cost stops beating intra by the margin
        scenecut = has_prev and pcost >= (1.0 - self.bias) * icost \
            and icost > 0
        if self.hist_scenecut:
            hist = np.bincount(np.asarray(low).reshape(-1) >> 2,
                               minlength=64)[:64].astype(np.float64)
            hist /= max(hist.sum(), 1.0)
            if self._prev_hist is None:
                scenecut = False
            else:
                sad = float(np.abs(hist - self._prev_hist).sum())
                # reference dupThreshold-style normalized bound: a cut
                # moves a large fraction of the mass between bins
                scenecut = sad > 0.35
            self._prev_hist = hist
        return icost, pcost, bool(scenecut)
