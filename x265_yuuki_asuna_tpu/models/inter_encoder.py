"""P-frame encoder: parallel ME/MC phase + wavefront decision/recon phase.

TPU design (SURVEY.md §7): inter prediction depends only on the reference
picture, so motion search and motion compensation for EVERY CU run as one
dense parallel batch (no wavefront). Only the per-CU intra-vs-inter decision
and recon keep the diagonal scan (intra prediction needs neighbor recon).

Round-1 scope: uniform 2Nx2N CU grid, one L0 reference, integer-pel MVs
(subpel refinement later; signaled MVs are quarter-pel multiples of 4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import intra, interp, me, pixel, quant, transforms
from ..utils.geometry import wavefront_schedule
from .intra_encoder import chroma_qp_from_luma, CHROMA_QP_TABLE


@dataclass(frozen=True)
class InterFrameConfig:
    width: int
    height: int
    cu_size: int = 16
    qp: int = 32
    bit_depth: int = 8
    search_range: int = 16
    subpel: bool = True     # half+quarter-pel refinement (SATD-driven)
    intra_bias: int = 0     # added to intra SATD before comparison
    bi: bool = False        # B-frame mode: two references + bi-prediction
    rdoq: bool = False      # RD-optimized quantization
    sbh: bool = False       # sign-bit hiding
    weightp: bool = False   # explicit weighted uni-prediction (P slices)
    analysis_load: bool = False   # reuse saved MVs: skip full search,
                                  # subpel-refine around the hint only
    max_depth: int = 0            # 1: CTU32 may split into 4 16x16 CUs
                                  # (in-scan RD quadtree; P slices)
    psy_rd: float = 0.0           # psycho-visual RD strength (--psy-rd)
    psy_rdoq: float = 0.0         # psy-RDOQ energy bias (--psy-rdoq)
    hme: bool = False             # hierarchical ME: half-res coarse search
    hme_range: int = 16           # coarse range (half-res pels); effective
                                  # full-res reach = 2*hme_range + search_range
    n_refs: int = 1               # L0 references (2: multi-ref P, the
                                  # reference's --ref / pme ref axis —
                                  # uniform-grid path, round 3)
    rqt: bool = False             # residual TU quadtree (round 3): inter
                                  # 32x32 leaf CUs may split their TU into
                                  # 4x 16x16 (estimateResidualQT analog,
                                  # search.cpp:3178) — quadtree path only
    intra_in_b: bool = True       # evaluate intra candidates in B slices
                                  # (reference bIntraInBFrames — OFF at
                                  # medium and faster presets, cli.rst
                                  # --b-intra). False removes the whole
                                  # sequential commit scan from the B
                                  # program: inter leaves commit densely.
    dpb: bool = False             # device-resident DPB (round 4): the
                                  # program returns recon as separate
                                  # device outputs (never downloaded into
                                  # the decision buffer) and runs the
                                  # normative loop filters in-jit
                                  # (framefilter.cpp:564 analog)
    deblock: bool = False         # with dpb: in-jit deblocking filter
    sao: bool = False             # with dpb: in-jit SAO stats+decide+apply

    @property
    def rows(self):
        return self.height // self.cu_size

    @property
    def cols(self):
        return self.width // self.cu_size

    @property
    def log2_cu(self):
        return self.cu_size.bit_length() - 1


class InterFrameEncoder:
    def __init__(self, cfg: InterFrameConfig):
        self.cfg = cfg
        if cfg.max_depth:
            assert cfg.cu_size == 32 and not cfg.analysis_load, \
                "inter quadtree: CTU32; no analysis reuse (v1)"
            assert not (cfg.weightp and cfg.bi), "weightp is P-only"
        if cfg.dpb:
            assert cfg.max_depth, "device DPB: quadtree path (v1)"
        nd, ns, rc, valid = wavefront_schedule(cfg.rows, cfg.cols, slope=2)
        self.num_diags = nd
        self.num_slots = ns
        self._rc = jnp.asarray(rc)
        self._valid = jnp.asarray(valid)
        self._encode = jax.jit(self._build_qt() if cfg.max_depth
                               else self._build())
        self._full_qt = None    # lazy int16-levels variant (overflow)

    def encode_frame(self, y, u, v, ref_y, ref_u, ref_v, qp: int = None,
                     ref1_y=None, ref1_u=None, ref1_v=None,
                     weights=None, hint_mvx=None, hint_mvy=None,
                     slice_qp=None):
        """All planes padded to coded size. ref_* are the decoded reference
        planes (L0; ref1_* = L1 when cfg.bi). weights (cfg.weightp): dict
        {'luma': (w, o)|None, 'cb': ..., 'cr': ...}, denom 6; None entries
        use the identity weight. Returns decision dict (numpy).

        cfg.dpb: ref planes may be device arrays (no transfer); the result
        carries "recon_dev" (filtered device planes, the next frame's
        reference) and "sao_dev" instead of host recon."""
        return self.finish_frame(self.submit_frame(
            y, u, v, ref_y, ref_u, ref_v, qp, ref1_y, ref1_u, ref1_v,
            weights, hint_mvx, hint_mvy, slice_qp))

    def submit_frame(self, y, u, v, ref_y, ref_u, ref_v, qp: int = None,
                     ref1_y=None, ref1_u=None, ref1_v=None,
                     weights=None, hint_mvx=None, hint_mvy=None,
                     slice_qp=None):
        """Dispatch the device program WITHOUT fetching the decision
        buffer; returns an opaque handle for finish_frame. Dispatch is
        async on the tunnel backend, so a mini-GOP of B frames can be
        submitted back-to-back and the k-th frame's decision fetch
        overlaps the (k+1)-th frame's device compute (the reference's
        frame-threads overlap, frameencoder.cpp:429, as queue
        pipelining)."""
        qp = self.cfg.qp if qp is None else qp
        pdt = jnp.uint16 if self.cfg.bit_depth > 8 else jnp.uint8
        a = lambda x: jnp.asarray(x, pdt)
        if self.cfg.bi or self.cfg.n_refs > 1:
            args = (a(y), a(u), a(v), a(ref_y), a(ref_u), a(ref_v),
                    a(ref1_y), a(ref1_u), a(ref1_v),
                    jnp.asarray(qp, jnp.int32))
        elif self.cfg.weightp:
            weights = weights or {}
            wargs = []
            for comp in ("luma", "cb", "cr"):
                w, o = weights.get(comp) or (64, 0)
                wargs += [jnp.int32(w), jnp.int32(o)]
            args = (a(y), a(u), a(v), a(ref_y), a(ref_u), a(ref_v),
                    jnp.asarray(qp, jnp.int32), *wargs)
        elif self.cfg.analysis_load:
            args = (a(y), a(u), a(v), a(ref_y), a(ref_u), a(ref_v),
                    jnp.asarray(qp, jnp.int32),
                    jnp.asarray(hint_mvx, jnp.int32),
                    jnp.asarray(hint_mvy, jnp.int32))
        else:
            args = (a(y), a(u), a(v), a(ref_y), a(ref_u), a(ref_v),
                    jnp.asarray(qp, jnp.int32))
        if self.cfg.dpb:
            sq = qp if slice_qp is None else slice_qp
            sq = int(np.max(sq)) if np.ndim(sq) else int(sq)
            args = args + (jnp.asarray(sq, jnp.int32),)
        return (args, self._encode(*args))

    def finish_frame(self, handle):
        """Fetch + unpack a submit_frame dispatch (blocks on the
        decision-buffer transfer)."""
        args, outs = handle
        self._last_args = args
        if self.cfg.dpb:
            buf = np.asarray(outs[0])
            if buf[-1]:
                if self._full_qt is None:
                    self._full_qt = jax.jit(self._build_qt(compact=False))
                outs = self._full_qt(*self._last_args)
                buf = np.asarray(outs[0])
                out = self._unpack_qt(buf, compact=False)
            else:
                out = self._unpack_qt(buf)
            out["recon_dev"] = outs[1:4]
            out["sao_dev"] = outs[4] if self.cfg.sao else None
            return out
        buf = np.asarray(outs)
        if not self.cfg.max_depth:
            if buf[-1]:
                if self._full_qt is None:
                    self._full_qt = jax.jit(self._build(compact=False))
                buf = np.asarray(self._full_qt(*self._last_args))
                return self._unpack(buf, compact=False)
            return self._unpack(buf)
        if buf[-1]:
            # a level exceeded int8: rerun through the exact int16
            # variant (lazily compiled; rare at production QPs)
            if self._full_qt is None:
                self._full_qt = jax.jit(self._build_qt(compact=False))
            buf = np.asarray(self._full_qt(*self._last_args))
            return self._unpack_qt(buf, compact=False)
        return self._unpack_qt(buf)

    # ------------------------------------------------------------------
    def _build(self, compact: bool = True):
        cfg = self.cfg
        n = cfg.cu_size
        nc = n // 2
        log2n = cfg.log2_cu
        rows, cols = cfg.rows, cfg.cols
        W, H = cfg.width, cfg.height
        bd = cfg.bit_depth
        maxv = (1 << bd) - 1
        ncu = rows * cols
        R = cfg.search_range
        rc_all, valid_all = self._rc, self._valid
        S = self.num_slots
        fill = 1 << (bd - 1)

        def to_blocks(plane, nn):
            hh, ww = plane.shape
            return (plane.reshape(hh // nn, nn, ww // nn, nn)
                    .transpose(0, 2, 1, 3).reshape(ncu, nn, nn))

        def from_blocks(blocks, nn, hh, ww):
            return (blocks.reshape(hh // nn, ww // nn, nn, nn)
                    .transpose(0, 2, 1, 3).reshape(hh, ww))

        # ---------- phase A: dense ME + MC over all CUs -------------------
        grid_r0 = np.arange(ncu, dtype=np.int32) // cols
        grid_c0 = np.arange(ncu, dtype=np.int32) % cols
        PX = jnp.asarray(grid_c0 * n)
        PY = jnp.asarray(grid_r0 * n)

        def search_ref(yb32, ref_y, hint=None):
            """Full search + subpel refinement against one reference.
            Returns quarter-pel (mvx, mvy). With a hint (analysis reuse),
            the full search is skipped and refinement starts at the hint."""
            px, py = PX, PY
            if hint is not None:
                mvx, mvy = hint
            else:
                mvx_i, mvy_i, _ = me.full_search_sad(
                    ref_y, yb32, px, py, n, R, lambda_bits=2, xp=jnp)
                mvx = mvx_i * 4     # quarter-pel units
                mvy = mvy_i * 4

            def eval_mv(mx, my):
                p = interp.mc_luma_qpel(ref_y, px, py, mx, my, n, bd, xp=jnp)
                return pixel.satd(yb32, p, xp=jnp)

            if cfg.subpel:
                # half-pel then quarter-pel refinement, 8 neighbors each
                # (reference: motion.cpp subpel iterations, SATD-costed)
                best = eval_mv(mvx, mvy)
                for stepq in (2, 1):
                    cand_best = best
                    bx, by = mvx, mvy
                    for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1),
                                   (-1, -1), (1, -1), (-1, 1), (1, 1)):
                        mx = mvx + dx * stepq
                        my = mvy + dy * stepq
                        c = eval_mv(mx, my)
                        better = c < cand_best
                        bx = jnp.where(better, mx, bx)
                        by = jnp.where(better, my, by)
                        cand_best = jnp.minimum(c, cand_best)
                    mvx, mvy, best = bx, by, cand_best
            return mvx, mvy

        def uni_pred(refs, mvx, mvy):
            ref_y, ref_u, ref_v = refs
            pred_y = interp.mc_luma_qpel(ref_y, PX, PY, mvx, mvy, n, bd, xp=jnp)
            # chroma: quarter-luma-pel MV = eighth-chroma-pel
            pxc, pyc = PX // 2, PY // 2
            pred_u = interp.mc_chroma_qpel(ref_u, pxc, pyc, mvx, mvy,
                                           nc, bd, xp=jnp)
            pred_v = interp.mc_chroma_qpel(ref_v, pxc, pyc, mvx, mvy,
                                           nc, bd, xp=jnp)
            return pred_y, pred_u, pred_v

        def motion_phase(src_y, ref_y, ref_u, ref_v, wts=None, hint=None):
            yb32 = to_blocks(src_y, n)
            if wts is None:
                mvx, mvy = search_ref(yb32, ref_y, hint)
                pred_y, pred_u, pred_v = uni_pred((ref_y, ref_u, ref_v),
                                                  mvx, mvy)
            else:
                # ME over the weight-transformed reference (search guidance),
                # final prediction through the normative MC->weight pipeline
                (wy, oy), (wcb, ocb), (wcr, ocr) = wts
                ref_w = jnp.clip(jnp.right_shift(ref_y * wy + 32, 6) + oy,
                                 0, maxv)
                mvx, mvy = search_ref(yb32, ref_w)
                pxc, pyc = PX // 2, PY // 2
                pred_y = interp.weight_uni(
                    interp.mc_luma_qpel_ps(ref_y, PX, PY, mvx, mvy, n, bd,
                                           xp=jnp), wy, oy, 6, bd, xp=jnp)
                pred_u = interp.weight_uni(
                    interp.mc_chroma_qpel_ps(ref_u, pxc, pyc, mvx, mvy, nc,
                                             bd, xp=jnp), wcb, ocb, 6, bd,
                    xp=jnp)
                pred_v = interp.weight_uni(
                    interp.mc_chroma_qpel_ps(ref_v, pxc, pyc, mvx, mvy, nc,
                                             bd, xp=jnp), wcr, ocr, 6, bd,
                    xp=jnp)
            inter_satd = pixel.satd(yb32, pred_y, xp=jnp)
            return mvx, mvy, pred_y, pred_u, pred_v, inter_satd

        def motion_phase_2ref(src_y, refs0, refs1, qp):
            """Multi-ref P (reference --ref N / pme ref axis,
            search.cpp:2181 per-(list,ref) searches): full search + subpel
            against BOTH L0 references; per-CU selection by SATD +
            lambda * (mvd bits + ref_idx bit). Returns (ref_sel, mvx, mvy,
            pred3, satd)."""
            yb32 = to_blocks(src_y, n)
            mv0x, mv0y = search_ref(yb32, refs0[0])
            mv1x, mv1y = search_ref(yb32, refs1[0])
            p0 = uni_pred(refs0, mv0x, mv0y)
            p1 = uni_pred(refs1, mv1x, mv1y)
            s0 = pixel.satd(yb32, p0[0], xp=jnp)
            s1 = pixel.satd(yb32, p1[0], xp=jnp)
            lam = 0.9 * jnp.exp2((qp.astype(jnp.float32) - 12.0) / 6.0)

            def mvbits(mx, my):
                return (4.0 + 2.0 * jnp.log2(1.0 + jnp.abs(mx).astype(jnp.float32))
                        + 2.0 * jnp.log2(1.0 + jnp.abs(my).astype(jnp.float32)))

            c0 = s0 + lam * (mvbits(mv0x, mv0y) + 1.0)
            c1 = s1 + lam * (mvbits(mv1x, mv1y) + 1.0)
            sel = (c1 < c0).astype(jnp.int32)            # ties keep ref 0
            pick = lambda a, b: jnp.where(sel[:, None, None] == 1, b, a)
            pred_y = pick(p0[0], p1[0])
            pred_u = pick(p0[1], p1[1])
            pred_v = pick(p0[2], p1[2])
            mvx = jnp.where(sel == 1, mv1x, mv0x)
            mvy = jnp.where(sel == 1, mv1y, mv0y)
            satd = jnp.where(sel == 1, s1, s0)
            return sel, mvx, mvy, pred_y, pred_u, pred_v, satd

        def motion_phase_b(src_y, refs0, refs1, qp):
            """Two-list ME + uni/uni/bi decision. Bi prediction uses the
            short-domain pipeline (mc_*_qpel_ps + add_avg) exactly as the
            decoder will reconstruct it. Selection cost = SATD + lambda *
            estimated signaling bits (the reference's satdCost + mvcost,
            search.cpp predInterSearch): without the rate term the SATD
            argmin over-picks bi (noise averaging) and pays two MVDs."""
            yb32 = to_blocks(src_y, n)
            mv0x, mv0y = search_ref(yb32, refs0[0])
            mv1x, mv1y = search_ref(yb32, refs1[0])
            p0 = uni_pred(refs0, mv0x, mv0y)
            p1 = uni_pred(refs1, mv1x, mv1y)
            pxc, pyc = PX // 2, PY // 2

            def ps_pred(refs, mvx, mvy):
                return (interp.mc_luma_qpel_ps(refs[0], PX, PY, mvx, mvy, n,
                                               bd, xp=jnp),
                        interp.mc_chroma_qpel_ps(refs[1], pxc, pyc, mvx, mvy,
                                                 nc, bd, xp=jnp),
                        interp.mc_chroma_qpel_ps(refs[2], pxc, pyc, mvx, mvy,
                                                 nc, bd, xp=jnp))

            ps0 = ps_pred(refs0, mv0x, mv0y)
            ps1 = ps_pred(refs1, mv1x, mv1y)
            pbi = tuple(interp.add_avg(a, b, bd, xp=jnp)
                        for a, b in zip(ps0, ps1))
            s0 = pixel.satd(yb32, p0[0], xp=jnp)
            s1 = pixel.satd(yb32, p1[0], xp=jnp)
            sbi = pixel.satd(yb32, pbi[0], xp=jnp)
            lam = 0.9 * jnp.exp2((qp.astype(jnp.float32) - 12.0) / 6.0)

            def mvbits(mx, my):
                return (4.0 + 2.0 * jnp.log2(1.0 + jnp.abs(mx).astype(jnp.float32))
                        + 2.0 * jnp.log2(1.0 + jnp.abs(my).astype(jnp.float32)))

            b0 = mvbits(mv0x, mv0y)
            b1 = mvbits(mv1x, mv1y)
            # order [L0, L1, BI]: argmin picks the first minimum, so ties
            # favor cheaper-to-signal uni-prediction
            costs = jnp.stack([s0 + lam * b0, s1 + lam * (b1 + 1.0),
                               sbi + lam * (b0 + b1 + 2.0)], axis=1)
            sel = jnp.argmin(costs, axis=1).astype(jnp.int32)   # 0/1/2
            pdir = jnp.where(sel == 2, 3, sel + 1)              # 1/2/3

            def pick(a, b, c):
                s = sel[:, None, None]
                return jnp.where(s == 0, a, jnp.where(s == 1, b, c))

            pred_y = pick(p0[0], p1[0], pbi[0])
            pred_u = pick(p0[1], p1[1], pbi[1])
            pred_v = pick(p0[2], p1[2], pbi[2])
            inter_satd = jnp.min(costs, axis=1)
            return (pdir, mv0x, mv0y, mv1x, mv1y,
                    pred_y, pred_u, pred_v, inter_satd)

        # ---------- phase B: wavefront decision + recon -------------------
        def build_v(botrow, rightcol, cu, nn, avail):
            avail_l, avail_t, avail_tr, avail_tl = avail
            pad = ncu
            left_cu = jnp.where(avail_l, cu - 1, pad)
            top_cu = jnp.where(avail_t, cu - cols, pad)
            tr_cu = jnp.where(avail_tr, cu - cols + 1, pad)
            tl_cu = jnp.where(avail_tl, cu - cols - 1, pad)
            left = jnp.take(rightcol, left_cu, axis=0)
            top = jnp.take(botrow, top_cu, axis=0)
            topright = jnp.take(botrow, tr_cu, axis=0)
            corner = jnp.take(botrow, tl_cu, axis=0)[:, nn - 1]
            below_left = jnp.broadcast_to(left[:, nn - 1:nn], (S, nn))
            v = jnp.concatenate([below_left, left[:, ::-1], corner[:, None],
                                 top, topright], axis=1)
            ones = jnp.ones((S, nn), dtype=bool)
            av = jnp.concatenate([
                jnp.zeros((S, nn), dtype=bool), ones * avail_l[:, None],
                avail_tl[:, None], ones * avail_t[:, None],
                ones * avail_tr[:, None]], axis=1)
            return v, av

        def tq(resid, qp, log2nn, luma=True):
            coef = transforms.forward_transform(resid, bd, xp=jnp)
            if cfg.rdoq:
                levels = quant.quant_rdoq(
                    coef, qp, log2nn, bd,
                    psy_scale=cfg.psy_rdoq if luma else 0.0, xp=jnp)
            else:
                levels, du = quant.quant(coef, qp, log2nn, bd, False, xp=jnp)
                if cfg.sbh:
                    levels = quant.sign_bit_hiding(levels, du, log2nn, xp=jnp)
            dq = quant.dequant(levels, qp, log2nn, bd, xp=jnp)
            rr = transforms.inverse_transform(dq, bd, xp=jnp)
            return levels, rr

        def make_step(srcs, preds, inter_satd, qp_y_pad, qp_c_pad):
            src_yb, src_ub, src_vb = srcs
            pred_yb, pred_ub, pred_vb = preds

            def step(carry, xs):
                (bry, rcy, bru, rcu_, brv, rcv) = carry
                rc, valid = xs
                r, c = rc[:, 0], rc[:, 1]
                cu = r * cols + c
                cu_s = jnp.where(valid, cu, ncu)
                avail = ((c > 0) & valid, (r > 0) & valid,
                         ((r > 0) & (c < cols - 1)) & valid,
                         ((r > 0) & (c > 0)) & valid)
                src_y = jnp.take(src_yb, cu_s, axis=0)
                src_u = jnp.take(src_ub, cu_s, axis=0)
                src_v = jnp.take(src_vb, cu_s, axis=0)
                ip_y = jnp.take(pred_yb, cu_s, axis=0)
                ip_u = jnp.take(pred_ub, cu_s, axis=0)
                ip_v = jnp.take(pred_vb, cu_s, axis=0)
                isatd = jnp.take(inter_satd, cu_s, axis=0)

                # intra candidate
                v_raw, av = build_v(bry, rcy, cu, n, avail)
                vv = intra.substitute_references(v_raw, av, bd, xp=jnp)
                preds35 = intra.predict_all_modes_matmul(vv, n, bd, luma=True,
                                                         xp=jnp)
                icosts = pixel.satd(src_y[:, None].astype(jnp.int32), preds35,
                                    xp=jnp)
                imode = jnp.argmin(icosts, axis=1).astype(jnp.int32)
                ibest = jnp.min(icosts, axis=1)
                ipred_y = jnp.take_along_axis(
                    preds35, imode[:, None, None, None], axis=1)[:, 0]

                use_intra = (ibest + cfg.intra_bias) < isatd

                # chroma intra prediction with DM mode
                v_raw_u, av_u = build_v(bru, rcu_, cu, nc, avail)
                vv_u = intra.substitute_references(v_raw_u, av_u, bd, xp=jnp)
                p35u = intra.predict_all_modes_matmul(vv_u, nc, bd, luma=False,
                                                      xp=jnp)
                ipred_u = jnp.take_along_axis(
                    p35u, imode[:, None, None, None], axis=1)[:, 0]
                v_raw_v, av_v = build_v(brv, rcv, cu, nc, avail)
                vv_v = intra.substitute_references(v_raw_v, av_v, bd, xp=jnp)
                p35v = intra.predict_all_modes_matmul(vv_v, nc, bd, luma=False,
                                                      xp=jnp)
                ipred_v = jnp.take_along_axis(
                    p35v, imode[:, None, None, None], axis=1)[:, 0]

                sel = use_intra[:, None, None]
                pred_y = jnp.where(sel, ipred_y, ip_y)
                pred_u = jnp.where(sel, ipred_u, ip_u)
                pred_v = jnp.where(sel, ipred_v, ip_v)

                qp_y = jnp.take(qp_y_pad, cu_s)       # [S] per-slot QP
                qp_c = jnp.take(qp_c_pad, cu_s)
                lv_y, rr_y = tq(src_y.astype(jnp.int32) - pred_y, qp_y, log2n)
                lv_cb, rr_u = tq(src_u.astype(jnp.int32) - pred_u, qp_c,
                                 log2n - 1, luma=False)
                lv_cr, rr_v = tq(src_v.astype(jnp.int32) - pred_v, qp_c,
                                 log2n - 1, luma=False)
                rec_y = jnp.clip(pred_y + rr_y, 0, maxv)
                rec_u = jnp.clip(pred_u + rr_u, 0, maxv)
                rec_v = jnp.clip(pred_v + rr_v, 0, maxv)

                bry = bry.at[cu_s].set(rec_y[:, n - 1, :], mode="drop")
                rcy = rcy.at[cu_s].set(rec_y[:, :, n - 1], mode="drop")
                bru = bru.at[cu_s].set(rec_u[:, nc - 1, :], mode="drop")
                rcu_ = rcu_.at[cu_s].set(rec_u[:, :, nc - 1], mode="drop")
                brv = brv.at[cu_s].set(rec_v[:, nc - 1, :], mode="drop")
                rcv = rcv.at[cu_s].set(rec_v[:, :, nc - 1], mode="drop")

                ys = (cu_s, use_intra, imode, lv_y, lv_cb, lv_cr,
                      rec_y, rec_u, rec_v)
                return (bry, rcy, bru, rcu_, brv, rcv), ys
            return step

        def encode(y, u, v, ref_y, ref_u, ref_v, *rest):
            wts = hint = None
            if cfg.bi or cfg.n_refs > 1:
                ref1_y, ref1_u, ref1_v, qp = rest
            elif cfg.weightp:
                qp, wy, oy, wcb, ocb, wcr, ocr = rest
                wts = ((wy, oy), (wcb, ocb), (wcr, ocr))
            elif cfg.analysis_load:
                qp, hx, hy = rest
                hint = (hx, hy)
            else:
                (qp,) = rest
            qp_sig = qp.astype(jnp.int32)
            # internal quant QP includes the bit-depth offset (Qp' = Qp + 6*(bd-8));
            # qp may be a scalar or a per-CU [ncu] map (inter AQ / cuTree)
            qp_cu = jnp.broadcast_to(qp_sig, (ncu,))
            qp_y_map = qp_cu + 6 * (bd - 8)
            qp_c_map = jnp.take(jnp.asarray(CHROMA_QP_TABLE),
                                jnp.clip(qp_cu, 0, 57)) + 6 * (bd - 8)
            # sentinel entry for invalid wavefront slots
            qp_y_pad = jnp.concatenate([qp_y_map, qp_y_map[:1]])
            qp_c_pad = jnp.concatenate([qp_c_map, qp_c_map[:1]])
            y32 = y.astype(jnp.int32)
            u32 = u.astype(jnp.int32)
            v32 = v.astype(jnp.int32)
            refy32 = ref_y.astype(jnp.int32)
            refu32 = ref_u.astype(jnp.int32)
            refv32 = ref_v.astype(jnp.int32)
            if cfg.bi:
                (pdir, mvx, mvy, mv1x, mv1y, pred_y, pred_u, pred_v,
                 inter_satd) = motion_phase_b(
                    y32, (refy32, refu32, refv32),
                    (ref1_y.astype(jnp.int32), ref1_u.astype(jnp.int32),
                     ref1_v.astype(jnp.int32)),
                    jnp.max(qp_sig) if qp_sig.ndim else qp_sig)
            elif cfg.n_refs > 1:
                (ref_sel, mvx, mvy, pred_y, pred_u, pred_v,
                 inter_satd) = motion_phase_2ref(
                    y32, (refy32, refu32, refv32),
                    (ref1_y.astype(jnp.int32), ref1_u.astype(jnp.int32),
                     ref1_v.astype(jnp.int32)),
                    jnp.max(qp_sig) if qp_sig.ndim else qp_sig)
            else:
                mvx, mvy, pred_y, pred_u, pred_v, inter_satd = motion_phase(
                    y32, refy32, refu32, refv32, wts, hint)
            # sentinel row for invalid slots
            def padded(a, shape):
                return jnp.concatenate([a, jnp.zeros((1,) + shape, a.dtype)], 0)
            srcs = (padded(to_blocks(y32, n), (n, n)),
                    padded(to_blocks(u32, nc), (nc, nc)),
                    padded(to_blocks(v32, nc), (nc, nc)))
            preds = (padded(pred_y, (n, n)), padded(pred_u, (nc, nc)),
                     padded(pred_v, (nc, nc)))
            isatd_p = jnp.concatenate([inter_satd, jnp.zeros((1,), inter_satd.dtype)])

            step = make_step(srcs, preds, isatd_p, qp_y_pad, qp_c_pad)
            z0 = y.reshape(-1)[0].astype(jnp.int32) * 0
            init = tuple(jnp.full((ncu + 1, k), fill, jnp.int32) + z0
                         for k in (n, n, nc, nc, nc, nc))
            _, ys = jax.lax.scan(step, init, (rc_all, valid_all))
            (cu_s, use_intra_s, imode_s, lv_y_s, lv_cb_s, lv_cr_s,
             rec_y_s, rec_u_s, rec_v_s) = ys
            flat_cu = cu_s.reshape(-1)

            def collect(x, shape, dtype=None):
                acc = jnp.zeros((ncu + 1,) + shape,
                                x.dtype if dtype is None else dtype)
                acc = acc.at[flat_cu].set(
                    x.reshape((-1,) + shape).astype(acc.dtype), mode="drop")
                return acc[:ncu]

            use_intra = collect(use_intra_s, (), jnp.uint8)
            imode = collect(imode_s, ())
            lv_y = collect(lv_y_s, (n, n))
            lv_cb = collect(lv_cb_s, (nc, nc))
            lv_cr = collect(lv_cr_s, (nc, nc))
            rec_y = collect(rec_y_s, (n, n))
            rec_u = collect(rec_u_s, (nc, nc))
            rec_v = collect(rec_v_s, (nc, nc))

            rec_cat = jnp.concatenate([
                from_blocks(rec_y, n, H, W).reshape(-1),
                from_blocks(rec_u, nc, H // 2, W // 2).reshape(-1),
                from_blocks(rec_v, nc, H // 2, W // 2).reshape(-1),
            ])
            if bd > 8:
                recon8 = jax.lax.bitcast_convert_type(
                    rec_cat.astype(jnp.int16), jnp.uint8).reshape(-1)
            else:
                recon8 = rec_cat.astype(jnp.uint8)
            head_parts = [use_intra, imode.astype(jnp.uint8)]
            if cfg.bi:
                head_parts.append(pdir.astype(jnp.uint8))
            if cfg.n_refs > 1:
                head_parts.append(ref_sel.astype(jnp.uint8))
            head8 = jnp.concatenate(head_parts).astype(jnp.uint8)
            mv_parts = [mvx.astype(jnp.int16), mvy.astype(jnp.int16)]
            if cfg.bi:
                mv_parts += [mv1x.astype(jnp.int16), mv1y.astype(jnp.int16)]
            mv16 = jnp.concatenate(mv_parts)
            mv8 = jax.lax.bitcast_convert_type(mv16, jnp.uint8).reshape(-1)
            lv_cat = jnp.concatenate([
                lv_y.reshape(-1), lv_cb.reshape(-1), lv_cr.reshape(-1)])
            if compact:
                # int8 pairs in uint16 lanes + trailing overflow flag
                # (see _build_qt - halves the dominant transfer)
                overflow = ((lv_cat > 127) | (lv_cat < -128)).any()
                pairs = lv_cat.reshape(-1, 2)
                packed = ((pairs[:, 0] & 0xff)
                          | ((pairs[:, 1] & 0xff) << 8)
                          ).astype(jnp.uint16)
                levels8 = jax.lax.bitcast_convert_type(
                    packed, jnp.uint8).reshape(-1)
                flag = overflow.astype(jnp.uint8).reshape(1)
            else:
                levels8 = jax.lax.bitcast_convert_type(
                    lv_cat.astype(jnp.int16), jnp.uint8).reshape(-1)
                flag = jnp.zeros((1,), jnp.uint8)
            return jnp.concatenate([recon8, head8, mv8, levels8,
                                    flag])

        return encode

    # ------------------------------------------------------------------
    def _build_qt(self, compact: bool = True):
        """Inter CTU32 quadtree encoder — dense-decide + commit-scan.

        TPU-first redesign (round 3): ALL decisions — motion vectors,
        uni/bi list selection, intra modes, intra-vs-inter, quadtree
        splits — are made in one dense fully-parallel phase:

        * ME is a frame-level displacement sweep (ops/me.sad_sweep_multi)
          producing every CU size's SAD hierarchically from ONE abs-diff
          pass per displacement (the reference's per-PU pattern search,
          motion.cpp:739, reformulated for the VPU), followed by half+
          quarter-pel SATD refinement on pre-gathered local windows
          (ops/interp.subpel_refine_win).
        * Intra modes come from source-pixel neighbors (the reference's
          fast-intra approximation) for all sizes as MXU mode batches.
        * Mode and split decisions use SSE + lambda*bits RD over dense
          per-leaf transform/quant results (analysis.cpp:1146 analog with
          candidate depths as a batch axis).

        The wavefront lax.scan then only COMMITS the decided tree: exact
        recon + quantized levels for intra leaves (whose prediction needs
        true neighbor recon); inter leaves are committed densely since
        inter prediction never reads neighbors.  This shrinks the scan
        body ~10x (XLA compile time) and removes the per-candidate window
        materialisation that made the old path HBM-bound.
        """
        from .qt_common import block_v, QOFF
        from ..ops import bitcost as BC
        cfg = self.cfg
        n = cfg.cu_size            # 32
        h = 16
        nc = 16
        rows, cols = cfg.rows, cfg.cols
        W, H = cfg.width, cfg.height
        bd = cfg.bit_depth
        maxv = (1 << bd) - 1
        ncu = rows * cols
        n16 = 4 * ncu
        n8 = 16 * ncu
        R = cfg.search_range
        rc_all, valid_all = self._rc, self._valid
        S = self.num_slots
        fill = 1 << (bd - 1)
        MODE_BITS = 7.0
        depth2 = cfg.max_depth >= 2
        sizes = [n, h] + ([8] if depth2 else [])

        def to_blocks(plane, nn):
            hh, ww = plane.shape
            return (plane.reshape(hh // nn, nn, ww // nn, nn)
                    .transpose(0, 2, 1, 3).reshape(-1, nn, nn))

        def from_blocks(blocks, nn, hh, ww):
            return (blocks.reshape(hh // nn, ww // nn, nn, nn)
                    .transpose(0, 2, 1, 3).reshape(hh, ww))

        # ---- static geometry -------------------------------------------
        g32r = np.arange(ncu, dtype=np.int32) // cols
        g32c = np.arange(ncu, dtype=np.int32) % cols
        cols16, cols8 = cols * 2, cols * 4
        PXPY = {}
        CTU_OF = {}
        for nn in (n, h, 8):
            cn = W // nn
            nb = (H // nn) * cn
            bx = (np.arange(nb, dtype=np.int32) % cn) * nn
            by = (np.arange(nb, dtype=np.int32) // cn) * nn
            PXPY[nn] = (jnp.asarray(bx), jnp.asarray(by))
            CTU_OF[nn] = jnp.asarray((by // n) * cols + (bx // n))
        map16 = np.zeros((ncu + 1, 4), np.int32)
        for q, (qy, qx) in enumerate(QOFF):
            map16[:ncu, q] = (g32r * 2 + qy) * cols16 + (g32c * 2 + qx)
        map16[ncu] = n16
        MAP16 = jnp.asarray(map16)
        map8 = np.zeros((ncu + 1, 4, 4), np.int32)
        for q, (qy, qx) in enumerate(QOFF):
            for sq, (sy, sx) in enumerate(QOFF):
                map8[:ncu, q, sq] = ((g32r * 4 + 2 * qy + sy) * cols8
                                     + (g32c * 4 + 2 * qx + sx))
        map8[ncu] = n8
        MAP8 = jnp.asarray(map8)
        # 16-block -> its 4 8-block children (frame row-major indices)
        r16 = np.arange(n16, dtype=np.int32) // cols16
        c16 = np.arange(n16, dtype=np.int32) % cols16
        CH8 = np.stack([(r16 * 2 + qy) * cols8 + (c16 * 2 + qx)
                        for qy, qx in QOFF], axis=1)
        CH8 = jnp.asarray(CH8)                     # [n16, 4]
        # CTU -> its 4 16-block children in z-order == MAP16[:ncu]

        _rdoq_states = [None]   # set by encode() before the first tq call

        def tq(resid, qp, log2nn, luma=True, is_intra=None, modes=None):
            coef = transforms.forward_transform(resid, bd, xp=jnp)
            if cfg.rdoq:
                # round 5: context-cost RDOQ (quant.cpp:688 estBitsSbac
                # analog at the K9 frozen slice-init states) — the static
                # -bit form measured -1 dB and is kept only as fallback
                if _rdoq_states[0] is not None:
                    levels = quant.quant_rdoq_ctx(
                        coef, qp, log2nn, bd, _rdoq_states[0], luma,
                        psy_scale=cfg.psy_rdoq if luma else 0.0, xp=jnp)
                else:
                    levels = quant.quant_rdoq(
                        coef, qp, log2nn, bd,
                        psy_scale=cfg.psy_rdoq if luma else 0.0, xp=jnp)
            else:
                levels, du = quant.quant(coef, qp, log2nn, bd, False, xp=jnp)
                if cfg.sbh:
                    if modes is not None:
                        levels = quant.sign_bit_hiding_mdcs(
                            levels, du, log2nn, modes, luma, xp=jnp,
                            is_intra=is_intra)
                    else:
                        levels = quant.sign_bit_hiding(levels, du, log2nn,
                                                       xp=jnp)
            dq = quant.dequant(levels, qp, log2nn, bd, xp=jnp)
            rr = transforms.inverse_transform(dq, bd, xp=jnp)
            return levels, rr

        def make_mv_bits(states):
            """K9 wiring: MVD signaling cost from the frozen-context CABAC
            model (ops/bitcost.mvd_bits — the reference's bitcost.h:87 MV
            cost table analog) + ~2 bits of mvp/merge flag overhead. The
            dense path has no MVP yet, so |mv| stands in for |mvd|."""
            def est_mv_bits_arr(mvx, mvy):
                return (BC.mvd_bits(mvx, states, xp=jnp)
                        + BC.mvd_bits(mvy, states, xp=jnp) + 2.0)
            return est_mv_bits_arr

        def ssd(a, b):
            d = (a - b).astype(jnp.float32)
            return jnp.sum(d * d, axis=(-2, -1))

        # ---- dense motion ----------------------------------------------
        def sweep_list(y32, ref_y, low_y, low_ref, wts=None):
            """Frame sweep + optional HME coarse candidate + subpel refine
            for every size.  Returns ({nn: (mvqx, mvqy, satd, isad)},
            surface): isad is the winner's integer-MV SAD and surface the
            retained sweep cost tensor (me.surface_query) so the merge
            stage can score candidates without window gathers."""
            search_plane = ref_y
            if wts is not None:
                (wy, oy) = wts[0]
                search_plane = jnp.clip(
                    jnp.right_shift(ref_y * wy + 32, 6) + oy, 0, maxv
                    ).astype(ref_y.dtype)
            fine, surface = me.sad_sweep_multi(search_plane, y32,
                                               tuple(sizes), R,
                                               lambda_bits=2,
                                               return_surface=True)
            coarse = None
            if cfg.hme and low_ref is not None:
                lref = low_ref
                if wts is not None:
                    (wy, oy) = wts[0]
                    lref = jnp.clip(
                        jnp.right_shift(low_ref * wy + 32, 6) + oy, 0, maxv
                        ).astype(low_ref.dtype)
                coarse = me.sad_sweep_multi(
                    lref, low_y, tuple(nn // 2 for nn in sizes),
                    cfg.hme_range, lambda_bits=2)
            out = {}
            for nn in sizes:
                px, py = PXPY[nn]
                yb = to_blocks(y32, nn)
                fx, fy, fsad = fine[nn]
                mvx_i, mvy_i = fx, fy
                isad = fsad
                if coarse is not None:
                    cx2 = coarse[nn // 2][0] * 2
                    cy2 = coarse[nn // 2][1] * 2
                    csad = me.sad_at_mv(search_plane, yb, px, py, cx2, cy2,
                                        nn, xp=jnp)
                    cost_f = fsad + 2 * (jnp.abs(fx) + jnp.abs(fy))
                    cost_c = csad + 2 * (jnp.abs(cx2) + jnp.abs(cy2))
                    use_c = cost_c < cost_f
                    mvx_i = jnp.where(use_c, cx2, fx)
                    mvy_i = jnp.where(use_c, cy2, fy)
                    isad = jnp.where(use_c, csad, fsad)
                if cfg.subpel:
                    win = interp.gather_luma_window(search_plane, px, py,
                                                    mvx_i, mvy_i, nn, xp=jnp)
                    dqx, dqy, satd = interp.subpel_refine_win(
                        win, yb, nn, bd, xp=jnp)
                    out[nn] = (mvx_i * 4 + dqx, mvy_i * 4 + dqy, satd, isad)
                else:
                    pred = interp.mc_luma_qpel(search_plane, px, py,
                                               mvx_i * 4, mvy_i * 4, nn, bd,
                                               xp=jnp)
                    out[nn] = (mvx_i * 4, mvy_i * 4,
                               pixel.satd(yb, pred, xp=jnp), isad)
            return out, surface

        def mc_all(refs, mvx, mvy, px, py, nn):
            p_y = interp.mc_luma_qpel(refs[0], px, py, mvx, mvy, nn, bd,
                                      xp=jnp)
            p_u = interp.mc_chroma_qpel(refs[1], px // 2, py // 2, mvx, mvy,
                                        nn // 2, bd, xp=jnp)
            p_v = interp.mc_chroma_qpel(refs[2], px // 2, py // 2, mvx, mvy,
                                        nn // 2, bd, xp=jnp)
            return p_y, p_u, p_v

        def ps_all(refs, mvx, mvy, px, py, nn):
            return (interp.mc_luma_qpel_ps(refs[0], px, py, mvx, mvy, nn,
                                           bd, xp=jnp),
                    interp.mc_chroma_qpel_ps(refs[1], px // 2, py // 2,
                                             mvx, mvy, nn // 2, bd, xp=jnp),
                    interp.mc_chroma_qpel_ps(refs[2], px // 2, py // 2,
                                             mvx, mvy, nn // 2, bd, xp=jnp))

        def wpred_all(refs, mvx, mvy, px, py, nn, wts):
            (wy, oy), (wcb, ocb), (wcr, ocr) = wts
            ps = ps_all(refs, mvx, mvy, px, py, nn)
            return (interp.weight_uni(ps[0], wy, oy, 6, bd, xp=jnp),
                    interp.weight_uni(ps[1], wcb, ocb, 6, bd, xp=jnp),
                    interp.weight_uni(ps[2], wcr, ocr, 6, bd, xp=jnp))

        def _allow_intra(nn):
            """Static intra-candidate policy per CU size: B slices follow
            --b-intra; P slices skip 8x8 intra (rarely chosen, and it is
            what keeps the 8-level commits in the sequential wavefront
            scan — dropping it halves the scan body)."""
            if cfg.bi:
                return bool(cfg.intra_in_b)
            return not (cfg.max_depth >= 2 and nn == 8)

        def win_at_imv(ref, px, py, ix, iy, nn):
            """[B, nn, nn] reference window at a per-block INTEGER MV
            (border-clamped) — the cheap merge-candidate costing form
            (n^2 gathered elements, no interpolation margin)."""
            Hh, Ww = ref.shape
            ar = jnp.arange(nn)
            rows = jnp.clip((py + iy)[:, None] + ar[None, :], 0, Hh - 1)
            cols = jnp.clip((px + ix)[:, None] + ar[None, :], 0, Ww - 1)
            return jnp.take(ref.reshape(-1),
                            rows[:, :, None] * Ww + cols[:, None, :],
                            axis=0).astype(jnp.int32)

        def bilerp_at_qmv(ref, px, py, qx, qy, nn):
            """[B, nn, nn] bilinear-interpolated prediction at per-block
            QPEL MVs — the fair cheap scoring metric for merge-candidate
            RD (an integer-rounded score systematically loses to the ME
            winner's 8-tap subpel SATD on smooth content, which kills
            merge adoption; both sides are scored with THIS metric)."""
            ix, fx = qx >> 2, (qx & 3).astype(jnp.int32)
            iy, fy = qy >> 2, (qy & 3).astype(jnp.int32)
            w = win_at_imv(ref, px, py, ix, iy, nn + 1)
            w00 = ((4 - fx) * (4 - fy))[:, None, None]
            w10 = (fx * (4 - fy))[:, None, None]
            w01 = ((4 - fx) * fy)[:, None, None]
            w11 = (fx * fy)[:, None, None]
            return jnp.right_shift(
                w00 * w[:, :nn, :nn] + w10 * w[:, :nn, 1:]
                + w01 * w[:, 1:, :nn] + w11 * w[:, 1:, 1:] + 8, 4)

        def median_mv(mvx, mvy):
            """Componentwise median of the per-size ME field: the
            frame-dominant motion, added as a CONSENSUS candidate so
            uniform regions converge to one MV (and serialize-time merge
            chains actually coincide) instead of jittering per block."""
            return (jnp.broadcast_to(jnp.median(mvx).astype(jnp.int32),
                                     mvx.shape),
                    jnp.broadcast_to(jnp.median(mvy).astype(jnp.int32),
                                     mvy.shape))

        def shift_grid(a, nn, dr, dc):
            """Neighbor field: value of the block (dr, dc) away on the
            nn-grid; out-of-picture -> 0 (the spec's zero-MV fill)."""
            cn = W // nn
            rn = H // nn
            g = a.reshape(rn, cn)
            pr = ((max(-dr, 0), max(dr, 0)), (max(-dc, 0), max(dc, 0)))
            g = jnp.pad(g, pr)[max(dr, 0):max(dr, 0) + rn,
                               max(dc, 0):max(dc, 0) + cn]
            return g.reshape(-1)

        def merge_cand_fields(nn, fields):
            """Spatial merge candidates on the nn-grid from the dense ME
            winner field (mergeEstimation analog, search.cpp:1891): left,
            above, above-right neighbors + the zero candidate. fields is a
            tuple of per-block arrays; returns a list of shifted tuples."""
            cands = []
            for dr, dc in ((0, -1), (-1, 0), (-1, 1)):
                cands.append(tuple(shift_grid(f, nn, dr, dc)
                                   for f in fields))
            cands.append(tuple(jnp.zeros_like(f) for f in fields))
            return cands

        def decide_motion_dense(nn, y32, refs0, refs1, mv0, mv1, qp_blk,
                                est_mv_bits_arr, wts=None,
                                surf0=None, surf1=None):
            """Per-block list decision at one size from sweep results,
            with merge-candidate RD: the left/above/above-right neighbors'
            motion, the frame-median consensus MV and the zero candidate
            compete against the ME winner at merge-cost bits (merge_flag +
            idx instead of MVD — the reference's mergeEstimation,
            search.cpp:1891,2221). Round-5 form: every candidate AND the
            ME winner are scored in integer-SAD space straight from the
            retained sweep cost surface (me.surface_query) — a [nblocks]
            gather per candidate instead of a window gather + SATD, which
            dominated the round-4 device profile. Candidates equal to the
            winner MV short-circuit to the winner's SAD (covers HME
            vectors beyond the fine range on pans). Winners that coincide
            with the true spec candidate list at serialize time are coded
            as merge/skip.
            Returns (pdir, mv0x, mv0y, mv1x, mv1y, pred3, satd_sel,
            bits_sel)."""
            px, py = PXPY[nn]
            yb = to_blocks(y32, nn)
            mv0x, mv0y, s0, isad0 = mv0
            lam = 0.9 * jnp.exp2((qp_blk.astype(jnp.float32) - 12.0) / 6.0)
            rnd2 = lambda q: jnp.right_shift(q + 2, 2)
            if wts is not None:
                pred = wpred_all(refs0, mv0x, mv0y, px, py, nn, wts)
                s0 = pixel.satd(yb, pred[0], xp=jnp)
                bits = est_mv_bits_arr(mv0x, mv0y)
                ones = jnp.ones_like(mv0x)
                return (ones, mv0x, mv0y, mv0x * 0, mv0y * 0, pred, s0, bits)
            if refs1 is None:
                b_me = est_mv_bits_arr(mv0x, mv0y)
                cands = merge_cand_fields(nn, (mv0x, mv0y))
                cands.append(median_mv(mv0x, mv0y))
                if surf0 is not None:
                    # integer-SAD metric for BOTH sides, same surface
                    s_me = isad0
                    score = lambda cx, cy: jnp.where(
                        (cx == mv0x) & (cy == mv0y), isad0,
                        me.surface_query(surf0, nn, rnd2(cx), rnd2(cy)))
                else:
                    # >8-bit fallback: bilinear-qpel SATD both sides
                    s_me = pixel.satd(
                        yb, bilerp_at_qmv(refs0[0], px, py, mv0x, mv0y, nn),
                        xp=jnp)
                    score = lambda cx, cy: pixel.satd(
                        yb, bilerp_at_qmv(refs0[0], px, py, cx, cy, nn),
                        xp=jnp)
                bx, by = mv0x, mv0y
                bs_, bb = s_me, b_me
                bcost = s_me.astype(jnp.float32) + lam * b_me
                for idx, (cx, cy) in enumerate(cands):
                    s = score(cx, cy)
                    b = 2.0 + min(idx, 3)  # merge_flag + unary merge_idx
                    c = s.astype(jnp.float32) + lam * b
                    upd = c < bcost
                    bx = jnp.where(upd, cx, bx)
                    by = jnp.where(upd, cy, by)
                    bs_ = jnp.where(upd, s, bs_)
                    bb = jnp.where(upd, b, bb)
                    bcost = jnp.minimum(c, bcost)
                pred = mc_all(refs0, bx, by, px, py, nn)
                ones = jnp.ones_like(bx)
                return (ones, bx, by, bx * 0, by * 0, pred, bs_, bb)
            # ---- B: luma-only phase-1 selection (uni0/uni1/bi + merge),
            # full 3-component prediction once at the winner ---------------
            mv1x, mv1y, s1, isad1 = mv1
            pl0 = interp.mc_luma_qpel_ps(refs0[0], px, py, mv0x, mv0y, nn,
                                         bd, xp=jnp)
            pl1 = interp.mc_luma_qpel_ps(refs1[0], px, py, mv1x, mv1y, nn,
                                         bd, xp=jnp)
            pbi_l = interp.add_avg(pl0, pl1, bd, xp=jnp)
            sbi = pixel.satd(yb, pbi_l, xp=jnp)
            b0 = est_mv_bits_arr(mv0x, mv0y)
            b1 = est_mv_bits_arr(mv1x, mv1y)
            costs = jnp.stack([s0 + lam * b0, s1 + lam * (b1 + 1.0),
                               sbi + lam * (b0 + b1 + 2.0)], axis=1)
            sel = jnp.argmin(costs, axis=1).astype(jnp.int32)
            pdir = jnp.where(sel == 2, 3, sel + 1)
            ar = jnp.arange(s0.shape[0])
            satd_sel = jnp.stack([s0, s1, sbi], 1)[ar, sel]
            bits_sel = jnp.stack([b0, b1 + 1.0, b0 + b1 + 2.0], 1)[ar, sel]
            m0 = (pdir & 1).astype(mv0x.dtype)
            m1 = ((pdir & 2) >> 1).astype(mv1x.dtype)
            fx0, fy0 = mv0x * m0, mv0y * m0
            fx1, fy1 = mv1x * m1, mv1y * m1
            fpdir = pdir
            fs, fb = satd_sel, bits_sel
            # merge stage metric (round 5): integer SAD from the retained
            # sweep surfaces for winner AND candidates; bi = mean of the
            # two uni SADs (proxy; both sides use it, so the comparison
            # stays fair). >8-bit fallback keeps the bilerp-SATD metric.
            use_surf = surf0 is not None and surf1 is not None

            def sc_pair(cp, c0x, c0y, c1x, c1y, eqref):
                if use_surf:
                    e0x, e0y, e1x, e1y, s0w, s1w = eqref
                    sc0 = jnp.where((c0x == e0x) & (c0y == e0y), s0w,
                                    me.surface_query(surf0, nn, rnd2(c0x),
                                                     rnd2(c0y)))
                    sc1 = jnp.where((c1x == e1x) & (c1y == e1y), s1w,
                                    me.surface_query(surf1, nn, rnd2(c1x),
                                                     rnd2(c1y)))
                    return jnp.where(cp == 1, sc0,
                                     jnp.where(cp == 2, sc1,
                                               (sc0 + sc1 + 1) >> 1))
                w0 = bilerp_at_qmv(refs0[0], px, py, c0x, c0y, nn)
                w1 = bilerp_at_qmv(refs1[0], px, py, c1x, c1y, nn)
                wbi = (w0 + w1 + 1) >> 1
                cp3 = cp[:, None, None]
                qp_ = jnp.where(cp3 == 1, w0, jnp.where(cp3 == 2, w1, wbi))
                return pixel.satd(yb, qp_, xp=jnp)

            eqref = (mv0x, mv0y, mv1x, mv1y, isad0, isad1)
            s_me = sc_pair(fpdir, fx0, fy0, fx1, fy1, eqref)
            fcost = s_me.astype(jnp.float32) + lam * bits_sel
            # merge candidates: neighbor (pdir, mv0, mv1) of the ME field
            # + the frame-median consensus motion
            cands = merge_cand_fields(nn, (fpdir, fx0, fy0, fx1, fy1))
            mx0, my0 = median_mv(mv0x, mv0y)
            mx1, my1 = median_mv(mv1x, mv1y)
            cands.append((jnp.full_like(fpdir, 3), mx0, my0, mx1, my1))
            for idx, (cp, c0x, c0y, c1x, c1y) in enumerate(cands):
                cp = jnp.where(cp == 0, 3, cp)       # zero cand: bi zero-MV
                s = sc_pair(cp, c0x, c0y, c1x, c1y, eqref)
                b = 2.0 + min(idx, 3)
                c = s.astype(jnp.float32) + lam * b
                upd = c < fcost
                fpdir = jnp.where(upd, cp, fpdir)
                fx0 = jnp.where(upd, c0x, fx0)
                fy0 = jnp.where(upd, c0y, fy0)
                fx1 = jnp.where(upd, c1x, fx1)
                fy1 = jnp.where(upd, c1y, fy1)
                fs = jnp.where(upd, s, fs)
                fb = jnp.where(upd, b, fb)
                fcost = jnp.minimum(c, fcost)
            m0 = (fpdir & 1).astype(fx0.dtype)
            m1 = ((fpdir & 2) >> 1).astype(fx1.dtype)
            fx0, fy0 = fx0 * m0, fy0 * m0
            fx1, fy1 = fx1 * m1, fy1 * m1
            # full prediction at the winner motion
            p0f = mc_all(refs0, fx0, fy0, px, py, nn)
            p1f = mc_all(refs1, fx1, fy1, px, py, nn)
            ps0f = ps_all(refs0, fx0, fy0, px, py, nn)
            ps1f = ps_all(refs1, fx1, fy1, px, py, nn)
            pbif = tuple(interp.add_avg(a, b_, bd, xp=jnp)
                         for a, b_ in zip(ps0f, ps1f))

            def pickf(a, b_, c):
                s_ = fpdir[:, None, None]
                return jnp.where(s_ == 1, a, jnp.where(s_ == 2, b_, c))

            pred = tuple(pickf(a, b_, c) for a, b_, c in zip(p0f, p1f, pbif))
            return (fpdir, fx0, fy0, fx1, fy1, pred, fs, fb)

        # ---- dense intra (source-neighbor modes, fast-intra analog) ----
        def source_v(plane, nn):
            """Boundary vectors [nblocks, 4nn+1] gathered from the
            edge-replicated SOURCE plane for every aligned nn-block."""
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

        def dense_intra(nn, y32, u32, v32):
            """Fast-intra decision + approximate prediction at one size.
            Returns (modes, pred_y, pred_u, pred_v)."""
            vy = source_v(y32, nn)
            preds = intra.predict_all_modes_matmul(vy, nn, bd, luma=True,
                                                   strong_smoothing=False,
                                                   xp=jnp)
            yb = to_blocks(y32, nn)
            costs = pixel.satd(yb[:, None], preds, xp=jnp)
            modes = jnp.argmin(costs, axis=1).astype(jnp.int32)
            pred_y = jnp.take_along_axis(
                preds, modes[:, None, None, None], axis=1)[:, 0]
            hc = nn // 2
            vu = source_v(u32, hc)
            pred_u = intra.predict_mode_matmul(vu, modes, hc, bd, luma=False,
                                               xp=jnp)
            vv = source_v(v32, hc)
            pred_v = intra.predict_mode_matmul(vv, modes, hc, bd, luma=False,
                                               xp=jnp)
            return modes, pred_y, pred_u, pred_v

        # ---- dense per-leaf RD -----------------------------------------
        def tq_quads(resid, qp, log2nn, luma, is_intra_f, modes):
            """Transform/quant the same residual as 4 half-size TUs laid
            out in quadrants (the RQT split variant)."""
            nn_ = 1 << log2nn
            h2 = nn_ // 2
            B = resid.shape[0]
            q = (resid.reshape(B, 2, h2, 2, h2).transpose(0, 1, 3, 2, 4)
                 .reshape(B * 4, h2, h2))
            rep = lambda a: jnp.repeat(a, 4, axis=0)
            lv, rr = tq(q, rep(qp), log2nn - 1, luma=luma,
                        is_intra=rep(is_intra_f), modes=rep(modes))

            def back(a):
                return (a.reshape(B, 2, 2, h2, h2).transpose(0, 1, 3, 2, 4)
                        .reshape(B, nn_, nn_))

            return back(lv), back(rr), lv.reshape(B, 4, h2, h2)

        def dense_leaf_rd(nn, srcs3, ipred3, epred3, modes, qp_y, qp_c,
                          lam2, ebits_mv, states):
            """RD both candidates of every leaf at one size.  Returns
            (use_intra, leaf_dist, leaf_bits, elv3, erec3[, tu_split]):
            the chosen flag, the chosen candidate's dist/bits, and the
            INTER levels/recon (exact — committed densely). With cfg.rqt
            at the CTU size, the inter candidate also evaluates the
            4x half-size TU split of the same residual
            (estimateResidualQT, search.cpp:3178) and returns the
            per-leaf tu_split decision; split levels live in the same
            buffers in quadrant layout."""
            sy, su, sv = srcs3
            log2nn = nn.bit_length() - 1
            fI = jnp.ones(modes.shape, bool)
            fE = jnp.zeros(modes.shape, bool)
            use_rqt = cfg.rqt and nn == n
            allow_intra = _allow_intra(nn)

            def rd_one(pred3, is_intra_f):
                lv_y, rr_y = tq(sy - pred3[0], qp_y, log2nn,
                                is_intra=is_intra_f, modes=modes)
                lv_cb, rr_u = tq(su - pred3[1], qp_c, log2nn - 1, luma=False,
                                 is_intra=is_intra_f, modes=modes)
                lv_cr, rr_v = tq(sv - pred3[2], qp_c, log2nn - 1, luma=False,
                                 is_intra=is_intra_f, modes=modes)
                rec_y = jnp.clip(pred3[0] + rr_y, 0, maxv)
                rec_u = jnp.clip(pred3[1] + rr_u, 0, maxv)
                rec_v = jnp.clip(pred3[2] + rr_v, 0, maxv)
                dist = ssd(sy, rec_y) + ssd(su, rec_u) + ssd(sv, rec_v)
                if cfg.psy_rd > 0:
                    dist = dist + cfg.psy_rd * jnp.abs(
                        pixel.psy_energy(sy, xp=jnp)
                        - pixel.psy_energy(rec_y, xp=jnp)).astype(jnp.float32)
                # K9 wiring: TU bits from the frozen-context CABAC model
                # (ops/bitcost — quant.cpp:610 estBits analog), replacing
                # the static per-level estimates
                bits = (BC.est_tu_bits_ctx(lv_y, log2nn, True, states,
                                           xp=jnp, sign_hiding=cfg.sbh)
                        + BC.est_tu_bits_ctx(lv_cb, log2nn - 1, False,
                                             states, xp=jnp,
                                             sign_hiding=cfg.sbh)
                        + BC.est_tu_bits_ctx(lv_cr, log2nn - 1, False,
                                             states, xp=jnp,
                                             sign_hiding=cfg.sbh))
                return (lv_y, lv_cb, lv_cr), (rec_y, rec_u, rec_v), dist, bits

            if allow_intra:
                ilv, irec, idist, ibits = rd_one(ipred3, fI)
            elv, erec, edist, ebits = rd_one(epred3, fE)
            tu_split = None
            if use_rqt:
                # RQT split variant of the inter residual: 4 TUs of nn/2
                # (luma) and nn/4 (chroma, 4:2:0 follows the luma split)
                lv2_y, rr2_y, q_y = tq_quads(sy - epred3[0], qp_y, log2nn,
                                             True, fE, modes)
                lv2_cb, rr2_u, q_cb = tq_quads(su - epred3[1], qp_c,
                                               log2nn - 1, False, fE, modes)
                lv2_cr, rr2_v, q_cr = tq_quads(sv - epred3[2], qp_c,
                                               log2nn - 1, False, fE, modes)
                rec2_y = jnp.clip(epred3[0] + rr2_y, 0, maxv)
                rec2_u = jnp.clip(epred3[1] + rr2_u, 0, maxv)
                rec2_v = jnp.clip(epred3[2] + rr2_v, 0, maxv)
                dist2 = (ssd(sy, rec2_y) + ssd(su, rec2_u)
                         + ssd(sv, rec2_v))
                bits2 = (BC.est_tu_bits_ctx(q_y, log2nn - 1, True, states,
                                            xp=jnp,
                                            sign_hiding=cfg.sbh).sum(-1)
                         + BC.est_tu_bits_ctx(q_cb, log2nn - 2, False,
                                              states, xp=jnp,
                                              sign_hiding=cfg.sbh).sum(-1)
                         + BC.est_tu_bits_ctx(q_cr, log2nn - 2, False,
                                              states, xp=jnp,
                                              sign_hiding=cfg.sbh).sum(-1)
                         + 12.0)       # ~cbf_luma x4 + chroma cbf x8
                tu_split = (dist2 + lam2 * (bits2 + 1.0)) \
                    < (edist + lam2 * (ebits + 1.0))
                ts3 = tu_split[:, None, None]
                elv = tuple(jnp.where(ts3, a, b)
                            for a, b in zip((lv2_y, lv2_cb, lv2_cr), elv))
                erec = tuple(jnp.where(ts3, a, b)
                             for a, b in zip((rec2_y, rec2_u, rec2_v),
                                             erec))
                edist = jnp.where(tu_split, dist2, edist)
                ebits = jnp.where(tu_split, bits2, ebits)
            if not allow_intra:
                return (jnp.zeros(modes.shape, bool), edist,
                        ebits + ebits_mv, elv, erec, tu_split)
            ci = idist + lam2 * (ibits + MODE_BITS) + cfg.intra_bias
            ce = edist + lam2 * (ebits + ebits_mv)
            ui = ci < ce
            leaf_dist = jnp.where(ui, idist, edist)
            leaf_bits = jnp.where(ui, ibits + MODE_BITS, ebits + ebits_mv)
            return ui, leaf_dist, leaf_bits, elv, erec, tu_split

        # ---- commit scan -----------------------------------------------
        def make_commit(srcs, init_tiles, head, qp_y_pad, qp_c_pad):
            """srcs/init_tiles: CTU-blocked padded [ncu+1, ...] arrays;
            head: dict of padded decided-tree arrays."""
            src_yb, src_ub, src_vb = srcs
            ity, itu, itv, ily, ilcb, ilcr = init_tiles

            def commit_intra(tiles, srcs_s, nb_y, nb_u, nb_v, flags, y0, x0,
                             nn, modes, qp_y, qp_c):
                """Exact intra recon+levels for the nn-leaf at (y0, x0)."""
                ty, tu, tv = tiles
                yc, xc = y0 // 2, x0 // 2
                hc2 = nn // 2
                sy_ = srcs_s[0][:, y0:y0 + nn, x0:x0 + nn]
                su_ = srcs_s[1][:, yc:yc + hc2, xc:xc + hc2]
                sv_ = srcs_s[2][:, yc:yc + hc2, xc:xc + hc2]
                vy, ay = block_v(ty, *nb_y, *flags, y0, x0, nn)
                vyl = intra.substitute_references(vy, ay, bd, xp=jnp)
                p_y = intra.predict_mode_matmul(vyl, modes, nn, bd, luma=True,
                                                xp=jnp)
                vu, au = block_v(tu, *nb_u, *flags, yc, xc, hc2)
                vul = intra.substitute_references(vu, au, bd, xp=jnp)
                p_u = intra.predict_mode_matmul(vul, modes, hc2, bd,
                                                luma=False, xp=jnp)
                vv, av_ = block_v(tv, *nb_v, *flags, yc, xc, hc2)
                vvl = intra.substitute_references(vv, av_, bd, xp=jnp)
                p_v = intra.predict_mode_matmul(vvl, modes, hc2, bd,
                                                luma=False, xp=jnp)
                fI = jnp.ones(modes.shape, bool)
                lv_y, rr_y = tq(sy_ - p_y, qp_y, nn.bit_length() - 1,
                                is_intra=fI, modes=modes)
                lv_cb, rr_u = tq(su_ - p_u, qp_c, hc2.bit_length() - 1,
                                 luma=False, is_intra=fI, modes=modes)
                lv_cr, rr_v = tq(sv_ - p_v, qp_c, hc2.bit_length() - 1,
                                 luma=False, is_intra=fI, modes=modes)
                rec_y = jnp.clip(p_y + rr_y, 0, maxv)
                rec_u = jnp.clip(p_u + rr_u, 0, maxv)
                rec_v = jnp.clip(p_v + rr_v, 0, maxv)
                return (rec_y, rec_u, rec_v), (lv_y, lv_cb, lv_cr)

            def put_masked(tiles, lvs, y0, x0, nn, rec3, lv3, active):
                ty, tu, tv = tiles
                ly, lcb, lcr = lvs
                yc, xc = y0 // 2, x0 // 2
                hc2 = nn // 2
                a = active[:, None, None]

                def sel(tile, a0, b0, k, new):
                    old = tile[:, a0:a0 + k, b0:b0 + k]
                    return tile.at[:, a0:a0 + k, b0:b0 + k].set(
                        jnp.where(a, new, old))

                return ((sel(ty, y0, x0, nn, rec3[0]),
                         sel(tu, yc, xc, hc2, rec3[1]),
                         sel(tv, yc, xc, hc2, rec3[2])),
                        (sel(ly, y0, x0, nn, lv3[0]),
                         sel(lcb, yc, xc, hc2, lv3[1]),
                         sel(lcr, yc, xc, hc2, lv3[2])))

            def step(carry, xs):
                (bry, rcy, bru, rcu_, brv, rcv) = carry
                rc, valid = xs
                r, c = rc[:, 0], rc[:, 1]
                cu = r * cols + c
                cu_s = jnp.where(valid, cu, ncu)
                al = (c > 0) & valid
                at = (r > 0) & valid
                atr = ((r > 0) & (c < cols - 1)) & valid
                atl = ((r > 0) & (c > 0)) & valid
                pad = ncu
                gl = jnp.where(al, cu - 1, pad)
                gt = jnp.where(at, cu - cols, pad)
                gtr = jnp.where(atr, cu - cols + 1, pad)
                gtl = jnp.where(atl, cu - cols - 1, pad)
                flags = (al, at, atr, atl)
                nb_y = (jnp.take(rcy, gl, axis=0), jnp.take(bry, gt, axis=0),
                        jnp.take(bry, gtr, axis=0), jnp.take(bry, gtl, axis=0))
                nb_u = (jnp.take(rcu_, gl, axis=0), jnp.take(bru, gt, axis=0),
                        jnp.take(bru, gtr, axis=0), jnp.take(bru, gtl, axis=0))
                nb_v = (jnp.take(rcv, gl, axis=0), jnp.take(brv, gt, axis=0),
                        jnp.take(brv, gtr, axis=0), jnp.take(brv, gtl, axis=0))

                srcs_s = (jnp.take(src_yb, cu_s, axis=0),
                          jnp.take(src_ub, cu_s, axis=0),
                          jnp.take(src_vb, cu_s, axis=0))
                qp_y = jnp.take(qp_y_pad, cu_s)
                qp_c = jnp.take(qp_c_pad, cu_s)

                tiles = (jnp.take(ity, cu_s, axis=0),
                         jnp.take(itu, cu_s, axis=0),
                         jnp.take(itv, cu_s, axis=0))
                lvs = (jnp.take(ily, cu_s, axis=0),
                       jnp.take(ilcb, cu_s, axis=0),
                       jnp.take(ilcr, cu_s, axis=0))

                split = jnp.take(head["split"], cu_s)
                uiA = jnp.take(head["uiA"], cu_s)
                imA = jnp.take(head["imA"], cu_s)
                ui16 = jnp.take(head["ui16"], cu_s, axis=0)    # [S, 4]
                im16 = jnp.take(head["im16"], cu_s, axis=0)
                if depth2:
                    sp16 = jnp.take(head["split16"], cu_s, axis=0)
                    ui8 = jnp.take(head["ui8"], cu_s, axis=0)  # [S, 4, 4]
                    im8 = jnp.take(head["im8"], cu_s, axis=0)

                # variant A: whole-CTU intra commit (neighbors only)
                recA, lvA = commit_intra(tiles, srcs_s, nb_y, nb_u, nb_v,
                                         flags, 0, 0, n, imA, qp_y, qp_c)
                # variant B: z-order leaf commits over the growing tile
                for q, (qy, qx) in enumerate(QOFF):
                    y0, x0 = qy * h, qx * h
                    act16 = split & ui16[:, q]
                    if depth2:
                        act16 = act16 & ~sp16[:, q]
                    rec16, lv16 = commit_intra(tiles, srcs_s, nb_y, nb_u,
                                               nb_v, flags, y0, x0, h,
                                               im16[:, q], qp_y, qp_c)
                    tiles, lvs = put_masked(tiles, lvs, y0, x0, h,
                                            rec16, lv16, act16)
                    if not depth2 or not _allow_intra(8):
                        # no 8x8 intra leaves exist -> their dense inter
                        # commit is exact; the 16 8-level commits vanish
                        # from the scan body
                        continue
                    for sq, (sy2, sx2) in enumerate(QOFF):
                        yy, xx = y0 + 8 * sy2, x0 + 8 * sx2
                        act8 = split & sp16[:, q] & ui8[:, q, sq]
                        rec8, lv8 = commit_intra(tiles, srcs_s, nb_y, nb_u,
                                                 nb_v, flags, yy, xx, 8,
                                                 im8[:, q, sq], qp_y, qp_c)
                        tiles, lvs = put_masked(tiles, lvs, yy, xx, 8,
                                                rec8, lv8, act8)

                selA = (~split & uiA)[:, None, None]
                rec_y = jnp.where(selA, recA[0], tiles[0])
                rec_u = jnp.where(selA, recA[1], tiles[1])
                rec_v = jnp.where(selA, recA[2], tiles[2])
                lv_y = jnp.where(selA, lvA[0], lvs[0])
                lv_cb = jnp.where(selA, lvA[1], lvs[1])
                lv_cr = jnp.where(selA, lvA[2], lvs[2])

                bry = bry.at[cu_s].set(rec_y[:, n - 1, :], mode="drop")
                rcy = rcy.at[cu_s].set(rec_y[:, :, n - 1], mode="drop")
                bru = bru.at[cu_s].set(rec_u[:, nc - 1, :], mode="drop")
                rcu_ = rcu_.at[cu_s].set(rec_u[:, :, nc - 1], mode="drop")
                brv = brv.at[cu_s].set(rec_v[:, nc - 1, :], mode="drop")
                rcv = rcv.at[cu_s].set(rec_v[:, :, nc - 1], mode="drop")

                ys = (cu_s, lv_y, lv_cb, lv_cr, rec_y, rec_u, rec_v)
                return (bry, rcy, bru, rcu_, brv, rcv), ys

            return step

        def encode(y, u, v, ref_y, ref_u, ref_v, *rest):
            wts = None
            slice_qp = None
            if cfg.dpb:
                rest, slice_qp = rest[:-1], rest[-1]
            if cfg.bi:
                ref1_y, ref1_u, ref1_v, qp = rest
            elif cfg.weightp:
                qp, wy, oy, wcb, ocb, wcr, ocr = rest
                wts = ((wy, oy), (wcb, ocb), (wcr, ocr))
            else:
                (qp,) = rest
            qp_sig = qp.astype(jnp.int32)
            qp_cu = jnp.broadcast_to(qp_sig, (ncu,))
            qp_y_map = qp_cu + 6 * (bd - 8)
            qp_c_map = jnp.take(jnp.asarray(CHROMA_QP_TABLE),
                                jnp.clip(qp_cu, 0, 57)) + 6 * (bd - 8)
            qp_y_pad = jnp.concatenate([qp_y_map, qp_y_map[:1]])
            qp_c_pad = jnp.concatenate([qp_c_map, qp_c_map[:1]])
            y32 = y.astype(jnp.int32)
            u32 = u.astype(jnp.int32)
            v32 = v.astype(jnp.int32)
            refs = (ref_y.astype(jnp.int32), ref_u.astype(jnp.int32),
                    ref_v.astype(jnp.int32))
            refs1 = None
            if cfg.bi:
                refs1 = (ref1_y.astype(jnp.int32), ref1_u.astype(jnp.int32),
                         ref1_v.astype(jnp.int32))

            low_y = low0 = low1 = None
            if cfg.hme:
                from .lookahead import downscale_half
                low_y = downscale_half(y32, xp=jnp)
                low0 = downscale_half(refs[0], xp=jnp)
                if refs1 is not None:
                    low1 = downscale_half(refs1[0], xp=jnp)

            mv_l0, surf_l0 = sweep_list(y32, refs[0], low_y, low0, wts)
            mv_l1, surf_l1 = (sweep_list(y32, refs1[0], low_y, low1)
                              if cfg.bi else (None, None))

            # K9 contexts: frozen at slice-init state (spec 9.3.2.2) for
            # the base QP; slice type 0=B, 1=P (x265 enum)
            states = BC.init_states_dev(0 if cfg.bi else 1, qp_cu[0], xp=jnp)
            _rdoq_states[0] = states
            est_mv_bits_arr = make_mv_bits(states)

            dense = {}
            leaf = {}
            for nn in sizes:
                qp_blk = jnp.take(qp_cu, CTU_OF[nn])
                qpy_blk = jnp.take(qp_y_map, CTU_OF[nn])
                qpc_blk = jnp.take(qp_c_map, CTU_OF[nn])
                lam2 = 0.85 * jnp.exp2((qp_blk.astype(jnp.float32) - 12.0)
                                       / 3.0)
                d = decide_motion_dense(nn, y32, refs, refs1, mv_l0[nn],
                                        None if mv_l1 is None else mv_l1[nn],
                                        qp_blk, est_mv_bits_arr, wts,
                                        surf0=surf_l0, surf1=surf_l1)
                (pdir, m0x, m0y, m1x, m1y, epred, esatd, ebits_mv) = d
                if not _allow_intra(nn):
                    # no intra candidates at this size (--b-intra off for B
                    # slices; no 8x8 intra in P slices)
                    nb_ = m0x.shape[0]
                    imodes = jnp.zeros((nb_,), jnp.int32)
                    ip_y = ip_u = ip_v = None
                else:
                    imodes, ip_y, ip_u, ip_v = dense_intra(nn, y32, u32, v32)
                hc = nn // 2
                srcs3 = (to_blocks(y32, nn), to_blocks(u32, hc),
                         to_blocks(v32, hc))
                ui, ldist, lbits, elv, erec, tu_split = dense_leaf_rd(
                    nn, srcs3, (ip_y, ip_u, ip_v), epred, imodes,
                    qpy_blk, qpc_blk, lam2, ebits_mv, states)
                dense[nn] = (pdir, m0x, m0y, m1x, m1y)
                leaf[nn] = {"ui": ui, "modes": imodes, "dist": ldist,
                            "bits": lbits, "elv": elv, "erec": erec,
                            "lam2": lam2, "tu_split": tu_split}

            # ---- dense split decisions (bottom-up RD) -------------------
            lam2_ctu = 0.85 * jnp.exp2((qp_cu.astype(jnp.float32) - 12.0)
                                       / 3.0)
            lam2_16 = leaf[h]["lam2"]
            d16, b16 = leaf[h]["dist"], leaf[h]["bits"]
            if depth2:
                d8sum = jnp.take(leaf[8]["dist"], CH8).sum(1)
                b8sum = jnp.take(leaf[8]["bits"], CH8).sum(1)
                split16 = (d8sum + lam2_16 * (b8sum + 1.0)) \
                    < (d16 + lam2_16 * (b16 + 1.0))
                t16d = jnp.where(split16, d8sum, d16)
                t16b = jnp.where(split16, b8sum + 1.0, b16 + 1.0)
            else:
                t16d, t16b = d16, b16
            q16 = MAP16[:ncu]                       # [ncu, 4]
            dB = jnp.take(t16d, q16).sum(1)
            bB = jnp.take(t16b, q16).sum(1) + 1.0
            dA = leaf[n]["dist"]
            bA = leaf[n]["bits"] + 1.0
            split = (dB + lam2_ctu * bB) < (dA + lam2_ctu * bA)

            # ---- assemble decided inter planes --------------------------
            base = 8 if depth2 else h
            hb, wb = H // base, W // base
            split_up = jnp.repeat(jnp.repeat(
                split.reshape(rows, cols), n // base, 0), n // base, 1)
            if depth2:
                sp16_up = jnp.repeat(jnp.repeat(
                    split16.reshape(rows * 2, cols * 2), 2, 0), 2, 1)
                lvl = jnp.where(split_up, jnp.where(sp16_up, 2, 1), 0)
            else:
                lvl = split_up.astype(jnp.int32)

            def sel_plane(p32, p16, p8, cell):
                l_up = jnp.repeat(jnp.repeat(lvl, cell, 0), cell, 1)
                if p8 is None:
                    return jnp.where(l_up >= 1, p16, p32)
                return jnp.where(l_up == 2, p8,
                                 jnp.where(l_up == 1, p16, p32))

            def build_sel(key, sub):
                hh = H if sub == 0 else H // 2
                ww = W if sub == 0 else W // 2
                f = 1 if sub == 0 else 2
                p32 = from_blocks(leaf[n][key][sub], n // f, hh, ww)
                p16 = from_blocks(leaf[h][key][sub], h // f, hh, ww)
                p8 = None
                if depth2:
                    p8 = from_blocks(leaf[8][key][sub], 8 // f, hh, ww)
                return sel_plane(p32, p16, p8, base // f)

            dec_rec = [build_sel("erec", i) for i in range(3)]
            dec_lv = [build_sel("elv", i) for i in range(3)]

            # ---- commit scan -------------------------------------------
            def padded(a, shape):
                return jnp.concatenate(
                    [a, jnp.zeros((1,) + shape, a.dtype)], 0)

            def pad1(a):
                return jnp.concatenate([a, jnp.zeros((1,), a.dtype)])

            srcs = (padded(to_blocks(y32, n), (n, n)),
                    padded(to_blocks(u32, nc), (nc, nc)),
                    padded(to_blocks(v32, nc), (nc, nc)))
            init_tiles = (
                padded(to_blocks(dec_rec[0], n), (n, n)),
                padded(to_blocks(dec_rec[1], nc), (nc, nc)),
                padded(to_blocks(dec_rec[2], nc), (nc, nc)),
                padded(to_blocks(dec_lv[0], n), (n, n)),
                padded(to_blocks(dec_lv[1], nc), (nc, nc)),
                padded(to_blocks(dec_lv[2], nc), (nc, nc)))
            ui16_ctu = jnp.take(leaf[h]["ui"], q16)              # [ncu, 4]
            im16_ctu = jnp.take(leaf[h]["modes"], q16)
            head = {
                "split": pad1(split),
                "uiA": pad1(leaf[n]["ui"]),
                "imA": pad1(leaf[n]["modes"]),
                "ui16": padded(ui16_ctu, (4,)),
                "im16": padded(im16_ctu, (4,)),
            }
            if depth2:
                q8 = MAP8[:ncu]
                head["split16"] = padded(jnp.take(split16, q16), (4,))
                head["ui8"] = padded(jnp.take(leaf[8]["ui"], q8), (4, 4))
                head["im8"] = padded(jnp.take(leaf[8]["modes"], q8), (4, 4))

            if cfg.bi and not cfg.intra_in_b:
                # no intra leaves anywhere: the dense inter commit IS the
                # frame — the sequential wavefront scan vanishes entirely
                lv_y = to_blocks(dec_lv[0], n)
                lv_cb = to_blocks(dec_lv[1], nc)
                lv_cr = to_blocks(dec_lv[2], nc)
                rec_y = to_blocks(dec_rec[0], n)
                rec_u = to_blocks(dec_rec[1], nc)
                rec_v = to_blocks(dec_rec[2], nc)
            else:
                step = make_commit(srcs, init_tiles, head, qp_y_pad,
                                   qp_c_pad)
                z0 = y.reshape(-1)[0].astype(jnp.int32) * 0
                init = tuple(jnp.full((ncu + 1, k), fill, jnp.int32) + z0
                             for k in (n, n, nc, nc, nc, nc))
                _, ys = jax.lax.scan(step, init, (rc_all, valid_all))
                (cu_s, lv_y_s, lv_cb_s, lv_cr_s,
                 rec_y_s, rec_u_s, rec_v_s) = ys
                flat_cu = cu_s.reshape(-1)

                def collect(x, shape, dtype=None):
                    acc = jnp.zeros((ncu + 1,) + shape,
                                    x.dtype if dtype is None else dtype)
                    acc = acc.at[flat_cu].set(
                        x.reshape((-1,) + shape).astype(acc.dtype),
                        mode="drop")
                    return acc[:ncu]

                lv_y = collect(lv_y_s, (n, n))
                lv_cb = collect(lv_cb_s, (nc, nc))
                lv_cr = collect(lv_cr_s, (nc, nc))
                rec_y = collect(rec_y_s, (n, n))
                rec_u = collect(rec_u_s, (nc, nc))
                rec_v = collect(rec_v_s, (nc, nc))

            gq16 = lambda a: jnp.take(a, q16.reshape(-1), axis=0)
            rec3_full = (from_blocks(rec_y, n, H, W),
                         from_blocks(rec_u, nc, H // 2, W // 2),
                         from_blocks(rec_v, nc, H // 2, W // 2))
            if not cfg.dpb:
                rec_cat = jnp.concatenate([p.reshape(-1) for p in rec3_full])
                if bd > 8:
                    recon8 = jax.lax.bitcast_convert_type(
                        rec_cat.astype(jnp.int16), jnp.uint8).reshape(-1)
                else:
                    recon8 = rec_cat.astype(jnp.uint8)
            head_parts = [split.astype(jnp.uint8),
                          leaf[n]["ui"].astype(jnp.uint8),
                          leaf[n]["modes"].astype(jnp.uint8),
                          ui16_ctu.astype(jnp.uint8).reshape(-1),
                          im16_ctu.astype(jnp.uint8).reshape(-1)]
            if cfg.rqt:
                head_parts.append(leaf[n]["tu_split"].astype(jnp.uint8))
            (pdirA, mvA0x, mvA0y, mvA1x, mvA1y) = dense[n]
            (pdirB, mvB0x, mvB0y, mvB1x, mvB1y) = dense[h]
            if depth2:
                gq8 = lambda a: jnp.take(a, MAP8[:ncu].reshape(-1), axis=0)
                head_parts += [
                    jnp.take(split16, q16).astype(jnp.uint8).reshape(-1),
                    jnp.take(leaf[8]["ui"], MAP8[:ncu]).astype(
                        jnp.uint8).reshape(-1),
                    jnp.take(leaf[8]["modes"], MAP8[:ncu]).astype(
                        jnp.uint8).reshape(-1)]
                (pdirC, mvC0x, mvC0y, mvC1x, mvC1y) = dense[8]
            if cfg.bi:
                head_parts += [pdirA.astype(jnp.uint8),
                               gq16(pdirB).astype(jnp.uint8)]
                if depth2:
                    head_parts.append(gq8(pdirC).astype(jnp.uint8))
            head8 = jnp.concatenate(head_parts)
            mv_parts = [mvA0x, mvA0y, gq16(mvB0x), gq16(mvB0y)]
            if depth2:
                mv_parts += [gq8(mvC0x), gq8(mvC0y)]
            if cfg.bi:
                mv_parts += [mvA1x, mvA1y, gq16(mvB1x), gq16(mvB1y)]
                if depth2:
                    mv_parts += [gq8(mvC1x), gq8(mvC1y)]
            mv16_cat = jnp.concatenate([m.astype(jnp.int16) for m in mv_parts])
            mv8 = jax.lax.bitcast_convert_type(mv16_cat, jnp.uint8).reshape(-1)
            lv_cat = jnp.concatenate([
                lv_y.reshape(-1), lv_cb.reshape(-1), lv_cr.reshape(-1)])
            if compact:
                # levels as int8 PAIRS in uint16 lanes (halves the
                # dominant device->host transfer; same trick as the
                # intra uniform path) + 1-byte overflow flag at the
                # buffer end -> rare frames rerun via the lazily
                # compiled int16 variant
                overflow = ((lv_cat > 127) | (lv_cat < -128)).any()
                pairs = lv_cat.reshape(-1, 2)
                packed = ((pairs[:, 0] & 0xff)
                          | ((pairs[:, 1] & 0xff) << 8)
                          ).astype(jnp.uint16)
                levels8 = jax.lax.bitcast_convert_type(
                    packed, jnp.uint8).reshape(-1)
                flag = overflow.astype(jnp.uint8).reshape(1)
            else:
                levels8 = jax.lax.bitcast_convert_type(
                    lv_cat.astype(jnp.int16), jnp.uint8).reshape(-1)
                flag = jnp.zeros((1,), jnp.uint8)
            if not cfg.dpb:
                return jnp.concatenate([recon8, head8, mv8, levels8,
                                        flag])
            # ---- device-resident DPB: in-jit loop filters, recon as
            # separate device outputs (never enters the download buffer)
            from ..ops import filters_dev as FD
            dec_buf = jnp.concatenate([head8, mv8, levels8, flag])
            ui_sizes = (leaf[n]["ui"], leaf[h]["ui"],
                        leaf[8]["ui"] if depth2 else None)
            mv_sizes = ((dense[n][1], dense[n][2], dense[n][3], dense[n][4]),
                        (dense[h][1], dense[h][2], dense[h][3], dense[h][4]),
                        ((dense[8][1], dense[8][2], dense[8][3], dense[8][4])
                         if depth2 else None))
            pdir_sizes = (dense[n][0], dense[h][0],
                          dense[8][0] if depth2 else None)
            sp16_r = split16 if depth2 else None
            out3, sao_arrs = FD.qt_loopfilter_dev(
                rec3_full, (y32, u32, v32), qp_cu, slice_qp,
                split, sp16_r, ui_sizes, mv_sizes, pdir_sizes,
                (lv_y, lv_cb, lv_cr), rows, cols, depth2,
                cfg.deblock, cfg.sao, bd)
            pdt_o = jnp.uint16 if bd > 8 else jnp.uint8
            outs = (dec_buf,) + tuple(p.astype(pdt_o) for p in out3)
            if sao_arrs is not None:
                outs = outs + (FD.pack_sao_params(sao_arrs),)
            return outs

        return encode
    # ------------------------------------------------------------------
    def _unpack_qt(self, buf: np.ndarray,
                   compact: bool = True) -> dict:
        cfg = self.cfg
        n, nc = cfg.cu_size, cfg.cu_size // 2
        rows, cols, ncu = cfg.rows, cfg.cols, cfg.rows * cfg.cols
        W, H = cfg.width, cfg.height
        ny, nuv = H * W, (H // 2) * (W // 2)
        bsz = 2 if cfg.bit_depth > 8 else 1
        o = 0
        def plane(count, hh, ww):
            nonlocal o
            raw = buf[o:o + count * bsz]
            o += count * bsz
            if bsz == 2:
                return raw.view(np.int16).reshape(hh, ww)
            return raw.reshape(hh, ww)
        rec_y = rec_u = rec_v = None
        if not cfg.dpb:
            rec_y = plane(ny, H, W)
            rec_u = plane(nuv, H // 2, W // 2)
            rec_v = plane(nuv, H // 2, W // 2)
        split = buf[o:o + ncu].astype(bool).reshape(rows, cols); o += ncu
        use_intra = buf[o:o + ncu].astype(bool).reshape(rows, cols); o += ncu
        modes = buf[o:o + ncu].astype(np.int32).reshape(rows, cols); o += ncu
        ui4 = buf[o:o + 4 * ncu].astype(bool).reshape(rows, cols, 4); o += 4 * ncu
        m4 = buf[o:o + 4 * ncu].astype(np.int32).reshape(rows, cols, 4); o += 4 * ncu
        tu_split32 = None
        if cfg.rqt:
            tu_split32 = buf[o:o + ncu].astype(bool).reshape(rows, cols)
            o += ncu
        depth2 = cfg.max_depth >= 2
        split16 = ui8 = m8 = None
        if depth2:
            split16 = buf[o:o + 4 * ncu].astype(bool).reshape(rows, cols, 4)
            o += 4 * ncu
            ui8 = buf[o:o + 16 * ncu].astype(bool).reshape(rows, cols, 4, 4)
            o += 16 * ncu
            m8 = buf[o:o + 16 * ncu].astype(np.int32).reshape(rows, cols, 4, 4)
            o += 16 * ncu
        pdir = pdir4 = pdir8 = None
        if cfg.bi:
            pdir = buf[o:o + ncu].astype(np.int32).reshape(rows, cols); o += ncu
            pdir4 = buf[o:o + 4 * ncu].astype(np.int32).reshape(rows, cols, 4)
            o += 4 * ncu
            if depth2:
                pdir8 = (buf[o:o + 16 * ncu].astype(np.int32)
                         .reshape(rows, cols, 4, 4))
                o += 16 * ncu
        per_list = 10 * ncu + (32 * ncu if depth2 else 0)
        nmv_units = per_list * (2 if cfg.bi else 1)
        mv = buf[o:o + 2 * nmv_units].view(np.int16); o += 2 * nmv_units
        k = 0
        def take(count, shape):
            nonlocal k
            a = mv[k:k + count].astype(np.int32).reshape(shape)
            k += count
            return a
        mvx = take(ncu, (rows, cols))
        mvy = take(ncu, (rows, cols))
        mv4x = take(4 * ncu, (rows, cols, 4))
        mv4y = take(4 * ncu, (rows, cols, 4))
        mv8x = mv8y = mv81x = mv81y = None
        if depth2:
            mv8x = take(16 * ncu, (rows, cols, 4, 4))
            mv8y = take(16 * ncu, (rows, cols, 4, 4))
        mv1x = mv1y = mv41x = mv41y = None
        if cfg.bi:
            mv1x = take(ncu, (rows, cols))
            mv1y = take(ncu, (rows, cols))
            mv41x = take(4 * ncu, (rows, cols, 4))
            mv41y = take(4 * ncu, (rows, cols, 4))
            if depth2:
                mv81x = take(16 * ncu, (rows, cols, 4, 4))
                mv81y = take(16 * ncu, (rows, cols, 4, 4))
        if compact:
            lv = buf[o:-1].view(np.int8)
        else:
            lv = buf[o:-1].view(np.int16)
        sy, sc = ncu * n * n, ncu * nc * nc
        return {
            "split": split, "tu_split32": tu_split32,
            "use_intra": use_intra, "modes": modes, "mvx": mvx, "mvy": mvy,
            "use_intra4": ui4, "modes4": m4, "mv4x": mv4x, "mv4y": mv4y,
            "split16": split16, "use_intra8": ui8, "modes8": m8,
            "mv8x": mv8x, "mv8y": mv8y, "mv81x": mv81x, "mv81y": mv81y,
            "pdir": pdir, "pdir4": pdir4, "pdir8": pdir8,
            "mv1x": mv1x, "mv1y": mv1y, "mv41x": mv41x, "mv41y": mv41y,
            "levels_y": lv[:sy].astype(np.int32).reshape(rows, cols, n, n),
            "levels_cb": lv[sy:sy + sc].astype(np.int32).reshape(rows, cols, nc, nc),
            "levels_cr": lv[sy + sc:sy + 2 * sc].astype(np.int32).reshape(rows, cols, nc, nc),
            "recon_y": None if rec_y is None else rec_y.astype(np.int32),
            "recon_u": None if rec_u is None else rec_u.astype(np.int32),
            "recon_v": None if rec_v is None else rec_v.astype(np.int32),
        }

    # ------------------------------------------------------------------
    def _unpack(self, buf: np.ndarray, compact: bool = True) -> dict:
        cfg = self.cfg
        n, nc = cfg.cu_size, cfg.cu_size // 2
        rows, cols, ncu = cfg.rows, cfg.cols, cfg.rows * cfg.cols
        W, H = cfg.width, cfg.height
        ny, nuv = H * W, (H // 2) * (W // 2)
        bsz = 2 if cfg.bit_depth > 8 else 1
        o = 0
        def plane(count, hh, ww):
            nonlocal o
            raw = buf[o:o + count * bsz]
            o += count * bsz
            if bsz == 2:
                return raw.view(np.int16).reshape(hh, ww)
            return raw.reshape(hh, ww)
        rec_y = plane(ny, H, W)
        rec_u = plane(nuv, H // 2, W // 2)
        rec_v = plane(nuv, H // 2, W // 2)
        use_intra = buf[o:o + ncu].reshape(rows, cols).astype(bool); o += ncu
        imode = buf[o:o + ncu].astype(np.int32).reshape(rows, cols); o += ncu
        pdir = None
        if cfg.bi:
            pdir = buf[o:o + ncu].astype(np.int32).reshape(rows, cols); o += ncu
        ref_sel = None
        if cfg.n_refs > 1:
            ref_sel = buf[o:o + ncu].astype(np.int32).reshape(rows, cols)
            o += ncu
        nmv = 8 * ncu if cfg.bi else 4 * ncu
        mv = buf[o:o + nmv].view(np.int16); o += nmv
        mvx = mv[:ncu].astype(np.int32).reshape(rows, cols)
        mvy = mv[ncu:2 * ncu].astype(np.int32).reshape(rows, cols)
        mv1x = mv1y = None
        if cfg.bi:
            mv1x = mv[2 * ncu:3 * ncu].astype(np.int32).reshape(rows, cols)
            mv1y = mv[3 * ncu:4 * ncu].astype(np.int32).reshape(rows, cols)
        lv = buf[o:-1].view(np.int8 if compact else np.int16)
        sy, sc = ncu * n * n, ncu * nc * nc
        return {
            "use_intra": use_intra,
            "modes": imode,
            "mvx": mvx, "mvy": mvy, "ref": ref_sel,
            "pdir": pdir, "mv1x": mv1x, "mv1y": mv1y,
            "levels_y": lv[:sy].astype(np.int32).reshape(rows, cols, n, n),
            "levels_cb": lv[sy:sy + sc].astype(np.int32).reshape(rows, cols, nc, nc),
            "levels_cr": lv[sy + sc:sy + 2 * sc].astype(np.int32).reshape(rows, cols, nc, nc),
            "recon_y": rec_y.astype(np.int32),
            "recon_u": rec_u.astype(np.int32),
            "recon_v": rec_v.astype(np.int32),
        }
