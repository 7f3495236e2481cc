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
        nd, ns, rc, valid = wavefront_schedule(cfg.rows, cfg.cols, slope=2)
        self.num_diags = nd
        self.num_slots = ns
        self._rc = jnp.asarray(rc)
        self._valid = jnp.asarray(valid)
        self._encode = jax.jit(self._build_qt() if cfg.max_depth
                               else self._build())

    def encode_frame(self, y, u, v, ref_y, ref_u, ref_v, qp: int = None,
                     ref1_y=None, ref1_u=None, ref1_v=None,
                     weights=None, hint_mvx=None, hint_mvy=None):
        """All planes padded to coded size. ref_* are the decoded reference
        planes (L0; ref1_* = L1 when cfg.bi). weights (cfg.weightp): dict
        {'luma': (w, o)|None, 'cb': ..., 'cr': ...}, denom 6; None entries
        use the identity weight. Returns decision dict (numpy)."""
        qp = self.cfg.qp if qp is None else qp
        pdt = jnp.uint16 if self.cfg.bit_depth > 8 else jnp.uint8
        a = lambda x: jnp.asarray(x, pdt)
        if self.cfg.bi:
            buf = np.asarray(self._encode(
                a(y), a(u), a(v), a(ref_y), a(ref_u), a(ref_v),
                a(ref1_y), a(ref1_u), a(ref1_v), jnp.asarray(qp, jnp.int32)))
        elif self.cfg.weightp:
            weights = weights or {}
            wargs = []
            for comp in ("luma", "cb", "cr"):
                w, o = weights.get(comp) or (64, 0)
                wargs += [jnp.int32(w), jnp.int32(o)]
            buf = np.asarray(self._encode(
                a(y), a(u), a(v), a(ref_y), a(ref_u), a(ref_v),
                jnp.asarray(qp, jnp.int32), *wargs))
        elif self.cfg.analysis_load:
            buf = np.asarray(self._encode(
                a(y), a(u), a(v), a(ref_y), a(ref_u), a(ref_v),
                jnp.asarray(qp, jnp.int32), jnp.asarray(hint_mvx, jnp.int32),
                jnp.asarray(hint_mvy, jnp.int32)))
        else:
            buf = np.asarray(self._encode(
                a(y), a(u), a(v), a(ref_y), a(ref_u), a(ref_v), jnp.asarray(qp, jnp.int32)))
        return self._unpack_qt(buf) if self.cfg.max_depth else self._unpack(buf)

    # ------------------------------------------------------------------
    def _build(self):
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
            if cfg.bi:
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
            head8 = jnp.concatenate(head_parts).astype(jnp.uint8)
            mv_parts = [mvx.astype(jnp.int16), mvy.astype(jnp.int16)]
            if cfg.bi:
                mv_parts += [mv1x.astype(jnp.int16), mv1y.astype(jnp.int16)]
            mv16 = jnp.concatenate(mv_parts)
            mv8 = jax.lax.bitcast_convert_type(mv16, jnp.uint8).reshape(-1)
            levels16 = jnp.concatenate([
                lv_y.reshape(-1), lv_cb.reshape(-1), lv_cr.reshape(-1)
            ]).astype(jnp.int16)
            levels8 = jax.lax.bitcast_convert_type(levels16, jnp.uint8).reshape(-1)
            return jnp.concatenate([recon8, head8, mv8, levels8])

        return encode

    # ------------------------------------------------------------------
    def _build_qt(self):
        """Inter CTU32 wavefront with in-scan quadtree RD (depth 1 or 2:
        CUs of 32/16 or 32/16/8), P or B.

        Dense phase: full-search + subpel ME at every CU size (and both
        lists + bi selection for B) — candidate depths/lists are batch
        axes, the TPU formulation of the reference's recursive
        compressInterCU (analysis.cpp:1146). Wavefront phase: per CTU,
        bottom-up RD split selection with exact local reference
        propagation through a CTU-local recon tile (qt_common.block_v).
        """
        from .qt_common import block_v, QOFF
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

        def to_blocks(plane, nn):
            hh, ww = plane.shape
            return (plane.reshape(hh // nn, nn, ww // nn, nn)
                    .transpose(0, 2, 1, 3).reshape(-1, nn, nn))

        def from_blocks(blocks, nn, hh, ww):
            return (blocks.reshape(hh // nn, ww // nn, nn, nn)
                    .transpose(0, 2, 1, 3).reshape(hh, ww))

        # block-grid geometry per size + CTU -> block-index maps (z-order)
        g32r = np.arange(ncu, dtype=np.int32) // cols
        g32c = np.arange(ncu, dtype=np.int32) % cols
        PX32 = jnp.asarray(g32c * n)
        PY32 = jnp.asarray(g32r * n)
        cols16 = cols * 2
        PX16 = jnp.asarray((np.arange(n16, dtype=np.int32) % cols16) * h)
        PY16 = jnp.asarray((np.arange(n16, dtype=np.int32) // cols16) * h)
        cols8 = cols * 4
        PX8 = jnp.asarray((np.arange(n8, dtype=np.int32) % cols8) * 8)
        PY8 = jnp.asarray((np.arange(n8, dtype=np.int32) // cols8) * 8)
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

        def search_size(yb, ref_y, px, py, nn, low=None):
            center = None
            if low is not None:
                # HME: coarse half-res search recenters the fine window
                # (reference --hme quarter/half-res pre-search, lowres.h:43)
                low_ref, low_blocks = low
                cmx, cmy, _ = me.full_search_sad(
                    low_ref, low_blocks, px // 2, py // 2, nn // 2,
                    cfg.hme_range, lambda_bits=2, xp=jnp)
                center = (cmx * 2, cmy * 2)
            mvx_i, mvy_i, _ = me.full_search_sad(
                ref_y, yb, px, py, nn, R, lambda_bits=2, xp=jnp,
                center=center)
            mvx = mvx_i * 4
            mvy = mvy_i * 4

            def eval_mv(mx, my):
                p = interp.mc_luma_qpel(ref_y, px, py, mx, my, nn, bd, xp=jnp)
                return pixel.satd(yb, p, xp=jnp)

            if cfg.subpel:
                best = eval_mv(mvx, mvy)
                for stepq in (2, 1):
                    cand_best = best
                    bx, by = mvx, mvy
                    for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1),
                                   (-1, -1), (1, -1), (-1, 1), (1, 1)):
                        mx = mvx + dx * stepq
                        my = mvy + dy * stepq
                        cc = eval_mv(mx, my)
                        better = cc < cand_best
                        bx = jnp.where(better, mx, bx)
                        by = jnp.where(better, my, by)
                        cand_best = jnp.minimum(cc, cand_best)
                    mvx, mvy, best = bx, by, cand_best
            else:
                best = eval_mv(mvx, mvy)
            return mvx, mvy, best

        def mc_all(refs, mvx, mvy, px, py, nn):
            ref_y, ref_u, ref_v = refs
            p_y = interp.mc_luma_qpel(ref_y, px, py, mvx, mvy, nn, bd, xp=jnp)
            p_u = interp.mc_chroma_qpel(ref_u, px // 2, py // 2, mvx, mvy,
                                        nn // 2, bd, xp=jnp)
            p_v = interp.mc_chroma_qpel(ref_v, px // 2, py // 2, mvx, mvy,
                                        nn // 2, bd, xp=jnp)
            return p_y, p_u, p_v

        def tq(resid, qp, log2nn, luma=True, is_intra=None, modes=None):
            coef = transforms.forward_transform(resid, bd, xp=jnp)
            if cfg.rdoq:
                levels = quant.quant_rdoq(
                    coef, qp, log2nn, bd,
                    psy_scale=cfg.psy_rdoq if luma else 0.0, xp=jnp)
            else:
                levels, du = quant.quant(coef, qp, log2nn, bd, False, xp=jnp)
                if cfg.sbh:
                    if modes is not None:
                        # intra-in-P TUs <= 8x8 luma / 4x4 chroma use the
                        # mode-dependent scan; SBH parity must match it
                        levels = quant.sign_bit_hiding_mdcs(
                            levels, du, log2nn, modes, luma, xp=jnp,
                            is_intra=is_intra)
                    else:
                        levels = quant.sign_bit_hiding(levels, du, log2nn,
                                                       xp=jnp)
            dq = quant.dequant(levels, qp, log2nn, bd, xp=jnp)
            rr = transforms.inverse_transform(dq, bd, xp=jnp)
            return levels, rr

        def est_mv_bits_arr(mvx, mvy):
            ax = jnp.abs(mvx).astype(jnp.float32)
            ay = jnp.abs(mvy).astype(jnp.float32)
            return 4.0 + 2.0 * jnp.log2(1.0 + ax) + 2.0 * jnp.log2(1.0 + ay)

        def ps_all(refs, mvx, mvy, px, py, nn):
            return (interp.mc_luma_qpel_ps(refs[0], px, py, mvx, mvy, nn,
                                           bd, xp=jnp),
                    interp.mc_chroma_qpel_ps(refs[1], px // 2, py // 2,
                                             mvx, mvy, nn // 2, bd, xp=jnp),
                    interp.mc_chroma_qpel_ps(refs[2], px // 2, py // 2,
                                             mvx, mvy, nn // 2, bd, xp=jnp))

        def decide_motion(yb, refs0, refs1, px, py, nn, qp_s,
                          low0=None, low1=None, wts=None):
            """Per-block motion decision at one size (P: L0 only; B:
            SATD + lambda*bits over L0/L1/BI, search.cpp analog). wts:
            explicit weighted uni-prediction (P) — search over the
            weight-transformed reference, predict through the normative
            MC->weight pipeline."""
            if wts is not None:
                (wy, oy), (wcb, ocb), (wcr, ocr) = wts
                ref_w = jnp.clip(jnp.right_shift(refs0[0] * wy + 32, 6) + oy,
                                 0, maxv)
                mv0x, mv0y, s0 = search_size(yb, ref_w, px, py, nn, low0)
                pred = (interp.weight_uni(
                            interp.mc_luma_qpel_ps(refs0[0], px, py,
                                                   mv0x, mv0y, nn, bd,
                                                   xp=jnp),
                            wy, oy, 6, bd, xp=jnp),
                        interp.weight_uni(
                            interp.mc_chroma_qpel_ps(refs0[1], px // 2,
                                                     py // 2, mv0x, mv0y,
                                                     nn // 2, bd, xp=jnp),
                            wcb, ocb, 6, bd, xp=jnp),
                        interp.weight_uni(
                            interp.mc_chroma_qpel_ps(refs0[2], px // 2,
                                                     py // 2, mv0x, mv0y,
                                                     nn // 2, bd, xp=jnp),
                            wcr, ocr, 6, bd, xp=jnp))
                s0 = pixel.satd(yb, pred[0], xp=jnp)
                bits = est_mv_bits_arr(mv0x, mv0y)
                ones = jnp.ones_like(mv0x)
                return (ones, mv0x, mv0y, mv0x * 0, mv0y * 0, pred, s0, bits)
            mv0x, mv0y, s0 = search_size(yb, refs0[0], px, py, nn, low0)
            if refs1 is None:
                pred = mc_all(refs0, mv0x, mv0y, px, py, nn)
                bits = est_mv_bits_arr(mv0x, mv0y)
                ones = jnp.ones_like(mv0x)
                return (ones, mv0x, mv0y, mv0x * 0, mv0y * 0, pred, s0, bits)
            mv1x, mv1y, s1 = search_size(yb, refs1[0], px, py, nn, low1)
            p0 = mc_all(refs0, mv0x, mv0y, px, py, nn)
            p1 = mc_all(refs1, mv1x, mv1y, px, py, nn)
            ps0 = ps_all(refs0, mv0x, mv0y, px, py, nn)
            ps1 = ps_all(refs1, mv1x, mv1y, px, py, nn)
            pbi = tuple(interp.add_avg(a, b, bd, xp=jnp)
                        for a, b in zip(ps0, ps1))
            sbi = pixel.satd(yb, pbi[0], xp=jnp)
            lam = 0.9 * jnp.exp2((qp_s.astype(jnp.float32) - 12.0) / 6.0)
            b0 = est_mv_bits_arr(mv0x, mv0y)
            b1 = est_mv_bits_arr(mv1x, mv1y)
            costs = jnp.stack([s0 + lam * b0, s1 + lam * (b1 + 1.0),
                               sbi + lam * (b0 + b1 + 2.0)], axis=1)
            sel = jnp.argmin(costs, axis=1).astype(jnp.int32)
            pdir = jnp.where(sel == 2, 3, sel + 1)

            def pick(a, b, c):
                s_ = sel[:, None, None]
                return jnp.where(s_ == 0, a, jnp.where(s_ == 1, b, c))

            pred = tuple(pick(a, b, c) for a, b, c in zip(p0, p1, pbi))
            ar = jnp.arange(s0.shape[0])
            satd_sel = jnp.stack([s0, s1, sbi], 1)[ar, sel]
            bits_sel = jnp.stack([b0, b1 + 1.0, b0 + b1 + 2.0], 1)[ar, sel]
            m0 = (pdir & 1).astype(mv0x.dtype)
            m1 = ((pdir & 2) >> 1).astype(mv1x.dtype)
            return (pdir, mv0x * m0, mv0y * m0, mv1x * m1, mv1y * m1,
                    pred, satd_sel, bits_sel)

        def intra_block(v_raw, av, src, qp, log2nn, luma, modes=None):
            v = intra.substitute_references(v_raw, av, bd, xp=jnp)
            nn = 1 << log2nn
            preds = intra.predict_all_modes_matmul(v, nn, bd, luma=luma,
                                                   strong_smoothing=False,
                                                   xp=jnp)
            if modes is None:
                costs = pixel.satd(src[:, None], preds, xp=jnp)
                modes = jnp.argmin(costs, axis=1).astype(jnp.int32)
                best = jnp.min(costs, axis=1)
            else:
                best = None
            pred = jnp.take_along_axis(
                preds, modes[:, None, None, None].astype(jnp.int32),
                axis=1)[:, 0]
            return modes, best, pred

        def ssd(a, b):
            d = (a - b).astype(jnp.float32)
            return jnp.sum(d * d, axis=(-2, -1))

        def make_step(srcs, ipreds, qp_y_pad, qp_c_pad, qp_sig_pad):
            """ipreds: dict size -> (pred_y pad, pred_u pad, pred_v pad,
            satd pad, mvbits pad, idx_map gather fn)."""
            src_yb, src_ub, src_vb = srcs

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

                src_y = jnp.take(src_yb, cu_s, axis=0)
                src_u = jnp.take(src_ub, cu_s, axis=0)
                src_v = jnp.take(src_vb, cu_s, axis=0)
                qp_y = jnp.take(qp_y_pad, cu_s)
                qp_c = jnp.take(qp_c_pad, cu_s)
                qp_sig = jnp.take(qp_sig_pad, cu_s)
                lam2 = 0.85 * jnp.exp2((qp_sig.astype(jnp.float32) - 12.0)
                                       / 3.0)

                nb_y = (jnp.take(rcy, gl, axis=0), jnp.take(bry, gt, axis=0),
                        jnp.take(bry, gtr, axis=0), jnp.take(bry, gtl, axis=0))
                nb_u = (jnp.take(rcu_, gl, axis=0), jnp.take(bru, gt, axis=0),
                        jnp.take(bru, gtr, axis=0), jnp.take(bru, gtl, axis=0))
                nb_v = (jnp.take(rcv, gl, axis=0), jnp.take(brv, gt, axis=0),
                        jnp.take(brv, gtr, axis=0), jnp.take(brv, gtl, axis=0))
                flags = (al, at, atr, atl)

                def code_at(tiles, y0, x0, nn, blk_idx):
                    """One inter/intra CU at (y0, x0), size nn. blk_idx: [S]
                    index into the size's dense-phase arrays."""
                    p_y, p_u, p_v, satd, mvbits = ipreds[nn]
                    ty, tu, tv = tiles
                    sy = src_y[:, y0:y0 + nn, x0:x0 + nn]
                    yc, xc = y0 // 2, x0 // 2
                    hc2 = nn // 2
                    su = src_u[:, yc:yc + hc2, xc:xc + hc2]
                    sv = src_v[:, yc:yc + hc2, xc:xc + hc2]
                    vy, ay = block_v(ty, *nb_y, *flags, y0, x0, nn)
                    imq, ibq, ip_y = intra_block(vy, ay, sy, qp_y,
                                                 nn.bit_length() - 1, True)
                    isq = jnp.take(satd, blk_idx)
                    uiq = (ibq + cfg.intra_bias) < isq
                    selq = uiq[:, None, None]
                    pred_y = jnp.where(selq, ip_y, jnp.take(p_y, blk_idx,
                                                            axis=0))
                    vu, au = block_v(tu, *nb_u, *flags, yc, xc, hc2)
                    _, _, ip_u = intra_block(vu, au, su, qp_c,
                                             hc2.bit_length() - 1, False, imq)
                    vv, av_ = block_v(tv, *nb_v, *flags, yc, xc, hc2)
                    _, _, ip_v = intra_block(vv, av_, sv, qp_c,
                                             hc2.bit_length() - 1, False, imq)
                    pred_u = jnp.where(selq, ip_u, jnp.take(p_u, blk_idx,
                                                            axis=0))
                    pred_v = jnp.where(selq, ip_v, jnp.take(p_v, blk_idx,
                                                            axis=0))
                    lvq_y, rr_y = tq(sy - pred_y, qp_y, nn.bit_length() - 1,
                                     is_intra=uiq, modes=imq)
                    lvq_cb, rr_u = tq(su - pred_u, qp_c,
                                      hc2.bit_length() - 1, luma=False,
                                      is_intra=uiq, modes=imq)
                    lvq_cr, rr_v = tq(sv - pred_v, qp_c,
                                      hc2.bit_length() - 1, luma=False,
                                      is_intra=uiq, modes=imq)
                    rec_y = jnp.clip(pred_y + rr_y, 0, maxv)
                    rec_u = jnp.clip(pred_u + rr_u, 0, maxv)
                    rec_v = jnp.clip(pred_v + rr_v, 0, maxv)
                    dist = ssd(sy, rec_y) + ssd(su, rec_u) + ssd(sv, rec_v)
                    if cfg.psy_rd > 0:
                        dist = dist + cfg.psy_rd * jnp.abs(
                            pixel.psy_energy(sy, xp=jnp)
                            - pixel.psy_energy(rec_y, xp=jnp)
                        ).astype(jnp.float32)
                    bits = (quant.est_tu_bits(lvq_y, xp=jnp)
                            + quant.est_tu_bits(lvq_cb, xp=jnp)
                            + quant.est_tu_bits(lvq_cr, xp=jnp)
                            + jnp.where(uiq, MODE_BITS,
                                        jnp.take(mvbits, blk_idx)))
                    return (uiq, imq, lvq_y, rec_y, lvq_cb, rec_u,
                            lvq_cr, rec_v, dist, bits)

                def put(tiles, lvs, y0, x0, nn, rec3, lv3):
                    ty, tu, tv = tiles
                    ly, lcb, lcr = lvs
                    yc, xc = y0 // 2, x0 // 2
                    hc2 = nn // 2
                    return ((ty.at[:, y0:y0 + nn, x0:x0 + nn].set(rec3[0]),
                             tu.at[:, yc:yc + hc2, xc:xc + hc2].set(rec3[1]),
                             tv.at[:, yc:yc + hc2, xc:xc + hc2].set(rec3[2])),
                            (ly.at[:, y0:y0 + nn, x0:x0 + nn].set(lv3[0]),
                             lcb.at[:, yc:yc + hc2, xc:xc + hc2].set(lv3[1]),
                             lcr.at[:, yc:yc + hc2, xc:xc + hc2].set(lv3[2])))

                zt = (jnp.zeros((S, n, n), jnp.int32),
                      jnp.zeros((S, nc, nc), jnp.int32),
                      jnp.zeros((S, nc, nc), jnp.int32))

                # ---- variant A: one 32 CU ----
                (uiA, imA, lvA_y, recA_y, lvA_cb, recA_u, lvA_cr, recA_v,
                 distA, bitsA) = code_at(zt, 0, 0, n, cu_s)
                bitsA = bitsA + 1.0

                # ---- variant B: quadrants ----
                tiles, lvs = zt, zt
                ui16, im16, split16, ui8, im8 = [], [], [], [], []
                distB = jnp.zeros((S,), jnp.float32)
                bitsB = jnp.zeros((S,), jnp.float32)
                for q, (qy, qx) in enumerate(QOFF):
                    y0, x0 = qy * h, qx * h
                    i16 = jnp.take(MAP16[:, q], cu_s)
                    (u16, m16, l16y, r16y, l16cb, r16u, l16cr, r16v,
                     d16, b16) = code_at(tiles, y0, x0, h, i16)
                    ui16.append(u16)
                    im16.append(m16)
                    if not depth2:
                        tiles, lvs = put(tiles, lvs, y0, x0, h,
                                         (r16y, r16u, r16v),
                                         (l16y, l16cb, l16cr))
                        distB = distB + d16
                        bitsB = bitsB + b16
                        continue
                    t8, lv8 = tiles, lvs
                    u8q, m8q = [], []
                    d8 = jnp.zeros((S,), jnp.float32)
                    b8 = jnp.zeros((S,), jnp.float32)
                    for sq, (sy_, sx_) in enumerate(QOFF):
                        yy, xx = y0 + 8 * sy_, x0 + 8 * sx_
                        i8 = jnp.take(MAP8[:, q, sq], cu_s)
                        (u8, m8, l8y, r8y, l8cb, r8u, l8cr, r8v,
                         dd, bb) = code_at(t8, yy, xx, 8, i8)
                        t8, lv8 = put(t8, lv8, yy, xx, 8,
                                      (r8y, r8u, r8v), (l8y, l8cb, l8cr))
                        u8q.append(u8)
                        m8q.append(m8)
                        d8 = d8 + dd
                        b8 = b8 + bb
                    sp16 = (d8 + lam2 * (b8 + 1.0)) < (d16 + lam2 * (b16 + 1.0))
                    sel = sp16[:, None, None]
                    rec_sel = tuple(
                        jnp.where(sel, t8[i][:, a:a + k, b:b + k],
                                  (r16y, r16u, r16v)[i])
                        for i, (a, b, k) in enumerate(
                            ((y0, x0, h), (y0 // 2, x0 // 2, 8),
                             (y0 // 2, x0 // 2, 8))))
                    lv_sel = tuple(
                        jnp.where(sel, lv8[i][:, a:a + k, b:b + k],
                                  (l16y, l16cb, l16cr)[i])
                        for i, (a, b, k) in enumerate(
                            ((y0, x0, h), (y0 // 2, x0 // 2, 8),
                             (y0 // 2, x0 // 2, 8))))
                    tiles, lvs = put(tiles, lvs, y0, x0, h, rec_sel, lv_sel)
                    split16.append(sp16)
                    ui8.append(jnp.stack(u8q, 1))
                    im8.append(jnp.stack(m8q, 1))
                    distB = distB + jnp.where(sp16, d8, d16)
                    bitsB = bitsB + jnp.where(sp16, b8 + 1.0, b16 + 1.0)

                bitsB = bitsB + 1.0
                split = (distB + lam2 * bitsB) < (distA + lam2 * bitsA)

                sel = split[:, None, None]
                rec_y = jnp.where(sel, tiles[0], recA_y)
                rec_u = jnp.where(sel, tiles[1], recA_u)
                rec_v = jnp.where(sel, tiles[2], recA_v)
                lv_y = jnp.where(sel, lvs[0], lvA_y)
                lv_cb = jnp.where(sel, lvs[1], lvA_cb)
                lv_cr = jnp.where(sel, lvs[2], lvA_cr)

                bry = bry.at[cu_s].set(rec_y[:, n - 1, :], mode="drop")
                rcy = rcy.at[cu_s].set(rec_y[:, :, n - 1], mode="drop")
                bru = bru.at[cu_s].set(rec_u[:, nc - 1, :], mode="drop")
                rcu_ = rcu_.at[cu_s].set(rec_u[:, :, nc - 1], mode="drop")
                brv = brv.at[cu_s].set(rec_v[:, nc - 1, :], mode="drop")
                rcv = rcv.at[cu_s].set(rec_v[:, :, nc - 1], mode="drop")

                ys = [cu_s, split, uiA, imA,
                      jnp.stack(ui16, 1), jnp.stack(im16, 1),
                      lv_y, lv_cb, lv_cr, rec_y, rec_u, rec_v]
                if depth2:
                    ys.insert(6, jnp.stack(split16, 1))       # [S, 4]
                    ys.insert(7, jnp.stack(ui8, 1))           # [S, 4, 4]
                    ys.insert(8, jnp.stack(im8, 1))           # [S, 4, 4]
                return (bry, rcy, bru, rcu_, brv, rcv), tuple(ys)
            return step

        def encode(y, u, v, ref_y, ref_u, ref_v, *rest):
            wts = None
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
            qp_sig_pad = jnp.concatenate([qp_cu, qp_cu[:1]])
            y32 = y.astype(jnp.int32)
            u32 = u.astype(jnp.int32)
            v32 = v.astype(jnp.int32)
            refs = (ref_y.astype(jnp.int32), ref_u.astype(jnp.int32),
                    ref_v.astype(jnp.int32))
            refs1 = None
            if cfg.bi:
                refs1 = (ref1_y.astype(jnp.int32), ref1_u.astype(jnp.int32),
                         ref1_v.astype(jnp.int32))
            qp_max = jnp.max(qp_sig) if qp_sig.ndim else qp_sig

            sizes = [(n, PX32, PY32), (h, PX16, PY16)]
            if depth2:
                sizes.append((8, PX8, PY8))
            low_y = low0_ref = low1_ref = None
            if cfg.hme:
                from .lookahead import downscale_half
                low_y = downscale_half(y32, xp=jnp)
                low0_ref = downscale_half(refs[0], xp=jnp)
                if refs1 is not None:
                    low1_ref = downscale_half(refs1[0], xp=jnp)
            dense = {}
            for nn, px, py in sizes:
                yb = to_blocks(y32, nn)
                l0 = l1 = None
                if cfg.hme:
                    lb = (low_y.reshape(H // 2 // (nn // 2), nn // 2,
                                        W // 2 // (nn // 2), nn // 2)
                          .transpose(0, 2, 1, 3).reshape(-1, nn // 2, nn // 2))
                    l0 = (low0_ref, lb)
                    if low1_ref is not None:
                        l1 = (low1_ref, lb)
                dense[nn] = decide_motion(yb, refs, refs1, px, py, nn, qp_max,
                                          l0, l1, wts)

            def padded(a, shape):
                return jnp.concatenate([a, jnp.zeros((1,) + shape, a.dtype)], 0)

            def pad1(a):
                return jnp.concatenate([a, jnp.zeros((1,), a.dtype)])

            ipreds = {}
            for nn, _, _ in sizes:
                (_, _, _, _, _, pred, satd, mvbits) = dense[nn]
                ipreds[nn] = (padded(pred[0], (nn, nn)),
                              padded(pred[1], (nn // 2, nn // 2)),
                              padded(pred[2], (nn // 2, nn // 2)),
                              pad1(satd), pad1(mvbits))

            srcs = (padded(to_blocks(y32, n), (n, n)),
                    padded(to_blocks(u32, nc), (nc, nc)),
                    padded(to_blocks(v32, nc), (nc, nc)))
            step = make_step(srcs, ipreds, qp_y_pad, qp_c_pad, qp_sig_pad)
            z0 = y.reshape(-1)[0].astype(jnp.int32) * 0
            init = tuple(jnp.full((ncu + 1, k), fill, jnp.int32) + z0
                         for k in (n, n, nc, nc, nc, nc))
            _, ys = jax.lax.scan(step, init, (rc_all, valid_all))
            if depth2:
                (cu_s, split_s, uiA_s, imA_s, ui16_s, im16_s, split16_s,
                 ui8_s, im8_s, lv_y_s, lv_cb_s, lv_cr_s,
                 rec_y_s, rec_u_s, rec_v_s) = ys
            else:
                (cu_s, split_s, uiA_s, imA_s, ui16_s, im16_s,
                 lv_y_s, lv_cb_s, lv_cr_s, rec_y_s, rec_u_s, rec_v_s) = ys
            flat_cu = cu_s.reshape(-1)

            def collect(x, shape, dtype=None):
                acc = jnp.zeros((ncu + 1,) + shape,
                                x.dtype if dtype is None else dtype)
                acc = acc.at[flat_cu].set(
                    x.reshape((-1,) + shape).astype(acc.dtype), mode="drop")
                return acc[:ncu]

            split = collect(split_s, (), jnp.uint8)
            uiA = collect(uiA_s, (), jnp.uint8)
            imA = collect(imA_s, ())
            ui16 = collect(ui16_s, (4,), jnp.uint8)
            im16 = collect(im16_s, (4,))
            lv_y = collect(lv_y_s, (n, n))
            lv_cb = collect(lv_cb_s, (nc, nc))
            lv_cr = collect(lv_cr_s, (nc, nc))
            rec_y = collect(rec_y_s, (n, n))
            rec_u = collect(rec_u_s, (nc, nc))
            rec_v = collect(rec_v_s, (nc, nc))

            q16 = MAP16[:ncu]
            gq16 = lambda a: jnp.take(a, q16.reshape(-1), axis=0)
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
            head_parts = [split, uiA, imA.astype(jnp.uint8),
                          ui16.reshape(-1), im16.astype(jnp.uint8).reshape(-1)]
            (pdirA, mvA0x, mvA0y, mvA1x, mvA1y, _, _, _) = dense[n]
            (pdirB, mvB0x, mvB0y, mvB1x, mvB1y, _, _, _) = dense[h]
            if depth2:
                split16 = collect(split16_s, (4,), jnp.uint8)
                ui8 = collect(ui8_s, (4, 4), jnp.uint8)
                im8 = collect(im8_s, (4, 4))
                head_parts += [split16.reshape(-1), ui8.reshape(-1),
                               im8.astype(jnp.uint8).reshape(-1)]
                q8 = MAP8[:ncu]
                gq8 = lambda a: jnp.take(a, q8.reshape(-1), axis=0)
                (pdirC, mvC0x, mvC0y, mvC1x, mvC1y, _, _, _) = dense[8]
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
            levels16 = jnp.concatenate([
                lv_y.reshape(-1), lv_cb.reshape(-1), lv_cr.reshape(-1)
            ]).astype(jnp.int16)
            levels8 = jax.lax.bitcast_convert_type(levels16, jnp.uint8).reshape(-1)
            return jnp.concatenate([recon8, head8, mv8, levels8])

        return encode
    # ------------------------------------------------------------------
    def _unpack_qt(self, buf: np.ndarray) -> dict:
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
        split = buf[o:o + ncu].astype(bool).reshape(rows, cols); o += ncu
        use_intra = buf[o:o + ncu].astype(bool).reshape(rows, cols); o += ncu
        modes = buf[o:o + ncu].astype(np.int32).reshape(rows, cols); o += ncu
        ui4 = buf[o:o + 4 * ncu].astype(bool).reshape(rows, cols, 4); o += 4 * ncu
        m4 = buf[o:o + 4 * ncu].astype(np.int32).reshape(rows, cols, 4); o += 4 * ncu
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
        lv = buf[o:].view(np.int16)
        sy, sc = ncu * n * n, ncu * nc * nc
        return {
            "split": split,
            "use_intra": use_intra, "modes": modes, "mvx": mvx, "mvy": mvy,
            "use_intra4": ui4, "modes4": m4, "mv4x": mv4x, "mv4y": mv4y,
            "split16": split16, "use_intra8": ui8, "modes8": m8,
            "mv8x": mv8x, "mv8y": mv8y, "mv81x": mv81x, "mv81y": mv81y,
            "pdir": pdir, "pdir4": pdir4, "pdir8": pdir8,
            "mv1x": mv1x, "mv1y": mv1y, "mv41x": mv41x, "mv41y": mv41y,
            "levels_y": lv[:sy].astype(np.int32).reshape(rows, cols, n, n),
            "levels_cb": lv[sy:sy + sc].astype(np.int32).reshape(rows, cols, nc, nc),
            "levels_cr": lv[sy + sc:sy + 2 * sc].astype(np.int32).reshape(rows, cols, nc, nc),
            "recon_y": rec_y.astype(np.int32),
            "recon_u": rec_u.astype(np.int32),
            "recon_v": rec_v.astype(np.int32),
        }

    # ------------------------------------------------------------------
    def _unpack(self, buf: np.ndarray) -> dict:
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
        nmv = 8 * ncu if cfg.bi else 4 * ncu
        mv = buf[o:o + nmv].view(np.int16); o += nmv
        mvx = mv[:ncu].astype(np.int32).reshape(rows, cols)
        mvy = mv[ncu:2 * ncu].astype(np.int32).reshape(rows, cols)
        mv1x = mv1y = None
        if cfg.bi:
            mv1x = mv[2 * ncu:3 * ncu].astype(np.int32).reshape(rows, cols)
            mv1y = mv[3 * ncu:4 * ncu].astype(np.int32).reshape(rows, cols)
        lv = buf[o:].view(np.int16)
        sy, sc = ncu * n * n, ncu * nc * nc
        return {
            "use_intra": use_intra,
            "modes": imode,
            "mvx": mvx, "mvy": mvy,
            "pdir": pdir, "mv1x": mv1x, "mv1y": mv1y,
            "levels_y": lv[:sy].astype(np.int32).reshape(rows, cols, n, n),
            "levels_cb": lv[sy:sy + sc].astype(np.int32).reshape(rows, cols, nc, nc),
            "levels_cr": lv[sy + sc:sy + 2 * sc].astype(np.int32).reshape(rows, cols, nc, nc),
            "recon_y": rec_y.astype(np.int32),
            "recon_u": rec_u.astype(np.int32),
            "recon_v": rec_v.astype(np.int32),
        }
