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
            assert cfg.cu_size == 32 and not cfg.weightp \
                and not cfg.analysis_load, \
                "inter quadtree: CTU32; no weightp/analysis reuse (v1)"
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
        a = lambda x: jnp.asarray(x, jnp.uint8)
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

        def tq(resid, qp, log2nn):
            coef = transforms.forward_transform(resid, bd, xp=jnp)
            if cfg.rdoq:
                levels = quant.quant_rdoq(coef, qp, log2nn, bd, xp=jnp)
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
                lv_cb, rr_u = tq(src_u.astype(jnp.int32) - pred_u, qp_c, log2n - 1)
                lv_cr, rr_v = tq(src_v.astype(jnp.int32) - pred_v, qp_c, log2n - 1)
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

            recon8 = jnp.concatenate([
                from_blocks(rec_y, n, H, W).reshape(-1),
                from_blocks(rec_u, nc, H // 2, W // 2).reshape(-1),
                from_blocks(rec_v, nc, H // 2, W // 2).reshape(-1),
            ]).astype(jnp.uint8)
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
        """P-frame CTU32 with in-scan depth-1 quadtree RD decision.

        Dense phase: full-search + subpel ME at BOTH block sizes (one 32x32
        MV per CTU and four 16x16 MVs) — candidate depths are batch axes,
        the TPU formulation of the reference's recursive compressInterCU
        (analysis.cpp:1146). Wavefront phase: per CTU evaluate variant A
        (one 32 CU, intra-or-inter) and variant B (four 16 CUs in z-order,
        each intra-or-inter, exact local reference propagation), select by
        SSE + lambda2 * estimated bits.
        """
        cfg = self.cfg
        n = cfg.cu_size            # 32
        h = n // 2                 # 16 luma sub-CU
        nc = n // 2                # 16 chroma tile
        hc = nc // 2               # 8 chroma sub-CU
        rows, cols = cfg.rows, cfg.cols
        W, H = cfg.width, cfg.height
        bd = cfg.bit_depth
        maxv = (1 << bd) - 1
        ncu = rows * cols
        n16 = 4 * ncu
        R = cfg.search_range
        rc_all, valid_all = self._rc, self._valid
        S = self.num_slots
        fill = 1 << (bd - 1)
        MODE_BITS = 7.0

        def to_blocks(plane, nn):
            hh, ww = plane.shape
            return (plane.reshape(hh // nn, nn, ww // nn, nn)
                    .transpose(0, 2, 1, 3).reshape(-1, nn, nn))

        def from_blocks(blocks, nn, hh, ww):
            return (blocks.reshape(hh // nn, ww // nn, nn, nn)
                    .transpose(0, 2, 1, 3).reshape(hh, ww))

        # block-grid geometry at both sizes
        g32r = np.arange(ncu, dtype=np.int32) // cols
        g32c = np.arange(ncu, dtype=np.int32) % cols
        PX32 = jnp.asarray(g32c * n)
        PY32 = jnp.asarray(g32r * n)
        cols16 = cols * 2
        g16r = np.arange(n16, dtype=np.int32) // cols16
        g16c = np.arange(n16, dtype=np.int32) % cols16
        PX16 = jnp.asarray(g16c * h)
        PY16 = jnp.asarray(g16r * h)
        # CTU -> quadrant 16-block raster indices (sentinel row = n16)
        map16 = np.zeros((ncu + 1, 4), np.int32)
        for q, (qy, qx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            map16[:ncu, q] = (g32r * 2 + qy) * cols16 + (g32c * 2 + qx)
        map16[ncu] = n16
        MAP16 = jnp.asarray(map16)

        def search_size(yb, ref_y, px, py, nn):
            mvx_i, mvy_i, _ = me.full_search_sad(
                ref_y, yb, px, py, nn, R, lambda_bits=2, xp=jnp)
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

        def tq(resid, qp, log2nn):
            coef = transforms.forward_transform(resid, bd, xp=jnp)
            if cfg.rdoq:
                levels = quant.quant_rdoq(coef, qp, log2nn, bd, xp=jnp)
            else:
                levels, du = quant.quant(coef, qp, log2nn, bd, False, xp=jnp)
                if cfg.sbh:
                    levels = quant.sign_bit_hiding(levels, du, log2nn, xp=jnp)
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

        def decide_motion(yb, refs0, refs1, px, py, nn, qp_s):
            """Per-block motion decision at one size. P: single-list search.
            B: two searches + uni/uni/bi selection by SATD + lambda*bits
            (search.cpp predInterSearch analog). Returns (pdir, mv0x, mv0y,
            mv1x, mv1y, pred_yuv, satd_sel, bits_sel)."""
            mv0x, mv0y, s0 = search_size(yb, refs0[0], px, py, nn)
            if refs1 is None:
                pred = mc_all(refs0, mv0x, mv0y, px, py, nn)
                bits = est_mv_bits_arr(mv0x, mv0y)
                ones = jnp.ones_like(mv0x)
                return (ones, mv0x, mv0y, mv0x * 0, mv0y * 0, pred, s0, bits)
            mv1x, mv1y, s1 = search_size(yb, refs1[0], px, py, nn)
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
            satd_sel = jnp.stack([s0, s1, sbi], 1)[jnp.arange(s0.shape[0]),
                                                   sel]
            bits_sel = jnp.stack([b0, b1 + 1.0, b0 + b1 + 2.0], 1)[
                jnp.arange(s0.shape[0]), sel]
            # zero unused-list MVs (the syntax layer requires it)
            m0 = (pdir & 1).astype(mv0x.dtype)
            m1 = ((pdir & 2) >> 1).astype(mv1x.dtype)
            return (pdir, mv0x * m0, mv0y * m0, mv1x * m1, mv1y * m1,
                    pred, satd_sel, bits_sel)

        def seg(arr, lo, hi, rev=False):
            s = arr[:, lo:hi]
            return s[:, ::-1] if rev else s

        def assemble_v(parts):
            vs, avs = [], []
            for t, a in parts:
                if t.ndim == 1:
                    t = t[:, None]
                k = t.shape[1]
                vs.append(t)
                avs.append(jnp.broadcast_to(a[:, None], (S, k)))
            return jnp.concatenate(vs, axis=1), jnp.concatenate(avs, axis=1)

        def quad_v(q, tile, left_rc, top_br, tr_br, tl_br, al, at, atr, nn):
            F = jnp.ones((S,), bool)
            NO = jnp.zeros((S,), bool)
            zs = jnp.zeros((S, nn), jnp.int32)
            if q == 0:
                return assemble_v([
                    (seg(left_rc, nn, 2 * nn, rev=True), al),
                    (seg(left_rc, 0, nn, rev=True), al),
                    (tl_br[:, 2 * nn - 1], at & al),
                    (seg(top_br, 0, nn), at),
                    (seg(top_br, nn, 2 * nn), at),
                ])
            if q == 1:
                return assemble_v([
                    (zs, NO),
                    (tile[:, 0:nn, nn - 1][:, ::-1], F),
                    (top_br[:, nn - 1], at),
                    (seg(top_br, nn, 2 * nn), at),
                    (seg(tr_br, 0, nn), atr),
                ])
            if q == 2:
                return assemble_v([
                    (zs, NO),
                    (seg(left_rc, nn, 2 * nn, rev=True), al),
                    (left_rc[:, nn - 1], al),
                    (tile[:, nn - 1, 0:nn], F),
                    (tile[:, nn - 1, nn:2 * nn], F),
                ])
            return assemble_v([
                (zs, NO),
                (tile[:, nn:2 * nn, nn - 1][:, ::-1], F),
                (tile[:, nn - 1, nn - 1], F),
                (tile[:, nn - 1, nn:2 * nn], F),
                (zs, NO),
            ])

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

        def est_mv_bits(mvx, mvy):
            ax = jnp.abs(mvx).astype(jnp.float32)
            ay = jnp.abs(mvy).astype(jnp.float32)
            return 4.0 + 2.0 * jnp.log2(1.0 + ax) + 2.0 * jnp.log2(1.0 + ay)

        def make_step(srcs, predsA, predsB, satd32, satd16,
                      mvbits32, mvbits16, qp_y_pad, qp_c_pad, qp_sig_pad):
            src_yb, src_ub, src_vb = srcs
            pA_y, pA_u, pA_v = predsA
            pB_y, pB_u, pB_v = predsB

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

                def gather_nb(botrow, rightcol):
                    return (jnp.take(rightcol, gl, axis=0),
                            jnp.take(botrow, gt, axis=0),
                            jnp.take(botrow, gtr, axis=0),
                            jnp.take(botrow, gtl, axis=0))

                lrc_y, tbr_y, trbr_y, tlbr_y = gather_nb(bry, rcy)
                lrc_u, tbr_u, trbr_u, tlbr_u = gather_nb(bru, rcu_)
                lrc_v, tbr_v, trbr_v, tlbr_v = gather_nb(brv, rcv)

                # ===== variant A: one 32x32 CU =====
                vA, avA = assemble_v([
                    (jnp.broadcast_to(lrc_y[:, n - 1:n], (S, n)),
                     jnp.zeros((S,), bool)),
                    (lrc_y[:, ::-1], al),
                    (tlbr_y[:, n - 1], atl),
                    (tbr_y, at),
                    (trbr_y, atr),
                ])
                imodeA, ibestA, ipredA_y = intra_block(vA, avA, src_y, qp_y,
                                                       5, True)
                isatdA = jnp.take(satd32, cu_s)
                use_intraA = (ibestA + cfg.intra_bias) < isatdA
                ipA_y = jnp.take(pA_y, cu_s, axis=0)
                selA = use_intraA[:, None, None]
                predA_yf = jnp.where(selA, ipredA_y, ipA_y)
                # chroma A
                vAu, avAu = assemble_v([
                    (jnp.broadcast_to(lrc_u[:, nc - 1:nc], (S, nc)),
                     jnp.zeros((S,), bool)),
                    (lrc_u[:, ::-1], al),
                    (tlbr_u[:, nc - 1], atl),
                    (tbr_u, at),
                    (trbr_u, atr),
                ])
                _, _, ipredA_u = intra_block(vAu, avAu, src_u, qp_c, 4,
                                             False, imodeA)
                vAv, avAv = assemble_v([
                    (jnp.broadcast_to(lrc_v[:, nc - 1:nc], (S, nc)),
                     jnp.zeros((S,), bool)),
                    (lrc_v[:, ::-1], al),
                    (tlbr_v[:, nc - 1], atl),
                    (tbr_v, at),
                    (trbr_v, atr),
                ])
                _, _, ipredA_v = intra_block(vAv, avAv, src_v, qp_c, 4,
                                             False, imodeA)
                predA_uf = jnp.where(selA, ipredA_u, jnp.take(pA_u, cu_s, axis=0))
                predA_vf = jnp.where(selA, ipredA_v, jnp.take(pA_v, cu_s, axis=0))
                lvA_y, rrA_y = tq(src_y - predA_yf, qp_y, 5)
                lvA_cb, rrA_u = tq(src_u - predA_uf, qp_c, 4)
                lvA_cr, rrA_v = tq(src_v - predA_vf, qp_c, 4)
                recA_y = jnp.clip(predA_yf + rrA_y, 0, maxv)
                recA_u = jnp.clip(predA_uf + rrA_u, 0, maxv)
                recA_v = jnp.clip(predA_vf + rrA_v, 0, maxv)
                bitsA = (quant.est_tu_bits(lvA_y, xp=jnp)
                         + quant.est_tu_bits(lvA_cb, xp=jnp)
                         + quant.est_tu_bits(lvA_cr, xp=jnp)
                         + jnp.where(use_intraA, MODE_BITS,
                                     jnp.take(mvbits32, cu_s)) + 1.0)

                # ===== variant B: four 16x16 CUs =====
                tile_y = jnp.zeros((S, n, n), jnp.int32)
                tile_u = jnp.zeros((S, nc, nc), jnp.int32)
                tile_v = jnp.zeros((S, nc, nc), jnp.int32)
                lvB_y = jnp.zeros((S, n, n), jnp.int32)
                lvB_cb = jnp.zeros((S, nc, nc), jnp.int32)
                lvB_cr = jnp.zeros((S, nc, nc), jnp.int32)
                ui16, im16 = [], []
                bitsB = jnp.zeros((S,), jnp.float32)
                for q, (qy, qx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                    y0, x0 = qy * h, qx * h
                    yc0, xc0 = qy * hc, qx * hc
                    q16 = jnp.take(MAP16[:, q], cu_s)
                    sq_y = src_y[:, y0:y0 + h, x0:x0 + h]
                    sq_u = src_u[:, yc0:yc0 + hc, xc0:xc0 + hc]
                    sq_v = src_v[:, yc0:yc0 + hc, xc0:xc0 + hc]
                    vq, avq = quad_v(q, tile_y, lrc_y, tbr_y, trbr_y, tlbr_y,
                                     al, at, atr, h)
                    imq, ibq, ipq_y = intra_block(vq, avq, sq_y, qp_y, 4, True)
                    isq = jnp.take(satd16, q16)
                    uiq = (ibq + cfg.intra_bias) < isq
                    selq = uiq[:, None, None]
                    pq_y = jnp.where(selq, ipq_y, jnp.take(pB_y, q16, axis=0))
                    vqu, avqu = quad_v(q, tile_u, lrc_u, tbr_u, trbr_u, tlbr_u,
                                       al, at, atr, hc)
                    _, _, ipq_u = intra_block(vqu, avqu, sq_u, qp_c, 3,
                                              False, imq)
                    vqv, avqv = quad_v(q, tile_v, lrc_v, tbr_v, trbr_v, tlbr_v,
                                       al, at, atr, hc)
                    _, _, ipq_v = intra_block(vqv, avqv, sq_v, qp_c, 3,
                                              False, imq)
                    pq_u = jnp.where(selq, ipq_u, jnp.take(pB_u, q16, axis=0))
                    pq_v = jnp.where(selq, ipq_v, jnp.take(pB_v, q16, axis=0))
                    lq_y, rq_y = tq(sq_y - pq_y, qp_y, 4)
                    lq_cb, rq_u = tq(sq_u - pq_u, qp_c, 3)
                    lq_cr, rq_v = tq(sq_v - pq_v, qp_c, 3)
                    rec_qy = jnp.clip(pq_y + rq_y, 0, maxv)
                    rec_qu = jnp.clip(pq_u + rq_u, 0, maxv)
                    rec_qv = jnp.clip(pq_v + rq_v, 0, maxv)
                    tile_y = tile_y.at[:, y0:y0 + h, x0:x0 + h].set(rec_qy)
                    tile_u = tile_u.at[:, yc0:yc0 + hc, xc0:xc0 + hc].set(rec_qu)
                    tile_v = tile_v.at[:, yc0:yc0 + hc, xc0:xc0 + hc].set(rec_qv)
                    lvB_y = lvB_y.at[:, y0:y0 + h, x0:x0 + h].set(lq_y)
                    lvB_cb = lvB_cb.at[:, yc0:yc0 + hc, xc0:xc0 + hc].set(lq_cb)
                    lvB_cr = lvB_cr.at[:, yc0:yc0 + hc, xc0:xc0 + hc].set(lq_cr)
                    ui16.append(uiq)
                    im16.append(imq)
                    bitsB = (bitsB + quant.est_tu_bits(lq_y, xp=jnp)
                             + quant.est_tu_bits(lq_cb, xp=jnp)
                             + quant.est_tu_bits(lq_cr, xp=jnp)
                             + jnp.where(uiq, MODE_BITS,
                                         jnp.take(mvbits16, q16)))
                bitsB = bitsB + 1.0

                # ===== RD selection =====
                def ssd(a, b):
                    d = (a - b).astype(jnp.float32)
                    return jnp.sum(d * d, axis=(-2, -1))

                distA = (ssd(src_y, recA_y) + ssd(src_u, recA_u)
                         + ssd(src_v, recA_v))
                distB = (ssd(src_y, tile_y) + ssd(src_u, tile_u)
                         + ssd(src_v, tile_v))
                lam2 = 0.85 * jnp.exp2((qp_sig.astype(jnp.float32) - 12.0) / 3.0)
                split = (distB + lam2 * bitsB) < (distA + lam2 * bitsA)

                sel = split[:, None, None]
                rec_y = jnp.where(sel, tile_y, recA_y)
                rec_u = jnp.where(sel, tile_u, recA_u)
                rec_v = jnp.where(sel, tile_v, recA_v)
                lv_y = jnp.where(sel, lvB_y, lvA_y)
                lv_cb = jnp.where(sel, lvB_cb, lvA_cb)
                lv_cr = jnp.where(sel, lvB_cr, lvA_cr)

                bry = bry.at[cu_s].set(rec_y[:, n - 1, :], mode="drop")
                rcy = rcy.at[cu_s].set(rec_y[:, :, n - 1], mode="drop")
                bru = bru.at[cu_s].set(rec_u[:, nc - 1, :], mode="drop")
                rcu_ = rcu_.at[cu_s].set(rec_u[:, :, nc - 1], mode="drop")
                brv = brv.at[cu_s].set(rec_v[:, nc - 1, :], mode="drop")
                rcv = rcv.at[cu_s].set(rec_v[:, :, nc - 1], mode="drop")

                ys = (cu_s, split, use_intraA, imodeA,
                      jnp.stack(ui16, 1), jnp.stack(im16, 1),
                      lv_y, lv_cb, lv_cr, rec_y, rec_u, rec_v)
                return (bry, rcy, bru, rcu_, brv, rcv), ys
            return step

        def encode(y, u, v, ref_y, ref_u, ref_v, *rest):
            if cfg.bi:
                ref1_y, ref1_u, ref1_v, qp = rest
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

            yb32 = to_blocks(y32, n)
            yb16 = to_blocks(y32, h)
            (pdirA, mvA0x, mvA0y, mvA1x, mvA1y, pA, satd32,
             mvbits32) = decide_motion(yb32, refs, refs1, PX32, PY32, n,
                                       qp_max)
            (pdirB, mvB0x, mvB0y, mvB1x, mvB1y, pB, satd16,
             mvbits16) = decide_motion(yb16, refs, refs1, PX16, PY16, h,
                                       qp_max)

            def padded(a, shape):
                return jnp.concatenate([a, jnp.zeros((1,) + shape, a.dtype)], 0)

            srcs = (padded(yb32, (n, n)),
                    padded(to_blocks(u32, nc), (nc, nc)),
                    padded(to_blocks(v32, nc), (nc, nc)))
            predsA = (padded(pA[0], (n, n)), padded(pA[1], (nc, nc)),
                      padded(pA[2], (nc, nc)))
            predsB = (padded(pB[0], (h, h)), padded(pB[1], (hc, hc)),
                      padded(pB[2], (hc, hc)))
            pad1 = lambda a: jnp.concatenate([a, jnp.zeros((1,), a.dtype)])
            step = make_step(srcs, predsA, predsB, pad1(satd32), pad1(satd16),
                             pad1(mvbits32), pad1(mvbits16),
                             qp_y_pad, qp_c_pad, qp_sig_pad)
            z0 = y.reshape(-1)[0].astype(jnp.int32) * 0
            init = tuple(jnp.full((ncu + 1, k), fill, jnp.int32) + z0
                         for k in (n, n, nc, nc, nc, nc))
            _, ys = jax.lax.scan(step, init, (rc_all, valid_all))
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

            # quadrant-ordered 16-grid fields (CTU-major, z-order)
            q16 = MAP16[:ncu]                         # [ncu, 4]
            gq = lambda a: jnp.take(a, q16.reshape(-1), axis=0)
            recon8 = jnp.concatenate([
                from_blocks(rec_y, n, H, W).reshape(-1),
                from_blocks(rec_u, nc, H // 2, W // 2).reshape(-1),
                from_blocks(rec_v, nc, H // 2, W // 2).reshape(-1),
            ]).astype(jnp.uint8)
            head_parts = [split, uiA, imA.astype(jnp.uint8),
                          ui16.reshape(-1), im16.astype(jnp.uint8).reshape(-1)]
            if cfg.bi:
                head_parts += [pdirA.astype(jnp.uint8),
                               gq(pdirB).astype(jnp.uint8)]
            head8 = jnp.concatenate(head_parts)
            mv_parts = [mvA0x, mvA0y, gq(mvB0x), gq(mvB0y)]
            if cfg.bi:
                mv_parts += [mvA1x, mvA1y, gq(mvB1x), gq(mvB1y)]
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
        o = 0
        rec_y = buf[o:o + ny].reshape(H, W); o += ny
        rec_u = buf[o:o + nuv].reshape(H // 2, W // 2); o += nuv
        rec_v = buf[o:o + nuv].reshape(H // 2, W // 2); o += nuv
        split = buf[o:o + ncu].astype(bool).reshape(rows, cols); o += ncu
        use_intra = buf[o:o + ncu].astype(bool).reshape(rows, cols); o += ncu
        modes = buf[o:o + ncu].astype(np.int32).reshape(rows, cols); o += ncu
        ui4 = buf[o:o + 4 * ncu].astype(bool).reshape(rows, cols, 4); o += 4 * ncu
        m4 = buf[o:o + 4 * ncu].astype(np.int32).reshape(rows, cols, 4); o += 4 * ncu
        pdir = pdir4 = None
        if cfg.bi:
            pdir = buf[o:o + ncu].astype(np.int32).reshape(rows, cols); o += ncu
            pdir4 = buf[o:o + 4 * ncu].astype(np.int32).reshape(rows, cols, 4)
            o += 4 * ncu
        nmv_units = 20 * ncu if cfg.bi else 10 * ncu
        mv = buf[o:o + 2 * nmv_units].view(np.int16); o += 2 * nmv_units
        mvx = mv[:ncu].astype(np.int32).reshape(rows, cols)
        mvy = mv[ncu:2 * ncu].astype(np.int32).reshape(rows, cols)
        mv4x = mv[2 * ncu:6 * ncu].astype(np.int32).reshape(rows, cols, 4)
        mv4y = mv[6 * ncu:10 * ncu].astype(np.int32).reshape(rows, cols, 4)
        mv1x = mv1y = mv41x = mv41y = None
        if cfg.bi:
            mv1x = mv[10 * ncu:11 * ncu].astype(np.int32).reshape(rows, cols)
            mv1y = mv[11 * ncu:12 * ncu].astype(np.int32).reshape(rows, cols)
            mv41x = mv[12 * ncu:16 * ncu].astype(np.int32).reshape(rows, cols, 4)
            mv41y = mv[16 * ncu:20 * ncu].astype(np.int32).reshape(rows, cols, 4)
        lv = buf[o:].view(np.int16)
        sy, sc = ncu * n * n, ncu * nc * nc
        return {
            "split": split,
            "use_intra": use_intra, "modes": modes, "mvx": mvx, "mvy": mvy,
            "use_intra4": ui4, "modes4": m4, "mv4x": mv4x, "mv4y": mv4y,
            "pdir": pdir, "pdir4": pdir4,
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
        o = 0
        rec_y = buf[o:o + ny].reshape(H, W); o += ny
        rec_u = buf[o:o + nuv].reshape(H // 2, W // 2); o += nuv
        rec_v = buf[o:o + nuv].reshape(H // 2, W // 2); o += nuv
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
