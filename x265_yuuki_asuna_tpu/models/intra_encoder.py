"""All-intra frame encoder: JAX wavefront over the CU grid.

The reference encodes CTUs through a threaded WPP wavefront with per-CTU
recursive RDO (frameencoder.cpp:1342 processRowEncoder, analysis.cpp:514
compressIntraCU). The TPU re-design (SURVEY.md §7):

  * uniform CU grid (CTU == CU), picture padded to whole CTUs, conformance
    window crops — all shapes static for XLA;
  * a `lax.scan` over wavefront diagonals; each step processes every CU on
    the diagonal as one batch: the 35-mode prediction is ONE MXU matmul
    ("allangs" as a weight matrix), then SATD mode decision and
    transform/quant/recon;
  * the scan CARRY holds only the prediction boundary state (each CU's
    bottom row + right column) — the full recon/level blocks stream out as
    per-step scan outputs, so no large carry buffers are copied per step;
  * the sequential CABAC pass consumes the decision tensors afterwards on
    the host (bitstream/native), mirroring the reference's encodeSlice split.

Compute dtype: exact int32 elementwise; the prediction matmul runs in f32 at
HIGHEST precision (exact for these magnitudes). HEVC is integer-exact and
conformance requires bit-exactness (verified against libavcodec decode).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import intra, pixel, quant, transforms
from ..utils.geometry import wavefront_schedule


def chroma_qp_from_luma(qp_y: int, offset: int = 0) -> int:
    """H.265 table 8-10 chroma QP mapping for 4:2:0."""
    qpi = min(max(qp_y + offset, 0), 57)
    if qpi < 30:
        return qpi
    if qpi > 43:
        return qpi - 6
    return [29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37][qpi - 30]


# device-side mapping table for traced QPs
CHROMA_QP_TABLE = np.array([chroma_qp_from_luma(q) for q in range(58)],
                           dtype=np.int32)
# ChromaArrayType 3 (4:4:4): QpC = min(qPi, 51) — no table (spec 8.6.1)
CHROMA_QP_TABLE_444 = np.minimum(np.arange(58), 51).astype(np.int32)


@dataclass(frozen=True)
class IntraFrameConfig:
    width: int              # padded (coded) luma width, multiple of cu_size
    height: int
    cu_size: int = 16       # 16 or 32: uniform CTU==CU grid
    qp: int = 32
    bit_depth: int = 8
    lossless: bool = False          # transquant bypass: levels = residual
    lambda_mode_bits: float = 0.0   # reserved for RD mode costs
    rdoq: bool = False              # RD-optimized quantization
    sbh: bool = False               # sign-bit hiding
    max_depth: int = 0              # 1: CTU32 may split into 4 16x16 CUs
                                    # (in-scan RD quadtree decision)
    psy_rd: float = 0.0             # psycho-visual RD strength (--psy-rd)
    psy_rdoq: float = 0.0           # psy-RDOQ energy bias (--psy-rdoq)
    csp: str = "i420"               # "i420" or "i444" (4:4:4: chroma at
                                    # luma size, DM mode, uniform grid)
    fast_intra: bool = False        # decide modes from SOURCE neighbors in
                                    # one dense batch (no wavefront for the
                                    # decision); the scan then computes only
                                    # the chosen prediction. Streams stay
                                    # conformant; decisions differ slightly
                                    # from recon-boundary SATD.
    nr: bool = False                # noise reduction (denoise DCT): encode
                                    # takes per-coef offset inputs and emits
                                    # |coef| sums (uniform grid only)
    dpb: bool = False               # device-resident DPB (round 4, CTU32
                                    # quadtree path): recon as separate
                                    # device outputs + in-jit loop filters
    deblock: bool = False           # with dpb: in-jit deblocking
    sao: bool = False               # with dpb: in-jit SAO

    @property
    def rows(self) -> int:
        return self.height // self.cu_size

    @property
    def cols(self) -> int:
        return self.width // self.cu_size

    @property
    def log2_cu(self) -> int:
        return self.cu_size.bit_length() - 1


class IntraFrameEncoder:
    """Builds and caches the jitted wavefront encode for one geometry.

    scaling: optional ScalingListData — quant-matrix tables are baked into
    the traced function as constants (lists are static per session)."""

    def __init__(self, cfg: IntraFrameConfig, scaling=None):
        self.cfg = cfg
        self._sl = None
        if scaling is not None:
            assert not cfg.lossless and not cfg.rdoq and not cfg.max_depth, \
                "scaling lists: plain quant path only (v1)"
            log2n = cfg.cu_size.bit_length() - 1
            qy, dqy = scaling.quant_tables(log2n, 0)        # intra luma
            qcb, dqcb = scaling.quant_tables(log2n - 1, 1)  # intra Cb
            qcr, dqcr = scaling.quant_tables(log2n - 1, 2)  # intra Cr
            self._sl = {"y": (qy, dqy), "cb": (qcb, dqcb), "cr": (qcr, dqcr)}
        if cfg.dpb:
            assert cfg.max_depth and cfg.cu_size == 32, \
                "device DPB: CTU32 quadtree path (v1)"
        if cfg.max_depth:
            assert cfg.cu_size in (32, 64) and not cfg.lossless, \
                "quadtree: CTU32/64, lossy only"
            assert cfg.cu_size == 32 or cfg.max_depth >= 2, \
                "CTU64: depth-0 always splits, so max_depth >= 2"
            assert not cfg.nr, "noise reduction: uniform grid only (v1)"
        if cfg.nr:
            assert not cfg.lossless, "noise reduction is lossy-path only"
        if cfg.csp == "i444":
            assert not cfg.max_depth and not cfg.lossless, \
                "4:4:4: uniform-grid lossy path only (v1)"
        nd, ns, rc, valid = wavefront_schedule(cfg.rows, cfg.cols, slope=2)
        self.num_diags = nd
        self.num_slots = ns
        self._rc = jnp.asarray(rc)          # [nd, ns, 2]
        self._valid = jnp.asarray(valid)    # [nd, ns]
        # compact (int8-in-uint16-lane) level transfer for the uniform path
        # (lossless codes raw residuals, always > int8)
        self._compact = not cfg.max_depth and not cfg.lossless
        if cfg.max_depth and cfg.cu_size == 64:
            build = self._build_qt64
        elif cfg.max_depth:
            build = self._build_qt
        else:
            build = lambda with_recon=True: self._build(
                with_recon, compact=self._compact)
        self._full_cache = {}
        self._encode = jax.jit(build())
        # frame-batched variant (frame-parallelism, the reference's
        # frame-threads analog); NR offsets are shared across the batch
        vax = (0, 0, 0, 0, None, None) if cfg.nr else None
        vm = (lambda f: jax.vmap(f, in_axes=vax)) if cfg.nr else jax.vmap
        self._encode_batch = jax.jit(vm(build()))
        # light variant: decisions only (no recon download) — for pipelines
        # that don't need recon on the host (no hash SEI / recon output)
        self._encode_batch_light = jax.jit(vm(build(with_recon=False)))

    @property
    def _pix_dtype(self):
        return jnp.uint16 if self.cfg.bit_depth > 8 else jnp.uint8

    # ------------------------------------------------------------------
    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                     qp: int = None, nr_off=None, slice_qp=None):
        """y: [H, W] pixels padded to coded size; u, v: [H/2, W/2].
        nr_off: (off_y [n,n], off_c [nc,nc]) int32 denoise offsets when
        cfg.nr. Returns dict of decision tensors + recon planes (numpy).
        cfg.dpb: recon stays on device ("recon_dev"/"sao_dev" keys)."""
        cfg = self.cfg
        assert y.shape == (cfg.height, cfg.width), y.shape
        qp = cfg.qp if qp is None else qp
        qp_map = np.broadcast_to(np.asarray(qp, np.int32),
                                 (cfg.rows * cfg.cols,))
        dt = self._pix_dtype
        args = [jnp.asarray(y, dt), jnp.asarray(u, dt), jnp.asarray(v, dt),
                jnp.asarray(qp_map)]
        if cfg.nr:
            if nr_off is None:
                nr_off = (np.zeros((cfg.cu_size, cfg.cu_size), np.int32),
                          np.zeros((cfg.cu_size // 2,) * 2, np.int32))
            args += [jnp.asarray(nr_off[0], jnp.int32),
                     jnp.asarray(nr_off[1], jnp.int32)]
        if cfg.dpb:
            sq = qp if slice_qp is None else slice_qp
            sq = int(np.max(sq)) if np.ndim(sq) else int(sq)
            args.append(jnp.asarray(sq, jnp.int32))
            outs = self._encode(*args)
            out = self._unpack(np.asarray(outs[0]), with_recon=False)
            out["recon_dev"] = outs[1:4]
            out["sao_dev"] = outs[4] if cfg.sao else None
            return out
        buf = np.asarray(self._encode(*args))
        if self._compact and buf[-1]:
            # rare: a level exceeded int8 — rerun through the int16 variant
            buf = np.asarray(self._full(True)(*args))
            return self._unpack(buf, compact=False)
        return self._unpack(buf)

    def _full(self, with_recon: bool):
        """Lazily-compiled int16-levels variant (overflow fallback)."""
        key = with_recon
        if key not in self._full_cache:
            self._full_cache[key] = jax.jit(
                self._build(with_recon=with_recon, compact=False))
        return self._full_cache[key]

    # ------------------------------------------------------------------
    def submit_frames(self, y, u, v, with_recon: bool = True, qp=None,
                      nr_off=None):
        """Async submit: returns the device buffer future (does not block).
        Pair with collect_frames() to overlap device compute with host work."""
        fn = self._encode_batch if with_recon else self._encode_batch_light
        if qp is None:
            qp = self.cfg.qp
        ncu = self.cfg.rows * self.cfg.cols
        qp_arr = np.asarray(qp, np.int32)
        if qp_arr.ndim <= 1:
            qp_arr = np.broadcast_to(qp_arr.reshape(-1, 1) if qp_arr.ndim else qp_arr,
                                     (y.shape[0], ncu)).copy() if qp_arr.ndim == 0 else \
                np.broadcast_to(qp_arr[:, None], (y.shape[0], ncu)).copy()
        dt = self._pix_dtype
        args = [jnp.asarray(y, dt), jnp.asarray(u, dt), jnp.asarray(v, dt),
                jnp.asarray(qp_arr)]
        if self.cfg.nr:
            if nr_off is None:
                nr_off = (np.zeros((self.cfg.cu_size,) * 2, np.int32),
                          np.zeros((self.cfg.cu_size // 2,) * 2, np.int32))
            args += [jnp.asarray(nr_off[0], jnp.int32),
                     jnp.asarray(nr_off[1], jnp.int32)]
        return fn(*args)

    def collect_frames(self, fut, with_recon: bool = True, rerun_inputs=None):
        """rerun_inputs: optional (yp [B,H,W], up, vp, qp or None) so frames
        whose compact int8 levels overflowed can be re-encoded exactly."""
        buf = np.asarray(fut)
        outs = []
        ncu = self.cfg.rows * self.cfg.cols
        for i in range(buf.shape[0]):
            if self._compact and buf[i, -1]:
                if rerun_inputs is None:
                    raise RuntimeError(
                        "int8 level overflow: collect_frames needs "
                        "rerun_inputs to re-encode exactly")
                yp, up, vp, qp = rerun_inputs
                if qp is None:
                    qrow = np.broadcast_to(np.int32(self.cfg.qp), (ncu,))
                else:
                    qa = np.asarray(qp, np.int32)
                    qrow = np.broadcast_to(qa if qa.ndim == 0 else qa[i],
                                           (ncu,)).reshape(-1)
                dt = self._pix_dtype
                fb = np.asarray(self._full(with_recon)(
                    jnp.asarray(yp[i], dt), jnp.asarray(up[i], dt),
                    jnp.asarray(vp[i], dt), jnp.asarray(qrow)))
                outs.append(self._unpack(fb, with_recon, compact=False))
            else:
                outs.append(self._unpack(buf[i], with_recon))
        return outs

    # ------------------------------------------------------------------
    def encode_frames(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                      with_recon: bool = True, qp=None, nr_off=None):
        """Batched encode: y [F, H, W]; independent frames in parallel.
        qp: per-batch scalar or per-frame array. Returns per-frame dicts."""
        fut = self.submit_frames(y, u, v, with_recon, qp, nr_off)
        return self.collect_frames(fut, with_recon,
                                   rerun_inputs=(y, u, v, qp))

    # ------------------------------------------------------------------
    def _build(self, with_recon: bool = True, compact: bool = True):
        cfg = self.cfg
        sl = self._sl
        i444 = cfg.csp == "i444"
        n = cfg.cu_size
        nc = n if i444 else n // 2
        log2n = cfg.log2_cu
        rows, cols = cfg.rows, cfg.cols
        W, H = cfg.width, cfg.height
        CH, CW = (H, W) if i444 else (H // 2, W // 2)
        bd = cfg.bit_depth
        maxv = (1 << bd) - 1
        ncu = rows * cols
        rc_all = self._rc
        valid_all = self._valid
        S = self.num_slots
        fill = 1 << (bd - 1)

        def build_v(botrow, rightcol, cu, r, c, nn, avail):
            """Boundary vector [S, 4nn+1] + availability from the carried
            bottom-row/right-column state arrays [ncu+1, nn]."""
            avail_l, avail_t, avail_tr, avail_tl = avail
            pad = ncu  # sentinel row (stays at fill value)
            left_cu = jnp.where(avail_l, cu - 1, pad)
            top_cu = jnp.where(avail_t, cu - cols, pad)
            tr_cu = jnp.where(avail_tr, cu - cols + 1, pad)
            tl_cu = jnp.where(avail_tl, cu - cols - 1, pad)
            left = jnp.take(rightcol, left_cu, axis=0)     # [S, nn] top..bottom
            top = jnp.take(botrow, top_cu, axis=0)
            topright = jnp.take(botrow, tr_cu, axis=0)
            corner = jnp.take(botrow, tl_cu, axis=0)[:, nn - 1]
            # v layout: [left[2n-1..n] (below-left), left[n-1..0], corner,
            #            top[0..n-1], topright[0..n-1]]
            below_left = jnp.broadcast_to(left[:, nn - 1:nn], (S, nn))
            v = jnp.concatenate([below_left, left[:, ::-1], corner[:, None],
                                 top, topright], axis=1)
            ones = jnp.ones((S, nn), dtype=bool)
            av = jnp.concatenate([
                jnp.zeros((S, nn), dtype=bool),
                ones * avail_l[:, None],
                avail_tl[:, None],
                ones * avail_t[:, None],
                ones * avail_tr[:, None]], axis=1)
            return v, av

        def process_plane(botrow, rightcol, src_blocks, cu, r, c, nn, log2nn,
                          qp, luma, modes, avail, nr_off=None, valid=None,
                          comp="y"):
            # qp may be a traced scalar
            v_raw, av = build_v(botrow, rightcol, cu, r, c, nn, avail)
            v = intra.substitute_references(v_raw, av, bd, xp=jnp)
            c444 = i444 and not luma
            if modes is None:
                preds = intra.predict_all_modes_matmul(
                    v, nn, bd, luma=luma, strong_smoothing=False, xp=jnp)
                costs = pixel.satd(src_blocks[:, None], preds, xp=jnp)
                modes = jnp.argmin(costs, axis=1).astype(jnp.int32)
                pred = jnp.take_along_axis(
                    preds, modes[:, None, None, None].astype(jnp.int32),
                    axis=1)[:, 0]
            else:
                # mode already decided (chroma DM / fast-intra): compute
                # only that prediction — 35x fewer MXU FLOPs
                pred = intra.predict_mode_matmul(v, modes, nn, bd, luma=luma,
                                                 chroma444=c444, xp=jnp)
            resid = src_blocks.astype(jnp.int32) - pred
            if cfg.lossless:      # transquant bypass: residual coded directly
                return modes, resid, src_blocks.astype(jnp.int32), None
            coef = transforms.forward_transform(resid, bd, xp=jnp)
            nr_sum = None
            if nr_off is not None:
                coef, a = quant.denoise_dct(coef, nr_off, xp=jnp)
                nr_sum = jnp.sum(a * valid[:, None, None], axis=0)  # [nn, nn]
            if sl is not None:
                qtab, dqtab = sl[comp]
                levels, du = quant.quant_matrix(coef, qp, log2nn, qtab, bd,
                                                True, xp=jnp)
                if cfg.sbh:
                    levels = quant.sign_bit_hiding_mdcs(
                        levels, du, log2nn, modes, luma, xp=jnp,
                        csp420=not i444)
                dq = quant.dequant_matrix(levels, qp, log2nn, dqtab, bd,
                                          xp=jnp)
            elif cfg.rdoq:
                levels = quant.quant_rdoq(
                    coef, qp, log2nn, bd,
                    psy_scale=cfg.psy_rdoq if luma else 0.0, xp=jnp)
                dq = quant.dequant(levels, qp, log2nn, bd, xp=jnp)
            else:
                levels, du = quant.quant(coef, qp, log2nn, bd, True, xp=jnp)
                if cfg.sbh:
                    levels = quant.sign_bit_hiding_mdcs(
                        levels, du, log2nn, modes, luma, xp=jnp,
                        csp420=not i444)
                dq = quant.dequant(levels, qp, log2nn, bd, xp=jnp)
            rr = transforms.inverse_transform(dq, bd, xp=jnp)
            recon = jnp.clip(pred + rr, 0, maxv)
            return modes, levels, recon, nr_sum

        def make_step(src_y_blocks, src_u_blocks, src_v_blocks, qp_y_map,
                      qp_c_map, nr_y=None, nr_c=None, modes_all=None):
            # src_*_blocks: [ncu, nn, nn] block-layout source
            if modes_all is not None:
                modes_pad = jnp.concatenate(
                    [modes_all, jnp.zeros((1,), jnp.int32)])

            def step(carry, xs):
                (bry, rcy, bru, rcu_, brv, rcv) = carry
                rc, valid = xs
                r = rc[:, 0]
                c = rc[:, 1]
                cu = r * cols + c
                cu_s = jnp.where(valid, cu, ncu)
                avail = ((c > 0) & valid, (r > 0) & valid,
                         ((r > 0) & (c < cols - 1)) & valid,
                         ((r > 0) & (c > 0)) & valid)
                vmask = valid.astype(jnp.int32)

                src_y = jnp.take(src_y_blocks, cu_s, axis=0)
                src_u = jnp.take(src_u_blocks, cu_s, axis=0)
                src_v = jnp.take(src_v_blocks, cu_s, axis=0)
                qp_y = jnp.take(qp_y_map, cu_s, axis=0)    # [S] per-CU QP
                qp_c = jnp.take(qp_c_map, cu_s, axis=0)

                luma_modes = None if modes_all is None \
                    else jnp.take(modes_pad, cu_s, axis=0)
                modes, lv_y, rec_y, nsy = process_plane(
                    bry, rcy, src_y, cu, r, c, n, log2n, qp_y, True,
                    luma_modes, avail, nr_y, vmask, "y")
                log2c = log2n if i444 else log2n - 1
                _, lv_cb, rec_u, nsu = process_plane(
                    bru, rcu_, src_u, cu, r, c, nc, log2c, qp_c, False,
                    modes, avail, nr_c, vmask, "cb")
                _, lv_cr, rec_v, nsv = process_plane(
                    brv, rcv, src_v, cu, r, c, nc, log2c, qp_c, False,
                    modes, avail, nr_c, vmask, "cr")

                bry = bry.at[cu_s].set(rec_y[:, n - 1, :], mode="drop")
                rcy = rcy.at[cu_s].set(rec_y[:, :, n - 1], mode="drop")
                bru = bru.at[cu_s].set(rec_u[:, nc - 1, :], mode="drop")
                rcu_ = rcu_.at[cu_s].set(rec_u[:, :, nc - 1], mode="drop")
                brv = brv.at[cu_s].set(rec_v[:, nc - 1, :], mode="drop")
                rcv = rcv.at[cu_s].set(rec_v[:, :, nc - 1], mode="drop")

                ys = (cu_s, modes, lv_y, lv_cb, lv_cr, rec_y, rec_u, rec_v)
                if nr_y is not None:
                    ys = ys + (nsy, nsu + nsv)
                return (bry, rcy, bru, rcu_, brv, rcv), ys
            return step

        def to_blocks(plane, nn):
            hh, ww = plane.shape
            return (plane.reshape(hh // nn, nn, ww // nn, nn)
                    .transpose(0, 2, 1, 3).reshape(ncu, nn, nn))

        def from_blocks(blocks, nn, hh, ww):
            return (blocks.reshape(hh // nn, ww // nn, nn, nn)
                    .transpose(0, 2, 1, 3).reshape(hh, ww))

        def decide_modes_from_source(y):
            """Dense fast-intra decision: boundary vectors gathered from the
            SOURCE plane (edge-replicated), all CUs and all 35 modes in one
            MXU batch, SATD argmin. [ncu] int32."""
            p = jnp.pad(y.astype(jnp.int32), 1, mode="edge")
            ridx = np.arange(ncu) // cols
            cidx = np.arange(ncu) % cols
            y0 = ridx * n + 1
            x0 = cidx * n + 1
            ar = np.arange(n)
            bl_rows = np.minimum(y0[:, None] + 2 * n - 1 - ar[None, :],
                                 H)                       # bottom..top
            lf_rows = y0[:, None] + n - 1 - ar[None, :]
            top_cols = x0[:, None] + ar[None, :]
            tr_cols = np.minimum(x0[:, None] + n + ar[None, :], W + 1)
            coll = (x0 - 1)[:, None]
            rowt = (y0 - 1)[:, None]
            vsrc = jnp.concatenate([
                p[jnp.asarray(bl_rows), jnp.asarray(coll)],
                p[jnp.asarray(lf_rows), jnp.asarray(coll)],
                p[jnp.asarray(rowt), jnp.asarray(coll)],
                p[jnp.asarray(rowt), jnp.asarray(top_cols)],
                p[jnp.asarray(rowt), jnp.asarray(tr_cols)],
            ], axis=1)                                    # [ncu, 4n+1]
            preds = intra.predict_all_modes_matmul(vsrc, n, bd, luma=True,
                                                   strong_smoothing=False,
                                                   xp=jnp)
            yb = to_blocks(y.astype(jnp.int32), n)
            costs = pixel.satd(yb[:, None], preds, xp=jnp)
            return jnp.argmin(costs, axis=1).astype(jnp.int32)

        def encode(y, u, v, qp, nr_y=None, nr_c=None):
            # qp: per-CU map [ncu]; internal quant QP includes the bit-depth
            # offset (Qp' = Qp + 6*(bd-8))
            qp_sig = qp.astype(jnp.int32)
            qp_y_map = jnp.concatenate([qp_sig + 6 * (bd - 8),
                                        jnp.zeros((1,), jnp.int32)])
            ctab = CHROMA_QP_TABLE_444 if i444 else CHROMA_QP_TABLE
            qp_c_map = jnp.concatenate([
                jnp.take(jnp.asarray(ctab), jnp.clip(qp_sig, 0, 57))
                + 6 * (bd - 8), jnp.zeros((1,), jnp.int32)])
            yb = to_blocks(y.astype(jnp.int32), n)
            ub = to_blocks(u.astype(jnp.int32), nc)
            vb = to_blocks(v.astype(jnp.int32), nc)
            modes_all = decide_modes_from_source(y) if cfg.fast_intra \
                else None
            step = make_step(yb, ub, vb, qp_y_map, qp_c_map, nr_y, nr_c,
                             modes_all)
            z0 = y.reshape(-1)[0] * 0   # ties carry varying-ness to inputs
            init = (
                jnp.full((ncu + 1, n), fill, jnp.int32) + z0,
                jnp.full((ncu + 1, n), fill, jnp.int32) + z0,
                jnp.full((ncu + 1, nc), fill, jnp.int32) + z0,
                jnp.full((ncu + 1, nc), fill, jnp.int32) + z0,
                jnp.full((ncu + 1, nc), fill, jnp.int32) + z0,
                jnp.full((ncu + 1, nc), fill, jnp.int32) + z0,
            )
            _, ys = jax.lax.scan(step, init, (rc_all, valid_all))
            nr_tail8 = None
            if nr_y is not None:
                (cu_s, modes_s, lv_y_s, lv_cb_s, lv_cr_s,
                 rec_y_s, rec_u_s, rec_v_s, nsy_s, nsc_s) = ys
                nr_tail8 = jax.lax.bitcast_convert_type(jnp.concatenate([
                    nsy_s.sum(axis=0).reshape(-1),
                    nsc_s.sum(axis=0).reshape(-1)]), jnp.uint8).reshape(-1)
            else:
                (cu_s, modes_s, lv_y_s, lv_cb_s, lv_cr_s,
                 rec_y_s, rec_u_s, rec_v_s) = ys
            # reassemble per-CU arrays from stacked step outputs
            flat_cu = cu_s.reshape(-1)
            def collect(x, shape):
                acc = jnp.zeros((ncu + 1,) + shape, x.dtype)
                acc = acc.at[flat_cu].set(x.reshape((-1,) + shape), mode="drop")
                return acc[:ncu]
            modes = collect(modes_s, ())
            lv_y = collect(lv_y_s, (n, n))
            lv_cb = collect(lv_cb_s, (nc, nc))
            lv_cr = collect(lv_cr_s, (nc, nc))
            rec_y = collect(rec_y_s, (n, n))
            rec_u = collect(rec_u_s, (nc, nc))
            rec_v = collect(rec_v_s, (nc, nc))
            # pack everything into ONE uint8 buffer: a single host transfer
            # (the axon tunnel has ~55 ms/transfer latency; SURVEY.md §5
            # "minimise host<->device transfers")
            modes8 = modes.astype(jnp.uint8)
            lv_cat = jnp.concatenate([
                lv_y.reshape(-1), lv_cb.reshape(-1), lv_cr.reshape(-1)])
            if compact:
                # levels as int8 PAIRS packed into uint16 lanes (halves the
                # device->host transfer — the link dominates the pipeline)
                # with pure int32 lane arithmetic: narrowing to an int8
                # tensor measured slower on TPU (layout repack), while a
                # uint16 bitcast matches the int16 path's cost. A 1-byte
                # overflow flag at the buffer end makes the caller rerun
                # the rare frame whose levels exceed int8.
                overflow = ((lv_cat > 127) | (lv_cat < -128)).any()
                pairs = lv_cat.reshape(-1, 2)
                packed = ((pairs[:, 0] & 0xff)
                          | ((pairs[:, 1] & 0xff) << 8)).astype(jnp.uint16)
                levels8 = jax.lax.bitcast_convert_type(
                    packed, jnp.uint8).reshape(-1)
                flag = overflow.astype(jnp.uint8).reshape(1)
            else:
                levels8 = jax.lax.bitcast_convert_type(
                    lv_cat.astype(jnp.int16), jnp.uint8).reshape(-1)
                flag = jnp.zeros((1,), jnp.uint8)
            tail = ([] if nr_tail8 is None else [nr_tail8]) + [flag]
            if not with_recon:
                return jnp.concatenate([modes8, levels8] + tail)
            rec_cat = jnp.concatenate([
                from_blocks(rec_y, n, H, W).reshape(-1),
                from_blocks(rec_u, nc, CH, CW).reshape(-1),
                from_blocks(rec_v, nc, CH, CW).reshape(-1),
            ])
            if bd > 8:
                recon8 = jax.lax.bitcast_convert_type(
                    rec_cat.astype(jnp.int16), jnp.uint8).reshape(-1)
            else:
                recon8 = rec_cat.astype(jnp.uint8)
            return jnp.concatenate([recon8, modes8, levels8] + tail)

        return encode

    # ------------------------------------------------------------------
    def _build_qt(self, with_recon: bool = True):
        """CTU32 quadtree encoder — dense-decide + commit-scan.

        TPU-first redesign (round 3, mirroring inter_encoder._build_qt):
        intra modes for every CU size are decided DENSELY from source-pixel
        neighbors (the reference's --fast-intra approximation of
        analysis.cpp:514 compressIntraCU), per-leaf RD (SSE + lambda2 *
        estimated bits over transform/quant results) picks the quadtree
        splits bottom-up, and the wavefront lax.scan only COMMITS the
        decided tree: exact recon + levels with true neighbor references
        (spec 8.4.4.2.1 availability via qt_common.block_v), one
        single-mode prediction per leaf (35x fewer MXU FLOPs than the
        in-scan RD formulation this replaces, and a ~10x smaller scan body
        for XLA compile time — the round-2 1080p compile blow-up fix).
        Streams stay conformant and recon bit-exact; only the DECISIONS
        differ slightly from recon-neighbor SATD.
        """
        from .qt_common import block_v, QOFF, source_v
        from ..ops import bitcost as BC
        cfg = self.cfg
        n = cfg.cu_size            # 32
        nc = n // 2                # 16 chroma tile
        rows, cols = cfg.rows, cfg.cols
        W, H = cfg.width, cfg.height
        bd = cfg.bit_depth
        maxv = (1 << bd) - 1
        ncu = rows * cols
        n16 = 4 * ncu
        rc_all = self._rc
        valid_all = self._valid
        S = self.num_slots
        fill = 1 << (bd - 1)
        MODE_BITS = 7.0
        depth2 = cfg.max_depth >= 2
        sizes = [n, 16] + ([8] if depth2 else [])

        def to_blocks(plane, nn):
            hh, ww = plane.shape
            return (plane.reshape(hh // nn, nn, ww // nn, nn)
                    .transpose(0, 2, 1, 3).reshape(-1, nn, nn))

        def from_blocks(blocks, nn, hh, ww):
            return (blocks.reshape(hh // nn, ww // nn, nn, nn)
                    .transpose(0, 2, 1, 3).reshape(hh, ww))

        # ---- static geometry (frame-row-major block index maps) --------
        g32r = np.arange(ncu, dtype=np.int32) // cols
        g32c = np.arange(ncu, dtype=np.int32) % cols
        cols16, cols8 = cols * 2, cols * 4
        CTU_OF = {}
        for nn in (n, 16, 8):
            cn = W // nn
            nb = (H // nn) * cn
            bx = (np.arange(nb, dtype=np.int32) % cn) * nn
            by = (np.arange(nb, dtype=np.int32) // cn) * nn
            CTU_OF[nn] = jnp.asarray((by // n) * cols + (bx // n))
        map16 = np.zeros((ncu, 4), np.int32)
        for q, (qy, qx) in enumerate(QOFF):
            map16[:, q] = (g32r * 2 + qy) * cols16 + (g32c * 2 + qx)
        MAP16 = jnp.asarray(map16)
        map8 = np.zeros((ncu, 4, 4), np.int32)
        for q, (qy, qx) in enumerate(QOFF):
            for sq, (sy, sx) in enumerate(QOFF):
                map8[:, q, sq] = ((g32r * 4 + 2 * qy + sy) * cols8
                                  + (g32c * 4 + 2 * qx + sx))
        MAP8 = jnp.asarray(map8)
        # 16-block -> its 4 8-block children (frame row-major indices)
        r16 = np.arange(n16, dtype=np.int32) // cols16
        c16 = np.arange(n16, dtype=np.int32) % cols16
        CH8 = jnp.asarray(np.stack([(r16 * 2 + qy) * cols8 + (c16 * 2 + qx)
                                    for qy, qx in QOFF], axis=1))

        _rdoq_states = [None]   # set by the frame program at slice init

        def tq(resid, qp, log2nn, luma, modes):
            coef = transforms.forward_transform(resid, bd, xp=jnp)
            if cfg.rdoq:
                if _rdoq_states[0] is not None:
                    # round 5: context-cost RDOQ (quant.cpp:688 analog)
                    levels = quant.quant_rdoq_ctx(
                        coef, qp, log2nn, bd, _rdoq_states[0], luma,
                        psy_scale=cfg.psy_rdoq if luma else 0.0, xp=jnp)
                else:
                    levels = quant.quant_rdoq(
                        coef, qp, log2nn, bd,
                        psy_scale=cfg.psy_rdoq if luma else 0.0, xp=jnp)
            else:
                levels, du = quant.quant(coef, qp, log2nn, bd, True, xp=jnp)
                if cfg.sbh:
                    levels = quant.sign_bit_hiding_mdcs(
                        levels, du, log2nn, modes, luma, xp=jnp)
            dq = quant.dequant(levels, qp, log2nn, bd, xp=jnp)
            rr = transforms.inverse_transform(dq, bd, xp=jnp)
            return levels, rr

        def ssd(a, b):
            d = (a - b).astype(jnp.float32)
            return jnp.sum(d * d, axis=(-2, -1))

        # ---- dense decisions -------------------------------------------
        def dense_leaf(nn, y32, u32, v32, qp_y, qp_c, states):
            """Fast-intra mode + estimated RD for every aligned nn-block.
            Returns (modes, dist, bits)."""
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
            pred_u = intra.predict_mode_matmul(source_v(u32, hc), modes, hc,
                                               bd, luma=False, xp=jnp)
            pred_v = intra.predict_mode_matmul(source_v(v32, hc), modes, hc,
                                               bd, luma=False, xp=jnp)
            sy = yb
            su = to_blocks(u32, hc)
            sv = to_blocks(v32, hc)
            log2nn = nn.bit_length() - 1
            lv_y, rr_y = tq(sy - pred_y, qp_y, log2nn, True, modes)
            lv_cb, rr_u = tq(su - pred_u, qp_c, log2nn - 1, False, modes)
            lv_cr, rr_v = tq(sv - pred_v, qp_c, log2nn - 1, False, modes)
            rec_y = jnp.clip(pred_y + rr_y, 0, maxv)
            rec_u = jnp.clip(pred_u + rr_u, 0, maxv)
            rec_v = jnp.clip(pred_v + rr_v, 0, maxv)
            dist = ssd(sy, rec_y) + ssd(su, rec_u) + ssd(sv, rec_v)
            if cfg.psy_rd > 0:
                dist = dist + cfg.psy_rd * jnp.abs(
                    pixel.psy_energy(sy, xp=jnp)
                    - pixel.psy_energy(rec_y, xp=jnp)).astype(jnp.float32)
            # K9 wiring: TU bits from the frozen-context CABAC model
            # (ops/bitcost — quant.cpp:610 estBits analog)
            bits = (BC.est_tu_bits_ctx(lv_y, log2nn, True, states, xp=jnp,
                                       sign_hiding=cfg.sbh)
                    + BC.est_tu_bits_ctx(lv_cb, log2nn - 1, False, states,
                                         xp=jnp, sign_hiding=cfg.sbh)
                    + BC.est_tu_bits_ctx(lv_cr, log2nn - 1, False, states,
                                         xp=jnp, sign_hiding=cfg.sbh)
                    + MODE_BITS)
            return modes, dist, bits

        # ---- commit scan ------------------------------------------------
        def make_commit(srcs, head, qp_y_pad, qp_c_pad):
            src_yb, src_ub, src_vb = srcs

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
                lv_y, rr_y = tq(sy_ - p_y, qp_y, nn.bit_length() - 1, True,
                                modes)
                lv_cb, rr_u = tq(su_ - p_u, qp_c, hc2.bit_length() - 1,
                                 False, modes)
                lv_cr, rr_v = tq(sv_ - p_v, qp_c, hc2.bit_length() - 1,
                                 False, modes)
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
                        jnp.take(bry, gtr, axis=0),
                        jnp.take(bry, gtl, axis=0))
                nb_u = (jnp.take(rcu_, gl, axis=0), jnp.take(bru, gt, axis=0),
                        jnp.take(bru, gtr, axis=0),
                        jnp.take(bru, gtl, axis=0))
                nb_v = (jnp.take(rcv, gl, axis=0), jnp.take(brv, gt, axis=0),
                        jnp.take(brv, gtr, axis=0),
                        jnp.take(brv, gtl, axis=0))

                srcs_s = (jnp.take(src_yb, cu_s, axis=0),
                          jnp.take(src_ub, cu_s, axis=0),
                          jnp.take(src_vb, cu_s, axis=0))
                qp_y = jnp.take(qp_y_pad, cu_s)
                qp_c = jnp.take(qp_c_pad, cu_s)

                split = jnp.take(head["split"], cu_s)
                imA = jnp.take(head["imA"], cu_s)
                im16 = jnp.take(head["im16"], cu_s, axis=0)    # [S, 4]
                if depth2:
                    sp16 = jnp.take(head["split16"], cu_s, axis=0)
                    im8 = jnp.take(head["im8"], cu_s, axis=0)  # [S, 4, 4]

                zt = (jnp.zeros((S, n, n), jnp.int32),
                      jnp.zeros((S, nc, nc), jnp.int32),
                      jnp.zeros((S, nc, nc), jnp.int32))
                # variant A: whole-CTU commit (neighbors only)
                recA, lvA = commit_intra(zt, srcs_s, nb_y, nb_u, nb_v,
                                         flags, 0, 0, n, imA, qp_y, qp_c)
                # variant B: z-order leaf commits over the growing tile
                tiles, lvs = zt, zt
                for q, (qy, qx) in enumerate(QOFF):
                    y0, x0 = qy * 16, qx * 16
                    act16 = split
                    if depth2:
                        act16 = act16 & ~sp16[:, q]
                    rec16, lv16 = commit_intra(tiles, srcs_s, nb_y, nb_u,
                                               nb_v, flags, y0, x0, 16,
                                               im16[:, q], qp_y, qp_c)
                    tiles, lvs = put_masked(tiles, lvs, y0, x0, 16,
                                            rec16, lv16, act16)
                    if not depth2:
                        continue
                    for sq, (sy2, sx2) in enumerate(QOFF):
                        yy, xx = y0 + 8 * sy2, x0 + 8 * sx2
                        act8 = split & sp16[:, q]
                        rec8, lv8 = commit_intra(tiles, srcs_s, nb_y, nb_u,
                                                 nb_v, flags, yy, xx, 8,
                                                 im8[:, q, sq], qp_y, qp_c)
                        tiles, lvs = put_masked(tiles, lvs, yy, xx, 8,
                                                rec8, lv8, act8)

                selA = (~split)[:, None, None]
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

        def encode(y, u, v, qp, *rest):
            slice_qp = rest[0] if cfg.dpb else None
            qp_sig = qp.astype(jnp.int32)
            qp_y_cu = qp_sig + 6 * (bd - 8)
            qp_c_cu = jnp.take(jnp.asarray(CHROMA_QP_TABLE),
                               jnp.clip(qp_sig, 0, 57)) + 6 * (bd - 8)
            qp_y_pad = jnp.concatenate([qp_y_cu, qp_y_cu[:1]])
            qp_c_pad = jnp.concatenate([qp_c_cu, qp_c_cu[:1]])
            y32 = y.astype(jnp.int32)
            u32 = u.astype(jnp.int32)
            v32 = v.astype(jnp.int32)

            # K9 contexts frozen at I-slice init (x265 enum: 2 = I)
            states = BC.init_states_dev(2, qp_sig[0], xp=jnp)
            _rdoq_states[0] = states
            leaf = {}
            for nn in sizes:
                qpy_blk = jnp.take(qp_y_cu, CTU_OF[nn])
                qpc_blk = jnp.take(qp_c_cu, CTU_OF[nn])
                modes, dist, bits = dense_leaf(nn, y32, u32, v32,
                                               qpy_blk, qpc_blk, states)
                leaf[nn] = {"modes": modes, "dist": dist, "bits": bits}

            # bottom-up split decisions (analysis.cpp:514 analog)
            lam2_ctu = 0.85 * jnp.exp2((qp_sig.astype(jnp.float32) - 12.0)
                                       / 3.0)
            lam2_16 = jnp.take(lam2_ctu, CTU_OF[16])
            d16, b16 = leaf[16]["dist"], leaf[16]["bits"]
            if depth2:
                d8sum = jnp.take(leaf[8]["dist"], CH8).sum(1)
                b8sum = jnp.take(leaf[8]["bits"], CH8).sum(1)
                split16 = (d8sum + lam2_16 * (b8sum + 1.0)) \
                    < (d16 + lam2_16 * (b16 + 1.0))
                t16d = jnp.where(split16, d8sum, d16)
                t16b = jnp.where(split16, b8sum + 1.0, b16 + 1.0)
            else:
                t16d, t16b = d16, b16 + 0.0
            dB = jnp.take(t16d, MAP16).sum(1)
            bB = jnp.take(t16b, MAP16).sum(1) + 1.0
            dA = leaf[n]["dist"]
            bA = leaf[n]["bits"] + 1.0
            split = (dB + lam2_ctu * bB) < (dA + lam2_ctu * bA)

            im16_ctu = jnp.take(leaf[16]["modes"], MAP16)       # [ncu, 4]
            head = {
                "split": jnp.concatenate([split, split[:1]]),
                "imA": jnp.concatenate([leaf[n]["modes"],
                                        leaf[n]["modes"][:1]]),
                "im16": jnp.concatenate([im16_ctu, im16_ctu[:1]]),
            }
            if depth2:
                sp16_ctu = jnp.take(split16, MAP16)
                im8_ctu = jnp.take(leaf[8]["modes"], MAP8)
                head["split16"] = jnp.concatenate([sp16_ctu, sp16_ctu[:1]])
                head["im8"] = jnp.concatenate([im8_ctu, im8_ctu[:1]])

            def padded(a, shape):
                return jnp.concatenate(
                    [a, jnp.zeros((1,) + shape, a.dtype)], 0)

            srcs = (padded(to_blocks(y32, n), (n, n)),
                    padded(to_blocks(u32, nc), (nc, nc)),
                    padded(to_blocks(v32, nc), (nc, nc)))
            step = make_commit(srcs, head, qp_y_pad, qp_c_pad)
            z0 = y.reshape(-1)[0].astype(jnp.int32) * 0
            init = tuple(jnp.full((ncu + 1, k), fill, jnp.int32) + z0
                         for k in (n, n, nc, nc, nc, nc))
            _, ys = jax.lax.scan(step, init, (rc_all, valid_all))
            (cu_s, lv_y_s, lv_cb_s, lv_cr_s, rec_y_s, rec_u_s, rec_v_s) = ys
            flat_cu = cu_s.reshape(-1)

            def collect(x, shape, dtype=None):
                acc = jnp.zeros((ncu + 1,) + shape,
                                x.dtype if dtype is None else dtype)
                acc = acc.at[flat_cu].set(
                    x.reshape((-1,) + shape).astype(acc.dtype), mode="drop")
                return acc[:ncu]

            lv_y = collect(lv_y_s, (n, n))
            lv_cb = collect(lv_cb_s, (nc, nc))
            lv_cr = collect(lv_cr_s, (nc, nc))
            rec_y = collect(rec_y_s, (n, n))
            rec_u = collect(rec_u_s, (nc, nc))
            rec_v = collect(rec_v_s, (nc, nc))
            head_parts = [split.astype(jnp.uint8),
                          leaf[n]["modes"].astype(jnp.uint8),
                          im16_ctu.astype(jnp.uint8).reshape(-1)]
            if depth2:
                head_parts += [
                    jnp.take(split16, MAP16).astype(jnp.uint8).reshape(-1),
                    jnp.take(leaf[8]["modes"], MAP8).astype(
                        jnp.uint8).reshape(-1)]
            head8 = jnp.concatenate(head_parts)
            levels16 = jnp.concatenate([
                lv_y.reshape(-1), lv_cb.reshape(-1), lv_cr.reshape(-1)
            ]).astype(jnp.int16)
            levels8 = jax.lax.bitcast_convert_type(levels16,
                                                   jnp.uint8).reshape(-1)
            if cfg.dpb:
                # device-resident DPB: filters in-jit, recon stays on device
                from ..ops import filters_dev as FD
                rec3_full = (from_blocks(rec_y, n, H, W),
                             from_blocks(rec_u, nc, H // 2, W // 2),
                             from_blocks(rec_v, nc, H // 2, W // 2))
                sp16_r = split16 if depth2 else None
                out3, sao_arrs = FD.qt_loopfilter_dev(
                    rec3_full, (y32, u32, v32), qp_sig, slice_qp,
                    split, sp16_r, None, None, None,
                    (lv_y, lv_cb, lv_cr), rows, cols, depth2,
                    cfg.deblock, cfg.sao, bd)
                pdt_o = jnp.uint16 if bd > 8 else jnp.uint8
                outs = (jnp.concatenate([head8, levels8]),) + \
                    tuple(p.astype(pdt_o) for p in out3)
                if sao_arrs is not None:
                    outs = outs + (FD.pack_sao_params(sao_arrs),)
                return outs
            if not with_recon:
                return jnp.concatenate([head8, levels8])
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
            return jnp.concatenate([recon8, head8, levels8])

        return encode
    # ------------------------------------------------------------------
    def _build_qt64(self, with_recon: bool = True):
        """CTU64 wavefront (the reference's default CTU size) with an
        in-scan quadtree over 32/16(/8) CUs. The 64x64 depth-0 CU is always
        split (an encoder-side choice: intra 64 CUs need 4-TB prediction and
        are rarely chosen by the reference either); the four 32 subtrees are
        coded in z-order with exact intra reference propagation through the
        64-tile (qt_common.block_v derives spec availability from z-order).
        max_depth 2 => min CU 16, 3 => min CU 8."""
        from .qt_common import block_v, QOFF
        cfg = self.cfg
        n = cfg.cu_size            # 64
        nc = n // 2                # 32 chroma tile
        rows, cols = cfg.rows, cfg.cols
        W, H = cfg.width, cfg.height
        bd = cfg.bit_depth
        maxv = (1 << bd) - 1
        ncu = rows * cols
        rc_all = self._rc
        valid_all = self._valid
        S = self.num_slots
        fill = 1 << (bd - 1)
        MODE_BITS = 7.0
        depth3 = cfg.max_depth >= 3

        def to_blocks(plane, nn):
            hh, ww = plane.shape
            return (plane.reshape(hh // nn, nn, ww // nn, nn)
                    .transpose(0, 2, 1, 3).reshape(ncu, nn, nn))

        def from_blocks(blocks, nn, hh, ww):
            return (blocks.reshape(hh // nn, ww // nn, nn, nn)
                    .transpose(0, 2, 1, 3).reshape(hh, ww))

        def encode_block(v_raw, av, src, qp, log2nn, luma, modes=None):
            v = intra.substitute_references(v_raw, av, bd, xp=jnp)
            nn = 1 << log2nn
            preds = intra.predict_all_modes_matmul(v, nn, bd, luma=luma,
                                                   strong_smoothing=False,
                                                   xp=jnp)
            if modes is None:
                costs = pixel.satd(src[:, None], preds, xp=jnp)
                modes = jnp.argmin(costs, axis=1).astype(jnp.int32)
            pred = jnp.take_along_axis(
                preds, modes[:, None, None, None].astype(jnp.int32),
                axis=1)[:, 0]
            resid = src.astype(jnp.int32) - pred
            coef = transforms.forward_transform(resid, bd, xp=jnp)
            if cfg.rdoq:
                levels = quant.quant_rdoq(
                    coef, qp, log2nn, bd,
                    psy_scale=cfg.psy_rdoq if luma else 0.0, xp=jnp)
            else:
                levels, du = quant.quant(coef, qp, log2nn, bd, True, xp=jnp)
                if cfg.sbh:
                    levels = quant.sign_bit_hiding_mdcs(
                        levels, du, log2nn, modes, luma, xp=jnp)
            dq = quant.dequant(levels, qp, log2nn, bd, xp=jnp)
            rr = transforms.inverse_transform(dq, bd, xp=jnp)
            recon = jnp.clip(pred + rr, 0, maxv)
            return modes, levels, recon

        def ssd(a, b):
            d = (a - b).astype(jnp.float32)
            return jnp.sum(d * d, axis=(-2, -1))

        def make_step(src_y_blocks, src_u_blocks, src_v_blocks,
                      qp_y_map, qp_c_map, qp_sig_map):
            def step(carry, xs):
                (bry, rcy, bru, rcu_, brv, rcv) = carry
                rc, valid = xs
                r = rc[:, 0]
                c = rc[:, 1]
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

                src_y = jnp.take(src_y_blocks, cu_s, axis=0)
                src_u = jnp.take(src_u_blocks, cu_s, axis=0)
                src_v = jnp.take(src_v_blocks, cu_s, axis=0)
                qp_y = jnp.take(qp_y_map, cu_s, axis=0)
                qp_c = jnp.take(qp_c_map, cu_s, axis=0)
                qp_sig = jnp.take(qp_sig_map, cu_s, axis=0)
                lam2 = 0.85 * jnp.exp2((qp_sig.astype(jnp.float32) - 12.0)
                                       / 3.0)

                nb_y = (jnp.take(rcy, gl, axis=0), jnp.take(bry, gt, axis=0),
                        jnp.take(bry, gtr, axis=0), jnp.take(bry, gtl, axis=0))
                nb_u = (jnp.take(rcu_, gl, axis=0), jnp.take(bru, gt, axis=0),
                        jnp.take(bru, gtr, axis=0), jnp.take(bru, gtl, axis=0))
                nb_v = (jnp.take(rcv, gl, axis=0), jnp.take(brv, gt, axis=0),
                        jnp.take(brv, gtr, axis=0), jnp.take(brv, gtl, axis=0))
                flags = (al, at, atr, atl)

                def code_at(tiles, y0, x0, nn, modes=None):
                    ty, tu, tv = tiles
                    vy, ay = block_v(ty, *nb_y, *flags, y0, x0, nn)
                    sy = src_y[:, y0:y0 + nn, x0:x0 + nn]
                    m, lv_y, rec_y = encode_block(vy, ay, sy, qp_y,
                                                  nn.bit_length() - 1, True,
                                                  modes)
                    hc2 = nn // 2
                    yc, xc = y0 // 2, x0 // 2
                    vu, au = block_v(tu, *nb_u, *flags, yc, xc, hc2)
                    su = src_u[:, yc:yc + hc2, xc:xc + hc2]
                    _, lv_cb, rec_u = encode_block(vu, au, su, qp_c,
                                                   hc2.bit_length() - 1,
                                                   False, m)
                    vv, av_ = block_v(tv, *nb_v, *flags, yc, xc, hc2)
                    sv = src_v[:, yc:yc + hc2, xc:xc + hc2]
                    _, lv_cr, rec_v = encode_block(vv, av_, sv, qp_c,
                                                   hc2.bit_length() - 1,
                                                   False, m)
                    dist = ssd(sy, rec_y) + ssd(su, rec_u) + ssd(sv, rec_v)
                    if cfg.psy_rd > 0:
                        dist = dist + cfg.psy_rd * jnp.abs(
                            pixel.psy_energy(sy, xp=jnp)
                            - pixel.psy_energy(rec_y, xp=jnp)
                        ).astype(jnp.float32)
                    bits = (quant.est_tu_bits(lv_y, xp=jnp)
                            + quant.est_tu_bits(lv_cb, xp=jnp)
                            + quant.est_tu_bits(lv_cr, xp=jnp) + MODE_BITS)
                    return m, lv_y, rec_y, lv_cb, rec_u, lv_cr, rec_v, \
                        dist, bits

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

                def take3(tiles, y0, x0, nn):
                    yc, xc, hc2 = y0 // 2, x0 // 2, nn // 2
                    return (tiles[0][:, y0:y0 + nn, x0:x0 + nn],
                            tiles[1][:, yc:yc + hc2, xc:xc + hc2],
                            tiles[2][:, yc:yc + hc2, xc:xc + hc2])

                def code_16_tree(tiles, lvs, y0, x0):
                    """One 16-block: either a 16 CU or (depth3) 4x8 CUs.
                    Writes the chosen recon/levels into tiles/lvs and
                    returns (tiles, lvs, dist, bits, sp16, m16, m8[4])."""
                    (m16, l16y, r16y, l16cb, r16u, l16cr, r16v,
                     d16, b16) = code_at(tiles, y0, x0, 16)
                    if not depth3:
                        tiles, lvs = put(tiles, lvs, y0, x0, 16,
                                         (r16y, r16u, r16v),
                                         (l16y, l16cb, l16cr))
                        z = jnp.zeros((S,), jnp.int32)
                        return (tiles, lvs, d16, b16 + 1.0,
                                jnp.zeros((S,), bool), m16,
                                jnp.stack([z, z, z, z], axis=1))
                    t8, lv8 = tiles, lvs
                    m8q = []
                    d8 = jnp.zeros((S,), jnp.float32)
                    b8 = jnp.zeros((S,), jnp.float32)
                    for sy_, sx_ in QOFF:
                        yy, xx = y0 + 8 * sy_, x0 + 8 * sx_
                        (m8, l8y, r8y, l8cb, r8u, l8cr, r8v,
                         dd, bb) = code_at(t8, yy, xx, 8)
                        t8, lv8 = put(t8, lv8, yy, xx, 8,
                                      (r8y, r8u, r8v), (l8y, l8cb, l8cr))
                        m8q.append(m8)
                        d8 = d8 + dd
                        b8 = b8 + bb
                    sp16 = (d8 + lam2 * (b8 + 1.0)) < (d16 + lam2 * (b16 + 1.0))
                    sel = sp16[:, None, None]
                    rec_sel = tuple(jnp.where(sel, a, b) for a, b in zip(
                        take3(t8, y0, x0, 16), (r16y, r16u, r16v)))
                    lv_sel = tuple(jnp.where(sel, a, b) for a, b in zip(
                        take3(lv8, y0, x0, 16), (l16y, l16cb, l16cr)))
                    tiles, lvs = put(tiles, lvs, y0, x0, 16, rec_sel, lv_sel)
                    dist = jnp.where(sp16, d8, d16)
                    bits = jnp.where(sp16, b8 + 1.0, b16 + 1.0)
                    return (tiles, lvs, dist, bits, sp16, m16,
                            jnp.stack(m8q, axis=1))

                def code_32_tree(tiles, lvs, y0, x0):
                    """One 32-block: a 32 CU vs four 16-trees. Returns
                    (tiles, lvs, sp32, m32, sp16[4], m16[4], m8[4,4])."""
                    (m32, l32y, r32y, l32cb, r32u, l32cr, r32v,
                     d32, b32) = code_at(tiles, y0, x0, 32)
                    t16, lv16 = tiles, lvs
                    dq = jnp.zeros((S,), jnp.float32)
                    bq = jnp.zeros((S,), jnp.float32)
                    sp16s, m16s, m8s = [], [], []
                    for qy, qx in QOFF:
                        yy, xx = y0 + 16 * qy, x0 + 16 * qx
                        (t16, lv16, dd, bb, sp16, m16,
                         m8) = code_16_tree(t16, lv16, yy, xx)
                        dq = dq + dd
                        bq = bq + bb
                        sp16s.append(sp16)
                        m16s.append(m16)
                        m8s.append(m8)
                    sp32 = (dq + lam2 * (bq + 1.0)) < (d32 + lam2 * (b32 + 1.0))
                    sel = sp32[:, None, None]
                    rec_sel = tuple(jnp.where(sel, a, b) for a, b in zip(
                        take3(t16, y0, x0, 32), (r32y, r32u, r32v)))
                    lv_sel = tuple(jnp.where(sel, a, b) for a, b in zip(
                        take3(lv16, y0, x0, 32), (l32y, l32cb, l32cr)))
                    tiles, lvs = put(tiles, lvs, y0, x0, 32, rec_sel, lv_sel)
                    return (tiles, lvs, sp32, m32, jnp.stack(sp16s, axis=1),
                            jnp.stack(m16s, axis=1), jnp.stack(m8s, axis=1))

                zt = (jnp.zeros((S, n, n), jnp.int32),
                      jnp.zeros((S, nc, nc), jnp.int32),
                      jnp.zeros((S, nc, nc), jnp.int32))
                tiles, lvs = zt, zt
                sp32s, m32s, sp16s, m16s, m8s = [], [], [], [], []
                for qy, qx in QOFF:          # 32-subtrees in z-order
                    (tiles, lvs, sp32, m32, sp16, m16,
                     m8) = code_32_tree(tiles, lvs, 32 * qy, 32 * qx)
                    sp32s.append(sp32)
                    m32s.append(m32)
                    sp16s.append(sp16)
                    m16s.append(m16)
                    m8s.append(m8)

                rec_y, rec_u, rec_v = tiles
                lv_y, lv_cb, lv_cr = lvs
                bry = bry.at[cu_s].set(rec_y[:, n - 1, :], mode="drop")
                rcy = rcy.at[cu_s].set(rec_y[:, :, n - 1], mode="drop")
                bru = bru.at[cu_s].set(rec_u[:, nc - 1, :], mode="drop")
                rcu_ = rcu_.at[cu_s].set(rec_u[:, :, nc - 1], mode="drop")
                brv = brv.at[cu_s].set(rec_v[:, nc - 1, :], mode="drop")
                rcv = rcv.at[cu_s].set(rec_v[:, :, nc - 1], mode="drop")

                ys = (cu_s, jnp.stack(sp32s, axis=1),
                      jnp.stack(m32s, axis=1), jnp.stack(sp16s, axis=1),
                      jnp.stack(m16s, axis=1), jnp.stack(m8s, axis=1),
                      lv_y, lv_cb, lv_cr, rec_y, rec_u, rec_v)
                return (bry, rcy, bru, rcu_, brv, rcv), ys
            return step

        def encode(y, u, v, qp):
            qp_sig = qp.astype(jnp.int32)
            qp_sig_map = jnp.concatenate([qp_sig, jnp.zeros((1,), jnp.int32)])
            qp_y_map = jnp.concatenate([qp_sig + 6 * (bd - 8),
                                        jnp.zeros((1,), jnp.int32)])
            qp_c_map = jnp.concatenate([
                jnp.take(jnp.asarray(CHROMA_QP_TABLE), jnp.clip(qp_sig, 0, 57))
                + 6 * (bd - 8), jnp.zeros((1,), jnp.int32)])
            yb = to_blocks(y.astype(jnp.int32), n)
            ub = to_blocks(u.astype(jnp.int32), nc)
            vb = to_blocks(v.astype(jnp.int32), nc)
            step = make_step(yb, ub, vb, qp_y_map, qp_c_map, qp_sig_map)
            z0 = y.reshape(-1)[0].astype(jnp.int32) * 0
            init = tuple(jnp.full((ncu + 1, k), fill, jnp.int32) + z0
                         for k in (n, n, nc, nc, nc, nc))
            _, ys = jax.lax.scan(step, init, (rc_all, valid_all))
            (cu_s, sp32_s, m32_s, sp16_s, m16_s, m8_s,
             lv_y_s, lv_cb_s, lv_cr_s, rec_y_s, rec_u_s, rec_v_s) = ys
            flat_cu = cu_s.reshape(-1)

            def collect(x, shape, dtype=None):
                acc = jnp.zeros((ncu + 1,) + shape,
                                x.dtype if dtype is None else dtype)
                acc = acc.at[flat_cu].set(
                    x.reshape((-1,) + shape).astype(acc.dtype), mode="drop")
                return acc[:ncu]

            head_parts = [
                collect(sp32_s, (4,), jnp.uint8).reshape(-1),
                collect(m32_s, (4,), jnp.uint8).reshape(-1),
                collect(sp16_s, (4, 4), jnp.uint8).reshape(-1),
                collect(m16_s, (4, 4), jnp.uint8).reshape(-1),
                collect(m8_s, (4, 4, 4), jnp.uint8).reshape(-1),
            ]
            lv_y = collect(lv_y_s, (n, n))
            lv_cb = collect(lv_cb_s, (nc, nc))
            lv_cr = collect(lv_cr_s, (nc, nc))
            rec_y = collect(rec_y_s, (n, n))
            rec_u = collect(rec_u_s, (nc, nc))
            rec_v = collect(rec_v_s, (nc, nc))
            head8 = jnp.concatenate(head_parts)
            levels16 = jnp.concatenate([
                lv_y.reshape(-1), lv_cb.reshape(-1), lv_cr.reshape(-1)
            ]).astype(jnp.int16)
            levels8 = jax.lax.bitcast_convert_type(levels16, jnp.uint8).reshape(-1)
            if not with_recon:
                return jnp.concatenate([head8, levels8])
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
            return jnp.concatenate([recon8, head8, levels8])

        return encode

    # ------------------------------------------------------------------
    def _unpack_qt64(self, buf: np.ndarray, with_recon: bool = True) -> dict:
        cfg = self.cfg
        n, nc = cfg.cu_size, cfg.cu_size // 2
        rows, cols, ncu = cfg.rows, cfg.cols, cfg.rows * cfg.cols
        W, H = cfg.width, cfg.height
        ny, nuv = H * W, (H // 2) * (W // 2)
        bsz = 2 if cfg.bit_depth > 8 else 1
        o = 0
        rec_y = rec_u = rec_v = None
        if with_recon:
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

        def head(count, shape, dtype=np.int32):
            nonlocal o
            a = buf[o:o + count].astype(dtype).reshape((rows, cols) + shape)
            o += count
            return a
        split32 = head(4 * ncu, (4,), bool)
        modes32 = head(4 * ncu, (4,))
        split16 = head(16 * ncu, (4, 4), bool)
        modes16 = head(16 * ncu, (4, 4))
        modes8 = head(64 * ncu, (4, 4, 4))
        lv = buf[o:].view(np.int16)
        sy = ncu * n * n
        sc = ncu * nc * nc
        return {
            "split32": split32, "modes32": modes32,
            "split16": split16, "modes16": modes16, "modes8": modes8,
            "levels_y": lv[:sy].astype(np.int32).reshape(rows, cols, n, n),
            "levels_cb": lv[sy:sy + sc].astype(np.int32).reshape(rows, cols, nc, nc),
            "levels_cr": lv[sy + sc:sy + 2 * sc].astype(np.int32).reshape(rows, cols, nc, nc),
            "recon_y": None if rec_y is None else rec_y.astype(np.int32),
            "recon_u": None if rec_u is None else rec_u.astype(np.int32),
            "recon_v": None if rec_v is None else rec_v.astype(np.int32),
        }

    # ------------------------------------------------------------------
    def _unpack(self, buf: np.ndarray, with_recon: bool = True,
                compact: bool = None) -> dict:
        if self.cfg.max_depth and self.cfg.cu_size == 64:
            return self._unpack_qt64(buf, with_recon)
        if self.cfg.max_depth:
            return self._unpack_qt(buf, with_recon)
        cfg = self.cfg
        i444 = cfg.csp == "i444"
        n = cfg.cu_size
        nc = n if i444 else n // 2
        rows, cols, ncu = cfg.rows, cfg.cols, cfg.rows * cfg.cols
        W, H = cfg.width, cfg.height
        CH, CW = (H, W) if i444 else (H // 2, W // 2)
        ny, nuv = H * W, CH * CW
        bsz = 2 if cfg.bit_depth > 8 else 1
        o = 0
        rec_y = rec_u = rec_v = None
        if with_recon:
            def plane(count, hh, ww):
                nonlocal o
                raw = buf[o:o + count * bsz]
                o += count * bsz
                if bsz == 2:
                    return raw.view(np.int16).reshape(hh, ww)
                return raw.reshape(hh, ww)
            rec_y = plane(ny, H, W)
            rec_u = plane(nuv, CH, CW)
            rec_v = plane(nuv, CH, CW)
        modes = buf[o:o + ncu].astype(np.int32).reshape(rows, cols); o += ncu
        sy = ncu * n * n
        sc = ncu * nc * nc
        if compact is None:
            compact = self._compact
        if compact:
            lv = buf[o:o + sy + 2 * sc].view(np.int8)
            o += sy + 2 * sc
        else:
            lv = buf[o:o + 2 * (sy + 2 * sc)].view(np.int16)
            o += 2 * (sy + 2 * sc)
        out = {
            "modes": modes,
            "levels_y": lv[:sy].astype(np.int32).reshape(rows, cols, n, n),
            "levels_cb": lv[sy:sy + sc].astype(np.int32).reshape(rows, cols, nc, nc),
            "levels_cr": lv[sy + sc:sy + 2 * sc].astype(np.int32).reshape(rows, cols, nc, nc),
            "recon_y": None if rec_y is None else rec_y.astype(np.int32),
            "recon_u": None if rec_u is None else rec_u.astype(np.int32),
            "recon_v": None if rec_v is None else rec_v.astype(np.int32),
        }
        if cfg.nr:
            tail = buf[o:o + 4 * (n * n + nc * nc)].view(np.int32)
            out["nr_sum_y"] = tail[:n * n].astype(np.int64)
            out["nr_sum_c"] = tail[n * n:].astype(np.int64)
        return out

    # ------------------------------------------------------------------
    def _unpack_qt(self, buf: np.ndarray, with_recon: bool = True) -> dict:
        cfg = self.cfg
        n, nc = cfg.cu_size, cfg.cu_size // 2
        rows, cols, ncu = cfg.rows, cfg.cols, cfg.rows * cfg.cols
        W, H = cfg.width, cfg.height
        ny, nuv = H * W, (H // 2) * (W // 2)
        bsz = 2 if cfg.bit_depth > 8 else 1
        o = 0
        rec_y = rec_u = rec_v = None
        if with_recon:
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
        modes = buf[o:o + ncu].astype(np.int32).reshape(rows, cols); o += ncu
        modes4 = buf[o:o + 4 * ncu].astype(np.int32).reshape(rows, cols, 4)
        o += 4 * ncu
        split16 = modes8 = None
        if cfg.max_depth >= 2:
            split16 = buf[o:o + 4 * ncu].astype(bool).reshape(rows, cols, 4)
            o += 4 * ncu
            modes8 = (buf[o:o + 16 * ncu].astype(np.int32)
                      .reshape(rows, cols, 4, 4))
            o += 16 * ncu
        lv = buf[o:].view(np.int16)
        sy = ncu * n * n
        sc = ncu * nc * nc
        return {
            "split": split,
            "modes": modes,
            "modes4": modes4,
            "split16": split16,
            "modes8": modes8,
            "levels_y": lv[:sy].astype(np.int32).reshape(rows, cols, n, n),
            "levels_cb": lv[sy:sy + sc].astype(np.int32).reshape(rows, cols, nc, nc),
            "levels_cr": lv[sy + sc:sy + 2 * sc].astype(np.int32).reshape(rows, cols, nc, nc),
            "recon_y": None if rec_y is None else rec_y.astype(np.int32),
            "recon_u": None if rec_u is None else rec_u.astype(np.int32),
            "recon_v": None if rec_v is None else rec_v.astype(np.int32),
        }
