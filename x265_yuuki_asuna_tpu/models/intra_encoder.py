"""All-intra frame encoder: JAX wavefront over the CU grid.

The reference encodes CTUs through a threaded WPP wavefront with per-CTU
recursive RDO (frameencoder.cpp:1342 processRowEncoder, analysis.cpp:514
compressIntraCU). The TPU re-design (SURVEY.md §7):

  * uniform CU grid (CTU == CU), picture padded to whole CTUs, conformance
    window crops — all shapes static for XLA;
  * a `lax.scan` over wavefront diagonals; each step processes every CU on
    the diagonal as one batch: 35-mode batched prediction ("allangs"),
    SATD mode decision, transform/quant/recon — MXU/VPU work;
  * the sequential CABAC pass consumes the decision tensors afterwards on
    the host (bitstream/), mirroring the reference's encodeSlice split.

Compute dtype: exact int32 throughout (HEVC is an integer-exact codec).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

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


@dataclass(frozen=True)
class IntraFrameConfig:
    width: int              # padded (coded) luma width, multiple of cu_size
    height: int
    cu_size: int = 16       # 16 or 32: uniform CTU==CU grid
    qp: int = 32
    bit_depth: int = 8
    lambda_mode_bits: float = 0.0   # reserved for RD mode costs

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
    """Builds and caches the jitted wavefront encode for one geometry."""

    def __init__(self, cfg: IntraFrameConfig):
        self.cfg = cfg
        nd, ns, rc, valid = wavefront_schedule(cfg.rows, cfg.cols, slope=2)
        self.num_diags = nd
        self.num_slots = ns
        self._rc = jnp.asarray(rc)          # [nd, ns, 2]
        self._valid = jnp.asarray(valid)    # [nd, ns]
        self._encode = jax.jit(self._build())
        # frame-batched variant (frame-parallelism, the reference's
        # frame-threads analog): the wavefront step batch becomes [F*S, ...]
        self._encode_batch = jax.jit(jax.vmap(self._build()))

    # ------------------------------------------------------------------
    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        """y: [H, W] uint8 padded to coded size; u, v: [H/2, W/2].
        Returns dict of decision tensors + recon planes (numpy)."""
        cfg = self.cfg
        assert y.shape == (cfg.height, cfg.width), y.shape
        out = self._encode(jnp.asarray(y, jnp.int32), jnp.asarray(u, jnp.int32),
                           jnp.asarray(v, jnp.int32))
        return jax.tree_util.tree_map(np.asarray, out)

    # ------------------------------------------------------------------
    def encode_frames(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        """Batched encode: y [F, H, W]; independent frames in parallel."""
        out = self._encode_batch(jnp.asarray(y, jnp.int32),
                                 jnp.asarray(u, jnp.int32),
                                 jnp.asarray(v, jnp.int32))
        return jax.tree_util.tree_map(np.asarray, out)

    # ------------------------------------------------------------------
    def _build(self):
        cfg = self.cfg
        n = cfg.cu_size
        nc = n // 2
        log2n = cfg.log2_cu
        rows, cols = cfg.rows, cfg.cols
        W, H = cfg.width, cfg.height
        Wc, Hc = W // 2, H // 2
        qp_y = cfg.qp
        qp_c = chroma_qp_from_luma(cfg.qp)
        bd = cfg.bit_depth
        maxv = (1 << bd) - 1
        ncu = rows * cols
        rc_all = self._rc
        valid_all = self._valid
        S = self.num_slots

        def gather_v(plane_flat, pw, py, px, nn, avail_l, avail_t, avail_tr,
                     avail_tl):
            """Build the [S, 4nn+1] boundary vector + availability mask."""
            ar = jnp.arange(nn * 2, dtype=jnp.int32)
            # left column, v order = left[2n-1] .. left[0]
            lrow = py[:, None] + (2 * nn - 1 - ar)[None, :]
            lcol = (px - 1)[:, None]
            left_idx = jnp.clip(lrow, 0, None) * pw + jnp.clip(lcol, 0, None)
            # corner
            crow = (py - 1)
            ccol = (px - 1)
            corner_idx = jnp.clip(crow, 0, None) * pw + jnp.clip(ccol, 0, None)
            # top row left..topright
            trow = (py - 1)[:, None]
            tcol = px[:, None] + ar[None, :]
            top_idx = jnp.clip(trow, 0, None) * pw + jnp.clip(tcol, 0, None)
            idx = jnp.concatenate([left_idx, corner_idx[:, None], top_idx], axis=1)
            vals = jnp.take(plane_flat, jnp.clip(idx, 0, plane_flat.shape[0] - 1),
                            axis=0)
            ones = jnp.ones((S, nn), dtype=bool)
            av = jnp.concatenate([
                jnp.zeros((S, nn), dtype=bool),             # below-left: never
                ones * avail_l[:, None],                    # left
                avail_tl[:, None],                          # corner
                ones * avail_t[:, None],                    # top
                ones * avail_tr[:, None],                   # top-right
            ], axis=1)
            return vals, av

        def process_plane(plane_flat, src_blocks, pw, py, px, nn, log2nn, qp,
                          luma, modes, avail):
            """Predict (given modes or all), transform, quant, recon for a
            batch of S blocks. Returns (levels, recon_blocks, pred35 or None)."""
            avail_l, avail_t, avail_tr, avail_tl = avail
            v_raw, av = gather_v(plane_flat, pw, py, px, nn, avail_l, avail_t,
                                 avail_tr, avail_tl)
            v = intra.substitute_references(v_raw, av, bd, xp=jnp)
            preds = intra.predict_all_modes(v, nn, bd, luma=luma,
                                            strong_smoothing=False, xp=jnp)
            if modes is None:
                costs = pixel.satd(src_blocks[:, None], preds, xp=jnp)
                modes = jnp.argmin(costs, axis=1).astype(jnp.int32)
            pred = jnp.take_along_axis(
                preds, modes[:, None, None, None].astype(jnp.int32), axis=1)[:, 0]
            resid = src_blocks.astype(jnp.int32) - pred
            coef = transforms.forward_transform(resid, bd, xp=jnp)
            levels, _ = quant.quant(coef, qp, log2nn, bd, True, xp=jnp)
            dq = quant.dequant(levels, qp, log2nn, bd, xp=jnp)
            rr = transforms.inverse_transform(dq, bd, xp=jnp)
            recon = jnp.clip(pred + rr, 0, maxv)
            return modes, levels, recon

        def scatter_plane(plane_flat, pw, ph, py, px, nn, vals, active):
            ar = jnp.arange(nn, dtype=jnp.int32)
            rowg = py[:, None, None] + ar[None, :, None]
            colg = px[:, None, None] + ar[None, None, :]
            idx = rowg * pw + colg
            idx = jnp.where(active[:, None, None], idx, pw * ph)
            return plane_flat.at[idx].set(vals, mode="drop")

        def make_step(src_y_flat, src_u_flat, src_v_flat):
          def step(carry, xs):
            (ry, ru, rv, modes_out, lv_y, lv_cb, lv_cr) = carry
            rc, valid = xs                    # [S, 2], [S]
            r = rc[:, 0]
            c = rc[:, 1]
            py = r * n
            px = c * n
            avail_l = (c > 0) & valid
            avail_t = (r > 0) & valid
            avail_tr = ((r > 0) & (c < cols - 1)) & valid
            avail_tl = ((r > 0) & (c > 0)) & valid

            # source blocks
            ar = jnp.arange(n, dtype=jnp.int32)
            rowg = py[:, None, None] + ar[None, :, None]
            colg = px[:, None, None] + ar[None, None, :]
            src_y = jnp.take(src_y_flat, rowg * W + colg, axis=0)

            modes, levels_y, recon_y = process_plane(
                ry, src_y, W, py, px, n, log2n, qp_y, True, None,
                (avail_l, avail_t, avail_tr, avail_tl))

            arc = jnp.arange(nc, dtype=jnp.int32)
            pyc = py // 2
            pxc = px // 2
            rowgc = pyc[:, None, None] + arc[None, :, None]
            colgc = pxc[:, None, None] + arc[None, None, :]
            src_u = jnp.take(src_u_flat, rowgc * Wc + colgc, axis=0)
            src_v = jnp.take(src_v_flat, rowgc * Wc + colgc, axis=0)

            _, levels_cb, recon_u = process_plane(
                ru, src_u, Wc, pyc, pxc, nc, log2n - 1, qp_c, False, modes,
                (avail_l, avail_t, avail_tr, avail_tl))
            _, levels_cr, recon_v = process_plane(
                rv, src_v, Wc, pyc, pxc, nc, log2n - 1, qp_c, False, modes,
                (avail_l, avail_t, avail_tr, avail_tl))

            ry = scatter_plane(ry, W, H, py, px, n, recon_y, valid)
            ru = scatter_plane(ru, Wc, Hc, pyc, pxc, nc, recon_u, valid)
            rv = scatter_plane(rv, Wc, Hc, pyc, pxc, nc, recon_v, valid)

            cu_idx = jnp.where(valid, r * cols + c, ncu)
            modes_out = modes_out.at[cu_idx].set(modes, mode="drop")
            lv_y = lv_y.at[cu_idx].set(levels_y, mode="drop")
            lv_cb = lv_cb.at[cu_idx].set(levels_cb, mode="drop")
            lv_cr = lv_cr.at[cu_idx].set(levels_cr, mode="drop")
            return (ry, ru, rv, modes_out, lv_y, lv_cb, lv_cr), None
          return step

        def encode(y, u, v):
            step = make_step(y.reshape(-1), u.reshape(-1), v.reshape(-1))
            # z0 ties the carry init to the inputs so shard_map's varying
            # manual-axis tracking accepts the scan (value is always 0)
            z0 = y.reshape(-1)[0] * 0
            init = (
                jnp.zeros(W * H, jnp.int32) + z0,
                jnp.zeros(Wc * Hc, jnp.int32) + z0,
                jnp.zeros(Wc * Hc, jnp.int32) + z0,
                jnp.zeros(ncu, jnp.int32) + z0,
                jnp.zeros((ncu, n, n), jnp.int32) + z0,
                jnp.zeros((ncu, nc, nc), jnp.int32) + z0,
                jnp.zeros((ncu, nc, nc), jnp.int32) + z0,
            )
            (ry, ru, rv, modes, lv_y, lv_cb, lv_cr), _ = jax.lax.scan(
                step, init, (rc_all, valid_all))
            return {
                "modes": modes.reshape(rows, cols),
                "levels_y": lv_y.reshape(rows, cols, n, n),
                "levels_cb": lv_cb.reshape(rows, cols, nc, nc),
                "levels_cr": lv_cr.reshape(rows, cols, nc, nc),
                "recon_y": ry.reshape(H, W),
                "recon_u": ru.reshape(Hc, Wc),
                "recon_v": rv.reshape(Hc, Wc),
            }

        return encode
