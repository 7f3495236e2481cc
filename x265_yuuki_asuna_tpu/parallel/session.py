"""Pipelined multi-device encode session: the frame pipeline as a PRODUCT
path (CLI --devices N), not a demo.

Reference analog: frame parallelism — up to 16 FrameEncoder threads where
frame k blocks on frame k-1's recon rows (encoder.cpp:1988, frame.h:105).
Here the chain runs across a device mesh: device k encodes frame k of each
P-chain against the recon received from device k-1 over ICI
(parallel/pipeline.frame_pipeline_stream_fn), and the host serializes the
decided syntax per frame exactly like the single-device session.

GOP shape: one IDR anchor, then P-chains of length N (the mesh size), each
chain re-anchored at the IDR recon — re-anchoring removes the wrap-around
pipeline hazard (device 0 would otherwise stall T+N-1 steps for device
N-1's tail) at a small compression cost, exactly the trade the reference
makes when it caps the frame-thread ref-lag. Chain frame k > 0 references
its left-neighbor frame; its RPS also carries the IDR (used_by_curr=0) so
decoders keep it resident for the next chain.

Rate control: per-chain QP — the host rate control observes each chain's
actual bits and picks the next chain's QP (a runtime scalar: no recompile).
Byte-exactness vs the sequential single-device path holds at fixed QP
(tests/test_pipeline_session.py).
"""

from __future__ import annotations

from typing import List

import numpy as np

import jax
from jax.sharding import Mesh

from ..models.encoder_top import VideoEncoderSession, FrameResult
from ..utils import geometry as G
from .pipeline import frame_pipeline_stream_fn


class PipelinedEncoder:
    def __init__(self, width: int, height: int, qp: int = 32,
                 cu_size: int = 16, n_devices: int = None,
                 fps=(25, 1), hash_sei: bool = False,
                 rc_mode: str = "cqp", bitrate_kbps: int = 0):
        devs = jax.devices()
        n = len(devs) if n_devices is None else min(n_devices, len(devs))
        assert n >= 2, "--devices needs >= 2 JAX devices"
        self.mesh = Mesh(np.array(devs[:n]), ("frame",))
        self.n = n
        # serialization/geometry/headers come from a plain session with the
        # pipeline-compatible feature set (no loop filters in the handoff)
        self.sess = VideoEncoderSession(
            width, height, qp=qp, cu_size=cu_size, fps=fps, keyint=10 ** 9,
            hash_sei=hash_sei, deblock=False, sao=False,
            rc_mode="cqp", qp_min=qp, qp_max=qp)
        self.qp = qp
        self.rc_mode = rc_mode
        if rc_mode == "abr":
            from ..models.ratecontrol import RateControl, RCConfig
            self.rc = RateControl(RCConfig(
                mode="abr", qp=qp, bitrate_kbps=bitrate_kbps,
                fps=fps[0] / max(fps[1], 1), width=width, height=height))
        self._fns = {}

    def headers(self) -> bytes:
        return self.sess.headers()

    def _fn(self, n_batches: int, qp: int):
        key = (n_batches, qp)
        if key not in self._fns:
            self._fns[key] = frame_pipeline_stream_fn(
                self.sess.inter_encoder, self.mesh, n_batches, qp=qp)
        return self._fns[key]

    def encode_clip(self, frames) -> List[FrameResult]:
        """frames: display-order [(y, u, v)] arrays. Frame 0 encodes as the
        IDR; the rest stream through the pipeline in chains of N."""
        sess = self.sess
        N = self.n
        H, W = sess.coded_h, sess.coded_w
        results: List[FrameResult] = []

        y0, u0, v0 = frames[0]
        idr = sess._encode_anchor(y0, u0, v0, idr=True)
        results.append(idr)
        idr_rec = sess.anchor[0]

        rest = frames[1:]
        if not rest:
            return results
        nchains = -(-len(rest) // N)
        qp = self.qp
        if self.rc_mode == "abr":
            self.rc.frame_done(idr.qp, idr.bits, slice_type="I")
            qp = self.rc.frame_qp(False)

        pad = nchains * N - len(rest)
        padded = rest + [rest[-1]] * pad
        yp = np.stack([G.pad_plane(f[0], H, W) for f in padded])
        up = np.stack([G.pad_plane(f[1], H // 2, W // 2) for f in padded])
        vp = np.stack([G.pad_plane(f[2], H // 2, W // 2) for f in padded])
        # [T, N, H, W] — chain t frame k at [t, k]
        yp = yp.reshape(nchains, N, H, W)
        up = up.reshape(nchains, N, H // 2, W // 2)
        vp = vp.reshape(nchains, N, H // 2, W // 2)

        dt = np.uint16 if sess.bit_depth > 8 else np.uint8
        fn = self._fn(nchains, qp)
        packed = np.asarray(fn(yp.astype(dt), up.astype(dt), vp.astype(dt),
                               idr_rec[0].astype(dt), idr_rec[1].astype(dt),
                               idr_rec[2].astype(dt)))

        enc = sess.inter_encoder
        idx = 0
        for t in range(nchains):
            for k in range(N):
                if idx >= len(rest):
                    break
                idx += 1
                if packed[t, k][-1]:
                    raise RuntimeError(
                        "pipeline frame levels overflowed int8 "
                        "packing (very low QP?); use the sequential "
                        "path for this configuration")
                out = enc._unpack(packed[t, k])
                poc = t * N + k + 1
                if k == 0:
                    rps = ([(poc, 1)], [])
                else:
                    # nearest ref used; IDR kept resident (used_by_curr=0)
                    rps = ([(1, 1), (poc, 0)], [])
                nals = sess._assemble_p_slice(out, qp, poc=poc,
                                              ref_delta=1, rps=rps)
                if sess.hash_sei:
                    nals += sess.intra_sess._hash_sei(out)
                results.append(sess._result(out, nals, qp, poc,
                                            src_y=rest[idx - 1][0],
                                            frame_type="P"))
            if self.rc_mode == "abr":
                for fr in results[-N:]:
                    self.rc.frame_done(fr.qp, fr.bits, slice_type="P")
                qp = self.rc.frame_qp(False)
        return results

    def encode_clip_sequential(self, frames) -> List[FrameResult]:
        """Host-loop comparator: the SAME chain structure encoded one frame
        at a time on one device — byte-identical to encode_clip at fixed QP
        (the pipeline collective moves recon, it must not change it)."""
        sess = self.sess
        N = self.n
        results: List[FrameResult] = []
        y0, u0, v0 = frames[0]
        idr = sess._encode_anchor(y0, u0, v0, idr=True)
        results.append(idr)
        idr_rec = sess.anchor[0]
        enc = sess.inter_encoder
        qp = self.qp
        rest = frames[1:]
        H, W = sess.coded_h, sess.coded_w
        ref = idr_rec
        for i, (y, u, v) in enumerate(rest):
            t, k = divmod(i, N)
            if k == 0:
                ref = idr_rec
            yp = G.pad_plane(y, H, W)
            up = G.pad_plane(u, H // 2, W // 2)
            vp = G.pad_plane(v, H // 2, W // 2)
            out = enc.encode_frame(yp, up, vp, ref[0], ref[1], ref[2], qp=qp)
            poc = i + 1
            rps = ([(poc, 1)], []) if k == 0 else ([(1, 1), (poc, 0)], [])
            nals = sess._assemble_p_slice(out, qp, poc=poc, ref_delta=1,
                                          rps=rps)
            results.append(sess._result(out, nals, qp, poc, src_y=y,
                                        frame_type="P"))
            ref = (out["recon_y"], out["recon_u"], out["recon_v"])
        return results
