"""Mini-GOP queue pipelining (round 5): the anchor + B frames of a mini-GOP
are dispatched back-to-back and their decision buffers fetched afterwards,
overlapping each fetch with the next frame's device compute (the
reference's frame-threads overlap, frameencoder.cpp:429, threading.rst).

Invariant: under CQP (per-frame QP independent of coded bits) the pipelined
session must produce BYTE-IDENTICAL streams to the sequential path — the
same guarantee the reference documents for frame threads outside ABR/VBV
(threading.rst:176-190)."""
import numpy as np
import pytest

from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession


def _clip(n, w, h, seed=11):
    rng = np.random.default_rng(seed)
    base = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8)
    tex = rng.integers(0, 40, (h, w)).astype(np.uint8)
    out = []
    for i in range(n):
        y = base + np.roll(tex, (i * 2, i * 3), axis=(0, 1)) + i
        out.append((y.astype(np.uint8),
                    ((base[::2, ::2] // 2) + i).astype(np.uint8),
                    ((255 - base[::2, ::2]) // 2).astype(np.uint8)))
    return out


def _encode(frames, force_sequential):
    sess = VideoEncoderSession(
        96, 64, keyint=250, bframes=3, b_pyramid=True, max_depth=2,
        rc_mode="cqp", qp=32, aq_mode=0, cutree=False,
        deblock=True, sao=True, sbh=True, hash_sei=True, hme=True,
        quality_metrics=False, recon_out=False)
    if force_sequential:
        sess._can_pipeline_b = lambda: False
    else:
        assert sess._can_pipeline_b(), \
            "flagship CQP dpb session must take the pipelined path"
    chunks = []
    for f in frames:
        for r in sess.push_frame(*f):
            chunks.append((r.poc, r.frame_type, bytes(r.nals)))
    for r in sess.flush():
        chunks.append((r.poc, r.frame_type, bytes(r.nals)))
    return chunks


def test_pipelined_gop_matches_sequential():
    frames = _clip(9, 96, 64)
    seq = _encode(frames, force_sequential=True)
    pipe = _encode(frames, force_sequential=False)
    assert len(seq) == len(pipe)
    for (p0, t0, b0), (p1, t1, b1) in zip(seq, pipe):
        assert (p0, t0) == (p1, t1)
        assert b0 == b1, f"stream diverged at poc {p0} ({t0})"
