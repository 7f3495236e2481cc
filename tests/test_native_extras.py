"""Native C++ entropy path universality: configs that previously fell back to
the Python CABAC (SAO, per-CU QP maps, SBH, lossless, 4:4:4 — VERDICT r1
weak #2) must now serialize natively, byte-identical to the Python reference
writers (reference behavior: encodeSlice, frameencoder.cpp:1241)."""

import numpy as np
import pytest

from x265_yuuki_asuna_tpu.bitstream import native
from x265_yuuki_asuna_tpu.models.encoder_top import (IntraEncoderSession,
                                                     VideoEncoderSession)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def _frames(n, w, h, seed=3, csp="i420"):
    rng = np.random.default_rng(seed)
    base = (np.add.outer(np.arange(h), np.arange(w)) * 3 % 256).astype(np.uint8)
    s = 1 if csp == "i444" else 2
    out = []
    for i in range(n):
        y = (base + rng.integers(0, 24, (h, w)) + 2 * i).astype(np.uint8)
        u = ((base[::s, ::s] // 2) + i).astype(np.uint8)
        v = ((220 - base[::s, ::s]) // 2).astype(np.uint8)
        out.append((y, u, v))
    return out


def _run_intra(monkeypatch, disable_native, frames, **kw):
    sess = IntraEncoderSession(frames[0][0].shape[1], frames[0][0].shape[0],
                               qp=30, hash_sei=False, info_sei=False, **kw)
    if disable_native:
        monkeypatch.setattr(native, "load", lambda: None)
    blobs = [sess.encode_frame(*f).nals for f in frames]
    monkeypatch.undo()
    return blobs


@pytest.mark.parametrize("kw", [
    dict(cu_size=16, sao=True, deblock=True, aq_mode=2),
    dict(cu_size=16, lossless=True),
    dict(cu_size=16, csp="i444"),
    dict(cu_size=16, sbh=True),
    dict(cu_size=16, sao=True, aq_mode=1, sbh=True),
], ids=["sao+aq", "lossless", "i444", "sbh", "sao+aq+sbh"])
def test_intra_uniform_native_matches_python(monkeypatch, kw):
    h, w = (32, 48)
    frames = _frames(2, w, h, csp=kw.get("csp", "i420"))
    nat = _run_intra(monkeypatch, False, frames, **kw)
    ref = _run_intra(monkeypatch, True, frames, **kw)
    assert nat == ref


def test_intra_qt_native_matches_python(monkeypatch):
    frames = _frames(2, 64, 32)
    nat = _run_intra(monkeypatch, False, frames, cu_size=32, max_depth=2,
                     sao=True, aq_mode=2, deblock=True)
    ref = _run_intra(monkeypatch, True, frames, cu_size=32, max_depth=2,
                     sao=True, aq_mode=2, deblock=True)
    assert nat == ref


def _run_video(monkeypatch, disable_native, frames, **kw):
    sess = VideoEncoderSession(frames[0][0].shape[1], frames[0][0].shape[0],
                               qp=32, keyint=16, hash_sei=False, **kw)
    if disable_native:
        monkeypatch.setattr(native, "load", lambda: None)
    blobs = []
    if kw.get("bframes"):
        for f in frames:
            blobs += [r.nals for r in sess.push_frame(*f)]
        blobs += [r.nals for r in sess.flush()]
    else:
        blobs = [sess.encode_frame(*f).nals for f in frames]
    monkeypatch.undo()
    return blobs


@pytest.mark.parametrize("kw", [
    dict(sao=True, aq_mode=1, deblock=True),
    dict(sbh=True, sao=True),
    dict(aq_mode=2, cutree=True),
], ids=["p-sao+aq", "p-sbh+sao", "p-aq+cutree"])
def test_p_native_matches_python(monkeypatch, kw):
    frames = _frames(4, 48, 32, seed=9)
    nat = _run_video(monkeypatch, False, frames, cu_size=16, **kw)
    ref = _run_video(monkeypatch, True, frames, cu_size=16, **kw)
    assert nat == ref


@pytest.mark.parametrize("kw", [
    dict(bframes=2, sao=True, deblock=True),
    dict(bframes=2, sbh=True, aq_mode=1),
], ids=["b-sao", "b-sbh+aq"])
def test_b_native_matches_python(monkeypatch, kw):
    frames = _frames(6, 48, 32, seed=11)
    nat = _run_video(monkeypatch, False, frames, cu_size=16, **kw)
    ref = _run_video(monkeypatch, True, frames, cu_size=16, **kw)
    assert nat == ref


def test_qt_p_native_with_sao(monkeypatch):
    frames = _frames(4, 64, 32, seed=13)
    nat = _run_video(monkeypatch, False, frames, max_depth=2, sao=True,
                     deblock=True)
    ref = _run_video(monkeypatch, True, frames, max_depth=2, sao=True,
                     deblock=True)
    assert nat == ref
