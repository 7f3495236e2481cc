"""Pipelined multi-device session (parallel/session.PipelinedEncoder):
the frame pipeline as a product path. Byte-exactness: the ICI recon
handoff must not change the streams vs the host-loop chain; decodability:
a third-party decoder accepts the chained-RPS GOP structure."""
import numpy as np
import pytest

import jax

from x265_yuuki_asuna_tpu.parallel.session import PipelinedEncoder


def _clip(w, h, n):
    rng = np.random.default_rng(9)
    base = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8)
    tex = rng.integers(0, 40, (h, w)).astype(np.uint8)
    out = []
    for i in range(n):
        y = (base + np.roll(tex, (i, 2 * i), (0, 1)) + i).astype(np.uint8)
        out.append((y, (base[::2, ::2] // 2 + i).astype(np.uint8),
                    ((255 - base[::2, ::2]) // 2).astype(np.uint8)))
    return out


def test_pipeline_session_bit_exact_vs_sequential():
    assert len(jax.devices()) >= 8
    frames = _clip(64, 48, 10)          # IDR + 9 P = 2 chains + remainder
    enc = PipelinedEncoder(64, 48, qp=32, n_devices=4)
    res_pipe = enc.encode_clip(frames)
    enc2 = PipelinedEncoder(64, 48, qp=32, n_devices=4)
    res_seq = enc2.encode_clip_sequential(frames)
    assert len(res_pipe) == len(res_seq) == len(frames)
    for i, (a, b) in enumerate(zip(res_pipe, res_seq)):
        assert a.nals == b.nals, f"frame {i} differs"


def test_pipeline_session_stream_decodes():
    cv2 = pytest.importorskip("cv2")
    from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc
    frames = _clip(64, 48, 9)
    enc = PipelinedEncoder(64, 48, qp=30, n_devices=4)
    res = enc.encode_clip(frames)
    stream = enc.headers() + b"".join(r.nals for r in res)
    dec = decode_hevc(stream, enc.sess.coded_w, enc.sess.coded_h)
    assert len(dec) == len(frames)
    for i, (d, r) in enumerate(zip(dec, res)):
        for p in range(3):
            assert np.array_equal(
                d[p][:r.recon[p].shape[0], :r.recon[p].shape[1]]
                .astype(np.uint8), r.recon[p]), f"frame {i} plane {p}"
