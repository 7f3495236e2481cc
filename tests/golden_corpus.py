"""Golden-bitstream corpus definition (reference: test/regression-tests.txt
— per-commit bit-exact output match against blessed encodes, with an
explicit re-bless protocol when outputs legitimately change).

Each entry: (name, builder) where builder(frames) -> full Annex-B stream
bytes. The clip is deterministic; the encoder has no threading or RNG, so
streams are reproducible bit-for-bit across runs and machines (CPU path).

Bless protocol: python tests/tools/bless_golden.py   (re-encodes every
config, rewrites tests/golden/manifest.json). Re-bless ONLY after
verifying the new streams decode bit-exactly (the bless tool decodes each
stream with cv2/FFmpeg and refuses to bless undecodable output).
"""

from __future__ import annotations

import numpy as np


def clip(w=64, h=48, n=6, seed=3):
    rng = np.random.default_rng(seed)
    base = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8)
    tex = rng.integers(0, 48, (h, w)).astype(np.uint8)
    frames = []
    for i in range(n):
        y = (base + np.roll(tex, (2 * i, 3 * i), (0, 1)) + 2 * i)
        frames.append((y.astype(np.uint8),
                       ((base[::2, ::2] // 2) + i).astype(np.uint8),
                       ((255 - base[::2, ::2]) // 2).astype(np.uint8)))
    return frames


def _intra(frames, **kw):
    from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
    sess = IntraEncoderSession(64, 48, **kw)
    out = sess.headers()
    for f in frames:
        out += sess.encode_frame(*f).nals
    return out


def _video(frames, use_push=False, use_la=False, **kw):
    from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
    sess = VideoEncoderSession(64, 48, **kw)
    out = sess.headers()
    if use_push:
        for f in frames:
            for r in sess.push_frame(*f):
                out += r.nals
        for r in sess.flush():
            out += r.nals
    elif use_la:
        for f in frames:
            for r in sess.push_la(*f):
                out += r.nals
        for r in sess.flush_la():
            out += r.nals
    else:
        for f in frames:
            out += sess.encode_frame(*f).nals
    return out


CONFIGS = [
    # --- intra matrix ----------------------------------------------------
    ("intra_cqp_ctu16", lambda f: _intra(f, qp=32, hash_sei=False)),
    ("intra_qp26_deblock", lambda f: _intra(f, qp=26, deblock=True,
                                            hash_sei=False)),
    ("intra_sao", lambda f: _intra(f, qp=32, sao=True, hash_sei=False)),
    ("intra_lossless", lambda f: _intra(f, qp=4, lossless=True,
                                        hash_sei=False)),
    ("intra_aq2", lambda f: _intra(f, qp=32, aq_mode=2, hash_sei=False)),
    ("intra_rdoq", lambda f: _intra(f, qp=32, rdoq=True, hash_sei=False)),
    ("intra_sbh", lambda f: _intra(f, qp=32, sbh=True, hash_sei=False)),
    ("intra_qt1", lambda f: _intra(f, qp=30, max_depth=1, hash_sei=False)),
    ("intra_qt2_psy", lambda f: _intra(f, qp=30, max_depth=2, psy_rd=1.0,
                                       hash_sei=False)),
    ("intra_wpp", lambda f: _intra(f, qp=32, wpp=True, hash_sei=False)),
    ("intra_slices2", lambda f: _intra(f, qp=32, slices=3,
                                       hash_sei=False)),
    ("intra_main10", lambda f: _intra(
        [(y.astype(np.uint16) * 4, u.astype(np.uint16) * 4,
          v.astype(np.uint16) * 4) for y, u, v in f],
        qp=32, bit_depth=10, hash_sei=False)),
    ("intra_scaling_default", lambda f: _intra(f, qp=32,
                                               scaling_lists="default",
                                               hash_sei=False)),
    # --- inter matrix ----------------------------------------------------
    ("ippp_cqp", lambda f: _video(f, qp=32, cu_size=16, keyint=100,
                                  hash_sei=False)),
    ("ippp_deblock_sao", lambda f: _video(f, qp=32, cu_size=16, keyint=100,
                                          deblock=True, sao=True,
                                          hash_sei=False)),
    ("ippp_weightp", lambda f: _video(
        [(np.clip(y.astype(np.int32) - 6 * i, 0, 255).astype(np.uint8),
          u, v) for i, (y, u, v) in enumerate(f)],
        qp=32, cu_size=16, keyint=100, weightp=True, hash_sei=False)),
    ("ippp_aq_cutree", lambda f: _video(f, qp=32, cu_size=16, keyint=100,
                                        aq_mode=2, cutree=True,
                                        hash_sei=False)),
    ("bframes3_pyramid", lambda f: _video(f, qp=32, cu_size=16, keyint=100,
                                          bframes=3, b_pyramid=True,
                                          b_adapt=0, use_push=True,
                                          hash_sei=False)),
    ("bframes_badapt", lambda f: _video(f, qp=32, cu_size=16, keyint=100,
                                        bframes=2, b_adapt=2, use_push=True,
                                        hash_sei=False)),
    ("open_gop", lambda f: _video(f, qp=32, cu_size=16, keyint=4,
                                  bframes=2, b_adapt=0, open_gop=True,
                                  use_push=True, hash_sei=False)),
    ("qt2_ippp", lambda f: _video(f, qp=30, max_depth=2, keyint=100,
                                  hash_sei=False)),
    ("qt2_bframes_flagship", lambda f: _video(
        f, qp=30, max_depth=2, keyint=100, bframes=3,
        b_pyramid=True, b_adapt=0, aq_mode=2, cutree=True, deblock=True,
        sao=True, sbh=True, use_push=True, hash_sei=False)),
    ("ippp_multiref_tmvp", lambda f: _video(f, qp=32, cu_size=16,
                                            keyint=100, n_refs=2,
                                            tmvp=True, hash_sei=False)),
    ("ippp_rc_lookahead", lambda f: _video(f, qp=32, cu_size=16,
                                           keyint=100, cutree=True,
                                           rc_lookahead=3, use_la=True,
                                           hash_sei=False)),
]
