"""720p device-tier test (VERDICT r3 item 10): one marked-slow test that
pushes a real 720p clip through the FLAGSHIP path (qt2 + B pyramid + AQ +
cuTree + deblock + SAO, device-resident DPB) on whatever backend is active,
with a wall-clock budget and a per-stage profile record.

Catches the class of regression that is invisible at CIF sizes: compile-time
blowups, transfer regressions, accidental host fallbacks at production
resolution.

Gated behind ASUNA_SLOW=1 (CPU CI boxes take minutes per frame at 720p);
the TPU bench sessions run it with the budget enforced. A baseline
ms/frame is recorded in tests/golden/PERF720.json the first time; later
runs fail if steady-state ms/frame regresses 2x on the same backend.
"""

import json
import os
import time

import numpy as np
import pytest

SLOW = os.environ.get("ASUNA_SLOW") == "1"
BASE = os.path.join(os.path.dirname(__file__), "golden", "PERF720.json")
W, H, FRAMES = 1280, 720, 9


@pytest.mark.skipif(not SLOW, reason="set ASUNA_SLOW=1 to run the 720p tier")
def test_720p_flagship_budget():
    import jax
    backend = jax.devices()[0].platform
    from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
    from x265_yuuki_asuna_tpu.utils.profiling import PROF

    rng = np.random.default_rng(7)
    base = (np.add.outer(np.arange(H), np.arange(W)) % 256).astype(np.uint8)
    tex = rng.integers(0, 32, (H, W)).astype(np.uint8)
    frames = []
    for i in range(FRAMES):
        y = (base + np.roll(tex, (2 * i, 3 * i), (0, 1)) + i).astype(np.uint8)
        frames.append((y, (base[::2, ::2] // 2 + i).astype(np.uint8),
                       ((255 - base[::2, ::2]) // 2).astype(np.uint8)))

    sess = VideoEncoderSession(W, H, keyint=250, bframes=3, b_pyramid=True,
                               max_depth=2, rc_mode="crf", crf=28.0,
                               aq_mode=2, cutree=True, deblock=True,
                               sao=True, sbh=True, hash_sei=False, hme=True,
                               quality_metrics=False, recon_out=False)
    assert sess.dpb_device, "flagship config must take the device-DPB path"
    # warm (compiles)
    bits = 0
    for f in frames[:5]:
        for r in sess.push_frame(*f):
            bits += r.bits
    # timed steady state
    PROF.reset()
    PROF.enabled = True
    t0 = time.time()
    n = 0
    for f in frames[5:]:
        for r in sess.push_frame(*f):
            bits += r.bits
            n += 1
    for r in sess.flush():
        bits += r.bits
        n += 1
    dt = time.time() - t0
    PROF.enabled = False
    ms_per_frame = dt * 1000.0 / max(n, 1)
    stages = {k: round(v["total_s"] * 1000.0 / max(n, 1), 1)
              for k, v in PROF.report().items()}
    print(f"720p [{backend}]: {ms_per_frame:.0f} ms/frame, stages {stages}")
    assert bits > 0

    rec = {}
    if os.path.exists(BASE):
        rec = json.load(open(BASE))
    key = f"{backend}_ms_per_frame"
    if key in rec:
        assert ms_per_frame < 2.0 * rec[key], \
            f"720p regression: {ms_per_frame:.0f} ms/frame vs baseline " \
            f"{rec[key]:.0f} (>{2.0}x)"
        rec[key] = min(rec[key], ms_per_frame)
    else:
        rec[key] = ms_per_frame
    rec[f"{backend}_stages"] = stages
    json.dump(rec, open(BASE, "w"), indent=1)
