"""BD-rate harness vs the in-tree reference encoder (.ref_build/x265).

Round-4 form (VERDICT r3 item 5): THREE >=480p clips x 48 frames with
distinct temporal character (pan/texture, scene cuts + fade, high local
motion), encoded by both encoders over a QP ladder at matched settings
(CQP, bframes=3, matched keyint; AQ off in both — x265 CQP disables AQ).
Per-clip and pooled Bjontegaard delta-rate written to
tests/golden/BDRATE.json; commit per round.

Usage:
  python tests/tools/bdrate.py                     # CPU backend
  python tests/tools/bdrate.py --device default    # current JAX device (TPU)
  python tests/tools/bdrate.py --quick             # round-3-size fallback
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, REPO)
REF = os.path.join(REPO, ".ref_build", "x265")


# ---------------------------------------------------------------------------
# clips: deterministic synthetics with distinct temporal structure
# ---------------------------------------------------------------------------

def _texture(rng, h, w, scale=8):
    """Band-limited texture: upsampled random grid (content with spatial
    correlation, unlike white noise)."""
    g = rng.integers(0, 255, (h // scale + 2, w // scale + 2)).astype(np.float64)
    ys = np.linspace(0, g.shape[0] - 2, h)
    xs = np.linspace(0, g.shape[1] - 2, w)
    y0 = ys.astype(int)
    x0 = xs.astype(int)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    out = (g[y0][:, x0] * (1 - fy) * (1 - fx)
           + g[y0][:, x0 + 1] * (1 - fy) * fx
           + g[y0 + 1][:, x0] * fy * (1 - fx)
           + g[y0 + 1][:, x0 + 1] * fy * fx)
    return out


def clip_pan(n, w, h, seed=21):
    """Global pan over a detailed scene + a faster-moving foreground bar."""
    rng = np.random.default_rng(seed)
    big = _texture(rng, h + 128, w + 256, 6)
    noise = rng.integers(0, 6, (h, w))
    out = []
    for i in range(n):
        dx, dy = 3 * i, i
        y = big[dy:dy + h, dx:dx + w] + noise
        y = np.clip(y, 0, 255).astype(np.uint8).copy()
        x0 = (40 + 7 * i) % (w - 60)
        y[h // 3:h // 3 + 40, x0:x0 + 60] = \
            np.clip(_texture(rng, 40, 60, 4) * 0.5 + 100, 0, 255)
        u = np.clip(big[dy:dy + h:2, dx:dx + w:2] // 2 + 40, 0, 255)
        v = np.clip(255 - big[dy:dy + h:2, dx:dx + w:2] // 2, 0, 255)
        out.append((y, u.astype(np.uint8), v.astype(np.uint8)))
    return out


def clip_scenes(n, w, h, seed=22):
    """Two scene cuts + a fade: exercises scenecut/IDR placement and
    luminance-change coding."""
    rng = np.random.default_rng(seed)
    s1 = _texture(rng, h, w, 10)
    s2 = _texture(rng, h, w, 5)
    s3 = _texture(rng, h, w, 16)
    out = []
    for i in range(n):
        if i < n // 3:
            y = s1 + 2 * i
        elif i < 2 * n // 3:
            k = i - n // 3
            y = s2 * (0.6 + 0.4 * min(k / 6.0, 1.0))   # fade-in
            y = y + np.roll(s2, (0, 2 * k), (0, 1)) * 0.1
        else:
            k = i - 2 * n // 3
            y = np.roll(s3, (k, -2 * k), (0, 1))
        y = np.clip(y, 0, 255).astype(np.uint8)
        u = (y[::2, ::2] // 2 + 30).astype(np.uint8)
        v = (120 - y[::2, ::2] // 4).astype(np.uint8)
        out.append((y, u, v))
    return out


def clip_motion(n, w, h, seed=23):
    """High local motion: many objects on random walks over a static
    detailed background (merge/skip and MV coding stress)."""
    rng = np.random.default_rng(seed)
    bg = _texture(rng, h, w, 12)
    nobj = 14
    pos = rng.integers(0, [h - 32, w - 32], (nobj, 2)).astype(np.float64)
    vel = rng.normal(0, 2.5, (nobj, 2))
    pats = [_texture(rng, 32, 32, 4) for _ in range(nobj)]
    out = []
    for i in range(n):
        y = bg.copy()
        for o in range(nobj):
            pos[o] += vel[o]
            for d in range(2):
                lim = (h - 32) if d == 0 else (w - 32)
                if pos[o, d] < 0 or pos[o, d] > lim:
                    vel[o, d] = -vel[o, d]
                    pos[o, d] = np.clip(pos[o, d], 0, lim)
            py, px = int(pos[o, 0]), int(pos[o, 1])
            y[py:py + 32, px:px + 32] = pats[o]
        y = np.clip(y, 0, 255).astype(np.uint8)
        u = (y[::2, ::2] // 2).astype(np.uint8)
        v = ((255 - y[::2, ::2]) // 2).astype(np.uint8)
        out.append((y, u, v))
    return out


CLIPS = [("pan640", clip_pan), ("scenes640", clip_scenes),
         ("motion640", clip_motion)]


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.9 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def bd_rate(r1, p1, r2, p2):
    """Bjontegaard delta-rate of curve 2 vs curve 1 (negative = curve 2
    needs fewer bits at equal quality)."""
    lr1, lr2 = np.log(r1), np.log(r2)
    lo = max(min(p1), min(p2))
    hi = min(max(p1), max(p2))
    if hi <= lo:
        return float("nan")
    xs = np.linspace(lo, hi, 100)
    f1 = np.interp(xs, p1, lr1)
    f2 = np.interp(xs, p2, lr2)
    return float(np.exp(np.mean(f2 - f1)) - 1.0) * 100.0


def run_ours(frames, w, h, qp, bframes, rdoq=False, b_intra=False):
    from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
    sess = VideoEncoderSession(w, h, qp=qp, max_depth=2, keyint=250,
                               bframes=bframes, b_pyramid=True, b_adapt=2,
                               deblock=True, sao=True, sbh=True, rdoq=rdoq,
                               hash_sei=False, hme=True, b_intra=b_intra,
                               quality_metrics=False)
    bits = 0
    ps = []
    if bframes:
        res = []
        for f in frames:
            res += sess.push_frame(*f)
        res += sess.flush()
    else:
        res = [sess.encode_frame(*f) for f in frames]
    for r in res:
        bits += r.bits
    if bframes:
        # results arrive in encode order; psnr_y is per-frame luma PSNR vs
        # its own source, so the mean is display-order independent
        return bits, float(np.mean([r.psnr_y for r in res]))
    for (y, u, v), r in zip(frames, res):
        ps.append(psnr(np.asarray(r.recon[0]), y))
    return bits, float(np.mean(ps))


def run_ref(frames, w, h, qp, bframes, workdir, tag):
    yuv = os.path.join(workdir, f"in_{tag}.yuv")
    if not os.path.exists(yuv):
        with open(yuv, "wb") as f:
            for y, u, v in frames:
                f.write(y.tobytes()); f.write(u.tobytes()); f.write(v.tobytes())
    out = os.path.join(workdir, f"ref_{tag}_{qp}.hevc")
    rec = os.path.join(workdir, f"ref_{tag}_{qp}_rec.yuv")
    cmd = [REF, "--input", yuv, "--input-res", f"{w}x{h}", "--fps", "25",
           "--preset", "medium", "--qp", str(qp), "--bframes", str(bframes),
           "--keyint", "250", "--frame-threads", "1", "--pools", "2",
           "--recon", rec, "--log-level", "error", "-o", out]
    subprocess.run(cmd, check=True, capture_output=True, timeout=3600)
    bits = os.path.getsize(out) * 8
    ps = []
    with open(rec, "rb") as f:
        for y, u, v in frames:
            ry = np.frombuffer(f.read(w * h), np.uint8).reshape(h, w)
            f.read(w * h // 2)
            ps.append(psnr(ry, y))
    return bits, float(np.mean(ps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--size", default="640x480")
    ap.add_argument("--bframes", type=int, default=3)
    ap.add_argument("--qps", default="26,30,34,38")
    ap.add_argument("--device", default="cpu",
                    help="cpu | default (current JAX platform, e.g. TPU)")
    ap.add_argument("--rdoq", action="store_true",
                    help="enable context-cost RDOQ in our encoder")
    ap.add_argument("--b-intra", action="store_true", dest="b_intra",
                    help="enable intra candidates in B slices")
    ap.add_argument("--quick", action="store_true",
                    help="round-3-size fallback: 320x192 x20, 1 clip")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))
    qps = [int(q) for q in args.qps.split(",")]

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    clips = CLIPS
    if args.quick:
        w, h = 320, 192
        args.frames = 20
        clips = CLIPS[:1]

    per_clip = []
    with tempfile.TemporaryDirectory() as td:
        for name, maker in clips:
            frames = maker(args.frames, w, h)
            ours_r, ours_p, ref_r, ref_p = [], [], [], []
            for qp in qps:
                t0 = time.time()
                b, p = run_ours(frames, w, h, qp, args.bframes, rdoq=args.rdoq,
                                b_intra=args.b_intra)
                ours_r.append(b); ours_p.append(p)
                print(f"{name} ours qp{qp}: {b} bits, {p:.2f} dB "
                      f"({time.time() - t0:.0f}s)", flush=True)
                if os.path.exists(REF):
                    b, p = run_ref(frames, w, h, qp, args.bframes, td, name)
                    ref_r.append(b); ref_p.append(p)
                    print(f"{name} ref  qp{qp}: {b} bits, {p:.2f} dB",
                          flush=True)
            entry = {"clip": f"{name} {w}x{h} x{args.frames}",
                     "ours": {"bits": ours_r, "psnr_y": ours_p},
                     "reference": {"bits": ref_r, "psnr_y": ref_p}}
            if ref_r:
                o = np.argsort(ours_p)
                rf = np.argsort(ref_p)
                entry["bd_rate_vs_ref_pct"] = round(bd_rate(
                    np.asarray(ref_r)[rf], np.asarray(ref_p)[rf],
                    np.asarray(ours_r)[o], np.asarray(ours_p)[o]), 2)
                print(f"{name}: BD-rate {entry['bd_rate_vs_ref_pct']:+.2f}%")
            per_clip.append(entry)

    result = {
        "config": f"qt2 bframes={args.bframes} b-adapt2 deblock sao sbh hme "
                  f"CQP vs reference --preset medium (C-only build), "
                  f"matched qps {qps}",
        "clips": per_clip,
    }
    rates = [e.get("bd_rate_vs_ref_pct") for e in per_clip
             if e.get("bd_rate_vs_ref_pct") is not None]
    if rates:
        result["bd_rate_vs_ref_pct"] = round(float(np.mean(rates)), 2)
        print(f"POOLED BD-rate vs reference: "
              f"{result['bd_rate_vs_ref_pct']:+.2f}%")
    out = os.path.join(REPO, "tests", "golden", "BDRATE.json")
    json.dump(result, open(out, "w"), indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
