"""BD-rate comparison vs the in-tree reference encoder (.ref_build/x265).

Encodes the same deterministic clip with both encoders across a QP ladder
at matched feature sets, computes Bjøntegaard-delta rate (piecewise-cubic
log-rate interpolation over PSNR), and writes tests/golden/BDRATE.json.
Run per round; commit the result (VERDICT r2 item 9).

Usage: python tests/tools/bdrate.py [--frames 20] [--size 320x192]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, REPO)
REF = os.path.join(REPO, ".ref_build", "x265")


def synth(n, w, h, seed=11):
    rng = np.random.default_rng(seed)
    base = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8)
    tex = rng.integers(0, 40, (h, w)).astype(np.uint8)
    out = []
    for i in range(n):
        y = (base + np.roll(tex, (i, 2 * i), (0, 1)) + i).astype(np.uint8)
        out.append((y, (base[::2, ::2] // 2 + i).astype(np.uint8),
                    ((255 - base[::2, ::2]) // 2).astype(np.uint8)))
    return out


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.9 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def bd_rate(r1, p1, r2, p2):
    """Bjøntegaard delta-rate of curve 2 vs curve 1 (negative = curve 2
    needs fewer bits at equal quality). Piecewise-cubic interpolation of
    log-rate over the overlapping PSNR interval."""
    lr1, lr2 = np.log(r1), np.log(r2)
    lo = max(min(p1), min(p2))
    hi = min(max(p1), max(p2))
    if hi <= lo:
        return float("nan")
    xs = np.linspace(lo, hi, 100)
    f1 = np.interp(xs, p1, lr1)
    f2 = np.interp(xs, p2, lr2)
    return float(np.exp(np.mean(f2 - f1)) - 1.0) * 100.0


def run_ours(frames, w, h, qp, bframes):
    from x265_yuuki_asuna_tpu.models.encoder_top import VideoEncoderSession
    sess = VideoEncoderSession(w, h, qp=qp, max_depth=2, keyint=250,
                               bframes=bframes, b_pyramid=True, b_adapt=0,
                               deblock=True, sao=True, sbh=True,
                               hash_sei=False, hme=True)
    bits = 0
    ps = []
    if bframes:
        res = []
        for f in frames:
            res += sess.push_frame(*f)
        res += sess.flush()
    else:
        res = [sess.encode_frame(*f) for f in frames]
    for i, r in enumerate(res):
        bits += r.bits
    # PSNR vs source in display order
    disp = sorted(res, key=lambda r: r.poc)
    for (y, u, v), r in zip(frames, res if not bframes else disp):
        ps.append(psnr(np.asarray(r.recon[0]), y))
    return bits, float(np.mean(ps))


def run_ref(frames, w, h, qp, bframes, workdir):
    yuv = os.path.join(workdir, "in.yuv")
    with open(yuv, "wb") as f:
        for y, u, v in frames:
            f.write(y.tobytes()); f.write(u.tobytes()); f.write(v.tobytes())
    out = os.path.join(workdir, f"ref_{qp}.hevc")
    rec = os.path.join(workdir, f"ref_{qp}_rec.yuv")
    cmd = [REF, "--input", yuv, "--input-res", f"{w}x{h}", "--fps", "25",
           "--preset", "medium", "--qp", str(qp), "--bframes", str(bframes),
           "--keyint", "250", "--frame-threads", "1", "--pools", "1",
           "--recon", rec, "--log-level", "error", "-o", out]
    subprocess.run(cmd, check=True, capture_output=True, timeout=1800)
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
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--size", default="320x192")
    ap.add_argument("--bframes", type=int, default=3)
    ap.add_argument("--qps", default="26,30,34,38")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))
    qps = [int(q) for q in args.qps.split(",")]
    frames = synth(args.frames, w, h)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    ours_r, ours_p, ref_r, ref_p = [], [], [], []
    with tempfile.TemporaryDirectory() as td:
        for qp in qps:
            b, p = run_ours(frames, w, h, qp, args.bframes)
            ours_r.append(b); ours_p.append(p)
            print(f"ours qp{qp}: {b} bits, {p:.2f} dB", flush=True)
            if os.path.exists(REF):
                b, p = run_ref(frames, w, h, qp, args.bframes, td)
                ref_r.append(b); ref_p.append(p)
                print(f"ref  qp{qp}: {b} bits, {p:.2f} dB", flush=True)
    result = {"clip": f"{args.size} x{args.frames} synth",
              "config": f"qt2 bframes={args.bframes} deblock sao sbh "
                        f"vs reference --preset medium (C-only build)",
              "ours": {"bits": ours_r, "psnr_y": ours_p},
              "reference": {"bits": ref_r, "psnr_y": ref_p}}
    if ref_r:
        # sort by rate ascending for interpolation
        o = np.argsort(ours_p)
        rf = np.argsort(ref_p)
        result["bd_rate_vs_ref_pct"] = round(bd_rate(
            np.asarray(ref_r)[rf], np.asarray(ref_p)[rf],
            np.asarray(ours_r)[o], np.asarray(ours_p)[o]), 2)
        print(f"BD-rate vs reference: {result['bd_rate_vs_ref_pct']:+.2f}% "
              f"(negative = ours cheaper at equal PSNR)")
    out = os.path.join(REPO, "tests", "golden", "BDRATE.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    json.dump(result, open(out, "w"), indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
