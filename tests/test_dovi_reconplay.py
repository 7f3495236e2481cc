"""Dolby Vision RPU passthrough + reconplay piping (CLI-level)."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.bitstream.bitio import wrap_nal
from x265_yuuki_asuna_tpu.utils.io import VideoInfo, Y4MWriter
from x265_yuuki_asuna_tpu.utils.param import CSP_I420


def _write_clip(path, n=2, W=64, H=48):
    info = VideoInfo(W, H, 25, 1, CSP_I420, 8)
    w = Y4MWriter(path, info)
    rng = np.random.default_rng(0)
    for i in range(n):
        w.write_frame(rng.integers(0, 256, (H, W)).astype(np.uint8),
                      np.full((H // 2, W // 2), 100, np.uint8),
                      np.full((H // 2, W // 2), 150, np.uint8))
    w.close()


def _run_cli(args):
    env = dict(os.environ)
    r = subprocess.run([sys.executable, "-m", "x265_yuuki_asuna_tpu.cli"]
                       + args + ["--keyint", "1"],
                       capture_output=True, text=True, timeout=600,
                       env=env, cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]


def test_dovi_rpu_injection(tmp_path):
    clip = str(tmp_path / "in.y4m")
    _write_clip(clip)
    rpu_file = tmp_path / "rpu.bin"
    rpu_file.write_bytes(wrap_nal(62, b"\x01rpu-frame-0")
                         + wrap_nal(62, b"\x01rpu-frame-1"))
    out = str(tmp_path / "out.hevc")
    _run_cli([clip, "-o", out, "--qp", "32",
              "--dolby-vision-rpu", str(rpu_file)])
    data = open(out, "rb").read()
    # count NAL 62 units
    n62, i = 0, 0
    while (j := data.find(b"\x00\x00\x01", i)) >= 0:
        if ((data[j + 3] >> 1) & 0x3f) == 62:
            n62 += 1
        i = j + 3
    assert n62 == 2
    assert b"rpu-frame-0" in data and b"rpu-frame-1" in data


def test_reconplay_pipes_y4m(tmp_path):
    clip = str(tmp_path / "in.y4m")
    _write_clip(clip)
    out = str(tmp_path / "out.hevc")
    sink = tmp_path / "recon_pipe.y4m"
    _run_cli([clip, "-o", out, "--qp", "32",
              "--recon-y4m-exec", f"dd of={sink}"])
    data = sink.read_bytes()
    assert data.startswith(b"YUV4MPEG2 W64 H48")
    assert data.count(b"FRAME\n") == 2
