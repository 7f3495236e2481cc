"""CLI preset wiring: --preset configures the session like the reference's
x265_param_default_preset (param.cpp:382); explicit flags override; streams
stay independently decodable."""

import os
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu import cli
from x265_yuuki_asuna_tpu.utils import io as IO
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _write_clip(path, n=4, w=96, h=64):
    rng = np.random.default_rng(0)
    info = IO.VideoInfo(width=w, height=h, fps_num=25, fps_denom=1,
                        csp=IO.CSP_I420, bit_depth=8)
    wr = IO.Y4MWriter(path, info)
    base = rng.integers(0, 256, (h + 32, w + 32)).astype(np.uint8)
    for i in range(n):
        y = base[i:i + h, 2 * i:2 * i + w]
        u = np.full((h // 2, w // 2), 90 + i, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        wr.write_frame(y, u, v)
    wr.f.close()


@pytest.mark.parametrize("extra", [
    ["--preset", "ultrafast"],
    ["--preset", "medium", "--tune", "zerolatency"],
    ["--qp", "30", "--keyint", "1"],
])
def test_cli_preset_roundtrip(tmp_path, extra):
    src = str(tmp_path / "in.y4m")
    dst = str(tmp_path / "out.hevc")
    _write_clip(src)
    rc = cli.main([src, "-o", dst] + extra)
    assert rc in (0, None)
    data = open(dst, "rb").read()
    assert len(data) > 0
    dec = decode_hevc(data, 96, 64)
    assert len(dec) == 4


def test_cli_qpfile_and_chunk(tmp_path):
    src = str(tmp_path / "in.y4m")
    dst = str(tmp_path / "out.hevc")
    csv = str(tmp_path / "log.csv")
    qpf = str(tmp_path / "qp.txt")
    _write_clip(src, n=8)
    open(qpf, "w").write("3 I 25\n5 P 40\n")
    rc = cli.main([src, "-o", dst, "--qp", "32", "--keyint", "100",
                   "--bframes", "0", "--qpfile", qpf, "--csv", csv,
                   "--chunk-start", "1", "--chunk-end", "6", "--no-hash"])
    assert rc in (0, None)
    dec = decode_hevc(open(dst, "rb").read(), 96, 64)
    assert len(dec) == 6          # source frames 1..6
    rows = [l.split(",") for l in open(csv).read().splitlines()[1:-1]]
    types = [r[1].strip() for r in rows]
    qps = [int(r[3]) for r in rows]
    assert types[2] == "I" and qps[2] == 25     # qpfile forced src frame 3
    assert qps[4] == 40                          # src frame 5 QP override
