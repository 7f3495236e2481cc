"""Config-system, geometry, and I/O tests (SURVEY.md §7 stage 1 acceptance)."""

import os
import tempfile

import numpy as np
import pytest

from x265_yuuki_asuna_tpu.utils import param as P
from x265_yuuki_asuna_tpu.utils import geometry as G
from x265_yuuki_asuna_tpu.utils import io as IO


def test_all_presets_valid():
    for preset in P.PRESET_NAMES:
        for tune in [None] + P.TUNE_NAMES:
            p = P.param_default_preset(preset, tune)
            p.source_width, p.source_height = 1920, 1080
            assert P.check_params(p) == [], (preset, tune)


def test_preset_speed_ordering():
    uf = P.param_default_preset("ultrafast")
    md = P.param_default_preset("medium")
    vs = P.param_default_preset("veryslow")
    assert uf.rd_level <= md.rd_level <= vs.rd_level
    assert uf.max_num_references <= md.max_num_references <= vs.max_num_references
    assert uf.lookahead_depth <= md.lookahead_depth <= vs.lookahead_depth


def test_parse_core_options():
    p = P.param_default()
    P.param_parse(p, "input-res", "1920x1080")
    P.param_parse(p, "fps", "30000/1001")
    P.param_parse(p, "crf", "23.5")
    P.param_parse(p, "ctu", "32")
    P.param_parse(p, "me", "star")
    P.param_parse(p, "deblock", "-2:1")
    P.param_parse(p, "no-sao")
    P.param_parse(p, "hash", "md5")
    assert p.source_width == 1920 and p.fps_num == 30000
    assert p.rc.rf_constant == 23.5 and p.rc.rate_control_mode == P.RC_CRF
    assert p.max_cu_size == 32 and p.search_method == P.ME_STAR
    assert p.deblocking_filter_tc_offset == -2
    assert p.deblocking_filter_beta_offset == 1
    assert p.b_enable_sao == 0 and p.decoded_picture_hash_sei == 1


def test_parse_qp_switches_to_cqp():
    p = P.param_default()
    P.param_parse(p, "qp", "30")
    assert p.rc.rate_control_mode == P.RC_CQP
    assert p.rc.qp == 30 and p.rc.aq_mode == P.AQ_NONE


def test_unknown_option_raises():
    p = P.param_default()
    with pytest.raises(P.ParamError):
        P.param_parse(p, "definitely-not-an-option", "1")


def test_option_count_covers_reference_surface():
    # the reference parser has 274 OPT() names; ours must cover the core set
    assert len(P.known_options()) >= 150


@pytest.mark.parametrize("w,h", [(352, 288), (640, 480), (1920, 1080), (3840, 2160)])
def test_geometry_matches_reference_rules(w, h):
    for ctu in (16, 32, 64):
        g = G.make_geometry(w, h, ctu)
        assert g.width_in_ctus == -(-w // ctu)
        assert g.height_in_ctus == -(-h // ctu)
        assert g.padded_width % ctu == 0
        assert g.padded_width - w < ctu


def test_zscan():
    z2r = G.zscan_to_raster(2)  # 4x4 partitions
    # first quad must be the top-left 2x2 block in z order
    assert list(z2r[:4]) == [0, 1, 4, 5]
    r2z = G.raster_to_zscan(2)
    assert all(r2z[z2r[i]] == i for i in range(16))


def test_wavefront_dependencies():
    for rows, cols in [(3, 5), (5, 3), (1, 4), (4, 1)]:
        seen = set()
        for blocks in G.wavefront_diagonals(rows, cols):
            for (r, c) in blocks:
                # all intra deps must already be complete
                for dep in [(r, c - 1), (r - 1, c), (r - 1, c - 1), (r - 1, c + 1)]:
                    if 0 <= dep[0] < rows and 0 <= dep[1] < cols:
                        assert dep in seen, f"{(r, c)} before dep {dep}"
            seen.update(blocks)
        assert len(seen) == rows * cols


def test_y4m_roundtrip():
    info = IO.VideoInfo(64, 48, 30, 1, P.CSP_I420, 8)
    rng = np.random.default_rng(7)
    frames = [(rng.integers(0, 256, (48, 64), dtype=np.uint8),
               rng.integers(0, 256, (24, 32), dtype=np.uint8),
               rng.integers(0, 256, (24, 32), dtype=np.uint8)) for _ in range(3)]
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "t.y4m")
        w = IO.Y4MWriter(path, info)
        for y, u, v in frames:
            w.write_frame(y, u, v)
        w.close()
        r = IO.Y4MReader(path)
        assert r.info.width == 64 and r.info.height == 48
        assert r.info.frame_count == 3
        for y, u, v in frames:
            fy, fu, fv = r.read_frame()
            assert np.array_equal(fy, y) and np.array_equal(fu, u) and np.array_equal(fv, v)
        assert r.read_frame() is None


def test_yuv_reader_and_prefetch():
    info = IO.VideoInfo(32, 32, 25, 1, P.CSP_I420, 8)
    rng = np.random.default_rng(3)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "t.yuv")
        w = IO.YUVWriter(path)
        planes = []
        for _ in range(4):
            y = rng.integers(0, 256, (32, 32), dtype=np.uint8)
            u = rng.integers(0, 256, (16, 16), dtype=np.uint8)
            v = rng.integers(0, 256, (16, 16), dtype=np.uint8)
            planes.append((y, u, v))
            w.write_frame(y, u, v)
        w.close()
        rd = IO.open_input(path, 32, 32)
        pf = IO.PrefetchReader(rd)
        got = list(pf)
        assert len(got) == 4
        for (gy, gu, gv), (y, u, v) in zip(got, planes):
            assert np.array_equal(gy, y)


def test_conformance_window():
    cw, ch, r, b = G.conformance_window(1920, 1080, 1, 1, 8)
    assert (cw, ch) == (1920, 1080) and r == 0 and b == 0
    cw, ch, r, b = G.conformance_window(1918, 1078, 1, 1, 8)
    assert cw == 1920 and ch == 1080 and r == 1 and b == 1


def test_sei_and_level():
    """Prefix SEI messages (active params, user data, HDR10 static metadata)
    must not break decoding; level auto-selection follows the level table."""
    import numpy as np
    import pytest
    pytest.importorskip("cv2")
    from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
    from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc
    from x265_yuuki_asuna_tpu.bitstream import sei as SEI

    assert SEI.pick_level(1280, 720, 25) == 93      # 3.1
    assert SEI.pick_level(1920, 1080, 60) == 123    # 4.1
    assert SEI.pick_level(3840, 2160, 60) == 153    # 5.1

    rng = np.random.default_rng(0)
    sess = IntraEncoderSession(
        48, 32, qp=30, cu_size=16, hash_sei=True,
        master_display="G(13250,34500)B(7500,3000)R(34000,16000)"
                       "WP(15635,16450)L(10000000,1)",
        max_cll="1000,400")
    stream = sess.headers()
    y = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    u = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    v = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    fr = sess.encode_frame(y, u, v)
    stream += fr.nals
    decoded = decode_hevc(stream, sess.coded_w, sess.coded_h)
    assert len(decoded) == 1
    assert np.array_equal(decoded[0][0][:32, :48], fr.recon[0])
