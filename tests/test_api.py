"""Public API surface (reference x265.h / api.cpp analog): param lifecycle,
encoder open/headers/encode/stats/close, dither."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu import api
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _frames(n, w, h, seed=0):
    rng = np.random.default_rng(seed)
    return [(rng.integers(0, 256, (h, w)).astype(np.uint8),
             rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
             rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
            for _ in range(n)]


def test_api_all_intra_roundtrip():
    p = api.param_default_preset("ultrafast")
    api.param_parse(p, "input-res", "64x48")
    api.param_parse(p, "fps", "25")
    api.param_parse(p, "qp", "30")
    api.param_parse(p, "keyint", "1")
    api.param_parse(p, "bframes", "0")
    enc = api.encoder_open(p)
    stream = api.encoder_headers(enc)
    for f in _frames(2, 64, 48):
        pic = api.picture_init(p, api.picture_alloc())
        pic.planes = f
        for nals in api.encoder_encode(enc, pic):
            stream += nals
    for nals in api.encoder_encode(enc, None):
        stream += nals
    st = api.encoder_get_stats(enc)
    api.encoder_close(enc)
    assert st.encoded_picture_count == 2
    assert st.accumulated_bits > 0
    dec = decode_hevc(stream, 64, 48)
    assert len(dec) == 2


def test_api_video_session_presets():
    p = api.param_default_preset("ultrafast")
    api.param_parse(p, "input-res", "64x48")
    api.param_parse(p, "fps", "25")
    api.param_parse(p, "qp", "32")
    enc = api.encoder_open(p)      # ultrafast: keyint 250, bframes 3
    stream = api.encoder_headers(enc)
    for f in _frames(5, 64, 48, seed=2):
        pic = api.picture_alloc()
        pic.planes = f
        for nals in api.encoder_encode(enc, pic):
            stream += nals
    for nals in api.encoder_encode(enc, None):
        stream += nals
    st = api.encoder_get_stats(enc)
    assert st.encoded_picture_count == 5
    dec = decode_hevc(stream, 64, 48)
    assert len(dec) == 5


def test_api_check_params():
    p = api.param_default()
    with pytest.raises(api.ParamError):
        api.encoder_open(p)        # no dimensions


def test_dither_image():
    rng = np.random.default_rng(0)
    p10 = rng.integers(0, 1024, (16, 32)).astype(np.uint16)
    d8 = api.dither_image(p10, 10, 8)
    assert d8.dtype == np.uint8
    # mean must be preserved to within the quantization step
    assert abs(d8.astype(float).mean() * 4 - p10.astype(float).mean()) < 2.5
    # identity case
    p8 = (p10 >> 2).astype(np.uint16)
    assert np.array_equal(api.dither_image(p8, 8, 8), p8.astype(np.uint8))


def test_api_reconfig_whitelist():
    """x265_encoder_reconfig analog: runtime scalars (rc targets, keyint,
    scenecut) reconfigure mid-stream; program/header-affecting changes are
    rejected with -1 (encoder.cpp:2467 whitelist behavior)."""
    p = api.param_default()
    p.source_width, p.source_height = 64, 48
    p.keyframe_max = 100
    p.max_cu_size = 16
    p.min_cu_size = 16
    p.bframes = 0
    enc = api.encoder_open(p)
    frames = _frames(4, 64, 48)
    for f in frames[:2]:
        pic = api.Picture(planes=f)
        enc.encode(pic)
    # accepted: QP change via CQP reconfig
    import copy
    p2 = copy.deepcopy(p)
    p2.rc.qp = 40
    assert api.encoder_reconfig(enc, p2) == 0
    r = enc.encode(api.Picture(planes=frames[2]))
    assert r
    # rejected: resolution change
    p3 = copy.deepcopy(p2)
    p3.source_width = 128
    assert api.encoder_reconfig(enc, p3) == -1
    # rejected: CTU change
    p4 = copy.deepcopy(p2)
    p4.max_cu_size = 32
    assert api.encoder_reconfig(enc, p4) == -1
    api.encoder_close(enc)


def test_api_level_enforcement():
    """enforceLevel analog (level.cpp:290): a pinned level below what the
    configuration needs is rejected unless non-conformance is allowed."""
    p = api.param_default()
    p.source_width, p.source_height = 3840, 2160
    p.fps_num, p.fps_denom = 60, 1
    p.level_idc = 93                    # level 3.1: far below 4K60
    with pytest.raises(Exception):
        api.check_params(p)
    p.b_allow_non_conformance = 1
    api.check_params(p)                 # explicit override passes
    p2 = api.param_default()
    p2.source_width, p2.source_height = 352, 288
    p2.fps_num, p2.fps_denom = 25, 1
    p2.level_idc = 93
    api.check_params(p2)                # CIF fits 3.1


def test_api_ctu_info_roi():
    """x265_encoder_ctu_info analog: externally supplied per-CTU QP
    offsets shape the QP map; streams stay decodable."""
    from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc
    p = api.param_default()
    p.source_width, p.source_height = 64, 48
    p.keyframe_max = 100
    p.max_cu_size = p.min_cu_size = 16
    p.bframes = 0
    p.max_num_references = 1
    p.b_enable_temporal_mvp = 0
    enc = api.encoder_open(p)
    frames = _frames(4, 64, 48, seed=3)
    roi = np.zeros((3, 4), np.int32)
    roi[0, :] = -6                       # spend bits on the top band
    roi[2, :] = 6
    assert enc.ctu_info(roi) == 0
    stream = enc.headers()
    for f in frames:
        for nals in enc.encode(api.Picture(planes=f)):
            stream += nals
    dec = decode_hevc(stream, 64, 48)
    assert len(dec) == len(frames)
    assert enc.ctu_info(np.zeros((2, 2), np.int32)) == -1   # bad shape
    api.encoder_close(enc)
