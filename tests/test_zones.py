"""Zones: --zones q=/b= parsing into rc.zones, zonefile zones-as-param-clones,
and x265_encoder_reconfig_zone applying a clone through the reconfig
whitelist at the zone's first frame (param.cpp:1078, x265cli.cpp:960
parseZoneFile, encoder.cpp:2467 reconfigZone)."""
import os
import tempfile

import numpy as np
import pytest

from x265_yuuki_asuna_tpu import api
from x265_yuuki_asuna_tpu.utils import param as P


def test_zones_parse_q_and_b():
    p = P.Param(source_width=64, source_height=48)
    P.param_parse(p, "zones", "0,24,q=30/25,48,b=1.5")
    assert p.rc.zone_count == 2
    # later-in-list takes precedence -> stored reversed for first-match
    assert p.rc.zones[0].bitrate_factor == 1.5
    assert p.rc.zones[1].b_force_qp == 1 and p.rc.zones[1].qp == 30


def test_zonefile_param_clones():
    p = P.Param(source_width=64, source_height=48)
    with tempfile.NamedTemporaryFile("w", suffix=".zf", delete=False) as f:
        f.write("# comment\n0 --crf 26\n4 --crf 34 --aq-strength 0.5\n")
        name = f.name
    try:
        P.param_parse(p, "zonefile", name)
    finally:
        os.unlink(name)
    assert p.rc.zonefile_count == 2
    z0, z1 = p.rc.zones
    assert (z0.start_frame, z0.end_frame) == (0, 3)
    assert z1.zone_param.rc.rf_constant == 34.0
    assert z1.zone_param.rc.aq_strength == 0.5


def test_reconfig_zone_applies_at_frame():
    p = api.param_alloc()
    p.source_width, p.source_height = 64, 48
    p.keyframe_max = 50
    p.bframes = 0
    p.rc.rate_control_mode = P.RC_CRF
    p.rc.rf_constant = 28.0
    with tempfile.NamedTemporaryFile("w", suffix=".zf", delete=False) as f:
        f.write("0 --crf 28\n2 --crf 40\n")
        name = f.name
    try:
        P.param_parse(p, "zonefile", name)
    finally:
        os.unlink(name)
    enc = api.encoder_open(p)
    rng = np.random.default_rng(0)
    pic = api.picture_alloc()
    api.picture_init(p, pic)
    for i in range(4):
        pic.planes = (rng.integers(0, 256, (48, 64)).astype(np.uint8),
                      rng.integers(0, 256, (24, 32)).astype(np.uint8),
                      rng.integers(0, 256, (24, 32)).astype(np.uint8))
        api.encoder_encode(enc, pic)
        if i < 2:
            assert enc.param.rc.rf_constant == 28.0
        else:
            assert enc.param.rc.rf_constant == 40.0, \
                "zone param clone not applied at its first frame"
    api.encoder_close(enc)


def test_reconfig_zone_clamps_geometry():
    p = api.param_alloc()
    p.source_width, p.source_height = 64, 48
    p.keyframe_max = 50
    p.rc.rate_control_mode = P.RC_CRF
    enc = api.encoder_open(p)
    zp = p.copy()
    zp.source_width = 1280           # geometry change must be ignored
    zp.rc.rf_constant = 35.0
    assert api.encoder_reconfig_zone(enc, zp) == 0
    assert enc.param.rc.rf_constant == 35.0
    assert enc.param.source_width == 64
    api.encoder_close(enc)
