"""Deterministic multi-chip tests (SURVEY.md §4): fixed-seed encodes over an
8-virtual-device mesh must be BIT-EXACT with the single-device path, down to
the assembled Annex-B stream, which must decode in an independent decoder.

conftest.py forces JAX onto CPU with xla_force_host_platform_device_count=8,
so these exercise the real `shard_map` programs the driver dry-runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

pytest.importorskip("cv2")

from x265_yuuki_asuna_tpu.models.encoder_top import IntraEncoderSession
from x265_yuuki_asuna_tpu.models.intra_encoder import (IntraFrameConfig,
                                                       IntraFrameEncoder)
from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")


def test_frame_parallel_mesh_bit_exact():
    """8 frames, one per device (the frame-threads analog): packed device
    buffers equal the single-device vmap path bit for bit."""
    _need_devices(8)
    mesh = Mesh(np.array(jax.devices()[:8]), ("frame",))
    cfg = IntraFrameConfig(width=64, height=48, cu_size=16, qp=32)
    enc = IntraFrameEncoder(cfg)
    encode_one = enc._build()
    ncu = cfg.rows * cfg.cols

    def per_shard(y, u, v):
        qp = jnp.full((ncu,), 32, jnp.int32)
        return encode_one(y[0], u[0], v[0], qp)[None]

    sharded = jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("frame"), P("frame"), P("frame")),
        out_specs=P("frame")))

    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (8, 48, 64)).astype(np.uint8)
    u = rng.integers(0, 256, (8, 24, 32)).astype(np.uint8)
    v = rng.integers(0, 256, (8, 24, 32)).astype(np.uint8)

    mesh_out = np.asarray(sharded(jnp.asarray(y), jnp.asarray(u),
                                  jnp.asarray(v)))
    single = np.asarray(enc.submit_frames(y, u, v))
    assert mesh_out.shape == single.shape
    assert np.array_equal(mesh_out, single)


def test_slice_bands_mesh_stream_bit_exact():
    """One picture as 4 independent slice bands, one band per device: the
    stream assembled from mesh outputs equals the single-process --slices 4
    stream byte for byte, and decodes independently."""
    _need_devices(4)
    W, H, BANDS = 64, 64, 4
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (H, W)).astype(np.uint8)
    u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)

    # single-process sliced session = the golden stream
    sess = IntraEncoderSession(W, H, qp=32, cu_size=16, hash_sei=False,
                               slices=BANDS)
    fr = sess.encode_frame(y, u, v)
    golden = sess.headers() + fr.nals

    # mesh path: encode each band's device portion on its own device with
    # the session's own band encoder, then assemble through the same
    # serializer the session uses
    mesh = Mesh(np.array(jax.devices()[:BANDS]), ("band",))
    benc = sess.frame_encoder            # band-geometry encoder
    encode_one = benc._build()
    ncu = benc.cfg.rows * benc.cfg.cols
    band_h = H // BANDS

    def per_band(yb, ub, vb):
        qp = jnp.full((ncu,), 32, jnp.int32)
        return encode_one(yb[0], ub[0], vb[0], qp)[None]

    banded = jax.jit(jax.shard_map(
        per_band, mesh=mesh, in_specs=(P("band"),) * 3,
        out_specs=P("band")))
    yb = y.reshape(BANDS, band_h, W)
    ub = u.reshape(BANDS, band_h // 2, W // 2)
    vb = v.reshape(BANDS, band_h // 2, W // 2)
    bufs = np.asarray(banded(jnp.asarray(yb), jnp.asarray(ub),
                             jnp.asarray(vb)))

    import math
    addr_bits = max(1, math.ceil(math.log2(sess.rows * sess.cols)))
    nals = b""
    for i in range(BANDS):
        out = benc._unpack(bufs[i])
        nals += sess._assemble_band_slice(
            out, i == 0, i * (ncu), addr_bits)
    stream = sess.headers() + nals
    assert stream == golden
    dec = decode_hevc(stream, W, H)
    assert len(dec) == 1
