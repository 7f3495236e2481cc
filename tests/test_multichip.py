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

def test_frame_pipeline_cross_device_bit_exact():
    """P-chain over the mesh: device k encodes frame k against device k-1's
    recon, handed off with lax.ppermute (a REAL cross-device dependency —
    the reference's frame-threads m_reconRowFlag handshake, frame.h:105).
    Every device's packed output must equal the sequential single-device
    chain bit for bit."""
    _need_devices(4)
    from x265_yuuki_asuna_tpu.models.inter_encoder import (InterFrameConfig,
                                                           InterFrameEncoder)
    from x265_yuuki_asuna_tpu.parallel import frame_pipeline_fn
    N, W, H = 4, 64, 48
    mesh = Mesh(np.array(jax.devices()[:N]), ("frame",))
    cfg = InterFrameConfig(width=W, height=H, cu_size=16, qp=32,
                           search_range=8)
    enc = InterFrameEncoder(cfg)
    pipe = frame_pipeline_fn(enc, mesh)

    rng = np.random.default_rng(3)
    base = rng.integers(0, 200, (H, W)).astype(np.int32)
    ys = np.stack([(base + 3 * i).clip(0, 255).astype(np.uint8)
                   for i in range(N)])
    us = rng.integers(0, 256, (N, H // 2, W // 2)).astype(np.uint8)
    vs = rng.integers(0, 256, (N, H // 2, W // 2)).astype(np.uint8)
    idr_y = rng.integers(0, 256, (H, W)).astype(np.uint8)
    idr_u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    idr_v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)

    packed = np.asarray(pipe(jnp.asarray(ys), jnp.asarray(us),
                             jnp.asarray(vs), jnp.asarray(idr_y),
                             jnp.asarray(idr_u), jnp.asarray(idr_v)))

    # sequential single-device chain (the golden path)
    encode_one = jax.jit(enc._build())
    ref = (jnp.asarray(idr_y), jnp.asarray(idr_u), jnp.asarray(idr_v))
    ny, nuv = H * W, (H // 2) * (W // 2)
    for k in range(N):
        out = np.asarray(encode_one(jnp.asarray(ys[k]), jnp.asarray(us[k]),
                                    jnp.asarray(vs[k]), *ref,
                                    jnp.int32(32)))
        assert np.array_equal(out, packed[k]), f"frame {k} diverges"
        ref = (jnp.asarray(out[:ny].reshape(H, W)),
               jnp.asarray(out[ny:ny + nuv].reshape(H // 2, W // 2)),
               jnp.asarray(out[ny + nuv:ny + 2 * nuv]
                           .reshape(H // 2, W // 2)))


def test_frame_pipeline_stream_steady_state():
    """Steady-state pipeline: 3 chains of N frames flow through the mesh
    back-to-back; every chain must match its sequential encode."""
    _need_devices(4)
    from x265_yuuki_asuna_tpu.models.inter_encoder import (InterFrameConfig,
                                                           InterFrameEncoder)
    from x265_yuuki_asuna_tpu.parallel import frame_pipeline_stream_fn
    N, T, W, H = 4, 3, 64, 32
    mesh = Mesh(np.array(jax.devices()[:N]), ("frame",))
    cfg = InterFrameConfig(width=W, height=H, cu_size=16, qp=32,
                           search_range=8)
    enc = InterFrameEncoder(cfg)
    pipe = frame_pipeline_stream_fn(enc, mesh, n_batches=T)

    rng = np.random.default_rng(4)
    ys = rng.integers(0, 256, (T, N, H, W)).astype(np.uint8)
    us = rng.integers(0, 256, (T, N, H // 2, W // 2)).astype(np.uint8)
    vs = rng.integers(0, 256, (T, N, H // 2, W // 2)).astype(np.uint8)
    idr_y = rng.integers(0, 256, (H, W)).astype(np.uint8)
    idr_u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    idr_v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)

    packed = np.asarray(pipe(jnp.asarray(ys), jnp.asarray(us),
                             jnp.asarray(vs), jnp.asarray(idr_y),
                             jnp.asarray(idr_u), jnp.asarray(idr_v)))
    assert packed.shape[:2] == (T, N)

    encode_one = jax.jit(enc._build())
    ny, nuv = H * W, (H // 2) * (W // 2)
    for t in range(T):
        ref = (jnp.asarray(idr_y), jnp.asarray(idr_u), jnp.asarray(idr_v))
        for k in range(N):
            out = np.asarray(encode_one(
                jnp.asarray(ys[t, k]), jnp.asarray(us[t, k]),
                jnp.asarray(vs[t, k]), *ref, jnp.int32(32)))
            assert np.array_equal(out, packed[t, k]), \
                f"chain {t} frame {k} diverges"
            ref = (jnp.asarray(out[:ny].reshape(H, W)),
                   jnp.asarray(out[ny:ny + nuv].reshape(H // 2, W // 2)),
                   jnp.asarray(out[ny + nuv:ny + 2 * nuv]
                               .reshape(H // 2, W // 2)))
