"""Device-mesh parallel strategies (SURVEY.md §2c mapping).

The reference scales with shared-memory threads: frame threads
(encoder.cpp round-robin FrameEncoders), WPP rows, and --slices bands.
On TPU these become `jax.shard_map` programs over a `Mesh`:

  * frame axis  — one frame per device (frame-threads analog); outputs
    are bit-exact with the single-device vmap path (tests/test_multichip).
  * band axis   — one independent slice band of the SAME picture per
    device (--slices / WPP-row-group analog); the assembled stream is
    byte-identical to the single-process --slices stream.

Both run on real multi-chip meshes or the CPU virtual-device mesh
(xla_force_host_platform_device_count) unchanged.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: int = None, axis: str = "frame") -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.array(devs[:n]), (axis,))


def frame_parallel_fn(encoder, mesh: Mesh, qp: int = None):
    """Returns a jitted fn(y[B,H,W], u, v) -> packed[B, ...] that encodes
    one frame per device over `mesh` using `encoder` (IntraFrameEncoder).
    B must equal the mesh size."""
    encode_one = encoder._build()
    ncu = encoder.cfg.rows * encoder.cfg.cols
    qp_val = encoder.cfg.qp if qp is None else qp

    def per_shard(y, u, v):
        qpm = jnp.full((ncu,), qp_val, jnp.int32)
        return encode_one(y[0], u[0], v[0], qpm)[None]

    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(mesh.axis_names[0]),) * 3,
        out_specs=P(mesh.axis_names[0])))


def band_parallel_fn(band_encoder, mesh: Mesh, qp: int = None):
    """Returns a jitted fn over one picture split into per-device slice
    bands: y[B, band_h, W] -> packed band buffers [B, ...]. Each band is an
    independent HEVC slice, so host assembly (session._assemble_band_slice)
    concatenates to a conformant frame."""
    encode_one = band_encoder._build()
    ncu = band_encoder.cfg.rows * band_encoder.cfg.cols
    qp_val = band_encoder.cfg.qp if qp is None else qp

    def per_band(y, u, v):
        qpm = jnp.full((ncu,), qp_val, jnp.int32)
        return encode_one(y[0], u[0], v[0], qpm)[None]

    return jax.jit(jax.shard_map(
        per_band, mesh=mesh,
        in_specs=(P(mesh.axis_names[0]),) * 3,
        out_specs=P(mesh.axis_names[0])))
