"""Cross-device frame pipeline: the reference's frame-parallelism with a
REAL inter-device dependency.

x265 runs up to 16 FrameEncoder threads where frame k blocks on frame k-1's
reconstruction rows (`m_reconRowFlag` handshake, reference frame.h:105,
frameencoder.cpp:852-868). The TPU-native formulation here: device k encodes
frame k of a P-chain against the reconstruction produced by device k-1,
handed off with a `lax.ppermute` collective over the mesh's frame axis at
every pipeline step — reference pixels ride the ICI, not host memory.

Two programs:

* `frame_pipeline_fn` — pipeline-fill semantics: a `lax.scan` over N steps;
  at step t device t's encode consumes the reference received from device
  t-1 at the end of step t-1. One collective per step. Outputs are
  bit-exact with the sequential single-device chain (tests/test_multichip).

* `frame_pipeline_stream_fn` — steady-state semantics: T mini-batches of N
  frames stream through the same pipeline; once full, all N devices encode
  concurrently every step (utilization -> 1 as T grows), with the recon
  handoff still a per-step ppermute. This is the deployment shape: the
  fill cost is paid once per chain restart (IDR), exactly like the
  reference pays a frame-thread ramp-up per encoder start.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _recon_slices(cfg):
    H, W = cfg.height, cfg.width
    ny, nuv = H * W, (H // 2) * (W // 2)
    return H, W, ny, nuv


def frame_pipeline_fn(encoder, mesh: Mesh, qp: int = None):
    """Returns jitted fn(y[N,H,W], u, v, idr_y, idr_u, idr_v) -> packed[N,...]
    encoding a P-chain: frame 0 references the given IDR recon, frame k
    references frame k-1's recon received over ICI. N = mesh size."""
    cfg = encoder.cfg
    encode_one = encoder._build()
    H, W, ny, nuv = _recon_slices(cfg)
    axis = mesh.axis_names[0]
    N = int(np.prod(mesh.devices.shape))
    qp_val = cfg.qp if qp is None else qp
    perm = [(i, i + 1) for i in range(N - 1)]

    def per_shard(y, u, v, idr_y, idr_u, idr_v):
        k = jax.lax.axis_index(axis)

        def step(carry, t):
            ref_y, ref_u, ref_v, acc = carry
            out = encode_one(y[0], u[0], v[0], ref_y, ref_u, ref_v,
                             jnp.int32(qp_val))
            rec_y = out[:ny].reshape(H, W)
            rec_u = out[ny:ny + nuv].reshape(H // 2, W // 2)
            rec_v = out[ny + nuv:ny + 2 * nuv].reshape(H // 2, W // 2)
            # keep this device's output from its own pipeline slot
            acc = jnp.where(t == k, out, acc)
            # recon handoff to the right neighbor (the m_reconRowFlag
            # handshake as an ICI collective)
            nxt_y = jax.lax.ppermute(rec_y, axis, perm)
            nxt_u = jax.lax.ppermute(rec_u, axis, perm)
            nxt_v = jax.lax.ppermute(rec_v, axis, perm)
            # device k's true reference arrives at the end of step k-1;
            # later receives must not disturb it (its slot has passed)
            upd = (t + 1) == k
            ref_y = jnp.where(upd, nxt_y, ref_y)
            ref_u = jnp.where(upd, nxt_u, ref_u)
            ref_v = jnp.where(upd, nxt_v, ref_v)
            return (ref_y, ref_u, ref_v, acc), None

        # probe the packed size once (shapes are static under trace)
        sd = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
        probe = jax.eval_shape(encode_one, sd(y[0]), sd(u[0]), sd(v[0]),
                               sd(idr_y), sd(idr_u), sd(idr_v),
                               jax.ShapeDtypeStruct((), jnp.int32))
        vary = lambda a: jax.lax.pvary(a, (axis,))
        init = (vary(idr_y), vary(idr_u), vary(idr_v),
                vary(jnp.zeros(probe.shape, probe.dtype)))
        (_, _, _, acc), _ = jax.lax.scan(step, init,
                                         jnp.arange(N, dtype=jnp.int32))
        return acc[None]

    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis),) * 3 + (P(),) * 3,
        out_specs=P(axis)))


def frame_pipeline_stream_fn(encoder, mesh: Mesh, n_batches: int,
                             qp: int = None):
    """Steady-state pipeline: T back-to-back P-chains of length N, all
    anchored at the shared IDR recon (the periodic-keyframe deployment
    shape: one chain per IDR period). Frames arranged [T, N, H, W]; chain t
    frame k lives at [t, k] and references chain t frame k-1's recon. Runs
    T + N - 1 pipeline steps; at step s device k encodes its chain-t frame
    where t = s - k, so after the N-step fill every device is busy every
    step and every step still moves recon pixels over ICI. Returns packed
    [T, N, ...]."""
    cfg = encoder.cfg
    encode_one = encoder._build()
    H, W, ny, nuv = _recon_slices(cfg)
    axis = mesh.axis_names[0]
    N = int(np.prod(mesh.devices.shape))
    T = n_batches
    qp_val = cfg.qp if qp is None else qp
    perm = [(i, i + 1) for i in range(N - 1)]

    def per_shard(y, u, v, idr_y, idr_u, idr_v):
        # y: [T, 1, H, W] — this device's T frames
        k = jax.lax.axis_index(axis)
        sd = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
        probe = jax.eval_shape(encode_one, sd(y[0, 0]), sd(u[0, 0]),
                               sd(v[0, 0]), sd(idr_y), sd(idr_u), sd(idr_v),
                               jax.ShapeDtypeStruct((), jnp.int32))

        def step(carry, s):
            ref_y, ref_u, ref_v, acc = carry
            t = jnp.clip(s - k, 0, T - 1)
            ys = jax.lax.dynamic_index_in_dim(y, t, 0, keepdims=False)[0]
            us = jax.lax.dynamic_index_in_dim(u, t, 0, keepdims=False)[0]
            vs = jax.lax.dynamic_index_in_dim(v, t, 0, keepdims=False)[0]
            out = encode_one(ys, us, vs, ref_y, ref_u, ref_v,
                             jnp.int32(qp_val))
            rec_y = out[:ny].reshape(H, W)
            rec_u = out[ny:ny + nuv].reshape(H // 2, W // 2)
            rec_v = out[ny + nuv:ny + 2 * nuv].reshape(H // 2, W // 2)
            active = (s >= k) & (s - k < T)
            acc = jnp.where(active, acc.at[t].set(out), acc)
            nxt_y = jax.lax.ppermute(rec_y, axis, perm)
            nxt_u = jax.lax.ppermute(rec_u, axis, perm)
            nxt_v = jax.lax.ppermute(rec_v, axis, perm)
            # device k consumes a new reference exactly when its next slot
            # starts: slot for batch t is step t + k, fed by the left
            # neighbor's step t + k - 1 output (its own batch-t frame)
            nxt_active = ((s + 1) >= k) & ((s + 1 - k) < T) & (k > 0)
            ref_y = jnp.where(nxt_active, nxt_y, ref_y)
            ref_u = jnp.where(nxt_active, nxt_u, ref_u)
            ref_v = jnp.where(nxt_active, nxt_v, ref_v)
            return (ref_y, ref_u, ref_v, acc), None

        vary = lambda a: jax.lax.pvary(a, (axis,))
        init = (vary(idr_y), vary(idr_u), vary(idr_v),
                vary(jnp.zeros((T,) + probe.shape, probe.dtype)))
        (_, _, _, acc), _ = jax.lax.scan(
            step, init, jnp.arange(T + N - 1, dtype=jnp.int32))
        return acc[:, None]

    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(None, axis),) * 3 + (P(),) * 3,
        out_specs=P(None, axis)))
