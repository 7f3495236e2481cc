"""Pallas TPU kernel for the ME displacement sweep (K1).

The frame-sweep formulation (ops/me.sad_sweep_multi) evaluates all
(2R+1)^2 global displacements; its XLA form materialises a [D, H, W]
shifted-window tensor per dy scan step in HBM. This kernel keeps one
dy-row of the padded reference in VMEM (manual DMA), walks the D=2R+1 dx
shifts as STATIC slices of that resident row block, and reduces each
|ref - src| plane to 8x8 block sums on the VPU — HBM traffic drops from
O(D^2 * H * W) to O(D * H * W) reads + the [D, D, H/8, W/8] sums output.

Grid: one program per dy. Per-program VMEM: ref rows [H, W + 2R] int16
(~4.2 MB at 1080p), src [H, W] int16, out tile [D, H/8, W/8] int32 —
within the ~16 MB budget up to 1080p with R = 16.

Used behind a runtime gate (me.sad_sweep_multi(use_pallas=...)): the axon
tunnel backend may not lower Pallas; callers fall back to the XLA sweep.
Parity test: tests/test_pallas_me.py (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def sad_block8_sweep(ref_plane, src_plane, srange: int,
                     interpret: bool = False):
    """[D, D, H/8, W/8] int32: 8x8-block SADs for every (dy, dx)
    displacement in [-R, R]^2 (edge-padded reference, like the XLA sweep).
    ref_plane/src_plane: [H, W] integer planes, H, W multiples of 8."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = src_plane.shape
    R = srange
    D = 2 * R + 1
    ref_pad = jnp.pad(ref_plane.astype(jnp.int16), R, mode="edge")
    src16 = src_plane.astype(jnp.int16)
    hb, wb = H // 8, W // 8

    def kernel(ref_hbm, src_ref, out_ref, scratch, sem):
        dy = pl.program_id(0)
        copy = pltpu.make_async_copy(
            ref_hbm.at[pl.ds(dy, H), :], scratch, sem)
        copy.start()
        copy.wait()
        s = src_ref[:]
        for dx in range(D):              # static unroll: D shifted slices
            diff = jnp.abs(scratch[:, dx:dx + W] - s).astype(jnp.int32)
            out_ref[0, dx] = diff.reshape(hb, 8, wb, 8).sum(axis=(1, 3))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((D, D, hb, wb), jnp.int32),
        grid=(D,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # ref stays in HBM
            pl.BlockSpec((H, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, hb, wb), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, W + 2 * R), jnp.int16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(ref_pad, src16)
    return out


def sad_sweep_multi_pallas(ref_plane, src_plane, sizes, srange: int,
                           lambda_bits: int = 1, interpret: bool = False):
    """Drop-in replacement for me.sad_sweep_multi built on the Pallas
    kernel: hierarchical size aggregation + cost/argmin stay in XLA (tiny
    tensors), the O(D^2 * H * W) diff work runs in the kernel.

    Bit-exact with the XLA sweep including tie-breaking: the flattened
    (dy, dx) argmin picks smallest dy then smallest dx, and the cost adds
    lambda_bits * (|dx| + |dy|) like full_search_sad."""
    H, W = src_plane.shape
    R = srange
    D = 2 * R + 1
    sizes = sorted(sizes)
    base = sizes[0]
    assert base >= 8 and base % 8 == 0
    s8 = sad_block8_sweep(ref_plane, src_plane, srange,
                          interpret=interpret)      # [D, D, H/8, W/8]
    sums = {}
    s = s8
    if base != 8:
        f = base // 8
        s = (s.reshape(D, D, H // base, f, W // base, f).sum(axis=(3, 5)))
    sums[base] = s
    for n in sizes[1:]:
        hh, ww = H // n, W // n
        s = s.reshape(D, D, hh, 2, ww, 2).sum(axis=(3, 5))
        sums[n] = s
    dxs = jnp.arange(D, dtype=jnp.int32) - R
    bias = lambda_bits * (jnp.abs(dxs)[:, None] + jnp.abs(dxs)[None, :])
    out = {}
    for n in sizes:
        cost = sums[n] + bias[:, :, None, None]
        flat = cost.reshape(D * D, H // n, W // n)
        a = jnp.argmin(flat, axis=0)
        sad = jnp.take_along_axis(
            sums[n].reshape(D * D, H // n, W // n), a[None], axis=0)[0]
        mvy = a // D - R
        mvx = a % D - R
        out[n] = (mvx.reshape(-1), mvy.reshape(-1), sad.reshape(-1))
    return out
